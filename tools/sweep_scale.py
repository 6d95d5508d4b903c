"""Execute EVERY registry query (noop sink, Spark side only) at a given
sf dir and report per-query wall time — the scale-pathology sweep.

The oracle gate proves correctness at sf0.01; this sweep proves every
query EXECUTES cleanly at a larger scale point (no OOM, no cartesian
blowup, no driver-side collect choke) and surfaces wall-time outliers
worth a plan read.  Round-4 artifact: `BENCH_sf1_scaleup.json`
``full_registry_x10`` section (138 queries, zero errors, 529 s total
against the ×10 scale-up from tools/make_scaleup.py).

Usage: python tools/sweep_scale.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_scaleup"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.session import get_spark

    spark = get_spark(app_name="sweep_scale")
    times: dict[str, object] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 2)
        except Exception as exc:  # keep sweeping; report at the end
            times[name] = f"ERROR: {str(exc)[:200]}"
        # queries that persist loop-invariant tables (bpe, pagerank,
        # curation) would otherwise accumulate cache across the 155-query
        # sweep and turn later timings into eviction-churn noise
        spark.catalog.clearCache()
        print(name, times[name], flush=True)

    errs = {k: v for k, v in times.items() if isinstance(v, str)}
    ok = {k: v for k, v in times.items() if not isinstance(v, str)}
    print(f"\n{len(ok)}/{len(times)} executed, {len(errs)} errors, "
          f"total {round(sum(ok.values()), 1)}s")
    for k, v in sorted(ok.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  slowest: {k} {v}s")
    if out_path:
        json.dump(times, open(out_path, "w"), indent=1)
    if errs:
        sys.exit(1)


if __name__ == "__main__":
    main()
