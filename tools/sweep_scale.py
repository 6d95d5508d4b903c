"""Execute EVERY registry query (noop sink, Spark side only) at a given
sf dir and report per-query wall time — the scale-pathology sweep.

The oracle gate proves correctness at sf0.01; this sweep proves every
query EXECUTES cleanly at a larger scale point (no OOM, no cartesian
blowup, no driver-side collect choke) and surfaces wall-time outliers
worth a plan read.  Round-4 artifact: `BENCH_sf1_scaleup.json`
``full_registry_x10`` section (138 queries, zero errors, 529 s total
against the ×10 scale-up from tools/make_scaleup.py).

Operational notes (learned the hard way in r9):
- run with ``SPARK_DRIVER_MEMORY=48g`` for x100-scale or full-registry
  sweeps — a single session accumulates broadcast/metrics heap across
  hundreds of queries and OOMs the 8g default even though every query
  passes standalone;
- the out_json is written PROGRESSIVELY (after every query) so a crash
  resumes by skipping completed keys (pass the same out_json path);
- ``SPARK_GRAFT_SWEEP_SKIP`` (comma-separated names) skips documented
  O(n^2)-by-semantics rows (exact all-pairs baselines) at big SFs.
- (r11) every sweep LEADS with a fixed warmup no-op (q_pricing_summary
  forced through the noop sink) so cold-session JIT/worker-spawn never
  inflates the first measured row, and the output JSON carries a
  ``_protocol`` stamp so readers can tell which regime a number came
  from without parsing prose: ``warm`` = interleaved in this warmed
  single session (the sweep's own regime), ``cold`` = first execution
  of that query in a fresh-but-warmed session, ``loaded`` = measured
  while other work shared the box.  Headline scale points copied into
  BENCH_sf1_scaleup.json must carry the same stamp per entry.

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

    # sweep-session pinning: tmpfs scratch + G1 (session.py; r11 item 4)
    os.environ.setdefault("SPARK_GRAFT_SWEEP", "1")

    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.session import get_spark

    spark = get_spark(app_name="sweep_scale")
    # fixed warmup no-op: spin up JVM codegen, executor threads, and
    # parquet footer caches so the FIRST measured row isn't a 2-3x
    # cold-session artifact (r10 verdict item 3)
    QUERIES["q_pricing_summary"](spark, sf_dir) \
        .write.format("noop").mode("overwrite").save()
    times: dict[str, object] = {}
    if out_path and os.path.exists(out_path):
        prior = json.load(open(out_path))
        # drop metadata and errored rows from the prior file: metadata
        # must not overwrite this run's stamp (r11 ADVICE), errors re-run
        times.update({k: v for k, v in prior.items()
                      if not k.startswith("_")
                      and not (isinstance(v, str) and v.startswith("ERROR"))})
        print(f"resuming: {len(times)} completed keys loaded")
    times["_protocol"] = "warm"
    skip = set(filter(None, os.environ.get(
        "SPARK_GRAFT_SWEEP_SKIP", "").split(",")))
    for name, fn in QUERIES.items():
        if name in times:
            continue
        if name in skip:
            times[name] = "SKIPPED: via SPARK_GRAFT_SWEEP_SKIP"
            continue
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
        if out_path:
            json.dump(times, open(out_path, "w"), indent=1)
        print(name, times[name], flush=True)

    errs = {k: v for k, v in times.items()
            if isinstance(v, str) and v.startswith("ERROR")}
    ok = {k: v for k, v in times.items()
          if not isinstance(v, str) and not k.startswith("_")}
    n_keys = sum(1 for k in times if not k.startswith("_"))
    print(f"\n{len(ok)}/{n_keys} executed, {len(errs)} errors, "
          f"total {round(sum(ok.values()), 1)}s")
    for k, v in sorted(ok.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  slowest: {k} {v}s")
    if out_path:
        json.dump(times, open(out_path, "w"), indent=1)
    if errs:
        sys.exit(1)


if __name__ == "__main__":
    main()
