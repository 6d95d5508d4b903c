"""Round-13 optimization measurement harness.

For each named query: run it N times at $SPARK_GRAFT_SF_DIR (noop sink,
clearCache between reps, jobs labelled), record per-rep seconds, and dump
`.explain("formatted")` to plans/r13/<query>_<tag>.txt.

    python tools/measure_r13.py <tag> <reps> [query ...]

Writes progressive JSON to /tmp/measure_r13_<tag>.json so a crash keeps
completed keys.  Reads the same session the bench uses (get_spark).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from access_mopper_spark.session import get_spark
    from access_mopper_spark.queries import QUERIES

    spark = get_spark(app_name=f"measure_r13_{tag}")
    os.makedirs("plans/r13", exist_ok=True)

    # smoke-scale warmup of every named plan (codegen classes), same as bench
    smoke = "/root/testdata/sf0.001"
    for name in names:
        try:
            QUERIES[name](spark, smoke).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()

    out_path = f"/tmp/measure_r13_{tag}.json"
    results: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        # plan dump (plan built once, at sf_dir)
        try:
            import contextlib
            import io
            # bypass eager_release during the dump so the captured plan
            # is the real computation, not the post-checkpoint RDD scan
            # (single env-var indirection point inside eager_release —
            # r12 ADVICE replaced the per-module monkey-patch)
            os.environ["SPARK_GRAFT_PLAN_LAZY"] = "1"
            try:
                df = fn(spark, sf_dir)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain(mode="formatted")
            finally:
                os.environ.pop("SPARK_GRAFT_PLAN_LAZY", None)
            with open(f"plans/r13/{name}_{tag}.txt", "w") as f:
                f.write(buf.getvalue())
        except Exception as exc:  # noqa: BLE001
            print(f"PLAN-FAIL {name}: {exc}")
        spark.catalog.clearCache()
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{tag}:{name}:rep{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"{name}: {times}")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps({k: sorted(v)[len(v) // 2] for k, v in results.items()}))


if __name__ == "__main__":
    main()
