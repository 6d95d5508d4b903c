"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted, cells
canonicalized).  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]

Float canonicalization is FULL precision (``repr``): the driver hashes
exact values, so a local gate that rounds to 9 dp can pass rows the
driver fails (r4 verdict item 4).  The rounding convention
(functions/rounding.pround on both engines) is what makes full-precision
parity achievable; anything that diverges at ulp level here is a real
cross-engine bug, not noise.

``connect_oracle`` / ``compare_one`` are importable so tests and
tools/fuzz_correctness.py run the identical gate on other data dirs.
"""

from __future__ import annotations

import math
import sys
import tempfile
import time
from datetime import date, datetime

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    return str(v)


def frame_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def connect_oracle(sf_dir: str):
    """DuckDB connection with the standard table views over ``sf_dir``."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare_one(spark, con, name, fn, oracle, sf_dir):
    """Run one query both ways and compare.  Returns (status, detail):
    status ∈ {'pass', 'rows-only', 'fail'}."""
    try:
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
    except Exception as ex:
        return "fail", f"spark error: {ex}"
    if oracle is None:
        return "rows-only", f"{len(srows)} rows"
    try:
        res = con.execute(oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as ex:
        return "fail", f"oracle error: {ex}"

    sc, sr = frame_repr(scols, srows)
    dc, dr = frame_repr(dcols, drows)
    if sc != dc:
        return "fail", f"schema mismatch: spark={sc} duck={dc}"
    if len(sr) != len(dr):
        return "fail", f"rowcount spark={len(sr)} duck={len(dr)}"
    bad = [(a, b) for a, b in zip(sr, dr) if a != b]
    if bad:
        return "fail", (f"{len(bad)}/{len(sr)} rows differ; first:\n"
                        f"  spark: {bad[0][0]}\n  duck : {bad[0][1]}")
    return "pass", f"{len(sr)} rows"


def main():
    from access_mopper_spark.session import get_spark
    import __spark_entry__ as e

    # PySpark collect() renders TimestampType through Python's OS-LOCAL
    # fromtimestamp — no Spark conf can change that — while DuckDB
    # fetches naive wall times; on a non-UTC box every timestamp-output
    # query hash-shifts by the UTC offset (measured: TZ=Australia/
    # Adelaide shifts 37 queries by +9:30 with values otherwise exact).
    # The driver box runs UTC; this gate requires the same.
    if time.localtime().tm_gmtoff != 0:
        print("WARNING: non-UTC OS timezone — timestamp renderings will "
              "diverge from DuckDB regardless of Spark session confs. "
              "Re-run with TZ=UTC for meaningful results.")

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver parity: the harness does NOT use our get_spark — probe
        # the registry under a plain session to catch conf dependencies
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.master("local[8]") \
            .appName("check_correctness_vanilla").getOrCreate()
    else:
        spark = get_spark(app_name="check_correctness")
    con = connect_oracle(sf_dir)

    qs, oracles = e.queries(), e.oracle_sql()
    failures, n_checked = [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        status, detail = compare_one(spark, con, name, fn,
                                     oracles.get(name), sf_dir)
        if status == "rows-only":
            print(f"ok?   {name}: rows-only ({detail}, {time.time()-t0:.1f}s) — no oracle")
            continue
        n_checked += 1
        if status == "fail":
            failures.append((name, detail))
            print(f"FAIL  {name}: {detail}")
        else:
            print(f"PASS  {name} ({detail}, {time.time()-t0:.1f}s)")

    print(f"\n{n_checked - len(failures)}/{n_checked} oracle-checked queries pass; "
          f"{len(qs)} queries total")
    # durable record: a piped/truncated stdout must never lose WHICH row
    # failed (an early vanilla-gate flap's name was eaten by `| tail`)
    import json
    with open(os.path.join(tempfile.gettempdir(),
                           f"gate_last_{os.getpid()}.json"), "w") as fh:
        json.dump({"sf_dir": sf_dir, "n_checked": n_checked,
                   "failures": [{"name": n, "detail": str(d)}
                                for n, d in failures]}, fh, indent=1)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
