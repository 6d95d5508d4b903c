"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted, cells
canonicalized).  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime

sys.path.insert(0, "/root/repo")


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
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    return str(v)


def frame_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    import duckdb

    from access_mopper_spark.session import get_spark
    import __spark_entry__ as e

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
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures, n_checked = [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) — no oracle")
            continue
        n_checked += 1
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"FAIL  {name}: oracle error: {ex}")
            continue

        sc, sr = frame_repr(scols, srows)
        dc, dr = frame_repr(dcols, drows)
        if sc != dc:
            failures.append((name, f"schema mismatch: spark={sc} duck={dc}"))
            print(f"FAIL  {name}: schema mismatch\n  spark={sc}\n  duck ={dc}")
            continue
        if len(sr) != len(dr):
            failures.append((name, f"rowcount {len(sr)} vs {len(dr)}"))
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} differing rows, first: {bad[0]}"))
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} rows differ")
            print(f"  spark: {bad[0][0]}")
            print(f"  duck : {bad[0][1]}")
            continue
        print(f"PASS  {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{n_checked - len(failures)}/{n_checked} oracle-checked queries pass; "
          f"{len(qs)} queries total")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
