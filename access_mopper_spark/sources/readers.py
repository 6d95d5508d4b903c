"""Source readers.

The reference resolves inputs by glob-pattern + filename-timestamp pruning +
per-file min/max probing (``mopper/mop_utils.py:162-327``).  On Spark all
three collapse into the file index + parquet statistics: ``spark.read`` over
a glob gives the file listing, partition pruning handles date-partitioned
layouts, and parquet row-group min/max stats serve the in-file time pruning
— provided predicates are applied *before* any wide transform so Catalyst
can push them to the scan (verify with ``df.explain``: ``PushedFilters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain parquet read — column pruning and
    predicate pushdown are left entirely to Catalyst (reference equivalent:
    ``_preselect`` column pruning, ``mop_utils.py:116-122``).

    ``events.ts`` has been generated both as parquet TIMESTAMP(NANOS) and as
    tz-less TIMESTAMP(MICROS) across driver runs; normalize every variant to
    a plain UTC ``timestamp`` column so downstream ``unix_micros`` math and
    the DuckDB oracle (naive µs timestamps) agree:

    - NANOS → read as long (``spark.sql.legacy.parquet.nanosAsLong``) and
      floor-divide to µs, matching DuckDB's ns→µs truncation.
    - tz-less MICROS → Spark 4 infers TIMESTAMP_NTZ; with the session pinned
      to UTC a cast to ``timestamp`` is a pure relabel (same wall time)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # pin UTC at runtime: bin edges (date_trunc/window/month) must not
    # shift with the host session's timezone — the driver runs a vanilla
    # SparkSession, not our get_spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            # integer division — epoch nanos (~1.7e18) overflow double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so operators can be written in SQL."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
