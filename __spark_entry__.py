"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``access_mopper_spark.queries``; this module is a
thin adapter so the registry can grow without touching the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: monthly closed-right
    resample of order totals — the reference's canonical
    'produce monthly means from higher-frequency input' pipeline
    (SURVEY.md §7.1) on the driver's testdata."""
    from access_mopper_spark.queries import QUERIES

    return QUERIES["q_resample_monthly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from access_mopper_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (same column names/aliases)."""
    from access_mopper_spark.queries import ORACLES

    return dict(ORACLES)
