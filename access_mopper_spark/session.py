"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (single JVM); the conf choices below are
the ones that also hold on a real cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast).
- Arrow on (pandas UDF / toPandas fast path).
- UTC session timezone — the reference does all calendar math in fixed
  calendars (``mopper/mopper.py:183``); pinning UTC removes DST ambiguity
  from window/resample bin edges.
- shuffle.partitions sized to the machine, not the 200 default; at cluster
  scale AQE coalesces, and callers repartition explicitly where a plan
  needs a specific distribution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "access_mopper_spark", master: str | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
