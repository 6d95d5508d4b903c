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
- AQE initialPartitionNum raised well above shuffle.partitions: every
  exchange STARTS wide (map tasks write 1024-way) and AQE coalesces the
  reduce side back down by size, so no single shuffle can be pinned to
  the small session default when a stage inflates (pair-materializing
  self-joins grow ~quadratically inside dup-family buckets — the ×100
  sweeps measured winnowing_similarity at 17.8× wall for 10× data under
  32 fixed partitions vs 10.4× at 256; this conf makes the sized-shuffle
  behavior the default instead of a per-query override).
  coalescePartitions.parallelismFirst (default true) keeps small queries
  at ~defaultParallelism partitions, so sf0.01/sf0.1 plans are unchanged
  in shape.
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
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                os.environ.get("SPARK_INITIAL_PARTITIONS",
                               str(max(1024, shuffle_partitions))))
        # without this, cache/persist materialization (the CC/PageRank
        # loop invariants) runs its shuffles at initialPartitionNum
        # UNCOALESCED — measured 4.9->8.5 s on q_dedup_keep_best at
        # sf0.01; with it, 4.1 s (AQE applies inside cached plans)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if os.environ.get("SPARK_GRAFT_SWEEP") == "1":
        # Sweep-session pinning (r11 verdict item 4): iterative rows
        # (pagerank / simhash_clusters / leakage_free_split) showed 3-rep
        # spreads up to 4.7x at the x10 point — GC pauses plus
        # localCheckpoint/shuffle spill landing on the root disk.  For
        # sweeps only: shuffle + block-spill dirs go to tmpfs (the box
        # has 126 GiB of /dev/shm; x10 per-query shuffle footprints are
        # a few GiB), and the single local JVM runs G1 with an earlier
        # concurrent-mark trigger so full-heap pauses stop landing inside
        # timed reps.  Cluster analog: fast local SSD scratch + G1 —
        # these confs are the defaults you'd set in spark-defaults.conf.
        shm = "/dev/shm/spark_graft_local"
        os.makedirs(shm, exist_ok=True)
        b = (b.config("spark.local.dir", shm)
              .config("spark.driver.extraJavaOptions",
                      "-XX:+UseG1GC -XX:InitiatingHeapOccupancyPercent=35"))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
