"""Structured Streaming resample: the reference's tumbling-window
downsample (calculations.py:68-137) lifted onto an unbounded source.

The reference is purely batch (SURVEY.md §2.5); this is the natural Spark
extension: ``readStream`` → event-time watermark → windowed aggregate →
sink.  Late data within the watermark updates its window; beyond it, state
is dropped — the property that bounds state size on an infinite stream
(a batch resample at 100 TB has the same shuffle shape, so the two paths
share semantics: same window width, same closed-right label convention).

``run_to_memory`` drives a stream with ``Trigger.AvailableNow`` into a
named in-memory sink and blocks until drained — how the oracle-checked
query and tests consume a finite stream deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AGGS = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}


def stream_source(spark: SparkSession, path: str, schema, glob: str | None = None) -> DataFrame:
    """File-stream over a parquet directory with a declared schema
    (streaming scans cannot infer; FileStreamSource requires a directory,
    so single files are selected via ``pathGlobFilter``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # window edges must not drift with host session TZ
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(path)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over ``events.parquet`` with ``ts`` normalized to a plain
    UTC ``timestamp``, whatever physical type the generator used.

    Streaming scans cannot infer a schema, and the testdata's ``ts`` column
    has appeared as TIMESTAMP(NANOS) (needs ``nanosAsLong`` + ns→µs floor),
    tz-less TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ), and adjusted-to-UTC
    TIMESTAMP(MICROS) across driver runs — so probe the batch reader's
    resolved schema once (footer-only, no data scan) and declare the stream
    schema to match."""
    import os

    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    ts_type = dict(spark.read.parquet(path).dtypes)["ts"]
    fields = [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # placeholder, fixed below
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
    if ts_type != "bigint":
        from pyspark.sql.types import _parse_datatype_string

        fields[1] = StructField("ts", _parse_datatype_string(ts_type))
    raw = stream_source(spark, sf_dir, StructType(fields), glob="events.parquet")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def stream_resample(stream: DataFrame, ts_col: str, value_col: str, every: str,
                    how: str = "mean", group_cols: list[str] | None = None,
                    watermark: str = "1 day") -> DataFrame:
    """Watermarked tumbling-window aggregate.

    Labels use the window START (Spark's streaming convention; bins are
    [start, end) in event time).  Note this differs from the batch
    ``time_resample`` default, which re-centres labels to the bin middle
    per the reference (calculations.py:111-113) — downstream consumers
    re-label with ``start + width/2`` when parity with batch output is
    needed.
    """
    group_cols = group_cols or []
    agg = AGGS[how]
    w = stream.withWatermark(ts_col, watermark)
    return (
        w.groupBy(F.window(ts_col, every).alias("__w"), *group_cols)
        .agg(agg(value_col).alias(f"{value_col}_{how}"))
        .select(F.col("__w.start").alias(ts_col), *group_cols,
                f"{value_col}_{how}")
    )


import contextlib


@contextlib.contextmanager
def harness_shuffle(spark: SparkSession, n: int = 8):
    """Scope the session's shuffle partitions down for a finite harness
    stream: a stateful streaming query spins one state-store task per
    shuffle partition EVERY micro-batch, so 32 partitions over a
    single-file stream is pure task-launch overhead (~2× wall time at
    sf0.1).  A production deployment sizes state partitions to throughput
    at query start instead — this scoping is harness-only."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def run_to_memory(resampled: DataFrame, name: str, mode: str = "complete") -> None:
    """Execute the stream with AvailableNow into memory sink ``name`` and
    block until all available input is processed."""
    q = (
        resampled.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(availableNow=True).start()
    )
    q.awaitTermination()


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key: str, left_ts: str, right_ts: str,
                         within: str, watermark: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with right events of the same key whose timestamp falls in
    (left_ts, left_ts + within].  The canonical attribution shape
    (view→purchase within 30 min) that batch interval joins express as
    an equi-key + range predicate — identical semantics here, but over
    unbounded inputs.

    Both sides carry watermarks plus the range condition, which is what
    lets Spark BOUND THE JOIN STATE: a buffered left row can be evicted
    once the right watermark passes left_ts + within (state does not
    grow with the stream).  The key equality carries the shuffle; the
    interval is a post-match predicate — same plan skeleton as the
    batch range join, so the two paths stay semantically aligned."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = F.expr(
        f"l.{key} = r.{key} AND r.{right_ts} > l.{left_ts} "
        f"AND r.{right_ts} <= l.{left_ts} + INTERVAL {within}")
    return lw.alias("l").join(rw.alias("r"), cond)


def stream_interval_join_outer(left: DataFrame, right: DataFrame,
                               key: str, left_ts: str, right_ts: str,
                               within: str,
                               watermark: str = "1 hour") -> DataFrame:
    """LEFT OUTER watermarked interval join: like
    ``stream_interval_join`` but unmatched left rows are ALSO emitted
    (right columns null) — the attribution shape that must report
    non-converting views, not only conversions.

    The outer semantics are tied to state eviction: an unmatched left
    row is null-emitted only once the global watermark (min over both
    inputs of max-event-time − delay) passes ``left_ts + within`` —
    rows younger than that horizon are still awaiting a possible match
    when a finite run ends and are NOT emitted.  Any batch oracle must
    replicate exactly that cutoff (see q_stream_join_outer)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = F.expr(
        f"l.{key} = r.{key} AND r.{right_ts} > l.{left_ts} "
        f"AND r.{right_ts} <= l.{left_ts} + INTERVAL {within}")
    return lw.alias("l").join(rw.alias("r"), cond, "leftOuter")


def stream_exact_dedup(stream: DataFrame, id_cols: list[str], ts_col: str,
                       watermark: str = "1 hour") -> DataFrame:
    """Ingest-time EXACT dedup over an unbounded stream:
    ``dropDuplicatesWithinWatermark`` keeps the first arrival per key and
    discards re-deliveries (at-least-once sources, overlapping backfills)
    while the key is younger than the watermark — after which its state
    row is EVICTED, so dedup state is bounded by (arrival rate ×
    watermark), not by stream history.  The exact-key complement of
    ``streaming``'s LSH near-dup ingest dedup: same keyed state-store
    shape, hash key instead of band key."""
    return (stream.withWatermark(ts_col, watermark)
                  .dropDuplicatesWithinWatermark(id_cols))
