"""Streaming session_window emission boundary: append mode finalizes a
session exactly when its end (last event + gap) is <= the final
watermark.  q_stream_sessions' oracle encodes that rule; this pins it
on a synthetic stream where one session ends EXACTLY at max event time
(emitted) and one ends after it (held as open state, not emitted)."""

import datetime
import os
import shutil
import uuid

from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)


def _write_stream_dir(spark, rows):
    d = f"/tmp/stream_sessions_{uuid.uuid4().hex}"
    os.makedirs(d)
    schema = StructType([StructField("user_id", LongType()),
                         StructField("ts", TimestampType())])
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(d)
    return d, schema


def test_session_emits_iff_end_at_or_before_watermark(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    gap = datetime.timedelta(minutes=10)
    # stream max ts = t0+40min (user 3's lone event).
    # user 1: one event at t0+30min -> session end t0+40min == watermark
    #         -> EMITTED (end <= watermark)
    # user 2: one event at t0+35min -> end t0+45min > watermark -> HELD
    rows = [(1, t0 + datetime.timedelta(minutes=30)),
            (2, t0 + datetime.timedelta(minutes=35)),
            (3, t0 + datetime.timedelta(minutes=40))]
    d, schema = _write_stream_dir(spark, rows)
    try:
        src = (spark.readStream.schema(schema).parquet(d)
               .withWatermark("ts", "0 seconds"))
        out = (src.groupBy("user_id",
                           F.session_window("ts", "10 minutes").alias("w"))
                  .agg(F.count("*").alias("n")))
        name = f"sess_{uuid.uuid4().hex[:8]}"
        q = (out.writeStream.format("memory").queryName(name)
                .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        emitted = {r["user_id"] for r in spark.table(name).collect()}
        assert 1 in emitted, "session ending exactly at watermark must emit"
        assert 2 not in emitted, "still-open session must be held as state"
        assert 3 not in emitted
    finally:
        shutil.rmtree(d, ignore_errors=True)
