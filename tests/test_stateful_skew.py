"""Stateful streaming (applyInPandasWithState) and skew-salting tests."""

from pyspark.sql import functions as F

from access_mopper_spark.operators.skew import explode_salt_join, salted_agg


def test_stateful_running_totals_matches_batch(spark, sf_dir):
    from access_mopper_spark.sources.readers import load_table
    from access_mopper_spark.streaming.resample import events_stream
    from access_mopper_spark.streaming.stateful import (run_stateful_to_memory,
                                                        running_totals)

    raw = events_stream(spark, sf_dir)
    res = running_totals(raw.select("user_id", "value"), "user_id", "value")
    run_stateful_to_memory(res, "stateful_totals_sink")
    # last emitted row per key is the final running total
    got = (
        spark.table("stateful_totals_sink")
        .groupBy("user_id").agg(F.max_by("total", "n").alias("total"),
                                F.max("n").alias("n"))
    )
    got_map = {r["user_id"]: (r["n"], round(r["total"], 6)) for r in got.collect()}

    ev = load_table(spark, sf_dir, "events")
    want = ev.groupBy("user_id").agg(F.count("value").alias("n"),
                                     F.round(F.sum("value"), 6).alias("total"))
    want_map = {r["user_id"]: (r["n"], r["total"]) for r in want.collect()}
    assert got_map == want_map


def test_salted_agg_matches_direct(spark, sf_dir):
    from access_mopper_spark.sources.readers import load_table
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_agg(li, ["l_returnflag"], "l_quantity", n_salts=8)
    direct = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum"), F.count("l_quantity").alias("count"),
        F.min("l_quantity").alias("min"), F.max("l_quantity").alias("max"))
    s = {r["l_returnflag"]: (round(r["sum"], 6), r["count"], r["min"], r["max"])
         for r in salted.collect()}
    d = {r["l_returnflag"]: (round(r["sum"], 6), r["count"], r["min"], r["max"])
         for r in direct.collect()}
    assert s == d


def test_explode_salt_join_matches_plain(spark, sf_dir):
    from access_mopper_spark.sources.readers import load_table
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment") \
        .withColumnRenamed("c_custkey", "o_custkey")
    salted = explode_salt_join(orders, cust, "o_custkey", n_salts=4)
    plain = orders.join(cust, "o_custkey")
    assert salted.count() == plain.count()
    sa = salted.groupBy("c_mktsegment").count().collect()
    pl = plain.groupBy("c_mktsegment").count().collect()
    assert {(r[0], r[1]) for r in sa} == {(r[0], r[1]) for r in pl}


def test_stream_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """File-sink streaming with a checkpoint: stopping and restarting the
    query must not duplicate output (exactly-once file sink semantics)."""
    from access_mopper_spark.streaming.resample import (events_stream,
                                                        stream_resample)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = events_stream(spark, sf_dir).select("user_id", "ts", "value")
        # append mode requires the watermark to close windows
        res = stream_resample(stream, "ts", "value", "1 hour", how="sum",
                              group_cols=["user_id"], watermark="1 hour")
        q = (res.writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out_dir).count()
    run_once()   # restart from checkpoint: no new input -> no new rows
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == n2 and n1 > 0


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Streaming exact dedup (training-data op on an unbounded source):
    dropDuplicatesWithinWatermark keys the state store by event_id; a
    re-delivered duplicate within the watermark is dropped."""
    from access_mopper_spark.streaming.resample import events_stream

    stream = events_stream(spark, sf_dir).select("event_id", "ts")
    # duplicate every record, then dedup by key within the watermark
    doubled = stream.union(stream)
    deduped = doubled.withWatermark("ts", "1 day") \
                     .dropDuplicatesWithinWatermark(["event_id"])
    q = (deduped.writeStream.format("memory").queryName("dedup_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("dedup_sink").count()
    from access_mopper_spark.sources.readers import load_table
    want = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got == want
