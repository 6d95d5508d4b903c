"""Format breadth (ORC/CSV/JSON sinks+sources round-trip through the
engine's tables) and the streaming-merge pattern (foreachBatch applying a
batch upsert per micro-batch — how a stream maintains a dimension table
without an ACID format)."""

from pyspark.sql import functions as F

from access_mopper_spark.sources.readers import load_table


def test_orc_csv_json_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    want = sorted(map(tuple, nation.collect()))
    for fmt in ("orc", "json", "csv"):
        path = str(tmp_path / fmt)
        w = nation.write.mode("overwrite")
        r = spark.read
        if fmt == "csv":
            w = w.option("header", "true")
            r = r.option("header", "true").schema(nation.schema)
        elif fmt == "json":
            r = r.schema(nation.schema)
        getattr(w, "format")(fmt).save(path)
        back = getattr(r, "format")(fmt).load(path)
        assert sorted(map(tuple, back.collect())) == want, fmt


def test_foreachbatch_streaming_upsert(spark, sf_dir, tmp_path):
    """Maintain a keyed latest-value table from a stream: every
    micro-batch reduces to one row per key and merges into the target
    via the batch upsert — the foreachBatch pattern that stands in for
    MERGE INTO when no ACID table format is attached."""
    from access_mopper_spark.streaming.resample import events_stream

    target_dir = str(tmp_path / "target")
    state = {"df": None}

    def merge(batch_df, batch_id):
        latest = (batch_df.groupBy("user_id")
                  .agg(F.max_by("value", "ts").alias("value"),
                       F.max("ts").alias("ts")))
        cur = state["df"]
        if cur is None:
            merged = latest
        else:
            keep = cur.join(latest.select("user_id"), "user_id", "left_anti")
            merged = keep.unionByName(latest)
        state["df"] = merged.localCheckpoint()  # cut lineage per batch

    stream = events_stream(spark, sf_dir).select("user_id", "ts", "value")
    q = (stream.writeStream.foreachBatch(merge)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {r["user_id"]: r["value"] for r in state["df"].collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {r["user_id"]: r["value"] for r in
            ev.groupBy("user_id")
              .agg(F.max_by("value", "ts").alias("value")).collect()}
    assert got == want
