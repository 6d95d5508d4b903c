"""Invariants for the round-5 CDC/data-quality batch: null-safe join,
latest-wins compaction, Benford profile, MoM growth."""

import math

from pyspark.sql import functions as F

from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_null_safe_join_keeps_every_group(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_groups = docs.select("lang").distinct().count()
    rows = QUERIES["q_null_safe_join"](spark, SF).collect()
    assert len(rows) == n_groups
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_null_safe_join_with_null_keys(spark):
    """Inject NULL keys and check the NULL group survives the <=> join
    (a plain equi-join would drop it)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .withColumn("lang", F.when(F.col("doc_id") % 3 == 0, None)
                    .otherwise(F.col("lang")))
    a = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    b = (docs.groupBy(F.col("lang").alias("lang_b"))
             .agg(F.sum("n_chars").alias("total_chars")))
    j = a.join(b, F.col("lang").eqNullSafe(F.col("lang_b")))
    got = {r["lang"]: r["n_docs"] for r in j.collect()}
    assert None in got and got[None] > 0


def test_cdc_compact_one_row_per_key_and_latest(spark):
    from access_mopper_spark.sources.readers import load_table

    out = QUERIES["q_cdc_compact"](spark, SF)
    # load_table, not raw read: ts arrives TIMESTAMP_NTZ from parquet
    ev = load_table(spark, SF, "events")
    keys = ev.select("user_id", "event_type").distinct().count()
    rows = out.collect()
    assert len(rows) == keys
    latest = {(r["user_id"], r["event_type"]): r["m"]
              for r in ev.groupBy("user_id", "event_type")
              .agg(F.max(F.unix_micros("ts")).alias("m")).collect()}
    for r in rows:
        assert r["last_ts_us"] == latest[(r["user_id"], r["event_type"])]


def test_benford_probabilities(spark):
    rows = QUERIES["q_benford"](spark, SF).collect()
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert 1 <= r["digit"] <= 9
        assert abs(r["benford_p"]
                   - round(math.log10(1 + 1 / r["digit"]), 6)) < 2e-6


def test_mom_growth_delta_consistency(spark):
    rows = {r["month"]: r for r in
            QUERIES["q_mom_growth"](spark, SF).collect()}
    months = sorted(rows)
    for prev, cur in zip(months, months[1:]):
        r = rows[cur]
        if r["prev_cents"] is not None:
            assert r["delta_cents"] == r["rev_cents"] - r["prev_cents"]


def test_feature_vector_zscores_standardized(spark):
    """Across users each z-column has ~0 mean (exactly, up to rounding)
    and every row covers every user."""
    from access_mopper_spark.queries import QUERIES

    rows = QUERIES["q_feature_vector"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert len(rows) == ev.select("user_id").distinct().count()
    for col in ("z_events", "z_types", "z_days", "z_value"):
        vals = [r[col] for r in rows if r[col] is not None]
        if vals:
            assert abs(sum(vals) / len(vals)) < 1e-3
