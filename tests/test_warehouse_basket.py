"""Invariants for the round-5 warehouse batch: TPC-H Q3-shape shipping
priority, market-basket pair counts, funnel conversion latency."""

from pyspark.sql import functions as F

from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_shipping_priority_topk_shape(spark):
    rows = QUERIES["q_shipping_priority"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    revs = [r["rev_cents"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    for r in rows:
        assert str(r["orderdate"]) < "1998-01-01"


def test_cooccur_pairs_ordered_and_bruteforced(spark):
    rows = QUERIES["q_cooccur_parts"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["p1"] < r["p2"] and r["n_orders"] >= 1
    counts = [r["n_orders"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # brute-force the top pair's count independently
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    top = rows[0]
    n = (li.select("l_orderkey", "l_partkey").distinct()
           .groupBy("l_orderkey")
           .agg(F.collect_set("l_partkey").alias("ps"))
           .where(F.array_contains("ps", top["p1"])
                  & F.array_contains("ps", top["p2"]))
           .count())
    assert n == top["n_orders"]


def test_conversion_latency_quantile_order(spark):
    r = QUERIES["q_conversion_latency"](spark, SF).collect()[0]
    assert r["n_converted"] >= 0
    if r["n_converted"]:
        assert r["min_lat_us"] >= 0
        assert r["min_lat_us"] * 20 <= r["p50_x20"] <= r["p95_x20"] \
            <= r["max_lat_us"] * 20
