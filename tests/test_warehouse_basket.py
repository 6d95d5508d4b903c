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


def test_volume_shipping_symmetric_slices(spark):
    """Both trade directions appear and revenue reconciles with a
    DataFrame-API recomputation (SQL front-end vs DataFrame parity)."""
    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table

    rows = QUERIES["q_volume_shipping"](spark, SF).collect()
    # the smoke slice may legitimately be empty at sf0.001; the
    # reconciliation below must still agree (0 == 0)
    dirs = {(r["supp_nation"], r["cust_nation"]) for r in rows}
    assert dirs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    li = load_table(spark, SF, "lineitem")
    od = load_table(spark, SF, "orders")
    cu = load_table(spark, SF, "customer")
    su = load_table(spark, SF, "supplier")
    na = load_table(spark, SF, "nation")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100 + F.lit(0.5)).cast("long")
    df = (li.join(su, li["l_suppkey"] == su["s_suppkey"])
            .join(od, li["l_orderkey"] == od["o_orderkey"])
            .join(cu, od["o_custkey"] == cu["c_custkey"])
            .join(na.alias("n1"), F.col("s_nationkey") == F.col("n1.n_nationkey"))
            .join(na.alias("n2"), F.col("c_nationkey") == F.col("n2.n_nationkey"))
            .where(((F.col("n1.n_name") == "NATION_1")
                    & (F.col("n2.n_name") == "NATION_2"))
                   | ((F.col("n1.n_name") == "NATION_2")
                      & (F.col("n2.n_name") == "NATION_1")))
            .agg(F.sum(cents).alias("s")).collect()[0]["s"])
    assert sum(r["rev_cents"] for r in rows) == (df or 0)


def test_embedding_norm_outliers_above_threshold(spark):
    from access_mopper_spark.queries import QUERIES

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_total = emb.count()
    rows = QUERIES["q_embedding_norm_outliers"](spark, SF).collect()
    # strictly-above-P99 keeps at most ~1% (plus interpolation slack)
    assert 0 < len(rows) <= max(1, int(0.02 * n_total))
