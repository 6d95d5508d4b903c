"""global_rank: permutation parity with the unpartitioned formulation,
plus Gini/decile invariants."""

import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from access_mopper_spark.operators.ranking import global_rank
from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_global_rank_matches_unpartitioned_window(spark):
    rng = random.Random(3)
    rows = [(i, rng.randrange(0, 500)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "x"]) \
        .select("id", F.col("x").cast("long"))
    got = global_rank(df, "x", ["id"], out_col="rk", n_buckets=16)
    ref = df.withColumn("rk_ref",
                        F.row_number().over(W.orderBy("x", "id")))
    j = got.join(ref, ["id", "x"]).collect()
    assert len(j) == 1000
    assert all(r["rk"] == r["rk_ref"] for r in j)


def test_global_rank_bucket_count_invariance(spark):
    rng = random.Random(9)
    rows = [(i, rng.randrange(0, 40)) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "x"]) \
        .select("id", F.col("x").cast("long"))
    a = {r["id"]: r["rk"] for r in
         global_rank(df, "x", ["id"], out_col="rk", n_buckets=1).collect()}
    b = {r["id"]: r["rk"] for r in
         global_rank(df, "x", ["id"], out_col="rk", n_buckets=64).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, 301))


def test_gini_in_unit_interval_and_extremes(spark):
    r = QUERIES["q_gini"](spark, SF).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    # perfectly equal spend -> gini 0
    df = spark.createDataFrame([(i, 100) for i in range(50)],
                               ["o_custkey", "cents"]) \
        .select("o_custkey", F.col("cents").cast("long"))
    rk = global_rank(df, "cents", ["o_custkey"], out_col="rk")
    n = F.count("*")
    g = rk.agg(
        ((2 * F.sum(F.col("rk") * F.col("cents"))).cast("double")
         / (n.cast("double") * F.sum("cents"))
         - (n + 1).cast("double") / n).alias("g")).collect()[0]["g"]
    assert abs(g) < 1e-9


def test_decile_lift_partitions_everyone(spark):
    rows = QUERIES["q_decile_lift"](spark, SF).collect()
    od = spark.read.parquet(f"{SF}/orders.parquet")
    n_cust = od.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert {r["decile"] for r in rows} <= set(range(1, 11))
    # monotone: a higher decile's mean spend is >= the lower's
    by_d = sorted(rows, key=lambda r: r["decile"])
    means = [r["sum_cents"] / r["n_customers"] for r in by_d]
    assert all(a <= b + 1e-9 for a, b in zip(means, means[1:]))
