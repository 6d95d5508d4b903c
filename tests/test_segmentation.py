"""Invariants for the round-5 segmentation batch: RFM quintiles, XYZ
demand variability, basket lift."""

import math

from pyspark.sql import functions as F

from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_rfm_scores_in_range_and_balanced(spark):
    rows = QUERIES["q_rfm_segmentation"](spark, SF).collect()
    od = spark.read.parquet(f"{SF}/orders.parquet")
    assert len(rows) == od.select("o_custkey").distinct().count()
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5
        assert r["rfm_code"] == 100 * r["r_score"] + 10 * r["f_score"] \
            + r["m_score"]
    # monetary quintiles roughly balanced (ties can skew; each bin
    # holds somewhere between 5% and 45%)
    n = len(rows)
    for q in range(1, 6):
        share = sum(1 for r in rows if r["m_score"] == q) / n
        assert 0.05 <= share <= 0.45


def test_demand_variability_class_matches_cv(spark):
    rows = QUERIES["q_demand_variability"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["cv"] >= 0
        # the integer-exact class agrees with the reported cv except
        # exactly at a boundary (where the integer form is the truth)
        if r["xyz"] == "X":
            assert r["cv"] <= 0.500001
        elif r["xyz"] == "Y":
            assert 0.499999 <= r["cv"] <= 1.000001
        else:
            assert r["cv"] >= 0.999999


def test_basket_lift_formula(spark):
    rows = QUERIES["q_basket_lift"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().count()
    sup = {r["l_partkey"]: r["n"] for r in
           items.groupBy("l_partkey").agg(F.count("*").alias("n")).collect()}
    for r in rows:
        assert r["n_a"] == sup[r["p1"]] and r["n_b"] == sup[r["p2"]]
        expect = r["n_ab"] * n_orders / (r["n_a"] * r["n_b"])
        assert math.isclose(r["lift"], round(expect, 6), rel_tol=1e-6)
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
