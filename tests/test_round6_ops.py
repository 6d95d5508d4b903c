"""Round-6 operator units: portable HLL registers, distributed logreg,
kNN labeling — properties that the in-query merge-law/oracle checks
don't pin (estimator accuracy bounds, separability convergence, vote
tie-breaks)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from access_mopper_spark.operators.ml import (knn_classify, logreg_apply,
                                              logreg_train)
from access_mopper_spark.operators.sketch import (hll_estimate, hll_merge,
                                                  hll_registers)


# ---------------------------------------------------------------- HLL

def test_hll_estimate_within_rse_bound(spark):
    # p=6 → m=64 → RSE ≈ 1.04/8 = 13%; bound = 3σ ≈ 0.39.  The md5
    # hash is deterministic so the observed error is a fixed number —
    # the assert pins it inside the statistical bound, it is not itself
    # a statistical test.
    n = 5000
    df = spark.range(n).select(F.col("id").alias("item"))
    est = hll_estimate(hll_registers(df, "item", p=6), p=6).collect()[0][0]
    assert abs(est - n) / n < 0.39


def test_hll_merge_equals_direct(spark):
    df = spark.range(2000).select(
        F.col("id").alias("item"), (F.col("id") % 7).alias("g"))
    per_g = hll_registers(df, "item", ["g"], p=6)
    merged = hll_merge(per_g)                      # fold groups out
    direct = hll_registers(df, "item", p=6)
    diff = merged.alias("m").join(direct.alias("d"), "bucket", "full") \
        .where(F.col("m.rho").eqNullSafe(F.col("d.rho")) == False)  # noqa: E712
    assert diff.count() == 0


def test_hll_register_count_bounded(spark):
    df = spark.range(100000).select(F.col("id").alias("item"))
    assert hll_registers(df, "item", p=6).count() <= 64


def test_hll_small_range_linear_counting_is_near_exact(spark):
    # 5 distincts among 64 registers → linear counting regime, tight
    df = spark.range(5).select(F.col("id").alias("item"))
    est = hll_estimate(hll_registers(df, "item", p=6), p=6).collect()[0][0]
    assert abs(est - 5) < 2.5


# ------------------------------------------------------------- logreg

def _sep_df(spark):
    # linearly separable in x0: y = 1 iff x0 > 0
    rows = [Row(i=i, x0=(1.0 + 0.1 * i), x1=0.5, y=1) for i in range(20)]
    rows += [Row(i=100 + i, x0=(-1.0 - 0.1 * i), x1=0.5, y=0)
             for i in range(20)]
    return spark.createDataFrame(rows)


def test_logreg_separable_reaches_full_accuracy(spark):
    df = _sep_df(spark)
    w = logreg_train(df, ["x0", "x1"], "y", iterations=5, lr=1.0)
    preds = logreg_apply(df, w, ["x0", "x1"], "y", "i")
    acc = preds.where(F.col("pred") == F.col("y")).count() / preds.count()
    assert acc == 1.0


def test_logreg_weights_on_grid_and_finite(spark):
    df = _sep_df(spark)
    row = logreg_train(df, ["x0", "x1"], "y", iterations=3).collect()[0]
    for v in row:
        assert math.isfinite(v)
        assert abs(v * 1e6 - round(v * 1e6)) < 1e-3  # 1e-6 grid


# ---------------------------------------------------------------- kNN

def test_knn_majority_vote_and_tiebreak(spark):
    # corpus: 3 vectors near +x labeled 1, 2 near +y labeled 2
    corpus = spark.createDataFrame([
        Row(vec_id=1, label=1, embedding=[1.0, 0.0]),
        Row(vec_id=2, label=1, embedding=[0.9, 0.1]),
        Row(vec_id=3, label=1, embedding=[1.0, 0.05]),
        Row(vec_id=4, label=2, embedding=[0.0, 1.0]),
        Row(vec_id=5, label=2, embedding=[0.1, 0.9]),
    ])
    queries = spark.createDataFrame([
        Row(query_id=10, embedding=[1.0, 0.01]),
        Row(query_id=11, embedding=[0.01, 1.0]),
    ])
    got = {r.query_id: (r.pred_label, r.n_votes)
           for r in knn_classify(corpus, queries, k=3).collect()}
    assert got[10] == (1, 3)
    assert got[11][0] == 2          # 2 votes for label 2, 1 for label 1
    assert got[11][1] == 2


def test_knn_vote_tie_prefers_smaller_label(spark):
    corpus = spark.createDataFrame([
        Row(vec_id=1, label=7, embedding=[1.0, 0.0]),
        Row(vec_id=2, label=3, embedding=[0.9, 0.1]),
    ])
    queries = spark.createDataFrame([Row(query_id=1, embedding=[1.0, 0.05])])
    r = knn_classify(corpus, queries, k=2).collect()[0]
    assert (r.pred_label, r.n_votes) == (3, 1)
