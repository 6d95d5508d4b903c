"""operators/evalmetrics: exact AUC (Mann-Whitney, tie-corrected),
reliability bins, and threshold-sweep confusion stats — verified against
brute-force pair counting / sklearn-free closed forms on small vectors.
"""

import pytest
from pyspark.sql import functions as F

from access_mopper_spark.operators.evalmetrics import (
    auc_roc, calibration_bins, confusion_at_thresholds)


def _brute_auc(pairs):
    """All-pairs AUC: (wins + 0.5*ties) / (P*N) over (score, label)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return num / (len(pos) * len(neg))


def test_auc_matches_brute_force_with_ties(spark):
    rows = [(1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (5, 1), (5, 1),
            (4, 0), (7, 1), (1, 1)]
    df = spark.createDataFrame(rows, "score long, label int")
    out = auc_roc(df, "score", "label").collect()[0]
    expect_bp = int(_brute_auc(rows) * 10000)  # exact: brute num2 is int
    assert out["n_pos"] == 6 and out["n_neg"] == 4
    assert out["auc_bp"] == expect_bp


def test_auc_perfect_and_inverted_and_degenerate(spark):
    perfect = spark.createDataFrame(
        [(10, 1), (11, 1), (1, 0), (2, 0)], "score long, label int")
    assert auc_roc(perfect, "score", "label").collect()[0]["auc_bp"] == 10000
    inverted = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 0), (11, 0)], "score long, label int")
    assert auc_roc(inverted, "score", "label").collect()[0]["auc_bp"] == 0
    one_class = spark.createDataFrame(
        [(1, 1), (2, 1)], "score long, label int")
    assert auc_roc(one_class, "score", "label").collect()[0]["auc_bp"] is None


def test_auc_grouped_independent(spark):
    rows = ([("a", s, y) for s, y in [(1, 0), (2, 1)]]
            + [("b", s, y) for s, y in [(1, 1), (2, 0)]])
    df = spark.createDataFrame(rows, "g string, score long, label int")
    out = {r["g"]: r["auc_bp"]
           for r in auc_roc(df, "score", "label", ["g"]).collect()}
    assert out == {"a": 10000, "b": 0}


def test_calibration_bins_exact_counts(spark):
    # two bins: prob 1000bp (bin 1) all negative, prob 9990bp (bin 9)
    # all positive → gaps are -1000 and +10
    rows = [(1000, 0)] * 4 + [(9990, 1)] * 5
    df = spark.createDataFrame(rows, "prob_bp long, label int")
    out = {r["bin"]: r for r in
           calibration_bins(df, "prob_bp", "label").collect()}
    assert set(out) == {1, 9}
    assert out[1]["n"] == 4 and out[1]["pos_rate_bp"] == 0
    assert out[1]["mean_pred_bp"] == 1000 and out[1]["gap_bp"] == -1000
    assert out[9]["n"] == 5 and out[9]["pos_rate_bp"] == 10000
    assert out[9]["gap_bp"] == 10

def test_calibration_top_cell_folds_into_last_bin(spark):
    df = spark.createDataFrame([(10000, 1)], "prob_bp long, label int")
    assert calibration_bins(df, "prob_bp", "label").collect()[0]["bin"] == 9


def test_confusion_sweep_closed_form(spark):
    rows = [(1, 0), (2, 0), (3, 1), (4, 1), (5, 1)]
    df = spark.createDataFrame(rows, "score long, label int")
    out = {r["threshold"]: r for r in
           confusion_at_thresholds(df, [3, 6], "score", "label").collect()}
    t3 = out[3]
    assert (t3["tp"], t3["fp"], t3["fn"], t3["tn"]) == (3, 0, 0, 2)
    assert t3["precision_bp"] == 10000 and t3["recall_bp"] == 10000
    assert t3["f1_bp"] == 10000
    t6 = out[6]  # nothing predicted positive
    assert (t6["tp"], t6["fp"], t6["fn"], t6["tn"]) == (0, 0, 3, 2)
    assert t6["precision_bp"] is None and t6["recall_bp"] == 0
    assert t6["f1_bp"] == 0


def test_auc_plan_windows_only_aggregated_table(spark):
    """The window must consume the per-score AGGREGATE, not raw rows:
    below the Window node the plan still holds the per-score
    HashAggregate pair (partial + final) — i.e. the raw table is
    collapsed BEFORE the sort, so the sorted payload is |distinct
    scores|, not |rows|."""
    df = spark.createDataFrame(
        [(i % 7, (i * 13) % 2) for i in range(100)],
        "score long, label int")
    plan = (auc_roc(df, "score", "label")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" in plan
    below_window = plan[plan.index("Window"):]
    assert below_window.count("HashAggregate") >= 2, below_window


def test_poisson_bootstrap_deterministic_and_ordered(spark):
    from access_mopper_spark.operators.evalmetrics import (
        poisson_bootstrap_ci)
    rows = [("g", i, (i * 37) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, id long, x long")
    out1 = poisson_bootstrap_ci(df, "x", ["grp"], "id",
                                replicates=20).collect()[0]
    # partitioning must not change ANY output value (hash weights, not RNG)
    out2 = poisson_bootstrap_ci(df.repartition(13), "x", ["grp"], "id",
                                replicates=20).collect()[0]
    assert out1 == out2
    assert out1["n_rows"] == 200
    assert out1["boot_lo"] <= out1["point_mean"] <= out1["boot_hi"]
    # a 95% CI on 200 iid rows is tight around the mean, not degenerate
    assert out1["boot_lo"] < out1["boot_hi"]


def test_poisson_bootstrap_point_mean_exact(spark):
    from access_mopper_spark.operators.evalmetrics import (
        poisson_bootstrap_ci)
    df = spark.createDataFrame([("a", 1, 10), ("a", 2, 20), ("a", 3, 30)],
                               "grp string, id long, x long")
    out = poisson_bootstrap_ci(df, "x", ["grp"], "id",
                               replicates=8).collect()[0]
    assert out["point_mean"] == 20.0 and out["n_rows"] == 3


def test_poisson_bootstrap_requires_groups(spark):
    from access_mopper_spark.operators.evalmetrics import (
        poisson_bootstrap_ci)
    df = spark.createDataFrame([("a", 1, 10)], "grp string, id long, x long")
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "x", [], "id")


def test_poisson_bootstrap_weight_distribution(spark):
    """The md5-lane weights are ~Poisson(1): over many (id, rep) draws
    the zero-weight share sits near 1/e and the mean weight near 1."""
    from access_mopper_spark.operators.evalmetrics import (
        _POISSON1_CDF_2P32)
    from pyspark.sql import functions as F
    n = 20000
    df = spark.range(n).select(
        F.conv(F.substring(F.md5(F.concat(F.lit("t:"),
            F.col("id").cast("string"))), 1, 8), 16, 10).cast("long")
        .alias("lane"))
    w = sum((F.col("lane") >= F.lit(t)).cast("long")
            for t in _POISSON1_CDF_2P32)
    stats = df.select(F.avg(w).alias("mean_w"),
                      F.avg((w == 0).cast("double")).alias("p0")).collect()[0]
    assert abs(stats["mean_w"] - 1.0) < 0.02
    assert abs(stats["p0"] - 0.3679) < 0.01


def test_retrieval_eval_perfect_and_partial(spark):
    from access_mopper_spark.operators.evalmetrics import retrieval_eval
    import math
    # q1: retrieved in ideal order (ndcg=1, mrr=1); q2: first relevant
    # at rank 2 (mrr=0.5)
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)],
        "query_id long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 1), (2, 21, 2)],
        "query_id long, doc_id long, rel long")
    out = {r["query_id"]: r
           for r in retrieval_eval(results, qrels, k=10).collect()}
    assert out[1]["ndcg"] == 1.0 and out[1]["mrr"] == 1.0
    assert out[1]["n_rel_retrieved"] == 2
    assert out[2]["mrr"] == 0.5
    # q2 dcg = 3/log2(3); idcg = 3/log2(2) = 3 → ndcg = log2(2)/log2(3)
    expect = round((3 / math.log2(3)) / 3.0 + 1e-12, 6)
    assert abs(out[2]["ndcg"] - expect) < 2e-6


def test_retrieval_eval_no_judged_docs(spark):
    from access_mopper_spark.operators.evalmetrics import retrieval_eval
    results = spark.createDataFrame([(1, 10, 1)],
                                    "query_id long, doc_id long, rank long")
    qrels = spark.createDataFrame([(9, 99, 1)],
                                  "query_id long, doc_id long, rel long")
    out = retrieval_eval(results, qrels, k=10).collect()[0]
    assert out["ndcg"] == 0.0 and out["mrr"] == 0.0
    assert out["n_rel_retrieved"] == 0


def test_rrf_fuse_prefers_doc_in_both_lists(spark):
    from access_mopper_spark.operators.evalmetrics import rrf_fuse
    a = spark.createDataFrame([(1, 100, 1), (1, 101, 2)],
                              "query_id long, doc_id long, rank long")
    b = spark.createDataFrame([(1, 101, 1), (1, 102, 2)],
                              "query_id long, doc_id long, rank long")
    out = rrf_fuse([a, b], k=60, topk=10).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # 101 appears in both lists → highest fused score, rank 1
    assert by_doc[101]["fused_rank"] == 1 and by_doc[101]["n_lists"] == 2
    assert by_doc[100]["n_lists"] == 1
    # rank-1-in-one-list beats rank-2-in-one-list
    assert by_doc[100]["rrf_score"] > by_doc[102]["rrf_score"]


def test_krippendorff_alpha_closed_form(spark):
    """Hand-computed: items A(1,1), B(1,0), C(0,0), D(1) (D unpairable).
    n=6 pairable values, n1=3, n0=3, S = 0 + 1 + 0 = 1.
    alpha = 1 - 5*1/(3*3) = 4/9."""
    from access_mopper_spark.operators.ml import krippendorff_alpha_binary
    rows = [("A", 1), ("A", 1), ("B", 1), ("B", 0), ("C", 0), ("C", 0),
            ("D", 1)]
    df = spark.createDataFrame(rows, "item string, vote int")
    out = krippendorff_alpha_binary(df).collect()[0]
    assert out["n_items"] == 3 and out["n_values"] == 6
    assert out["n_pos"] == 3
    assert abs(out["alpha"] - 4.0 / 9.0) < 2e-6


def test_krippendorff_alpha_perfect_agreement(spark):
    from access_mopper_spark.operators.ml import krippendorff_alpha_binary
    rows = [("A", 1), ("A", 1), ("B", 0), ("B", 0)]
    df = spark.createDataFrame(rows, "item string, vote int")
    assert krippendorff_alpha_binary(df).collect()[0]["alpha"] == 1.0


def test_krippendorff_alpha_degenerate_single_class(spark):
    from access_mopper_spark.operators.ml import krippendorff_alpha_binary
    rows = [("A", 1), ("A", 1), ("B", 1), ("B", 1)]
    df = spark.createDataFrame(rows, "item string, vote int")
    assert krippendorff_alpha_binary(df).collect()[0]["alpha"] is None


def test_padding_waste_exact(spark):
    from access_mopper_spark.operators.sampling import padding_waste
    # lens 10, 64 → bucket 64 (waste = 128-74); 100 → 128; 9999 → 1024
    # truncated
    df = spark.createDataFrame([(10,), (64,), (100,), (9999,)],
                               "toks long")
    out = {r["bucket_bound"]: r
           for r in padding_waste(df, "toks", [64, 128, 1024]).collect()}
    b64 = out[64]
    assert b64["n_seqs"] == 2 and b64["sum_tokens"] == 74
    assert b64["padded_slots"] == 128
    assert b64["waste_bp"] == (128 - 74) * 10000 // 128
    assert out[128]["waste_bp"] == (128 - 100) * 10000 // 128
    big = out[1024]
    assert big["n_truncated"] == 1 and big["sum_tokens"] == 9999
    assert big["waste_bp"] == 0  # truncated seq fills its slot exactly


def test_corpus_diff_statuses(spark):
    from access_mopper_spark.operators.profile import corpus_diff
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, fp string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "doc_id long, fp string")
    out = {r["status"]: r["n_docs"]
           for r in corpus_diff(old, new).collect()}
    assert out == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


# ---- property tests (hypothesis): AUC distributive identity ----

from hypothesis import given, settings, strategies as st

_pairs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),
              st.integers(min_value=0, max_value=1)),
    min_size=4, max_size=40).filter(
        lambda ps: any(y == 1 for _, y in ps)
        and any(y == 0 for _, y in ps))


@settings(max_examples=10, deadline=None)
@given(pairs=_pairs)
def test_auc_property_matches_brute_force(spark, pairs):
    """For ANY score/label multiset with both classes present, the
    per-score-count rank formula equals all-pairs counting."""
    df = spark.createDataFrame(pairs, "score long, label int")
    out = auc_roc(df, "score", "label").collect()[0]
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num2 = sum(2 if p > n else (1 if p == n else 0)
               for p in pos for n in neg)
    assert out["auc_bp"] == num2 * 10000 // (2 * len(pos) * len(neg))


@settings(max_examples=8, deadline=None)
@given(pairs=_pairs)
def test_confusion_property_counts_partition(spark, pairs):
    """tp+fp+fn+tn == n at every threshold, and recall is monotone
    non-increasing in the threshold."""
    df = spark.createDataFrame(pairs, "score long, label int")
    ts = [0, 3, 7]
    rows = {r["threshold"]: r for r in
            confusion_at_thresholds(df, ts, "score", "label").collect()}
    n = len(pairs)
    recalls = []
    for t in ts:
        r = rows[t]
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        recalls.append(r["recall_bp"])
    assert recalls == sorted(recalls, reverse=True)


def test_corpus_diff_null_fp_is_presence_safe(spark):
    """A doc present in BOTH snapshots with a NULL fingerprint on one
    side is 'changed' (not 'added'/'removed'); NULL==NULL fingerprints
    compare as unchanged (null-safe equality)."""
    from access_mopper_spark.operators.profile import corpus_diff
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "c")], "doc_id long, fp string")
    new = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, None)], "doc_id long, fp string")
    out = {r["status"]: r["n_docs"]
           for r in corpus_diff(old, new).collect()}
    assert out == {"changed": 2, "unchanged": 1}


def test_krippendorff_null_votes_drop(spark):
    """A NULL vote is a missing judgment, not a 0: item A's phantom
    pair must not fire a disagreement term, and A becomes an
    unpairable singleton when only one real vote remains."""
    from access_mopper_spark.operators.ml import krippendorff_alpha_binary
    rows = [("A", 1), ("A", None), ("B", 1), ("B", 1), ("C", 0), ("C", 0)]
    df = spark.createDataFrame(rows, "item string, vote int")
    out = krippendorff_alpha_binary(df).collect()[0]
    assert out["n_items"] == 2 and out["n_values"] == 4
    assert out["alpha"] == 1.0  # perfect agreement on the real votes


def test_padding_waste_empty_bounds_raises(spark):
    from access_mopper_spark.operators.sampling import padding_waste
    df = spark.createDataFrame([(10,)], "toks long")
    with pytest.raises(ValueError):
        padding_waste(df, "toks", [])


def test_embedding_drift_partition_invariant(spark):
    """The micro-grid snap happens per ELEMENT, so repartitioning must
    not change a single output value (no summation-order surface)."""
    from access_mopper_spark.operators.drift import embedding_centroid_drift
    import random
    rng = random.Random(7)
    rows = [(i % 2, [rng.uniform(-1, 1) for _ in range(16)])
            for i in range(300)]
    df = spark.createDataFrame(rows, "side int, embedding array<double>")
    a = embedding_centroid_drift(df, "side").collect()[0]
    b = embedding_centroid_drift(df.repartition(17), "side").collect()[0]
    assert a == b
    assert a["n_dims"] == 16 and a["cosine"] is not None
