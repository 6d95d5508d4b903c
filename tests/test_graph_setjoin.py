"""Hand-computed fixtures for the round-5 graph/set-join operators:
degree-oriented triangle counting and the prefix-filter exact Jaccard
self-join (operators/graph.triangle_counts, dedup.prefix_filter_join)."""

from pyspark.sql import functions as F

from access_mopper_spark.operators.dedup import prefix_filter_join
from access_mopper_spark.operators.graph import triangle_counts


def test_triangle_counts_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant edge
    # 4-5 (no triangle) and a disjoint triangle {6,7,8}.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (6, 7), (7, 8), (6, 8)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["triangles"]
           for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}


def test_triangle_counts_canonicalizes_input(spark):
    # duplicates, reversed direction, and self-loops must not change
    # the count: one triangle {1,2,3}
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["triangles"]
           for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_prefix_filter_join_exact_pairs(spark):
    # doc 1 vs 2: J = 3/5 = 0.6; doc 1 vs 3: J = 1 (same set, dup
    # tokens collapse); doc 4 disjoint.  At t=0.6 pairs (1,2), (1,3),
    # (2,3) qualify; at t=0.8 only the identical pair survives.
    rows = [(1, "a b c d"), (2, "a b c e"), (3, "a b c d d a"),
            (4, "x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lo = {(r["id_a"], r["id_b"]): (r["inter"], r["uni"])
          for r in prefix_filter_join(df, threshold=0.6).collect()}
    assert lo == {(1, 2): (3, 5), (1, 3): (4, 4), (2, 3): (3, 5)}
    hi = {(r["id_a"], r["id_b"]): (r["inter"], r["uni"])
          for r in prefix_filter_join(df, threshold=0.8).collect()}
    assert hi == {(1, 3): (4, 4)}


def test_prefix_filter_join_hostile_whitespace_and_nulls(spark):
    # trailing tab, embedded vertical tab, NULL and empty docs: the
    # tokenizer must follow the repo's explicit [ \t\n\r] convention
    # and NULL/empty docs must simply produce no pairs.
    rows = [(1, "alpha beta\tgamma\t"), (2, "alpha beta gamma"),
            (3, None), (4, ""), (5, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["uni"])
          for r in prefix_filter_join(df, threshold=0.8).collect()}
    assert got == {(1, 2): (3, 3)}


def test_k_core_peel_known_graph(spark):
    from access_mopper_spark.operators.graph import k_core_peel
    # K4 {1,2,3,4} with a tail 4-5-6: the 3-core is exactly the K4
    # (5 and 6 peel in rounds 1-2 and node 4's degree drops back to 3).
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["deg"] for r in k_core_peel(df, k=3, rounds=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k larger than any degree → empty core, not an error
    assert k_core_peel(df, k=10, rounds=2).count() == 0


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np
    from access_mopper_spark.operators.similarity import embedding_covariance
    rng = [[float(((i * 7 + j * 3) % 11) - 5) / 4 for j in range(5)]
           for i in range(9)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rng)],
                               "vec_id long, embedding array<double>")
    got = {(r["i"], r["j"]): r["s"]
           for r in embedding_covariance(df, dim=5).collect()}
    x = np.asarray(rng)
    want = x.T @ x
    assert len(got) == 15  # upper triangle of 5x5
    for (i, j), s in got.items():
        assert i <= j and abs(s - want[i, j]) < 1e-9


def test_random_projection_deterministic_and_scaled(spark):
    from access_mopper_spark.operators.similarity import random_projection
    vecs = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 2.0, 0.0, 0.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    a = sorted(random_projection(df, dim=4, out_dim=2).collect())
    b = sorted(random_projection(df, dim=4, out_dim=2).collect())
    assert a == b  # pure function of (seed, i, k): identical on re-run
    # each output coordinate of a one-hot input is ±x/√out_dim exactly
    import math
    for r in a:
        mag = abs(r["vec_id"]) * 1.0  # doc 1 → |x|=1, doc 2 → |x|=2
        for k in ("y0", "y1"):
            assert abs(abs(r[k]) - mag / math.sqrt(2.0)) < 1e-12
    # a different seed flips at least one sign pattern
    c = sorted(random_projection(df, dim=4, out_dim=2, seed="rp1").collect())
    assert c != a


def test_label_propagation_two_communities(spark):
    from access_mopper_spark.operators.graph import label_propagation
    # two triangles bridged by one edge: each triangle converges to its
    # own min label; deterministic min tie-break keeps 1 and 4 apart
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["label"]
           for r in label_propagation(df, rounds=3).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}
    # the two triangles must not share a label
    assert {got[1], got[2]} != {got[5], got[6]}
