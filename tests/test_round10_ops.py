"""Round-10 operators: directed containment pairs, confusable-skeleton
dedup, degree assortativity.

The registry gate (tools/check_correctness.py) proves oracle parity;
these tests pin the SEMANTIC invariants the oracle can't express:
containment fires on the subset shape Jaccard misses, the skeleton is
invariant under homoglyph respelling, and the assortativity agrees
with an independent float implementation.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


LONG = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon")
SUB = "alpha beta gamma delta epsilon zeta eta theta"  # prefix subset


@pytest.fixture(scope="module")
def containment(spark):
    from access_mopper_spark.operators.dedup import containment_pairs
    rows = [
        (1, LONG),
        (2, SUB),                 # word 3-grams of 2 are a subset of 1's
        (3, "completely unrelated text about spark adaptive execution"),
        (4, None),                # NULL text: never a candidate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # band_size=1 (each hash its own band): containment targets are
    # LOW-Jaccard by nature (J = |sub|/|sup| = 0.33 here), so single-
    # hash bands are the right index config for this workload — the
    # registry row keeps the (6,2) near-dup config and documents that
    # its recall comes from near-dup families
    out = containment_pairs(df, "text", "doc_id", n_hashes=6, band_size=1,
                            shingle_k=3, containment_bp_threshold=8000)
    return {(r["id_sub"], r["id_sup"]): r["containment_bp"]
            for r in out.collect()}


def test_subset_direction_fires_at_10000(containment):
    # every word 3-gram of SUB appears in LONG -> containment exactly 1.0
    assert containment[(2, 1)] == 10000


def test_superset_direction_below_threshold(containment):
    # LONG's shingles are mostly NOT in SUB -> the (1, 2) direction
    # must not reach 8000 bp (this is the asymmetry Jaccard collapses)
    assert (1, 2) not in containment


def test_null_text_never_pairs(containment):
    assert not any(4 in k for k in containment)


def test_jaccard_misses_the_subset_pair(spark):
    # the motivating case: near_dup_pairs (Jaccard >= 0.5) does NOT
    # report the subset pair containment_pairs exists for
    from access_mopper_spark.operators.dedup import near_dup_pairs
    df = spark.createDataFrame([(1, LONG), (2, SUB)], ["doc_id", "text"])
    jac = near_dup_pairs(df, "text", "doc_id", n_hashes=6, band_size=2,
                         shingle_k=3, jaccard_threshold=0.5)
    assert jac.count() == 0


def test_confusable_skeleton_folds_homoglyphs(spark):
    from access_mopper_spark.functions.text import confusable_skeleton
    rows = [
        (1, "paypal account verify"),
        # Cyrillic а/у/с/е/о lookalikes + NBSP separator + trailing run
        (2, "раypаl аccount   verify "),
        (3, "PAYPAL ACCOUNT VERIFY"),
        (4, "different text entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["sk"] for r in df.select(
        "doc_id", confusable_skeleton(F.col("text")).alias("sk")).collect()}
    assert got[1] == got[2] == got[3] == "paypal account verify"
    assert got[4] != got[1]


def test_confusable_skeleton_sql_matches_spark(spark):
    # the oracle builder and the Column implementation must agree on
    # hostile inputs (this is the pair the registry gate hashes)
    import duckdb

    from access_mopper_spark.functions.text import (confusable_skeleton,
                                                    confusable_skeleton_sql)
    texts = ["раypаl аccount", "MIXED Саѕе Теxt",
             "tabs\there\nand  runs", "ideographic　space",
             "plain ascii", "ωμέγα not mapped"]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["sk"] for r in df.select(
        "doc_id", confusable_skeleton(F.col("text")).alias("sk")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            f"SELECT {confusable_skeleton_sql('?')}", [t]).fetchone()[0]
        assert got[i] == want, (t, got[i], want)


def test_degree_assortativity_matches_numpy(spark, tmp_path):
    # independent float implementation over the same co-purchase graph
    import numpy as np

    from access_mopper_spark.queries import QUERIES
    sf_dir = "/root/testdata/sf0.001"
    row = QUERIES["q_degree_assortativity"](spark, sf_dir).collect()[0]

    from access_mopper_spark.sources.readers import load_table
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey").collect())
    from collections import defaultdict
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    assert row["m_directed"] == len(xs)
    want = np.corrcoef(np.array(xs, dtype=float),
                       np.array(ys, dtype=float))[0, 1]
    assert row["assortativity"] == pytest.approx(want, abs=2e-6)


def test_assortativity_null_on_degenerate_graph(spark):
    # all degrees equal -> zero variance -> NULL guard (not NaN/inf)
    from access_mopper_spark.queries._core import QUERIES  # noqa: F401
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (2, 40)],
        ["l_orderkey", "l_partkey"])
    # reuse the query body shape inline: a 2-edge graph where every
    # node has degree 1
    e1 = df.select("l_orderkey", F.col("l_partkey").alias("a"))
    e2 = df.select("l_orderkey", F.col("l_partkey").alias("b"))
    pairs = (e1.join(e2, "l_orderkey").where(F.col("a") < F.col("b"))
               .select("a", "b").distinct())
    deg = (pairs.select(F.col("a").alias("node"))
                .unionAll(pairs.select(F.col("b").alias("node")))
                .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    direct = (pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
                   .unionAll(pairs.select(F.col("b").alias("x"),
                                          F.col("a").alias("y"))))
    j = (direct.join(deg.select(F.col("node").alias("x"),
                                F.col("d").alias("xd")), "x")
               .join(deg.select(F.col("node").alias("y"),
                                F.col("d").alias("yd")), "y"))
    s = j.agg(F.count("*").cast("long").alias("m"),
              F.sum("xd").alias("sx"), F.sum("yd").alias("sy"),
              F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
              F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
              F.sum(F.col("yd") * F.col("yd")).alias("syy")).collect()[0]
    md = float(s["m"])
    vx = md * s["sxx"] - float(s["sx"]) ** 2
    assert vx == 0.0  # degenerate by construction -> query emits NULL
