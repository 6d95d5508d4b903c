"""Round-7 operators: large-star/small-star CC, exact n-gram
decontamination, DSIR importance weights, driver-divergence probes."""

import collections
import random

import pytest
from pyspark.sql import functions as F

from access_mopper_spark.operators.dedup import ngram_decontaminate
from access_mopper_spark.operators.graph import cc_large_small_star
from access_mopper_spark.operators.sampling import importance_weights


@pytest.fixture(scope="module")
def spark():
    from access_mopper_spark.session import get_spark
    return get_spark(app_name="test_round7")


def _random_graph(seed, n_nodes=60, n_edges=55):
    rng = random.Random(seed)
    return [(rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)]


def _python_cc_min_labels(edges):
    """Independent in-memory connected components → min-id labels."""
    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    seen, lbl = set(), {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            comp.append(x)
            stack.extend(adj[x])
        m = min(comp)
        for x in comp:
            lbl[x] = m
    return lbl


@pytest.mark.parametrize("seed", [0, 1])
def test_cc_star_matches_independent_cc(spark, seed):
    """large-star/small-star labels == an independent in-memory CC
    (component-minimum labels) on random graphs."""
    edges = _random_graph(seed)
    e = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
    star = {r["node"]: r["cluster_id"]
            for r in cc_large_small_star(e, None, "a", "b").collect()}
    assert star == _python_cc_min_labels(edges)


def test_cc_star_path_graph_log_rounds(spark):
    """A 64-node path (diameter 63) converges inside 12 alternations —
    the O(log n) property that justifies the operator."""
    e = spark.createDataFrame([(i, i + 1) for i in range(63)],
                              "a BIGINT, b BIGINT")
    out = cc_large_small_star(e, max_rounds=12).collect()
    assert len(out) == 64
    assert {r["cluster_id"] for r in out} == {0}


def test_cc_star_singletons_and_self_loops(spark):
    e = spark.createDataFrame([(1, 1), (2, 3)], "a BIGINT, b BIGINT")
    nodes = spark.createDataFrame([(9,), (1,), (2,), (3,)], "node BIGINT")
    out = {r["node"]: r["cluster_id"]
           for r in cc_large_small_star(e, nodes).collect()}
    assert out == {9: 9, 1: 1, 2: 2, 3: 2}


def test_ngram_decontaminate_flags_verbatim_span(spark):
    ref = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id BIGINT, text STRING")
    new = spark.createDataFrame(
        [(10, "x alpha beta gamma delta epsilon zeta eta theta y"),
         (11, "completely unrelated words with no shared span at all"),
         (12, None)],
        "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r["n_shared"]
           for r in ngram_decontaminate(new, ref, n=8).collect()}
    assert 10 in out and out[10] >= 1
    assert 11 not in out and 12 not in out


def test_ngram_decontaminate_short_doc_truncated_shingle(spark):
    # a sub-window doc matches only via its whole-text truncated shingle
    ref = spark.createDataFrame([(0, "tiny doc")], "doc_id BIGINT, text STRING")
    new = spark.createDataFrame([(10, "tiny doc"), (11, "tiny")],
                                "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r["n_shared"]
           for r in ngram_decontaminate(new, ref, n=8).collect()}
    assert out == {10: 1}


def test_importance_weights_favors_target_vocab(spark):
    rows = ([(i, "alpha alpha beta", "en") for i in range(20)]
            + [(100 + i, "omega psi chi", "fr") for i in range(20)]
            + [(200, "alpha alpha beta", "fr"), (201, "omega psi chi", "en"),
               (202, None, "en")])
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    out = {r["doc_id"]: r["imp_micro"]
           for r in importance_weights(df, F.col("lang") == "en").collect()}
    # target-looking text scores higher than source-typical text,
    # REGARDLESS of the doc's own label (weights are distributional)
    assert out[200] > out[100]
    assert out[201] < out[0]
    assert 202 not in out  # NULL text never scores
    # exact integer determinism: same text => identical imp_micro
    assert out[200] == out[0]


def test_pca_power_matches_numpy_eig(spark):
    """Power-iteration loadings ≈ numpy's leading eigenvector of the
    same (snapped) Gram matrix, up to the 3-iteration convergence and
    the 1e-6 grid."""
    import numpy as np
    from access_mopper_spark.operators.ml import pca_power_iteration

    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 8)) @ np.diag([5, 3, 1, 1, 1, 1, 1, 1])
    gram = x.T @ x
    rows = [(i, j, round(float(gram[i, j]), 6))
            for i in range(8) for j in range(i, 8)]
    gdf = spark.createDataFrame(rows, "i INT, j INT, s DOUBLE")
    out = pca_power_iteration(gdf, dim=8, iterations=8).collect()
    v = np.zeros(8)
    for r in out:
        v[r["i"]] = r["loading"]
    evals, evecs = np.linalg.eigh(gram)
    lead = evecs[:, -1]
    if np.dot(lead, v) < 0:
        lead = -lead
    assert np.abs(np.dot(v, lead)) > 0.999
    assert abs(out[0]["eigenvalue"] - evals[-1]) / evals[-1] < 1e-3


def test_kmeans_parallel_init_weights_partition_corpus(spark):
    import numpy as np
    from access_mopper_spark.operators.ml import kmeans_parallel_init

    rng = np.random.default_rng(3)
    centers = np.array([[0.0] * 4, [10.0] * 4, [-10.0, 10.0, 0.0, 5.0]])
    rows = [(i, (centers[i % 3] + rng.normal(scale=0.1, size=4)).tolist())
            for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = kmeans_parallel_init(df, rounds=2, oversample=4).collect()
    # weights partition the corpus exactly; the seed (min id) is present
    assert sum(r["n_points"] for r in out) == 120
    assert any(r["cand_id"] == 0 for r in out)
    # oversampling found at least one candidate outside the seed cluster
    assert len(out) >= 2


def test_luhn_valid_known_cards(spark):
    from access_mopper_spark.functions.pii import luhn_valid
    df = spark.createDataFrame(
        [("4111111111111111",),   # classic Visa test number — valid
         ("4111111111111112",),   # off-by-one checksum — invalid
         ("79927398713",),        # the canonical Luhn example — valid
         ("",), (None,)],
        "d STRING")
    out = [r[0] for r in df.select(luhn_valid(F.col("d"))).collect()]
    assert out == [True, False, True, None, None]


def test_portable_lower_matches_duckdb_on_divergent_codepoints(spark):
    """portable_lower == DuckDB lower() on the full divergence table
    (Java full-casing İ, contextual final sigma, post-utf8proc Unicode
    additions, Vithkuqi/Garay remaps) AND on ordinary text."""
    import duckdb
    from access_mopper_spark.functions.text import (_LOWER_DIVERGENT,
                                                    portable_lower)
    cases = (["MiXeD CaSe", "İstanbul", "aİb", "ΑΣ", "ΣΑ Σ", "ǅungla ẞ"]
             + [f"x{c}y" for c in _LOWER_DIVERGENT])
    import pandas as pd
    pdf = pd.DataFrame({"i": range(len(cases)), "t": cases})
    con = duckdb.connect()
    con.register("tt", pdf)
    duck = dict(con.execute("SELECT i, lower(t) FROM tt").fetchall())
    rows = spark.createDataFrame(pdf).select(
        "i", portable_lower(F.col("t")).alias("lo")).collect()
    bad = [(cases[r["i"]], r["lo"], duck[r["i"]])
           for r in rows if r["lo"] != duck[r["i"]]]
    assert not bad, bad[:5]


def test_portable_levenshtein_matches_duckdb_byte_metric(spark):
    import duckdb
    import pandas as pd
    from access_mopper_spark.functions.text import portable_levenshtein
    cases = [("café", "cafe"), ("中文", "中又"), ("aİb", "aib"),
             ("\U0001F600x", "x"), ("naïve", "naive"), ("abc", "abd"),
             ("", "xy"), ("same", "same")]
    pdf = pd.DataFrame({"i": range(len(cases)),
                        "a": [c[0] for c in cases],
                        "b": [c[1] for c in cases]})
    con = duckdb.connect()
    con.register("tt", pdf)
    duck = dict(con.execute("SELECT i, levenshtein(a, b) FROM tt").fetchall())
    rows = spark.createDataFrame(pdf).select(
        "i", portable_levenshtein(F.col("a"), F.col("b")).alias("d")).collect()
    assert all(r["d"] == duck[r["i"]] for r in rows), \
        [(cases[r["i"]], r["d"], duck[r["i"]]) for r in rows
         if r["d"] != duck[r["i"]]]
