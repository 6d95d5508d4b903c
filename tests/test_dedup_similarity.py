"""Tests for dedup (minhash/simhash/jaccard) and similarity (cosine, LSH
ANN) operators — python reference implementations as oracles."""

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from access_mopper_spark.operators.dedup import (
    exact_dedup,
    minhash_signature,
    near_dup_pairs,
    simhash64,
)
from access_mopper_spark.operators.similarity import ann_lsh_topk, cosine_topk


@pytest.fixture(scope="module")
def docs(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "completely different content about spark engines",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "xy",                                            # shorter than shingle k
    ]
    return spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))


def py_minhash(text, seed, k=5):
    # lane 0 of the split digest: first 8 hex chars of md5(seed || shingle)
    n = max(len(text) - (k - 1), 1)
    return min(hashlib.md5((seed + text[i:i + k]).encode()).hexdigest()[:8]
               for i in range(n))


def test_minhash_matches_python(spark, docs):
    got = {r["doc_id"]: r["minhash_0"]
           for r in minhash_signature(docs).select("doc_id", "minhash_0").collect()}
    rows = docs.collect()
    for r in rows:
        assert got[r["doc_id"]] == py_minhash(r["text"], "seed0:")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups[0] == 2          # docs 0 and 3 identical
    assert sum(groups.values()) == 5


def test_near_dup_pairs_finds_neighbor(spark, docs):
    pairs = near_dup_pairs(docs, jaccard_threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in got           # exact dup: jaccard 1.0
    assert (0, 1) in got or (1, 3) in got  # near dup shares most shingles


def test_near_dup_band_cap_invariant(spark, sf_dir):
    """A band_cap at/above every bucket's population is a no-op: the
    capped result must equal the exact (cap=None) result row-for-row."""
    from access_mopper_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    kw = dict(n_hashes=6, band_size=2, shingle_k=3,
              jaccard_threshold=0.5, shingle_kind="word")
    exact = {(r["id_a"], r["id_b"], r["jaccard"])
             for r in near_dup_pairs(docs, **kw).collect()}
    capped = {(r["id_a"], r["id_b"], r["jaccard"])
              for r in near_dup_pairs(docs, band_cap=10 ** 6, **kw).collect()}
    assert exact == capped and exact


def test_near_dup_band_cap_bounds_bucket_pairs(spark):
    """With a duplicate family larger than the cap, every family member
    still pairs with a kept representative (transitive dedup works) and
    no candidate bucket exceeds cap pairs."""
    fam = ["alpha beta gamma delta epsilon zeta eta theta"] * 12
    other = ["totally different words here nothing shared at all"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(13), "text": fam + other}))
    pairs = near_dup_pairs(docs, jaccard_threshold=0.5, band_cap=4).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # cap=4 keeps ids 0..3 per bucket: every kept pair is within 0..3
    assert got == {(a, b) for a in range(4) for b in range(4) if a < b}


def py_simhash(text, k=5):
    """Pure-python reference of the md5-lane simhash: distinct k-char
    shingles, 64 bits = (hi32, lo32) md5 lanes, bit set iff +1/-1 vote
    sum > 0; returned as two's-complement int64."""
    n = max(len(text) - (k - 1), 1)
    shingles = {text[i:i + k] for i in range(n)}
    votes = [0] * 64
    for s in shingles:
        d = hashlib.md5(s.encode()).hexdigest()
        h = (int(d[:8], 16) << 32) | int(d[8:16], 16)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    u = sum(1 << b for b in range(64) if votes[b] > 0)
    return u - (1 << 64) if u >= (1 << 63) else u


def test_simhash_matches_python(spark, docs):
    # md5 lane pinned: the Python reference below is the md5 recipe (the
    # operator's production default is xxhash64)
    out = {r["doc_id"]: r["simhash"]
           for r in simhash64(docs, hash_kind="md5").collect()}
    for r in docs.collect():
        assert out[r["doc_id"]] == py_simhash(r["text"]), r["doc_id"]


def test_simhash_properties(spark, docs):
    # both hash kinds satisfy the structural fingerprint contract
    for kind in ("md5", "xxhash64"):
        out = {r["doc_id"]: r["simhash"]
               for r in simhash64(docs, hash_kind=kind).collect()}
        # identical docs → identical fingerprints
        assert out[0] == out[3]
        # near-dup closer than unrelated (hamming distance)
        def ham(a, b):
            return bin((a ^ b) & (2**64 - 1)).count("1")
        assert ham(out[0], out[1]) < ham(out[0], out[2])


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np
    rng = np.random.RandomState(0)
    vecs = rng.randn(100, 16).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(100), "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def test_cosine_topk_matches_numpy(spark, emb):
    df, vecs = emb
    import numpy as np
    q = df.where(F.col("vec_id") == 0).select(F.lit(0).alias("query_id"), "embedding")
    got = cosine_topk(df.where(F.col("vec_id") != 0), q, k=5).orderBy("rank").collect()
    v = vecs.astype("float64")
    sims = (v[1:] @ v[0]) / (np.linalg.norm(v[1:], axis=1) * np.linalg.norm(v[0]))
    exp = np.argsort(-sims)[:5] + 1
    assert [r["vec_id"] for r in got] == exp.tolist()
    assert got[0]["cosine_sim"] == pytest.approx(sims.max(), rel=1e-9)


def test_ann_lsh_recall(spark, emb):
    df, vecs = emb
    q = df.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(df, q, k=5).select("query_id", "vec_id").collect()
    approx = ann_lsh_topk(df, q, dim=16, k=5, n_planes=4).select("query_id", "vec_id").collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # bucket+hamming-1 probing should recover a decent fraction; the exact
    # value is deterministic (fixed planes, fixed data)
    assert recall >= 0.4
    # every query finds its own vector (sim=1.0 in its own bucket)
    own = {(r["query_id"], r["vec_id"]) for r in approx if r["query_id"] == r["vec_id"]}
    assert len(own) == 5


def test_cosine_pairs_blocked_matches_broadcast(spark, emb):
    """Blocked-both-sides exact pairs ≡ broadcast-GEMM exact pairs, and
    the broadcast guard auto-dispatches to the blocked path."""
    from access_mopper_spark.operators.similarity import (cosine_pairs_blocked,
                                                          cosine_pairs_exact)
    df, _ = emb

    def key(rows):
        pairs = [(r["id_a"], r["id_b"]) for r in rows]
        assert len(pairs) == len(set(pairs))  # no duplicate pair rows
        return {(r["id_a"], r["id_b"]): round(r["cosine_sim"], 9) for r in rows}

    base = key(cosine_pairs_exact(df, threshold=0.3, dim=16).collect())
    assert base  # fixture produces pairs at this threshold
    for n_blocks in (1, 3, 7):
        got = key(cosine_pairs_blocked(df, threshold=0.3, n_blocks=n_blocks).collect())
        assert got == base, n_blocks
    # guard overflow (100 rows > 16) must not raise: dispatches to blocked
    via_guard = key(cosine_pairs_exact(df, threshold=0.3, dim=16,
                                       max_broadcast_rows=16).collect())
    assert via_guard == base


def test_dedup_clusters_transitive(spark):
    """Chain a-b, b-c collapses to one cluster (transitivity the pair
    list alone can't express); isolated nodes stay singletons."""
    from access_mopper_spark.operators.dedup import dedup_clusters
    pairs = spark.createDataFrame([(2, 5), (5, 9), (11, 12)], ["id_a", "id_b"])
    nodes = spark.createDataFrame([(i,) for i in (2, 5, 9, 11, 12, 40)], ["doc_id"])
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs, nodes).collect()}
    assert got == {2: 2, 5: 2, 9: 2, 11: 11, 12: 11, 40: 40}


def test_quantize_int8_roundtrip(spark):
    from access_mopper_spark.operators.similarity import (dequantize_int8,
                                                          quantize_int8)
    df = spark.createDataFrame(
        [(0, [1.0, -2.0, 0.5]), (1, [0.0, 0.0, 0.0]), (2, [127.0, -127.0, 63.5])],
        ["vec_id", "embedding"])
    out = df.select("vec_id", quantize_int8(F.col("embedding")).alias("qz")) \
            .withColumn("back", dequantize_int8(F.col("qz"))).collect()
    rows = {r["vec_id"]: r for r in out}
    # codes bounded to int8 range, max|x| maps to ±127 exactly
    assert rows[0]["qz"]["q"] == [64, -127, 32]
    assert rows[1]["qz"]["scale"] == 0.0 and rows[1]["qz"]["q"] == [0, 0, 0]
    assert rows[2]["qz"]["q"] == [127, -127, 64]
    # dequantization error bounded by scale/2 per element
    for r in rows.values():
        scale = r["qz"]["scale"]
        orig = {0: [1.0, -2.0, 0.5], 1: [0.0, 0.0, 0.0], 2: [127.0, -127.0, 63.5]}[r["vec_id"]]
        for x, xb in zip(orig, r["back"]):
            assert abs(x - xb) <= scale / 2 + 1e-12


def test_kmeans_train_improves_and_keeps_k(spark, emb):
    from access_mopper_spark.operators.similarity import (cosine, as_double,
                                                          kmeans_train)
    df, _ = emb
    import numpy as np

    def objective(cents_df):
        # mean best-centroid cosine over the corpus (higher = tighter)
        cents = cents_df.collect()
        vecs = df.select("vec_id", "embedding").collect()
        C = np.array([r["centroid"] for r in cents], dtype="float64")
        V = np.array([r["embedding"] for r in vecs], dtype="float64")
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        return float((Vn @ Cn.T).max(axis=1).mean())

    c1 = kmeans_train(df, k=5, n_iter=1)
    c2 = kmeans_train(df, k=5, n_iter=3)
    assert c1.count() == 5 and c2.count() == 5  # empty clusters retained
    assert objective(c2) >= objective(c1) - 1e-9  # Lloyd monotone-ish


def test_minhash_xxhash_fast_path(spark, docs):
    """xxhash64 signature kind: long columns, identical-doc agreement,
    and the full near-dup pipeline still finds the planted dup."""
    sig = minhash_signature(docs, hash_kind="xxhash64", n_hashes=4)
    rows = {r["doc_id"]: tuple(r[f"minhash_{i}"] for i in range(4))
            for r in sig.collect()}
    assert all(isinstance(v, int) for v in rows[0])
    assert rows[0] == rows[3]          # exact dups agree on all hashes
    assert rows[0] != rows[2]          # unrelated docs differ
    pairs = near_dup_pairs(docs, jaccard_threshold=0.5,
                           hash_kind="xxhash64").collect()
    assert (0, 3) in {(r["id_a"], r["id_b"]) for r in pairs}


def test_dup_ngram_fraction_flags_shared_spans(spark):
    from access_mopper_spark.operators.dedup import dup_ngram_fraction
    docs = spark.createDataFrame([
        (1, "a b c d e unique tail one"),
        (2, "a b c d e other ending two"),
        (3, "totally different words here nothing shared at all"),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in dup_ngram_fraction(docs, n=5).collect()}
    # docs 1 and 2 share exactly the gram "a b c d e" (position 1 of 4)
    assert out[1].n_grams == 4 and out[1].n_dup == 1
    assert out[1].dup_fraction == 0.25
    assert out[2].n_dup == 1
    assert out[3].n_dup == 0 and out[3].dup_fraction == 0.0


def test_dup_ngram_fraction_short_doc(spark):
    from access_mopper_spark.operators.dedup import dup_ngram_fraction
    docs = spark.createDataFrame([(1, "too short"), (2, "too short")],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in dup_ngram_fraction(docs, n=5).collect()}
    # shorter than the window → one truncated gram; identical docs dup it
    assert out[1].n_grams == 1 and out[1].dup_fraction == 1.0


def test_dup_ngram_skew_hardened_path(spark):
    """Skew hardening (VERDICT r3 item 8): a fixture where one gram
    dominates the corpus.  The split path must (a) match the naive join
    exactly, (b) BROADCAST the hot side so hot occurrences never
    shuffle, and (c) leave no cold key at/above the threshold — the
    structural guarantee that no reducer can receive a hot partition."""
    from access_mopper_spark.operators.dedup import dup_ngram_fraction
    from access_mopper_spark.functions.text import word_shingles
    import pyspark.sql.functions as F

    rows = [(i, "the same boiler plate span tail%d word%d" % (i, i))
            for i in range(200)]          # gram "the same boiler plate span" ×200
    rows += [(1000 + i, "rare words only here item%d %d x y z" % (i, i))
             for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    naive = dup_ngram_fraction(docs, n=5).orderBy("doc_id").collect()
    hard = dup_ngram_fraction(docs, n=5, hot_threshold=100)
    assert hard.orderBy("doc_id").collect() == naive

    plan = hard._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan          # hot side broadcast

    # cold side bound: no surviving join key reaches the threshold
    grams = docs.select("doc_id",
                        F.explode(word_shingles(F.col("text"), 5)).alias("gram"))
    counts = grams.groupBy("gram").count()
    cold_max = counts.where(F.col("count") < 100) \
                     .agg(F.max("count")).first()[0]
    assert cold_max < 100
    hot_n = counts.where(F.col("count") >= 100).count()
    assert hot_n >= 1                           # fixture really is skewed


def test_semantic_dedup_keeps_one_per_group(spark):
    """Two tight semantic groups + one outlier, centroids = first vector
    of each group: the lower id of each near-dup pair survives, the
    outlier is untouched."""
    from access_mopper_spark.operators.similarity import semantic_dedup
    rows = [
        (0, [1.0, 0.0, 0.0]), (1, [0.999, 0.01, 0.0]),   # group A (dup)
        (2, [0.0, 1.0, 0.0]), (3, [0.01, 0.999, 0.0]),   # group B (dup)
        (4, [0.0, 0.0, 1.0]),                            # outlier
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    import pyspark.sql.functions as F
    cents = emb.where(F.col("vec_id").isin(0, 2, 4)) \
               .select(F.col("vec_id").alias("centroid_id"),
                       F.col("embedding").alias("centroid"))
    kept = sorted(r.vec_id for r in
                  semantic_dedup(emb, cents, threshold=0.9).collect())
    assert kept == [0, 2, 4]


def test_dup_ngram_top_n_hot_set_matches_naive(spark):
    """hot_top_n: broadcast capped at N most-frequent grams — results
    identical to the naive join on the same skewed fixture."""
    from access_mopper_spark.operators.dedup import dup_ngram_fraction
    rows = [(i, "the same boiler plate span tail%d word%d" % (i, i))
            for i in range(100)]
    rows += [(500 + i, "rare words only here item%d %d q r s" % (i, i))
             for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    naive = dup_ngram_fraction(docs, n=5).orderBy("doc_id").collect()
    capped = dup_ngram_fraction(docs, n=5, hot_top_n=3) \
        .orderBy("doc_id").collect()
    assert capped == naive


def test_semantic_dedup_gemm_matches_column_path(spark):
    """Independent-semantics cross-check: the chunked-BLAS path and the
    pure-Column self-join path are different executions of the same
    definition — they must agree exactly on random inputs (the oracle
    can't catch a bug shared by query and oracle; these two paths share
    nothing but the contract)."""
    import numpy as np
    from access_mopper_spark.operators.similarity import semantic_dedup
    import pyspark.sql.functions as F

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = emb.where(F.col("vec_id") < 5) \
               .select(F.col("vec_id").alias("centroid_id"),
                       F.col("embedding").alias("centroid"))
    for tau in (0.3, 0.6):
        a = sorted(r.vec_id for r in
                   semantic_dedup(emb, cents, tau, use_gemm=True).collect())
        b = sorted(r.vec_id for r in
                   semantic_dedup(emb, cents, tau, use_gemm=False).collect())
        assert a == b, (tau, set(a) ^ set(b))


def test_winnowing_guarantee_and_edges(spark):
    """The winnowing guarantee: two docs sharing a substring of length
    >= w + k - 1 (= 8 here) share at least one fingerprint; docs
    shorter than that produce none; disjoint texts share none."""
    from access_mopper_spark.operators.dedup import winnowing_fingerprints
    shared = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [(1, "AAA " + shared + " tail one"),
         (2, "completely different head " + shared),
         (3, "zzzzzzz"),          # 7 chars < k + w - 1 -> no window
         (4, None),
         (5, "0123456789")],      # disjoint from 1/2
        ["doc_id", "text"])
    out = winnowing_fingerprints(docs, k=5, w=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert 3 not in fps and 4 not in fps
    assert fps[1] & fps[2], "shared >=8-char substring must share a fp"
    assert not (fps[5] & fps[1])
    # determinism
    again = {(r["doc_id"], r["fp"]) for r in
             winnowing_fingerprints(docs, k=5, w=4).collect()}
    assert again == {(r["doc_id"], r["fp"]) for r in out}


def test_simhash_near_dup_banded_matches_brute_force(spark, docs):
    """Pigeonhole banding is EXACT: the banded candidate search must
    return precisely the pairs a brute-force all-pairs Hamming scan
    finds at the same threshold."""
    from access_mopper_spark.operators.dedup import (simhash64,
                                                     simhash_near_dup)
    k = 3
    sims = {r["doc_id"]: r["simhash"]
            for r in simhash64(docs, "text", 5).collect()}
    brute = set()
    ids = sorted(sims)
    for i in ids:
        for j in ids:
            if i < j and bin((sims[i] ^ sims[j]) & ((1 << 64) - 1)).count("1") <= k:
                brute.add((i, j))
    got = {(r["id_a"], r["id_b"])
           for r in simhash_near_dup(docs, "text", "doc_id",
                                     max_hamming=k, shingle_k=5).collect()}
    assert got == brute
    assert (0, 3) in got  # the exact dup pair (hamming 0)


def test_simhash_near_dup_band_cap_keeps_smallest_ids(spark):
    """With identical texts, every doc lands in the same 4 buckets;
    band_cap=2 keeps the two smallest ids per bucket so exactly one
    pair (0,1) survives — deterministic, oracle-replayable."""
    from access_mopper_spark.operators.dedup import simhash_near_dup
    df = spark.createDataFrame(
        [(i, "identical text for every row here") for i in range(5)],
        "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           simhash_near_dup(df, max_hamming=3, band_cap=2).collect()}
    assert got == {(0, 1)}


def test_simhash_near_dup_hamming_zero_bands(spark):
    """max_hamming=0 degenerates to a single 64-bit band: exact
    fingerprint equality only."""
    from access_mopper_spark.operators.dedup import simhash_near_dup
    df = spark.createDataFrame(
        [(0, "aaaa bbbb cccc dddd"), (1, "aaaa bbbb cccc dddd"),
         (2, "totally different")],
        "doc_id long, text string")
    got = simhash_near_dup(df, max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in got} == {(0, 1, 0)}


def test_winnowing_similarity_detects_planted_overlap(spark):
    """Two docs sharing a long span score high containment; unrelated
    docs share nothing; the stop-fingerprint cap drops ubiquitous
    grams."""
    from access_mopper_spark.operators.dedup import winnowing_similarity
    shared = "the entire middle section is lifted verbatim from doc zero"
    rows = [
        (0, "intro A " + shared + " outro A"),
        (1, "intro B " + shared + " different ending entirely"),
        (2, "nothing in common with the others at all zzz qqq vvv"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r for r in
           winnowing_similarity(df, min_shared=2, fp_cap=None).collect()}
    assert (0, 1) in out
    assert out[(0, 1)]["containment_bp"] > 5000  # most fps shared
    assert (0, 2) not in out and (1, 2) not in out


def test_winnowing_similarity_fp_cap_drops_hot_fingerprints(spark):
    """With a cap of 1 every fingerprint appearing in 2+ docs drops, so
    NO pair can share fingerprints at all."""
    from access_mopper_spark.operators.dedup import winnowing_similarity
    df = spark.createDataFrame(
        [(i, "identical text everywhere again") for i in range(4)],
        "doc_id long, text string")
    assert winnowing_similarity(df, min_shared=1, fp_cap=1).count() == 0
