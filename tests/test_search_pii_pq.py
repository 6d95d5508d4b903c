"""BM25 retrieval, PII scrubbing, and product quantization."""

import pytest
from pyspark.sql import functions as F

from access_mopper_spark.functions.pii import pii_counts, redact_pii
from access_mopper_spark.operators.search import (
    bm25_topk, build_postings, tfidf_vectors, tokens)
from access_mopper_spark.operators.similarity import (
    pq_adc_topk, pq_codebooks, pq_encode, pq_train)


# ------------------------------------------------------------- search

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_tf_and_dl(spark):
    docs = _docs(spark, [(1, "a b a  c"), (2, " b \t b ")])
    rows = {(r.doc_id, r.term): (r.tf, r.dl)
            for r in build_postings(docs).collect()}
    assert rows[(1, "a")] == (2, 4)
    assert rows[(1, "c")] == (1, 4)
    assert rows[(2, "b")] == (2, 2)


def test_bm25_prefers_rare_term_and_higher_tf(spark):
    docs = _docs(spark, [
        (1, "needle common common common"),
        (2, "needle needle common filler"),
        (3, "common filler filler filler"),
        (4, "common filler filler filler"),
    ])
    out = bm25_topk(docs, ["needle"], k=3).collect()
    ids = [r.doc_id for r in out]
    assert ids[:2] == [2, 1]          # higher tf of the rare term first
    assert 3 not in ids and 4 not in ids


def test_bm25_matches_duckdb_scoring(spark):
    """Independent scoring check: hand-compute BM25 in numpy."""
    import math

    docs = _docs(spark, [(i, ("x " * i + "y " * (6 - i)).strip())
                         for i in range(1, 6)])
    out = {r.doc_id: r.score for r in bm25_topk(docs, ["x"], k=5).collect()}
    # corpus: docs 1..5, tf_x = i, dl = 6 for every doc
    n, df = 5, 5
    dls = {i: 6 for i in range(1, 6)}
    avgdl = sum(dls.values()) / n
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    for i in range(1, 6):
        tf = i
        expect = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avgdl))
        assert out[i] == pytest.approx(round(expect, 6), abs=2e-6)


def test_tfidf_weights(spark):
    docs = _docs(spark, [(1, "a a b"), (2, "b c")])
    w = {(r.doc_id, r.term): r.weight for r in tfidf_vectors(docs).collect()}
    import math
    assert w[(1, "a")] == pytest.approx(round(2 * math.log(2 / 1), 6))
    assert w[(1, "b")] == pytest.approx(0.0)   # df=2, ln(1)=0
    assert w[(2, "c")] == pytest.approx(round(math.log(2.0), 6))


def test_tokens_empty_and_whitespace(spark):
    docs = _docs(spark, [(1, ""), (2, "  \t "), (3, "one")])
    got = {r.doc_id: r.w for r in
           docs.select("doc_id", tokens(F.col("text")).alias("w")).collect()}
    assert got[1] == [""] and got[2] == [""] and got[3] == ["one"]


# ---------------------------------------------------------------- PII

def test_pii_counts_and_redact(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.org ip 192.168.0.1 tel 555-867-5309 end"),
         (2, "no pii here 1234 10.0.0 999-99-9999")],
        "id long, t string")
    counts = pii_counts(F.col("t"))
    out = {r.id: r for r in df.select(
        "id", counts["email"], counts["ipv4"], counts["phone"],
        redact_pii(F.col("t")).alias("red")).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (1, 1, 1)
    assert out[1].red == "mail <PII> ip <PII> tel <PII> end"
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 0, 0)
    assert out[2].red == "no pii here 1234 10.0.0 999-99-9999"


def test_pii_redact_preserves_clean_text(spark):
    df = spark.createDataFrame([(1, "plain words only")], "id long, t string")
    row = df.select(redact_pii(F.col("t")).alias("red")).first()
    assert row.red == "plain words only"


# ----------------------------------------------------------------- PQ

def test_pq_encode_codewords_encode_to_themselves(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebooks(emb, m=4, dsub=16, ksub=8)
    codes = {r.vec_id: r.codes for r in
             pq_encode(emb.where(F.col("vec_id") < 8), cb, m=4, dsub=16).collect()}
    # every codebook-source vector is distance-0 from its own codewords
    for vid in range(8):
        assert codes[vid] == [vid, vid, vid, vid]


def test_pq_adc_self_query_ranks_self_first(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebooks(emb, m=4, dsub=16, ksub=8)
    codes = pq_encode(emb, cb, m=4, dsub=16)
    q = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding")
    top = pq_adc_topk(codes, cb, q, m=4, dsub=16, k=3).collect()
    assert top[0].vec_id == 0 and top[0].adc_dist == 0.0
    assert [r.adc_rank for r in top] == [1, 2, 3]


def test_pq_train_shapes_and_determinism(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    cb = pq_train(emb, m=2, dsub=32, ksub=4, n_iter=1)
    rows = cb.collect()
    assert len(rows) == 8  # m * ksub
    assert all(len(r.codeword) == 32 for r in rows)
    again = {(r.sub, r.code): r.codeword for r in cb.collect()}
    for r in rows:
        assert again[(r.sub, r.code)] == pytest.approx(r.codeword)


def test_pq_encode_reduces_reconstruction_error_after_training(spark, sf_dir):
    """Trained codebooks reconstruct no worse than the prefix baseline
    (on the training data itself — Lloyd never increases distortion)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    vecs = {r.vec_id: np.array(r.embedding, dtype="float64")
            for r in emb.collect()}

    def distortion(cb_df):
        cw = {(r.sub, r.code): np.array(r.codeword, dtype="float64")
              for r in cb_df.collect()}
        codes = pq_encode(emb, cb_df, m=4, dsub=16).collect()
        tot = 0.0
        for r in codes:
            v = vecs[r.vec_id]
            for s, c in enumerate(r.codes):
                tot += float(((v[s * 16:(s + 1) * 16] - cw[(s, c)]) ** 2).sum())
        return tot

    base = distortion(pq_codebooks(emb, m=4, dsub=16, ksub=8))
    trained = distortion(pq_train(emb, m=4, dsub=16, ksub=8, n_iter=2))
    assert trained <= base * 1.0001


def test_token_count_bpe(spark):
    from access_mopper_spark.functions.text import token_count, token_count_bpe
    df = spark.createDataFrame(
        [(1, "ab 12 c!"), (2, "hello,world"), (3, ""), (4, "x-9")],
        "id long, t string")
    out = {r.id: (r.ws, r.bpe) for r in df.select(
        "id", token_count(F.col("t")).alias("ws"),
        token_count_bpe(F.col("t")).alias("bpe")).collect()}
    assert out[1] == (3, 5)   # ab / 1 / 2 / c / !
    assert out[2] == (1, 3)   # hello / , / world
    assert out[3] == (0, 0)
    assert out[4] == (1, 3)   # x / - / 9


def test_ivf_pq_full_probe_equals_pure_adc(spark, sf_dir):
    """With nprobe = n_centroids, IVF-PQ scores every list — the result
    must equal plain ADC top-k over the same codes/codebooks."""
    from access_mopper_spark.operators.similarity import ivf_pq_search
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebooks(emb, m=4, dsub=16, ksub=8)
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"))
    q = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding")
    codes = pq_encode(emb, cb, m=4, dsub=16)
    full = [(r.vec_id, r.adc_dist) for r in
            ivf_pq_search(emb, cents, cb, q, m=4, dsub=16, k=5,
                          nprobe=4).collect()]
    pure = [(r.vec_id, r.adc_dist) for r in
            pq_adc_topk(codes, cb, q, m=4, dsub=16, k=5).collect()]
    assert full == pure


def test_ivf_pq_narrow_probe_is_subset(spark, sf_dir):
    """nprobe < n_centroids returns only vectors from probed lists (a
    subset of the candidate universe, each with the exact ADC dist)."""
    from access_mopper_spark.operators.similarity import ivf_pq_search
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebooks(emb, m=4, dsub=16, ksub=8)
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"))
    q = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding")
    codes = pq_encode(emb, cb, m=4, dsub=16)
    narrow = {r.vec_id: r.adc_dist for r in
              ivf_pq_search(emb, cents, cb, q, m=4, dsub=16, k=50,
                            nprobe=1).collect()}
    exact = {r.vec_id: r.adc_dist for r in
             pq_adc_topk(codes, cb, q, m=4, dsub=16, k=500).collect()}
    assert narrow and all(exact[v] == d for v, d in narrow.items())


def test_fuzzy_match_exact_and_one_edit(spark):
    from access_mopper_spark.operators.fuzzy import dictionary_fuzzy_match
    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "alphq"), (3, "gamma"), (4, "alphabet")],
        "id long, name string")
    dic = spark.createDataFrame([("alpha",)], "dict_name string")
    out = {r.id: r.edit_dist for r in dictionary_fuzzy_match(
        corpus, dic, "name", "dict_name", max_dist=1).collect()}
    assert out == {1: 0, 2: 1}   # gamma too far; alphabet fails length band
