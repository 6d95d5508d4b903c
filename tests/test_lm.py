"""Bigram language-model scoring (operators/lm.py)."""

from pyspark.sql import functions as F

from access_mopper_spark.operators.lm import (score_bigram_logprob,
                                              train_bigram_lm)
from access_mopper_spark.sources.readers import load_table


def test_lm_scores_common_text_above_gibberish(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # append one highly-predictable doc (a single repeated bigram — its
    # bigram counts dwarf the smoothing term) and one gibberish doc whose
    # bigrams occur only in itself (stuck at the smoothing floor)
    extra = spark.createDataFrame(
        [(900001, "foo bar " * 50),
         (900002, "zxq1 wvu2 plo3 mnb4 qaz5 edc6 rfv7 tgb8 yhn9 ujm0")],
        "doc_id long, text string")
    corpus = docs.union(extra)
    big, uni, vocab = train_bigram_lm(corpus)
    out = score_bigram_logprob(corpus, big, uni, vocab)
    scores = {r["doc_id"]: r["lm_score"] for r in out.collect()}
    assert scores[900001] > scores[900002]
    # every corpus doc outscores gibberish is NOT guaranteed (add-1
    # smoothing with a tiny vocab can rank rare-context corpus bigrams
    # below the floor), but the repeated doc must beat them all
    assert scores[900001] > max(v for k, v in scores.items() if k < 900000)


def test_lm_score_null_for_single_token_doc(spark):
    df = spark.createDataFrame(
        [(1, "hello world again"), (2, "solo"), (3, "   ")],
        "doc_id long, text string")
    big, uni, vocab = train_bigram_lm(df)
    out = score_bigram_logprob(df, big, uni, vocab)
    rows = {r["doc_id"]: (r["lm_score"], r["n_bigrams"]) for r in out.collect()}
    assert rows[1][1] == 2 and rows[1][0] is not None
    assert rows[2][0] is None and rows[2][1] is None
    assert rows[3][0] is None


def test_lm_score_exact_tiny_corpus(spark):
    """Hand-computed add-1 smoothing on a 2-doc corpus."""
    import math
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string")
    big, uni, vocab = train_bigram_lm(df)
    # bigrams: doc1 [a b, b a, a b], doc2 [a b] -> c(a b)=3+1=4? no: 3 'a b' + 1 = 4 total? doc1 has 'a b' twice, 'b a' once; doc2 'a b' once
    # c('a b') = 3, c('b a') = 1; c_uni: a=3 (doc1 two a's? 'a b a b' -> a,b,a,b: a=2,b=2; doc2 a=1,b=1) => a=3, b=3; V=2
    out = {r["doc_id"]: r["lm_score"]
           for r in score_bigram_logprob(df, big, uni, vocab).collect()}
    p_ab = math.log((3 + 1) / (3 + 2))   # c(a b)=3, c(a)=3, V=2
    p_ba = math.log((1 + 1) / (3 + 2))   # c(b a)=1, c(b)=3
    assert abs(out[1] - (2 * p_ab + p_ba) / 3) < 1e-9
    assert abs(out[2] - p_ab) < 1e-9
