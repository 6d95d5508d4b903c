"""Corpus-trained n-gram language-model scoring — the model-based
quality filter of a curation pipeline (the role a KenLM perplexity
filter plays in public web-corpus pipelines): train bigram statistics on
the corpus itself (or a trusted reference slice), then score every
document by its mean bigram log-probability; low scores flag
boilerplate, gibberish, and out-of-domain text.

Scale design (100 TB):
- training = ONE shuffle keyed by bigram (map-side combined counts);
  unigram counts and vocabulary size ride the same pass.
- scoring = explode doc bigrams → equi-join against the model on the
  bigram key → per-doc mean.  The model is a DataFrame, not a broadcast:
  at web scale the bigram table outgrows driver memory, and a shuffle
  join on uniformly distributed n-gram keys is the correct shape.  For
  small/pruned models Spark's AQE converts the join to broadcast on its
  own.
- a real deployment prunes the model to top-K bigrams (cap_per_group on
  the prefix) and relies on the smoothing floor for the tail; the
  un-pruned path here is exact so the oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from access_mopper_spark.functions.text import portable_lower
from pyspark.sql.column import Column


def _tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text (empty array for blank docs).
    Split on the explicit [ \\t\\n\\r] class — no \\s dialect drift."""
    t = F.trim(F.regexp_replace(portable_lower(text), "[ \t\n\r]+", " "))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, " "))


def _bigrams(toks: Column) -> Column:
    """Adjacent-token pairs as 'a b' strings (empty for <2 tokens)."""
    n = F.size(toks)
    heads = F.slice(toks, 1, F.greatest(n - 1, F.lit(0)))
    return F.zip_with(heads, F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                      lambda a, b: F.concat_ws(" ", a, b))


def train_bigram_lm(df: DataFrame, text_col: str = "text") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count bigrams and unigram prefixes over a corpus.

    Returns ``(bigram_counts, unigram_counts, vocab_size)`` DataFrames:
    ``(bigram, c_big)``, ``(w1, c_uni)`` and a 1-row ``(v)`` — everything
    downstream smoothing needs.  One explode + map-side-combined count
    per table; all three share the single tokenization scan."""
    from access_mopper_spark.operators.partitioning import ensure_min_partitions

    toks = ensure_min_partitions(df).select(_tokens(F.col(text_col)).alias("__t"))
    uni = (toks.select(F.explode("__t").alias("w1"))
               .groupBy("w1").agg(F.count("*").alias("c_uni")))
    big = (toks.select(F.explode(_bigrams(F.col("__t"))).alias("bigram"))
               .groupBy("bigram").agg(F.count("*").alias("c_big")))
    vocab = uni.agg(F.count("*").alias("v"))
    return big, uni, vocab


def score_bigram_logprob(df: DataFrame, bigram_counts: DataFrame,
                         unigram_counts: DataFrame, vocab_size: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         k: float = 1.0) -> DataFrame:
    """Mean add-k-smoothed bigram log-probability per document:

        score(d) = mean over bigrams (w1 w2) of
                   ln( (c(w1 w2) + k) / (c(w1) + k·V) )

    Documents with fewer than two tokens get a null score (no bigrams to
    judge).  Plan shape: explode → two equi-joins (bigram, then prefix)
    → one per-doc aggregate; the vocabulary size is a broadcast scalar."""
    from access_mopper_spark.operators.partitioning import ensure_min_partitions

    pairs = ensure_min_partitions(df).select(
        id_col,
        F.explode(_bigrams(_tokens(F.col(text_col)))).alias("bigram"))
    pairs = pairs.withColumn("w1", F.split(F.col("bigram"), " ")[0])
    scored = (pairs
              .join(bigram_counts, "bigram", "left")
              .join(unigram_counts, "w1", "left")
              .crossJoin(F.broadcast(vocab_size))
              .select(id_col,
                      F.log((F.coalesce(F.col("c_big"), F.lit(0)) + F.lit(k))
                            / (F.coalesce(F.col("c_uni"), F.lit(0))
                               + F.lit(k) * F.col("v"))).alias("__lp")))
    per_doc = scored.groupBy(id_col).agg(
        F.avg("__lp").alias("lm_score"), F.count("*").alias("n_bigrams"))
    # keep docs with no bigrams (score null), so the filter step decides
    return df.select(id_col).join(per_doc, id_col, "left")
