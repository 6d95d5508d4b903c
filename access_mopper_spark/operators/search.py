"""Full-text relevance ranking (BM25 / TF-IDF) as DataFrame algebra.

The retrieval primitive a training-data pipeline needs next to dedup and
similarity search: query-based corpus slicing ("find the documents about
X"), benchmark-contamination retrieval, and boosted sampling all reduce
to an inverted index + a sparse relevance score.

Scale shape (the 100 TB story):
- Tokenization is map-only Column math (no UDF, no Python).
- The postings build is ONE shuffle keyed by (doc, term) with map-side
  combine; document length rides along as a grouping column (it is
  functionally dependent on the doc id), so no second join against a
  doc-length table is needed.
- Query terms filter the exploded token stream BEFORE the shuffle — the
  postings that move are only for the handful of query terms.
- Document frequencies aggregate to |query_terms| rows and broadcast
  back; corpus stats (N, avgdl) are a 1-row aggregate broadcast the same
  way.
- Final ranking uses ``partial_topk`` (per-partition local top-k, then a
  k·p-row merge) — no global single-reducer sort.

Tokenization is the dialect-portable convention from
``functions/text.token_count``: collapse explicit whitespace
``[ \\t\\n\\r]+`` to single spaces, trim, split on the literal space —
bit-identical between Spark (Java regex) and the DuckDB oracle (RE2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from access_mopper_spark.functions.rounding import pround

from access_mopper_spark.functions.text import ws_normalized
from access_mopper_spark.operators.similarity import partial_topk


def tokens(text: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(ws_normalized(text), " ", -1)


def build_postings(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   terms: list[str] | None = None) -> DataFrame:
    """Inverted-index postings ``(id, term, tf, dl)``.

    ``dl`` (document token length) is carried through the explode and
    grouped on — functionally dependent on the id, so the single
    (doc, term) shuffle yields it for free.  ``terms`` (optional)
    restricts the postings to a query-term set, applied before the
    shuffle."""
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))
    exploded = toks.select(
        id_col, F.size("__w").alias("dl"), F.explode("__w").alias("term"))
    if terms is not None:
        exploded = exploded.where(F.col("term").isin(list(terms)))
    return exploded.groupBy(id_col, "dl", "term").agg(
        F.count("*").alias("tf"))


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """1-row frame (n_docs, avgdl) — broadcast side of the scorer."""
    return docs.select(F.size(tokens(F.col(text_col))).alias("__dl")).agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("__dl").cast("double")).alias("avgdl"))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k documents by Okapi BM25 against a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (Robertson/Lucene form,
    always positive).

    Plan: postings filtered to the query terms (one keyed shuffle) →
    df per term (tiny agg, broadcast back) → per-doc sum (second keyed
    shuffle over only matching docs) → partial top-k.  Scores are
    rounded to 6 dp with id tiebreak so ranking is deterministic across
    engines and summation orders."""
    postings = build_postings(docs, id_col, text_col, terms=query_terms)
    df_ = postings.groupBy("term").agg(F.count("*").alias("df"))
    stats = corpus_stats(docs, text_col)

    scored = (postings
              .join(F.broadcast(df_), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1.0)
               / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
    per_doc = (scored.select(F.col(id_col), (idf * tf_part).alias("__s"))
               .groupBy(id_col).agg(pround(F.sum("__s"), 6).alias("score")))
    return partial_topk(per_doc, [],
                        [F.col("score").desc(), F.col(id_col)], k)


def tfidf_vectors(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  min_df: int = 1) -> DataFrame:
    """Sparse TF-IDF postings ``(id, term, weight)`` over the whole
    vocabulary — the classic sparse-vector featurization.  Same shuffle
    shape as the BM25 build (term df is a per-term agg joined back on
    the term key; at full-vocabulary scale the df side is large, so this
    join is a keyed shuffle, not a broadcast).  weight = tf · ln(N/df),
    rounded to 6 dp."""
    postings = build_postings(docs, id_col, text_col)
    df_ = postings.groupBy("term").agg(F.count("*").alias("df")) \
                  .where(F.col("df") >= min_df)
    stats = corpus_stats(docs, text_col)
    return (postings.join(df_, "term").crossJoin(F.broadcast(stats))
            .select(F.col(id_col), "term",
                    pround(F.col("tf") * F.log(F.col("n_docs") / F.col("df")),
                            6).alias("weight")))
