"""Corpus drift monitors — the readouts a training-data pipeline runs
between snapshots (new crawl vs reference mix) before committing a data
refresh: Population Stability Index over a bucketed scalar (the
classic "did the length/score distribution move" check) and smoothed
unigram KL divergence (vocabulary drift).

Both are one-pass integer-count aggregations with a broadcast 1-row
totals join; the only float work is the final p·ln(p/q) terms computed
from exact integer counts — identical IEEE ops on both engines, snapped
to the 1e-6 grid by the caller's rounding convention.

Scale shape at 100 TB: the PSI bucket table is tiny by construction
(integer-division buckets); the KL token table is the same (token,
side) count every corpus-stats query already pays (map-side combined,
one shuffle), and the union-vocabulary smoothing terms aggregate where
the counts live — no vocabulary broadcast, no second corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def embedding_centroid_drift(emb: DataFrame, side_col: str,
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-space drift between two corpus snapshots: the cosine
    similarity and squared L2 distance between the two sides' centroid
    vectors — the cheap first-line check that a re-embedded or
    refreshed corpus still lives in the same region of embedding space
    (a centroid shift breaks ANN index reuse and semantic-dedup
    thresholds calibrated on the old snapshot).

    Determinism contract: every ELEMENT snaps to the integer 1e-6 grid
    before any sum (the cents pattern — map-side, order-free), the
    per-dimension totals are exact BIGINT sums, and the mean re-snaps
    through a double division of exact integers (< 2^53 — correctly
    rounded, identical on both engines regardless of partitioning).
    The cosine numerator and both norms are then EXACT BIGINT sums over
    ≤dim values (dim·(1e6)² ≪ 2^63) — the only floats anywhere take
    exact integer inputs, so there is truly no summation-order surface
    (a first draft summed raw doubles before snapping, which made the
    snap partition-order dependent).

    Plan: one posexplode (map-only fan-out ×dim) + ONE map-side-
    combined (side, dim) aggregate, then a dim-sized join and a 1-row
    reduce.  At 100 TB the shuffle carries 2·dim partial sums.
    Output 1 row: (n_dims, n_ref, n_cur, cosine, l2_sq_micro2)."""
    from access_mopper_spark.functions.rounding import pround
    side = F.col(side_col).cast("int")
    ex = emb.select(side.alias("__s"),
                    F.posexplode(F.col(vec_col)).alias("__p", "__v"))
    v_micro = F.floor(F.col("__v").cast("double") * 1e6 + F.lit(0.5)) \
        .cast("long")
    per = (ex.groupBy("__s", "__p")
           .agg(F.sum(v_micro).alias("__sum"),
                F.count("*").alias("__n")))
    mean_micro = F.floor(F.col("__sum").cast("double") / F.col("__n")
                         + F.lit(0.5)).cast("long")
    m = per.select("__s", "__p", mean_micro.alias("__m"), F.col("__n"))
    a = m.where(F.col("__s") == 0).select(F.col("__p"),
                                          F.col("__m").alias("__m0"),
                                          F.col("__n").alias("__n0"))
    b = m.where(F.col("__s") == 1).select(F.col("__p"),
                                          F.col("__m").alias("__m1"),
                                          F.col("__n").alias("__n1"))
    j = a.join(b, "__p")
    red = j.agg(
        F.count("*").cast("long").alias("n_dims"),
        F.max("__n0").cast("long").alias("n_ref"),
        F.max("__n1").cast("long").alias("n_cur"),
        F.sum(F.col("__m0") * F.col("__m1")).alias("__dot"),
        F.sum(F.col("__m0") * F.col("__m0")).alias("__a2"),
        F.sum(F.col("__m1") * F.col("__m1")).alias("__b2"),
        F.sum((F.col("__m0") - F.col("__m1"))
              * (F.col("__m0") - F.col("__m1"))).alias("l2_sq_micro2"))
    cos = F.when((F.col("__a2") > 0) & (F.col("__b2") > 0),
                 F.col("__dot").cast("double")
                 / (F.sqrt(F.col("__a2").cast("double"))
                    * F.sqrt(F.col("__b2").cast("double"))))
    return red.select("n_dims", "n_ref", "n_cur",
                      pround(cos, 6).alias("cosine"),
                      F.col("l2_sq_micro2").cast("long")
                      .alias("l2_sq_micro2"))


def psi_buckets(df: DataFrame, value_col: str, side_col: str,
                bucket_width: int = 64) -> DataFrame:
    """Per-bucket PSI decomposition between two corpus snapshots.

    ``df`` carries one row per document with an integer ``value_col``
    (length, score grid, token count) and ``side_col`` ∈ {0 = reference,
    1 = current}.  Values bucket by integer division (``value DIV
    bucket_width`` — pure integer math, no log2 portability surface);
    Laplace add-1 smoothing over the UNION bucket set keeps empty
    buckets finite: p = (cnt + 1) / (n_side + B).

    Returns one row per occupied bucket: ``(bucket, n_ref, n_cur,
    psi_term)`` with psi_term = (p_cur − p_ref) · ln(p_cur / p_ref)
    (UNROUNDED — callers snap to their grid).  Σ psi_term is the PSI;
    the per-bucket decomposition is the actionable part (WHICH region
    of the distribution moved).  Plan: one map-side-combined
    (bucket, side) count, a conditional-aggregate pivot on the bucket
    key, and a broadcast 1-row totals join."""
    side = F.col(side_col).cast("int")
    b = df.select(
        # integer DIV, not floor(float /): the bucket edge must be
        # exact on both engines (DuckDB // mirrors Spark DIV)
        F.expr(f"CAST(CAST({value_col} AS BIGINT) "
               f"DIV {bucket_width} AS BIGINT)").alias("bucket"),
        side.alias("__side"))
    counts = (b.groupBy("bucket")
              .agg(F.sum(F.when(F.col("__side") == 0, 1).otherwise(0))
                   .cast("long").alias("n_ref"),
                   F.sum(F.when(F.col("__side") == 1, 1).otherwise(0))
                   .cast("long").alias("n_cur")))
    totals = counts.agg(F.sum("n_ref").alias("__tr"),
                        F.sum("n_cur").alias("__tc"),
                        F.count("*").alias("__nb"))
    j = counts.join(F.broadcast(totals))
    p_ref = ((F.col("n_ref") + 1).cast("double")
             / (F.col("__tr") + F.col("__nb")).cast("double"))
    p_cur = ((F.col("n_cur") + 1).cast("double")
             / (F.col("__tc") + F.col("__nb")).cast("double"))
    return j.select(
        "bucket", "n_ref", "n_cur",
        ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("psi_term"))


def unigram_kl(tokens_df: DataFrame, token_col: str,
               side_col: str) -> DataFrame:
    """Smoothed unigram KL divergence KL(current ‖ reference) between
    two corpus snapshots — the vocabulary-drift readout.

    ``tokens_df``: one row per token occurrence with ``side_col`` ∈
    {0 = reference, 1 = current}.  Add-1 smoothing over the UNION
    vocabulary V: p_side(t) = (c_side(t) + 1) / (N_side + |V|), and
    KL = Σ_V p_cur · ln(p_cur / p_ref) — absent-in-current tokens
    still contribute their smoothed mass, so the sum runs over the
    full outer (token → c_ref, c_cur) table.

    Returns ONE row: ``(n_tokens_ref, n_tokens_cur, vocab, kl_nats)``
    (kl_nats UNROUNDED).  Plan: one (token) count with conditional
    side sums (map-side combined), a broadcast 1-row totals join, and
    a scalar reduce — the same cost as any unigram corpus statistic."""
    side = F.col(side_col).cast("int")
    c = (tokens_df.select(F.col(token_col).alias("tok"),
                          side.alias("__side"))
         .groupBy("tok")
         .agg(F.sum(F.when(F.col("__side") == 0, 1).otherwise(0))
              .cast("long").alias("c_ref"),
              F.sum(F.when(F.col("__side") == 1, 1).otherwise(0))
              .cast("long").alias("c_cur")))
    totals = c.agg(F.sum("c_ref").alias("__nr"),
                   F.sum("c_cur").alias("__nc"),
                   F.count("*").alias("__v"))
    j = c.join(F.broadcast(totals))
    p_ref = ((F.col("c_ref") + 1).cast("double")
             / (F.col("__nr") + F.col("__v")).cast("double"))
    p_cur = ((F.col("c_cur") + 1).cast("double")
             / (F.col("__nc") + F.col("__v")).cast("double"))
    return (j.select((p_cur * F.log(p_cur / p_ref)).alias("__term"),
                     "__nr", "__nc", "__v")
            .groupBy("__nr", "__nc", "__v")
            .agg(F.sum("__term").alias("kl_nats"))
            .select(F.col("__nr").alias("n_tokens_ref"),
                    F.col("__nc").alias("n_tokens_cur"),
                    F.col("__v").alias("vocab"),
                    "kl_nats"))
