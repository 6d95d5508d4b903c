"""Corpus assembly operators: mixture sampling, quality-quantile and
per-group cap filtering, sequence packing, and deterministic sharding —
the steps between "curated documents" and "training shards".

Scale design (100 TB of documents):
- everything here is a pure function of document ids and tiny per-group
  statistics — no RNG state, no driver-side loops, reproducible across
  runs and cluster sizes.
- per-source statistics (counts, weights) are one tiny aggregate
  broadcast back; membership tests are then map-only.
- packing and capping use ONE window shuffle keyed by the group column —
  the same shuffle a groupBy would take; no global sort anywhere.
- sharding is map-only: shard id is a hash residue, so output files can
  be written with a single ``partitionBy("shard")`` pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def uniform_hash(id_col: Column, salt: str) -> Column:
    """Deterministic uniform double in [0, 1): first 32 bits of
    md5(salt || id) over 2^32.  Engine-portable — DuckDB replays it as
    ``('0x' || substring(md5(...), 1, 8))::BIGINT / 4294967296.0``."""
    digest = F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("double") / F.lit(2.0 ** 32)


def mixture_sample(df: DataFrame, source_col: str = "source",
                   alpha: float = 0.5, id_col: str = "doc_id",
                   salt: str = "mix0") -> DataFrame:
    """Temperature-flattened source mixture: downsample large sources so
    the kept corpus follows ``share_s ∝ count_s^alpha`` (alpha=1 keeps
    the natural mixture, alpha=0 equalizes sources) — the standard
    mixture-reweighting step when assembling multi-source training data.

    Keep probability per source: ``p_s = (c_s / c_min)^(alpha - 1)``,
    capped at 1 — ``c^(alpha-1)`` is decreasing in ``c`` for alpha < 1,
    so the SMALLEST source keeps everything (sampling never upsamples)
    and larger sources are downsampled toward the flattened share
    (kept_s ≈ c_min^(1-alpha) · c_s^alpha ∝ c_s^alpha).  Membership is a
    deterministic per-id hash test against the broadcast per-source
    probability: two tiny aggregates (per-source counts, global min)
    joined back by broadcast, then a map-only filter. No sampling RNG,
    no shuffle of the data itself."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("__c"))
    cmin = counts.agg(F.min("__c").alias("__cmin"))
    probs = counts.crossJoin(F.broadcast(cmin)).select(
        source_col,
        F.least(F.lit(1.0),
                F.pow(F.col("__c") / F.col("__cmin"), F.lit(alpha - 1.0)))
        .alias("__p"))
    u = uniform_hash(F.col(id_col), salt)
    return (df.join(F.broadcast(probs), source_col)
              .where(u < F.col("__p"))
              .drop("__p"))


def quality_quantile_filter(df: DataFrame, score_col: str,
                            group_col: str = "lang",
                            keep_top: float = 0.5,
                            id_col: str = "doc_id",
                            exact: bool = True) -> DataFrame:
    """Keep the top ``keep_top`` fraction of each group by quality score
    — per-language quality thresholding, so high-resource languages don't
    set the bar for low-resource ones.

    ``exact=True`` (default): per-group percent_rank — one keyed window
    shuffle; ties broken by id so membership is deterministic.

    ``exact=False``: the 100 TB path — per-group ``approx_percentile``
    threshold (tiny aggregate, broadcast back) + map-only filter.  Same
    membership within sketch error, NO per-group sort: the data side
    never shuffles (the same broadcast-stats shape as mixture_sample)."""
    if exact:
        pr = F.percent_rank().over(
            W.partitionBy(group_col).orderBy(F.col(score_col).desc(),
                                             F.col(id_col)))
        return (df.withColumn("__pr", pr)
                  .where(F.col("__pr") < keep_top)
                  .drop("__pr"))
    thresholds = df.groupBy(group_col).agg(
        F.percentile_approx(score_col, 1.0 - keep_top, 10000).alias("__thr"))
    return (df.join(F.broadcast(thresholds), group_col)
              .where(F.col(score_col) >= F.col("__thr"))
              .drop("__thr"))


def cap_per_group(df: DataFrame, group_col: str, order_col: str,
                  n: int, id_col: str = "doc_id",
                  descending: bool = True) -> DataFrame:
    """Keep at most ``n`` rows per group, best-first — per-host /
    per-source caps against single-origin domination (a crawl-curation
    staple).  One keyed window shuffle; deterministic id tiebreak."""
    order = (F.col(order_col).desc() if descending else F.col(order_col).asc())
    rn = F.row_number().over(W.partitionBy(group_col).orderBy(order, F.col(id_col)))
    return df.withColumn("__rn", rn).where(F.col("__rn") <= n).drop("__rn")


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   group_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic sequential packing of documents into fixed
    token-budget bins (context-window packing for training): documents
    are laid out in id order within each group; a document starts in the
    bin where the running token total stood when it arrived.

    Emits ``bin_id`` (0-based within group) and ``bin_offset`` (token
    offset of the document's start within its bin).  This is the
    streaming-fill formulation — a document may straddle a bin boundary
    (the trainer's concat-and-chunk handles that); exact first-fit
    bin-packing is inherently sequential and gains <2% fill at typical
    doc/budget ratios.  One keyed window shuffle, cumulative sum only —
    scales like any grouped running total."""
    w = (W.partitionBy(group_col).orderBy(F.col(id_col))
         .rowsBetween(W.unboundedPreceding, -1))
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    # floor-divide explicitly: a bare cast of the double quotient truncates
    # on Spark but ROUNDS on some engines (DuckDB CAST) — floor is portable
    return (df.withColumn("bin_id", F.floor(before / F.lit(budget)).cast("long"))
              .withColumn("bin_offset", (before % F.lit(budget)).cast("long")))


def shard_assign(df: DataFrame, n_shards: int,
                 id_col: str = "doc_id", salt: str = "shard0") -> DataFrame:
    """Deterministic output sharding: ``shard = hash(id) mod n_shards``
    over the portable md5 lane, so the same document lands in the same
    shard on every engine and cluster size.  Map-only; writing becomes
    one ``partitionBy("shard")`` pass and shard sizes are uniform by
    hash uniformity (no skew for any n_shards ≪ corpus size)."""
    digest = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    code = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    return df.withColumn("shard", (code % n_shards).cast("int"))


def chunk_documents(df: DataFrame, size: int, overlap: int,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-size character windows with overlap —
    the context-window chunker feeding embedding/RAG indexing and
    fixed-length training examples.  stride = size − overlap; chunk i
    covers ``[i·stride, i·stride + size)`` and the last chunk reaches the
    end of the document (possibly shorter).

    Pure Column math: per-row chunk-index ``sequence`` → ``transform`` →
    ``explode`` — map-only (no shuffle), output rows ≈ input_chars/stride
    regardless of document skew, so it scales with data volume, not
    document count."""
    if not (0 <= overlap < size):
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(float(stride))))
    idx = F.explode(F.sequence(F.lit(0), (n - 1).cast("int")))
    out = df.withColumn("chunk_id", idx)
    chunk = F.substring(F.col(text_col),
                        (F.col("chunk_id") * stride + 1).cast("int"), size)
    return out.withColumn("chunk", chunk)


def weighted_sample_per_group(df: DataFrame, weight_col: str, k: int,
                              group_col: str = "source",
                              id_col: str = "doc_id",
                              salt: str = "wrs0") -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — pick the
    quality-weighted subset of each source (heavier rows proportionally
    likelier), deterministically and distributed.

    Efraimidis–Spirakis exponential keys: each row draws
    ``key = u^(1/w)`` with ``u`` the portable per-id uniform hash; the
    top-k keys per group are exactly a weighted sample without
    replacement.  Membership is a pure function of (salt, id, weight) —
    reproducible across engines and cluster sizes.  One keyed window
    shuffle (the same top-k-per-group shape as ``cap_per_group``).
    Rows with NULL or non-positive weight are excluded — weight 0 means
    "never sample" in E-S semantics, and 1/w on a zero weight is an
    ANSI divide-by-zero (fuzz-caught on empty documents)."""
    key = F.pow(uniform_hash(F.col(id_col), salt),
                F.lit(1.0) / F.col(weight_col))
    rn = F.row_number().over(
        W.partitionBy(group_col).orderBy(F.col("__wkey").desc(), F.col(id_col)))
    return (df.where(F.col(weight_col) > 0)
              .withColumn("__wkey", key)
              .withColumn("__rn", rn)
              .where(F.col("__rn") <= k)
              .drop("__wkey", "__rn"))


def chunk_documents_tokens(df: DataFrame, size: int, overlap: int,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Token-aligned chunking: fixed-size windows of whitespace tokens
    with overlap — boundaries never split a word, the granularity a
    tokenizer-fed training pipeline actually wants (the char-based
    :func:`chunk_documents` is for byte-budget consumers).  Same
    map-only sequence→explode shape; stride = size − overlap."""
    if not (0 <= overlap < size):
        raise ValueError("need 0 <= overlap < size")
    from access_mopper_spark.functions.text import ws_normalized

    stride = size - overlap
    toks = F.split(ws_normalized(F.col(text_col)), " ", -1)
    ntok = F.size(toks)
    n = F.greatest(F.lit(1),
                   F.ceil((ntok - F.lit(overlap)) / F.lit(float(stride))))
    out = df.withColumn("__toks", toks) \
            .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), (n - 1).cast("int"))))
    chunk_toks = F.slice(F.col("__toks"),
                         (F.col("chunk_id") * stride + 1).cast("int"), size)
    return (out.withColumn("chunk", F.array_join(chunk_toks, " "))
               .withColumn("chunk_ntok", F.size(chunk_toks))
               .drop("__toks"))


def token_budget_fill(df: DataFrame, token_col: str, budget: int,
                      source_col: str, id_col: str) -> DataFrame:
    """Per-source TOKEN-BUDGET mixture assembly: admit documents, in a
    deterministic corpus-stable order (md5 of the id — a seeded shuffle
    that never re-ranks when the corpus grows elsewhere), until each
    source's cumulative token count reaches its budget.  This is the
    budget-form of data mixing (give me exactly N tokens of web, M of
    code…), the complement of ``mixture_sample``'s probability form.

    One keyed window shuffle (cumsum per source); the filter is
    map-side after it.  Keeps rows whose INCLUSIVE running total stays
    within budget, so the output never overshoots by more than zero
    docs and underfills only by the tail fragment — the deterministic
    contract both engines replay exactly (integer cumsum, no fp)."""
    w = (W.partitionBy(source_col)
          .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    out = df.withColumn("cum_tokens", F.sum(token_col).over(w))
    return out.where(F.col("cum_tokens") <= budget)


def exact_stratified_split(df: DataFrame, id_col: str, stratum_col,
                           train_frac: float = 0.8, val_frac: float = 0.1,
                           salt: str = "strat0") -> DataFrame:
    """EXACT-count stratified train/val/test split: within every stratum
    the first ``floor(train_frac*n)`` documents of a deterministic
    hash shuffle go to train, the next ``floor(val_frac*n)`` to val,
    the rest to test — the exact-proportion contract hash-threshold
    sampling cannot give (``deterministic_sample`` hits the fraction
    only in expectation; eval-set sizing wants it exact).

    The within-stratum rank is computed WITHOUT a per-stratum global
    sort (strata are few and huge — a language is terabytes at corpus
    scale): rows bucket by their hash's first two hex chars (256
    lexicographic buckets), per-(stratum, bucket) counts give every
    bucket its strictly-earlier offset via a broadcast non-equi join
    over the tiny count table, and ``row_number`` runs over windows
    PARTITIONED by (stratum, bucket) — 256× the parallelism of the
    naive ``PARTITION BY stratum`` window, same answer
    (``operators/ranking.global_rank``'s decomposition, keyed).

    Deterministic: order key is (md5(salt||id), id) — total order, no
    RNG state, identical on any engine or cluster size."""
    sid = F.col(id_col).cast("string")
    h = F.md5(F.concat(F.lit(salt + ":"), sid))
    pts = (df.select(F.col(id_col), F.col(stratum_col).alias("__s"))
             .withColumn("__h", h)
             .withColumn("__b", F.substring(F.col("__h"), 1, 2)))

    counts = (pts.groupBy("__s", "__b").agg(F.count("*").alias("__bn")))
    earlier = counts.select(F.col("__s").alias("__s2"),
                            F.col("__b").alias("__b2"),
                            F.col("__bn").alias("__n2"))
    offsets = (counts.join(F.broadcast(earlier),
                           (F.col("__s").eqNullSafe(F.col("__s2")))
                           & (F.col("__b2") < F.col("__b")), "left")
                     .groupBy("__s", "__b")
                     .agg(F.sum(F.coalesce("__n2", F.lit(0))).alias("__off")))
    totals = (counts.groupBy(F.col("__s").alias("__s3"))
                    .agg(F.sum("__bn").alias("__n")))

    w = W.partitionBy("__s", "__b").orderBy("__h", id_col)
    # stratum can be NULL (e.g. unlabeled language) — the offset join
    # must be null-safe or those rows silently drop (fuzz seed0 caught
    # the list-form equi-join doing exactly that)
    off2 = offsets.select(F.col("__s").alias("__so"),
                          F.col("__b").alias("__bo"), "__off")
    ranked = (pts.join(F.broadcast(off2),
                       F.col("__s").eqNullSafe(F.col("__so"))
                       & (F.col("__b") == F.col("__bo")))
                 .drop("__so", "__bo")
                 .withColumn("__r", F.col("__off") + F.row_number().over(w))
                 .join(F.broadcast(totals),
                       F.col("__s3").eqNullSafe(F.col("__s")))
                 .drop("__s3"))
    k_train = F.floor(F.lit(train_frac) * F.col("__n"))
    k_val = F.floor(F.lit(train_frac + val_frac) * F.col("__n"))
    split = (F.when(F.col("__r") <= k_train, "train")
              .when(F.col("__r") <= k_val, "val").otherwise("test"))
    return ranked.select(F.col(id_col), F.col("__s").alias("stratum"),
                         split.alias("split"))


def importance_weights(df: DataFrame, is_target, text_col: str = "text",
                       id_col: str = "doc_id", n_buckets: int = 64,
                       salt: str = "dsir") -> DataFrame:
    """Hashed-n-gram importance weights (the DSIR recipe, Xie et al.
    2023, arXiv:2302.03169): score every document by how much its
    hashed unigram distribution looks like a TARGET subcorpus rather
    than the raw corpus — the data-selection step that tilts a 100 TB
    crawl toward a high-quality target domain without training a model.

    ``is_target`` is a boolean Column over ``df`` defining the target
    subcorpus.  Features are md5-hashed word buckets (mod n_buckets);
    bucket log-ratios use add-1 smoothing.  The per-document weight
    ships as ``imp_micro`` — the per-bucket log-ratio snapped to the
    1e-6 micro-nat grid as BIGINT and summed EXACTLY (integer addition
    is order-free, so the result is partition-layout-invariant and
    cross-engine stable; a float sum of logs would not be).

    Scale shape: one explode+count shuffle for the bucket tables (2 ×
    n_buckets rows), the log-ratio table BROADCASTS, the per-document
    score is a map-side lookup plus one keyed rollup.  Returns
    ``(id, n_toks, imp_micro)`` for non-null-text documents."""
    from access_mopper_spark.functions.text import ws_normalized

    toks = (df.where(F.col(text_col).isNotNull())
              .select(F.col(id_col), is_target.alias("__t"),
                      F.explode(F.split(ws_normalized(F.col(text_col)),
                                        " ", -1)).alias("word"))
              .where(F.length("word") > 0))
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col("word"))), 1, 8), 16, 10)
        .cast("long") % F.lit(n_buckets))
    tb = toks.select(F.col(id_col), "__t", bucket.alias("b"))
    counts = tb.groupBy("b").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("ct"),
        F.count("*").alias("cs"))
    tot = counts.agg(F.sum("ct").alias("tt"), F.sum("cs").alias("ts"))
    lr = (counts.crossJoin(F.broadcast(tot))
          .select("b", F.floor(
              (F.log((F.col("ct") + F.lit(1)).cast("double")
                     / (F.col("tt") + F.lit(n_buckets)).cast("double"))
               - F.log((F.col("cs") + F.lit(1)).cast("double")
                       / (F.col("ts") + F.lit(n_buckets)).cast("double")))
              * F.lit(1e6) + F.lit(0.5)).cast("long").alias("lr_micro")))
    return (tb.join(F.broadcast(lr), "b")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_toks"),
                   F.sum("lr_micro").alias("imp_micro")))


def temperature_weights(df: DataFrame, group_col: str,
                        alpha: float = 0.5) -> DataFrame:
    """Temperature-based mixture resampling weights — the multilingual
    rebalancing rule (sample language l with p_l ∝ share_l^α, α < 1
    up-weights tail languages; α = 1 is proportional, α = 0 uniform)
    used by multilingual LM data mixes.

    Returns one row per group: ``(group, n_docs, share, weight,
    boost)`` where weight = share^α / Σ share^α and boost =
    weight / share (the resampling factor to apply per group) — all
    UNROUNDED doubles computed from exact integer counts; callers snap
    to their grid.  Plan: one map-side-combined count on the (small)
    group key and a broadcast 1-row normalizer join — the corpus
    never shuffles."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("__n"))
    j = counts.join(F.broadcast(tot))
    share = F.col("n_docs").cast("double") / F.col("__n").cast("double")
    powed = j.select(group_col, "n_docs", share.alias("share"),
                     F.pow(share, F.lit(float(alpha))).alias("__pa"))
    z = powed.agg(F.sum("__pa").alias("__z"))
    out = powed.join(F.broadcast(z))
    w = F.col("__pa") / F.col("__z")
    return out.select(group_col, "n_docs", "share", w.alias("weight"),
                      (w / F.col("share")).alias("boost"))


def padding_waste(df: DataFrame, token_col: str,
                  bucket_bounds: list[int]) -> DataFrame:
    """Length-bucketed batching efficiency report: when sequences are
    padded to their bucket's bound (the standard bucketed-batching
    inference/training setup), how many pad tokens does each bucket
    burn?  The readout that picks bucket boundaries before a big run —
    wasteful bounds at 100 TB are real GPU-hours.

    Each sequence lands in the FIRST bound ≥ its length (longer
    sequences fold into the top bucket, flagged truncated).  Per
    bucket: sequence count, real tokens, padded slots (n · bound), and
    integer-bp waste share.  ONE map-side-combined aggregate over
    |buckets| keys; all-integer output.  NULL lengths count as 0 (an
    un-tokenized/empty doc occupies a smallest-bucket slot — without
    the coalesce a NULL length rides the CASE into the TOP bucket and
    NULL-poisons the bucket's sums; fuzz seed4)."""
    if not bucket_bounds:
        raise ValueError("padding_waste needs at least one bucket bound")
    bounds = sorted(bucket_bounds)
    t = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    bucket = F.lit(bounds[-1])
    for b in reversed(bounds[:-1]):
        bucket = F.when(t <= b, F.lit(b)).otherwise(bucket)
    eff = F.least(t, F.lit(bounds[-1]))  # tokens kept after truncation
    return (df.select(bucket.alias("bucket_bound"), t.alias("__t"),
                      eff.alias("__e"))
            .groupBy("bucket_bound")
            .agg(F.count("*").alias("n_seqs"),
                 F.sum("__t").cast("long").alias("sum_tokens"),
                 F.expr("CAST(COUNT(*) * bucket_bound AS BIGINT)")
                 .alias("padded_slots"),
                 F.sum((F.col("__t") > F.lit(bounds[-1])).cast("long"))
                 .cast("long").alias("n_truncated"),
                 F.expr(f"CAST((COUNT(*) * bucket_bound - SUM(__e)) * 10000 "
                        f"DIV (COUNT(*) * bucket_bound) AS BIGINT)")
                 .alias("waste_bp")))
