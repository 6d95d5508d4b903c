"""Model-evaluation readouts as DataFrame algebra (classifier QC).

The curation pipeline trains cheap classifiers (operators/ml.logreg_train,
quality scores, reward-model proxies) whose outputs gate what enters the
training corpus — so the engine needs the standard evaluation readouts
next to them, computed distributed and integer-exact wherever the math
allows:

- ``auc_roc``: exact tie-corrected ROC-AUC via the Mann-Whitney rank-sum
  identity, computed from per-score counts.  The input collapses to one
  row per (group, score) in a map-side-combined aggregate (the 100 TB
  side never sorts); the rank accumulation is a window over that small
  aggregated table.  2·P·N·AUC = Σ_s p_s·(2·cumneg_<s + n_s) is INTEGER,
  so the result ships as exact basis points — no float in the hash
  surface.  For continuous scores, quantize into the resolution you
  report at (the operator docstring contract): AUC at 10⁴ score buckets
  differs from exact by <1e-4 while bounding the window table.
- ``calibration_bins``: reliability-diagram bins (predicted-probability
  decile vs empirical positive rate) — one map-side-combined aggregate,
  integer basis points throughout.
- ``confusion_at_thresholds``: the precision/recall/F1 sweep — each row
  fans out map-side to the (few, broadcast-literal) thresholds, then one
  grouped integer aggregate; F1 on the exact 2·TP grid.

All three follow the preference-QC conventions (annotator_bias /
position_bias): integer basis points via integer division, no windows
over raw data, one partial-aggregated shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def auc_roc(scored: DataFrame, score_col: str = "score",
            label_col: str = "label",
            group_cols: list[str] | None = None) -> DataFrame:
    """Exact ROC-AUC per group from a scored table (label ∈ {0,1}).

    Mann-Whitney identity with average-rank tie correction, evaluated on
    per-score counts: walking distinct scores ascending,

        2·P·N·AUC = Σ_s  p_s · (2·(negatives strictly below s) + n_s)

    where p_s/n_s are the positive/negative counts AT score s — each tie
    pair contributes ½, each won pair 1.  Everything is BIGINT; the
    output is exact basis points (``auc_bp = num2·10000 DIV (2·P·N)``).

    Scale shape: ONE map-side-combined aggregate collapses the corpus to
    |distinct scores| rows per group; the cumulative-negative window
    runs over that aggregated table only (partitioned by group).  With
    continuous scores quantize first (e.g. ``F.round(score*1e4)``) so
    the aggregated table stays bounded — the documented contract, same
    as every fixed-grid percentile in operators/aggregates.
    Groups with no positives or no negatives return NULL auc_bp rather
    than a division error.  The bp division runs on the exact integer
    grid while ``2·P·N ≤ 9·10^14`` (num2·10⁴ must fit a BIGINT — about
    2·10⁷ rows per class per group); above that a deterministic CASE
    switches to ``FLOOR(num2/den·10⁴)`` on doubles — num2 and den are
    still exact BIGINTs (< 2^63), both engines run the identical IEEE
    divide, and the result is within 1 bp of exact."""
    keys = list(group_cols or [])
    pos = F.col(label_col).cast("long")
    # NULL scores are unrankable and NULL labels belong to neither
    # class — drop both (COUNT(*) − SUM(label) would silently count a
    # NULL label as a negative, and Spark/DuckDB disagree on where
    # NULL scores sort)
    per_score = (scored.where(F.col(score_col).isNotNull()
                              & F.col(label_col).isNotNull())
                 .groupBy(*keys, F.col(score_col).alias("__s"))
                 .agg(F.sum(pos).alias("__p"),
                      (F.count("*") - F.sum(pos)).alias("__n")))
    w = (W.partitionBy(*keys).orderBy("__s") if keys else W.orderBy("__s"))
    below = F.coalesce(
        F.sum("__n").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0))
    contrib = per_score.select(
        *keys,
        F.col("__p"), F.col("__n"),
        (F.col("__p") * (F.lit(2) * below + F.col("__n"))).alias("__c"))
    g = contrib.groupBy(*keys) if keys else contrib.groupBy()
    return g.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.when((F.sum("__p") > 0) & (F.sum("__n") > 0),
               F.expr(
                   # num2 ≤ den = 2·P·N, so num2·10⁴ overflows BIGINT
                   # exactly when den > ~9.2·10^14 — guard with the
                   # same deterministic CASE the oracle replays
                   # the fallback denominator multiplies in DOUBLE —
                   # BIGINT 2·P·N itself overflows once P·N > ~4.6e18
                   # (~2e9 rows per class per group), exactly the regime
                   # the double branch exists for
                   "CASE WHEN 2 * SUM(__p) * SUM(__n) <= 900000000000000 "
                   "THEN CAST(SUM(__c) * 10000 "
                   "DIV (2 * SUM(__p) * SUM(__n)) AS BIGINT) "
                   "ELSE CAST(FLOOR(CAST(SUM(__c) AS DOUBLE) "
                   "/ (2.0 * CAST(SUM(__p) AS DOUBLE) "
                   "* CAST(SUM(__n) AS DOUBLE)) * 10000) AS BIGINT) END"))
        .alias("auc_bp"))


def calibration_bins(scored: DataFrame, prob_bp_col: str = "prob_bp",
                     label_col: str = "label",
                     n_bins: int = 10) -> DataFrame:
    """Reliability-diagram bins: predicted probability (integer basis
    points, 0..10000) vs empirical positive rate per bin.

    ``bin = LEAST(prob_bp·n_bins DIV 10000, n_bins−1)`` (the 10000 cell
    folds into the top bin).  Output per bin: count, mean predicted bp
    (integer division), empirical positive bp, and the signed gap — the
    per-bin term of expected calibration error.  All integers; ONE
    map-side-combined aggregate over ``n_bins`` keys.  NULL scores and
    NULL labels are dropped (same contract as auc_roc — a NULL prob
    would otherwise land in the top bin because LEAST skips NULLs)."""
    p = F.col(prob_bp_col).cast("long")
    # bin from Column arithmetic, never an f-string splice of the column
    # name into SQL text; p·n_bins ≤ 10⁵·n_bins is exact in doubles
    b = F.least(F.floor((p * F.lit(n_bins)) / F.lit(10000)),
                F.lit(n_bins - 1)).cast("long").alias("bin")
    y = F.col(label_col).cast("long")
    return (scored.where(F.col(prob_bp_col).isNotNull()
                         & F.col(label_col).isNotNull())
            .select(b, p.alias("__p"), y.alias("__y"))
            .groupBy("bin")
            .agg(F.count("*").alias("n"),
                 F.expr("CAST(SUM(__p) DIV COUNT(*) AS BIGINT)")
                 .alias("mean_pred_bp"),
                 F.expr("CAST(SUM(__y) * 10000 DIV COUNT(*) AS BIGINT)")
                 .alias("pos_rate_bp"),
                 F.expr("CAST(SUM(__y) * 10000 DIV COUNT(*) "
                        "- SUM(__p) DIV COUNT(*) AS BIGINT)")
                 .alias("gap_bp")))


# Poisson(1) CDF on the integer 2^32 grid: weight w is the count of
# thresholds the per-(row, replicate) 32-bit md5 lane clears.
# P(W=k)=e⁻¹/k!; truncated at 6 (P(W>6) < 1e-4 — at n rows per group
# the truncation bias on a mean is O(1e-4/n), far under the 1e-6
# reporting grid).  The grid must be EXACTLY the lane's 2^32 range —
# a modulo onto a non-divisor grid (first draft used 1e9) skews the
# lane distribution by ~7% because 2^32 mod 1e9 ≠ 0.
_POISSON1_CDF_2P32 = (1580030169, 3160060337, 3950075422, 4213413783,
                      4279248374, 4292415292)


def poisson_bootstrap_ci(df: DataFrame, value_col: str,
                         group_cols: list[str], id_col: str,
                         replicates: int = 20, salt: str = "boot0",
                         lo_q: float = 0.025,
                         hi_q: float = 0.975) -> DataFrame:
    """Bootstrap confidence interval for a per-group mean in ONE pass —
    the Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012): instead of resampling n rows
    with replacement (impossible distributed — it needs global n), each
    row enters replicate r with weight ~ Poisson(1), which is the n→∞
    limit of Binomial(n, 1/n) multiplicities.  Weights are a
    DETERMINISTIC 32-bit md5 lane per (salt, id, r) — four replicates
    share one digest (lane r%4 of digest r//4, so the dominant map
    stage hashes ⌈R/4⌉ times per row, not R) — quantized on the exact
    2^32 grid; reproducible across engines, partitionings, and cluster
    sizes (no RNG state), so an oracle replays the full resample.

    Scale shape: each row fans out map-side to ``replicates`` keys and
    partial aggregation collapses them before the shuffle — the
    exchange carries |groups|·R partial sums, NOT n·R rows.  Replicate
    means use exact integer Σw·x / Σw (``value_col`` must be integer —
    cents, counts); the rank-based interval picks the ⌈q·R⌉-th smallest
    replicate mean per group from the tiny (groups × R) table, a
    percentile_disc that both engines order identically (ties broken by
    replicate index).  The point estimate rides the same pass as the
    unweighted rep-0 sums.  Output per group: (…, n_rows, point_mean,
    boot_lo, boot_hi), means on the 1e-6 grid."""
    if not group_cols:
        raise ValueError("group_cols required (the CI window partitions "
                         "by group; an all-corpus CI needs a constant "
                         "group column)")
    keys = [F.col(c) for c in group_cols]
    x = F.col(value_col).cast("long")
    sid = F.col(id_col).cast("string")
    # one md5 digest carries FOUR 32-bit lanes — replicate r reads lane
    # r%4 of digest r//4, so each row hashes ⌈R/4⌉ times, not R.  The
    # fan-out is STAGED as two generators so every digest computes
    # exactly once: explode digest indices j, hash per (row, j), then
    # posexplode the digest's 4 hex lanes.  The digest alias is
    # referenced 4× by the lane array, which keeps CollapseProject from
    # inlining the md5 back into the generator's consumer (a
    # once-referenced array alias DID get inlined and recomputed per
    # (row, replicate): measured 13.9× wall for 10× data at ×100;
    # staged this way the hash stage is linear in rows).
    n_digests = (replicates + 3) // 4
    jrep = F.explode(F.sequence(F.lit(0), F.lit(n_digests - 1))).alias("__j")
    st = (df.select(*keys, x.alias("__x"), sid.alias("__id"), jrep)
          .select(*group_cols, "__x", "__j",
                  F.md5(F.concat(F.lit(salt + ":"), F.col("__id"),
                                 F.lit(":"), F.col("__j").cast("string")))
                  .alias("__dg"))
          .select(*group_cols, "__x", "__j",
                  F.posexplode(F.array(*[
                      F.col("__dg").substr(1 + 8 * lane_i, 8)
                      for lane_i in range(4)])).alias("__l", "__h")))
    fanned = (st.select(*group_cols, "__x",
                        (F.col("__j") * 4 + F.col("__l")).alias("__r"),
                        F.conv(F.col("__h"), 16, 10).cast("long")
                        .alias("__lane"))
              .where(F.col("__r") < replicates))
    w = sum((F.col("__lane") >= F.lit(t)).cast("long")
            for t in _POISSON1_CDF_2P32)
    per_rep = (fanned.withColumn("__w", w)
               .groupBy(*group_cols, "__r")
               .agg(F.sum(F.col("__w") * F.col("__x")).alias("__swx"),
                    F.sum("__w").alias("__sw"),
                    F.sum(F.when(F.col("__r") == 0, F.col("__x")))
                    .alias("__sx0"),
                    F.count(F.when(F.col("__r") == 0, F.lit(1)))
                    .alias("__n0")))
    from access_mopper_spark.functions.rounding import pround
    # a replicate CAN draw all-zero weights in a tiny group (P = e^-n):
    # NULL mean, ordered first on BOTH engines (Spark asc default;
    # oracle must write NULLS FIRST — DuckDB defaults NULLS LAST)
    mean_r = F.when(F.col("__sw") > 0,
                    pround(F.col("__swx").cast("double")
                           / F.col("__sw").cast("double"), 6))
    wq = W.partitionBy(*group_cols).orderBy("__m", "__r")
    ranked = (per_rep.select(*group_cols, F.col("__r"),
                             mean_r.alias("__m"),
                             F.col("__sx0"), F.col("__n0"))
              .withColumn("__rn", F.row_number().over(wq)))
    import math
    lo_rank = max(1, math.ceil(lo_q * replicates))
    hi_rank = min(replicates, math.ceil(hi_q * replicates))
    return (ranked.groupBy(*group_cols)
            .agg(F.max("__n0").cast("long").alias("n_rows"),
                 pround(F.max(F.col("__sx0")).cast("double")
                        / F.max(F.col("__n0")).cast("double"), 6)
                 .alias("point_mean"),
                 F.max(F.when(F.col("__rn") == lo_rank, F.col("__m")))
                 .alias("boot_lo"),
                 F.max(F.when(F.col("__rn") == hi_rank, F.col("__m")))
                 .alias("boot_hi")))


def retrieval_eval(results: DataFrame, qrels: DataFrame, k: int = 10,
                   query_col: str = "query_id", doc_col: str = "doc_id",
                   rank_col: str = "rank",
                   rel_col: str = "rel") -> DataFrame:
    """Ranking-quality readout per query: NDCG@k, MRR, hits@k — the
    standard eval for the engine's own retrieval stack (BM25, ANN,
    hybrid fusion) against a relevance-judgment table.

    ``results``: (query, doc, rank) with rank 1-based; ``qrels``:
    (query, doc, rel) integer relevance grades (missing pair = 0).

    DCG@k = Σ_{rank≤k} (2^rel − 1) / log2(rank + 1); the ideal DCG
    re-ranks each query's judged docs by (rel desc) — computed with ONE
    window over the (small) qrels side, never over results.  MRR uses
    the first rank with rel > 0.  Plan: results⋈qrels is an equi-join
    on (query, doc) — both sides hash by query — then one grouped
    aggregate per query; the join is LEFT from results so unjudged
    retrieved docs score 0 gain.  Floats (log2) snap to the 1e-6 grid
    per the registry rounding convention.

    Returns (query, ndcg_bp is NOT integer — ndcg/mrr are 6-dp doubles,
    hits@k integer): (query_col, n_retrieved, n_rel_retrieved, ndcg,
    mrr)."""
    from access_mopper_spark.functions.rounding import pround
    r = results.where(F.col(rank_col) <= k).alias("r")
    q = qrels.alias("q")
    joined = r.join(
        q, (F.col(f"r.{query_col}") == F.col(f"q.{query_col}"))
        & (F.col(f"r.{doc_col}") == F.col(f"q.{doc_col}")), "left")
    rel = F.coalesce(F.col(f"q.{rel_col}"), F.lit(0)).cast("long")
    gain = (F.pow(F.lit(2.0), rel.cast("double")) - F.lit(1.0))
    disc = F.log2(F.col(rank_col).cast("double") + F.lit(1.0))
    per_q = (joined.groupBy(F.col(f"r.{query_col}").alias(query_col))
             .agg(F.count("*").alias("n_retrieved"),
                  F.sum((rel > 0).cast("long")).cast("long")
                  .alias("n_rel_retrieved"),
                  F.sum(gain / disc).alias("__dcg"),
                  F.min(F.when(rel > 0, F.col(rank_col))).alias("__fr")))
    # ideal DCG from the qrels side: rank judged docs by rel desc (doc
    # asc tiebreak), take top-k — |qrels per query| rows ride the window
    wq = W.partitionBy(query_col).orderBy(F.desc(rel_col), F.asc(doc_col))
    ideal = (qrels.where(F.col(rel_col) > 0)
             .withColumn("__ir", F.row_number().over(wq))
             .where(F.col("__ir") <= k)
             .groupBy(query_col)
             .agg(F.sum((F.pow(F.lit(2.0),
                               F.col(rel_col).cast("double")) - F.lit(1.0))
                        / F.log2(F.col("__ir").cast("double") + F.lit(1.0)))
                  .alias("__idcg")))
    return (per_q.join(ideal, query_col, "left")
            .select(query_col, "n_retrieved", "n_rel_retrieved",
                    pround(F.when(F.col("__idcg") > 0,
                                  F.col("__dcg") / F.col("__idcg"))
                           .otherwise(F.lit(0.0)), 6).alias("ndcg"),
                    pround(F.coalesce(F.lit(1.0)
                                      / F.col("__fr").cast("double"),
                                      F.lit(0.0)), 6).alias("mrr")))


def rrf_fuse(rankings: list[DataFrame], k: int = 60, topk: int = 10,
             query_col: str = "query_id", doc_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) — the standard
    hybrid-search merge of heterogeneous rankings (BM25 lexical + ANN
    dense) without score calibration: fused(d) = Σ_i 1/(k + rank_i(d))
    over the rankings that retrieved d.

    Plan: union the ranking tables (map-only), ONE grouped aggregate on
    (query, doc) sums the reciprocal contributions, then the per-query
    top-k rides a rank-pushed window (WindowGroupLimit).  Deterministic
    tie order (fused score desc on the 1e-6 grid, doc asc).  At 100 TB
    the rankings are already top-n per query, so every stage is bounded
    by n·|rankings| rows per query."""
    from access_mopper_spark.functions.rounding import pround
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [rk.select(query_col, doc_col,
                       (F.lit(1.0) / (F.lit(float(k))
                                      + F.col(rank_col).cast("double")))
                       .alias("__c"))
             for rk in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (u.groupBy(query_col, doc_col)
             .agg(pround(F.sum("__c"), 6).alias("rrf_score"),
                  F.count("*").cast("long").alias("n_lists")))
    wq = W.partitionBy(query_col).orderBy(F.desc("rrf_score"),
                                          F.asc(doc_col))
    return (fused.withColumn("fused_rank", F.row_number().over(wq))
            .where(F.col("fused_rank") <= topk))


def confusion_at_thresholds(scored: DataFrame, thresholds: list,
                            score_col: str = "score",
                            label_col: str = "label") -> DataFrame:
    """Confusion counts + precision/recall/F1 at each threshold
    (prediction = score ≥ t).  The thresholds are a broadcast literal
    array each row fans out to map-side (|thresholds| is small), then
    ONE grouped integer aggregate per threshold key.

    Integer outputs: ``precision_bp = TP·10000 DIV (TP+FP)`` (NULL when
    no positives predicted), ``recall_bp = TP·10000 DIV (TP+FN)`` (NULL
    when no actual positives), ``f1_bp = 2·TP·10000 DIV (2·TP+FP+FN)``
    — the harmonic mean on the exact 2·TP grid, no float anywhere.
    NULL scores/labels are dropped (auc_roc contract: a NULL label
    would otherwise break the tp+fp+fn+tn == n partition)."""
    t_arr = F.array(*[F.lit(t) for t in thresholds])
    y = F.col(label_col).cast("long")
    fanned = scored.where(F.col(score_col).isNotNull()
                          & F.col(label_col).isNotNull()).select(
        F.explode(t_arr).alias("threshold"),
        y.alias("__y"),
        F.col(score_col).alias("__s"))
    pred = (F.col("__s") >= F.col("threshold")).cast("long")
    tp = F.sum(pred * F.col("__y"))
    fp = F.sum(pred * (1 - F.col("__y")))
    fn = F.sum((1 - pred) * F.col("__y"))
    tn = F.sum((1 - pred) * (1 - F.col("__y")))
    return (fanned.groupBy("threshold")
            .agg(tp.cast("long").alias("tp"),
                 fp.cast("long").alias("fp"),
                 fn.cast("long").alias("fn"),
                 tn.cast("long").alias("tn"))
            .select(
                "threshold", "tp", "fp", "fn", "tn",
                F.when(F.col("tp") + F.col("fp") > 0,
                       F.expr("CAST(tp * 10000 DIV (tp + fp) AS BIGINT)"))
                .alias("precision_bp"),
                F.when(F.col("tp") + F.col("fn") > 0,
                       F.expr("CAST(tp * 10000 DIV (tp + fn) AS BIGINT)"))
                .alias("recall_bp"),
                F.when(F.lit(2) * F.col("tp") + F.col("fp")
                       + F.col("fn") > 0,
                       F.expr("CAST(2 * tp * 10000 "
                              "DIV (2 * tp + fp + fn) AS BIGINT)"))
                .alias("f1_bp")))
