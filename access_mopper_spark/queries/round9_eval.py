"""Round-9 additions: model-evaluation QC readouts (classifier AUC,
calibration, threshold sweep) — the evaluation companions to the
preference-QC family (q_bt_rating / q_annotator_* / q_label_conflicts),
plus retrieval-evaluation and robustness readouts registered later in
this module.

Every query follows the registry conventions (_core docstring): integer
hash surfaces wherever the math allows, explicit BIGINT casts around
DuckDB SUMs (the r8 HUGEINT lesson), identical column aliases both
sides.
"""

from __future__ import annotations

from access_mopper_spark.queries._core import *  # noqa: F401,F403
from access_mopper_spark.queries._core import query, R6, _wide  # noqa: F401


@query(
    "q_auc_roc",
    oracle="""
    WITH scored AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS score,
             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS label
      FROM lineitem
    ),
    per_s AS (
      SELECT l_returnflag, score,
             SUM(label) AS p, COUNT(*) - SUM(label) AS n
      FROM scored GROUP BY l_returnflag, score
    ),
    acc AS (
      SELECT l_returnflag, p, n,
             COALESCE(SUM(n) OVER (
               PARTITION BY l_returnflag ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below
      FROM per_s
    )
    SELECT l_returnflag,
           CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(n) AS BIGINT) AS n_neg,
           CASE WHEN SUM(p) > 0 AND SUM(n) > 0 THEN
             CASE WHEN 2 * SUM(p) * SUM(n) <= 900000000000000
                  THEN CAST(SUM(p * (2 * below + n)) * 10000
                            // (2 * SUM(p) * SUM(n)) AS BIGINT)
                  ELSE CAST(FLOOR(CAST(SUM(p * (2 * below + n)) AS DOUBLE)
                            / (2.0 * CAST(SUM(p) AS DOUBLE)
                               * CAST(SUM(n) AS DOUBLE)) * 10000) AS BIGINT)
             END
           END AS auc_bp
    FROM acc GROUP BY l_returnflag
    """,
)
def q_auc_roc(spark, sf_dir):
    """Exact tie-corrected ROC-AUC per cohort
    (operators/evalmetrics.auc_roc): does a candidate quality score
    actually rank positives above negatives?  The Mann-Whitney rank-sum
    runs on per-score counts — ONE map-side-combined aggregate collapses
    the corpus to |distinct scores| rows per group, the cumulative
    window touches only that aggregated table, and 2·P·N·AUC stays
    BIGINT so auc_bp is exact integer basis points."""
    from access_mopper_spark.operators.evalmetrics import auc_roc
    li = load_table(spark, sf_dir, "lineitem")
    scored = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("score"),
        F.when(F.col("l_extendedprice") > 30000, 1).otherwise(0)
        .alias("label"))
    return auc_roc(scored, "score", "label", ["l_returnflag"])


@query(
    "q_calibration_bins",
    oracle="""
    WITH scored AS (
      SELECT (l_partkey * 37 + l_suppkey) % 10001 AS prob_bp,
             CASE WHEN ('0x' || substring(md5(
                    'cal:' || CAST(l_orderkey AS VARCHAR) || ':'
                    || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
                    % 10000
                  < (l_partkey * 37 + l_suppkey) % 10001
                  THEN 1 ELSE 0 END AS label
      FROM lineitem
    )
    SELECT CAST(LEAST(prob_bp * 10 // 10000, 9) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(prob_bp) // COUNT(*) AS BIGINT) AS mean_pred_bp,
           CAST(SUM(label) * 10000 // COUNT(*) AS BIGINT) AS pos_rate_bp,
           CAST(SUM(label) * 10000 // COUNT(*)
                - SUM(prob_bp) // COUNT(*) AS BIGINT) AS gap_bp
    FROM scored GROUP BY 1
    """,
)
def q_calibration_bins(spark, sf_dir):
    """Reliability-diagram bins (operators/evalmetrics.calibration_bins)
    over a synthetic perfectly-calibrated predictor: the predicted
    probability is a deterministic key expression and the label fires
    when an independent md5 lane falls below it — so each decile's
    empirical positive rate should track its mean prediction and gap_bp
    hovers near 0.  Engine-portable md5 lane (the uniform_hash recipe);
    all-integer output; one map-side-combined aggregate over 10 keys."""
    from access_mopper_spark.operators.evalmetrics import calibration_bins
    li = load_table(spark, sf_dir, "lineitem")
    lane = (F.conv(F.substring(F.md5(F.concat(
        F.lit("cal:"), F.col("l_orderkey").cast("string"),
        F.lit(":"), F.col("l_linenumber").cast("string"))), 1, 8),
        16, 10).cast("long") % 10000)
    prob = (F.col("l_partkey") * 37 + F.col("l_suppkey")) % 10001
    scored = li.select(
        prob.alias("prob_bp"),
        F.when(lane < prob, 1).otherwise(0).alias("label"))
    return calibration_bins(scored, "prob_bp", "label", n_bins=10)


@query(
    "q_confusion_thresholds",
    oracle="""
    WITH scored AS (
      SELECT CAST(l_quantity AS BIGINT) AS score,
             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS label
      FROM lineitem
    ),
    f AS (
      SELECT t.threshold, s.label,
             CASE WHEN s.score >= t.threshold THEN 1 ELSE 0 END AS pred
      FROM scored s
      CROSS JOIN (SELECT UNNEST([10, 20, 30, 40, 49]) AS threshold) t
    ),
    c AS (
      SELECT threshold,
             CAST(SUM(pred * label) AS BIGINT) AS tp,
             CAST(SUM(pred * (1 - label)) AS BIGINT) AS fp,
             CAST(SUM((1 - pred) * label) AS BIGINT) AS fn,
             CAST(SUM((1 - pred) * (1 - label)) AS BIGINT) AS tn
      FROM f GROUP BY threshold
    )
    SELECT threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp * 10000 // (tp + fp) AS BIGINT)
           END AS precision_bp,
           CASE WHEN tp + fn > 0
                THEN CAST(tp * 10000 // (tp + fn) AS BIGINT)
           END AS recall_bp,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST(2 * tp * 10000 // (2 * tp + fp + fn) AS BIGINT)
           END AS f1_bp
    FROM c
    """,
)
def q_confusion_thresholds(spark, sf_dir):
    """Precision/recall/F1 threshold sweep
    (operators/evalmetrics.confusion_at_thresholds): every row fans out
    map-side to the 5 broadcast-literal thresholds, then ONE grouped
    integer aggregate — the curation question "where do I cut the
    quality score?" answered in a single pass.  F1 on the exact 2·TP
    grid; NULL precision/recall where a class is empty (never here)."""
    from access_mopper_spark.operators.evalmetrics import (
        confusion_at_thresholds)
    li = load_table(spark, sf_dir, "lineitem")
    scored = li.select(
        F.col("l_quantity").cast("long").alias("score"),
        F.when(F.col("l_extendedprice") > 30000, 1).otherwise(0)
        .alias("label"))
    return confusion_at_thresholds(scored, [10, 20, 30, 40, 49],
                                   "score", "label")


@query(
    "q_simhash_near_dup",
    oracle="""
    WITH d0 AS (
      -- content-less docs never enter the near-dup search (they all
      -- fingerprint to simhash64('') and would pair quadratically)
      SELECT doc_id, text FROM documents
      WHERE text IS NOT NULL AND length(text) > 0
    ),
    sh AS (
      SELECT DISTINCT d.doc_id, substring(d.text, g.i, 5) AS s
      FROM d0 d, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(length(text)), 1) FROM d0) + 1)) AS i) g
      WHERE g.i <= greatest(length(d.text) - 4, 1)
    ),
    h AS (
      SELECT doc_id,
             ('0x' || substring(md5(s), 1, 8))::BIGINT AS hi,
             ('0x' || substring(md5(s), 9, 8))::BIGINT AS lo
      FROM sh
    ),
    votes AS (
      SELECT doc_id, g.b AS bit,
             SUM(CASE WHEN (((CASE WHEN g.b >= 32 THEN hi ELSE lo END)
                             >> (g.b % 32)) & 1) = 1 THEN 1 ELSE -1 END) AS v
      FROM h, generate_series(0, 63) g(b)
      GROUP BY doc_id, g.b
    ),
    packed AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN bit >= 32 AND v > 0 THEN (1::BIGINT << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi_s,
             CAST(SUM(CASE WHEN bit < 32 AND v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS lo_s
      FROM votes GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, hi_s, lo_s, g.i AS bi,
             CASE g.i WHEN 0 THEN lo_s & 65535
                      WHEN 1 THEN (lo_s >> 16) & 65535
                      WHEN 2 THEN hi_s & 65535
                      ELSE (hi_s >> 16) & 65535 END AS bk
      FROM packed, generate_series(0, 3) g(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.hi_s AS ha, a.lo_s AS la, b.hi_s AS hb, b.lo_s AS lb
      FROM bands a
      JOIN bands b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb))
                AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3
    """,
)
def q_simhash_near_dup(spark, sf_dir):
    """SimHash Hamming-≤3 near-dup pairs
    (operators/dedup.simhash_near_dup — the Manku-Jain-Sarma WWW'07
    banded search): the 64-bit fingerprint splits into 4 contiguous
    16-bit bands, so any pair within Hamming 3 agrees exactly on ≥1
    band (pigeonhole — recall 1.0, unlike probabilistic MinHash
    banding); candidates ride ONE (band_idx, band_value) self-join
    carrying only ids + fingerprints, and verification is a constant
    ``bit_count(xor)``.  md5-lane hashing keeps the fingerprints — and
    therefore the pair set — engine-portable; the oracle replays the
    bit-vote and the banding bit-for-bit (reference capability:
    crawl-scale near-dup detection; complements q_near_dup_pairs /
    q_minhash_band)."""
    from access_mopper_spark.operators.dedup import simhash_near_dup
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup(docs, "text", "doc_id", max_hamming=3,
                            shingle_k=5, hash_kind="md5")


@query(
    "q_bootstrap_ci",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS x,
             CAST(o_orderkey AS VARCHAR) AS id
      FROM orders
    ),
    fanned AS (
      SELECT o_orderpriority, x, g.r,
             ('0x' || substring(md5('boot0:' || id || ':'
                || CAST(g.r // 4 AS VARCHAR)),
                CAST((g.r % 4) * 8 + 1 AS INTEGER), 8))::BIGINT AS lane
      FROM base, generate_series(0, 19) g(r)
    ),
    per_rep AS (
      SELECT o_orderpriority, r,
             CAST(SUM(w * x) AS BIGINT) AS swx,
             CAST(SUM(w) AS BIGINT) AS sw,
             CAST(SUM(CASE WHEN r = 0 THEN x END) AS BIGINT) AS sx0,
             COUNT(CASE WHEN r = 0 THEN 1 END) AS n0
      FROM (SELECT *,
              CASE WHEN lane >= 1580030169 THEN 1 ELSE 0 END
            + CASE WHEN lane >= 3160060337 THEN 1 ELSE 0 END
            + CASE WHEN lane >= 3950075422 THEN 1 ELSE 0 END
            + CASE WHEN lane >= 4213413783 THEN 1 ELSE 0 END
            + CASE WHEN lane >= 4279248374 THEN 1 ELSE 0 END
            + CASE WHEN lane >= 4292415292 THEN 1 ELSE 0 END AS w
            FROM fanned)
      GROUP BY o_orderpriority, r
    ),
    ranked AS (
      SELECT o_orderpriority, r,
             CASE WHEN sw > 0
                  THEN ROUND(CAST(swx AS DOUBLE) / sw, 6) END AS m,
             sx0, n0,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY (CASE WHEN sw > 0
                  THEN ROUND(CAST(swx AS DOUBLE) / sw, 6) END)
                  NULLS FIRST, r) AS rn
      FROM per_rep
    )
    SELECT o_orderpriority,
           CAST(MAX(n0) AS BIGINT) AS n_rows,
           ROUND(CAST(MAX(sx0) AS DOUBLE) / MAX(n0), 6) AS point_mean,
           MAX(CASE WHEN rn = 1 THEN m END) AS boot_lo,
           MAX(CASE WHEN rn = 20 THEN m END) AS boot_hi
    FROM ranked GROUP BY o_orderpriority
    """,
)
def q_bootstrap_ci(spark, sf_dir):
    """One-pass Poisson-bootstrap 95% CI for mean order value per
    priority (operators/evalmetrics.poisson_bootstrap_ci — Chamandy et
    al., Google 2012): 20 deterministic md5-lane Poisson(1) resamples
    fan out map-side and collapse to |groups|·20 partial sums before
    the one shuffle; replicate means are exact integer Σw·cents / Σw on
    the 1e-6 grid; the rank-based interval reads the tiny ranked table.
    The curation use: error bars on any corpus statistic (mean quality,
    dup rate) without a second pass or RNG state."""
    from access_mopper_spark.operators.evalmetrics import (
        poisson_bootstrap_ci)
    o = _wide(load_table(spark, sf_dir, "orders"))
    base = o.select(
        "o_orderpriority", "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"))
    return poisson_bootstrap_ci(base, "cents", ["o_orderpriority"],
                                "o_orderkey", replicates=20, salt="boot0")


@query(
    "q_retrieval_eval",
    oracle="""
    WITH g AS (SELECT UNNEST([0, 1, 2, 3]) AS query_id),
    ranked AS (
      SELECT g.query_id, d.doc_id,
             ROW_NUMBER() OVER (PARTITION BY g.query_id
               ORDER BY md5('rk:' || CAST(g.query_id AS VARCHAR) || ':'
                            || CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS rank
      FROM documents d CROSS JOIN g
    ),
    results AS (SELECT * FROM ranked WHERE rank <= 10),
    qrels AS (
      SELECT g.query_id, d.doc_id,
             CAST((d.doc_id + g.query_id) % 4 AS BIGINT) AS rel
      FROM documents d CROSS JOIN g
      WHERE (d.doc_id * 7 + g.query_id) % 5 < 3
    ),
    per_q AS (
      SELECT r.query_id, COUNT(*) AS n_retrieved,
             CAST(SUM(CASE WHEN COALESCE(q.rel, 0) > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel_retrieved,
             SUM((POW(2.0, CAST(COALESCE(q.rel, 0) AS DOUBLE)) - 1.0)
                 / log2(CAST(r.rank AS DOUBLE) + 1.0)) AS dcg,
             MIN(CASE WHEN COALESCE(q.rel, 0) > 0 THEN r.rank END) AS fr
      FROM results r
      LEFT JOIN qrels q
        ON r.query_id = q.query_id AND r.doc_id = q.doc_id
      GROUP BY r.query_id
    ),
    ideal AS (
      SELECT query_id,
             SUM((POW(2.0, CAST(rel AS DOUBLE)) - 1.0)
                 / log2(CAST(ir AS DOUBLE) + 1.0)) AS idcg
      FROM (SELECT query_id, rel,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY rel DESC, doc_id ASC) AS ir
            FROM qrels WHERE rel > 0)
      WHERE ir <= 10
      GROUP BY query_id
    )
    SELECT p.query_id, p.n_retrieved, p.n_rel_retrieved,
           ROUND(CASE WHEN i.idcg > 0 THEN p.dcg / i.idcg
                      ELSE 0.0 END, 6) AS ndcg,
           ROUND(COALESCE(1.0 / CAST(p.fr AS DOUBLE), 0.0), 6) AS mrr
    FROM per_q p LEFT JOIN ideal i USING (query_id)
    """,
)
def q_retrieval_eval(spark, sf_dir):
    """NDCG@10 / MRR / hits ranking-quality readout
    (operators/evalmetrics.retrieval_eval) over a deterministic
    retrieval fixture: 4 synthetic queries rank the documents table by
    an md5 lane (both engines derive the identical ranked lists — the
    eval judges RANKINGS, so the fixture IS the contract), judgments
    are a keyed grade grid.  Plan: the (query, doc) equi-join hashes by
    query on both sides; ideal DCG windows only the judged (small)
    side; floats snap to the 1e-6 grid."""
    from access_mopper_spark.operators.evalmetrics import retrieval_eval
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    g = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("query_id")
    fanned = docs.select("doc_id", g)
    wq = W.partitionBy("query_id").orderBy(
        F.md5(F.concat(F.lit("rk:"), F.col("query_id").cast("string"),
                       F.lit(":"), F.col("doc_id").cast("string"))),
        F.asc("doc_id"))
    results = (fanned.withColumn("rank", F.row_number().over(wq))
               .where(F.col("rank") <= 10))
    qrels = (fanned
             .where((F.col("doc_id") * 7 + F.col("query_id")) % 5 < 3)
             .select("query_id", "doc_id",
                     ((F.col("doc_id") + F.col("query_id")) % 4)
                     .cast("long").alias("rel")))
    return retrieval_eval(results, qrels, k=10)


@query(
    "q_rrf_fuse",
    oracle="""
    WITH g AS (SELECT UNNEST([0, 1, 2]) AS query_id),
    a AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT g.query_id, d.doc_id,
               ROW_NUMBER() OVER (PARTITION BY g.query_id
                 ORDER BY md5('A:' || CAST(g.query_id AS VARCHAR) || ':'
                              || CAST(d.doc_id AS VARCHAR)), d.doc_id)
                 AS rank
        FROM documents d CROSS JOIN g) WHERE rank <= 20
    ),
    b AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT g.query_id, d.doc_id,
               ROW_NUMBER() OVER (PARTITION BY g.query_id
                 ORDER BY md5('B:' || CAST(g.query_id AS VARCHAR) || ':'
                              || CAST(d.doc_id AS VARCHAR)), d.doc_id)
                 AS rank
        FROM documents d CROSS JOIN g) WHERE rank <= 20
    ),
    u AS (
      SELECT query_id, doc_id, 1.0 / (60.0 + CAST(rank AS DOUBLE)) AS c
      FROM a
      UNION ALL
      SELECT query_id, doc_id, 1.0 / (60.0 + CAST(rank AS DOUBLE)) AS c
      FROM b
    ),
    fused AS (
      SELECT query_id, doc_id, ROUND(SUM(c), 6) AS rrf_score,
             CAST(COUNT(*) AS BIGINT) AS n_lists
      FROM u GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_score, n_lists, fused_rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY rrf_score DESC, doc_id ASC) AS fused_rank
      FROM fused)
    WHERE fused_rank <= 10
    """,
)
def q_rrf_fuse(spark, sf_dir):
    """Reciprocal-rank fusion of two retrieval lists per query
    (operators/evalmetrics.rrf_fuse — Cormack SIGIR'09, the standard
    hybrid lexical+dense merge): two deterministic md5-ordered top-20
    rankings union map-only, ONE (query, doc) aggregate sums the
    1/(60+rank) contributions on the 1e-6 grid, and the fused top-10
    rides a rank-pushed per-query window.  Ties break on doc id —
    identical order both engines."""
    from access_mopper_spark.operators.evalmetrics import rrf_fuse
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    g = F.explode(F.array(*[F.lit(i) for i in range(3)])).alias("query_id")
    fanned = docs.select("doc_id", g)

    def ranking(tag):
        wq = W.partitionBy("query_id").orderBy(
            F.md5(F.concat(F.lit(tag + ":"),
                           F.col("query_id").cast("string"),
                           F.lit(":"), F.col("doc_id").cast("string"))),
            F.asc("doc_id"))
        return (fanned.withColumn("rank", F.row_number().over(wq))
                .where(F.col("rank") <= 20))

    return rrf_fuse([ranking("A"), ranking("B")], k=60, topk=10)


@query(
    "q_krippendorff_alpha",
    oracle="""
    WITH votes AS (
      SELECT CAST(l_partkey % 150 AS BIGINT) AS item,
             CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS vote
      FROM lineitem
    ),
    per_item AS (
      SELECT item, COUNT(*) AS m, SUM(vote) AS n1
      FROM votes GROUP BY item HAVING COUNT(*) >= 2
    ),
    red AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(m) AS BIGINT) AS n_values,
             CAST(SUM(n1) AS BIGINT) AS n_pos,
             SUM(CAST(n1 * (m - n1) AS DOUBLE) / (m - 1)) AS S
      FROM per_item
    )
    SELECT n_items, n_values, n_pos,
           ROUND(CASE WHEN n_pos > 0 AND n_values - n_pos > 0
                 THEN 1.0 - CAST(n_values - 1 AS DOUBLE) * S
                      / (CAST(n_pos AS DOUBLE) * (n_values - n_pos))
                 END, 6) AS alpha
    FROM red
    """,
)
def q_krippendorff_alpha(spark, sf_dir):
    """Krippendorff's alpha reliability over binary judgments with a
    VARIABLE number of ratings per item
    (operators/ml.krippendorff_alpha_binary) — the general-design
    complement to Cohen's kappa in the preference-QC family: items are
    pairable with any m ≥ 2 judgments, singletons drop out per the
    coefficient's definition.  One map-side-combined per-item aggregate
    + a 1-row reduce; only the final alpha is float (1e-6 grid)."""
    from access_mopper_spark.operators.ml import krippendorff_alpha_binary
    li = load_table(spark, sf_dir, "lineitem")
    votes = li.select(
        (F.col("l_partkey") % 150).cast("long").alias("item"),
        F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("vote"))
    return krippendorff_alpha_binary(votes)


@query(
    "q_padding_waste",
    oracle="""
    WITH seqs AS (
      SELECT COALESCE(n_chars, 0) AS t,
             CASE WHEN COALESCE(n_chars, 0) <= 64 THEN 64
                  WHEN n_chars <= 128 THEN 128
                  WHEN n_chars <= 256 THEN 256
                  WHEN n_chars <= 512 THEN 512
                  ELSE 1024 END AS bucket_bound,
             LEAST(COALESCE(n_chars, 0), 1024) AS e
      FROM documents
    )
    SELECT CAST(bucket_bound AS BIGINT) AS bucket_bound,
           COUNT(*) AS n_seqs,
           CAST(SUM(t) AS BIGINT) AS sum_tokens,
           CAST(COUNT(*) * bucket_bound AS BIGINT) AS padded_slots,
           CAST(SUM(CASE WHEN t > 1024 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truncated,
           CAST((COUNT(*) * bucket_bound - SUM(e)) * 10000
                // (COUNT(*) * bucket_bound) AS BIGINT) AS waste_bp
    FROM seqs GROUP BY bucket_bound
    """,
)
def q_padding_waste(spark, sf_dir):
    """Length-bucketed batch padding-waste report
    (operators/sampling.padding_waste): every sequence pads to the
    first bucket bound ≥ its length; per bucket the report ships
    counts, real tokens, padded slots, truncations, and integer-bp
    waste — the readout that tunes bucket boundaries before a training
    run.  ONE map-side-combined aggregate over 5 keys; all-integer."""
    from access_mopper_spark.operators.sampling import padding_waste
    docs = load_table(spark, sf_dir, "documents")
    return padding_waste(docs, "n_chars", [64, 128, 256, 512, 1024])


@query(
    "q_corpus_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(COALESCE(text, '')) AS fp FROM documents
    ),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN md5(COALESCE(text, '') || ':v2')
                  ELSE md5(COALESCE(text, '')) END AS fp
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             md5(COALESCE(text, '') || ':new') AS fp
      FROM documents WHERE doc_id % 11 = 0
    ),
    j AS (
      SELECT o.doc_id AS oid, n.doc_id AS nid, o.fp AS fo, n.fp AS fn
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT CASE WHEN oid IS NULL THEN 'added'
                WHEN nid IS NULL THEN 'removed'
                WHEN fo IS NOT DISTINCT FROM fn THEN 'unchanged'
                ELSE 'changed' END AS status,
           COUNT(*) AS n_docs
    FROM j GROUP BY 1
    """,
)
def q_corpus_diff(spark, sf_dir):
    """Corpus snapshot diff (operators/profile.corpus_diff): the
    governance readout before promoting a refreshed crawl — documents
    added / removed / changed / unchanged between two versions, decided
    on md5 content fingerprints riding a slim full-outer id join.  The
    'new' snapshot derives deterministically from the same table (drop
    every 7th id, mutate every 5th fingerprint, add every 11th under an
    offset id), so both engines construct identical versions."""
    from access_mopper_spark.operators.profile import corpus_diff
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    old = docs.select("doc_id", fp.alias("fp"))
    kept = (docs.where(F.col("doc_id") % 7 != 0)
            .select("doc_id",
                    F.when(F.col("doc_id") % 5 == 0,
                           F.md5(F.concat(F.coalesce(F.col("text"),
                                                     F.lit("")),
                                          F.lit(":v2"))))
                    .otherwise(fp).alias("fp")))
    added = (docs.where(F.col("doc_id") % 11 == 0)
             .select((F.col("doc_id") + 1000000).alias("doc_id"),
                     F.md5(F.concat(F.coalesce(F.col("text"), F.lit("")),
                                    F.lit(":new"))).alias("fp")))
    return corpus_diff(old, kept.unionByName(added))


@query(
    "q_stream_drift",
    oracle="""
    WITH c AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    types AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS c_base
      FROM c GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(c_base) AS BIGINT) AS n_total,
             COUNT(*) AS n_types
      FROM types
    ),
    days AS (
      SELECT day, CAST(SUM(n) AS BIGINT) AS n_day FROM c GROUP BY 1
    ),
    grid AS (
      SELECT d.day, d.n_day, t.event_type, t.c_base,
             COALESCE(c.n, 0) AS n_dt
      FROM days d CROSS JOIN types t
      LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
    )
    SELECT g.day, g.n_day AS n_events,
           ROUND(SUM(
             (CAST(g.n_dt + 1 AS DOUBLE)
                / CAST(g.n_day + tt.n_types AS DOUBLE)
              - CAST(g.c_base + 1 AS DOUBLE)
                / CAST(tt.n_total + tt.n_types AS DOUBLE))
             * LN((CAST(g.n_dt + 1 AS DOUBLE)
                   / CAST(g.n_day + tt.n_types AS DOUBLE))
                  / (CAST(g.c_base + 1 AS DOUBLE)
                     / CAST(tt.n_total + tt.n_types AS DOUBLE)))), 6)
             AS psi
    FROM grid g, tot tt
    GROUP BY g.day, g.n_day
    """,
)
def q_stream_drift(spark, sf_dir):
    """STREAMING distribution-drift monitor: per event-time day, the
    PSI of that day's event-type mix against the whole-corpus baseline
    — the live 'did today's traffic move' alarm next to the batch
    snapshot monitors (q_psi_drift / q_kl_unigram_drift).  The
    streaming stage is ONE windowed (day, type) count in complete mode
    (state = |days|·|types| counters, bounded); the PSI decomposition
    is a batch read of the tiny sink table (day×type grid join against
    broadcast baseline totals, add-1 smoothing over the global type
    set).  With AvailableNow over finite input the sink equals the
    batch aggregate — exactly what the oracle replays; an unbounded
    deployment swaps complete mode for a watermark + append and ages
    old days out of state."""
    from access_mopper_spark.streaming.resample import (events_stream,
                                                        harness_shuffle,
                                                        run_to_memory)
    ev = events_stream(spark, sf_dir)
    counts = (ev.groupBy(F.window("ts", "1 day").alias("__w"), "event_type")
              .agg(F.count("*").alias("n"))
              .select(F.to_date(F.col("__w.start")).alias("day"),
                      "event_type", "n"))
    with harness_shuffle(spark):
        run_to_memory(counts, "q_stream_drift_sink", mode="complete")
    c = spark.table("q_stream_drift_sink")
    types = c.groupBy("event_type").agg(F.sum("n").alias("c_base"))
    tot = types.agg(F.sum("c_base").alias("n_total"),
                    F.count("*").alias("n_types"))
    days = c.groupBy("day").agg(F.sum("n").alias("n_day"))
    # three branches of the same sink view meet again: rename the
    # count branch's key columns so the re-join doesn't carry
    # conflicting attribute ids
    cc = c.select(F.col("day").alias("__d"),
                  F.col("event_type").alias("__t"),
                  F.col("n").alias("__n"))
    grid = (days.crossJoin(F.broadcast(types))
            .join(cc, (F.col("day") == F.col("__d"))
                  & (F.col("event_type") == F.col("__t")), "left")
            .select("day", "n_day", "c_base",
                    F.coalesce(F.col("__n"), F.lit(0)).alias("n_dt"))
            .crossJoin(F.broadcast(tot)))
    p_day = ((F.col("n_dt") + 1).cast("double")
             / (F.col("n_day") + F.col("n_types")).cast("double"))
    p_base = ((F.col("c_base") + 1).cast("double")
              / (F.col("n_total") + F.col("n_types")).cast("double"))
    return (grid.groupBy("day", F.col("n_day").cast("long")
                         .alias("n_events"))
            .agg(R6(F.sum((p_day - p_base) * F.log(p_day / p_base)))
                 .alias("psi")))


@query(
    "q_embedding_drift",
    oracle="""
    WITH ex AS (
      SELECT CAST(vec_id % 2 AS INT) AS s, i.i - 1 AS p,
             CAST(FLOOR(CAST(embedding[i.i] AS DOUBLE) * 1e6 + 0.5)
                  AS BIGINT) AS v
      FROM embeddings,
           (SELECT UNNEST(range(1,
              (SELECT COALESCE(MAX(len(embedding)), 1) + 1
               FROM embeddings))) AS i) i
      WHERE i.i <= len(embedding)
    ),
    per AS (SELECT s, p, CAST(SUM(v) AS BIGINT) AS sm, COUNT(*) AS n
            FROM ex GROUP BY s, p),
    m AS (SELECT s, p,
                 CAST(FLOOR(CAST(sm AS DOUBLE) / n + 0.5) AS BIGINT)
                   AS mm, n
          FROM per),
    j AS (SELECT a.p, a.mm AS m0, b.mm AS m1, a.n AS n0, b.n AS n1
          FROM m a JOIN m b ON a.p = b.p AND a.s = 0 AND b.s = 1),
    red AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
             CAST(MAX(n0) AS BIGINT) AS n_ref,
             CAST(MAX(n1) AS BIGINT) AS n_cur,
             CAST(SUM(m0 * m1) AS BIGINT) AS dot,
             CAST(SUM(m0 * m0) AS BIGINT) AS a2,
             CAST(SUM(m1 * m1) AS BIGINT) AS b2,
             CAST(SUM((m0 - m1) * (m0 - m1)) AS BIGINT) AS l2_sq_micro2
      FROM j
    )
    SELECT n_dims, n_ref, n_cur,
           ROUND(CASE WHEN a2 > 0 AND b2 > 0
                 THEN CAST(dot AS DOUBLE)
                      / (SQRT(CAST(a2 AS DOUBLE))
                         * SQRT(CAST(b2 AS DOUBLE))) END, 6) AS cosine,
           l2_sq_micro2
    FROM red
    """,
)
def q_embedding_drift(spark, sf_dir):
    """Embedding-centroid drift between two snapshot halves
    (operators/drift.embedding_centroid_drift): cosine + squared-L2
    between the sides' mean vectors — the first-line check that a
    refreshed/re-embedded corpus still supports the ANN index and
    semantic-dedup thresholds calibrated on the old one.  Every ELEMENT
    snaps to the integer micro grid before any sum (map-side,
    order-free), so dot/norms are exact BIGINT sums and the only floats
    take exact-integer inputs — no summation-order surface.  One
    (side, dim) map-side count + a dim-sized join; sides here are the
    vec_id parity split."""
    from access_mopper_spark.operators.drift import embedding_centroid_drift
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_centroid_drift(
        emb.select((F.col("vec_id") % 2).alias("side"), "embedding"),
        "side")


@query(
    "q_winnowing_similarity",
    oracle="""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE text IS NOT NULL AND length(text) >= 8
    ),
    g AS (
      SELECT d.doc_id, gi.i AS i,
             substring(md5(substring(d.text, gi.i, 5)), 1, 8) AS h,
             length(d.text) - 4 AS n_grams
      FROM d, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(length(text)), 1)
                                       FROM d) + 1)) AS i) gi
      WHERE gi.i <= length(d.text) - 4
    ),
    wmin AS (
      SELECT doc_id, i, n_grams,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM g
    ),
    fps0 AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE i <= n_grams - 3),
    keep AS (SELECT fp FROM fps0 GROUP BY fp HAVING COUNT(*) <= 50),
    fps AS (SELECT f.doc_id, f.fp FROM fps0 f JOIN keep USING (fp)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM fps GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT p.id_a, p.id_b, CAST(p.n_shared AS BIGINT) AS n_shared,
           CAST(p.n_shared * 10000 // LEAST(sa.sz, sb.sz) AS BIGINT)
             AS containment_bp
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.id_a
    JOIN sizes sb ON sb.doc_id = p.id_b
    """,
)
def q_winnowing_similarity(spark, sf_dir):
    """MOSS-style similarity report from shared winnowing fingerprints
    (operators/dedup.winnowing_similarity, k=5, w=4, stop-fingerprint
    cap 50): pairs sharing ≥2 selected substring hashes with an
    integer-bp containment score — the report stage of
    plagiarism/boilerplate detection over q_winnowing_fingerprints.
    The fp self-join carries ids only; ubiquitous fingerprints drop at
    a deterministic document-frequency cap (replayed by the oracle), so
    no bucket is unbounded."""
    from access_mopper_spark.operators.dedup import winnowing_similarity
    docs = _wide(load_table(spark, sf_dir, "documents"))
    return winnowing_similarity(docs, "doc_id", "text", k=5, w=4,
                                min_shared=2, fp_cap=50)


from access_mopper_spark.queries._core import ORACLES as _ORA

_SIMHASH_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE sp AS (
      SELECT id_a, id_b FROM ({_ORA["q_simhash_near_dup"]})
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM sp
      UNION
      SELECT id_b, id_a FROM sp
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""


@query("q_simhash_clusters", oracle=_SIMHASH_CLUSTERS_ORACLE)
def q_simhash_clusters(spark, sf_dir):
    """The crawl-dedup pipeline shape end-to-end: SimHash Hamming-≤3
    banded pairs (q_simhash_near_dup) → connected components → every
    document labelled with its cluster's min id (singletons keep their
    own id; contentless docs never pair, so each is its own cluster).
    This is the Manku-Jain-Sarma production composition — fingerprints
    → banding → union-find → keep-one — with each stage independently
    oracle-checked and the closure replayed as a recursive CTE over
    the SAME pair SQL.  The closure runs the O(log n) large/small-star
    contraction, NOT diameter-bound label propagation: hamming-ball
    pair graphs glue into big components when a crawl (or the honest
    scale-up's prefix transform) makes many docs near-identical —
    measured at the honest ×10 point, 50k docs yield 2.77M pairs and
    label propagation stalls where star contraction converges."""
    from access_mopper_spark.operators.dedup import simhash_near_dup
    from access_mopper_spark.operators.graph import cc_large_small_star
    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_near_dup(docs, "text", "doc_id", max_hamming=3,
                             shingle_k=5, hash_kind="md5")
    return (cc_large_small_star(pairs, docs.select("doc_id"),
                                id_a="id_a", id_b="id_b")
            .select(F.col("node").alias("doc_id"), "cluster_id"))


_LSH_RECALL_ORACLE = f"""
    WITH cand AS (
      SELECT id_a, id_b FROM ({{NEAR_DUP}})
      WHERE id_a < 200 AND id_b < 200
    ),
    toks AS (
      SELECT doc_id, string_split(trim(regexp_replace(text,
               '[ \\t\\n\\r]+', ' ', 'g'), ' '), ' ') AS w
      FROM documents WHERE doc_id < 200
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[g.i : g.i + 2], ' ') AS s
      FROM toks, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(w)), 1)
                                          FROM toks) + 1)) AS i) g
      WHERE g.i <= greatest(len(w) - 2, 1)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT t.id_a, t.id_b
      FROM inter t
      JOIN sizes sa ON sa.doc_id = t.id_a
      JOIN sizes sb ON sb.doc_id = t.id_b
      WHERE 3 * t.i >= sa.n + sb.n
    ),
    hit AS (
      SELECT COUNT(*) AS n_hit
      FROM truth JOIN cand USING (id_a, id_b)
    )
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST(h.n_hit AS BIGINT) AS n_hit,
           CASE WHEN (SELECT COUNT(*) FROM truth) > 0
                THEN CAST(h.n_hit * 10000
                          // (SELECT COUNT(*) FROM truth) AS BIGINT)
           END AS recall_bp
    FROM hit h
"""


def _register_lsh_recall():
    from access_mopper_spark.queries._core import ORACLES as _O
    oracle = _LSH_RECALL_ORACLE.replace("{NEAR_DUP}",
                                        _O["q_near_dup_pairs"])

    @query("q_lsh_recall", oracle=oracle)
    def q_lsh_recall(spark, sf_dir):
        """Index-quality recall of the PRODUCTION MinHash-LSH dedup
        index against exact ground truth (the dedup analogue of
        q_ann_recall): the full-corpus near_dup_pairs output (6 hashes
        × 3 bands, cap 64, Jaccard-verified ≥ 0.5) is scored on a
        deterministic doc sample against the exact word-3-gram Jaccard
        pairs computed by shingle equi-join — the recall readout that
        tells you whether the banding parameters are leaving real
        duplicates in the corpus.  The ≥0.5 truth threshold compares in
        exact integers (3·|∩| ≥ |A|+|B|); candidates ⊆ truth by the
        verify step, so precision is 1 by construction and recall is
        the whole story.  One shingle-key shuffle for truth (sample-
        bounded); the candidate side is the production index scored on
        the sample via ``restrict_ids`` — band keys and cap ranks are
        still full-corpus (the index under test), but the banded rows
        semi-join to the sample BEFORE pair materialization, which is
        provably the full pair set filtered to the sample (the r9
        ×100 honest point paid the full materialization: 27× wall for
        10× data; the restricted plan is linear in the corpus + the
        sample's pair work).  The oracle replays the full-pairs-then-
        filter SQL — equal by the restriction identity."""
        from access_mopper_spark.functions.text import word_shingles
        from access_mopper_spark.operators.dedup import near_dup_pairs
        docs = load_table(spark, sf_dir, "documents")
        sample_ids = docs.where(F.col("doc_id") < 200).select("doc_id")
        cand = (near_dup_pairs(docs, "text", "doc_id", n_hashes=6,
                               band_size=2, shingle_k=3,
                               jaccard_threshold=0.5,
                               shingle_kind="word", band_cap=64,
                               restrict_ids=sample_ids)
                .select("id_a", "id_b"))
        sample = docs.where(F.col("doc_id") < 200)
        sh = sample.select(
            "doc_id",
            F.explode(F.array_distinct(
                word_shingles(F.col("text"), 3))).alias("s"))
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
        a = sh.select(F.col("doc_id").alias("id_a"), "s")
        b = sh.select(F.col("doc_id").alias("id_b"), "s")
        inter = (a.join(b, "s").where(F.col("id_a") < F.col("id_b"))
                 .groupBy("id_a", "id_b").agg(F.count("*").alias("i")))
        truth = (inter
                 .join(sizes.select(F.col("doc_id").alias("id_a"),
                                    F.col("n").alias("na")), "id_a")
                 .join(sizes.select(F.col("doc_id").alias("id_b"),
                                    F.col("n").alias("nb")), "id_b")
                 .where(3 * F.col("i") >= F.col("na") + F.col("nb"))
                 .select("id_a", "id_b"))
        hit = truth.join(cand, ["id_a", "id_b"]).agg(
            F.count("*").alias("n_hit"))
        n_truth = truth.agg(F.count("*").alias("n_truth"))
        n_cand = cand.agg(F.count("*").alias("n_candidates"))
        return (n_truth.crossJoin(n_cand).crossJoin(hit)
                .select(F.col("n_truth").cast("long").alias("n_truth"),
                        F.col("n_candidates").cast("long")
                        .alias("n_candidates"),
                        F.col("n_hit").cast("long").alias("n_hit"),
                        F.when(F.col("n_truth") > 0,
                               F.expr("CAST(n_hit * 10000 DIV n_truth "
                                      "AS BIGINT)")).alias("recall_bp")))
    return q_lsh_recall


_register_lsh_recall()
