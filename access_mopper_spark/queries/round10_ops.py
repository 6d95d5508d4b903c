"""Round-10 operator additions: asymmetric containment dedup, homoglyph
skeleton dedup, and graph degree assortativity.

Each row follows the registry conventions (queries/_core.py): integer
hash surfaces where possible (basis points via DIV // parity), R6 for
the one unavoidable double, identical aliases both sides, fuzz + TZ
gates run before any driver exposure.
"""

from __future__ import annotations

from access_mopper_spark.queries._core import (  # noqa: F401
    F, W, query, R6, _wide, copurchase_pairs, eager_release, load_table, pround)
from access_mopper_spark.functions.text import confusable_skeleton_sql


@query(
    "q_minhash_containment",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'), ' '), ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[g.i : g.i + 2], ' ') AS s
      FROM toks, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(w)), 1) FROM toks) + 1)) AS i) g
      WHERE g.i <= greatest(length(w) - 2, 1)
    ),
    sig AS (
      SELECT doc_id,
             MIN(substring(md5('seed0:' || s), 1, 8)) AS m0,
             MIN(substring(md5('seed0:' || s), 9, 8)) AS m1,
             MIN(substring(md5('seed0:' || s), 17, 8)) AS m2,
             MIN(substring(md5('seed0:' || s), 25, 8)) AS m3,
             MIN(substring(md5('seed1:' || s), 1, 8)) AS m4,
             MIN(substring(md5('seed1:' || s), 9, 8)) AS m5
      FROM sh GROUP BY doc_id
    ),
    band AS (SELECT doc_id, md5(m0 || '|' || m1) AS b0, md5(m2 || '|' || m3) AS b1,
                    md5(m4 || '|' || m5) AS b2 FROM sig),
    ids AS (
      SELECT doc_id, 0 AS bi, b0 AS bk FROM band
      UNION ALL SELECT doc_id, 1, b1 FROM band
      UNION ALL SELECT doc_id, 2, b2 FROM band
    ),
    capped AS (  -- replay the deterministic per-band candidate cap
      SELECT doc_id, bi, bk FROM (
        SELECT doc_id, bi, bk,
               row_number() OVER (PARTITION BY bi, bk ORDER BY doc_id) AS r
        FROM ids WHERE bk IS NOT NULL) WHERE r <= 64
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM capped a JOIN capped b USING (bi, bk)
      WHERE a.doc_id < b.doc_id
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS ni
      FROM cand c
      JOIN sh x ON x.doc_id = c.id_a
      JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
      GROUP BY c.id_a, c.id_b
    ),
    pairs AS (
      SELECT i.id_a, i.id_b, i.ni,
             CAST(ca.n AS BIGINT) AS na, CAST(cb.n AS BIGINT) AS nb
      FROM inter i
      JOIN cnt ca ON ca.doc_id = i.id_a
      JOIN cnt cb ON cb.doc_id = i.id_b
    ),
    directed AS (
      SELECT id_a AS id_sub, id_b AS id_sup,
             (CAST(ni AS BIGINT) * 10000) // na AS containment_bp
      FROM pairs WHERE na > 0
      UNION ALL
      SELECT id_b, id_a, (CAST(ni AS BIGINT) * 10000) // nb
      FROM pairs WHERE nb > 0
    )
    SELECT id_sub, id_sup, CAST(containment_bp AS BIGINT) AS containment_bp
    FROM directed WHERE containment_bp >= 8000
    """,
)
def q_minhash_containment(spark, sf_dir):
    """Directed near-containment pairs (|A∩B| / |A| over word 3-gram
    shingle sets, ≥0.8 in integer basis points) — the asymmetric
    complement to ``q_near_dup_pairs``: Jaccard misses a short doc
    fully embedded in a long one (quotes, excerpt pages,
    boilerplate-wrapped copies), containment fires at ~1.0.
    Same 100 TB shape as near_dup_pairs (operators/dedup.
    containment_pairs): banding carries only (id, band_key), pair
    materialization is bucket-bounded (band_cap=64, deterministic,
    oracle-replayed), shingle sets re-join by id for the exact verify,
    both directions emitted from ONE verified row via explode —
    never a second candidate scan."""
    from access_mopper_spark.operators.dedup import containment_pairs
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "text", "doc_id", n_hashes=6,
                             band_size=2, shingle_k=3,
                             containment_bp_threshold=8000, band_cap=64)


@query(
    "q_confusable_skeleton",
    oracle=f"""
    WITH sk AS (
      SELECT doc_id, md5({confusable_skeleton_sql('text')}) AS skeleton_fp
      FROM documents WHERE text IS NOT NULL
    )
    SELECT skeleton_fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_id
    FROM sk GROUP BY skeleton_fp
    """,
)
def q_confusable_skeleton(spark, sf_dir):
    """Homoglyph-aware skeleton dedup (functions/text.
    confusable_skeleton): docs re-spelled with Cyrillic/Greek lookalike
    codepoints or exotic spaces — the classic SEO-spam / dedup-evasion
    trick — fold to the same md5 skeleton as their ASCII originals
    (Unicode TR#39 skeleton idea over the high-frequency crawl
    confusables).  Output is every skeleton family (fp, size,
    keep_id = min doc_id) — the full surface, so the gate checks every
    doc's skeleton hash, not just the dup families (clean testdata has
    none; fuzz seeds inject them).  Pure map-side Column math
    (portable_lower + one translate + whitespace collapse) into a
    single hash-groupBy shuffle — the exact_dedup scale shape; NULL
    docs are excluded on both sides (no content, no signal)."""
    from access_mopper_spark.functions.text import confusable_skeleton
    docs = _wide(load_table(spark, sf_dir, "documents")) \
        .where(F.col("text").isNotNull())
    sk = docs.select(
        "doc_id", F.md5(confusable_skeleton(F.col("text"))).alias("skeleton_fp"))
    return (sk.groupBy("skeleton_fp")
              .agg(F.count("*").cast("long").alias("n_docs"),
                   F.min("doc_id").alias("keep_id")))


@query(
    "q_degree_assortativity",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      WHERE l1.l_quantity > 25 AND l2.l_quantity > 25
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY node
    ),
    dir AS (
      SELECT a AS x, b AS y FROM pairs
      UNION ALL SELECT b, a FROM pairs
    ),
    j AS (
      SELECT dx.d AS xd, dy.d AS yd
      FROM dir JOIN deg dx ON dx.node = dir.x
               JOIN deg dy ON dy.node = dir.y
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(xd) AS BIGINT) AS sx, CAST(SUM(yd) AS BIGINT) AS sy,
             CAST(SUM(xd * yd) AS BIGINT) AS sxy,
             CAST(SUM(xd * xd) AS BIGINT) AS sxx,
             CAST(SUM(yd * yd) AS BIGINT) AS syy
      FROM j
    )
    SELECT m AS m_directed,
           CASE WHEN sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) > 0
                THEN ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                  * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                ELSE NULL END AS assortativity
    FROM s
    """,
)
def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the co-purchase part graph (Newman 2002):
    Pearson correlation of endpoint degrees over the directed edge list
    (both directions of every undirected edge) — the graph-structure
    health metric next to q_triangle_counts / q_k_core: positive r =
    hubs link to hubs (dup-family webs), negative r = hub-and-spoke
    (boilerplate templates).  Every moment is an exact BIGINT sum (one
    edge-degree join, two shuffles total); only the final correlation
    is double math, with the IDENTICAL staged IEEE ops on both engines
    (cast-to-double per factor, then multiply/subtract/divide/sqrt) and
    a shared den>0 NULL guard, so the R6 surface cannot flip.  Overflow
    bound: Σ(xd·yd) must fit BIGINT → valid while m·d_max² ≤ 9.2e18
    (e.g. d_max ≤ 3e6 at m = 1e6 directed edges); past it Spark's sum
    wraps silently where DuckDB's HUGEINT→BIGINT cast errors loudly —
    switch the moments to DOUBLE sums beyond that bound."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey"))
    e1 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("a"))
    e2 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("b"))
    pairs = (e1.join(e2, "l_orderkey")
               .where(F.col("a") < F.col("b"))
               .select("a", "b").distinct())
    deg = (pairs.select(F.col("a").alias("node"))
                .unionAll(pairs.select(F.col("b").alias("node")))
                .groupBy("node")
                .agg(F.count("*").cast("long").alias("d")))
    direct = (pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
                   .unionAll(pairs.select(F.col("b").alias("x"),
                                          F.col("a").alias("y"))))
    j = (direct
         .join(deg.select(F.col("node").alias("x"), F.col("d").alias("xd")), "x")
         .join(deg.select(F.col("node").alias("y"), F.col("d").alias("yd")), "y"))
    s = j.agg(F.count("*").cast("long").alias("m"),
              F.sum("xd").alias("sx"), F.sum("yd").alias("sy"),
              F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
              F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
              F.sum(F.col("yd") * F.col("yd")).alias("syy"))
    md = F.col("m").cast("double")
    num = (md * F.col("sxy").cast("double")
           - F.col("sx").cast("double") * F.col("sy").cast("double"))
    vx = (md * F.col("sxx").cast("double")
          - F.col("sx").cast("double") * F.col("sx").cast("double"))
    vy = (md * F.col("syy").cast("double")
          - F.col("sy").cast("double") * F.col("sy").cast("double"))
    den = F.sqrt(vx * vy)
    return s.select(
        F.col("m").alias("m_directed"),
        F.when(den > 0, pround(num / den, 6))
         .otherwise(F.lit(None).cast("double")).alias("assortativity"))


@query(
    "q_ks_drift",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS m FROM ev),
    flagged AS (
      SELECT event_type, cents,
             CASE WHEN us <= (SELECT m FROM mid) THEN 1 ELSE 0 END AS early
      FROM ev
    ),
    pv AS (
      SELECT event_type, cents,
             CAST(SUM(early) AS BIGINT) AS c1,
             CAST(SUM(1 - early) AS BIGINT) AS c2
      FROM flagged GROUP BY event_type, cents
    ),
    cum AS (
      SELECT event_type, cents,
             SUM(c1) OVER (PARTITION BY event_type ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) AS c1c,
             SUM(c2) OVER (PARTITION BY event_type ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) AS c2c,
             SUM(c1) OVER (PARTITION BY event_type) AS n1,
             SUM(c2) OVER (PARTITION BY event_type) AS n2
      FROM pv
    )
    SELECT event_type,
           CAST(MAX(n1) AS BIGINT) AS n_early,
           CAST(MAX(n2) AS BIGINT) AS n_late,
           CAST(MAX(ABS(c1c * n2 - c2c * n1)) AS BIGINT) AS d_num,
           CASE WHEN MAX(n1) > 0 AND MAX(n2) > 0
                THEN ROUND(CAST(MAX(ABS(c1c * n2 - c2c * n1)) AS DOUBLE)
                           / (CAST(MAX(n1) AS DOUBLE)
                              * CAST(MAX(n2) AS DOUBLE)), 6)
                ELSE NULL END AS d_stat
    FROM cum GROUP BY event_type
    """,
)
def q_ks_drift(spark, sf_dir):
    """Exact two-sample Kolmogorov–Smirnov drift test per event_type:
    D between the EARLY and LATE half of the time range (split at the
    data-derived epoch-µs midpoint) — the nonparametric distribution-
    drift monitor next to q_psi_drift/q_kl_unigram_drift (those compare
    binned/histogram shapes; KS is binning-free and catches shifts PSI's
    fixed bins smear).  Exact integer core: D's numerator is
    max |c1·n2 − c2·n1| over the merged support (every term BIGINT —
    no ECDF doubles until the final reported statistic), computed with
    ONE cumulative window per event_type over the distinct value grid
    (value cents), so the plan is a groupBy + a partitioned window —
    no per-pair work, no unpartitioned window, linear at any scale."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents"),
                  F.unix_micros("ts").alias("us")))
    # integer midpoint (matches the oracle's BIGINT `//` exactly at any
    # magnitude — double division loses exactness once mn+mx >= 2^53)
    mid = (ev.agg(F.min("us").cast("long").alias("mn"),
                  F.max("us").cast("long").alias("mx"))
             .select(F.expr("(mn + mx) DIV 2").alias("m")))
    flagged = (ev.crossJoin(F.broadcast(mid))
                 .withColumn("early", F.when(F.col("us") <= F.col("m"), 1)
                                       .otherwise(0)))
    pv = (flagged.groupBy("event_type", "cents")
                 .agg(F.sum("early").cast("long").alias("c1"),
                      F.sum(1 - F.col("early")).cast("long").alias("c2")))
    w_cum = (W.partitionBy("event_type").orderBy("cents")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_all = W.partitionBy("event_type")
    cum = (pv.withColumn("c1c", F.sum("c1").over(w_cum))
             .withColumn("c2c", F.sum("c2").over(w_cum))
             .withColumn("n1", F.sum("c1").over(w_all))
             .withColumn("n2", F.sum("c2").over(w_all)))
    agg = (cum.groupBy("event_type")
              .agg(F.max("n1").cast("long").alias("n_early"),
                   F.max("n2").cast("long").alias("n_late"),
                   F.max(F.abs(F.col("c1c") * F.col("n2")
                               - F.col("c2c") * F.col("n1"))).cast("long")
                    .alias("d_num")))
    d = (F.col("d_num").cast("double")
         / (F.col("n_early").cast("double") * F.col("n_late").cast("double")))
    # all-events-in-one-half (degenerate split, e.g. a single-instant
    # corpus) → one count is 0: report the integer surface, NULL stat
    return agg.select(
        "event_type", "n_early", "n_late", "d_num",
        F.when((F.col("n_early") > 0) & (F.col("n_late") > 0), pround(d, 6))
         .otherwise(F.lit(None).cast("double")).alias("d_stat"))


@query(
    "q_mannwhitney_u",
    oracle="""
    WITH c AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS s1
      FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        AND c_acctbal IS NOT NULL
    ),
    pv AS (
      SELECT c_nationkey, cents,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(s1) AS BIGINT) AS k1
      FROM c GROUP BY c_nationkey, cents
    ),
    ranked AS (
      SELECT c_nationkey, n, k1,
             2 * SUM(n) OVER (PARTITION BY c_nationkey ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) - n + 1 AS dar
      FROM pv
    )
    SELECT c_nationkey,
           CAST(SUM(k1) AS BIGINT) AS n_building,
           CAST(SUM(n - k1) AS BIGINT) AS n_machinery,
           CAST(SUM(k1 * dar) - SUM(k1) * (SUM(k1) + 1) AS BIGINT)
             AS u_building_x2
    FROM ranked GROUP BY c_nationkey
    """,
)
def q_mannwhitney_u(spark, sf_dir):
    """Mann–Whitney U (rank-sum) per nation: BUILDING vs MACHINERY
    account balances — the nonparametric A/B test next to q_ab_ttest
    (which assumes normality; U is the robust default for skewed
    metrics).  Tie handling is the textbook average-rank, kept EXACT by
    doubling: average rank over a tie group is (2·rank_min + cnt − 1)/2,
    a multiple of ½, so DOUBLED ranks are integers and
    U₁×2 = ΣR₁×2 − n₁(n₁+1) is a BIGINT — the whole surface is
    integer-exact, immune to summation order.  Scale shape: raw rows
    reduce FIRST in a (nation, cents) groupBy (map-side combine), and
    the rank window runs over the DISTINCT value grid only
    (dar = 2·cum_n − n + 1 from one cumulative sum), so the window
    input is bounded by the cents-grid size per nation regardless of
    corpus row count — never a per-row rank, never O(n²) pairs."""
    c = (load_table(spark, sf_dir, "customer")
         .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
                & F.col("c_acctbal").isNotNull())
         .select("c_nationkey",
                 F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
                  .alias("cents"),
                 F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
                  .alias("s1")))
    pv = (c.groupBy("c_nationkey", "cents")
           .agg(F.count("*").cast("long").alias("n"),
                F.sum("s1").cast("long").alias("k1")))
    w_cum = (W.partitionBy("c_nationkey").orderBy("cents")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    ranked = pv.withColumn(
        "dar", 2 * F.sum("n").over(w_cum) - F.col("n") + 1)
    return (ranked.groupBy("c_nationkey")
            .agg(F.sum("k1").cast("long").alias("n_building"),
                 F.sum(F.col("n") - F.col("k1")).cast("long")
                  .alias("n_machinery"),
                 (F.sum(F.col("k1") * F.col("dar"))
                  - F.sum("k1") * (F.sum("k1") + 1)).cast("long")
                 .alias("u_building_x2")))


@query(
    "q_chao1_richness",
    oracle="""
    WITH toks AS (
      SELECT source, UNNEST(string_split(trim(regexp_replace(text,
               '[ \\t\\n\\r]+', ' ', 'g'), ' '), ' ')) AS w
      FROM documents
    ),
    cnts AS (
      SELECT source, w, COUNT(*) AS c FROM toks WHERE w <> ''
      GROUP BY source, w
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS s_obs,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           ROUND(CASE WHEN SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) > 0
             THEN CAST(COUNT(*) AS DOUBLE)
                  + CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    / (CAST(2 AS DOUBLE)
                       * CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS DOUBLE))
             ELSE CAST(COUNT(*) AS DOUBLE)
                  + CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    * (CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                       - CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE)
             END, 6) AS chao1
    FROM cnts GROUP BY source
    """,
)
def q_chao1_richness(spark, sf_dir):
    """Chao1 vocabulary-richness estimator per source (Chao 1984):
    Ŝ = S_obs + f1²/(2·f2) from the singleton/doubleton type counts —
    the "how much vocabulary haven't we crawled yet" readout next to
    q_vocab_growth (which measures observed growth; Chao1 extrapolates
    the asymptote), with the standard bias-corrected f1(f1−1)/2 form
    when f2 = 0.  One wordcount shuffle on (source, word) with map-side
    partial aggregation, then a per-source rollup — S_obs/f1/f2 ship as
    exact BIGINTs; only the final estimator is double, staged with
    identical IEEE ops on both engines."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = _wide(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(F.split(ws_normalized(F.col("text")), " ", -1)).alias("w"))
    cnts = (toks.where(F.col("w") != "")
                .groupBy("source", "w").agg(F.count("*").alias("c")))
    agg = (cnts.groupBy("source")
           .agg(F.count("*").cast("long").alias("s_obs"),
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
                 .alias("f1"),
                F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long")
                 .alias("f2")))
    sd = F.col("s_obs").cast("double")
    f1d = F.col("f1").cast("double")
    f2d = F.col("f2").cast("double")
    est = F.when(F.col("f2") > 0,
                 sd + f1d * f1d / (F.lit(2).cast("double") * f2d)) \
           .otherwise(sd + f1d * (f1d - F.lit(1).cast("double"))
                      / F.lit(2).cast("double"))
    return agg.select("source", "s_obs", "f1", "f2",
                      pround(est, 6).alias("chao1"))


@query(
    "q_good_turing_mass",
    oracle="""
    WITH toks AS (
      SELECT source, UNNEST(string_split(trim(regexp_replace(text,
               '[ \\t\\n\\r]+', ' ', 'g'), ' '), ' ')) AS w
      FROM documents
    ),
    cnts AS (
      SELECT source, w, COUNT(*) AS c FROM toks WHERE w <> ''
      GROUP BY source, w
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons,
           CAST((SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000) // SUM(c)
                AS BIGINT) AS p0_bp
    FROM cnts GROUP BY source
    """,
)
def q_good_turing_mass(spark, sf_dir):
    """Good–Turing unseen-probability mass per source: p₀ = N₁/N (the
    fraction of tokens that are hapax legomena — Good 1953), the
    smoothing mass q_kneser_ney_bigram discounts toward, surfaced as a
    standalone corpus-coverage diagnostic (high p₀ = the crawl is far
    from saturating this source's vocabulary).  Same single wordcount
    shuffle as q_chao1_richness; the entire surface is integer
    (basis points via DIV — no doubles anywhere)."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = _wide(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source",
        F.explode(F.split(ws_normalized(F.col("text")), " ", -1)).alias("w"))
    cnts = (toks.where(F.col("w") != "")
                .groupBy("source", "w").agg(F.count("*").alias("c")))
    return (cnts.groupBy("source")
            .agg(F.sum("c").cast("long").alias("n_tokens"),
                 F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
                  .alias("n_singletons"))
            .select("source", "n_tokens", "n_singletons",
                    F.expr("(n_singletons * 10000) DIV n_tokens")
                     .alias("p0_bp")))


@query(
    "q_cuped_adjustment",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS m FROM ev),
    per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(SUM(CASE WHEN us <= (SELECT m FROM mid)
                           THEN cents ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN us > (SELECT m FROM mid)
                           THEN cents ELSE 0 END) AS BIGINT) AS y
      FROM ev GROUP BY user_id
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM per_user
    ),
    arm AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS sxa, CAST(SUM(y) AS BIGINT) AS sya
      FROM per_user GROUP BY arm
    )
    SELECT a.arm, a.n_users,
           ROUND(CAST(a.sya AS DOUBLE) / CAST(a.n_users AS DOUBLE), 6)
             AS mean_y,
           ROUND(CASE WHEN CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
                           - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE) > 0
             THEN CAST(a.sya AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                  - ((CAST(g.n AS DOUBLE) * CAST(g.sxy AS DOUBLE)
                      - CAST(g.sx AS DOUBLE) * CAST(g.sy AS DOUBLE))
                     / (CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
                        - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE)))
                    * (CAST(a.sxa AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                       - CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))
             ELSE CAST(a.sya AS DOUBLE) / CAST(a.n_users AS DOUBLE)
             END, 6) AS mean_y_adj,
           ROUND(CASE WHEN CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
                           - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE) > 0
             THEN (CAST(g.n AS DOUBLE) * CAST(g.sxy AS DOUBLE)
                   - CAST(g.sx AS DOUBLE) * CAST(g.sy AS DOUBLE))
                  / (CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
                     - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE))
             ELSE NULL END, 6) AS theta
    FROM arm a CROSS JOIN g
    """,
)
def q_cuped_adjustment(spark, sf_dir):
    """CUPED variance-reduced A/B readout (Deng et al., WSDM'13 — the
    standard experimentation-platform adjustment): per user, X = spend
    cents in the PRE period (early half of the time range), Y = spend
    in the POST period; θ = cov(X,Y)/var(X) fit on the pooled users;
    adjusted arm means Ȳ' = Ȳ_arm − θ(X̄_arm − X̄).  Arms are the
    deterministic user_id % 2 split.  Every moment is an exact BIGINT
    sum (one per-user groupBy, then one 5-number global agg broadcast
    onto the 2-row arm agg — no window, no second pass over events);
    only the final θ/means are doubles, staged with identical IEEE ops
    both engines and a var(X)>0 guard (θ NULL, unadjusted mean kept).
    Overflow bound: Σx² must fit BIGINT → valid while n_users·x_max²
    ≤ 9.2e18 (x_max ~ $30M/user at 1e4 users; far past any corpus here);
    beyond it Spark wraps silently where DuckDB errors loudly — move
    the second moments to DOUBLE sums past the bound."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select("user_id",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents"),
                  F.unix_micros("ts").alias("us")))
    mid = (ev.agg(F.min("us").cast("long").alias("mn"),
                  F.max("us").cast("long").alias("mx"))
             .select(F.expr("(mn + mx) DIV 2").alias("m")))
    per_user = (ev.crossJoin(F.broadcast(mid))
                .groupBy("user_id")
                .agg(F.sum(F.when(F.col("us") <= F.col("m"), F.col("cents"))
                            .otherwise(0)).cast("long").alias("x"),
                     F.sum(F.when(F.col("us") > F.col("m"), F.col("cents"))
                            .otherwise(0)).cast("long").alias("y"))
                .withColumn("arm", F.col("user_id") % 2))
    g = per_user.agg(F.count("*").cast("long").alias("n"),
                     F.sum("x").cast("long").alias("sx"),
                     F.sum("y").cast("long").alias("sy"),
                     F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
                     F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"))
    arm = (per_user.groupBy("arm")
           .agg(F.count("*").cast("long").alias("n_users"),
                F.sum("x").cast("long").alias("sxa"),
                F.sum("y").cast("long").alias("sya")))
    j = arm.crossJoin(F.broadcast(g))
    nd = F.col("n").cast("double")
    den = nd * F.col("sxx").cast("double") \
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    theta = (nd * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double")) / den
    mean_y = F.col("sya").cast("double") / F.col("n_users").cast("double")
    mean_x_arm = F.col("sxa").cast("double") / F.col("n_users").cast("double")
    mean_x = F.col("sx").cast("double") / nd
    adj = mean_y - theta * (mean_x_arm - mean_x)
    return j.select(
        "arm", "n_users",
        pround(mean_y, 6).alias("mean_y"),
        pround(F.when(den > 0, adj).otherwise(mean_y), 6).alias("mean_y_adj"),
        F.when(den > 0, pround(theta, 6)).otherwise(
            F.lit(None).cast("double")).alias("theta"))


@query(
    "q_winsorized_mean",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    pv AS (
      SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY event_type, cents
    ),
    cum AS (
      SELECT event_type, cents, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS c,
             SUM(n) OVER (PARTITION BY event_type) AS tot
      FROM pv
    ),
    thr AS (
      SELECT event_type,
             MIN(CASE WHEN c >= (tot + 19) // 20 THEN cents END) AS p5,
             MIN(CASE WHEN c >= (19 * tot + 19) // 20 THEN cents END) AS p95,
             CAST(MAX(tot) AS BIGINT) AS n_rows
      FROM cum GROUP BY event_type
    )
    SELECT p.event_type, t.n_rows, t.p5 AS p5_cents, t.p95 AS p95_cents,
           CAST(SUM(p.n * least(greatest(p.cents, t.p5), t.p95)) AS BIGINT)
             AS wsum_cents,
           ROUND(CAST(SUM(p.n * least(greatest(p.cents, t.p5), t.p95))
                      AS DOUBLE) / CAST(t.n_rows AS DOUBLE), 6) AS wmean_cents
    FROM pv p JOIN thr t ON t.event_type = p.event_type
    GROUP BY p.event_type, t.n_rows, t.p5, t.p95
    """,
)
def q_winsorized_mean(spark, sf_dir):
    """Winsorized mean per event_type: clamp values at the exact
    discrete 5th/95th percentiles (percentile_disc semantics — smallest
    grid value whose cumulative count reaches ⌈q·N⌉, computed in pure
    integers: ⌈N/20⌉ = (N+19)//20) and average the clamped cents — the
    robust central-tendency readout next to q_trimmed_mean (winsorizing
    keeps N constant instead of dropping tails, the usual choice for
    metric dashboards).  Scale shape: rows reduce to the (type, cents)
    grid first; ONE cumulative window over the grid finds both
    thresholds; the winsorized sum is an exact BIGINT
    (Σ n·clamp(cents)), so the hash surface is integer except the final
    staged-identical mean."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents")))
    pv = (ev.groupBy("event_type", "cents")
            .agg(F.count("*").cast("long").alias("n")))
    w_cum = (W.partitionBy("event_type").orderBy("cents")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_all = W.partitionBy("event_type")
    cum = (pv.withColumn("c", F.sum("n").over(w_cum))
             .withColumn("tot", F.sum("n").over(w_all)))
    thr = (cum.withColumn("q5", F.expr("(tot + 19) DIV 20"))
              .withColumn("q95", F.expr("(19 * tot + 19) DIV 20"))
              .groupBy("event_type")
              .agg(F.min(F.when(F.col("c") >= F.col("q5"), F.col("cents"))
                          .otherwise(F.lit(None))).alias("p5"),
                   F.min(F.when(F.col("c") >= F.col("q95"), F.col("cents"))
                          .otherwise(F.lit(None))).alias("p95"),
                   F.max("tot").cast("long").alias("n_rows")))
    clamped = F.col("n") * F.least(F.greatest(F.col("cents"), F.col("p5")),
                                   F.col("p95"))
    out = (pv.join(thr, "event_type")
             .groupBy("event_type", "n_rows", "p5", "p95")
             .agg(F.sum(clamped).cast("long").alias("wsum_cents")))
    return out.select(
        "event_type", "n_rows",
        F.col("p5").alias("p5_cents"), F.col("p95").alias("p95_cents"),
        "wsum_cents",
        pround(F.col("wsum_cents").cast("double")
               / F.col("n_rows").cast("double"), 6).alias("wmean_cents"))


@query(
    "q_local_clustering",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      WHERE l1.l_quantity > 25 AND l2.l_quantity > 25
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.a = e1.b
      JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tcnt AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY node
    )
    SELECT deg.node, COALESCE(t.triangles, 0) AS triangles, deg.d,
           CASE WHEN deg.d >= 2
                THEN (COALESCE(t.triangles, 0) * 20000) // (deg.d * (deg.d - 1))
                ELSE NULL END AS lcc_bp
    FROM deg LEFT JOIN tcnt t ON t.node = deg.node
    """,
)
def q_local_clustering(spark, sf_dir):
    """Local clustering coefficient per node of the co-purchase part
    graph: C(v) = triangles(v) / (d(v) choose 2) — the per-node
    community-density readout that q_triangle_counts aggregates feed
    (Watts–Strogatz).  Composes the degree-ORIENTED distributed
    triangle count (operators/graph.triangle_counts — wedge fan-out
    bounded by √(2m), no hub blowup) with the degree table via one
    outer join; the coefficient ships as integer basis points
    ((tri·2·10000) DIV d(d−1)) with a NULL guard for d<2, so the whole
    surface is exact.  The oracle deliberately uses the naive a<b<c
    triangle formulation — two independent algorithms agreeing per
    node is the check."""
    from access_mopper_spark.operators.graph import triangle_counts
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey"))
    # basket-built canonical pair set, persisted: it feeds the triangle
    # operator (degree agg + orientation join) AND the external degree
    # table — the old self-join + distinct replayed two scans and three
    # shuffles per consumer
    pairs = copurchase_pairs(li).persist()
    pairs.count()  # eager: racing consumers would recompute the build
    tri = triangle_counts(pairs, assume_canonical=True)
    deg = (pairs.select(F.col("a").alias("node"))
                .unionAll(pairs.select(F.col("b").alias("node")))
                .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    j = (deg.join(tri.withColumnRenamed("triangles", "__t"), "node", "left")
            .select("node",
                    F.coalesce(F.col("__t"), F.lit(0)).cast("long")
                     .alias("triangles"),
                    "d"))
    out = j.withColumn(
        "lcc_bp",
        F.when(F.col("d") >= 2,
               F.expr("(triangles * 20000) DIV (d * (d - 1))"))
         .otherwise(F.lit(None).cast("long")))
    return eager_release(out, pairs, tri)


@query(
    "q_audience_overlap",
    oracle="""
    WITH tu AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE user_id IS NOT NULL
    ),
    sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tu
           GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM tu a JOIN tu b ON a.user_id = b.user_id
        AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
           (i.n_both * 10000) // (sa.n + sb.n - i.n_both) AS jaccard_bp
    FROM inter i
    JOIN sz sa ON sa.event_type = i.type_a
    JOIN sz sb ON sb.event_type = i.type_b
    """,
)
def q_audience_overlap(spark, sf_dir):
    """Audience-overlap matrix: pairwise user-set Jaccard between event
    types in integer basis points — the segmentation/cannibalization
    readout (which behaviors share an audience) next to
    q_source_overlap (which overlaps corpora by content).  Scale shape:
    users reduce to DISTINCT (type, user) first (one shuffle with
    map-side combine), the type-pair join fans out only by the
    per-user TYPE COUNT (bounded by the type vocabulary, not the event
    count), and set sizes arrive by broadcast — no user-pair blowup
    anywhere."""
    tu = (load_table(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull())
          .select("event_type", "user_id").distinct())
    sz = tu.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (a.join(b, "user_id")
              .where(F.col("type_a") < F.col("type_b"))
              .groupBy("type_a", "type_b")
              .agg(F.count("*").cast("long").alias("n_both")))
    out = (inter
           .join(F.broadcast(sz.select(F.col("event_type").alias("type_a"),
                                       F.col("n").alias("n_a"))), "type_a")
           .join(F.broadcast(sz.select(F.col("event_type").alias("type_b"),
                                       F.col("n").alias("n_b"))), "type_b"))
    return out.select(
        "type_a", "type_b", "n_a", "n_b", "n_both",
        F.expr("(n_both * 10000) DIV (n_a + n_b - n_both)")
         .alias("jaccard_bp"))


#: RBO depth weights, precomputed once in Python and embedded as the
#: SAME integer literals on both engines: w_d = round((1-p)·p^(d-1)/d
#: · 1e12) for p = 0.9, k = 20.  Integer micro-weights make the RBO
#: sum an exact BIGINT (Σ X_d·w_d with X_d ≤ 20 → < 2^45), so the
#: surface cannot flip with summation order — and neither engine ever
#: calls pow(), whose last-ulp behavior differs across libms.
_RBO_P, _RBO_K = 0.9, 20
_RBO_W = [(d, round((1 - _RBO_P) * _RBO_P ** (d - 1) / d * 1e12))
          for d in range(1, _RBO_K + 1)]
_RBO_VALUES_SQL = ", ".join(f"({d}, {w}::BIGINT)" for d, w in _RBO_W)
_RBO_QUERY = ('dup', 'spark', 'sort')
_RBO_TERMS_SQL = ", ".join(f"'{t}'" for t in _RBO_QUERY)


@query(
    "q_rbo_rankings",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'), ' '), ' ') AS w
      FROM documents
    ),
    dl AS (SELECT doc_id, len(w) AS dl FROM toks),
    stats AS (SELECT COUNT(*) AS n, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
    tf AS (
      SELECT t.doc_id, d.dl, u.t AS term, COUNT(*) AS tf
      FROM toks t JOIN dl d ON d.doc_id = t.doc_id, unnest(t.w) u(t)
      WHERE u.t IN ({_RBO_TERMS_SQL})
      GROUP BY t.doc_id, d.dl, u.t
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    bm25 AS (
      SELECT tf.doc_id,
             ROUND(SUM(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))),
                   6) AS score
      FROM tf JOIN df ON df.term = tf.term CROSS JOIN stats s
      GROUP BY tf.doc_id
    ),
    tfidf AS (
      SELECT tf.doc_id,
             ROUND(SUM(tf.tf * ln(CAST(s.n AS DOUBLE) / df.df)), 6) AS score
      FROM tf JOIN df ON df.term = tf.term CROSS JOIN stats s
      GROUP BY tf.doc_id
    ),
    ra AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
      FROM bm25 QUALIFY r <= {_RBO_K}
    ),
    rb AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
      FROM tfidf QUALIFY r <= {_RBO_K}
    ),
    common AS (
      SELECT greatest(ra.r, rb.r) AS m
      FROM ra JOIN rb ON rb.doc_id = ra.doc_id
    ),
    wt AS (SELECT * FROM (VALUES {_RBO_VALUES_SQL}) t(d, w)),
    per_d AS (
      SELECT wt.d, wt.w, CAST(COUNT(common.m) AS BIGINT) AS xd
      FROM wt LEFT JOIN common ON common.m <= wt.d
      GROUP BY wt.d, wt.w
    ),
    sums AS (
      SELECT CAST(COALESCE(SUM(w * xd), 0) AS BIGINT) AS rbo_e12,
             CAST(MAX(CASE WHEN d = {_RBO_K} THEN xd END) AS BIGINT)
               AS overlap_at_k
      FROM per_d
    )
    SELECT {_RBO_K} AS k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM common) AS n_common,
           overlap_at_k, rbo_e12,
           ROUND(CAST(rbo_e12 AS DOUBLE) / CAST(1000000000000 AS DOUBLE), 6)
             AS rbo
    FROM sums
    """,
)
def q_rbo_rankings(spark, sf_dir):
    """Rank-Biased Overlap (Webber et al., TOIS'10) between the BM25
    and TF-IDF top-20 rankings for the same query — the top-weighted
    rank-agreement metric IR teams use to compare scorers/index builds
    (Kendall/Spearman need conjoint lists; RBO handles disjoint tails).
    Truncated RBO@20, p = 0.9: Σ_d (1−p)p^(d−1)·X_d/d with X_d =
    |prefix_d(A) ∩ prefix_d(B)|.  The depth weights are precomputed
    integer micro-weights embedded as the SAME literals on both
    engines (neither engine calls pow()), so the score is an exact
    BIGINT (Σ X_d·w_d) until the final rendered double.  Both ranked
    lists come from the ONE query-term-filtered postings shuffle
    (operators/search.py); ranks reuse partial_topk's own rank column
    (its phase-2 window runs over ≤ k·p surviving rows, never the full
    corpus)."""
    from access_mopper_spark.operators.search import (build_postings,
                                                      corpus_stats)
    docs = load_table(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text",
                              terms=list(_RBO_QUERY))
    df_ = postings.groupBy("term").agg(F.count("*").alias("df"))
    stats = corpus_stats(docs, "text")
    base = (postings.join(F.broadcast(df_), "term")
                    .crossJoin(F.broadcast(stats)))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * 2.2
               / (F.col("tf") + 1.2 * (1.0 - 0.75
                                       + 0.75 * F.col("dl") / F.col("avgdl"))))
    bm25 = (base.select("doc_id", (idf * tf_part).alias("__s"))
                .groupBy("doc_id").agg(pround(F.sum("__s"), 6).alias("score")))
    tfidf = (base.select(
                 "doc_id",
                 (F.col("tf") * F.log(F.col("n_docs").cast("double")
                                      / F.col("df"))).alias("__s"))
                 .groupBy("doc_id")
                 .agg(pround(F.sum("__s"), 6).alias("score")))

    from access_mopper_spark.operators.similarity import partial_topk

    def ranked(scored):
        # partial_topk's phase 2 already ranks the <= k·p survivors with
        # row_number over the SAME total (score DESC, doc_id) order the
        # oracle uses — reuse that rank column directly (a broadcast
        # self-join recount would add a shuffle and a second tie-break
        # site to keep in sync).
        top = partial_topk(scored, [],
                           [F.col("score").desc(), F.col("doc_id")], _RBO_K)
        return top.select("doc_id", F.col("rank").cast("long").alias("r"))

    ra = ranked(bm25).select("doc_id", F.col("r").alias("ra"))
    rb = ranked(tfidf).select("doc_id", F.col("r").alias("rb"))
    common = (ra.join(rb, "doc_id")
                .select(F.greatest("ra", "rb").alias("m")))
    wt = spark.createDataFrame(_RBO_W, "d LONG, w LONG")
    per_d = (F.broadcast(wt).join(common, common["m"] <= wt["d"], "left")
             .groupBy("d", "w")
             .agg(F.count("m").cast("long").alias("xd")))
    sums = per_d.agg(
        F.coalesce(F.sum(F.col("w") * F.col("xd")), F.lit(0)).cast("long")
         .alias("rbo_e12"),
        F.max(F.when(F.col("d") == _RBO_K, F.col("xd"))).cast("long")
         .alias("overlap_at_k"))
    n_common = common.agg(F.count("*").cast("long").alias("n_common"))
    return (sums.crossJoin(F.broadcast(n_common))
            .select(F.lit(_RBO_K).cast("int").alias("k"), "n_common",
                    "overlap_at_k", "rbo_e12",
                    pround(F.col("rbo_e12").cast("double")
                           / F.lit(1e12), 6).alias("rbo")))


@query(
    "q_quantile_drift",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS m FROM ev),
    pv AS (
      SELECT event_type,
             CASE WHEN us <= (SELECT m FROM mid) THEN 0 ELSE 1 END AS half,
             cents, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT event_type, half, cents,
             SUM(n) OVER (PARTITION BY event_type, half ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS c,
             SUM(n) OVER (PARTITION BY event_type, half) AS tot
      FROM pv
    ),
    qs AS (SELECT * FROM (VALUES (10), (25), (50), (75), (90)) t(q_pct)),
    pq AS (
      SELECT event_type, half, q_pct, MIN(cents) AS p
      FROM cum JOIN qs ON c >= (q_pct * tot + 99) // 100
      GROUP BY event_type, half, q_pct
    )
    SELECT event_type, q_pct,
           MIN(CASE WHEN half = 0 THEN p END) AS p_early,
           MIN(CASE WHEN half = 1 THEN p END) AS p_late,
           MIN(CASE WHEN half = 1 THEN p END)
             - MIN(CASE WHEN half = 0 THEN p END) AS delta_cents
    FROM pq GROUP BY event_type, q_pct
    """,
)
def q_quantile_drift(spark, sf_dir):
    """Quantile-by-quantile distribution drift per event_type: the
    exact discrete P10/P25/P50/P75/P90 of value cents in the EARLY vs
    LATE half of the time range and their deltas — the magnitude
    companion to q_ks_drift (KS says "the distributions differ"; this
    says WHERE on the curve and BY HOW MUCH, the readout a curation
    dashboard plots).  Percentiles use the integer ceil-division grid
    convention (⌈q·N/100⌉ = (q·N+99)//100, percentile_disc semantics),
    so the ENTIRE surface is exact integers — no interpolation, no
    doubles, nothing to snap.  Scale shape: rows reduce to the
    (type, half, cents) grid first; one cumulative window over the
    grid serves all five quantiles via a 5-row broadcast join."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents"),
                  F.unix_micros("ts").alias("us")))
    mid = (ev.agg(F.min("us").cast("long").alias("mn"),
                  F.max("us").cast("long").alias("mx"))
             .select(F.expr("(mn + mx) DIV 2").alias("m")))
    pv = (ev.crossJoin(F.broadcast(mid))
            .withColumn("half", F.when(F.col("us") <= F.col("m"), 0)
                                 .otherwise(1))
            .groupBy("event_type", "half", "cents")
            .agg(F.count("*").cast("long").alias("n")))
    w_cum = (W.partitionBy("event_type", "half").orderBy("cents")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_all = W.partitionBy("event_type", "half")
    cum = (pv.withColumn("c", F.sum("n").over(w_cum))
             .withColumn("tot", F.sum("n").over(w_all)))
    qs = spark.createDataFrame([(10,), (25,), (50,), (75,), (90,)],
                               "q_pct INT")
    pq = (cum.join(F.broadcast(qs),
                   F.col("c") >= F.expr("(q_pct * tot + 99) DIV 100"))
             .groupBy("event_type", "half", "q_pct")
             .agg(F.min("cents").alias("p")))
    out = (pq.groupBy("event_type", "q_pct")
             .agg(F.min(F.when(F.col("half") == 0, F.col("p")))
                   .alias("p_early"),
                  F.min(F.when(F.col("half") == 1, F.col("p")))
                   .alias("p_late")))
    return out.select("event_type", "q_pct", "p_early", "p_late",
                      (F.col("p_late") - F.col("p_early"))
                      .alias("delta_cents"))


@query(
    "q_segmented_trend",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    bounds AS (SELECT MIN(us) AS mn, (MIN(us) + MAX(us)) // 2 AS m FROM ev),
    pts AS (
      SELECT event_type,
             CASE WHEN us <= (SELECT m FROM bounds) THEN 0 ELSE 1 END AS half,
             (us - (SELECT mn FROM bounds)) // 3600000000 AS t, y
      FROM ev
    ),
    mo AS (
      SELECT event_type, half, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(t * y) AS BIGINT) AS sty,
             CAST(SUM(t * t) AS BIGINT) AS stt
      FROM pts GROUP BY event_type, half
    ),
    sl AS (
      SELECT event_type, half, n,
             CASE WHEN CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) > 0
                  THEN (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                        - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                          - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                  ELSE NULL END AS slope
      FROM mo
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN half = 0 THEN n END) AS BIGINT) AS n_early,
           CAST(MIN(CASE WHEN half = 1 THEN n END) AS BIGINT) AS n_late,
           ROUND(MIN(CASE WHEN half = 0 THEN slope END), 6) AS slope_early,
           ROUND(MIN(CASE WHEN half = 1 THEN slope END), 6) AS slope_late,
           ROUND(MIN(CASE WHEN half = 1 THEN slope END)
                 - MIN(CASE WHEN half = 0 THEN slope END), 6) AS slope_delta
    FROM sl GROUP BY event_type
    """,
)
def q_segmented_trend(spark, sf_dir):
    """Segmented trend drift per event_type: the OLS slope of value
    cents over time (cents/hour) fit separately on the EARLY and LATE
    halves of the range, plus the slope change — the trend-break
    monitor next to q_ks_drift (level shift) and q_quantile_drift
    (shape shift); a pipeline whose quality trend bends between epochs
    fails this gate first.  Time rescales to integer HOURS since the
    corpus min (t² sums stay far inside BIGINT at any corpus size —
    raw epoch-µs squared would overflow), every moment is an exact
    BIGINT from one groupBy, and only the final slopes are doubles
    with identical staged IEEE ops + a zero-variance NULL guard."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y"),
                  F.unix_micros("ts").alias("us")))
    bounds = (ev.agg(F.min("us").cast("long").alias("mn"),
                     F.max("us").cast("long").alias("mx"))
                .select("mn", F.expr("(mn + mx) DIV 2").alias("m")))
    pts = (ev.crossJoin(F.broadcast(bounds))
             .select("event_type",
                     F.when(F.col("us") <= F.col("m"), 0).otherwise(1)
                      .alias("half"),
                     F.expr("(us - mn) DIV 3600000000").alias("t"), "y"))
    mo = (pts.groupBy("event_type", "half")
             .agg(F.count("*").cast("long").alias("n"),
                  F.sum("t").cast("long").alias("st"),
                  F.sum("y").cast("long").alias("sy"),
                  F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
                  F.sum(F.col("t") * F.col("t")).cast("long").alias("stt")))
    nd = F.col("n").cast("double")
    den = nd * F.col("stt").cast("double") \
        - F.col("st").cast("double") * F.col("st").cast("double")
    num = nd * F.col("sty").cast("double") \
        - F.col("st").cast("double") * F.col("sy").cast("double")
    sl = mo.select("event_type", "half", "n",
                   F.when(den > 0, num / den)
                    .otherwise(F.lit(None).cast("double")).alias("slope"))
    out = (sl.groupBy("event_type")
           .agg(F.min(F.when(F.col("half") == 0, F.col("n"))).cast("long")
                 .alias("n_early"),
                F.min(F.when(F.col("half") == 1, F.col("n"))).cast("long")
                 .alias("n_late"),
                F.min(F.when(F.col("half") == 0, F.col("slope")))
                 .alias("__se"),
                F.min(F.when(F.col("half") == 1, F.col("slope")))
                 .alias("__sl")))
    return out.select("event_type", "n_early", "n_late",
                      pround(F.col("__se"), 6).alias("slope_early"),
                      pround(F.col("__sl"), 6).alias("slope_late"),
                      pround(F.col("__sl") - F.col("__se"), 6)
                       .alias("slope_delta"))


@query(
    "q_hhi_concentration",
    oracle="""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
      GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS k FROM c)
    SELECT tot.k AS n_sources, tot.t AS n_docs,
           CAST(CAST((SELECT SUM(n * n) FROM c) AS BIGINT) * 10000
                // (tot.t * tot.t) AS BIGINT) AS hhi_bp,
           CAST(MAX(c.n) * 10000 // tot.t AS BIGINT) AS top_share_bp
    FROM c, tot GROUP BY tot.k, tot.t
    """,
)
def q_hhi_concentration(spark, sf_dir):
    """Herfindahl–Hirschman concentration of the corpus over sources:
    HHI = Σ share² in integer basis points, plus the top-source share —
    the "is one crawl dominating the mixture" governance readout next
    to q_domain_scorecard/q_host_cap (those cap and score; this is the
    single dashboard number antitrust-style).  One tiny source-count
    aggregate; Σn² and the shares are exact integers (×10000 DIV t²),
    so nothing can flip.  Overflow bound: Σn²×10000 must fit BIGINT →
    valid to ~9.6e8 docs in a single source (Σn² ≤ 9.2e14); the oracle
    casts its HUGEINT sum to BIGINT so BOTH engines hit the bound at
    the same place (DuckDB errors loudly; past it compute shares in
    DOUBLE).  At 100 TB the per-source count table is |sources| rows —
    the whole readout is a map-side-combined count plus scalar math."""
    c = (load_table(spark, sf_dir, "documents")
         .groupBy("source").agg(F.count("*").cast("long").alias("n")))
    tot = c.agg(F.sum("n").cast("long").alias("t"),
                F.count("*").cast("long").alias("k"),
                F.sum(F.col("n") * F.col("n")).cast("long").alias("ssq"),
                F.max("n").cast("long").alias("mx"))
    return tot.select(
        F.col("k").alias("n_sources"), F.col("t").alias("n_docs"),
        F.expr("ssq * 10000 DIV (t * t)").alias("hhi_bp"),
        F.expr("mx * 10000 DIV t").alias("top_share_bp"))


@query(
    "q_ess_weights",
    oracle="""
    WITH w AS (
      SELECT source, CAST(n_chars AS BIGINT) AS w FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    mo AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(w) AS BIGINT) AS sum_w,
             CAST(SUM(w * w) AS BIGINT) AS sum_w2
      FROM w GROUP BY source
    )
    SELECT source, n_docs, sum_w, sum_w2,
           ROUND(CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
                 / CAST(sum_w2 AS DOUBLE), 6) AS ess,
           CAST(FLOOR(CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
                      / CAST(sum_w2 AS DOUBLE) * CAST(10000 AS DOUBLE)
                      / CAST(n_docs AS DOUBLE)) AS BIGINT) AS ess_ratio_bp
    FROM mo
    """,
)
def q_ess_weights(spark, sf_dir):
    """Effective sample size of the per-source sampling weights
    (Kish 1965): ESS = (Σw)²/Σw² over the length weights the
    weighted-sampling row uses — the degeneracy diagnostic for any
    weighted mixture (ESS ≪ n means a few heavy docs dominate and the
    'weighted sample of n' is really a sample of ESS; importance-
    sampling pipelines gate on exactly this).  Σw and Σw² are exact
    BIGINT moments from one groupBy (w = n_chars ≤ ~10⁵ keeps w² sums
    inside BIGINT up to ~10⁸ docs/source — beyond that, swap the two
    sums to DOUBLE); ESS and the ESS/n ratio are staged-identical
    doubles, the ratio floored onto the integer bp grid."""
    w = (load_table(spark, sf_dir, "documents")
         .where(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
         .select("source", F.col("n_chars").cast("long").alias("w")))
    mo = (w.groupBy("source")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum("w").cast("long").alias("sum_w"),
                F.sum(F.col("w") * F.col("w")).cast("long").alias("sum_w2")))
    swd = F.col("sum_w").cast("double")
    ess = swd * swd / F.col("sum_w2").cast("double")
    return mo.select(
        "source", "n_docs", "sum_w", "sum_w2",
        pround(ess, 6).alias("ess"),
        F.floor(ess * F.lit(10000).cast("double")
                / F.col("n_docs").cast("double")).cast("long")
         .alias("ess_ratio_bp"))


@query(
    "q_coverage_topk",
    oracle="""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
      GROUP BY source
    ),
    r AS (
      SELECT n,
             ROW_NUMBER() OVER (ORDER BY n DESC, source) AS rk,
             SUM(n) OVER (ORDER BY n DESC, source
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n) OVER () AS tot,
             COUNT(*) OVER () AS k
      FROM c
    )
    SELECT CAST(MAX(k) AS BIGINT) AS n_sources,
           CAST(MAX(tot) AS BIGINT) AS n_docs,
           CAST(MIN(CASE WHEN 2 * cum >= tot THEN rk END) AS BIGINT) AS k50,
           CAST(MIN(CASE WHEN 10 * cum >= 9 * tot THEN rk END) AS BIGINT)
             AS k90
    FROM r
    """,
)
def q_coverage_topk(spark, sf_dir):
    """Source coverage curve: how many top sources cover 50% / 90% of
    the corpus — the mixture-diversity readout next to
    q_hhi_concentration (HHI is the concentration scalar; this is the
    dashboard's "k sources = X% of data" pair).  Exact integers
    throughout (2·cum ≥ tot and 10·cum ≥ 9·tot avoid any division).
    The ranking window is UNPARTITIONED but runs AFTER the corpus
    reduces to one row per source — |sources| rows regardless of data
    volume (the same bounded-axis argument as q_seasonal_decompose's
    per-day window; registered in the plan-audit allowlist)."""
    c = (load_table(spark, sf_dir, "documents")
         .groupBy("source").agg(F.count("*").cast("long").alias("n")))
    w_ord = W.orderBy(F.col("n").desc(), F.col("source"))
    w_cum = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.partitionBy()
    r = (c.select(
            "n",
            F.row_number().over(w_ord).alias("rk"),
            F.sum("n").over(w_cum).alias("cum"),
            F.sum("n").over(w_all).alias("tot"),
            F.count("*").over(w_all).alias("k")))
    return r.agg(
        F.max("k").cast("long").alias("n_sources"),
        F.max("tot").cast("long").alias("n_docs"),
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("rk")))
         .cast("long").alias("k50"),
        F.min(F.when(10 * F.col("cum") >= 9 * F.col("tot"), F.col("rk")))
         .cast("long").alias("k90"))
