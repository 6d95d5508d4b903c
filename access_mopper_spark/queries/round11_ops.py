"""Round-11 operator additions: paired-classifier / association /
inequality / rank-correlation statistics, information-theoretic corpus
diagnostics, heavy-tail and burstiness readouts, link prediction, and
an exact integer Lorenz curve.

Each row follows the registry conventions (queries/_core.py): integer
hash surfaces wherever possible (basis points via DIV // parity, exact
BIGINT moment sums), logs only in FINAL per-row expressions or quantized
to an integer grid per DISTINCT value before summation (so double
summation order can never flip a hash), R6 for unavoidable doubles with
identically staged IEEE ops on both engines, fuzz + TZ gates before any
driver exposure.
"""

from __future__ import annotations

from access_mopper_spark.queries._core import (  # noqa: F401
    F, W, query, R6, _wide, copurchase_pairs, eager_release, load_table, pround)


# =====================================================================
# paired-classifier / agreement statistics
# =====================================================================

@query(
    "q_mcnemar_test",
    oracle="""
    WITH lab AS (
      SELECT CASE WHEN COALESCE(n_chars, 0) >= 200 THEN 1 ELSE 0 END AS a,
             CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END AS b
      FROM documents WHERE text IS NOT NULL
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a * b) AS BIGINT) AS n11,
             CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
             CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM lab
    )
    SELECT n, n11, n10, n01, n00,
           CASE WHEN n10 + n01 > 0
                THEN ROUND(CASE WHEN ABS(n10 - n01) >= 1
                                THEN CAST((ABS(n10 - n01) - 1)
                                          * (ABS(n10 - n01) - 1) AS DOUBLE)
                                     / CAST(n10 + n01 AS DOUBLE)
                                ELSE CAST(0 AS DOUBLE) END, 6)
                ELSE NULL END AS chi2_mcnemar
    FROM t
    """,
)
def q_mcnemar_test(spark, sf_dir):
    """McNemar's paired test between two deterministic document
    filters — A: length >= 200 chars, B: contains a digit — the
    statistic that decides whether two CURATION RULES disagree
    systematically (marginal homogeneity) rather than merely overlap:
    the pipeline question "does swapping filter A for filter B change
    WHICH docs pass, or only how many".  Continuity-corrected
    chi2 = (|b-c|-1)^2/(b+c) over the discordant cells only.  The whole
    2x2 table is ONE map-side-combined aggregate (integers, exact at
    any corpus size); only the final statistic is a double, staged
    identically on both engines with a b+c=0 NULL guard."""
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("text").isNotNull())
    a = F.when(F.coalesce(F.col("n_chars"), F.lit(0)) >= 200, 1).otherwise(0)
    b = F.when(F.col("text").rlike("[0-9]"), 1).otherwise(0)
    lab = docs.select(a.alias("a"), b.alias("b"))
    t = lab.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"))
    disc = F.col("n10") + F.col("n01")
    adiff = F.abs(F.col("n10") - F.col("n01"))
    chi2 = ((adiff - 1) * (adiff - 1)).cast("double") / disc.cast("double")
    return t.select(
        "n", "n11", "n10", "n01", "n00",
        F.when(disc > 0,
               pround(F.when(adiff >= 1, chi2)
                       .otherwise(F.lit(0.0).cast("double")), 6))
         .otherwise(F.lit(None).cast("double")).alias("chi2_mcnemar"))


@query(
    "q_cohens_kappa",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             (length(p) - length(replace(p, ' the ', ''))) / 5.0
               + (length(p) - length(replace(p, ' and ', ''))) / 5.0
               + (length(p) - length(replace(p, ' of ', ''))) / 4.0 AS s_en,
             (length(p) - length(replace(p, ' le ', ''))) / 4.0
               + (length(p) - length(replace(p, ' la ', ''))) / 4.0
               + (length(p) - length(replace(p, ' et ', ''))) / 4.0 AS s_fr,
             (length(p) - length(replace(p, ' der ', ''))) / 5.0
               + (length(p) - length(replace(p, ' und ', ''))) / 5.0
               + (length(p) - length(replace(p, ' die ', ''))) / 5.0 AS s_de,
             (length(p) - length(replace(p, ' el ', ''))) / 4.0
               + (length(p) - length(replace(p, ' los ', ''))) / 5.0
               + (length(p) - length(replace(p, ' y ', ''))) / 3.0 AS s_es
      FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p
            FROM documents) t
    ),
    g AS (
      SELECT COALESCE(lang, '<null>') AS gold,
             CASE WHEN s_en = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'en'
                  WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'fr'
                  WHEN s_de = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'de'
                  WHEN s_es = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'es'
                  ELSE 'und' END AS guessed
      FROM scored
    ),
    cm AS (SELECT gold, guessed, CAST(COUNT(*) AS BIGINT) AS c
           FROM g GROUP BY gold, guessed),
    marg AS (
      SELECT COALESCE(r.k, c.k) AS k,
             COALESCE(r.rn, 0) AS rn, COALESCE(c.cn, 0) AS cn
      FROM (SELECT gold AS k, CAST(SUM(c) AS BIGINT) AS rn
            FROM cm GROUP BY gold) r
      FULL OUTER JOIN (SELECT guessed AS k, CAST(SUM(c) AS BIGINT) AS cn
                       FROM cm GROUP BY guessed) c ON c.k = r.k
    ),
    t AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM cm) AS n,
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM cm
              WHERE gold = guessed) AS n_agree,
             (SELECT CAST(SUM(rn * cn) AS BIGINT) FROM marg) AS chance_prod
    )
    SELECT n, n_agree,
           CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     - CAST(chance_prod AS DOUBLE) > 0
                THEN ROUND((CAST(n_agree AS DOUBLE) * CAST(n AS DOUBLE)
                            - CAST(chance_prod AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                              - CAST(chance_prod AS DOUBLE)), 6)
                ELSE NULL END AS kappa
    FROM t
    """,
)
def q_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between the gold ``lang`` label and the marker-word
    language guess (functions/text.lang_guess) — the chance-corrected
    agreement SCALAR on the confusion matrix q_lang_confusion
    materializes (accuracy alone rewards a classifier that always
    predicts the majority language; kappa doesn't).  kappa =
    (po - pe)/(1 - pe) rearranged to the all-integer core
    (n_agree*n - sum(rn*cn)) / (n^2 - sum(rn*cn)): the confusion
    matrix, its marginals, and the chance product are exact BIGINTs
    (one map-side scoring pass + a <= langs^2 grouped count), so only
    the final ratio is a double — staged identically both engines with
    a pe=1 NULL guard.  Overflow bound: sum(rn*cn) <= n^2 must fit
    BIGINT -> valid to n = 3e9 docs."""
    from access_mopper_spark.functions.text import lang_guess
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        F.coalesce("lang", F.lit("<null>")).alias("gold"),
        lang_guess(F.col("text")).alias("guessed"))
    cm = g.groupBy("gold", "guessed").agg(F.count("*").cast("long").alias("c"))
    rn = (cm.groupBy("gold").agg(F.sum("c").cast("long").alias("rn"))
            .withColumnRenamed("gold", "k"))
    cn = (cm.groupBy("guessed").agg(F.sum("c").cast("long").alias("cn"))
            .withColumnRenamed("guessed", "k"))
    marg = (rn.join(cn, "k", "full_outer")
              .select(F.coalesce("rn", F.lit(0)).alias("rn"),
                      F.coalesce("cn", F.lit(0)).alias("cn")))
    t = (cm.agg(F.sum("c").cast("long").alias("n"),
                F.sum(F.when(F.col("gold") == F.col("guessed"), F.col("c"))
                       .otherwise(0)).cast("long").alias("n_agree"))
           .crossJoin(F.broadcast(
               marg.agg(F.sum(F.col("rn") * F.col("cn")).cast("long")
                         .alias("chance_prod")))))
    nd = F.col("n").cast("double")
    den = nd * nd - F.col("chance_prod").cast("double")
    num = F.col("n_agree").cast("double") * nd \
        - F.col("chance_prod").cast("double")
    return t.select(
        "n", "n_agree",
        F.when(den > 0, pround(num / den, 6))
         .otherwise(F.lit(None).cast("double")).alias("kappa"))


# =====================================================================
# categorical association / inequality
# =====================================================================

@query(
    "q_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    rm AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rn
           FROM obs GROUP BY event_type),
    cm AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS cn FROM obs GROUP BY dow),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
                 CAST(COUNT(DISTINCT dow) AS BIGINT) AS c
          FROM obs),
    chi AS (
      SELECT SUM((CAST(obs.o AS DOUBLE)
                  - CAST(rm.rn AS DOUBLE) * CAST(cm.cn AS DOUBLE)
                    / CAST(t.n AS DOUBLE))
                 * (CAST(obs.o AS DOUBLE)
                    - CAST(rm.rn AS DOUBLE) * CAST(cm.cn AS DOUBLE)
                      / CAST(t.n AS DOUBLE))
                 / (CAST(rm.rn AS DOUBLE) * CAST(cm.cn AS DOUBLE)
                    / CAST(t.n AS DOUBLE))) AS chi2
      FROM obs JOIN rm USING (event_type) JOIN cm USING (dow)
      CROSS JOIN t
    )
    SELECT t.n, t.r, t.c, ROUND(chi.chi2, 6) AS chi2,
           CASE WHEN least(t.r, t.c) >= 2
                THEN ROUND(sqrt(chi.chi2 / (CAST(t.n AS DOUBLE)
                                * CAST(least(t.r, t.c) - 1 AS DOUBLE))), 6)
                ELSE NULL END AS cramers_v
    FROM t CROSS JOIN chi
    """,
)
def q_cramers_v(spark, sf_dir):
    """Cramer's V association between event type and day-of-week — the
    EFFECT-SIZE companion to q_chi_square (chi2 grows with n, so at
    100 TB every association is 'significant'; V = sqrt(chi2/(n*
    (min(r,c)-1))) in [0,1] is the number that stays comparable across
    corpus sizes).  The contingency table and both marginals are exact
    BIGINT counts from ONE grouped pass over (type, dow) — at most
    |types|*7 cells, so the chi2 reduce is a <=35-row broadcast-scale
    computation regardless of event count; expected counts rn*cn/n are
    staged with identical IEEE ops on both engines and V carries a
    min(r,c)<2 NULL guard.  dow is UTC on both engines (Spark session
    TZ pinned UTC; Spark's Sunday=1 shifted to DuckDB's Sunday=0)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    obs = (ev.groupBy("event_type",
                      (F.dayofweek("ts") - 1).alias("dow"))
             .agg(F.count("*").cast("long").alias("o")))
    rm = obs.groupBy("event_type").agg(F.sum("o").cast("long").alias("rn"))
    cm = obs.groupBy("dow").agg(F.sum("o").cast("long").alias("cn"))
    t = obs.agg(F.sum("o").cast("long").alias("n"),
                F.countDistinct("event_type").cast("long").alias("r"),
                F.countDistinct("dow").cast("long").alias("c"))
    e = (F.col("rn").cast("double") * F.col("cn").cast("double")
         / F.col("n").cast("double"))
    cell = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    chi = (obs.join(F.broadcast(rm), "event_type")
              .join(F.broadcast(cm), "dow")
              .crossJoin(F.broadcast(t))
              .agg(F.sum(cell).alias("chi2")))
    mind = F.least(F.col("r"), F.col("c"))
    v = F.sqrt(F.col("chi2") / (F.col("n").cast("double")
                                * (mind - 1).cast("double")))
    return (t.crossJoin(F.broadcast(chi))
             .select("n", "r", "c", R6(F.col("chi2")).alias("chi2"),
                     F.when(mind >= 2, pround(v, 6))
                      .otherwise(F.lit(None).cast("double"))
                      .alias("cramers_v")))


@query(
    "q_theil_index",
    oracle="""
    WITH grid AS (
      SELECT source, CAST(n_chars AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0 AND source IS NOT NULL
      GROUP BY source, n_chars
    ),
    q AS (  -- x*ln(x) quantized to an integer 1e4 grid PER DISTINCT
            -- value, so the corpus sum is an exact BIGINT
      SELECT source, v, cnt,
             CAST(FLOOR(CAST(v AS DOUBLE) * LN(CAST(v AS DOUBLE)) * 10000
                        + 0.5) AS BIGINT) AS e
      FROM grid
    ),
    g AS (
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS ng,
             CAST(SUM(cnt * v) AS BIGINT) AS xg,
             CAST(SUM(cnt * e) AS BIGINT) AS eg
      FROM q GROUP BY source
    ),
    t AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(xg) AS BIGINT) AS x,
                 CAST(SUM(eg) AS BIGINT) AS e FROM g),
    betw AS (
      SELECT SUM((CAST(g.xg AS DOUBLE) / CAST(t.x AS DOUBLE))
                 * LN((CAST(g.xg AS DOUBLE) * CAST(t.n AS DOUBLE))
                      / (CAST(t.x AS DOUBLE) * CAST(g.ng AS DOUBLE))))
               AS tb
      FROM g CROSS JOIN t
    )
    SELECT t.n AS n_docs, t.x AS total_chars,
           ROUND(CAST(t.e AS DOUBLE) / (10000.0 * CAST(t.x AS DOUBLE))
                 - LN(CAST(t.x AS DOUBLE) / CAST(t.n AS DOUBLE)), 6)
             AS theil_total,
           ROUND(betw.tb, 6) AS theil_between,
           ROUND(CAST(t.e AS DOUBLE) / (10000.0 * CAST(t.x AS DOUBLE))
                 - LN(CAST(t.x AS DOUBLE) / CAST(t.n AS DOUBLE))
                 - betw.tb, 6) AS theil_within
    FROM t CROSS JOIN betw
    """,
)
def q_theil_index(spark, sf_dir):
    """Theil T inequality index of document length, decomposed into
    BETWEEN-source and WITHIN-source components (T = T_b + T_w, the
    additive decomposition Gini lacks) — the mixture-governance readout
    that says whether corpus length inequality comes from source mix or
    from spread inside each source.  Exactness design: x*ln(x) is
    quantized to an integer 1e4 grid once PER DISTINCT length (a 1-ulp
    ln() disagreement moves the floored integer only within 2e-8 of a
    half-integer — measure-zero), so every corpus-scale sum is an exact
    BIGINT and summation order cannot flip the hash; logs otherwise
    appear only in final per-source/per-total expressions (<= |sources|
    doubles through R6).  Plan: one (source, length) grid count, one
    per-source rollup, a broadcast 1-row total — no window, no
    wide shuffle.  Overflow bound: sum(cnt*e) <= X*ln(X)*1e4 must fit
    BIGINT -> valid to ~60 TB of text in one table; past it raise the
    grid to 1e2 (documented, both sides together)."""
    docs = load_table(spark, sf_dir, "documents")
    grid = (docs.where(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
                       & F.col("source").isNotNull())
                .groupBy("source", F.col("n_chars").cast("long").alias("v"))
                .agg(F.count("*").cast("long").alias("cnt")))
    e = F.floor(F.col("v").cast("double") * F.log(F.col("v").cast("double"))
                * 10000 + F.lit(0.5)).cast("long")
    q = grid.withColumn("e", e)
    g = q.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("ng"),
        F.sum(F.col("cnt") * F.col("v")).cast("long").alias("xg"),
        F.sum(F.col("cnt") * F.col("e")).cast("long").alias("eg"))
    t = g.agg(F.sum("ng").cast("long").alias("n"),
              F.sum("xg").cast("long").alias("x"),
              F.sum("eg").cast("long").alias("e"))
    share = F.col("xg").cast("double") / F.col("x").cast("double")
    lgarg = (F.col("xg").cast("double") * F.col("n").cast("double")) \
        / (F.col("x").cast("double") * F.col("ng").cast("double"))
    betw = (g.crossJoin(F.broadcast(t))
             .agg(F.sum(share * F.log(lgarg)).alias("tb")))
    total = (F.col("e").cast("double") / (F.lit(10000.0)
                                          * F.col("x").cast("double"))
             - F.log(F.col("x").cast("double") / F.col("n").cast("double")))
    return (t.crossJoin(F.broadcast(betw))
             .select(F.col("n").alias("n_docs"),
                     F.col("x").alias("total_chars"),
                     R6(total).alias("theil_total"),
                     R6(F.col("tb")).alias("theil_between"),
                     R6(total - F.col("tb")).alias("theil_within")))


# =====================================================================
# rank correlation / information theory / heavy-tail diagnostics
# =====================================================================

@query(
    "q_kendall_tau",
    oracle="""
    WITH ev AS (
      SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS h,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    cnt AS (SELECT event_type, h, v, CAST(COUNT(*) AS BIGINT) AS n
            FROM ev GROUP BY 1, 2, 3),
    grid AS (
      SELECT d.event_type, hh.h, d.v, COALESCE(c.n, 0) AS n
      FROM (SELECT DISTINCT event_type, v FROM ev) d
      CROSS JOIN (SELECT UNNEST(range(0, 24)) AS h) hh
      LEFT JOIN cnt c ON c.event_type = d.event_type AND c.h = hh.h
                     AND c.v = d.v
    ),
    cum AS (
      SELECT event_type, h, v, n,
             SUM(n) OVER (PARTITION BY event_type, h ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS f1,
             SUM(n) OVER (PARTITION BY event_type, h) AS nh
      FROM grid
    ),
    hcum AS (
      SELECT event_type, h, v, n,
             COALESCE(SUM(f1 - n) OVER (PARTITION BY event_type, v ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tlt,
             COALESCE(SUM(f1) OVER (PARTITION BY event_type, v ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tle,
             COALESCE(SUM(nh) OVER (PARTITION BY event_type, v ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumn
      FROM cum
    ),
    s AS (
      SELECT event_type,
             CAST(SUM(n * (tlt - (cumn - tle))) AS BIGINT) AS s
      FROM hcum GROUP BY event_type
    ),
    hstat AS (
      SELECT event_type, CAST(SUM(nh * (nh - 1) // 2) AS BIGINT) AS n1
      FROM (SELECT DISTINCT event_type, h,
                   SUM(n) OVER (PARTITION BY event_type, h) AS nh
            FROM grid) GROUP BY event_type
    ),
    vstat AS (
      SELECT event_type, CAST(SUM(mv * (mv - 1) // 2) AS BIGINT) AS n2
      FROM (SELECT event_type, v, CAST(SUM(n) AS BIGINT) AS mv
            FROM grid GROUP BY event_type, v) GROUP BY event_type
    ),
    tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev
            GROUP BY event_type)
    SELECT t.event_type, t.n, s.s,
           CAST(t.n * (t.n - 1) // 2 AS BIGINT) AS n0, h.n1, v.n2,
           CASE WHEN t.n * (t.n - 1) // 2 - h.n1 > 0
                 AND t.n * (t.n - 1) // 2 - v.n2 > 0
                THEN ROUND(CAST(s.s AS DOUBLE)
                           / (sqrt(CAST(t.n * (t.n - 1) // 2 - h.n1
                                        AS DOUBLE))
                              * sqrt(CAST(t.n * (t.n - 1) // 2 - v.n2
                                          AS DOUBLE))), 6)
                ELSE NULL END AS tau_b
    FROM tot t
    JOIN s USING (event_type)
    JOIN hstat h USING (event_type)
    JOIN vstat v USING (event_type)
    """,
)
def q_kendall_tau(spark, sf_dir):
    """Kendall tau-b rank correlation between hour-of-day and event
    value per event type — the tie-aware monotonic-association monitor
    (is value drifting with time of day?) next to q_mannwhitney_u /
    q_ks_drift, with an ALL-INTEGER concordance core.  The naive
    statistic is O(n^2) pairs; here S = C - D is computed exactly on
    the (hour x distinct-cents) dense grid with TWO partitioned
    cumulative windows (per-hour value CDF, then a cumulative across
    hours at fixed value): for each cell, concordant-below =
    T<(h-1, v-1), discordant-below = N(<h) - T<=(h-1, v) — every term
    a BIGINT, so S, n0, and both tie corrections n1/n2 are exact and
    the hash cannot flip; only tau_b = S/sqrt((n0-n1)(n0-n2)) is a
    final double (staged sqrt*sqrt so the BIGINT product never
    overflows).  Grid size is 24 x |distinct cents| — linear in the
    value domain, never in event count; both windows are partitioned
    (plan-audit-clean).  Overflow bound: S <= n^2/2 must fit BIGINT ->
    valid to ~4e9 events per type."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select("event_type", F.hour("ts").alias("h"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("v")))
    cnt = ev.groupBy("event_type", "h", "v") \
            .agg(F.count("*").cast("long").alias("n"))
    grid = (ev.select("event_type", "v").distinct()
              .withColumn("h", F.explode(F.sequence(F.lit(0), F.lit(23))))
              .join(cnt, ["event_type", "h", "v"], "left")
              .withColumn("n", F.coalesce("n", F.lit(0)).cast("long")))
    w_v = (W.partitionBy("event_type", "h").orderBy("v")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    w_h_all = W.partitionBy("event_type", "h")
    cum = (grid.withColumn("f1", F.sum("n").over(w_v))
               .withColumn("nh", F.sum("n").over(w_h_all)))
    w_h = (W.partitionBy("event_type", "v").orderBy("h")
            .rowsBetween(W.unboundedPreceding, -1))
    z = F.lit(0).cast("long")
    hcum = (cum
            .withColumn("tlt", F.coalesce(
                F.sum(F.col("f1") - F.col("n")).over(w_h), z))
            .withColumn("tle", F.coalesce(F.sum("f1").over(w_h), z))
            .withColumn("cumn", F.coalesce(F.sum("nh").over(w_h), z)))
    s = (hcum.groupBy("event_type")
             .agg(F.sum(F.col("n") * (F.col("tlt")
                                      - (F.col("cumn") - F.col("tle"))))
                   .cast("long").alias("s")))
    hstat = (cnt.groupBy("event_type", "h")
                .agg(F.sum("n").cast("long").alias("nh"))
                .groupBy("event_type")
                .agg(F.sum(F.expr("nh * (nh - 1) DIV 2")).cast("long")
                      .alias("n1")))
    vstat = (cnt.groupBy("event_type", "v")
                .agg(F.sum("n").cast("long").alias("mv"))
                .groupBy("event_type")
                .agg(F.sum(F.expr("mv * (mv - 1) DIV 2")).cast("long")
                      .alias("n2")))
    tot = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    j = (tot.join(s, "event_type").join(hstat, "event_type")
            .join(vstat, "event_type"))
    n0 = F.expr("n * (n - 1) DIV 2")
    den_x = (n0 - F.col("n1")).cast("double")
    den_y = (n0 - F.col("n2")).cast("double")
    tau = F.col("s").cast("double") / (F.sqrt(den_x) * F.sqrt(den_y))
    return j.select(
        "event_type", "n", "s", n0.cast("long").alias("n0"), "n1", "n2",
        F.when((n0 - F.col("n1") > 0) & (n0 - F.col("n2") > 0),
               pround(tau, 6))
         .otherwise(F.lit(None).cast("double")).alias("tau_b"))


@query(
    "q_jensen_shannon",
    oracle="""
    WITH toks AS (
      SELECT CASE WHEN COALESCE(lang, '') = 'en' THEN 0 ELSE 1 END AS side,
             string_split(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ',
                                              'g'), ' '), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    tk AS (
      SELECT side, u.t AS tok FROM toks, UNNEST(w) AS u(t) WHERE u.t <> ''
    ),
    c AS (
      SELECT tok,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c2
      FROM tk GROUP BY tok
    ),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c2) AS BIGINT) AS n2,
                 CAST(COUNT(*) AS BIGINT) AS v FROM c),
    js AS (
      SELECT SUM(
        CASE WHEN c.c1 > 0 THEN
          CAST(0.5 AS DOUBLE) * (CAST(c.c1 AS DOUBLE) / CAST(t.n1 AS DOUBLE))
          * LN((CAST(c.c1 AS DOUBLE) / CAST(t.n1 AS DOUBLE))
               / ((CAST(c.c1 AS DOUBLE) / CAST(t.n1 AS DOUBLE)
                   + CAST(c.c2 AS DOUBLE) / CAST(t.n2 AS DOUBLE))
                  / CAST(2 AS DOUBLE)))
        ELSE CAST(0 AS DOUBLE) END
        + CASE WHEN c.c2 > 0 THEN
          CAST(0.5 AS DOUBLE) * (CAST(c.c2 AS DOUBLE) / CAST(t.n2 AS DOUBLE))
          * LN((CAST(c.c2 AS DOUBLE) / CAST(t.n2 AS DOUBLE))
               / ((CAST(c.c1 AS DOUBLE) / CAST(t.n1 AS DOUBLE)
                   + CAST(c.c2 AS DOUBLE) / CAST(t.n2 AS DOUBLE))
                  / CAST(2 AS DOUBLE)))
        ELSE CAST(0 AS DOUBLE) END) AS js_nats
      FROM c CROSS JOIN t
    )
    SELECT t.n1 AS n_tokens_ref, t.n2 AS n_tokens_cur, t.v AS vocab,
           ROUND(js.js_nats, 6) AS js_nats,
           ROUND(js.js_nats / LN(CAST(2 AS DOUBLE)), 6) AS js_bits
    FROM t CROSS JOIN js
    """,
)
def q_jensen_shannon(spark, sf_dir):
    """Jensen-Shannon divergence between the English and non-English
    unigram distributions — the SYMMETRIC, bounded ([0, ln 2]) drift
    metric next to q_kl_unigram_drift: KL needs smoothing and explodes
    when the reference misses a token; JS is finite by construction
    (each side is compared to the mixture M = (P+Q)/2), which is why
    eval suites report JS distance for corpus shift.  Same single
    (token)-keyed count as KL with conditional side sums, a broadcast
    1-row totals join, one scalar reduce; per-term contributions are
    staged with the IDENTICAL IEEE expression both engines (0-count
    terms contribute exactly 0, not a smoothed epsilon), and the final
    nats/bits pair goes through R6 (term magnitudes <= ln 2 / |vocab|
    scale, so summation-order noise is ~1e-12 — far inside the grid)."""
    from access_mopper_spark.operators.search import tokens
    docs = _wide(load_table(spark, sf_dir, "documents"))
    tk = (docs.where(F.col("text").isNotNull())
          .select(F.when(F.coalesce(F.col("lang"), F.lit("")) == "en", 0)
                  .otherwise(1).alias("side"),
                  F.explode(tokens(F.col("text"))).alias("tok"))
          .where(F.col("tok") != ""))
    c = tk.groupBy("tok").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).cast("long")
         .alias("c1"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long")
         .alias("c2"))
    t = c.agg(F.sum("c1").cast("long").alias("n1"),
              F.sum("c2").cast("long").alias("n2"),
              F.count("*").cast("long").alias("v"))
    p = F.col("c1").cast("double") / F.col("n1").cast("double")
    q = F.col("c2").cast("double") / F.col("n2").cast("double")
    m = (p + q) / F.lit(2).cast("double")
    half = F.lit(0.5).cast("double")
    term = (F.when(F.col("c1") > 0, half * p * F.log(p / m))
             .otherwise(F.lit(0).cast("double"))
            + F.when(F.col("c2") > 0, half * q * F.log(q / m))
               .otherwise(F.lit(0).cast("double")))
    js = c.crossJoin(F.broadcast(t)).agg(F.sum(term).alias("js_nats"))
    return (t.crossJoin(F.broadcast(js))
             .select(F.col("n1").alias("n_tokens_ref"),
                     F.col("n2").alias("n_tokens_cur"),
                     F.col("v").alias("vocab"),
                     R6(F.col("js_nats")).alias("js_nats"),
                     R6(F.col("js_nats")
                        / F.log(F.lit(2).cast("double"))).alias("js_bits")))


@query(
    "q_burstiness_fano",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                              AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS q
      FROM daily GROUP BY event_type
    )
    SELECT event_type, d AS n_days, s AS n_events,
           CASE WHEN d >= 2 AND s > 0
                THEN ROUND(((CAST(q AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                               / CAST(d AS DOUBLE))
                            / CAST(d - 1 AS DOUBLE))
                           / (CAST(s AS DOUBLE) / CAST(d AS DOUBLE)), 6)
                ELSE NULL END AS fano,
           CASE WHEN d >= 2 AND s > 0
                THEN ROUND((sqrt((CAST(q AS DOUBLE)
                                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                    / CAST(d AS DOUBLE))
                                 / CAST(d - 1 AS DOUBLE))
                            - CAST(s AS DOUBLE) / CAST(d AS DOUBLE))
                           / (sqrt((CAST(q AS DOUBLE)
                                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                      / CAST(d AS DOUBLE))
                                   / CAST(d - 1 AS DOUBLE))
                              + CAST(s AS DOUBLE) / CAST(d AS DOUBLE)), 6)
                ELSE NULL END AS burstiness
    FROM m
    """,
)
def q_burstiness_fano(spark, sf_dir):
    """Burstiness of the event stream per type over observed days: the
    Fano factor (variance-to-mean ratio of daily counts; 1 = Poisson,
    >1 = overdispersed/bursty) and the Goh-Barabasi burstiness
    B = (sigma - mu)/(sigma + mu) in [-1, 1] — the ingest-planning
    readout that says whether a stream's load is smooth or spiky (spiky
    -> provision for peaks, salt hot days).  The per-day counts and
    both moments (sum, sum of squares) are exact BIGINTs from one
    (type, day) groupBy + one per-type rollup — day cardinality only,
    never event cardinality; the variance/ratio algebra runs on the
    2-row-per-type moment table with identically staged IEEE ops and
    d>=2, s>0 NULL guards."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").cast("date").alias("day"))
               .agg(F.count("*").cast("long").alias("c")))
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("d"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"))
    dd = F.col("d").cast("double")
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    var = (qd - sd * sd / dd) / (dd - F.lit(1).cast("double"))
    mean = sd / dd
    sig = F.sqrt(var)
    ok = (F.col("d") >= 2) & (F.col("s") > 0)
    return m.select(
        "event_type", F.col("d").alias("n_days"),
        F.col("s").alias("n_events"),
        F.when(ok, pround(var / mean, 6))
         .otherwise(F.lit(None).cast("double")).alias("fano"),
        F.when(ok, pround((sig - mean) / (sig + mean), 6))
         .otherwise(F.lit(None).cast("double")).alias("burstiness"))


@query(
    "q_hill_tail_index",
    oracle="""
    WITH ranked AS (
      SELECT n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    top AS (SELECT n_chars, r FROM ranked WHERE r <= 101),
    agg AS (
      SELECT CAST(MIN(CASE WHEN r = 101 THEN n_chars END) AS BIGINT)
               AS x_k1,
             SUM(CASE WHEN r <= 100
                      THEN LN(CAST(n_chars AS DOUBLE))
                      ELSE CAST(0 AS DOUBLE) END) AS sumlog,
             CAST(SUM(CASE WHEN r <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM top
    )
    SELECT k, x_k1,
           CASE WHEN x_k1 IS NOT NULL
                 AND sumlog - CAST(k AS DOUBLE)
                     * LN(CAST(x_k1 AS DOUBLE)) > 0
                THEN ROUND(CAST(k AS DOUBLE)
                           / (sumlog - CAST(k AS DOUBLE)
                              * LN(CAST(x_k1 AS DOUBLE))), 6)
                ELSE NULL END AS alpha_hill
    FROM agg
    """,
)
def q_hill_tail_index(spark, sf_dir):
    """Hill estimator of the document-length tail exponent over the
    k = 100 largest docs: alpha = k / (sum ln(x_i) - k ln(x_(k+1))) —
    the heavy-tail diagnostic that decides packing/shard policy at
    100 TB (alpha < 2 means the longest docs dominate total bytes and
    a sequence-packing stage MUST cap or split them; q_zipf_alpha fits
    token frequencies, this fits the length distribution itself).
    Scale design: the only global ordering is partial_topk's two-phase
    top-(k+1) (per-partition local top-k then a <= k*p merge — never a
    full sort; rank-pushed, plan-audit-clean); the <= 100 log terms sum
    in a broadcast-scale reduce.  Ties at the threshold are total-order
    deterministic ((n_chars DESC, doc_id)), and the estimator uses only
    the top-(k+1) VALUE multiset, which is order-invariant.  Degenerate
    guard: alpha NULL when < 101 docs or all top values equal."""
    from access_mopper_spark.operators.similarity import partial_topk
    docs = (load_table(spark, sf_dir, "documents")
            .where(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
            .select("doc_id", F.col("n_chars").cast("long").alias("n_chars")))
    top = partial_topk(docs, [],
                       [F.col("n_chars").desc(), F.col("doc_id")], 101)
    agg = top.agg(
        F.min(F.when(F.col("rank") == 101, F.col("n_chars"))).cast("long")
         .alias("x_k1"),
        F.sum(F.when(F.col("rank") <= 100,
                     F.log(F.col("n_chars").cast("double")))
               .otherwise(F.lit(0).cast("double"))).alias("sumlog"),
        F.sum(F.when(F.col("rank") <= 100, 1).otherwise(0)).cast("long")
         .alias("k"))
    den = F.col("sumlog") - F.col("k").cast("double") \
        * F.log(F.col("x_k1").cast("double"))
    return agg.select(
        "k", "x_k1",
        F.when(F.col("x_k1").isNotNull() & (den > 0),
               pround(F.col("k").cast("double") / den, 6))
         .otherwise(F.lit(None).cast("double")).alias("alpha_hill"))


# =====================================================================
# sequence statistics / link prediction / concentration curves
# =====================================================================

@query(
    "q_bigram_cond_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(trim(regexp_replace(text,
               '[ \\t\\n\\r]+', ' ', 'g'), ' '), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    big AS (
      SELECT w[g.i] AS w1, w[g.i + 1] AS w2
      FROM toks, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(w)), 1)
                                          FROM toks) + 1)) AS i) g
      WHERE g.i <= len(w) - 1 AND w[g.i] <> '' AND w[g.i + 1] <> ''
    ),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS v_big FROM c12),
    v1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_w1 FROM c1),
    h AS (
      SELECT SUM(CAST(c12.c AS DOUBLE)
                 * LN(CAST(c1.c1 AS DOUBLE) / CAST(c12.c AS DOUBLE)))
               AS hsum
      FROM c12 JOIN c1 USING (w1)
    )
    SELECT t.n AS n_bigrams, v1.v_w1 AS vocab_w1, t.v_big AS vocab_bigram,
           CASE WHEN t.n > 0
                THEN ROUND(h.hsum / CAST(t.n AS DOUBLE), 6)
                ELSE NULL END AS cond_entropy_nats,
           CASE WHEN t.n > 0
                THEN ROUND(exp(h.hsum / CAST(t.n AS DOUBLE)), 6)
                ELSE NULL END AS perplexity
    FROM t CROSS JOIN v1 CROSS JOIN h
    """,
)
def q_bigram_cond_entropy(spark, sf_dir):
    """Conditional bigram entropy H(W2|W1) = (1/N) sum c12 ln(c1/c12)
    over whitespace bigrams, plus its perplexity exp(H) — the corpus
    PREDICTABILITY scalar (low H = templated/boilerplate text, high H =
    diverse prose) that complements q_token_entropy (unigram surprise)
    and q_kneser_ney_bigram (per-sequence scoring): this is the single
    number dataset cards report as 'bigram perplexity'.  Counts c12/c1
    are exact BIGINTs from one (w1, w2) shuffle + one w1 rollup
    CO-PARTITIONED on w1 (the c12->c1 join reuses the w1 hash
    partitioning — no extra exchange); per-term log contributions are
    staged identically both engines and summed once (term noise ~1e-14
    against the 1e-6 grid), then R6.  Bigram extraction is the
    arrays_zip shifted-copy shape (functions/text.word_shingles
    rationale) — never a per-position lambda re-split."""
    from access_mopper_spark.operators.search import tokens
    docs = _wide(load_table(spark, sf_dir, "documents"))
    toks = (docs.where(F.col("text").isNotNull())
                .select(tokens(F.col("text")).alias("w")))
    n = F.size(F.col("w"))
    pairs = F.arrays_zip(F.slice(F.col("w"), 1, F.greatest(n - 1, F.lit(0))),
                         F.slice(F.col("w"), 2, F.greatest(n - 1, F.lit(0))))
    big = (toks.select(F.explode(pairs).alias("p"))
               .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
               .where((F.col("w1") != "") & (F.col("w2") != "")))
    c12 = big.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c"))
    c1 = c12.groupBy("w1").agg(F.sum("c").cast("long").alias("c1"))
    t = c12.agg(F.sum("c").cast("long").alias("n"),
                F.count("*").cast("long").alias("v_big"))
    v1 = c1.agg(F.count("*").cast("long").alias("v_w1"))
    term = F.col("c").cast("double") \
        * F.log(F.col("c1").cast("double") / F.col("c").cast("double"))
    h = c12.join(c1, "w1").agg(F.sum(term).alias("hsum"))
    j = t.crossJoin(F.broadcast(v1)).crossJoin(F.broadcast(h))
    hn = F.col("hsum") / F.col("n").cast("double")
    return j.select(
        F.col("n").alias("n_bigrams"), F.col("v_w1").alias("vocab_w1"),
        F.col("v_big").alias("vocab_bigram"),
        F.when(F.col("n") > 0, pround(hn, 6))
         .otherwise(F.lit(None).cast("double")).alias("cond_entropy_nats"),
        F.when(F.col("n") > 0, pround(F.exp(hn), 6))
         .otherwise(F.lit(None).cast("double")).alias("perplexity"))


@query(
    "q_adamic_adar",
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
    adj AS (
      SELECT a AS m, b AS nbr FROM pairs
      UNION ALL SELECT b, a FROM pairs
    ),
    mid AS (  -- deterministic middle cap: hubs contribute ~0 weight
      SELECT adj.m, adj.nbr,
             CAST(FLOOR(CAST(1000000000 AS DOUBLE)
                        / LN(CAST(deg.d AS DOUBLE)) + 0.5) AS BIGINT) AS wq
      FROM adj JOIN deg ON deg.node = adj.m
      WHERE deg.d <= 64 AND deg.d >= 2
    ),
    cand AS (
      SELECT x.nbr AS v, y.nbr AS w,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(x.wq) AS BIGINT) AS aa_e9
      FROM mid x JOIN mid y ON y.m = x.m AND x.nbr < y.nbr
      GROUP BY x.nbr, y.nbr
    ),
    nonedge AS (
      SELECT c.* FROM cand c
      LEFT JOIN pairs p ON p.a = c.v AND p.b = c.w
      WHERE p.a IS NULL
    ),
    ranked AS (
      SELECT v, w, n_common, aa_e9,
             ROW_NUMBER() OVER (ORDER BY aa_e9 DESC, v, w) AS rank
      FROM nonedge
    )
    SELECT v, w, n_common, aa_e9,
           ROUND(CAST(aa_e9 AS DOUBLE) / CAST(1000000000 AS DOUBLE), 6)
             AS aa_score,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 50
    """,
)
def q_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction over the co-purchase part graph:
    for non-adjacent pairs (v, w), score = sum over common neighbours b
    of 1/ln(deg(b)) — the classic 'which edges are missing' ranking
    (recommender candidates, dup-family closure suggestions) next to
    the descriptive graph ops (q_triangle_counts, q_local_clustering).
    Scale design: wedges fan out at the MIDDLE, so middles are capped
    at deg <= 64 — deterministic, oracle-replayed, and principled (a
    hub middle contributes 1/ln(d) -> ~0 while costing d^2 wedge rows);
    per-middle weights quantize 1e9/ln(d) to BIGINT once per node
    (1-ulp ln() flips only within 1e-8 of a half-integer), so every
    pair score is an EXACT integer sum — ordering and hash cannot flip.
    The top-50 ranking runs through partial_topk on the integer key
    (never a full sort), and the existing-edge anti-join is the same
    (a, b)-keyed shuffle the candidate groupBy already produced.
    Returns (v, w, n_common, aa_e9, aa_score, rank)."""
    from access_mopper_spark.operators.graph import wedge_pairs_arrow
    from access_mopper_spark.operators.similarity import partial_topk
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey"))
    # the edge list feeds the adjacency build (both union legs) and the
    # existing-edge anti-join — persist it eagerly or Catalyst replays
    # the basket edge build per consumer (racing-consumer rule,
    # measured 17.8 s lazy vs 6.5 s eager at sf0.1 in r12).
    pairs = copurchase_pairs(li).persist()
    pairs.count()
    # r13 (guide §4.2, verdict item 1): the wedge emit is Arrow-native.
    # One groupBy(m) collects each middle's SORTED neighbour array —
    # this single shuffle replaces the old deg aggregate + adj⋈deg join
    # + persisted `mid` table + wedge SELF-JOIN (whose build side and
    # exchange carried the full wedge multiset).  deg(m) == size(nbrs)
    # exactly (pairs are distinct), so the degree table is free, and
    # the per-middle weight wq = FLOOR(1e9/ln(d)+0.5) stays computed in
    # the JVM so the hash surface is bit-identical to the old plan.
    # The C(d,2) pair expansion runs as vectorized NumPy gathers per
    # Arrow batch (operators/graph.wedge_pairs_arrow) — the r12
    # expression-level HOF emit measured 25 s vs 7 s because
    # transform/flatten lambdas are INTERPRETED per element; the Arrow
    # kernel is the §4.2 fix (hand whole batches to native code).
    adj = (pairs.select(F.col("a").alias("m"), F.col("b").alias("nbr"))
                .unionAll(pairs.select(F.col("b").alias("m"),
                                       F.col("a").alias("nbr"))))
    d = F.size("nbrs")
    adjl = (adj.groupBy("m")
               .agg(F.array_sort(F.collect_list("nbr")).alias("nbrs"))
               .where((d >= 2) & (d <= 64))
               .select("nbrs",
                       F.floor(F.lit(1000000000).cast("double")
                               / F.log(d.cast("double")) + F.lit(0.5))
                        .cast("long").alias("wq")))
    # the grouped adjacency is node-sized and AQE coalesces its exchange
    # to a handful of partitions — which would pin the C(d,2) expansion
    # AND the wedge aggregate's map side to as many cores (measured
    # 5.3 s vs 2.1 s for emit+agg at sf0.1).  Widen before the Python
    # boundary, same rule as every CPU-bound Arrow stage (_wide).
    cand = (wedge_pairs_arrow(_wide(adjl), "nbrs", "wq")
            .groupBy("v", "w")
            .agg(F.count("*").cast("long").alias("n_common"),
                 F.sum("wq").cast("long").alias("aa_e9")))
    # existing-edge anti-join: cand is ALREADY hash-partitioned on
    # (v, w) by the aggregate, so a shuffled-hash join reuses that
    # exchange and only the (small) edge side shuffles + builds — the
    # default sort-merge plan instead SORTED the full candidate table
    # (measured +10 s of the x10 wall; the hint removes the sort, §3.1).
    # Broadcast would also avoid the sort at bench scale but does not
    # survive a corpus-sized edge set at 100 TB; shuffled-hash does.
    nonedge = cand.join(
        pairs.select(F.col("a").alias("v"), F.col("b").alias("w"))
             .hint("shuffle_hash"),
        ["v", "w"], "left_anti")
    top = partial_topk(nonedge, [],
                       [F.col("aa_e9").desc(), F.col("v"), F.col("w")], 50)
    out = top.select(
        "v", "w", "n_common", "aa_e9",
        pround(F.col("aa_e9").cast("double")
               / F.lit(1e9).cast("double"), 6).alias("aa_score"),
        F.col("rank").cast("int").alias("rank"))
    # 50-row result: materialize eagerly, release the edge cache
    return eager_release(out, pairs)


@query(
    "q_lorenz_curve",
    oracle="""
    WITH grid AS (
      SELECT CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(COUNT(*) AS BIGINT) * CAST(n_chars AS BIGINT) AS chars
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
      GROUP BY n_chars
    ),
    cum AS (
      SELECT v, cnt, chars,
             SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cd,
             SUM(chars) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc
      FROM grid
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(SUM(chars) AS BIGINT) AS x FROM grid),
    dec AS (SELECT UNNEST(range(1, 11)) AS d),
    bound AS (
      SELECT dec.d, (tot.n * dec.d) // 10 AS m,
             MIN(cum.v) AS vd
      FROM dec CROSS JOIN tot
      JOIN cum ON cum.cd >= (tot.n * dec.d) // 10
      GROUP BY dec.d, tot.n
    )
    SELECT b.d AS decile, CAST(b.m AS BIGINT) AS cum_docs,
           CAST(c.cc - c.chars + (b.m - (c.cd - c.cnt)) * c.v AS BIGINT)
             AS cum_chars,
           CAST((c.cc - c.chars + (b.m - (c.cd - c.cnt)) * c.v) * 10000
                // tot.x AS BIGINT) AS share_bp
    FROM bound b JOIN cum c ON c.v = b.vd CROSS JOIN tot
    """,
)
def q_lorenz_curve(spark, sf_dir):
    """Exact integer Lorenz curve of document length: for each decile d
    of the doc population (sorted by length ascending), the share of
    total corpus characters owned by the bottom d/10 of docs, in basis
    points — the curve behind q_gini's scalar (the mixture-governance
    plot that shows WHERE the inequality lives; Gini is its area).
    Everything is exact integer arithmetic: per-decile boundary docs
    m_d = (N*d) DIV 10, boundary value v_d = min length with
    cum_docs >= m_d, and the bottom-m_d character mass = chars strictly
    below v_d + (m_d - docs below v_d) * v_d — no interpolation
    doubles, so the hash cannot flip.  Scale design: the cumulative
    runs on the DISTINCT-length grid (domain-bounded, never corpus-
    sized) with the q_pareto_class distributed-cumsum shape — 256
    value-range buckets, a window PARTITIONED by bucket, exclusive
    prefix offsets from a broadcast <=256-row triangular join — no
    single-partition global window; the 10-row decile table broadcasts
    onto the grid for the boundary probe."""
    docs = load_table(spark, sf_dir, "documents")
    grid = (docs.where(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
                .groupBy(F.col("n_chars").cast("long").alias("v"))
                .agg(F.count("*").cast("long").alias("cnt")))
    grid = grid.withColumn("chars", F.col("cnt") * F.col("v"))
    st = grid.agg(F.max("v").alias("__mx"), F.min("v").alias("__mn"),
                  F.sum("cnt").cast("long").alias("n"),
                  F.sum("chars").cast("long").alias("x"))
    b = grid.crossJoin(F.broadcast(st)).withColumn(
        "__bk", F.least(
            ((F.col("v") - F.col("__mn")) * 256
             / (F.col("__mx") - F.col("__mn") + 1)).cast("long"),
            F.lit(255)))
    wrun = (W.partitionBy("__bk").orderBy("v")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = (b.withColumn("__rd", F.sum("cnt").over(wrun))
            .withColumn("__rc", F.sum("chars").over(wrun)))
    bt = run.groupBy("__bk").agg(F.sum("cnt").alias("__bd"),
                                 F.sum("chars").alias("__bc"))
    off = (bt.alias("a")
             .join(F.broadcast(bt.select(F.col("__bk").alias("__bk2"),
                                         F.col("__bd").alias("__bd2"),
                                         F.col("__bc").alias("__bc2"))),
                   F.col("__bk2") < F.col("a.__bk"), "left")
             .groupBy("a.__bk")
             .agg(F.sum(F.coalesce("__bd2", F.lit(0))).alias("__od"),
                  F.sum(F.coalesce("__bc2", F.lit(0))).alias("__oc")))
    cum = (run.join(F.broadcast(off), "__bk")
              .select("v", "cnt", "chars", "n", "x",
                      (F.coalesce("__od", F.lit(0)) + F.col("__rd"))
                      .alias("cd"),
                      (F.coalesce("__oc", F.lit(0)) + F.col("__rc"))
                      .alias("cc")))
    # decile boundaries as 10 conditional mins in ONE grid-sized pass
    # (r11 ADVICE: the former `cd >= m` inequality join against the
    # broadcast decile table materialized ~half the grid per decile
    # through a BroadcastNestedLoopJoin before the min collapse)
    mins = cum.groupBy("n").agg(*[
        F.min(F.when(F.col("cd") >= F.expr(f"(n * {d}) DIV 10"),
                     F.col("v"))).alias(f"vd{d}")
        for d in range(1, 11)])
    bound = (mins.select("n", F.expr(
        "stack(10, " + ", ".join(f"{d}, vd{d}" for d in range(1, 11))
        + ") AS (d, vd)"))
        .withColumn("m", F.expr("(n * d) DIV 10"))
        .drop("n"))
    out = (F.broadcast(bound).join(cum, bound["vd"] == cum["v"])
           .select(F.col("d").cast("int").alias("decile"),
                   F.col("m").cast("long").alias("cum_docs"),
                   (F.col("cc") - F.col("chars")
                    + (F.col("m") - (F.col("cd") - F.col("cnt")))
                    * F.col("v")).cast("long").alias("cum_chars"),
                   F.expr("CAST((cc - chars + (m - (cd - cnt)) * v) * 10000 "
                          "DIV x AS BIGINT)").alias("share_bp")))
    return out


# =====================================================================
# variance decomposition / sequential randomness / mixture diversity /
# autocorrelation profile
# =====================================================================

@query(
    "q_anova_oneway",
    oracle="""
    WITH ev AS (
      SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS h,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    hm AS (
      SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(cents) AS BIGINT) AS sh
      FROM ev GROUP BY event_type, h
    ),
    tm AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS q,
             CAST(COUNT(DISTINCT h) AS BIGINT) AS k
      FROM ev GROUP BY event_type
    ),
    ssb AS (
      SELECT event_type,
             SUM(CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)
                 / CAST(nh AS DOUBLE)) AS sb_raw
      FROM hm GROUP BY event_type
    )
    SELECT tm.event_type, tm.n, tm.k,
           CASE WHEN CAST(tm.q AS DOUBLE)
                     - CAST(tm.s AS DOUBLE) * CAST(tm.s AS DOUBLE)
                       / CAST(tm.n AS DOUBLE) > 0
                THEN ROUND((ssb.sb_raw - CAST(tm.s AS DOUBLE)
                            * CAST(tm.s AS DOUBLE) / CAST(tm.n AS DOUBLE))
                           / (CAST(tm.q AS DOUBLE)
                              - CAST(tm.s AS DOUBLE) * CAST(tm.s AS DOUBLE)
                                / CAST(tm.n AS DOUBLE)), 6)
                ELSE NULL END AS eta2,
           CASE WHEN tm.k >= 2 AND tm.n > tm.k
                 AND CAST(tm.q AS DOUBLE) - ssb.sb_raw > 0
                THEN ROUND(((ssb.sb_raw - CAST(tm.s AS DOUBLE)
                             * CAST(tm.s AS DOUBLE) / CAST(tm.n AS DOUBLE))
                            / CAST(tm.k - 1 AS DOUBLE))
                           / ((CAST(tm.q AS DOUBLE) - ssb.sb_raw)
                              / CAST(tm.n - tm.k AS DOUBLE)), 6)
                ELSE NULL END AS f_stat
    FROM tm JOIN ssb USING (event_type)
    """,
)
def q_anova_oneway(spark, sf_dir):
    """One-way ANOVA of event value across hour-of-day groups per
    event type: eta-squared (variance explained by the diurnal profile
    — the seasonality-STRENGTH scalar behind q_dow_seasonality's
    per-weekday indices) and the F statistic.  All moments are exact
    BIGINTs from one (type, hour) groupBy + one per-type rollup
    (<= 24 groups per type, so the SS reduction is broadcast-scale);
    SS_between = sum(sh^2/nh) - S^2/N and SS_total = Q - S^2/N are
    staged with the identical <= 24-term IEEE sums on both engines —
    the term VALUES are exact integers cast once, so cross-engine noise
    is summation order only (~1e-13 relative).  Guards: eta2 NULL when
    SS_total = 0, F NULL when k < 2 or residual df/SS degenerate.
    Overflow bound: sum(cents^2) must fit BIGINT -> valid to ~9e13
    squared-cents mass (document per-type)."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select("event_type", F.hour("ts").alias("h"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents")))
    hm = ev.groupBy("event_type", "h").agg(
        F.count("*").cast("long").alias("nh"),
        F.sum("cents").cast("long").alias("sh"))
    tm = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q"),
        F.countDistinct("h").cast("long").alias("k"))
    ssb = hm.groupBy("event_type").agg(
        F.sum(F.col("sh").cast("double") * F.col("sh").cast("double")
              / F.col("nh").cast("double")).alias("sb_raw"))
    j = tm.join(ssb, "event_type")
    corr = F.col("s").cast("double") * F.col("s").cast("double") \
        / F.col("n").cast("double")
    sst = F.col("q").cast("double") - corr
    sb = F.col("sb_raw") - corr
    ssw = F.col("q").cast("double") - F.col("sb_raw")
    fstat = (sb / (F.col("k") - 1).cast("double")) \
        / (ssw / (F.col("n") - F.col("k")).cast("double"))
    return j.select(
        "event_type", "n", "k",
        F.when(sst > 0, pround(sb / sst, 6))
         .otherwise(F.lit(None).cast("double")).alias("eta2"),
        F.when((F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0),
               pround(fstat, 6))
         .otherwise(F.lit(None).cast("double")).alias("f_stat"))


@query(
    "q_runs_test",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                              AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS tot
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    diffs AS (
      SELECT event_type, day,
             tot - LAG(tot) OVER (PARTITION BY event_type ORDER BY day)
               AS d
      FROM daily
    ),
    signs AS (
      SELECT event_type, day, CASE WHEN d > 0 THEN 1 ELSE -1 END AS sg
      FROM diffs WHERE d IS NOT NULL AND d <> 0
    ),
    flips AS (
      SELECT event_type, sg,
             CASE WHEN LAG(sg) OVER (PARTITION BY event_type ORDER BY day)
                       IS NULL THEN 1
                  WHEN sg <> LAG(sg) OVER (PARTITION BY event_type
                                           ORDER BY day) THEN 1
                  ELSE 0 END AS new_run
      FROM signs
    ),
    m AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_up,
             CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_down,
             CAST(SUM(new_run) AS BIGINT) AS runs
      FROM flips GROUP BY event_type
    )
    SELECT event_type, n_up, n_down, runs,
           CASE WHEN n_up > 0 AND n_down > 0 AND n_up + n_down >= 2
                 AND (CAST(2 AS DOUBLE) * CAST(n_up AS DOUBLE)
                      * CAST(n_down AS DOUBLE) / CAST(n_up + n_down
                                                      AS DOUBLE))
                     * (CAST(2 AS DOUBLE) * CAST(n_up AS DOUBLE)
                        * CAST(n_down AS DOUBLE) - CAST(n_up + n_down
                                                        AS DOUBLE))
                     / (CAST(n_up + n_down AS DOUBLE)
                        * CAST(n_up + n_down - 1 AS DOUBLE)) > 0
                THEN ROUND((CAST(runs AS DOUBLE)
                            - (CAST(2 AS DOUBLE) * CAST(n_up AS DOUBLE)
                               * CAST(n_down AS DOUBLE)
                               / CAST(n_up + n_down AS DOUBLE)
                               + CAST(1 AS DOUBLE)))
                           / sqrt((CAST(2 AS DOUBLE) * CAST(n_up AS DOUBLE)
                                   * CAST(n_down AS DOUBLE)
                                   / CAST(n_up + n_down AS DOUBLE))
                                  * (CAST(2 AS DOUBLE)
                                     * CAST(n_up AS DOUBLE)
                                     * CAST(n_down AS DOUBLE)
                                     - CAST(n_up + n_down AS DOUBLE))
                                  / (CAST(n_up + n_down AS DOUBLE)
                                     * CAST(n_up + n_down - 1
                                            AS DOUBLE))), 6)
                ELSE NULL END AS z_runs
    FROM m
    """,
)
def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on the sign sequence of day-over-day
    revenue changes per event type — the sequential-randomness monitor
    (too FEW runs = trending/regime-switching series, too MANY =
    oscillation) complementing q_autocorr_lag1 (linear memory) and
    q_cusum_changepoint (level shifts).  Daily totals are exact integer
    cents; signs and the run count come from two lag windows
    PARTITIONED by type over the bounded day axis (zero-diff days drop,
    documented — ties carry no direction); n_up/n_down/runs are exact
    BIGINTs and only the normal-approximation z is a final staged
    double with degenerate guards."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()))
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").cast("date").alias("day"))
               .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long")).cast("long").alias("tot")))
    w = W.partitionBy("event_type").orderBy("day")
    diffs = daily.withColumn("d", F.col("tot") - F.lag("tot").over(w))
    signs = (diffs.where(F.col("d").isNotNull() & (F.col("d") != 0))
                  .withColumn("sg", F.when(F.col("d") > 0, 1).otherwise(-1)))
    flips = signs.withColumn(
        "new_run",
        F.when(F.lag("sg").over(w).isNull(), 1)
         .when(F.col("sg") != F.lag("sg").over(w), 1).otherwise(0))
    m = flips.groupBy("event_type").agg(
        F.sum(F.when(F.col("sg") == 1, 1).otherwise(0)).cast("long")
         .alias("n_up"),
        F.sum(F.when(F.col("sg") == -1, 1).otherwise(0)).cast("long")
         .alias("n_down"),
        F.sum("new_run").cast("long").alias("runs"))
    two = F.lit(2).cast("double")
    one = F.lit(1).cast("double")
    nu = F.col("n_up").cast("double")
    nd = F.col("n_down").cast("double")
    nn = (F.col("n_up") + F.col("n_down")).cast("double")
    mu = two * nu * nd / nn + one
    var = (two * nu * nd / nn) * (two * nu * nd - nn) \
        / (nn * (nn - one))
    z = (F.col("runs").cast("double") - mu) / F.sqrt(var)
    ok = (F.col("n_up") > 0) & (F.col("n_down") > 0) \
        & (F.col("n_up") + F.col("n_down") >= 2) & (var > 0)
    return m.select("event_type", "n_up", "n_down", "runs",
                    F.when(ok, pround(z, 6))
                     .otherwise(F.lit(None).cast("double")).alias("z_runs"))


@query(
    "q_lang_diversity",
    oracle="""
    WITH c AS (
      SELECT source, COALESCE(lang, '<null>') AS lang,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents WHERE source IS NOT NULL GROUP BY 1, 2
    ),
    s AS (
      SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_langs,
             CAST(MAX(n) AS BIGINT) AS top_n
      FROM c GROUP BY source
    ),
    h AS (
      SELECT c.source,
             SUM(CAST(c.n AS DOUBLE) * LN(CAST(c.n AS DOUBLE))) AS nlogn
      FROM c GROUP BY c.source
    )
    SELECT s.source, s.n_docs, s.n_langs,
           CAST(s.top_n * 10000 // s.n_docs AS BIGINT) AS top_share_bp,
           ROUND(LN(CAST(s.n_docs AS DOUBLE))
                 - h.nlogn / CAST(s.n_docs AS DOUBLE), 6) AS entropy_nats,
           ROUND(exp(LN(CAST(s.n_docs AS DOUBLE))
                     - h.nlogn / CAST(s.n_docs AS DOUBLE)), 6)
             AS effective_langs
    FROM s JOIN h ON h.source = s.source
    """,
)
def q_lang_diversity(spark, sf_dir):
    """Language diversity per source: Shannon entropy of the lang
    distribution and its exponential (effective number of languages),
    plus the top-language share in integer basis points — the
    WITHIN-source mixture-governance readout next to
    q_hhi_concentration (which measures concentration ACROSS sources):
    a crawl that claims multilingual coverage but has effective_langs
    ~1.0 is monolingual with noise.  One (source, lang) count (NULL
    lang bucketed '<null>' both engines), a per-source rollup, entropy
    via H = ln(N) - (1/N) sum n ln n — each n ln n is computed once per
    (source, lang) cell (<= |langs| terms per source), so the double
    tail is a short identically-staged sum through R6."""
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("source").isNotNull())
    c = (docs.groupBy("source",
                      F.coalesce("lang", F.lit("<null>")).alias("lang"))
             .agg(F.count("*").cast("long").alias("n")))
    s = c.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_langs"),
        F.max("n").cast("long").alias("top_n"))
    h = c.groupBy("source").agg(
        F.sum(F.col("n").cast("double")
              * F.log(F.col("n").cast("double"))).alias("nlogn"))
    j = s.join(h, "source")
    ent = F.log(F.col("n_docs").cast("double")) \
        - F.col("nlogn") / F.col("n_docs").cast("double")
    return j.select(
        "source", "n_docs", "n_langs",
        F.expr("CAST(top_n * 10000 DIV n_docs AS BIGINT)")
         .alias("top_share_bp"),
        R6(ent).alias("entropy_nats"),
        R6(F.exp(ent)).alias("effective_langs"))


@query(
    "q_acf_multilag",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS di,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS tot
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    lags AS (SELECT UNNEST(range(1, 8)) AS lag),
    pairs AS (
      SELECT a.event_type, l.lag, a.tot AS x, b.tot AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.event_type = a.event_type
                  AND b.di = a.di + l.lag
    ),
    m AS (
      SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag, n AS n_pairs,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE)
                                     * CAST(sx AS DOUBLE))
                              * sqrt(CAST(n AS DOUBLE)
                                     * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE)
                                       * CAST(sy AS DOUBLE))), 6)
                ELSE NULL END AS acf
    FROM m
    """,
)
def q_acf_multilag(spark, sf_dir):
    """Autocorrelation profile of daily revenue per event type at lags
    1..7 (the full weekly ACF — q_autocorr_lag1 generalized): Pearson
    correlation of the (x_t, x_{t+k}) pair sets, which exposes weekly
    periodicity as a lag-7 peak.  Daily totals are exact integer cents
    at a day-index key; the 7 lag pair-sets come from ONE broadcast of
    the 7-row lag table onto the day-keyed self-join (the daily table
    is |days|x|types| rows — bounded by the time axis, never event
    count); all second moments are exact BIGINTs and r_k is the final
    staged double with sqrt*sqrt so products never overflow.  Overflow
    bound: sum(x*y) <= days*maxdaily^2 must fit BIGINT -> valid to
    ~1e8 cents/day at 1e3 days; past it move the moments to DOUBLE."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()))
    daily = (ev.groupBy("event_type",
                        F.datediff(F.date_trunc("day", "ts").cast("date"),
                                   F.lit("2000-01-01").cast("date"))
                         .cast("long").alias("di"))
               .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long")).cast("long").alias("tot")))
    lags = F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag")
    a = daily.select("event_type", "di", F.col("tot").alias("x")) \
             .withColumn("lag", F.explode(F.sequence(F.lit(1), F.lit(7))))
    b = daily.select("event_type",
                     F.col("di").alias("dib"), F.col("tot").alias("y"))
    pairs = a.join(b, (a["event_type"] == b["event_type"])
                   & (b["dib"] == a["di"] + a["lag"])) \
             .select(a["event_type"], "lag", "x", "y")
    m = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"))
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx").cast("double") \
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    vy = nd * F.col("syy").cast("double") \
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") \
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    return m.select(
        "event_type", F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.when((vx > 0) & (vy > 0),
               pround(num / (F.sqrt(vx) * F.sqrt(vy)), 6))
         .otherwise(F.lit(None).cast("double")).alias("acf"))


# =====================================================================
# eval-metric completions: PR-AUC, Brier, ECE, graph degree profile
# =====================================================================

@query(
    "q_pr_auc",
    oracle="""
    WITH scored AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS score,
             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS label
      FROM lineitem
    ),
    per_s AS (
      SELECT l_returnflag, score,
             CAST(SUM(label) AS BIGINT) AS p,
             CAST(COUNT(*) - SUM(label) AS BIGINT) AS n
      FROM scored GROUP BY l_returnflag, score
    ),
    acc AS (
      SELECT l_returnflag, score, p, n,
             SUM(p) OVER (PARTITION BY l_returnflag ORDER BY score DESC
                          ROWS UNBOUNDED PRECEDING) AS tp,
             SUM(p + n) OVER (PARTITION BY l_returnflag ORDER BY score DESC
                              ROWS UNBOUNDED PRECEDING) AS pp,
             SUM(p) OVER (PARTITION BY l_returnflag) AS pos
      FROM per_s
    )
    SELECT l_returnflag,
           CAST(MAX(pos) AS BIGINT) AS n_pos,
           CASE WHEN MAX(pos) > 0
                THEN ROUND(SUM(CAST(p AS DOUBLE) * CAST(tp AS DOUBLE)
                               / CAST(pp AS DOUBLE))
                           / CAST(MAX(pos) AS DOUBLE), 6)
                ELSE NULL END AS pr_auc
    FROM acc GROUP BY l_returnflag
    """,
)
def q_pr_auc(spark, sf_dir):
    """Average precision (step PR-AUC) per cohort on the q_auc_roc
    fixture — the eval metric that matters under class IMBALANCE, where
    ROC-AUC saturates (a filter catching 1-in-1000 bad docs can have
    0.99 ROC-AUC and useless precision): AP = sum over positives of
    precision at that positive's threshold, ties collapsed at the
    distinct-score block (each block contributes p_s * TP(s)/PP(s) at
    block-end precision — deterministic under any tie order).  Same
    plan as q_auc_roc: the corpus collapses to |distinct scores| rows
    per cohort in one map-side-combined aggregate, ONE partitioned
    cumulative window over that grid, and the per-block terms are
    identically staged doubles through R6 (<= |scores| bounded terms)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_s = (li.select("l_returnflag",
                       F.col("l_quantity").cast("long").alias("score"),
                       F.when(F.col("l_extendedprice") > 30000, 1)
                        .otherwise(0).alias("label"))
               .groupBy("l_returnflag", "score")
               .agg(F.sum("label").cast("long").alias("p"),
                    (F.count("*") - F.sum("label")).cast("long").alias("n")))
    w = (W.partitionBy("l_returnflag").orderBy(F.col("score").desc())
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wall = W.partitionBy("l_returnflag")
    acc = (per_s.withColumn("tp", F.sum("p").over(w))
                .withColumn("pp", F.sum(F.col("p") + F.col("n")).over(w))
                .withColumn("pos", F.sum("p").over(wall)))
    term = F.col("p").cast("double") * F.col("tp").cast("double") \
        / F.col("pp").cast("double")
    out = acc.groupBy("l_returnflag").agg(
        F.max("pos").cast("long").alias("n_pos"),
        F.sum(term).alias("__ap_sum"))
    return out.select(
        "l_returnflag", "n_pos",
        F.when(F.col("n_pos") > 0,
               pround(F.col("__ap_sum") / F.col("n_pos").cast("double"), 6))
         .otherwise(F.lit(None).cast("double")).alias("pr_auc"))


@query(
    "q_brier_score",
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
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((prob_bp - label * 10000)
                    * (prob_bp - label * 10000)) AS BIGINT) AS sq_e8,
           ROUND(CAST(SUM((prob_bp - label * 10000)
                          * (prob_bp - label * 10000)) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE)
                    * CAST(100000000 AS DOUBLE)), 6) AS brier
    FROM scored
    """,
)
def q_brier_score(spark, sf_dir):
    """Brier score of the synthetic calibrated predictor (the
    q_calibration_bins fixture): mean squared error between predicted
    probability and outcome — the single proper scoring rule that
    combines calibration AND sharpness (ECE alone rewards a predictor
    that always says the base rate).  EXACT integer core: predictions
    live on the basis-point grid, so each squared error
    (prob_bp - label*10000)^2 is a BIGINT in 1e-8 units and the corpus
    sum cannot flip with order; the final double is one staged division.
    One map-side-combined aggregate — no window, no join.  Overflow
    bound: n * 1e8 must fit BIGINT -> valid to 9e10 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    lane = (F.conv(F.substring(F.md5(F.concat(
        F.lit("cal:"), F.col("l_orderkey").cast("string"),
        F.lit(":"), F.col("l_linenumber").cast("string"))), 1, 8),
        16, 10).cast("long") % 10000)
    prob = (F.col("l_partkey") * 37 + F.col("l_suppkey")) % 10001
    scored = li.select(prob.alias("prob_bp"),
                       F.when(lane < prob, 1).otherwise(0).alias("label"))
    err = F.col("prob_bp") - F.col("label") * 10000
    t = scored.agg(F.count("*").cast("long").alias("n"),
                   F.sum(err * err).cast("long").alias("sq_e8"))
    return t.select(
        "n", "sq_e8",
        pround(F.col("sq_e8").cast("double")
               / (F.col("n").cast("double")
                  * F.lit(100000000).cast("double")), 6).alias("brier"))


@query(
    "q_ece_calibration",
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
    ),
    b AS (
      SELECT CAST(LEAST(prob_bp * 20 // 10000, 19) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(label) AS BIGINT) AS pos,
             CAST(SUM(prob_bp) AS BIGINT) AS sump
      FROM scored GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(nb) AS BIGINT) AS n FROM b)
    SELECT t.n, CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM(ABS(CAST(b.pos AS DOUBLE) / CAST(b.nb AS DOUBLE)
                         - CAST(b.sump AS DOUBLE)
                           / (CAST(b.nb AS DOUBLE)
                              * CAST(10000 AS DOUBLE)))
                     * CAST(b.nb AS DOUBLE)) / CAST(t.n AS DOUBLE), 6)
             AS ece,
           ROUND(MAX(ABS(CAST(b.pos AS DOUBLE) / CAST(b.nb AS DOUBLE)
                         - CAST(b.sump AS DOUBLE)
                           / (CAST(b.nb AS DOUBLE)
                              * CAST(10000 AS DOUBLE)))), 6) AS mce
    FROM b CROSS JOIN t GROUP BY t.n
    """,
)
def q_ece_calibration(spark, sf_dir):
    """Expected / maximum calibration error over 20 equal-width
    probability bins — the SCALARS on top of q_calibration_bins'
    reliability diagram (ECE = bin-weighted |accuracy - confidence|,
    MCE = its max; the numbers model cards report).  Per-bin counts,
    positives, and summed basis-point predictions are exact BIGINTs
    from one map-side-combined 20-key aggregate; |acc - conf| terms
    are identically staged doubles over <= 20 bins through R6.  The
    synthetic predictor is calibrated by construction, so ECE ~ 0 is
    the expected readout and any drift is fixture or engine skew."""
    li = load_table(spark, sf_dir, "lineitem")
    lane = (F.conv(F.substring(F.md5(F.concat(
        F.lit("cal:"), F.col("l_orderkey").cast("string"),
        F.lit(":"), F.col("l_linenumber").cast("string"))), 1, 8),
        16, 10).cast("long") % 10000)
    prob = (F.col("l_partkey") * 37 + F.col("l_suppkey")) % 10001
    scored = li.select(prob.alias("prob_bp"),
                       F.when(lane < prob, 1).otherwise(0).alias("label"))
    # integer DIV to mirror the oracle's `//` exactly (repo convention;
    # double division only coincidentally agrees on the current grid)
    b = (scored.groupBy(F.expr("least(prob_bp * 20 DIV 10000, 19)")
                         .cast("long").alias("bin"))
               .agg(F.count("*").cast("long").alias("nb"),
                    F.sum("label").cast("long").alias("pos"),
                    F.sum("prob_bp").cast("long").alias("sump")))
    t = b.agg(F.sum("nb").cast("long").alias("n"))
    gap = F.abs(F.col("pos").cast("double") / F.col("nb").cast("double")
                - F.col("sump").cast("double")
                / (F.col("nb").cast("double")
                   * F.lit(10000).cast("double")))
    out = (b.crossJoin(F.broadcast(t))
            .groupBy("n")
            .agg(F.count("*").cast("long").alias("n_bins"),
                 F.sum(gap * F.col("nb").cast("double")).alias("__e"),
                 F.max(gap).alias("__m")))
    return out.select(
        "n", "n_bins",
        pround(F.col("__e") / F.col("n").cast("double"), 6).alias("ece"),
        pround(F.col("__m"), 6).alias("mce"))


@query(
    "q_degree_distribution",
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
    )
    SELECT CAST(LENGTH(BIN(d)) - 1 AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(d) AS BIGINT) AS min_degree,
           CAST(MAX(d) AS BIGINT) AS max_degree,
           CAST(SUM(d) AS BIGINT) AS sum_degree
    FROM deg GROUP BY 1
    """,
)
def q_degree_distribution(spark, sf_dir):
    """Log2-bucketed degree histogram of the co-purchase part graph —
    the one-glance scale-free-ness profile that DECIDES the strategy
    for every downstream graph op (heavy tail -> degree orientation /
    middle caps / salting are mandatory; q_skew_metrics is the same
    probe for join keys).  Bucket = bit length of the degree (the
    q_quantile_sketch integer recipe — both engines take LENGTH(BIN(d))
    on the positive BIGINT); all outputs exact integers, one groupBy
    after the degree count."""
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
                .groupBy("node").agg(F.count("*").cast("long").alias("d")))
    return (deg.groupBy((F.length(F.bin(F.col("d"))) - 1).cast("long")
                         .alias("log2_bucket"))
               .agg(F.count("*").cast("long").alias("n_nodes"),
                    F.min("d").cast("long").alias("min_degree"),
                    F.max("d").cast("long").alias("max_degree"),
                    F.sum("d").cast("long").alias("sum_degree")))


# =====================================================================
# integer HITS / BFS hops / weighted reservoir / quota allocation
# =====================================================================

@query(
    "q_hits_bipartite",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_quantity > 25
    ),
    a1 AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS a FROM e GROUP BY p),
    h1 AS (
      SELECT e.c, CAST(SUM(a1.a) AS BIGINT) AS h
      FROM e JOIN a1 USING (p) GROUP BY e.c
    ),
    a2 AS (
      SELECT e.p, CAST(SUM(h1.h) AS BIGINT) AS a
      FROM e JOIN h1 USING (c) GROUP BY e.p
    ),
    h2 AS (
      SELECT e.c, CAST(SUM(a2.a) AS BIGINT) AS h
      FROM e JOIN a2 USING (p) GROUP BY e.c
    ),
    a3 AS (
      SELECT e.p, CAST(SUM(h2.h) AS BIGINT) AS a
      FROM e JOIN h2 USING (c) GROUP BY e.p
    ),
    ranked AS (
      SELECT p AS part, a AS authority,
             ROW_NUMBER() OVER (ORDER BY a DESC, p) AS rank
      FROM a3
    )
    SELECT part, authority, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 20
    """,
)
def q_hits_bipartite(spark, sf_dir):
    """HITS hubs-and-authorities (Kleinberg) on the bipartite
    customer -> part purchase graph, 3 iterations, INTEGER-EXACT: the
    textbook formulation normalizes each iteration (forcing noisy
    double sums); with h0 = 1 the UNNORMALIZED iterates a_k = (E'E)^k
    column sums stay BIGINT, give the identical RANKING (normalization
    is a positive scalar), and make the surface flip-proof.  Top-20
    authority parts — 'which products anchor the co-purchase web', the
    bipartite companion to q_pagerank (which ranks the projected
    graph).  Each iteration is ONE edge-keyed join + groupBy
    (map-side-combined); the edge list stays co-partitioned; ranking
    via partial_topk.  Overflow bound: a3 <= n*d^6; at d~100,
    n~1e6 still < 9e18 — document before raising iterations."""
    from access_mopper_spark.operators.similarity import partial_topk
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_custkey")
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey"))
    e = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
           .select(F.col("o_custkey").alias("c"),
                   F.col("l_partkey").alias("p"))
           .distinct().persist())
    a = e.groupBy("p").agg(F.count("*").cast("long").alias("a"))
    for _ in range(2):
        h = (e.join(a, "p").groupBy("c")
              .agg(F.sum("a").cast("long").alias("h")))
        a = (e.join(h, "c").groupBy("p")
              .agg(F.sum("h").cast("long").alias("a")))
    top = partial_topk(a, [], [F.col("a").desc(), F.col("p")], 20)
    out = top.select(F.col("p").alias("part"),
                     F.col("a").alias("authority"),
                     F.col("rank").cast("int").alias("rank"))
    # 20-row result: materialize eagerly, release the edge cache
    return eager_release(out, e)


@query(
    "q_bfs_hops",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      WHERE l1.l_quantity > 25 AND l2.l_quantity > 25
    ),
    und AS (
      SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs
    ),
    src AS (SELECT MIN(a) AS s FROM pairs),
    walk(node, hop) AS (
      SELECT s, 0 FROM src
      UNION ALL
      SELECT und.y, walk.hop + 1
      FROM walk JOIN und ON und.x = walk.node
      WHERE walk.hop < 4
    ),
    dist AS (SELECT node, CAST(MIN(hop) AS BIGINT) AS hop FROM walk
             GROUP BY node)
    SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM dist GROUP BY hop
    """,
)
def q_bfs_hops(spark, sf_dir):
    """Bounded BFS from the smallest part id over the co-purchase
    graph: hop-distance histogram for hops 0..4 — the reachability /
    small-world probe behind q_cc_large_small_star (components say WHO
    is connected; hop counts say HOW FAR, the expansion profile that
    sizes frontier joins).  Frontier iteration with a min-distance
    ledger: each round joins the CURRENT frontier (not all visited
    nodes) against the adjacency list and anti-joins the ledger — work
    per round is |frontier edges|, the textbook distributed BFS.  All
    output integers; the oracle replays via a depth-bounded recursive
    CTE with MIN(hop) dedup."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey"))
    e1 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("a"))
    e2 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("b"))
    pairs = (e1.join(e2, "l_orderkey")
               .where(F.col("a") < F.col("b"))
               .select("a", "b").distinct())
    und = (pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
                .unionAll(pairs.select(F.col("b").alias("x"),
                                       F.col("a").alias("y")))
                .persist())
    src = pairs.agg(F.min("a").alias("node")) \
               .select("node", F.lit(0).cast("long").alias("hop"))
    dist = src.persist()
    frontier = src
    caches = [und, dist]
    for k in range(1, 5):
        nxt = (frontier.join(und, frontier["node"] == und["x"])
               .select(F.col("y").alias("node"))
               .distinct()
               .join(dist.select("node"), "node", "left_anti")
               .withColumn("hop", F.lit(k).cast("long")))
        nxt = nxt.persist()
        dist = dist.unionByName(nxt).persist()
        caches.extend([nxt, dist])
        frontier = nxt
    out = dist.groupBy("hop").agg(F.count("*").cast("long")
                                   .alias("n_nodes"))
    # 5-row histogram: materialize eagerly, release all round caches
    return eager_release(out, *caches)


@query(
    "q_weighted_reservoir",
    oracle="""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             1 + ('0x' || substring(md5('wrs:' || CAST(doc_id AS VARCHAR)),
                                    1, 8))::BIGINT % 999999 AS u_e6
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    keyed AS (
      SELECT doc_id, w, u_e6,
             CAST(FLOOR(LN(CAST(u_e6 AS DOUBLE) / CAST(1000000 AS DOUBLE))
                        / CAST(w AS DOUBLE) * CAST(1000000000000 AS DOUBLE)
                        + 0.5) AS BIGINT) AS key_e12
      FROM d
    ),
    ranked AS (
      SELECT doc_id, w, key_e12,
             ROW_NUMBER() OVER (ORDER BY key_e12 DESC, doc_id) AS rank
      FROM keyed
    )
    SELECT doc_id, w, key_e12, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 50
    """,
)
def q_weighted_reservoir(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): each doc draws u from its md5 lane and
    ranks by u^(1/w) — equivalently ln(u)/w — so inclusion probability
    is proportional to weight (doc length here; quality scores in
    production).  THE one-pass distributed weighted sampler: no
    rejection loop, no global state, top-k of a per-row key.  The key
    is snapped to an integer 1e12 grid (a 1-ulp ln() disagreement moves
    the floor only within ~2e-7 of a half-integer) with doc_id
    tie-break, so the selected set is flip-proof; u comes from the
    engine-portable md5 lane (both engines compute identical digests).
    Top-50 via partial_topk — never a global sort."""
    from access_mopper_spark.operators.similarity import partial_topk
    docs = (load_table(spark, sf_dir, "documents")
            .where(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)))
    u_e6 = 1 + F.conv(F.substring(
        F.md5(F.concat(F.lit("wrs:"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 999999
    d = docs.select("doc_id", F.col("n_chars").cast("long").alias("w"),
                    u_e6.alias("u_e6"))
    key = F.floor(
        F.log(F.col("u_e6").cast("double") / F.lit(1000000).cast("double"))
        / F.col("w").cast("double") * F.lit(1e12).cast("double")
        + F.lit(0.5)).cast("long")
    keyed = d.withColumn("key_e12", key)
    top = partial_topk(keyed, [],
                       [F.col("key_e12").desc(), F.col("doc_id")], 50)
    return top.select("doc_id", "w", "key_e12",
                      F.col("rank").cast("int").alias("rank"))


@query(
    "q_largest_remainder",
    oracle="""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
      WHERE source IS NOT NULL GROUP BY source
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS k FROM c),
    q AS (
      SELECT c.source, c.n,
             (10000 * c.n) // t.tot AS base,
             (10000 * c.n) % t.tot AS rem
      FROM c CROSS JOIN t
    ),
    l AS (SELECT 10000 - CAST(SUM(base) AS BIGINT) AS leftover FROM q),
    r AS (
      SELECT source, n, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr
      FROM q
    )
    SELECT r.source, r.n AS n_docs,
           CAST(r.base + CASE WHEN r.rr <= l.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM r CROSS JOIN l
    """,
)
def q_largest_remainder(spark, sf_dir):
    """Largest-remainder (Hamilton) quota allocation: distribute a
    10,000-doc sampling budget across sources proportional to their
    counts, exactly — floor quotas first, then the leftover units go
    to the largest fractional remainders (deterministic source
    tie-break).  This is THE mixture-budgeting primitive under
    q_temperature_mixture/q_token_budget: proportional allocation that
    sums EXACTLY to the budget with all-integer arithmetic (base =
    B*n DIV total, remainder = B*n MOD total — no doubles anywhere, so
    the allocation cannot flip).  Plan: one source count, a broadcast
    1-row total, and a remainder ranking over the bounded |sources|
    axis (the q_coverage_topk bounded-axis argument); alloc sums to
    10,000 by construction."""
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("source").isNotNull())
    c = docs.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("tot"))
    q = (c.crossJoin(F.broadcast(t))
          .select("source", "n",
                  F.expr("(10000 * n) DIV tot").alias("base"),
                  F.expr("(10000 * n) % tot").alias("rem")))
    lv = q.agg((F.lit(10000) - F.sum("base")).cast("long").alias("leftover"))
    w = W.orderBy(F.col("rem").desc(), F.col("source"))
    r = q.withColumn("rr", F.row_number().over(w))
    return (r.crossJoin(F.broadcast(lv))
             .select("source", F.col("n").alias("n_docs"),
                     (F.col("base")
                      + F.when(F.col("rr") <= F.col("leftover"), 1)
                         .otherwise(0)).cast("long").alias("alloc")))


# =====================================================================
# trend / effect-size / robust-variance statistics
# =====================================================================

@query(
    "q_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS di,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.v > a.v THEN 1
                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
               AS s
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.di > a.di
      GROUP BY a.event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, v)
      GROUP BY event_type
    ),
    m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d FROM daily
          GROUP BY event_type)
    SELECT m.event_type, m.d AS n_days, s.s,
           CASE WHEN m.d >= 3
                 AND (CAST(m.d AS DOUBLE) * CAST(m.d - 1 AS DOUBLE)
                      * CAST(2 * m.d + 5 AS DOUBLE)
                      - CAST(ties.tie_term AS DOUBLE))
                     / CAST(18 AS DOUBLE) > 0
                THEN ROUND((CAST(s.s AS DOUBLE)
                            - CAST(CASE WHEN s.s > 0 THEN 1
                                        WHEN s.s < 0 THEN -1
                                        ELSE 0 END AS DOUBLE))
                           / sqrt((CAST(m.d AS DOUBLE)
                                   * CAST(m.d - 1 AS DOUBLE)
                                   * CAST(2 * m.d + 5 AS DOUBLE)
                                   - CAST(ties.tie_term AS DOUBLE))
                                  / CAST(18 AS DOUBLE)), 6)
                ELSE NULL END AS z_mk
    FROM m JOIN s USING (event_type) JOIN ties USING (event_type)
    """,
)
def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test on daily revenue per event type — THE
    standard nonparametric monotonic-trend test of the climate
    literature the reference post-processes for (no distribution
    assumption, tie-corrected variance, continuity-corrected z).
    Exactness + scale design: events reduce to ONE row per (type, day)
    first (integer cent totals), so the pairwise sign sum S runs on the
    BOUNDED day axis (D^2/2 pairs at D = days observed — hundreds, not
    events); S and the tie term sum(t(t-1)(2t+5)) are exact BIGINTs,
    var(S) and z are final staged doubles with D>=3 / var>0 NULL
    guards."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()))
    daily = (ev.groupBy("event_type",
                        F.datediff(F.date_trunc("day", "ts").cast("date"),
                                   F.lit("2000-01-01").cast("date"))
                         .cast("long").alias("di"))
               .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long")).cast("long").alias("v")))
    a = daily.select("event_type", F.col("di").alias("dia"),
                     F.col("v").alias("va"))
    b = daily.select("event_type", F.col("di").alias("dib"),
                     F.col("v").alias("vb"))
    s = (a.join(b, "event_type")
          .where(F.col("dib") > F.col("dia"))
          .groupBy("event_type")
          .agg(F.sum(F.when(F.col("vb") > F.col("va"), 1)
                      .when(F.col("vb") < F.col("va"), -1)
                      .otherwise(0)).cast("long").alias("s")))
    ties = (daily.groupBy("event_type", "v")
                 .agg(F.count("*").cast("long").alias("t"))
                 .groupBy("event_type")
                 .agg(F.sum(F.col("t") * (F.col("t") - 1)
                            * (2 * F.col("t") + 5)).cast("long")
                       .alias("tie_term")))
    m = daily.groupBy("event_type").agg(F.count("*").cast("long").alias("d"))
    j = m.join(s, "event_type").join(ties, "event_type")
    dd = F.col("d").cast("double")
    var = (dd * (dd - 1) * (2 * dd + 5)
           - F.col("tie_term").cast("double")) / F.lit(18).cast("double")
    cc = F.when(F.col("s") > 0, 1).when(F.col("s") < 0, -1).otherwise(0)
    z = (F.col("s").cast("double") - cc.cast("double")) / F.sqrt(var)
    return j.select(
        "event_type", F.col("d").alias("n_days"), "s",
        F.when((F.col("d") >= 3) & (var > 0), pround(z, 6))
         .otherwise(F.lit(None).cast("double")).alias("z_mk"))


@query(
    "q_sen_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS di,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             CAST(FLOOR(CAST(b.v - a.v AS DOUBLE) * 10000
                        / CAST(b.di - a.di AS DOUBLE) + 0.5) AS BIGINT)
               AS sl_e4
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.di > a.di
    ),
    grid AS (
      SELECT event_type, sl_e4, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM slopes GROUP BY event_type, sl_e4
    ),
    cum AS (
      SELECT event_type, sl_e4, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY sl_e4
                            ROWS UNBOUNDED PRECEDING) AS c,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM grid
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_pairs,
           CAST(MIN(CASE WHEN 2 * c >= n THEN sl_e4 END) AS BIGINT)
             AS sen_slope_e4,
           ROUND(CAST(MIN(CASE WHEN 2 * c >= n THEN sl_e4 END)
                      AS DOUBLE) / CAST(10000 AS DOUBLE), 6) AS sen_slope
    FROM cum GROUP BY event_type
    """,
)
def q_sen_slope(spark, sf_dir):
    """Theil-Sen slope of daily revenue per event type: the LOWER MEDIAN
    of all pairwise slopes (v_j - v_i)/(d_j - d_i) — the robust trend
    magnitude the Mann-Kendall test (q_mann_kendall) pairs with in
    every climate trend report (a single outlier day moves OLS slope
    arbitrarily; it moves Sen's slope not at all).  Pairs live on the
    BOUNDED day axis after the daily reduction; each slope is snapped
    once to an integer 1e-4-cent grid (one staged division + floor per
    pair — a 1-ulp disagreement flips the floor only within ~1e-11 of
    a half-integer), so the median selection is an exact integer
    cumulative-count pick (2c >= n, the lower median), never a double comparison.  One
    partitioned cumulative window over the slope-value grid."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()))
    daily = (ev.groupBy("event_type",
                        F.datediff(F.date_trunc("day", "ts").cast("date"),
                                   F.lit("2000-01-01").cast("date"))
                         .cast("long").alias("di"))
               .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long")).cast("long").alias("v")))
    a = daily.select("event_type", F.col("di").alias("dia"),
                     F.col("v").alias("va"))
    b = daily.select("event_type", F.col("di").alias("dib"),
                     F.col("v").alias("vb"))
    sl = F.floor((F.col("vb") - F.col("va")).cast("double") * 10000
                 / (F.col("dib") - F.col("dia")).cast("double")
                 + F.lit(0.5)).cast("long")
    slopes = (a.join(b, "event_type")
               .where(F.col("dib") > F.col("dia"))
               .select("event_type", sl.alias("sl_e4")))
    grid = slopes.groupBy("event_type", "sl_e4") \
                 .agg(F.count("*").cast("long").alias("cnt"))
    w = (W.partitionBy("event_type").orderBy("sl_e4")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wall = W.partitionBy("event_type")
    cum = (grid.withColumn("c", F.sum("cnt").over(w))
               .withColumn("n", F.sum("cnt").over(wall)))
    med = F.min(F.when(2 * F.col("c") >= F.col("n"), F.col("sl_e4")))
    return (cum.groupBy("event_type")
               .agg(F.max("n").cast("long").alias("n_pairs"),
                    med.cast("long").alias("sen_slope_e4"))
               .select("event_type", "n_pairs", "sen_slope_e4",
                       pround(F.col("sen_slope_e4").cast("double")
                              / F.lit(10000).cast("double"), 6)
                       .alias("sen_slope")))


@query(
    "q_cohens_d",
    oracle="""
    WITH c AS (
      SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        AND c_acctbal IS NOT NULL
    ),
    m AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS q
      FROM c GROUP BY g
    ),
    w AS (
      SELECT MAX(CASE WHEN g = 1 THEN n END) AS n1,
             MAX(CASE WHEN g = 0 THEN n END) AS n2,
             MAX(CASE WHEN g = 1 THEN s END) AS s1,
             MAX(CASE WHEN g = 0 THEN s END) AS s2,
             MAX(CASE WHEN g = 1 THEN q END) AS q1,
             MAX(CASE WHEN g = 0 THEN q END) AS q2
      FROM m
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CASE WHEN n1 >= 2 AND n2 >= 2 AND
                ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                  * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                 + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)
                    * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                / CAST(n1 + n2 - 2 AS DOUBLE) > 0
                THEN ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                            - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                           / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                                    * CAST(s1 AS DOUBLE)
                                    / CAST(n1 AS DOUBLE))
                                   + (CAST(q2 AS DOUBLE)
                                      - CAST(s2 AS DOUBLE)
                                        * CAST(s2 AS DOUBLE)
                                        / CAST(n2 AS DOUBLE)))
                                  / CAST(n1 + n2 - 2 AS DOUBLE))
                           , 6)
                ELSE NULL END AS cohens_d,
           CASE WHEN n1 >= 2 AND n2 >= 2 AND
                ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                  * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                 + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)
                    * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                / CAST(n1 + n2 - 2 AS DOUBLE) > 0
                THEN ROUND(((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                             - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                            / sqrt(((CAST(q1 AS DOUBLE)
                                     - CAST(s1 AS DOUBLE)
                                       * CAST(s1 AS DOUBLE)
                                       / CAST(n1 AS DOUBLE))
                                    + (CAST(q2 AS DOUBLE)
                                       - CAST(s2 AS DOUBLE)
                                         * CAST(s2 AS DOUBLE)
                                         / CAST(n2 AS DOUBLE)))
                                   / CAST(n1 + n2 - 2 AS DOUBLE)))
                           * (CAST(1 AS DOUBLE)
                              - CAST(3 AS DOUBLE)
                                / (CAST(4 AS DOUBLE)
                                   * CAST(n1 + n2 AS DOUBLE)
                                   - CAST(9 AS DOUBLE))), 6)
                ELSE NULL END AS hedges_g
    FROM w
    """,
)
def q_cohens_d(spark, sf_dir):
    """Cohen's d and Hedges' g standardized mean difference between the
    BUILDING and MACHINERY account-balance distributions — the EFFECT
    SIZE the q_ab_ttest/q_mannwhitney_u significance tests need next to
    them (at 100 TB everything is 'significant'; d says whether the
    difference is 0.02 sd or 0.8 sd, and g corrects d's small-sample
    bias).  All moments are exact BIGINT cent sums from one 2-group
    aggregate; d = (m1-m2)/s_pooled and g = d(1 - 3/(4n-9)) are final
    staged doubles with n>=2 / s_pooled>0 NULL guards.  The cents unit
    cancels in the d ratio, so the statistic is unit-free."""
    c = (load_table(spark, sf_dir, "customer")
         .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
                & F.col("c_acctbal").isNotNull())
         .select(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
                  .alias("g"),
                 F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
                  .alias("cents")))
    m = c.groupBy("g").agg(F.count("*").cast("long").alias("n"),
                           F.sum("cents").cast("long").alias("s"),
                           F.sum(F.col("cents") * F.col("cents"))
                            .cast("long").alias("q"))
    w = m.agg(
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("g") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("g") == 0, F.col("s"))).alias("s2"),
        F.max(F.when(F.col("g") == 1, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("g") == 0, F.col("q"))).alias("q2"))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    ss1 = F.col("q1").cast("double") - F.col("s1").cast("double") \
        * F.col("s1").cast("double") / n1d
    ss2 = F.col("q2").cast("double") - F.col("s2").cast("double") \
        * F.col("s2").cast("double") / n2d
    sp2 = (ss1 + ss2) / (F.col("n1") + F.col("n2") - 2).cast("double")
    d = ((F.col("s1").cast("double") / n1d
          - F.col("s2").cast("double") / n2d) / F.sqrt(sp2))
    g = d * (F.lit(1).cast("double")
              - F.lit(3).cast("double")
              / (F.lit(4).cast("double")
                 * (F.col("n1") + F.col("n2")).cast("double")
                 - F.lit(9).cast("double")))
    ok = (F.col("n1") >= 2) & (F.col("n2") >= 2) & (sp2 > 0)
    return w.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.when(ok, pround(d, 6))
         .otherwise(F.lit(None).cast("double")).alias("cohens_d"),
        F.when(ok, pround(g, 6))
         .otherwise(F.lit(None).cast("double")).alias("hedges_g"))


@query(
    "q_levene_bf",
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
    med AS (
      SELECT event_type,
             CAST(MIN(CASE WHEN 2 * c >= tot THEN cents END) AS BIGINT)
               AS med
      FROM cum GROUP BY event_type
    ),
    z AS (
      SELECT ev.event_type, ABS(ev.cents - med.med) AS z
      FROM ev JOIN med USING (event_type)
    ),
    gm AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(z) AS BIGINT) AS sg, CAST(SUM(z * z) AS BIGINT) AS qg
      FROM z GROUP BY event_type
    ),
    t AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
                 CAST(SUM(qg) AS BIGINT) AS q,
                 CAST(COUNT(*) AS BIGINT) AS k FROM gm),
    sb AS (
      SELECT SUM(CAST(gm.sg AS DOUBLE) * CAST(gm.sg AS DOUBLE)
                 / CAST(gm.ng AS DOUBLE)) AS sb_raw
      FROM gm
    )
    SELECT t.n, t.k,
           CASE WHEN t.k >= 2 AND t.n > t.k
                 AND CAST(t.q AS DOUBLE) - sb.sb_raw > 0
                THEN ROUND(((sb.sb_raw - CAST(t.s AS DOUBLE)
                             * CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                            / CAST(t.k - 1 AS DOUBLE))
                           / ((CAST(t.q AS DOUBLE) - sb.sb_raw)
                              / CAST(t.n - t.k AS DOUBLE)), 6)
                ELSE NULL END AS f_bf
    FROM t CROSS JOIN sb
    """,
)
def q_levene_bf(spark, sf_dir):
    """Brown-Forsythe (median-centered Levene) test of variance
    homogeneity across event types — the guard that belongs BEFORE
    q_ab_ttest/q_anova_oneway (both assume comparable spreads; BF is
    the robust check that doesn't itself break on heavy tails, which
    is why it's the default in statsmodels/R).  Structure: exact
    integer per-type MEDIANS from the (type, cents) grid cumulative
    (2c >= tot, the lower median), then z = |cents - median| is INTEGER,
    so every ANOVA moment on z (sums, squares) is an exact BIGINT and
    only the final F is a staged double.  Two grid windows + two
    grouped aggregates; nothing scales with event count beyond the
    map-side combine."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents")))
    pv = ev.groupBy("event_type", "cents") \
           .agg(F.count("*").cast("long").alias("n"))
    w = (W.partitionBy("event_type").orderBy("cents")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wall = W.partitionBy("event_type")
    cum = (pv.withColumn("c", F.sum("n").over(w))
             .withColumn("tot", F.sum("n").over(wall)))
    med = (cum.groupBy("event_type")
              .agg(F.min(F.when(2 * F.col("c") >= F.col("tot"),
                                F.col("cents"))).cast("long").alias("med")))
    z = (ev.join(F.broadcast(med), "event_type")
           .select("event_type",
                   F.abs(F.col("cents") - F.col("med")).alias("z")))
    gm = z.groupBy("event_type").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("z").cast("long").alias("sg"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("qg"))
    t = gm.agg(F.sum("ng").cast("long").alias("n"),
               F.sum("sg").cast("long").alias("s"),
               F.sum("qg").cast("long").alias("q"),
               F.count("*").cast("long").alias("k"))
    sb = gm.agg(F.sum(F.col("sg").cast("double") * F.col("sg").cast("double")
                      / F.col("ng").cast("double")).alias("sb_raw"))
    j = t.crossJoin(F.broadcast(sb))
    corr = F.col("s").cast("double") * F.col("s").cast("double") \
        / F.col("n").cast("double")
    ssb = F.col("sb_raw") - corr
    ssw = F.col("q").cast("double") - F.col("sb_raw")
    fstat = (ssb / (F.col("k") - 1).cast("double")) \
        / (ssw / (F.col("n") - F.col("k")).cast("double"))
    return j.select(
        "n", "k",
        F.when((F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0),
               pround(fstat, 6))
         .otherwise(F.lit(None).cast("double")).alias("f_bf"))
