"""Round-12 operator additions: confidence intervals for rates,
pooled-rank correlation and k-group rank tests, multiple-testing
control, and pairwise-preference strength fitting — the experimentation
/ preference-data layer of the training-data pipeline.

Each row follows the registry conventions (queries/_core.py): exact
BIGINT rank/moment cores built on distinct-value grids (never raw-row
windows — cumulatives run through operators/prefix.bucketed_prefix),
transcendental-free double surfaces wherever possible (rational
p-proxies, sqrt-only intervals: +,-,*,/,sqrt are IEEE-exact on both
engines so the bits agree with no quantization argument needed), R6 on
final doubles, fuzz + TZ gates before any driver exposure.
"""

from __future__ import annotations

from access_mopper_spark.queries._core import (  # noqa: F401
    F, W, query, R6, _wide, eager_release, load_table, pround)
from access_mopper_spark.operators.prefix import bucketed_prefix


# =====================================================================
# rate confidence intervals
# =====================================================================

@query(
    "q_wilson_interval",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN cents >= 5000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM e GROUP BY event_type
    ),
    w AS (
      SELECT event_type, n, s, CAST(s * 10000 // n AS BIGINT) AS rate_bp,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
             CAST(n AS DOUBLE) AS nd, CAST(1.96 AS DOUBLE) AS z
      FROM g
    ),
    m AS (
      SELECT event_type, n, s, rate_bp,
             ph + (z * z) / (CAST(2 AS DOUBLE) * nd) AS center,
             CAST(1 AS DOUBLE) + (z * z) / nd AS denom,
             z * SQRT(ph * (CAST(1 AS DOUBLE) - ph) / nd
                      + (z * z) / (CAST(4 AS DOUBLE) * nd * nd)) AS marg
      FROM w
    )
    SELECT event_type, n, s, rate_bp,
           ROUND((center - marg) / denom, 6) AS wilson_lo,
           ROUND((center + marg) / denom, 6) AS wilson_hi
    FROM m
    """,
)
def q_wilson_interval(spark, sf_dir):
    """Wilson score interval (95%) for per-event-type success rates
    (success = value >= $50): the interval that stays inside [0,1] and
    behaves at small n — the per-slice rate readout an eval dashboard
    ships instead of the naive +-1.96*sqrt(pq/n) (reference surface:
    per-variable QC pass-rate summaries).  The core (n, s, rate_bp) is
    exact integer; the bounds use only +,-,*,/,sqrt from the integer
    core — every operation is IEEE-correctly-rounded, so both engines
    produce bit-identical doubles with no quantization argument needed,
    then R6.  One groupBy, 5 output rows; broadcast-free."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents")))
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("cents") >= 5000, 1).otherwise(0)).cast("long")
         .alias("s"))
    nd = F.col("n").cast("double")
    z = F.lit(1.96)
    ph = F.col("s").cast("double") / nd
    center = ph + (z * z) / (F.lit(2.0) * nd)
    denom = F.lit(1.0) + (z * z) / nd
    marg = z * F.sqrt(ph * (F.lit(1.0) - ph) / nd
                      + (z * z) / (F.lit(4.0) * nd * nd))
    return g.select(
        "event_type", "n", "s",
        F.expr("s * 10000 DIV n").alias("rate_bp"),
        pround((center - marg) / denom, 6).alias("wilson_lo"),
        pround((center + marg) / denom, 6).alias("wilson_hi"))


# =====================================================================
# pooled-rank correlation / k-group rank tests
# =====================================================================

@query(
    "q_spearman_rho",
    oracle="""
    WITH ev AS (
      SELECT hour(CAST(ts AS TIMESTAMP)) AS h,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    cell AS (
      SELECT h, c, CAST(COUNT(*) AS BIGINT) AS n_hc FROM ev GROUP BY h, c
    ),
    gh AS (SELECT h, CAST(SUM(n_hc) AS BIGINT) AS cnt FROM cell GROUP BY h),
    gc AS (SELECT c, CAST(SUM(n_hc) AS BIGINT) AS cnt FROM cell GROUP BY c),
    ghr AS (
      SELECT h, cnt,
             CAST(2 * SUM(cnt) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING)
                  - cnt + 1 AS BIGINT) AS r2
      FROM gh
    ),
    gcr AS (
      SELECT c, cnt,
             CAST(2 * SUM(cnt) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                  - cnt + 1 AS BIGINT) AS r2
      FROM gc
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
    core AS (
      SELECT CAST(SUM(cell.n_hc * (ghr.r2 - (tot.n + 1))
                               * (gcr.r2 - (tot.n + 1))) AS BIGINT) AS sxy
      FROM cell JOIN ghr USING (h) JOIN gcr USING (c) CROSS JOIN tot
    ),
    vx AS (
      SELECT CAST(SUM(cnt * (r2 - (tot.n + 1)) * (r2 - (tot.n + 1)))
                  AS BIGINT) AS sxx
      FROM ghr CROSS JOIN tot
    ),
    vy AS (
      SELECT CAST(SUM(cnt * (r2 - (tot.n + 1)) * (r2 - (tot.n + 1)))
                  AS BIGINT) AS syy
      FROM gcr CROSS JOIN tot
    )
    SELECT tot.n AS n, core.sxy AS sxy, vx.sxx AS sxx, vy.syy AS syy,
           CASE WHEN vx.sxx > 0 AND vy.syy > 0
                THEN ROUND(CAST(core.sxy AS DOUBLE)
                           / (SQRT(CAST(vx.sxx AS DOUBLE))
                              * SQRT(CAST(vy.syy AS DOUBLE))), 6)
                ELSE NULL END AS rho
    FROM core CROSS JOIN vx CROSS JOIN vy CROSS JOIN tot
    """,
)
def q_spearman_rho(spark, sf_dir):
    """Spearman rank correlation (tie-corrected = Pearson on midranks)
    between hour-of-day and event value — 'does the metric drift across
    the day', the monotone companion to q_kendall_tau's concordance
    surface and q_autocorr_lag1's linear one.  Midranks with ties are
    half-integers, so DOUBLED ranks r2 = 2*cum_count - count + 1 keep
    the whole core in exact BIGINTs: sxy/sxx/syy are centered second
    moments of (r2x, r2y) under cell weights, order-free integer sums —
    the hash cannot flip; rho divides once through sqrt*sqrt (IEEE-exact
    from integer inputs) with R6.  Scale: raw events reduce to the
    (hour x distinct-cents) grid FIRST; both rank cumulatives run
    through operators/prefix.bucketed_prefix (bucket-partitioned window
    + broadcast triangular offsets — never a single-reducer global
    window over the value grid).  Overflow bound: |sxy| <= n^3 -> valid
    to n ~ 2e6 rows (documented, same convention as q_hits_bipartite).
    """
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select(F.hour("ts").alias("h"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("c")))
    cell = ev.groupBy("h", "c").agg(F.count("*").cast("long").alias("n_hc"))
    gh = cell.groupBy("h").agg(F.sum("n_hc").cast("long").alias("cnt"))
    gc = cell.groupBy("c").agg(F.sum("n_hc").cast("long").alias("cnt"))
    ghr = bucketed_prefix(gh, "h", ["cnt"]).select(
        "h", "cnt", (2 * F.col("cum_cnt") - F.col("cnt") + 1).alias("r2"))
    gcr = bucketed_prefix(gc, "c", ["cnt"]).select(
        "c", "cnt", (2 * F.col("cum_cnt") - F.col("cnt") + 1).alias("r2"))
    tot = ev.agg(F.count("*").cast("long").alias("n"))
    core = (cell
            .join(ghr.select("h", F.col("r2").alias("r2x")), "h")
            .join(gcr.select("c", F.col("r2").alias("r2y")), "c")
            .crossJoin(F.broadcast(tot))
            .agg(F.sum(F.col("n_hc") * (F.col("r2x") - (F.col("n") + 1))
                       * (F.col("r2y") - (F.col("n") + 1)))
                  .cast("long").alias("sxy")))
    vx = (ghr.crossJoin(F.broadcast(tot))
          .agg(F.sum(F.col("cnt") * (F.col("r2") - (F.col("n") + 1))
                     * (F.col("r2") - (F.col("n") + 1)))
                .cast("long").alias("sxx")))
    vy = (gcr.crossJoin(F.broadcast(tot))
          .agg(F.sum(F.col("cnt") * (F.col("r2") - (F.col("n") + 1))
                     * (F.col("r2") - (F.col("n") + 1)))
                .cast("long").alias("syy")))
    out = (core.crossJoin(F.broadcast(vx)).crossJoin(F.broadcast(vy))
               .crossJoin(F.broadcast(tot)))
    rho = (F.col("sxy").cast("double")
           / (F.sqrt(F.col("sxx").cast("double"))
              * F.sqrt(F.col("syy").cast("double"))))
    return out.select(
        "n", "sxy", "sxx", "syy",
        F.when((F.col("sxx") > 0) & (F.col("syy") > 0),
               pround(rho, 6)).otherwise(F.lit(None).cast("double"))
         .alias("rho"))


@query(
    "q_kruskal_wallis",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    gc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY c),
    gcr AS (
      SELECT c, cnt,
             CAST(2 * SUM(cnt) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                  - cnt + 1 AS BIGINT) AS r2
      FROM gc
    ),
    tc AS (
      SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS n_tc
      FROM ev GROUP BY event_type, c
    ),
    per AS (
      SELECT tc.event_type, CAST(SUM(tc.n_tc) AS BIGINT) AS n_t,
             CAST(SUM(tc.n_tc * gcr.r2) AS BIGINT) AS r2_sum
      FROM tc JOIN gcr USING (c) GROUP BY tc.event_type
    ),
    tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST((SUM(n_t) + 1) * 10000 // (2 * SUM(n_t))
                        AS BIGINT) AS c_bp
            FROM per),
    bp AS (
      SELECT event_type, n_t, r2_sum,
             CAST(r2_sum * 10000 // (2 * n_t * tot.n) AS BIGINT) AS rbar_bp,
             tot.c_bp AS c_bp
      FROM per CROSS JOIN tot
    ),
    s AS (
      SELECT CAST(SUM(n_t * (rbar_bp - c_bp) * (rbar_bp - c_bp))
                  AS BIGINT) AS s2
      FROM bp
    )
    SELECT bp.event_type, bp.n_t, bp.r2_sum, bp.rbar_bp,
           CAST(tot.k AS BIGINT) AS n_groups,
           ROUND(CAST(12 AS DOUBLE) * CAST(tot.n AS DOUBLE)
                 * CAST(s.s2 AS DOUBLE)
                 / (CAST(tot.n + 1 AS DOUBLE) * CAST(100000000 AS DOUBLE)),
                 6) AS h_quant
    FROM bp CROSS JOIN tot CROSS JOIN s
    """,
)
def q_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis k-group rank test of event value across event
    types — the k-sample extension of q_mannwhitney_u (is ANY type's
    value distribution shifted?), the nonparametric sibling of
    q_anova_oneway.  Pooled midranks with ties use the DOUBLED-rank
    trick (r2 = 2*cum - cnt + 1, exact BIGINT); each group's rank mass
    R2_t = sum(n_tc * r2) and count n_t are exact integer sums.  The
    surface quantizes each group's normalized mean rank to basis points
    of n (rbar_bp = R2_t*1e4 DIV (2*n_t*n)) and centers at the exact
    null expectation c_bp = (n+1)*1e4 DIV (2n), so the between-group
    sum S = sum n_t*(rbar_bp-c_bp)^2 stays BIGINT and vanishes exactly
    for identical groups; h_quant = 12*n*S/((n+1)*1e8) is H from the
    bp-quantized mean ranks, no tie-variance correction (the midranks
    already carry ties); the exact integer cores are the primary
    columns.  Scale: reduces to the
    distinct-cents grid first; the global rank cumulative runs through
    bucketed_prefix (never a single-reducer window); per-group rollup
    is one shuffle on (type, cents) then type."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("c")))
    gc = ev.groupBy("c").agg(F.count("*").cast("long").alias("cnt"))
    gcr = bucketed_prefix(gc, "c", ["cnt"]).select(
        "c", (2 * F.col("cum_cnt") - F.col("cnt") + 1).alias("r2"))
    tc = ev.groupBy("event_type", "c").agg(
        F.count("*").cast("long").alias("n_tc"))
    per = (tc.join(gcr, "c")
             .groupBy("event_type")
             .agg(F.sum("n_tc").cast("long").alias("n_t"),
                  F.sum(F.col("n_tc") * F.col("r2")).cast("long")
                   .alias("r2_sum")))
    tot = (per.agg(F.sum("n_t").cast("long").alias("n"),
                   F.count("*").cast("long").alias("k"))
              .withColumn("c_bp",
                          F.expr("(n + 1) * 10000 DIV (2 * n)")))
    bp = (per.crossJoin(F.broadcast(tot))
             .withColumn("rbar_bp",
                         F.expr("r2_sum * 10000 DIV (2 * n_t * n)")))
    s = bp.agg(F.sum(F.col("n_t") * (F.col("rbar_bp") - F.col("c_bp"))
                     * (F.col("rbar_bp") - F.col("c_bp")))
                .cast("long").alias("s2"))
    h = (F.lit(12.0) * F.col("n").cast("double") * F.col("s2").cast("double")
         / ((F.col("n") + 1).cast("double") * F.lit(1e8)))
    return (bp.crossJoin(F.broadcast(s))
              .select("event_type", "n_t", "r2_sum", "rbar_bp",
                      F.col("k").cast("long").alias("n_groups"),
                      pround(h, 6).alias("h_quant")))


# =====================================================================
# multiple-testing control
# =====================================================================

@query(
    "q_benjamini_hochberg",
    oracle="""
    WITH ev AS (
      SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS h,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
    ),
    cellt AS (
      SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(cents) AS BIGINT) AS s_i
      FROM ev GROUP BY event_type, h
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS ss
      FROM ev
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM cellt),
    p AS (
      SELECT event_type, h, n_i,
             CASE WHEN CAST(g.ss AS DOUBLE) / CAST(g.n AS DOUBLE)
                       - (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
                         * (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)) > 0
                  THEN CAST(FLOOR(CAST(1 AS DOUBLE)
                       / (CAST(1 AS DOUBLE) + CAST(n_i AS DOUBLE)
                          * (CAST(s_i AS DOUBLE) / CAST(n_i AS DOUBLE)
                             - CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
                          * (CAST(s_i AS DOUBLE) / CAST(n_i AS DOUBLE)
                             - CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
                          / (CAST(g.ss AS DOUBLE) / CAST(g.n AS DOUBLE)
                             - (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
                               * (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))))
                       * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       AS BIGINT)
                  ELSE CAST(1000000000 AS BIGINT) END AS p_e9
      FROM cellt CROSS JOIN g
    ),
    r AS (
      SELECT event_type, h, n_i, p_e9,
             CAST(ROW_NUMBER() OVER (ORDER BY p_e9, event_type, h)
                  AS BIGINT) AS rank
      FROM p
    ),
    kmax AS (
      SELECT MAX(CASE WHEN r.p_e9 * m.m <= r.rank * 50000000
                      THEN r.rank ELSE NULL END) AS km
      FROM r CROSS JOIN m
    )
    SELECT r.event_type, r.h, r.n_i, r.p_e9, r.rank,
           COALESCE(r.rank <= kmax.km, FALSE) AS rejected
    FROM r CROSS JOIN kmax
    """,
)
def q_benjamini_hochberg(spark, sf_dir):
    """Benjamini-Hochberg FDR control (alpha = 0.05) over the
    (event_type x hour) grid of 'is this cell's mean value shifted from
    the global mean' tests — the multiple-testing layer every
    slice-scan dashboard needs on top of per-cell statistics
    (q_anova_oneway says whether hours matter; BH says WHICH cells
    survive 120 simultaneous looks).  The per-cell score is a rational
    p-proxy p = 1/(1 + z^2) with z^2 = n_i*(mean_i - mean)^2/var — a
    monotone transform of |z| built from exact integer moments with
    only +,-,*,/ (IEEE-exact both engines, bit-identical doubles), then
    snapped to an exact p_e9 integer; the BH step compare
    p_(k) <= (k/m)*alpha runs entirely in BIGINT cross-multiplication
    (p_e9 * m <= k * 5e7).  The rank window is over the
    |event_types| x 24 cell grid — domain-bounded (120 rows), on the
    plan-audit axis allowlist like q_coverage_topk's source grid.
    Rejected set = ranks <= argmax passing rank (the step-up rule)."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("event_type").isNotNull())
          .select("event_type", F.hour("ts").alias("h"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents")))
    cellt = ev.groupBy("event_type", "h").agg(
        F.count("*").cast("long").alias("n_i"),
        F.sum("cents").cast("long").alias("s_i"))
    g = ev.agg(F.count("*").cast("long").alias("n"),
               F.sum("cents").cast("long").alias("s"),
               F.sum(F.col("cents") * F.col("cents")).cast("long")
                .alias("ss"))
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    var = F.col("ss").cast("double") / F.col("n").cast("double") - mu * mu
    diff = F.col("s_i").cast("double") / F.col("n_i").cast("double") - mu
    z2 = F.col("n_i").cast("double") * diff * diff / var
    p_e9 = F.floor(F.lit(1.0) / (F.lit(1.0) + z2)
                   * F.lit(1e9) + F.lit(0.5)).cast("long")
    p = (cellt.crossJoin(F.broadcast(g))
              .select("event_type", "h", "n_i",
                      F.when(var > 0, p_e9)
                       .otherwise(F.lit(1000000000).cast("long"))
                       .alias("p_e9")))
    m = cellt.agg(F.count("*").cast("long").alias("m"))
    r = p.withColumn(
        "rank",
        F.row_number().over(W.orderBy("p_e9", "event_type", "h"))
         .cast("long"))
    kmax = (r.crossJoin(F.broadcast(m))
             .agg(F.max(F.when(F.col("p_e9") * F.col("m")
                               <= F.col("rank") * 50000000,
                               F.col("rank"))).alias("km")))
    return (r.crossJoin(F.broadcast(kmax))
             .select("event_type", "h", "n_i", "p_e9", "rank",
                     F.coalesce(F.col("rank") <= F.col("km"),
                                F.lit(False)).alias("rejected")))


# =====================================================================
# pairwise-preference strength (Bradley-Terry)
# =====================================================================

@query(
    "q_bradley_terry",
    oracle="""
    WITH ob AS (
      SELECT l.l_orderkey AS ok, p.p_brand AS b,
             CAST(SUM(CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT))
                  AS BIGINT) AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY l.l_orderkey, p.p_brand
    ),
    pr AS (
      SELECT a.b AS b1, b.b AS b2,
             CASE WHEN a.q > b.q THEN a.b ELSE b.b END AS wb
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.b < b.b
      WHERE a.q <> b.q
    ),
    np AS (SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS n_ij
           FROM pr GROUP BY b1, b2),
    wn AS (SELECT wb AS b, CAST(COUNT(*) AS BIGINT) AS w
           FROM pr GROUP BY wb),
    cmp AS (
      SELECT b, CAST(SUM(n_ij) AS BIGINT) AS n_cmp FROM (
        SELECT b1 AS b, n_ij FROM np
        UNION ALL SELECT b2 AS b, n_ij FROM np
      ) GROUP BY b
    ),
    s1 AS (
      SELECT cmp.b, cmp.n_cmp, CAST(COALESCE(wn.w, 0) AS BIGINT) AS w,
             CAST((2 * COALESCE(wn.w, 0) + 1) * 1000000
                  // (cmp.n_cmp + 1) AS BIGINT) AS s1_e6
      FROM cmp LEFT JOIN wn ON wn.b = cmp.b
    ),
    und AS (
      SELECT b1 AS b, b2 AS o, n_ij FROM np
      UNION ALL SELECT b2, b1, n_ij FROM np
    ),
    t AS (
      SELECT u.b,
             CAST(SUM(CAST(FLOOR(CAST(u.n_ij AS DOUBLE)
                  * CAST(1000000000000 AS DOUBLE)
                  / CAST(si.s1_e6 + sj.s1_e6 AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS d_i
      FROM und u JOIN s1 si ON si.b = u.b JOIN s1 sj ON sj.b = u.o
      GROUP BY u.b
    )
    SELECT s1.b AS brand, s1.w AS wins, s1.n_cmp AS comparisons,
           s1.s1_e6 AS s1_e6,
           CAST(s1.w * 1000000000000 // t.d_i AS BIGINT) AS s2_e6
    FROM s1 JOIN t ON t.b = s1.b
    """,
)
def q_bradley_terry(spark, sf_dir):
    """Bradley-Terry preference-strength fitting over pairwise brand
    duels — THE model behind preference-data pipelines (RLHF reward
    preprocessing, annotator A/B adjudication): from 'A beat B' pairs,
    a per-player strength s with P(i beats j) = s_i/(s_i+s_j).  Duels:
    within each order, brands are compared by total quantity (ties
    skipped).  Two minorization-maximization iterations from the
    uniform start, fully deterministic: iterate 1 is the closed form
    2w/N, shipped ADD-ONE SMOOTHED as the exact integer
    s1_e6 = (2w+1)*1e6 DIV (N+1) (keeps winless players positive so
    iterate 2 never divides by zero); iterate 2's denominator
    d_i = sum_j n_ij/(s1_i + s1_j) accumulates per-opponent terms
    snapped to exact e6 integers (the division is IEEE-exact from
    integer inputs, so both engines floor identical bits), giving
    s2_e6 = w*1e12 DIV d_i in pure BIGINT arithmetic.  Scale: the duel
    fan-out is per-order (bounded basket size, never corpus-quadratic);
    everything after the (order, brand) rollup lives on the <=
    25-brand / 300-pair grid and broadcasts.  Overflow bound:
    w*1e12 <= 9e18 -> valid to ~9e6 wins per player (documented)."""
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_partkey", "l_quantity")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (li.join(pt, li["l_partkey"] == pt["p_partkey"])
            .groupBy(F.col("l_orderkey").alias("ok"),
                     F.col("p_brand").alias("b"))
            .agg(F.sum(F.floor(F.col("l_quantity") + F.lit(0.5))
                       .cast("long")).cast("long").alias("q")))
    a = ob.select(F.col("ok"), F.col("b").alias("b1"),
                  F.col("q").alias("q1"))
    bb = ob.select(F.col("ok"), F.col("b").alias("b2"),
                   F.col("q").alias("q2"))
    pr = (a.join(bb, "ok")
           .where((F.col("b1") < F.col("b2"))
                  & (F.col("q1") != F.col("q2")))
           .select("b1", "b2",
                   F.when(F.col("q1") > F.col("q2"), F.col("b1"))
                    .otherwise(F.col("b2")).alias("wb")))
    np_ = pr.groupBy("b1", "b2").agg(F.count("*").cast("long")
                                      .alias("n_ij"))
    wn = pr.groupBy(F.col("wb").alias("b")).agg(
        F.count("*").cast("long").alias("w"))
    und = (np_.select(F.col("b1").alias("b"), F.col("b2").alias("o"),
                      "n_ij")
              .unionAll(np_.select(F.col("b2").alias("b"),
                                   F.col("b1").alias("o"), "n_ij")))
    cmp_ = und.groupBy("b").agg(F.sum("n_ij").cast("long").alias("n_cmp"))
    s1 = (cmp_.join(wn, "b", "left")
              .select("b", "n_cmp",
                      F.coalesce("w", F.lit(0)).cast("long").alias("w"))
              .withColumn("s1_e6",
                          F.expr("(2 * w + 1) * 1000000 DIV (n_cmp + 1)")))
    t_e6 = F.floor(F.col("n_ij").cast("double") * F.lit(1e12)
                   / (F.col("si") + F.col("sj")).cast("double")
                   + F.lit(0.5)).cast("long")
    t = (und.join(F.broadcast(s1.select(F.col("b"),
                                        F.col("s1_e6").alias("si"))), "b")
            .join(F.broadcast(s1.select(F.col("b").alias("o"),
                                        F.col("s1_e6").alias("sj"))), "o")
            .groupBy("b").agg(F.sum(t_e6).cast("long").alias("d_i")))
    return (s1.join(t, "b")
              .select(F.col("b").alias("brand"), F.col("w").alias("wins"),
                      F.col("n_cmp").alias("comparisons"), "s1_e6",
                      F.expr("w * 1000000000000 DIV d_i").alias("s2_e6")))


# =====================================================================
# cluster-quality diagnostics
# =====================================================================

@query(
    "q_simplified_silhouette",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000
                               + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS qe
      FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
    ),
    dims AS (
      SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(embedding)), 1)
                              FROM embeddings) + 1)) AS i
    ),
    pd AS (
      SELECT e.vec_id, e.label, d.i AS dim, qe[d.i] AS v
      FROM e CROSS JOIN dims d WHERE d.i <= len(e.qe)
    ),
    cg AS (
      SELECT label, dim,
             CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
      FROM pd GROUP BY label, dim
    ),
    d2 AS (
      SELECT pd.vec_id, pd.label, cg.label AS label2,
             CAST(SUM((pd.v - cg.c) * (pd.v - cg.c)) AS BIGINT) AS d2
      FROM pd JOIN cg ON cg.dim = pd.dim
      GROUP BY pd.vec_id, pd.label, cg.label
    ),
    ab AS (
      SELECT vec_id, label,
             MAX(CASE WHEN label2 = label THEN d2 END) AS a,
             MIN(CASE WHEN label2 <> label THEN d2 END) AS b
      FROM d2 GROUP BY vec_id, label
    ),
    sil AS (
      SELECT label,
             CASE WHEN a IS NULL OR b IS NULL THEN NULL
                  WHEN a = 0 AND b = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(FLOOR((CAST(b AS DOUBLE) - CAST(a AS DOUBLE))
                       / CAST(CASE WHEN a > b THEN a ELSE b END AS DOUBLE)
                       * CAST(1000000 AS DOUBLE)
                       + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS sil_e6
      FROM ab
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(sil_e6) AS BIGINT) AS sum_sil_e6,
           ROUND(CAST(SUM(sil_e6) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * CAST(1000000 AS DOUBLE)),
                 6) AS mean_sil
    FROM sil GROUP BY label
    """,
)
def q_simplified_silhouette(spark, sf_dir):
    """Simplified (centroid-based) silhouette per cluster label over
    the embeddings table — the cluster-quality readout for the
    SemDedup / k-means stack (q_semantic_dedup, q_kmeans_parallel_init
    build clusters; this scores how separated they are).  Simplified
    silhouette replaces the O(n^2) pairwise form with per-centroid
    distances: a = d^2(x, own centroid), b = min over other labels,
    s = (b-a)/max(a,b) — the standard large-scale variant (it's what
    sklearn's 'silhouette on a sample' approximates).  Exactness:
    components quantize to e6 integers BEFORE any sum, so centroids
    (integer mean via DIV — DuckDB // truncates toward zero exactly
    like Spark DIV, probed on negatives) and squared distances are
    exact BIGINTs; the per-point score divides integer (b-a) by
    integer max once (IEEE-exact) and snaps to sil_e6.  Scale: the
    point x centroid fan-out is n x k with k = |labels| (broadcast
    nested-loop on a <= k-row build side, never n^2); per-point scoring
    is one zip_with over the 64-dim arrays — at the sizes where
    interpreted lambdas become the bottleneck the blocked-GEMM path of
    operators/ml.knn_classify applies (same contract)."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .where(F.col("embedding").isNotNull()
                  & F.col("label").isNotNull()))
    e = emb.select(
        "vec_id", "label",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * F.lit(1e6)
                                      + F.lit(0.5)).cast("long"))
         .alias("qe"))
    pd_ = e.select("vec_id", "label",
                   F.posexplode("qe").alias("dim", "v"))
    cg = (pd_.groupBy("label", "dim")
             .agg(F.sum("v").cast("long").alias("sv"),
                  F.count("*").cast("long").alias("cnt"))
             .withColumn("c", F.expr("sv DIV cnt")))
    cent = (cg.groupBy("label")
              .agg(F.transform(
                       F.array_sort(F.collect_list(F.struct("dim", "c"))),
                       lambda s: s["c"]).alias("arr")))
    d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("arr"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    pairs = (e.crossJoin(F.broadcast(
                 cent.withColumnRenamed("label", "label2")))
              .select("vec_id", "label", "label2", d2.alias("d2")))
    ab = pairs.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("label2") == F.col("label"),
                     F.col("d2"))).alias("a"),
        F.min(F.when(F.col("label2") != F.col("label"),
                     F.col("d2"))).alias("b"))
    sil_e6 = (F.when(F.col("a").isNull() | F.col("b").isNull(),
                     F.lit(None).cast("long"))
               .when((F.col("a") == 0) & (F.col("b") == 0),
                     F.lit(0).cast("long"))
               .otherwise(
                   F.floor((F.col("b").cast("double")
                            - F.col("a").cast("double"))
                           / F.greatest("a", "b").cast("double")
                           * F.lit(1e6) + F.lit(0.5)).cast("long")))
    return (ab.select("label", sil_e6.alias("sil_e6"))
              .groupBy("label")
              .agg(F.count("*").cast("long").alias("n_points"),
                   F.sum("sil_e6").cast("long").alias("sum_sil_e6"),
                   pround(F.sum("sil_e6").cast("double")
                          / (F.count("*").cast("double") * F.lit(1e6)),
                          6).alias("mean_sil")))
