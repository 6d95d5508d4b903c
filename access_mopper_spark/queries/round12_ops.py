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
    ghq AS (
      SELECT h, CAST((r2 - (tot.n + 1)) * 100000 // (2 * tot.n)
                     AS BIGINT) AS dq
      FROM ghr CROSS JOIN tot
    ),
    gcq AS (
      SELECT c, CAST((r2 - (tot.n + 1)) * 100000 // (2 * tot.n)
                     AS BIGINT) AS dq
      FROM gcr CROSS JOIN tot
    ),
    core AS (
      SELECT CAST(SUM(cell.n_hc * ghq.dq * gcq.dq) AS BIGINT) AS sxy
      FROM cell JOIN ghq USING (h) JOIN gcq USING (c)
    ),
    vx AS (
      SELECT CAST(SUM(gh.cnt * ghq.dq * ghq.dq) AS BIGINT) AS sxx
      FROM gh JOIN ghq USING (h)
    ),
    vy AS (
      SELECT CAST(SUM(gc.cnt * gcq.dq * gcq.dq) AS BIGINT) AS syy
      FROM gc JOIN gcq USING (c)
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
    half-integers, so DOUBLED ranks r2 = 2*cum_count - count + 1 are
    exact; centered deviations then quantize per DISTINCT grid value to
    a 1e5 grid via integer DIV (dq = (r2-(n+1))*1e5 DIV 2n, in
    [-50000, 50000] — both engines truncate toward zero, probed on
    negatives), so sxy/sxx/syy are order-free BIGINT sums bounded by
    2.5e9*n -> valid past 1e9 rows (the raw-rank core overflowed n^3 at
    the x100 sweep point); rho divides once through sqrt*sqrt with R6
    (rank quantization moves rho by O(2n/1e5) relative — ~1e-5).
    Scale: raw events reduce to the (hour x distinct-cents) grid FIRST;
    both rank cumulatives run through operators/prefix.bucketed_prefix
    (bucket-partitioned window + broadcast triangular offsets — never a
    single-reducer global window over the value grid)."""
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
    dq = F.expr("(r2 - (n + 1)) * 100000 DIV (2 * n)")
    ghq = (ghr.crossJoin(F.broadcast(tot))
              .select("h", "cnt", dq.alias("dq")))
    gcq = (gcr.crossJoin(F.broadcast(tot))
              .select("c", "cnt", dq.alias("dq")))
    core = (cell
            .join(ghq.select("h", F.col("dq").alias("dqx")), "h")
            .join(gcq.select("c", F.col("dq").alias("dqy")), "c")
            .agg(F.sum(F.col("n_hc") * F.col("dqx") * F.col("dqy"))
                  .cast("long").alias("sxy")))
    vx = ghq.agg(F.sum(F.col("cnt") * F.col("dq") * F.col("dq"))
                  .cast("long").alias("sxx"))
    vy = gcq.agg(F.sum(F.col("cnt") * F.col("dq") * F.col("dq"))
                  .cast("long").alias("syy"))
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


# =====================================================================
# causal / calibration estimators
# =====================================================================

@query(
    "q_ipw_ate",
    oracle="""
    WITH ev AS (
      SELECT hour(CAST(ts AS TIMESTAMP)) AS h,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y,
             CAST(('0x' || substring(md5('ipw:' || CAST(event_id AS VARCHAR)),
                                     1, 8))::BIGINT % 2 AS BIGINT) AS t
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND event_id IS NOT NULL
    ),
    s AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS n_s,
             CAST(SUM(t) AS BIGINT) AS nt_s,
             CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS yt_s,
             CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS yc_s
      FROM ev GROUP BY h
    ),
    ok AS (
      SELECT *, n_s - nt_s AS nc_s FROM s WHERE nt_s > 0 AND n_s - nt_s > 0
    ),
    terms AS (
      SELECT CAST(SUM(n_s) AS BIGINT) AS n, CAST(SUM(nt_s) AS BIGINT) AS nt,
             CAST(SUM(n_s * (yt_s * 10000 // nt_s - yc_s * 10000 // nc_s))
                  AS BIGINT) AS strat_e4,
             CAST(SUM(CAST(FLOOR(CAST(yt_s AS DOUBLE) * CAST(n_s AS DOUBLE)
                  / CAST(nt_s AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))
                  AS BIGINT) AS ipw_t,
             CAST(SUM(CAST(FLOOR(CAST(yc_s AS DOUBLE) * CAST(n_s AS DOUBLE)
                  / CAST(nc_s AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))
                  AS BIGINT) AS ipw_c,
             CAST(COUNT(*) AS BIGINT) AS n_strata
      FROM ok
    )
    SELECT n, nt, n_strata, strat_e4, ipw_t, ipw_c,
           ROUND(CAST(strat_e4 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(1000000 AS DOUBLE)), 6)
             AS ate_strat,
           ROUND((CAST(ipw_t AS DOUBLE) - CAST(ipw_c AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE)), 6) AS ate_ipw
    FROM terms
    """,
)
def q_ipw_ate(spark, sf_dir):
    """Stratified + inverse-propensity-weighted average-treatment-
    effect estimators — the causal-inference layer of the
    experimentation stack (q_cuped_adjustment reduces variance; this
    corrects CONFOUNDING when assignment depends on the stratum).
    Treatment is a deterministic md5 coin per event (both engines
    compute identical digests); strata are hour-of-day.  Exactness:
    per-stratum mean differences quantize to bp-cents via integer DIV
    (d_s = yt*1e4 DIV nt - yc*1e4 DIV nc), so the stratified estimator
    sum(n_s * d_s) is an exact BIGINT; the IPW terms y_t,s * n_s/nt_s
    (Horvitz-Thompson weight n_s/nt_s = 1/e_s) are single IEEE
    divisions from exact integers snapped to integer cents before the
    cross-strata sum — no double summation anywhere.  Strata lacking
    either arm drop from BOTH estimators (documented positivity
    filter; n_strata reports the surviving count).  Scale: one
    (hour)-grid rollup — 24 rows regardless of corpus size."""
    lane = F.conv(F.substring(F.md5(F.concat(
        F.lit("ipw:"), F.col("event_id").cast("string"))), 1, 8),
        16, 10).cast("long") % 2
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("event_id").isNotNull())
          .select(F.hour("ts").alias("h"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y"),
                  lane.alias("t")))
    s = ev.groupBy("h").agg(
        F.count("*").cast("long").alias("n_s"),
        F.sum("t").cast("long").alias("nt_s"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
         .cast("long").alias("yt_s"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
         .cast("long").alias("yc_s"))
    ok = (s.withColumn("nc_s", F.col("n_s") - F.col("nt_s"))
           .where((F.col("nt_s") > 0) & (F.col("nc_s") > 0)))
    ipw_t = F.floor(F.col("yt_s").cast("double") * F.col("n_s").cast("double")
                    / F.col("nt_s").cast("double") + F.lit(0.5)).cast("long")
    ipw_c = F.floor(F.col("yc_s").cast("double") * F.col("n_s").cast("double")
                    / F.col("nc_s").cast("double") + F.lit(0.5)).cast("long")
    terms = ok.agg(
        F.sum("n_s").cast("long").alias("n"),
        F.sum("nt_s").cast("long").alias("nt"),
        F.sum(F.col("n_s") * (F.expr("yt_s * 10000 DIV nt_s")
                              - F.expr("yc_s * 10000 DIV nc_s")))
         .cast("long").alias("strat_e4"),
        F.sum(ipw_t).cast("long").alias("ipw_t"),
        F.sum(ipw_c).cast("long").alias("ipw_c"),
        F.count("*").cast("long").alias("n_strata"))
    return terms.select(
        "n", "nt", "n_strata", "strat_e4", "ipw_t", "ipw_c",
        pround(F.col("strat_e4").cast("double")
               / (F.col("n").cast("double") * F.lit(1e6)), 6)
         .alias("ate_strat"),
        pround((F.col("ipw_t").cast("double") - F.col("ipw_c").cast("double"))
               / (F.col("n").cast("double") * F.lit(100.0)), 6)
         .alias("ate_ipw"))


@query(
    "q_conformal_interval",
    oracle="""
    WITH ev AS (
      SELECT hour(CAST(ts AS TIMESTAMP)) AS h,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y,
             CAST(('0x' || substring(md5('cfp:' || CAST(event_id AS VARCHAR)),
                                     1, 8))::BIGINT % 2 AS BIGINT) AS lane
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND event_id IS NOT NULL
    ),
    pred AS (
      SELECT h, CAST(SUM(y) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS p
      FROM ev WHERE lane = 0 GROUP BY h
    ),
    cal AS (
      SELECT ABS(ev.y - pred.p) AS r
      FROM ev JOIN pred USING (h) WHERE ev.lane = 0
    ),
    kk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
             CAST((9 * (COUNT(*) + 1) + 9) // 10 AS BIGINT) AS k
      FROM cal
    ),
    grid AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS cnt FROM cal GROUP BY r),
    cum AS (
      SELECT r, CAST(SUM(cnt) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS cd
      FROM grid
    ),
    rs AS (
      SELECT MIN(CASE WHEN cum.cd >= kk.k THEN cum.r END) AS r_star
      FROM cum CROSS JOIN kk
    ),
    cov AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN ABS(ev.y - pred.p) <= rs.r_star
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_cov
      FROM ev JOIN pred USING (h) CROSS JOIN rs
      WHERE ev.lane = 1
    )
    SELECT kk.n_cal, kk.k, CAST(rs.r_star AS BIGINT) AS r_star,
           cov.n_test, cov.n_cov,
           CASE WHEN cov.n_test > 0
                THEN CAST(cov.n_cov * 10000 // cov.n_test AS BIGINT)
                ELSE NULL END AS coverage_bp
    FROM kk CROSS JOIN rs CROSS JOIN cov
    """,
)
def q_conformal_interval(spark, sf_dir):
    """Split-conformal prediction interval with empirical coverage —
    the distribution-free uncertainty layer for any point model (here
    the hour-of-day mean): calibrate the 90% residual quantile on a
    deterministic md5 half, then measure coverage on the other half.
    THE modern eval primitive for 'how wide must the band be for 90%
    guarantees'.  Exact integers end to end: the per-hour model is an
    integer DIV mean, residuals are integer cents, the conformal rank
    k = ceil(0.9*(n_cal+1)) is integer ceiling arithmetic, the quantile
    r* = min residual with cumcount >= k comes off the distinct-
    residual grid (cumulative via bucketed_prefix, conditional-min
    collapse — the q_lorenz_curve shape), and coverage is a bp ratio
    via DIV.  No doubles anywhere.  Degenerate guards: an empty
    calibration half leaves r* NULL (infinite band, the conformal
    convention) and test rows then count as uncovered; test hours
    unseen in calibration drop via the inner join (documented).  Scale:
    two grid rollups (24 hours, distinct residuals) — no raw-row
    windows."""
    lane = F.conv(F.substring(F.md5(F.concat(
        F.lit("cfp:"), F.col("event_id").cast("string"))), 1, 8),
        16, 10).cast("long") % 2
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("event_id").isNotNull())
          .select(F.hour("ts").alias("h"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y"),
                  lane.alias("lane")))
    pred = (ev.where(F.col("lane") == 0).groupBy("h")
              .agg(F.sum("y").cast("long").alias("sy"),
                   F.count("*").cast("long").alias("nh"))
              .select("h", F.expr("sy DIV nh").alias("p")))
    cal = (ev.where(F.col("lane") == 0).join(pred, "h")
             .select(F.abs(F.col("y") - F.col("p")).alias("r")))
    kk = cal.agg(F.count("*").cast("long").alias("n_cal")) \
            .withColumn("k", F.expr("(9 * (n_cal + 1) + 9) DIV 10"))
    grid = cal.groupBy("r").agg(F.count("*").cast("long").alias("cnt"))
    cum = bucketed_prefix(grid, "r", ["cnt"])
    rs = (cum.crossJoin(F.broadcast(kk))
             .agg(F.min(F.when(F.col("cum_cnt") >= F.col("k"),
                               F.col("r"))).alias("r_star")))
    cov = (ev.where(F.col("lane") == 1).join(pred, "h")
             .crossJoin(F.broadcast(rs))
             .agg(F.count("*").cast("long").alias("n_test"),
                  F.sum(F.when(F.abs(F.col("y") - F.col("p"))
                               <= F.col("r_star"), 1).otherwise(0))
                   .cast("long").alias("n_cov")))
    return (kk.crossJoin(F.broadcast(rs)).crossJoin(F.broadcast(cov))
              .select("n_cal", "k",
                      F.col("r_star").cast("long").alias("r_star"),
                      "n_test", "n_cov",
                      F.when(F.col("n_test") > 0,
                             F.expr("n_cov * 10000 DIV n_test"))
                       .otherwise(F.lit(None).cast("long"))
                       .alias("coverage_bp")))


# =====================================================================
# graph centrality / dose-response trend
# =====================================================================

@query(
    "q_harmonic_centrality",
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
    lm AS (
      SELECT x AS s FROM und GROUP BY x ORDER BY x LIMIT 4
    ),
    walk(s, node, hop) AS (
      SELECT s, s, 0 FROM lm
      UNION ALL
      SELECT walk.s, und.y, walk.hop + 1
      FROM walk JOIN und ON und.x = walk.node
      WHERE walk.hop < 4
    ),
    dist AS (
      SELECT s, node, CAST(MIN(hop) AS BIGINT) AS hop FROM walk
      GROUP BY s, node
    )
    SELECT s AS landmark,
           CAST(SUM(CASE WHEN hop > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS reached,
           CAST(SUM(hop) AS BIGINT) AS sum_hops,
           CAST(SUM(CASE WHEN hop > 0 THEN 1000000 // hop ELSE 0 END)
                AS BIGINT) AS harmonic_e6
    FROM dist GROUP BY s
    """,
)
def q_harmonic_centrality(spark, sf_dir):
    """Hop-bounded harmonic centrality from 4 landmark nodes (the 4
    smallest part ids) over the co-purchase graph: per landmark, the
    reachable set within 4 hops, total hop mass, and the harmonic sum
    sum(1/d) — the landmark-sampling estimator used when exact
    all-pairs centrality is impossible at scale (closeness via
    landmarks, Eppstein-Wang style), extending q_bfs_hops' single-
    source profile to a per-landmark ranking surface.  Multi-source
    frontier BFS: ONE frontier frame keyed by (landmark, node) so all
    landmarks advance in the same join per round — work per round is
    |frontier edges| summed over landmarks, not 4 sequential sweeps;
    the min-distance ledger anti-join is keyed the same way.  1/d
    quantizes to 1e6 DIV hop — exact integer, flip-proof.  The oracle
    replays via a depth-bounded recursive CTE with MIN(hop) dedup."""
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
    lm = (und.select("x").distinct().orderBy("x").limit(4)
             .select(F.col("x").alias("s")))
    src = lm.select("s", F.col("s").alias("node"),
                    F.lit(0).cast("long").alias("hop"))
    dist = src.persist()
    frontier = src
    caches = [und, dist]
    for k in range(1, 5):
        nxt = (frontier.join(und, frontier["node"] == und["x"])
               .select("s", F.col("y").alias("node"))
               .distinct()
               .join(dist.select("s", "node"), ["s", "node"], "left_anti")
               .withColumn("hop", F.lit(k).cast("long")))
        nxt = nxt.persist()
        dist = dist.unionByName(nxt).persist()
        caches.extend([nxt, dist])
        frontier = nxt
    out = dist.groupBy(F.col("s").alias("landmark")).agg(
        F.sum(F.when(F.col("hop") > 0, 1).otherwise(0)).cast("long")
         .alias("reached"),
        F.sum("hop").cast("long").alias("sum_hops"),
        F.sum(F.when(F.col("hop") > 0, F.expr("1000000 DIV hop"))
               .otherwise(0)).cast("long").alias("harmonic_e6"))
    # 4-row result: materialize eagerly, release all round caches
    return eager_release(out, *caches)


@query(
    "q_cochran_armitage",
    oracle="""
    WITH ev AS (
      SELECT hour(CAST(ts AS TIMESTAMP)) AS h,
             CASE WHEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 5000
                  THEN 1 ELSE 0 END AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    g AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(y) AS BIGINT) AS r_h
      FROM ev GROUP BY h
    ),
    tot AS (
      SELECT CAST(SUM(n_h) AS BIGINT) AS n, CAST(SUM(r_h) AS BIGINT) AS r,
             CAST(SUM(n_h * h) AS BIGINT) AS sw,
             CAST(SUM(n_h * h * h) AS BIGINT) AS sww
      FROM g
    ),
    core AS (
      SELECT CAST(SUM(h * (r_h * tot.n - n_h * tot.r)) AS BIGINT) AS t_stat
      FROM g CROSS JOIN tot
    )
    SELECT tot.n, tot.r, core.t_stat,
           CASE WHEN tot.r > 0 AND tot.r < tot.n
                 AND CAST(tot.sww AS DOUBLE) * CAST(tot.n AS DOUBLE)
                     - CAST(tot.sw AS DOUBLE) * CAST(tot.sw AS DOUBLE) > 0
                THEN ROUND(CAST(core.t_stat AS DOUBLE)
                     / SQRT(CAST(tot.r AS DOUBLE)
                            * (CAST(tot.n AS DOUBLE) - CAST(tot.r AS DOUBLE))
                            * (CAST(tot.sww AS DOUBLE) * CAST(tot.n AS DOUBLE)
                               - CAST(tot.sw AS DOUBLE)
                                 * CAST(tot.sw AS DOUBLE))
                            / CAST(tot.n AS DOUBLE)), 6)
                ELSE NULL END AS z
    FROM tot CROSS JOIN core
    """,
)
def q_cochran_armitage(spark, sf_dir):
    """Cochran-Armitage trend test: is the success rate (value >= $50)
    monotonically trending across the ordered hour-of-day doses?  The
    categorical dose-response companion to q_mann_kendall (which trends
    a continuous daily series) — the standard test for 'does the
    binary QC pass-rate drift across an ordered dimension'.  The core
    T = sum_h w_h*(r_h*n - n_h*R) with scores w_h = h is an exact
    BIGINT built from the 24-row hour grid (bound: |T| <= 23*n^2 ->
    valid to n ~ 6e8 rows); the z denominator
    sqrt(R*(n-R)*(n*sum(n_h*w^2) - sum(n_h*w)^2)/n) stages the same
    IEEE ops on both engines from exact integer moments.  Guards: z
    NULL when successes are degenerate (R = 0 or n) or the dose
    variance is zero.  One grid rollup, no windows."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select(F.hour("ts").alias("h"),
                  F.when(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long") >= 5000, 1).otherwise(0)
                   .alias("y")))
    g = ev.groupBy("h").agg(F.count("*").cast("long").alias("n_h"),
                            F.sum("y").cast("long").alias("r_h"))
    tot = g.agg(F.sum("n_h").cast("long").alias("n"),
                F.sum("r_h").cast("long").alias("r"),
                F.sum(F.col("n_h") * F.col("h")).cast("long").alias("sw"),
                F.sum(F.col("n_h") * F.col("h") * F.col("h")).cast("long")
                 .alias("sww"))
    core = (g.crossJoin(F.broadcast(tot))
             .agg(F.sum(F.col("h") * (F.col("r_h") * F.col("n")
                                      - F.col("n_h") * F.col("r")))
                   .cast("long").alias("t_stat")))
    j = tot.crossJoin(F.broadcast(core))
    nd = F.col("n").cast("double")
    rd = F.col("r").cast("double")
    dosevar = (F.col("sww").cast("double") * nd
               - F.col("sw").cast("double") * F.col("sw").cast("double"))
    z = (F.col("t_stat").cast("double")
         / F.sqrt(rd * (nd - rd) * dosevar / nd))
    return j.select(
        "n", "r", "t_stat",
        F.when((F.col("r") > 0) & (F.col("r") < F.col("n"))
               & (dosevar > 0), pround(z, 6))
         .otherwise(F.lit(None).cast("double")).alias("z"))


# =====================================================================
# survey design / experiment sizing
# =====================================================================

@query(
    "q_stratified_neyman",
    oracle="""
    WITH d AS (
      SELECT source, CAST(n_chars AS BIGINT) AS len
      FROM documents
      WHERE source IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
    ),
    s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(len) AS BIGINT) AS sl,
             CAST(SUM(len * len) AS BIGINT) AS sll
      FROM d GROUP BY source
    ),
    w AS (
      SELECT source, n_h,
             CASE WHEN n_h >= 2 THEN
               CAST(FLOOR(CAST(n_h AS DOUBLE)
                    * SQRT((CAST(sll AS DOUBLE)
                            - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                              / CAST(n_h AS DOUBLE))
                           / CAST(n_h - 1 AS DOUBLE))
                    * CAST(1000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS w_e3
      FROM s
    ),
    tw AS (SELECT CAST(SUM(w_e3) AS BIGINT) AS wt FROM w),
    base AS (
      SELECT w.source, w.n_h, w.w_e3,
             CASE WHEN tw.wt > 0
                  THEN CAST(1000 * w.w_e3 // tw.wt AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS base_a,
             CASE WHEN tw.wt > 0
                  THEN CAST(1000 * w.w_e3 % tw.wt AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS rem
      FROM w CROSS JOIN tw
    ),
    rk AS (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                     AS BIGINT) AS rk
      FROM base
    ),
    deficit AS (SELECT CAST(1000 - SUM(base_a) AS BIGINT) AS def FROM rk)
    SELECT rk.source, rk.n_h, rk.w_e3,
           CAST(rk.base_a + CASE WHEN rk.rk <= deficit.def THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM rk CROSS JOIN deficit
    """,
)
def q_stratified_neyman(spark, sf_dir):
    """Neyman-optimal stratified sample allocation: split a 1000-doc
    annotation budget across sources proportional to N_h * S_h (stratum
    size x length standard deviation) — THE survey-sampling answer to
    'where do labeling dollars buy the most variance reduction', the
    design-stage companion to q_stratified_sample (which executes a
    given allocation) and q_largest_remainder (whose exact-quota
    rounding this reuses).  The weight snaps N_h*S_h to an exact w_e3
    integer (sqrt from exact BIGINT moments is one IEEE op — identical
    bits both engines); quotas then use pure integer arithmetic:
    base = 1000*w DIV W, remainders ranked, the deficit distributed by
    largest remainder — allocations sum to exactly 1000 and cannot
    flip.  Degenerate strata (n_h < 2) weight 0 (documented).  The
    remainder rank runs over the |sources| grid — domain-bounded,
    plan-audit allowlisted like q_largest_remainder."""
    d = (load_table(spark, sf_dir, "documents")
         .where(F.col("source").isNotNull() & F.col("n_chars").isNotNull()
                & (F.col("n_chars") > 0))
         .select("source", F.col("n_chars").cast("long").alias("len")))
    s = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum("len").cast("long").alias("sl"),
        F.sum(F.col("len") * F.col("len")).cast("long").alias("sll"))
    nd = F.col("n_h").cast("double")
    sd = F.sqrt((F.col("sll").cast("double")
                 - F.col("sl").cast("double") * F.col("sl").cast("double")
                   / nd) / (F.col("n_h") - 1).cast("double"))
    w = s.select(
        "source", "n_h",
        F.when(F.col("n_h") >= 2,
               F.floor(nd * sd * F.lit(1000.0) + F.lit(0.5)).cast("long"))
         .otherwise(F.lit(0).cast("long")).alias("w_e3"))
    tw = w.agg(F.sum("w_e3").cast("long").alias("wt"))
    base = (w.crossJoin(F.broadcast(tw))
             .withColumn("base_a",
                         F.when(F.col("wt") > 0,
                                F.expr("1000 * w_e3 DIV wt"))
                          .otherwise(F.lit(0)).cast("long"))
             .withColumn("rem",
                         F.when(F.col("wt") > 0,
                                F.expr("1000 * w_e3 % wt"))
                          .otherwise(F.lit(0)).cast("long")))
    rk = base.withColumn(
        "rk", F.row_number().over(W.orderBy(F.col("rem").desc(), "source"))
               .cast("long"))
    deficit = rk.agg((F.lit(1000) - F.sum("base_a")).cast("long")
                     .alias("def"))
    return (rk.crossJoin(F.broadcast(deficit))
              .select("source", "n_h", "w_e3",
                      (F.col("base_a")
                       + F.when(F.col("rk") <= F.col("def"), 1)
                          .otherwise(0)).cast("long").alias("alloc")))


@query(
    "q_odds_ratio_ci",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CASE WHEN hour(CAST(ts AS TIMESTAMP)) < 12 THEN 1 ELSE 0
                  END AS am,
             CASE WHEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 5000
                  THEN 1 ELSE 0 END AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        AND event_type IS NOT NULL
    ),
    t AS (
      SELECT event_type,
             CAST(SUM(am * y) AS BIGINT) AS a,
             CAST(SUM(am * (1 - y)) AS BIGINT) AS b,
             CAST(SUM((1 - am) * y) AS BIGINT) AS c,
             CAST(SUM((1 - am) * (1 - y)) AS BIGINT) AS d
      FROM ev GROUP BY event_type
    ),
    h AS (
      SELECT event_type, a, b, c, d,
             LN(CAST((2 * a + 1) * (2 * d + 1) AS DOUBLE)
                / CAST((2 * b + 1) * (2 * c + 1) AS DOUBLE)) AS lor,
             CAST(1.96 AS DOUBLE)
               * SQRT(CAST(2 AS DOUBLE) / CAST(2 * a + 1 AS DOUBLE)
                      + CAST(2 AS DOUBLE) / CAST(2 * b + 1 AS DOUBLE)
                      + CAST(2 AS DOUBLE) / CAST(2 * c + 1 AS DOUBLE)
                      + CAST(2 AS DOUBLE) / CAST(2 * d + 1 AS DOUBLE))
               AS halfw
      FROM t
    )
    SELECT event_type, a, b, c, d,
           ROUND(EXP(lor), 6) AS odds_ratio,
           ROUND(EXP(lor - halfw), 6) AS ci_lo,
           ROUND(EXP(lor + halfw), 6) AS ci_hi
    FROM h
    """,
)
def q_odds_ratio_ci(spark, sf_dir):
    """Haldane-Anscombe odds ratio with Woolf 95% CI per event type:
    exposure = morning hour, outcome = value >= $50 — the 2x2
    association readout with a defensible zero-cell behavior (the +0.5
    correction applied ALWAYS, expressed as exact doubled-count
    integers (2a+1)(2d+1)/((2b+1)(2c+1)) so the corrected table never
    leaves BIGINT).  Complements q_mcnemar_test (paired 2x2) and
    q_cramers_v (k x k effect size) with the epidemiology-standard
    ratio + interval.  ln/exp appear only in FINAL per-row expressions
    over exact integer inputs (repo transcendental convention), R6;
    the Woolf half-width uses 1/(x+0.5) = 2/(2x+1) rationals.  One
    grid rollup, 5 rows."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("event_type").isNotNull())
          .select("event_type",
                  F.when(F.hour("ts") < 12, 1).otherwise(0).alias("am"),
                  F.when(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long") >= 5000, 1).otherwise(0)
                   .alias("y")))
    t = ev.groupBy("event_type").agg(
        F.sum(F.col("am") * F.col("y")).cast("long").alias("a"),
        F.sum(F.col("am") * (1 - F.col("y"))).cast("long").alias("b"),
        F.sum((1 - F.col("am")) * F.col("y")).cast("long").alias("c"),
        F.sum((1 - F.col("am")) * (1 - F.col("y"))).cast("long")
         .alias("d"))
    lor = F.log(((2 * F.col("a") + 1) * (2 * F.col("d") + 1))
                .cast("double")
                / ((2 * F.col("b") + 1) * (2 * F.col("c") + 1))
                  .cast("double"))
    halfw = F.lit(1.96) * F.sqrt(
        F.lit(2.0) / (2 * F.col("a") + 1).cast("double")
        + F.lit(2.0) / (2 * F.col("b") + 1).cast("double")
        + F.lit(2.0) / (2 * F.col("c") + 1).cast("double")
        + F.lit(2.0) / (2 * F.col("d") + 1).cast("double"))
    return t.select(
        "event_type", "a", "b", "c", "d",
        pround(F.exp(lor), 6).alias("odds_ratio"),
        pround(F.exp(lor - halfw), 6).alias("ci_lo"),
        pround(F.exp(lor + halfw), 6).alias("ci_hi"))


@query(
    "q_diff_in_diff",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN day(CAST(ts AS TIMESTAMP)) >= 16 THEN 1 ELSE 0
                  END AS post,
             CAST(('0x' || substring(md5('did:' || CAST(user_id AS VARCHAR)),
                                     1, 8))::BIGINT % 2 AS BIGINT) AS t,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
    ),
    c AS (
      SELECT t, post, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s
      FROM ev GROUP BY t, post
    ),
    m AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(CASE WHEN t = 1 AND post = 1
                           THEN s * 10000 // n ELSE 0 END)
                - SUM(CASE WHEN t = 1 AND post = 0
                           THEN s * 10000 // n ELSE 0 END)
                - SUM(CASE WHEN t = 0 AND post = 1
                           THEN s * 10000 // n ELSE 0 END)
                + SUM(CASE WHEN t = 0 AND post = 0
                           THEN s * 10000 // n ELSE 0 END)
                AS BIGINT) AS did_e4
      FROM c
    )
    SELECT n_total, n_cells,
           CASE WHEN n_cells = 4 THEN did_e4 ELSE NULL END AS did_e4,
           CASE WHEN n_cells = 4
                THEN ROUND(CAST(did_e4 AS DOUBLE) / CAST(1000000 AS DOUBLE),
                           6)
                ELSE NULL END AS did_dollars
    FROM m
    """,
)
def q_diff_in_diff(spark, sf_dir):
    """Difference-in-differences: the parallel-trends causal estimator
    (treated minus control change, post minus pre) with UNIT-level md5
    treatment assignment (user_id, so all of a user's events share an
    arm — the clustering a per-event coin would break) and a calendar
    pre/post split at mid-month.  Completes the causal shelf next to
    q_ipw_ate (confounding) and q_cuped_adjustment (variance): DiD
    handles time-constant unit confounding.  Each cell mean quantizes
    to bp-cents via integer DIV, so the four-way difference did_e4 is
    exact BIGINT; the estimate is NULL unless all four (arm x period)
    cells are populated (documented).  One 4-cell rollup — no joins,
    no windows."""
    lane = F.conv(F.substring(F.md5(F.concat(
        F.lit("did:"), F.col("user_id").cast("string"))), 1, 8),
        16, 10).cast("long") % 2
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("user_id").isNotNull())
          .select(F.when(F.dayofmonth("ts") >= 16, 1).otherwise(0)
                   .alias("post"),
                  lane.alias("t"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y")))
    c = ev.groupBy("t", "post").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"))
    mean_bp = F.expr("s * 10000 DIV n")
    m = c.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_cells"),
        (F.sum(F.when((F.col("t") == 1) & (F.col("post") == 1), mean_bp)
                .otherwise(0))
         - F.sum(F.when((F.col("t") == 1) & (F.col("post") == 0), mean_bp)
                  .otherwise(0))
         - F.sum(F.when((F.col("t") == 0) & (F.col("post") == 1), mean_bp)
                  .otherwise(0))
         + F.sum(F.when((F.col("t") == 0) & (F.col("post") == 0), mean_bp)
                  .otherwise(0))).cast("long").alias("did_e4"))
    return m.select(
        "n_total", "n_cells",
        F.when(F.col("n_cells") == 4, F.col("did_e4"))
         .otherwise(F.lit(None).cast("long")).alias("did_e4"),
        F.when(F.col("n_cells") == 4,
               pround(F.col("did_e4").cast("double") / F.lit(1e6), 6))
         .otherwise(F.lit(None).cast("double")).alias("did_dollars"))


@query(
    "q_power_mde",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS ss
      FROM ev GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN n >= 2 THEN
             ROUND((CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE))
                   / CAST(n - 1 AS DOUBLE) / CAST(10000 AS DOUBLE), 2)
           ELSE NULL END AS var_dollars2,
           CASE WHEN n >= 2 THEN
             ROUND((CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
                   * SQRT(CAST(2 AS DOUBLE)
                          * ((CAST(ss AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                / CAST(n AS DOUBLE))
                             / CAST(n - 1 AS DOUBLE))
                          / CAST(n AS DOUBLE)) / CAST(100 AS DOUBLE), 6)
           ELSE NULL END AS mde_dollars
    FROM g
    """,
)
def q_power_mde(spark, sf_dir):
    """Minimum detectable effect per event type: the experiment-sizing
    readout 'with this slice's n and variance, what lift could a
    two-sample test even see at alpha = 0.05, power = 0.80?' —
    MDE = (z_alpha/2 + z_beta) * sqrt(2*s^2/n), the planning companion
    to q_ab_ttest (which tests after the fact) and q_cuped_adjustment
    (which shrinks s^2).  Variance comes from exact BIGINT moments;
    the z multipliers are fixed double literals; everything after the
    integer core is one staged IEEE expression per row, R6.  One
    rollup, 5 rows."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y")))
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"))
    nd = F.col("n").cast("double")
    var_c = ((F.col("ss").cast("double")
              - F.col("s").cast("double") * F.col("s").cast("double") / nd)
             / (F.col("n") - 1).cast("double"))
    mde = ((F.lit(1.96) + F.lit(0.8416))
           * F.sqrt(F.lit(2.0) * var_c / nd) / F.lit(100.0))
    return g.select(
        "event_type", "n",
        F.when(F.col("n") >= 2, pround(var_c / F.lit(10000.0), 2))
         .otherwise(F.lit(None).cast("double")).alias("var_dollars2"),
        F.when(F.col("n") >= 2, pround(mde, 6))
         .otherwise(F.lit(None).cast("double")).alias("mde_dollars"))


# =====================================================================
# text: unicode script mix
# =====================================================================

@query(
    "q_script_mix",
    oracle="""
    WITH d AS (
      SELECT lang,
             CAST(length(text) AS BIGINT) AS nc,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  AS BIGINT) AS latin,
             CAST(length(regexp_replace(text, '[^\\x{0400}-\\x{04FF}]',
                                        '', 'g')) AS BIGINT) AS cyr,
             CAST(length(regexp_replace(text, '[^\\x{4E00}-\\x{9FFF}]',
                                        '', 'g')) AS BIGINT) AS cjk,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                  AS BIGINT) AS dig
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nc) AS BIGINT) AS chars,
           CASE WHEN SUM(nc) > 0
                THEN CAST(SUM(latin) * 10000 // SUM(nc) AS BIGINT)
                ELSE NULL END AS latin_bp,
           CASE WHEN SUM(nc) > 0
                THEN CAST(SUM(cyr) * 10000 // SUM(nc) AS BIGINT)
                ELSE NULL END AS cyr_bp,
           CASE WHEN SUM(nc) > 0
                THEN CAST(SUM(cjk) * 10000 // SUM(nc) AS BIGINT)
                ELSE NULL END AS cjk_bp,
           CASE WHEN SUM(nc) > 0
                THEN CAST(SUM(dig) * 10000 // SUM(nc) AS BIGINT)
                ELSE NULL END AS digit_bp,
           CAST(SUM(CASE WHEN latin > 0 AND cyr > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS mixed_script_docs
    FROM d GROUP BY lang
    """,
)
def q_script_mix(spark, sf_dir):
    """Unicode script composition per language: codepoint shares of
    Latin / Cyrillic / CJK / digits and the count of MIXED Latin +
    Cyrillic docs — the script-level spoofing and corpus-drift signal
    that complements q_confusable_skeleton (which normalizes individual
    homoglyphs; this flags documents whose script MIX is itself the
    anomaly, the classic phishing / synthetic-text tell).  Pure
    JVM-side Column math (four regexp_replace+length per doc inside
    whole-stage codegen — no UDF, no shuffle beyond the |langs|
    rollup); counts are exact integers, shares are bp via DIV.  Both
    engines count CODEPOINTS (Spark length() and DuckDB length() agree;
    the char classes are explicit BMP ranges so Java regex and RE2
    interpret them identically).  Scale: map-only over the corpus, one
    5-row aggregate."""
    txt = F.col("text")
    d = (load_table(spark, sf_dir, "documents")
         .where(txt.isNotNull() & F.col("lang").isNotNull()))
    d = _wide(d).select(
        "lang",
        F.length(txt).cast("long").alias("nc"),
        F.length(F.regexp_replace(txt, "[^A-Za-z]", "")).cast("long")
         .alias("latin"),
        F.length(F.regexp_replace(txt, "[^Ѐ-ӿ]", "")).cast("long")
         .alias("cyr"),
        F.length(F.regexp_replace(txt, "[^一-鿿]", "")).cast("long")
         .alias("cjk"),
        F.length(F.regexp_replace(txt, "[^0-9]", "")).cast("long")
         .alias("dig"))
    g = d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nc").cast("long").alias("chars"),
        F.sum("latin").cast("long").alias("sl"),
        F.sum("cyr").cast("long").alias("sc"),
        F.sum("cjk").cast("long").alias("sk"),
        F.sum("dig").cast("long").alias("sd"),
        F.sum(F.when((F.col("latin") > 0) & (F.col("cyr") > 0), 1)
               .otherwise(0)).cast("long").alias("mixed_script_docs"))
    bp = lambda c: (F.when(F.col("chars") > 0,  # noqa: E731
                           F.expr(f"{c} * 10000 DIV chars"))
                     .otherwise(F.lit(None).cast("long")))
    return g.select("lang", "n_docs", "chars",
                    bp("sl").alias("latin_bp"), bp("sc").alias("cyr_bp"),
                    bp("sk").alias("cjk_bp"), bp("sd").alias("digit_bp"),
                    "mixed_script_docs")


# =====================================================================
# distributional / local-linear causal estimators
# =====================================================================

@query(
    "q_quantile_treatment_effect",
    oracle="""
    WITH ev AS (
      SELECT CAST(('0x' || substring(md5('qte:' || CAST(event_id AS VARCHAR)),
                                     1, 8))::BIGINT % 2 AS BIGINT) AS t,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
    ),
    grid AS (
      SELECT t, y, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY t, y
    ),
    cum AS (
      SELECT t, y, CAST(SUM(cnt) OVER (PARTITION BY t ORDER BY y
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cd
      FROM grid
    ),
    na AS (SELECT t, CAST(SUM(cnt) AS BIGINT) AS n FROM grid GROUP BY t),
    qs AS (SELECT UNNEST([2500, 5000, 7500]) AS q_bp),
    kq AS (
      SELECT na.t, na.n, qs.q_bp,
             CAST((qs.q_bp * na.n + 9999) // 10000 AS BIGINT) AS k
      FROM na CROSS JOIN qs
    ),
    vq AS (
      SELECT kq.t, kq.q_bp, kq.n,
             MIN(CASE WHEN cum.cd >= kq.k THEN cum.y END) AS v
      FROM kq JOIN cum ON cum.t = kq.t
      GROUP BY kq.t, kq.q_bp, kq.n
    )
    SELECT a.q_bp AS q_bp, a.n AS n_treat, b.n AS n_ctrl,
           CAST(a.v AS BIGINT) AS v_treat, CAST(b.v AS BIGINT) AS v_ctrl,
           CAST(a.v - b.v AS BIGINT) AS qte_cents
    FROM vq a JOIN vq b ON a.q_bp = b.q_bp AND a.t = 1 AND b.t = 0
    """,
)
def q_quantile_treatment_effect(spark, sf_dir):
    """Quantile treatment effects at the quartiles: the DISTRIBUTIONAL
    causal readout (did the treatment move the median? the tails?) that
    q_ipw_ate's means can't see — treatment shifting only the p75 is
    invisible to an ATE.  md5 arms; per-arm type-1 quantiles are exact:
    k = ceil(q*n) off the per-arm distinct-cents grid with a
    conditional-min collapse (the q_lorenz_curve boundary shape), so
    v_q and the QTE differences are exact integers — no interpolation
    doubles.  Scale: the per-arm cumulative is a window PARTITIONED by
    arm over the distinct-value grid (grid-sized sort payload); the
    quantile probe is a broadcast 6-row join.  Output: one row per
    quartile with both arms' n and values."""
    lane = F.conv(F.substring(F.md5(F.concat(
        F.lit("qte:"), F.col("event_id").cast("string"))), 1, 8),
        16, 10).cast("long") % 2
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_id").isNotNull())
          .select(lane.alias("t"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y")))
    grid = ev.groupBy("t", "y").agg(F.count("*").cast("long").alias("cnt"))
    wcum = (W.partitionBy("t").orderBy("y")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = grid.withColumn("cd", F.sum("cnt").over(wcum).cast("long"))
    na = grid.groupBy("t").agg(F.sum("cnt").cast("long").alias("n"))
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(2500), F.lit(5000), F.lit(7500)))
         .alias("q_bp"))
    kq = (na.crossJoin(F.broadcast(qs))
            .withColumn("k", F.expr("(q_bp * n + 9999) DIV 10000")))
    vq = (F.broadcast(kq).join(cum, "t")
           .groupBy("t", "q_bp", "n")
           .agg(F.min(F.when(F.col("cd") >= F.col("k"), F.col("y")))
                 .alias("v")))
    a = vq.where(F.col("t") == 1).select(
        "q_bp", F.col("n").alias("n_treat"), F.col("v").alias("v_treat"))
    b = vq.where(F.col("t") == 0).select(
        "q_bp", F.col("n").alias("n_ctrl"), F.col("v").alias("v_ctrl"))
    return (a.join(b, "q_bp")
             .select("q_bp", "n_treat", "n_ctrl",
                     F.col("v_treat").cast("long").alias("v_treat"),
                     F.col("v_ctrl").cast("long").alias("v_ctrl"),
                     (F.col("v_treat") - F.col("v_ctrl")).cast("long")
                      .alias("qte_cents")))


@query(
    "q_regression_discontinuity",
    oracle="""
    WITH ev AS (
      SELECT day(CAST(ts AS TIMESTAMP)) - 16 AS x,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    w AS (
      SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side,
             CAST(x AS BIGINT) AS x, y
      FROM ev WHERE x >= -7 AND x <= 6
    ),
    m AS (
      SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM w GROUP BY side
    ),
    fit AS (
      SELECT side, n,
             CASE WHEN n * sxx - sx * sx <> 0 THEN
               (CAST(sy AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) / CAST(100 AS DOUBLE)
             ELSE NULL END AS a0
      FROM m
    )
    SELECT r.n AS n_right, l.n AS n_left,
           ROUND(r.a0, 6) AS limit_right, ROUND(l.a0, 6) AS limit_left,
           CASE WHEN r.a0 IS NOT NULL AND l.a0 IS NOT NULL
                THEN ROUND(r.a0 - l.a0, 6) ELSE NULL END AS rd_estimate
    FROM fit r JOIN fit l ON r.side = 1 AND l.side = 0
    """,
)
def q_regression_discontinuity(spark, sf_dir):
    """Sharp regression discontinuity at the mid-month cutoff: local
    linear fits on each side of day 16 (bandwidth 7 days), compared at
    the boundary — the quasi-experimental estimator for 'did the
    mid-month policy change move the metric', closing the causal shelf
    next to q_diff_in_diff (panel) and q_ipw_ate (confounding).  Each
    side's OLS intercept at the cutoff comes from exact BIGINT moments
    (n, Sx, Sxx, Sy, Sxy over the centered day axis) through one staged
    IEEE expression — slope b = (n·Sxy - Sx·Sy)/(n·Sxx - Sx²),
    intercept (Sy - b·Sx)/n — identical association on both engines,
    R6 dollars.  Degenerate sides (zero day variance) yield NULL.
    Scale: one 14-day-bounded filter + one 2-row rollup; no joins, no
    windows."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select((F.dayofmonth("ts") - 16).cast("long").alias("x"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y")))
    w = (ev.where((F.col("x") >= -7) & (F.col("x") <= 6))
           .withColumn("side", F.when(F.col("x") >= 0, 1).otherwise(0)))
    m = w.groupBy("side").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"))
    b_num = (F.col("n").cast("double") * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
    b_den = (F.col("n").cast("double") * F.col("sxx").cast("double")
             - F.col("sx").cast("double") * F.col("sx").cast("double"))
    a0 = ((F.col("sy").cast("double")
           - b_num / b_den * F.col("sx").cast("double"))
          / F.col("n").cast("double") / F.lit(100.0))
    fit = m.select(
        "side", "n",
        F.when(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0,
               a0).otherwise(F.lit(None).cast("double")).alias("a0"))
    r = fit.where(F.col("side") == 1).select(
        F.col("n").alias("n_right"), F.col("a0").alias("ar"))
    l = fit.where(F.col("side") == 0).select(
        F.col("n").alias("n_left"), F.col("a0").alias("al"))
    return (r.crossJoin(l)
             .select("n_right", "n_left",
                     pround(F.col("ar"), 6).alias("limit_right"),
                     pround(F.col("al"), 6).alias("limit_left"),
                     F.when(F.col("ar").isNotNull()
                            & F.col("al").isNotNull(),
                            pround(F.col("ar") - F.col("al"), 6))
                      .otherwise(F.lit(None).cast("double"))
                      .alias("rd_estimate")))


# =====================================================================
# recency weighting
# =====================================================================

@query(
    "q_freshness_decay",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    mx AS (SELECT CAST(MAX(d) AS BIGINT) AS md FROM ev),
    cell AS (
      SELECT event_type, CAST(mx.md - d AS BIGINT) AS age,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ev CROSS JOIN mx GROUP BY event_type, mx.md - d
    ),
    wts AS (
      SELECT age,
             CAST(FLOOR(EXP(CAST(-age AS DOUBLE) / CAST(7 AS DOUBLE))
                        * CAST(1000000000 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS w_e9
      FROM (SELECT DISTINCT age FROM cell)
    )
    SELECT cell.event_type,
           CAST(SUM(cell.cnt) AS BIGINT) AS n,
           CAST(MIN(cell.age) AS BIGINT) AS newest_age_days,
           CAST(SUM(cell.cnt * wts.w_e9) AS BIGINT) AS decayed_e9,
           ROUND(CAST(SUM(cell.cnt * wts.w_e9) AS DOUBLE)
                 / (CAST(SUM(cell.cnt) AS DOUBLE)
                    * CAST(1000000000 AS DOUBLE)), 6) AS freshness
    FROM cell JOIN wts USING (age)
    GROUP BY cell.event_type
    """,
)
def q_freshness_decay(spark, sf_dir):
    """Exponential freshness weighting (7-day half-life-ish decay
    exp(-age/7)) of event mass per type — the recency prior a
    training-data mixture applies when newer documents should count
    more (news vs reference corpora), the time-axis sibling of
    q_mixture_sample's source weights.  Age is computed in integer
    epoch-DAYS on both engines (epoch_us DIV 86400000000 — the repo's
    integer-time convention, immune to interval-division truncation);
    exp() is evaluated once per DISTINCT age on the bounded day axis
    and quantized to w_e9 integers (the per-distinct-value
    transcendental recipe), so the corpus-scale decayed mass
    sum(cnt * w_e9) is an exact BIGINT and the hash cannot flip.
    freshness = decayed mass / n in [0,1] (1.0 = everything from the
    newest day).  Scale: one (type, age) grid rollup + a <=|days|-row
    weight join — no windows, no raw-row transcendentals."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.expr("unix_micros(ts) DIV 86400000000").alias("d")))
    mx = ev.agg(F.max("d").cast("long").alias("md"))
    cell = (ev.crossJoin(F.broadcast(mx))
              .groupBy("event_type",
                       (F.col("md") - F.col("d")).cast("long").alias("age"))
              .agg(F.count("*").cast("long").alias("cnt")))
    wts = (cell.select("age").distinct()
               .select("age",
                       F.floor(F.exp((-F.col("age")).cast("double")
                                     / F.lit(7.0))
                               * F.lit(1e9) + F.lit(0.5)).cast("long")
                        .alias("w_e9")))
    g = (cell.join(F.broadcast(wts), "age")
             .groupBy("event_type")
             .agg(F.sum("cnt").cast("long").alias("n"),
                  F.min("age").cast("long").alias("newest_age_days"),
                  F.sum(F.col("cnt") * F.col("w_e9")).cast("long")
                   .alias("decayed_e9")))
    return g.select(
        "event_type", "n", "newest_age_days", "decayed_e9",
        pround(F.col("decayed_e9").cast("double")
               / (F.col("n").cast("double") * F.lit(1e9)), 6)
         .alias("freshness"))


@query(
    "q_winrate_matrix",
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
             CASE WHEN a.q > b.q THEN 1 ELSE 0 END AS w1f
      FROM ob a JOIN ob b ON a.ok = b.ok AND a.b < b.b
      WHERE a.q <> b.q
    ),
    g AS (
      SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(w1f) AS BIGINT) AS w1
      FROM pr GROUP BY b1, b2
    ),
    m AS (
      SELECT b1, b2, n, w1, CAST(w1 * 10000 // n AS BIGINT) AS rate_bp,
             CAST(w1 AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
             CAST(n AS DOUBLE) AS nd, CAST(1.96 AS DOUBLE) AS z
      FROM g WHERE n >= 5
    )
    SELECT b1, b2, n, w1, rate_bp,
           ROUND((ph + (z * z) / (CAST(2 AS DOUBLE) * nd)
                  - z * SQRT(ph * (CAST(1 AS DOUBLE) - ph) / nd
                             + (z * z) / (CAST(4 AS DOUBLE) * nd * nd)))
                 / (CAST(1 AS DOUBLE) + (z * z) / nd), 6) AS wilson_lo
    FROM m
    """,
)
def q_winrate_matrix(spark, sf_dir):
    """Pairwise win-rate matrix with Wilson lower bounds: for each
    brand duel pair (min 5 comparisons), b1's win rate and its
    conservative 95% lower bound — the per-matchup diagnostic UNDER
    q_bradley_terry's global strengths (BT says who is strong overall;
    this says which specific matchups are decisively settled vs still
    noise — exactly the readout an RLHF preference dataset needs to
    decide where to spend more comparisons).  Same bounded duel
    machinery as q_bradley_terry (per-order fan-out, <=300-pair grid);
    the Wilson bound is the q_wilson_interval IEEE-exact recipe on
    exact integer (w1, n).  Output one row per surviving ordered pair."""
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
    g = (a.join(bb, "ok")
          .where((F.col("b1") < F.col("b2"))
                 & (F.col("q1") != F.col("q2")))
          .groupBy("b1", "b2")
          .agg(F.count("*").cast("long").alias("n"),
               F.sum(F.when(F.col("q1") > F.col("q2"), 1).otherwise(0))
                .cast("long").alias("w1"))
          .where(F.col("n") >= 5))
    nd = F.col("n").cast("double")
    z = F.lit(1.96)
    ph = F.col("w1").cast("double") / nd
    lo = ((ph + (z * z) / (F.lit(2.0) * nd)
           - z * F.sqrt(ph * (F.lit(1.0) - ph) / nd
                        + (z * z) / (F.lit(4.0) * nd * nd)))
          / (F.lit(1.0) + (z * z) / nd))
    return g.select("b1", "b2", "n", "w1",
                    F.expr("w1 * 10000 DIV n").alias("rate_bp"),
                    pround(lo, 6).alias("wilson_lo"))


# =====================================================================
# community quality / multi-rater agreement
# =====================================================================

@query(
    "q_modularity",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      WHERE l1.l_quantity > 25 AND l2.l_quantity > 25
    ),
    lab AS (
      SELECT pr.a, pr.b, pa.p_brand AS ca, pb.p_brand AS cb
      FROM pairs pr JOIN part pa ON pa.p_partkey = pr.a
                    JOIN part pb ON pb.p_partkey = pr.b
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM lab),
    ein AS (
      SELECT ca AS community, CAST(COUNT(*) AS BIGINT) AS e_in
      FROM lab WHERE ca = cb GROUP BY ca
    ),
    deg AS (
      SELECT c AS community, CAST(COUNT(*) AS BIGINT) AS d_c FROM (
        SELECT ca AS c FROM lab UNION ALL SELECT cb AS c FROM lab
      ) GROUP BY c
    ),
    per AS (
      SELECT deg.community, COALESCE(ein.e_in, 0) AS e_in, deg.d_c,
             CAST(4 * m.m * COALESCE(ein.e_in, 0) - deg.d_c * deg.d_c
                  AS BIGINT) AS num_c
      FROM deg LEFT JOIN ein ON ein.community = deg.community
      CROSS JOIN m
    ),
    q AS (SELECT CAST(SUM(num_c) AS BIGINT) AS s_num,
                 CAST(COUNT(*) AS BIGINT) AS k FROM per)
    SELECT per.community, CAST(per.e_in AS BIGINT) AS e_in, per.d_c,
           per.num_c, m.m AS m_edges, q.k AS n_communities,
           ROUND(CAST(q.s_num AS DOUBLE)
                 / (CAST(4 AS DOUBLE) * CAST(m.m AS DOUBLE)
                    * CAST(m.m AS DOUBLE)), 6) AS modularity
    FROM per CROSS JOIN m CROSS JOIN q
    """,
)
def q_modularity(spark, sf_dir):
    """Newman modularity of the brand partition over the co-purchase
    part graph: does purchasing cluster along brand lines?  The
    community-QUALITY scalar for any partition the cluster operators
    produce (q_cc_large_small_star components, q_simhash_clusters,
    label propagation) — here evaluated on the natural brand
    communities.  FULLY integer-exact: Q = sum_c(e_cc/m - (d_c/2m)^2)
    rearranges to sum_c(4*m*e_cc - d_c^2) / (4m^2), whose numerator
    terms and total are exact BIGINTs (bound: d_c^2 <= 4m^2 -> valid
    to m ~ 1.5e9 edges) — ONE division at the end, the hash cannot
    flip.  Per-community rows carry the exact cores; the scalar is
    attached from a broadcast 1-row aggregate.  Scale: the edge list
    is the same bounded per-order fan-out as the graph family; labels
    join via two broadcast part-dim lookups; everything after is
    |brands|-sized."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey"))
    e1 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("a"))
    e2 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("b"))
    pairs = (e1.join(e2, "l_orderkey")
               .where(F.col("a") < F.col("b"))
               .select("a", "b").distinct())
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lab = (pairs
           .join(F.broadcast(pt.select(F.col("p_partkey").alias("a"),
                                       F.col("p_brand").alias("ca"))), "a")
           .join(F.broadcast(pt.select(F.col("p_partkey").alias("b"),
                                       F.col("p_brand").alias("cb"))), "b"))
    m = lab.agg(F.count("*").cast("long").alias("m"))
    ein = (lab.where(F.col("ca") == F.col("cb"))
              .groupBy(F.col("ca").alias("community"))
              .agg(F.count("*").cast("long").alias("e_in")))
    deg = (lab.select(F.col("ca").alias("c"))
              .unionAll(lab.select(F.col("cb").alias("c")))
              .groupBy(F.col("c").alias("community"))
              .agg(F.count("*").cast("long").alias("d_c")))
    per = (deg.join(ein, "community", "left")
              .select("community",
                      F.coalesce("e_in", F.lit(0)).cast("long")
                       .alias("e_in"), "d_c")
              .crossJoin(F.broadcast(m))
              .withColumn("num_c",
                          (4 * F.col("m") * F.col("e_in")
                           - F.col("d_c") * F.col("d_c")).cast("long")))
    q = per.agg(F.sum("num_c").cast("long").alias("s_num"),
                F.count("*").cast("long").alias("k"))
    return (per.crossJoin(F.broadcast(q))
               .select("community", "e_in", "d_c", "num_c",
                       F.col("m").alias("m_edges"),
                       F.col("k").alias("n_communities"),
                       pround(F.col("s_num").cast("double")
                              / (F.lit(4.0) * F.col("m").cast("double")
                                 * F.col("m").cast("double")), 6)
                        .alias("modularity")))


@query(
    "q_fleiss_kappa",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN n_chars < 120 THEN 0
                  WHEN n_chars < 300 THEN 1 ELSE 2 END AS true_cat
      FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
    ),
    votes AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substring(md5('rate' || CAST(r.r AS VARCHAR)
                        || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10 < 2
                  THEN CAST(('0x' || substring(md5('cat' || CAST(r.r AS VARCHAR)
                       || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 3 AS BIGINT)
                  ELSE CAST(true_cat AS BIGINT) END AS cat
      FROM d CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS r) r
    ),
    cell AS (
      SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS n_ij
      FROM votes GROUP BY doc_id, cat
    ),
    item AS (
      SELECT doc_id, CAST(SUM(n_ij * n_ij) - 3 AS BIGINT) AS agree6
      FROM cell GROUP BY doc_id
    ),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
                 CAST(SUM(agree6) AS BIGINT) AS s_agree FROM item),
    catc AS (
      SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS t_sq FROM (
        SELECT cat, CAST(SUM(n_ij) AS BIGINT) AS cnt
        FROM cell GROUP BY cat
      )
    )
    SELECT s.n_items, s.s_agree, catc.t_sq,
           ROUND(CAST(s.s_agree AS DOUBLE)
                 / (CAST(6 AS DOUBLE) * CAST(s.n_items AS DOUBLE)), 6)
             AS p_bar,
           ROUND(CAST(catc.t_sq AS DOUBLE)
                 / (CAST(9 AS DOUBLE) * CAST(s.n_items AS DOUBLE)
                    * CAST(s.n_items AS DOUBLE)), 6) AS p_e,
           CASE WHEN CAST(catc.t_sq AS DOUBLE)
                     / (CAST(9 AS DOUBLE) * CAST(s.n_items AS DOUBLE)
                        * CAST(s.n_items AS DOUBLE))
                     < CAST(1 AS DOUBLE) THEN
             ROUND((CAST(s.s_agree AS DOUBLE)
                    / (CAST(6 AS DOUBLE) * CAST(s.n_items AS DOUBLE))
                    - CAST(catc.t_sq AS DOUBLE)
                      / (CAST(9 AS DOUBLE) * CAST(s.n_items AS DOUBLE)
                         * CAST(s.n_items AS DOUBLE)))
                   / (CAST(1 AS DOUBLE)
                      - CAST(catc.t_sq AS DOUBLE)
                        / (CAST(9 AS DOUBLE) * CAST(s.n_items AS DOUBLE)
                           * CAST(s.n_items AS DOUBLE))), 6)
           ELSE NULL END AS fleiss_kappa
    FROM s CROSS JOIN catc
    """,
)
def q_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa for fixed-panel multi-rater agreement: 3
    deterministic md5 'annotators' each label every doc into 3 length
    buckets (20% of votes replaced by an md5 random category —
    simulating noisy raters), and kappa measures agreement beyond
    chance — the FIXED-PANEL companion to Krippendorff's alpha
    (which handles missing ratings) and q_cohens_kappa (2 raters);
    the standard QC gate for annotation-vendor batches.  Exactness:
    per-item agreement sums sum_j(n_ij^2) - n are small exact integers
    summed to BIGINT S; category masses square to exact T; P_bar =
    S/(6N), P_e = T/(9N^2), kappa = (P_bar - P_e)/(1 - P_e) — one
    staged IEEE expression from three BIGINTs, R6; NULL when P_e = 1
    (all votes one category).  Scale: votes = 3 map-side lanes per
    doc (a 3-row broadcast cross), then two grid rollups."""
    d = (load_table(spark, sf_dir, "documents")
         .where(F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
         .select("doc_id",
                 F.when(F.col("n_chars") < 120, 0)
                  .when(F.col("n_chars") < 300, 1).otherwise(2)
                  .alias("true_cat")))
    raters = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("r"))
    votes = d.crossJoin(F.broadcast(raters))
    noise = F.conv(F.substring(F.md5(F.concat(
        F.lit("rate"), F.col("r").cast("string"), F.lit(":"),
        F.col("doc_id").cast("string"))), 1, 8), 16, 10) \
        .cast("long") % 10
    rndcat = F.conv(F.substring(F.md5(F.concat(
        F.lit("cat"), F.col("r").cast("string"), F.lit(":"),
        F.col("doc_id").cast("string"))), 1, 8), 16, 10) \
        .cast("long") % 3
    votes = votes.select(
        "doc_id",
        F.when(noise < 2, rndcat)
         .otherwise(F.col("true_cat").cast("long")).alias("cat"))
    cell = votes.groupBy("doc_id", "cat").agg(
        F.count("*").cast("long").alias("n_ij"))
    item = cell.groupBy("doc_id").agg(
        (F.sum(F.col("n_ij") * F.col("n_ij")) - 3).cast("long")
         .alias("agree6"))
    s = item.agg(F.count("*").cast("long").alias("n_items"),
                 F.sum("agree6").cast("long").alias("s_agree"))
    catc = (cell.groupBy("cat").agg(F.sum("n_ij").cast("long")
                                     .alias("cnt"))
                .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("long")
                      .alias("t_sq")))
    j = s.crossJoin(F.broadcast(catc))
    nd = F.col("n_items").cast("double")
    p_bar = F.col("s_agree").cast("double") / (F.lit(6.0) * nd)
    p_e = F.col("t_sq").cast("double") / (F.lit(9.0) * nd * nd)
    return j.select(
        "n_items", "s_agree", "t_sq",
        pround(p_bar, 6).alias("p_bar"),
        pround(p_e, 6).alias("p_e"),
        F.when(p_e < F.lit(1.0),
               pround((p_bar - p_e) / (F.lit(1.0) - p_e), 6))
         .otherwise(F.lit(None).cast("double")).alias("fleiss_kappa"))


@query(
    "q_effective_rank",
    oracle="""
    WITH src AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (
      SELECT UNNEST(range(1, (SELECT MAX(len(v)) FROM src) + 1)) AS i
    ),
    el AS (
      SELECT vec_id, CAST(i - 1 AS INT) AS i, v[i] AS x
      FROM src CROSS JOIN dims
    ),
    gram AS (
      SELECT a.i AS i, b.i AS j,
             CAST(FLOOR(SUM(a.x * b.x) * CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS s_e2
      FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN i = j THEN s_e2 ELSE 0 END)
                  AS BIGINT) AS trace_e2,
             CAST(SUM(CASE WHEN i = j THEN s_e2 * s_e2
                           ELSE 2 * s_e2 * s_e2 END) AS BIGINT) AS frob_e4,
             CAST(MAX(i) + 1 AS BIGINT) AS dim
      FROM gram
    )
    SELECT dim, trace_e2, frob_e4,
           CASE WHEN frob_e4 > 0
                THEN ROUND(CAST(trace_e2 AS DOUBLE)
                           * CAST(trace_e2 AS DOUBLE)
                           / CAST(frob_e4 AS DOUBLE), 6)
                ELSE NULL END AS effective_rank
    FROM agg
    """,
)
def q_effective_rank(spark, sf_dir):
    """Effective rank (participation ratio) of the embedding Gram
    matrix: (tr S)^2 / ||S||_F^2 = (sum lambda)^2 / sum lambda^2 — how
    many dimensions the representation REALLY uses, without any
    eigendecomposition (the collapse diagnostic for embedding spaces:
    anisotropic/collapsed representations score far below the ambient
    64).  Chains the one-pass GEMM Gram operator (q_embedding_
    covariance's engine: dim^2 partials per Arrow batch, shuffle
    carries 2080 scalars regardless of row count); entries snap to an
    e2 integer grid, so trace and Frobenius mass are exact BIGINT sums
    (off-diagonals doubled for the symmetric full matrix; overflow
    bound s_e2^2 * 4096 cells -> valid to ~5e5 rows documented) and
    the ratio is one terminal division, R6."""
    from access_mopper_spark.operators.similarity import embedding_covariance
    emb = _wide(load_table(spark, sf_dir, "embeddings"))
    cov = embedding_covariance(emb, dim=64)
    g = cov.select(
        "i", "j",
        F.floor(F.col("s") * F.lit(100.0) + F.lit(0.5)).cast("long")
         .alias("s_e2"))
    agg = g.agg(
        F.sum(F.when(F.col("i") == F.col("j"), F.col("s_e2"))
               .otherwise(0)).cast("long").alias("trace_e2"),
        F.sum(F.when(F.col("i") == F.col("j"),
                     F.col("s_e2") * F.col("s_e2"))
               .otherwise(2 * F.col("s_e2") * F.col("s_e2")))
         .cast("long").alias("frob_e4"),
        (F.max("i") + 1).cast("long").alias("dim"))
    return agg.select(
        "dim", "trace_e2", "frob_e4",
        F.when(F.col("frob_e4") > 0,
               pround(F.col("trace_e2").cast("double")
                      * F.col("trace_e2").cast("double")
                      / F.col("frob_e4").cast("double"), 6))
         .otherwise(F.lit(None).cast("double")).alias("effective_rank"))


# =====================================================================
# multi-rater ordinal concordance
# =====================================================================

@query(
    "q_kendall_w",
    oracle="""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS len FROM documents
      WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
    ),
    sc AS (
      SELECT d.doc_id, r.r,
             d.len + ('0x' || substring(md5('kw' || CAST(r.r AS VARCHAR)
                      || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                     % 101 - 50 AS s
      FROM d CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS r) r
    ),
    grid AS (SELECT r, s, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM sc GROUP BY r, s),
    gr AS (
      SELECT r, s,
             CAST(2 * SUM(cnt) OVER (PARTITION BY r ORDER BY s
                  ROWS UNBOUNDED PRECEDING) - cnt + 1 AS BIGINT) AS r2
      FROM grid
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    rsum AS (
      SELECT sc.doc_id, CAST(SUM(gr.r2) AS BIGINT) AS r2sum
      FROM sc JOIN gr ON gr.r = sc.r AND gr.s = sc.s
      GROUP BY sc.doc_id
    ),
    dev AS (
      SELECT CAST((r2sum - 3 * (tot.n + 1)) * 100000 // (6 * tot.n)
                  AS BIGINT) AS dq
      FROM rsum CROSS JOIN tot
    ),
    s2 AS (SELECT CAST(SUM(dq * dq) AS BIGINT) AS s2q FROM dev),
    ties AS (SELECT CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS t_sum
             FROM grid)
    SELECT tot.n AS n_items, CAST(3 AS BIGINT) AS m_raters,
           s2.s2q AS s2q, ties.t_sum AS t_sum,
           CASE WHEN CAST(9 AS DOUBLE)
                     * (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)
                        * CAST(tot.n AS DOUBLE) - CAST(tot.n AS DOUBLE))
                     - CAST(3 AS DOUBLE) * CAST(ties.t_sum AS DOUBLE) > 0
                THEN ROUND(CAST(108 AS DOUBLE) * CAST(tot.n AS DOUBLE)
                     * CAST(tot.n AS DOUBLE) * CAST(s2.s2q AS DOUBLE)
                     / (CAST(10000000000 AS DOUBLE)
                        * (CAST(9 AS DOUBLE)
                           * (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)
                              * CAST(tot.n AS DOUBLE)
                              - CAST(tot.n AS DOUBLE))
                           - CAST(3 AS DOUBLE)
                             * CAST(ties.t_sum AS DOUBLE))), 6)
                ELSE NULL END AS w
    FROM tot CROSS JOIN s2 CROSS JOIN ties
    """,
)
def q_kendall_w(spark, sf_dir):
    """Kendall's coefficient of concordance W for 3 md5 'raters'
    ordinally scoring every doc (length plus a deterministic +-50
    perturbation lane): do the raters RANK the corpus the same way? —
    the ordinal companion to q_fleiss_kappa (categorical agreement)
    and the panel version of q_spearman_rho (W is the average pairwise
    Spearman, affinely).  Tie-corrected: midranks per rater via
    DOUBLED ranks over each rater's distinct-score grid; per-item rank
    masses R2_i are exact BIGINTs, centered deviations quantize to the
    1e5 DIV grid (the overflow-safe q_spearman_rho recipe — the raw
    sum of squared rank deviations grows n^3), and the tie correction
    sum(t^3 - t) is exact per grid cell (bound: tie-group <= 2e6 rows;
    the +-50 noise spreads any constant-length corpus over >= 101
    scores, documented).  W reconstructs the classic statistic in one
    staged double expression; NULL when full ties degenerate the
    denominator.  Scale: per-rater rank cumulatives run on (rater,
    distinct-score) grids; the only corpus-sized operations are the
    score projection and two keyed rollups."""
    d = (load_table(spark, sf_dir, "documents")
         .where(F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
         .select("doc_id", F.col("n_chars").cast("long").alias("len")))
    raters = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("r"))
    noise = F.conv(F.substring(F.md5(F.concat(
        F.lit("kw"), F.col("r").cast("string"), F.lit(":"),
        F.col("doc_id").cast("string"))), 1, 8), 16, 10) \
        .cast("long") % 101 - 50
    sc = (d.crossJoin(F.broadcast(raters))
           .select("doc_id", "r", (F.col("len") + noise).alias("s")))
    grid = sc.groupBy("r", "s").agg(F.count("*").cast("long").alias("cnt"))
    wrun = (W.partitionBy("r").orderBy("s")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    gr = grid.select(
        "r", "s",
        (2 * F.sum("cnt").over(wrun) - F.col("cnt") + 1).cast("long")
         .alias("r2"))
    tot = d.agg(F.count("*").cast("long").alias("n"))
    rsum = (sc.join(gr, ["r", "s"])
              .groupBy("doc_id")
              .agg(F.sum("r2").cast("long").alias("r2sum")))
    dev = (rsum.crossJoin(F.broadcast(tot))
               .select(F.expr("(r2sum - 3 * (n + 1)) * 100000 DIV (6 * n)")
                        .alias("dq")))
    s2 = dev.agg(F.sum(F.col("dq") * F.col("dq")).cast("long")
                  .alias("s2q"))
    ties = grid.agg(
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
         .cast("long").alias("t_sum"))
    j = tot.crossJoin(F.broadcast(s2)).crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    den = (F.lit(9.0) * (nd * nd * nd - nd)
           - F.lit(3.0) * F.col("t_sum").cast("double"))
    w_stat = (F.lit(108.0) * nd * nd * F.col("s2q").cast("double")
              / (F.lit(1e10) * den))
    return j.select(
        F.col("n").alias("n_items"),
        F.lit(3).cast("long").alias("m_raters"),
        "s2q", "t_sum",
        F.when(den > 0, pround(w_stat, 6))
         .otherwise(F.lit(None).cast("double")).alias("w"))


@query(
    "q_design_effect",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
    ),
    c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(SUM(y) AS BIGINT) AS s_c
      FROM ev GROUP BY user_id
    ),
    g AS (
      SELECT CAST(SUM(n_c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(s_c) AS BIGINT) AS s,
             CAST(SUM(s_c * s_c * 10 // n_c) AS BIGINT) AS cf_e1,
             CAST(SUM(n_c * n_c) AS BIGINT) AS nn2
      FROM c
    ),
    q AS (SELECT CAST(SUM(y * y) AS BIGINT) AS qq FROM ev),
    t AS (
      SELECT g.n, g.k, g.nn2,
             CAST(g.cf_e1 - CAST(FLOOR(CAST(g.s AS DOUBLE)
                  * CAST(g.s AS DOUBLE) * CAST(10 AS DOUBLE)
                  / CAST(g.n AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
                  AS BIGINT) AS ssb_e1,
             CAST(q.qq * 10 - g.cf_e1 AS BIGINT) AS ssw_e1
      FROM g CROSS JOIN q
    )
    SELECT n, k, ssb_e1, ssw_e1,
           CASE WHEN k >= 2 AND n > k AND ssw_e1 > 0 AND
                     CAST(ssb_e1 AS DOUBLE) / CAST(k - 1 AS DOUBLE)
                     + ((CAST(n AS DOUBLE)
                         - CAST(nn2 AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(k - 1 AS DOUBLE) - CAST(1 AS DOUBLE))
                       * CAST(ssw_e1 AS DOUBLE)
                       / CAST(n - k AS DOUBLE) <> 0
                THEN ROUND((CAST(ssb_e1 AS DOUBLE) / CAST(k - 1 AS DOUBLE)
                            - CAST(ssw_e1 AS DOUBLE)
                              / CAST(n - k AS DOUBLE))
                     / (CAST(ssb_e1 AS DOUBLE) / CAST(k - 1 AS DOUBLE)
                        + ((CAST(n AS DOUBLE)
                            - CAST(nn2 AS DOUBLE) / CAST(n AS DOUBLE))
                           / CAST(k - 1 AS DOUBLE) - CAST(1 AS DOUBLE))
                          * CAST(ssw_e1 AS DOUBLE)
                          / CAST(n - k AS DOUBLE)), 6)
                ELSE NULL END AS icc,
           CASE WHEN k >= 2 AND n > k AND ssw_e1 > 0 AND
                     CAST(ssb_e1 AS DOUBLE) / CAST(k - 1 AS DOUBLE)
                     + ((CAST(n AS DOUBLE)
                         - CAST(nn2 AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(k - 1 AS DOUBLE) - CAST(1 AS DOUBLE))
                       * CAST(ssw_e1 AS DOUBLE)
                       / CAST(n - k AS DOUBLE) <> 0
                THEN ROUND(CAST(1 AS DOUBLE)
                     + (CAST(n AS DOUBLE) / CAST(k AS DOUBLE)
                        - CAST(1 AS DOUBLE))
                       * ((CAST(ssb_e1 AS DOUBLE) / CAST(k - 1 AS DOUBLE)
                           - CAST(ssw_e1 AS DOUBLE)
                             / CAST(n - k AS DOUBLE))
                          / (CAST(ssb_e1 AS DOUBLE)
                             / CAST(k - 1 AS DOUBLE)
                             + ((CAST(n AS DOUBLE)
                                 - CAST(nn2 AS DOUBLE)
                                   / CAST(n AS DOUBLE))
                                / CAST(k - 1 AS DOUBLE)
                                - CAST(1 AS DOUBLE))
                               * CAST(ssw_e1 AS DOUBLE)
                               / CAST(n - k AS DOUBLE))), 6)
                ELSE NULL END AS deff
    FROM t
    """,
)
def q_design_effect(spark, sf_dir):
    """Design effect (Kish DEFF) for cluster-randomized experiments on
    the user clustering: when you randomize USERS but measure EVENTS,
    how much does within-user correlation inflate the variance — i.e.
    how many event-level samples is one really worth?  DEFF =
    1 + (m_bar - 1)*ICC with the one-way ANOVA ICC estimator (MSB,
    MSW, ANOVA mean cluster size m0 = (n - sum n_c^2/n)/(k-1)) — the
    missing piece between q_ab_ttest (assumes independence) and
    q_diff_in_diff (unit-level arms): it QUANTIFIES the clustering
    penalty.  Integer cores: per-cluster correction factors
    s_c^2*10 DIV n_c are exact BIGINTs (bound: per-cluster cents mass
    <= 9.5e8, documented), the global CF stages one deterministic
    double floor, and SSB/SSW ship as exact e1 integers; ICC and DEFF
    are staged IEEE expressions with degenerate guards.  One cluster
    rollup + one 1-row reduce — no windows, no joins."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
          .select("user_id",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y")))
    c = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_c"),
        F.sum("y").cast("long").alias("s_c"))
    g = c.agg(F.sum("n_c").cast("long").alias("n"),
              F.count("*").cast("long").alias("k"),
              F.sum("s_c").cast("long").alias("s"),
              F.sum(F.expr("s_c * s_c * 10 DIV n_c")).cast("long")
               .alias("cf_e1"),
              F.sum(F.col("n_c") * F.col("n_c")).cast("long").alias("nn2"))
    q = ev.agg(F.sum(F.col("y") * F.col("y")).cast("long").alias("qq"))
    t = (g.crossJoin(F.broadcast(q))
          .select("n", "k", "nn2",
                  (F.col("cf_e1")
                   - F.floor(F.col("s").cast("double")
                             * F.col("s").cast("double") * F.lit(10.0)
                             / F.col("n").cast("double") + F.lit(0.5))
                      .cast("long")).cast("long").alias("ssb_e1"),
                  (F.col("qq") * 10 - F.col("cf_e1")).cast("long")
                   .alias("ssw_e1")))
    msb = F.col("ssb_e1").cast("double") / (F.col("k") - 1).cast("double")
    msw = F.col("ssw_e1").cast("double") / (F.col("n") - F.col("k")) \
        .cast("double")
    m0 = ((F.col("n").cast("double")
           - F.col("nn2").cast("double") / F.col("n").cast("double"))
          / (F.col("k") - 1).cast("double"))
    icc_den = msb + (m0 - F.lit(1.0)) * msw
    icc = (msb - msw) / icc_den
    ok = ((F.col("k") >= 2) & (F.col("n") > F.col("k"))
          & (F.col("ssw_e1") > 0) & (icc_den != 0))
    mbar = F.col("n").cast("double") / F.col("k").cast("double")
    return t.select(
        "n", "k", "ssb_e1", "ssw_e1",
        F.when(ok, pround(icc, 6))
         .otherwise(F.lit(None).cast("double")).alias("icc"),
        F.when(ok, pround(F.lit(1.0) + (mbar - F.lit(1.0)) * icc, 6))
         .otherwise(F.lit(None).cast("double")).alias("deff"))


# =====================================================================
# classifier eval: MCC + decile gains
# =====================================================================

@query(
    "q_mcc_f1",
    oracle="""
    WITH scored AS (
      SELECT (l_partkey * 37 + l_suppkey) % 10001 AS prob_bp,
             CASE WHEN ('0x' || substring(md5('cal:'
                        || CAST(l_orderkey AS VARCHAR) || ':'
                        || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
                       % 10000
                       < (l_partkey * 37 + l_suppkey) % 10001
                  THEN 1 ELSE 0 END AS label
      FROM lineitem
    ),
    t AS (
      SELECT
        CAST(SUM(CASE WHEN prob_bp >= 5000 AND label = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN prob_bp >= 5000 AND label = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN prob_bp < 5000 AND label = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN prob_bp < 5000 AND label = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored
    )
    SELECT tp, fp, fn, tn,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST(2 * tp * 10000 // (2 * tp + fp + fn) AS BIGINT)
                ELSE NULL END AS f1_bp,
           CASE WHEN tp + fp > 0 AND tp + fn > 0
                 AND tn + fp > 0 AND tn + fn > 0
                THEN ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
                            - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
                     / (SQRT(CAST(tp + fp AS DOUBLE))
                        * SQRT(CAST(tp + fn AS DOUBLE))
                        * SQRT(CAST(tn + fp AS DOUBLE))
                        * SQRT(CAST(tn + fn AS DOUBLE))), 6)
                ELSE NULL END AS mcc
    FROM t
    """,
)
def q_mcc_f1(spark, sf_dir):
    """Matthews correlation coefficient + F1 at the 0.5 operating
    point on the shared calibration fixture (q_brier_score's md5
    score/label lanes): MCC is the single-threshold summary robust to
    class imbalance (the one q_auc_roc's ranking view and
    q_confusion_thresholds' sweep don't directly report), F1 ships as
    an exact integer-bp via DIV.  The 2x2 core is one map-side-
    combined aggregate of exact BIGINT counts; MCC's denominator uses
    four separate IEEE sqrt factors (the sqrt*sqrt recipe — the
    product (tp+fp)(tp+fn)(tn+fp)(tn+fn) would overflow BIGINT, each
    factor's sqrt is exactly rounded) and the guard zeroes out
    degenerate margins.  No window, no join."""
    li = load_table(spark, sf_dir, "lineitem")
    lane = (F.conv(F.substring(F.md5(F.concat(
        F.lit("cal:"), F.col("l_orderkey").cast("string"),
        F.lit(":"), F.col("l_linenumber").cast("string"))), 1, 8),
        16, 10).cast("long") % 10000)
    prob = (F.col("l_partkey") * 37 + F.col("l_suppkey")) % 10001
    scored = li.select(prob.alias("prob_bp"),
                       F.when(lane < prob, 1).otherwise(0).alias("label"))
    pos = F.col("prob_bp") >= 5000
    t = scored.agg(
        F.sum(F.when(pos & (F.col("label") == 1), 1).otherwise(0))
         .cast("long").alias("tp"),
        F.sum(F.when(pos & (F.col("label") == 0), 1).otherwise(0))
         .cast("long").alias("fp"),
        F.sum(F.when(~pos & (F.col("label") == 1), 1).otherwise(0))
         .cast("long").alias("fn"),
        F.sum(F.when(~pos & (F.col("label") == 0), 1).otherwise(0))
         .cast("long").alias("tn"))
    mcc = ((F.col("tp").cast("double") * F.col("tn").cast("double")
            - F.col("fp").cast("double") * F.col("fn").cast("double"))
           / (F.sqrt((F.col("tp") + F.col("fp")).cast("double"))
              * F.sqrt((F.col("tp") + F.col("fn")).cast("double"))
              * F.sqrt((F.col("tn") + F.col("fp")).cast("double"))
              * F.sqrt((F.col("tn") + F.col("fn")).cast("double"))))
    return t.select(
        "tp", "fp", "fn", "tn",
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
               F.expr("2 * tp * 10000 DIV (2 * tp + fp + fn)"))
         .otherwise(F.lit(None).cast("long")).alias("f1_bp"),
        # per-factor guards: the margin PRODUCT overflows BIGINT past
        # ~3e4 rows per margin, the factors individually never do
        F.when((F.col("tp") + F.col("fp") > 0)
               & (F.col("tp") + F.col("fn") > 0)
               & (F.col("tn") + F.col("fp") > 0)
               & (F.col("tn") + F.col("fn") > 0),
               pround(mcc, 6))
         .otherwise(F.lit(None).cast("double")).alias("mcc"))


@query(
    "q_lift_gains",
    oracle="""
    WITH scored AS (
      SELECT (l_partkey * 37 + l_suppkey) % 10001 AS prob_bp,
             CASE WHEN ('0x' || substring(md5('cal:'
                        || CAST(l_orderkey AS VARCHAR) || ':'
                        || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
                       % 10000
                       < (l_partkey * 37 + l_suppkey) % 10001
                  THEN 1 ELSE 0 END AS label
      FROM lineitem
    ),
    b AS (
      SELECT CAST(LEAST(prob_bp * 10 // 10001, 9) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS pos
      FROM scored GROUP BY LEAST(prob_bp * 10 // 10001, 9)
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(pos) AS BIGINT) AS pt FROM b),
    cum AS (
      SELECT a.bin, a.n, a.pos,
             CAST(SUM(c.n) AS BIGINT) AS cum_n,
             CAST(SUM(c.pos) AS BIGINT) AS cum_pos
      FROM b a JOIN b c ON c.bin >= a.bin
      GROUP BY a.bin, a.n, a.pos
    )
    SELECT cum.bin, cum.n, cum.pos, cum.cum_n, cum.cum_pos,
           CASE WHEN tot.pt > 0
                THEN CAST(cum.cum_pos * 10000 // tot.pt AS BIGINT)
                ELSE NULL END AS gain_bp,
           CASE WHEN cum.cum_n > 0 AND tot.pt > 0
                THEN CAST(cum.cum_pos * tot.nt // cum.cum_n * 10000
                          // tot.pt AS BIGINT)
                ELSE NULL END AS lift_bp
    FROM cum CROSS JOIN tot
    """,
)
def q_lift_gains(spark, sf_dir):
    """Decile gains table + cumulative lift for the md5 calibration
    classifier: 'target the top-k score deciles, what fraction of all
    positives do you capture (gain) and at what multiple of random
    (lift)?' — the campaign-targeting readout that turns q_auc_roc's
    abstract ranking quality into an operating decision.  Score-value
    deciles (the bp score is uniform by construction, so value bins ~
    population deciles); cumulative-from-the-top runs as a broadcast
    triangular self-join over the 10-row bin grid — no window at all.
    All outputs exact integers: gain in bp via DIV; lift stages the
    division as (cum_pos*nt DIV cum_n)*1e4 DIV pt — identical
    truncation on both engines, and the widest product cum_pos*nt
    stays under BIGINT to ~3e9 rows (the single-product form
    overflowed at the x100 sweep point).  One corpus aggregate;
    everything after is 10 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    lane = (F.conv(F.substring(F.md5(F.concat(
        F.lit("cal:"), F.col("l_orderkey").cast("string"),
        F.lit(":"), F.col("l_linenumber").cast("string"))), 1, 8),
        16, 10).cast("long") % 10000)
    prob = (F.col("l_partkey") * 37 + F.col("l_suppkey")) % 10001
    scored = li.select(prob.alias("prob_bp"),
                       F.when(lane < prob, 1).otherwise(0).alias("label"))
    b = (scored.groupBy(F.expr("least(prob_bp * 10 DIV 10001, 9)")
                         .cast("long").alias("bin"))
               .agg(F.count("*").cast("long").alias("n"),
                    F.sum("label").cast("long").alias("pos")))
    tot = b.agg(F.sum("n").cast("long").alias("nt"),
                F.sum("pos").cast("long").alias("pt"))
    c = b.select(F.col("bin").alias("bin2"), F.col("n").alias("n2"),
                 F.col("pos").alias("pos2"))
    cum = (b.join(F.broadcast(c), F.col("bin2") >= F.col("bin"))
            .groupBy("bin", "n", "pos")
            .agg(F.sum("n2").cast("long").alias("cum_n"),
                 F.sum("pos2").cast("long").alias("cum_pos")))
    return (cum.crossJoin(F.broadcast(tot))
               .select("bin", "n", "pos", "cum_n", "cum_pos",
                       F.when(F.col("pt") > 0,
                              F.expr("cum_pos * 10000 DIV pt"))
                        .otherwise(F.lit(None).cast("long"))
                        .alias("gain_bp"),
                       F.when((F.col("cum_n") > 0) & (F.col("pt") > 0),
                              F.expr("cum_pos * nt DIV cum_n * 10000 "
                                     "DIV pt"))
                        .otherwise(F.lit(None).cast("long"))
                        .alias("lift_bp")))
