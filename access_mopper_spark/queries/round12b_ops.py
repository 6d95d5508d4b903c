"""Round-12 continuation batch: survival comparison and rank-based
changepoint detection — the two readouts that close the survival shelf
(q_survival_km gives ONE curve; the log-rank test answers "are the two
arms' curves different?") and the changepoint shelf (q_cusum_changepoint
is mean-based and distribution-sensitive; Pettitt is the rank-based,
outlier-robust twin).

Registry conventions as everywhere (queries/_core.py): exact BIGINT
cores on distinct-value/day grids, cumulatives via broadcast triangular
self-joins (no global windows), per-distinct-term micro-unit
quantization for the one rational series each test sums (the proven
r10-r11 recipe: a 1-ulp division disagreement flips FLOOR(x*1e6+0.5)
only within 1e-6-measure-zero of a boundary), identical expression TEXT
on both engines for every double stage, R6 on final doubles.
"""

from __future__ import annotations

from access_mopper_spark.queries._core import (  # noqa: F401
    F, W, query, R6, _wide, eager_release, load_table, pround)


# =====================================================================
# survival: two-sample log-rank test
# =====================================================================

@query(
    "q_logrank_test",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    u AS (
      SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM ev GROUP BY user_id
    ),
    mx AS (SELECT MAX(d1) AS gmax FROM u),
    lt AS (
      SELECT user_id % 2 AS arm, d1 - d0 AS lt,
             CASE WHEN d1 > gmax - 3 THEN 1 ELSE 0 END AS censored
      FROM u CROSS JOIN mx
    ),
    ga AS (
      SELECT lt AS t, CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1_all,
             CAST(SUM(1 - censored) AS BIGINT) AS d_ev,
             CAST(SUM(CASE WHEN arm = 1 AND censored = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1_ev
      FROM lt GROUP BY lt
    ),
    risk AS (
      SELECT a.t, a.d_ev, a.d1_ev,
             CAST(SUM(b.n_all) AS BIGINT) AS n,
             CAST(SUM(b.n1_all) AS BIGINT) AS n1
      FROM ga a JOIN ga b ON b.t >= a.t
      GROUP BY a.t, a.d_ev, a.d1_ev
    ),
    terms AS (
      SELECT d_ev, d1_ev, n, n1,
             CAST(FLOOR(CAST(n1 * d_ev AS DOUBLE) / n * 1e6 + 0.5)
                  AS BIGINT) AS e1_micro,
             CAST(FLOOR(CAST(n1 AS DOUBLE) / n
                        * (CAST(n - n1 AS DOUBLE) / n) * d_ev
                        * (CAST(n - d_ev AS DOUBLE) / (n - 1))
                        * 1e6 + 0.5) AS BIGINT) AS v_micro
      FROM risk WHERE d_ev >= 1 AND n >= 2
    ),
    tots AS (
      SELECT CAST(SUM(d1_ev) AS BIGINT) AS o1,
             CAST(SUM(d_ev) AS BIGINT) AS o_all,
             CAST(SUM(e1_micro) AS BIGINT) AS e1m,
             CAST(SUM(v_micro) AS BIGINT) AS vm
      FROM terms
    ),
    arms AS (
      SELECT CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1_users,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0_users
      FROM lt
    )
    SELECT n1_users, n0_users, o1, o_all,
           ROUND(CAST(e1m AS DOUBLE) / 1e6, 6) AS e1,
           ROUND(CAST(vm AS DOUBLE) / 1e6, 6) AS v_hyper,
           CASE WHEN vm > 0
                THEN ROUND(CAST(o1 * 1000000 - e1m AS DOUBLE)
                           / (SQRT(CAST(vm AS DOUBLE)) * 1000.0), 6)
                ELSE NULL END AS z_logrank
    FROM tots CROSS JOIN arms
    """,
)
def q_logrank_test(spark, sf_dir):
    """Two-sample log-rank test comparing user-lifetime survival between
    A/B arms (arm = user_id % 2, the repo's standard assignment; same
    lifetime/censoring construction as q_survival_km: first->last active
    day, users active in the final 3 days right-censored) — "did the
    treatment arm retain users longer?", the hypothesis test q_survival_km's
    single curve cannot answer (reference surface: per-experiment QC
    summaries next to q_cuped / q_mannwhitney_u).  At each distinct event
    time the hypergeometric expectation E1 = n1*d/n and variance
    V = n1*n2*d*(n-d)/(n^2*(n-1)) are quantized per-term to exact
    micro-unit BIGINTs (the per-distinct-value recipe), summed exactly,
    and z = (O1-E1)/sqrt(V) staged from the integer cores with identical
    expression text on both engines (+,-,*,/,sqrt only).  Exactness
    bound: n1*d < 2^53 (holds past 1e8 users).  Cost: one user-level
    aggregate; everything after lives on the tiny distinct-lifetime grid
    (risk sets via a broadcast triangular self-join, no window)."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
          .select("user_id",
                  F.date_trunc("day", "ts").cast("date").alias("d")))
    # the user-level aggregate feeds the global max, the lifetime grid
    # AND the arm totals — persist it eagerly (racing-consumer rule) so
    # the events scan + user rollup run once, not 3×
    u = ev.groupBy("user_id").agg(F.min("d").alias("d0"),
                                  F.max("d").alias("d1")).persist()
    u.count()
    mx = u.agg(F.max("d1").alias("gmax"))
    lt = (u.crossJoin(F.broadcast(mx))
           .select((F.col("user_id") % 2).alias("arm"),
                   F.datediff("d1", "d0").alias("lt"),
                   F.when(F.col("d1") > F.date_sub(F.col("gmax"), 3), 1)
                    .otherwise(0).alias("censored")))
    ga = (lt.groupBy(F.col("lt").alias("t"))
            .agg(F.count("*").cast("long").alias("n_all"),
                 F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
                  .cast("long").alias("n1_all"),
                 F.sum(F.lit(1) - F.col("censored")).cast("long")
                  .alias("d_ev"),
                 F.sum(F.when((F.col("arm") == 1)
                              & (F.col("censored") == 0), 1).otherwise(0))
                  .cast("long").alias("d1_ev")))
    gb = ga.select(F.col("t").alias("t2"), F.col("n_all").alias("n_all2"),
                   F.col("n1_all").alias("n1_all2"))
    risk = (ga.join(F.broadcast(gb), F.col("t2") >= F.col("t"))
              .groupBy("t", "d_ev", "d1_ev")
              .agg(F.sum("n_all2").cast("long").alias("n"),
                   F.sum("n1_all2").cast("long").alias("n1")))
    terms = (risk.where((F.col("d_ev") >= 1) & (F.col("n") >= 2))
                 .select("d_ev", "d1_ev",
                         F.expr("CAST(FLOOR(CAST(n1 * d_ev AS DOUBLE) / n "
                                "* 1e6 + 0.5) AS BIGINT)").alias("e1_micro"),
                         F.expr("CAST(FLOOR(CAST(n1 AS DOUBLE) / n "
                                "* (CAST(n - n1 AS DOUBLE) / n) * d_ev "
                                "* (CAST(n - d_ev AS DOUBLE) / (n - 1)) "
                                "* 1e6 + 0.5) AS BIGINT)").alias("v_micro")))
    tots = terms.agg(F.sum("d1_ev").cast("long").alias("o1"),
                     F.sum("d_ev").cast("long").alias("o_all"),
                     F.sum("e1_micro").cast("long").alias("e1m"),
                     F.sum("v_micro").cast("long").alias("vm"))
    arms = lt.agg(F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
                   .cast("long").alias("n1_users"),
                  F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
                   .cast("long").alias("n0_users"))
    out = (tots.crossJoin(F.broadcast(arms))
               .select("n1_users", "n0_users", "o1", "o_all",
                       pround(F.expr("CAST(e1m AS DOUBLE) / 1e6"), 6)
                         .alias("e1"),
                       pround(F.expr("CAST(vm AS DOUBLE) / 1e6"), 6)
                         .alias("v_hyper"),
                       F.when(F.col("vm") > 0,
                              pround(F.expr(
                                  "CAST(o1 * 1000000 - e1m AS DOUBLE) "
                                  "/ (SQRT(CAST(vm AS DOUBLE)) * 1000.0)"),
                                  6))
                        .otherwise(F.lit(None).cast("double"))
                        .alias("z_logrank")))
    return eager_release(out, u)


# =====================================================================
# changepoint: Pettitt rank test
# =====================================================================

@query(
    "q_pettitt_test",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    daily AS (
      SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS x
      FROM ev GROUP BY event_type, d
    ),
    pairs AS (
      SELECT a.event_type, a.d AS di, b.d AS dj,
             CASE WHEN b.x > a.x THEN 1
                  WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.d > a.d
    ),
    ut AS (
      SELECT p.event_type, t.d AS t, CAST(SUM(p.sgn) AS BIGINT) AS u
      FROM pairs p JOIN daily t
        ON t.event_type = p.event_type AND p.di <= t.d AND p.dj > t.d
      GROUP BY p.event_type, t.d
    ),
    dd AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd
      FROM daily GROUP BY event_type
    ),
    k AS (
      SELECT event_type, CAST(MAX(ABS(u)) AS BIGINT) AS k_stat
      FROM ut GROUP BY event_type
    ),
    tau AS (
      SELECT u.event_type, k.k_stat, MIN(u.t) AS tau_day
      FROM ut u JOIN k
        ON k.event_type = u.event_type AND ABS(u.u) = k.k_stat
      GROUP BY u.event_type, k.k_stat
    )
    SELECT t.event_type, dd.nd AS n_days, t.k_stat, t.tau_day,
           CAST(6 * t.k_stat * t.k_stat * 1000000
                // (dd.nd * dd.nd * dd.nd + dd.nd * dd.nd) AS BIGINT)
             AS stat_micro,
           ROUND(LEAST(CAST(1 AS DOUBLE),
                       2 * EXP(-(CAST(6 * t.k_stat * t.k_stat AS DOUBLE)
                                 / (dd.nd * dd.nd * dd.nd
                                    + dd.nd * dd.nd)))), 6) AS p_approx
    FROM tau t JOIN dd ON dd.event_type = t.event_type
    """,
)
def q_pettitt_test(spark, sf_dir):
    """Pettitt rank changepoint test per event_type over the daily
    event-count series — the outlier-robust, distribution-free twin of
    q_cusum_changepoint (rank statistics don't care about the heavy tail
    that drags a mean-based CUSUM): U_t = sum_{i<=t, j>t} sgn(x_j - x_i),
    K = max|U_t|, tau = argmax (earliest day on ties), with the standard
    approximation p ~ 2*exp(-6K^2/(D^3+D^2)) capped at 1 (reference
    surface: per-variable temporal-drift QC next to q_mann_kendall).
    Everything through K is exact BIGINT on the per-type active-day grid
    (days with zero events of a type are not in that type's series —
    documented semantics): sign pairs D^2/2, the per-t rollup a keyed
    grid-to-grid join (D^3/6 tiny rows, never touching the corpus
    again), no window.  stat_micro is exact integer DIV (overflow-safe
    to D ~ 2200 days; K <= D^2/4 so 6*K^2*1e6 < 2^63); the single EXP
    lands on one identical double per type then R6.  One corpus
    aggregate; series with a single active day have no pairs and drop
    out (documented)."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.date_trunc("day", "ts").cast("date").alias("d")))
    daily = (ev.groupBy("event_type", "d")
               .agg(F.count("*").cast("long").alias("x")))
    b = daily.select(F.col("event_type").alias("et2"),
                     F.col("d").alias("dj"), F.col("x").alias("xj"))
    pairs = (daily.join(F.broadcast(b),
                        (F.col("et2") == F.col("event_type"))
                        & (F.col("dj") > F.col("d")))
                  .select("event_type", F.col("d").alias("di"), "dj",
                          F.when(F.col("xj") > F.col("x"), 1)
                           .when(F.col("xj") < F.col("x"), -1)
                           .otherwise(0).alias("sgn")))
    tgrid = daily.select(F.col("event_type").alias("et3"),
                         F.col("d").alias("t"))
    ut = (pairs.join(F.broadcast(tgrid),
                     (F.col("et3") == F.col("event_type"))
                     & (F.col("di") <= F.col("t"))
                     & (F.col("dj") > F.col("t")))
               .groupBy("event_type", "t")
               .agg(F.sum("sgn").cast("long").alias("u")))
    dd = (daily.groupBy("event_type")
               .agg(F.count("*").cast("long").alias("nd")))
    k = (ut.groupBy("event_type")
           .agg(F.max(F.abs(F.col("u"))).cast("long").alias("k_stat")))
    kb = k.select(F.col("event_type").alias("et4"), "k_stat")
    tau = (ut.join(F.broadcast(kb),
                   (F.col("et4") == F.col("event_type"))
                   & (F.abs(F.col("u")) == F.col("k_stat")))
             .groupBy("event_type", "k_stat")
             .agg(F.min("t").alias("tau_day")))
    ddb = dd.select(F.col("event_type").alias("et5"), "nd")
    return (tau.join(F.broadcast(ddb), F.col("et5") == F.col("event_type"))
               .select("event_type", F.col("nd").alias("n_days"),
                       "k_stat", "tau_day",
                       F.expr("CAST(6 * k_stat * k_stat * 1000000 "
                              "DIV (nd * nd * nd + nd * nd) AS BIGINT)")
                        .alias("stat_micro"),
                       pround(F.expr(
                           "LEAST(CAST(1 AS DOUBLE), "
                           "2 * EXP(-(CAST(6 * k_stat * k_stat AS DOUBLE) "
                           "/ (nd * nd * nd + nd * nd))))"), 6)
                        .alias("p_approx")))


# =====================================================================
# calibration: isotonic (PAV) fit via the minimax identity
# =====================================================================

@query(
    "q_isotonic_pav",
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
             CAST(SUM(label) AS BIGINT) AS pos
      FROM scored GROUP BY 1
    ),
    spans AS (
      SELECT j.bin AS j, k.bin AS k,
             CAST(SUM(m.pos) AS BIGINT) AS s,
             CAST(SUM(m.nb) AS BIGINT) AS n
      FROM b j JOIN b k ON k.bin >= j.bin
      JOIN b m ON m.bin >= j.bin AND m.bin <= k.bin
      GROUP BY j.bin, k.bin
    ),
    inner_min AS (
      SELECT i.bin AS i, s.j,
             MIN(CAST(s.s AS DOUBLE) / s.n) AS mn
      FROM b i JOIN spans s ON s.j <= i.bin AND s.k >= i.bin
      GROUP BY i.bin, s.j
    ),
    fit AS (
      SELECT i, MAX(mn) AS iso FROM inner_min GROUP BY i
    )
    SELECT b.bin, b.nb, b.pos,
           ROUND(CAST(b.pos AS DOUBLE) / b.nb, 6) AS emp_rate,
           ROUND(fit.iso, 6) AS iso_rate
    FROM b JOIN fit ON fit.i = b.bin
    """,
)
def q_isotonic_pav(spark, sf_dir):
    """Isotonic (PAV) calibration fit over the 20-bin reliability
    diagram of the md5 calibration classifier — the monotone recalibration
    map a serving stack applies on top of raw scores (q_calibration_bins
    shows the diagram, q_ece_calibration its scalar error; this row is
    the FIX).  Computed via the minimax identity fit(i) = max_{j<=i}
    min_{k>=i} mean(y over bins j..k) — a closed relational form of
    pool-adjacent-violators with no iteration at all: span sums over the
    20-bin grid (<= 210 spans x 20 member bins), each span mean a SINGLE
    BIGINT/BIGINT division (IEEE-correctly-rounded, bit-identical), then
    exact MIN/MAX — so the whole fit is deterministic with no
    quantization argument needed.  Corpus work is ONE map-side-combined
    20-key aggregate; everything after lives on the bin grid via
    broadcast triangular joins.  Empty bins are absent from the grid and
    the fit is over present bins in bin order (documented)."""
    li = load_table(spark, sf_dir, "lineitem")
    lane = (F.conv(F.substring(F.md5(F.concat(
        F.lit("cal:"), F.col("l_orderkey").cast("string"),
        F.lit(":"), F.col("l_linenumber").cast("string"))), 1, 8),
        16, 10).cast("long") % 10000)
    prob = (F.col("l_partkey") * 37 + F.col("l_suppkey")) % 10001
    scored = li.select(prob.alias("prob_bp"),
                       F.when(lane < prob, 1).otherwise(0).alias("label"))
    b = (scored.groupBy(F.expr("least(prob_bp * 20 DIV 10000, 19)")
                         .cast("long").alias("bin"))
               .agg(F.count("*").cast("long").alias("nb"),
                    F.sum("label").cast("long").alias("pos")))
    bj = b.select(F.col("bin").alias("j"))
    bk = b.select(F.col("bin").alias("k"))
    bm = b.select(F.col("bin").alias("m"), F.col("nb").alias("nb_m"),
                  F.col("pos").alias("pos_m"))
    spans = (bj.join(F.broadcast(bk), F.col("k") >= F.col("j"))
               .join(F.broadcast(bm),
                     (F.col("m") >= F.col("j")) & (F.col("m") <= F.col("k")))
               .groupBy("j", "k")
               .agg(F.sum("pos_m").cast("long").alias("s"),
                    F.sum("nb_m").cast("long").alias("n")))
    bi = b.select(F.col("bin").alias("i"))
    inner_min = (bi.join(F.broadcast(spans),
                         (F.col("j") <= F.col("i"))
                         & (F.col("k") >= F.col("i")))
                   .groupBy("i", "j")
                   .agg(F.min(F.expr("CAST(s AS DOUBLE) / n")).alias("mn")))
    fit = inner_min.groupBy("i").agg(F.max("mn").alias("iso"))
    return (b.join(F.broadcast(fit), F.col("i") == F.col("bin"))
             .select("bin", "nb", "pos",
                     pround(F.expr("CAST(pos AS DOUBLE) / nb"), 6)
                       .alias("emp_rate"),
                     pround(F.col("iso"), 6).alias("iso_rate")))


# =====================================================================
# feature split: day-parting decision stump
# =====================================================================

@query(
    "q_decision_stump",
    oracle="""
    WITH e AS (
      SELECT hour(CAST(ts AS TIMESTAMP)) AS h,
             CASE WHEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 5000
                  THEN 1 ELSE 0 END AS label
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    g AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(label) AS BIGINT) AS pos_h
      FROM e GROUP BY h
    ),
    tot AS (SELECT CAST(SUM(n_h) AS BIGINT) AS n,
                   CAST(SUM(pos_h) AS BIGINT) AS pos FROM g),
    thr AS (
      SELECT a.h AS thr_hour,
             CAST(SUM(c.n_h) AS BIGINT) AS nl,
             CAST(SUM(c.pos_h) AS BIGINT) AS pl
      FROM g a JOIN g c ON c.h <= a.h
      WHERE a.h < (SELECT MAX(h) FROM g)
      GROUP BY a.h
    ),
    cand AS (
      SELECT thr_hour, nl, pl, tot.n - nl AS nr, tot.pos - pl AS pr,
             CAST(pl * (nl - pl) AS DOUBLE) / nl
             + CAST((tot.pos - pl) * ((tot.n - nl) - (tot.pos - pl))
                    AS DOUBLE) / (tot.n - nl) AS child_raw,
             CAST(tot.pos * (tot.n - tot.pos) AS DOUBLE) / tot.n
               AS root_raw,
             tot.n AS n
      FROM thr CROSS JOIN tot
      WHERE nl > 0 AND tot.n - nl > 0
    )
    SELECT thr_hour, nl AS n_left, pl AS pos_left,
           nr AS n_right, pr AS pos_right,
           ROUND(2 * root_raw / n, 6) AS gini_root,
           ROUND(2 * child_raw / n, 6) AS gini_children,
           ROUND(2 * (root_raw - child_raw) / n, 6) AS gini_gain
    FROM cand ORDER BY child_raw ASC, thr_hour ASC LIMIT 1
    """,
)
def q_decision_stump(spark, sf_dir):
    """Best single-threshold decision stump on hour-of-day predicting
    high-value events (cents >= 5000, the q_wilson_interval success
    definition) — the day-parting split a feature-importance or
    rule-mining pass starts from: which hour boundary most purifies
    high-value vs low-value traffic (CART with depth 1).  The threshold
    grid is the 24-hour domain: per-hour (n, pos) from ONE corpus
    aggregate, prefix counts via a broadcast triangular self-join, and
    the Gini objective minimized as child_raw = pl*ql/nl + pr*qr/nr —
    each term a product of exact BIGINTs divided once
    (IEEE-correctly-rounded => bit-identical), argmin selected with the
    deterministic (child_raw, thr_hour) sort, ties to the earliest hour.
    Exactness bound: pl*ql < 2^53 (holds to ~1.9e8 events).  Reported
    gini_* surfaces are the conventional 2*impurity/n scalings through
    R6."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select(F.hour(F.col("ts").cast("timestamp")).alias("h"),
                  F.when(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long") >= 5000, 1).otherwise(0)
                   .alias("label")))
    g = ev.groupBy("h").agg(F.count("*").cast("long").alias("n_h"),
                            F.sum("label").cast("long").alias("pos_h"))
    tot = g.agg(F.sum("n_h").cast("long").alias("n"),
                F.sum("pos_h").cast("long").alias("pos"))
    hmax = g.agg(F.max("h").alias("h_max"))
    c = g.select(F.col("h").alias("h2"), F.col("n_h").alias("n_h2"),
                 F.col("pos_h").alias("pos_h2"))
    thr = (g.join(F.broadcast(c), F.col("h2") <= F.col("h"))
            .crossJoin(F.broadcast(hmax))
            .where(F.col("h") < F.col("h_max"))
            .groupBy(F.col("h").alias("thr_hour"))
            .agg(F.sum("n_h2").cast("long").alias("nl"),
                 F.sum("pos_h2").cast("long").alias("pl")))
    cand = (thr.crossJoin(F.broadcast(tot))
               .where((F.col("nl") > 0) & (F.col("n") - F.col("nl") > 0))
               .select("thr_hour", "nl", "pl",
                       (F.col("n") - F.col("nl")).alias("nr"),
                       (F.col("pos") - F.col("pl")).alias("pr"),
                       F.expr("CAST(pl * (nl - pl) AS DOUBLE) / nl "
                              "+ CAST((pos - pl) * ((n - nl) - (pos - pl)) "
                              "AS DOUBLE) / (n - nl)").alias("child_raw"),
                       F.expr("CAST(pos * (n - pos) AS DOUBLE) / n")
                        .alias("root_raw"),
                       F.col("n")))
    best = cand.orderBy(F.col("child_raw").asc(),
                        F.col("thr_hour").asc()).limit(1)
    return best.select(
        "thr_hour", F.col("nl").alias("n_left"), F.col("pl").alias("pos_left"),
        F.col("nr").alias("n_right"), F.col("pr").alias("pos_right"),
        pround(F.expr("2 * root_raw / n"), 6).alias("gini_root"),
        pround(F.expr("2 * child_raw / n"), 6).alias("gini_children"),
        pround(F.expr("2 * (root_raw - child_raw) / n"), 6)
          .alias("gini_gain"))


# =====================================================================
# cluster validity: Calinski-Harabasz and Davies-Bouldin
# =====================================================================

@query(
    "q_calinski_harabasz",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000
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
      SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS nc,
             CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
      FROM pd GROUP BY label, dim
    ),
    gg AS (
      SELECT dim, CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS g
      FROM pd GROUP BY dim
    ),
    w AS (
      SELECT CAST(SUM((pd.v - cg.c) * (pd.v - cg.c)) AS BIGINT) AS w_ss
      FROM pd JOIN cg ON cg.label = pd.label AND cg.dim = pd.dim
    ),
    b AS (
      SELECT CAST(SUM(cg.nc * (cg.c - gg.g) * (cg.c - gg.g)) AS BIGINT)
        AS b_ss
      FROM cg JOIN gg ON gg.dim = cg.dim
    ),
    kn AS (
      SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e
    )
    SELECT kn.n AS n_points, kn.k AS k_clusters, b.b_ss, w.w_ss,
           CASE WHEN kn.k > 1 AND kn.n > kn.k AND w.w_ss > 0
                THEN ROUND((CAST(b.b_ss AS DOUBLE) / (kn.k - 1))
                           / (CAST(w.w_ss AS DOUBLE) / (kn.n - kn.k)), 6)
                ELSE NULL END AS ch_index
    FROM kn CROSS JOIN w CROSS JOIN b
    """,
)
def q_calinski_harabasz(spark, sf_dir):
    """Calinski-Harabasz variance-ratio index of the embedding label
    partition — the cluster-validity scalar next to
    q_simplified_silhouette (CH rewards between-cluster spread per unit
    within-cluster scatter; it's the criterion sklearn reports for
    choosing k).  Integer-centroid variant on the e4-quantized coords
    (same DIV-centroid construction as the silhouette row): W and B are
    exact BIGINT sums of squared integer deviations — no per-point
    float at all — and the single CH expression stages two
    IEEE-correctly-rounded divisions from the integer cores, then R6.
    Overflow bound: per-(label,dim) squared deviations sum < 2^63 to
    ~1e10 points at |x|<=2.  Corpus cost: ONE posexplode aggregate to
    the (k x dims) grid and one corpus-x-grid equi-join for W;
    everything else is grid-sized."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .where(F.col("embedding").isNotNull()
                  & F.col("label").isNotNull()))
    e = emb.select(
        "vec_id", "label",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * F.lit(1e4)
                                      + F.lit(0.5)).cast("long"))
         .alias("qe"))
    pd_ = e.select("vec_id", "label",
                   F.posexplode("qe").alias("dim", "v"))
    cg = (pd_.groupBy("label", "dim")
             .agg(F.count("*").cast("long").alias("nc"),
                  F.expr("CAST(SUM(v) AS BIGINT) DIV COUNT(*)").alias("c")))
    gg = (pd_.groupBy("dim")
             .agg(F.expr("CAST(SUM(v) AS BIGINT) DIV COUNT(*)").alias("g")))
    w = (pd_.join(F.broadcast(cg.select(F.col("label").alias("lb"),
                                        F.col("dim").alias("dm"), "c")),
                  (F.col("lb") == F.col("label"))
                  & (F.col("dm") == F.col("dim")))
            .agg(F.sum((F.col("v") - F.col("c"))
                       * (F.col("v") - F.col("c")))
                  .cast("long").alias("w_ss")))
    b = (cg.join(F.broadcast(gg.withColumnRenamed("dim", "dm2")),
                 F.col("dm2") == F.col("dim"))
           .agg(F.sum(F.col("nc") * (F.col("c") - F.col("g"))
                      * (F.col("c") - F.col("g")))
                 .cast("long").alias("b_ss")))
    kn = e.agg(F.countDistinct("label").cast("long").alias("k"),
               F.count("*").cast("long").alias("n"))
    return (kn.crossJoin(F.broadcast(w)).crossJoin(F.broadcast(b))
              .select(F.col("n").alias("n_points"),
                      F.col("k").alias("k_clusters"), "b_ss", "w_ss",
                      F.when((F.col("k") > 1) & (F.col("n") > F.col("k"))
                             & (F.col("w_ss") > 0),
                             pround(F.expr(
                                 "(CAST(b_ss AS DOUBLE) / (k - 1)) "
                                 "/ (CAST(w_ss AS DOUBLE) / (n - k))"), 6))
                       .otherwise(F.lit(None).cast("double"))
                       .alias("ch_index")))


@query(
    "q_davies_bouldin",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000
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
    pdist AS (
      SELECT pd.vec_id, pd.label,
             CAST(FLOOR(SQRT(CAST(SUM((pd.v - cg.c) * (pd.v - cg.c))
                                  AS DOUBLE)) + 0.5) AS BIGINT) AS dist_q
      FROM pd JOIN cg ON cg.label = pd.label AND cg.dim = pd.dim
      GROUP BY pd.vec_id, pd.label
    ),
    s AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS nc,
             CAST(SUM(dist_q) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS s_q
      FROM pdist GROUP BY label
    ),
    m AS (
      SELECT a.label AS li, b.label AS lj,
             CAST(FLOOR(SQRT(CAST(SUM((a.c - b.c) * (a.c - b.c))
                                  AS DOUBLE)) + 0.5) AS BIGINT) AS m_q
      FROM cg a JOIN cg b ON b.dim = a.dim AND b.label <> a.label
      GROUP BY a.label, b.label
    ),
    r AS (
      SELECT m.li, MAX(CAST((si.s_q + sj.s_q) * 1000000 // m.m_q
                            AS BIGINT)) AS r_e6
      FROM m JOIN s si ON si.label = m.li
             JOIN s sj ON sj.label = m.lj
      WHERE m.m_q > 0
      GROUP BY m.li
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k_scored,
           CAST(SUM(r_e6) AS BIGINT) AS sum_r_e6,
           ROUND(CAST(SUM(r_e6) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE)
                    * CAST(1000000 AS DOUBLE)), 6) AS db_index
    FROM r
    """,
)
def q_davies_bouldin(spark, sf_dir):
    """Davies-Bouldin index of the embedding label partition — the
    lower-is-better companion to q_calinski_harabasz (DB averages, per
    cluster, the worst (S_i+S_j)/M_ij similarity ratio to any other
    cluster; the number sklearn's davies_bouldin_score reports).
    Exactness: per-point and centroid-gap Euclidean norms are single
    IEEE sqrt calls on exact BIGINT squared sums (sqrt IS
    correctly-rounded — bit-identical), snapped to unit-grid integers;
    S_i is an integer DIV mean, each ratio an exact integer
    `(s_i+s_j)*1e6 // m_ij`, the final mean ONE division through R6 —
    the whole surface is order-free.  Pairs with identical centroids
    (m_q = 0) are excluded from the max (documented; degenerate for a
    real partition).  Corpus cost: one posexplode aggregate, one
    corpus-x-grid join for per-point distances; the k x k centroid
    table is grid work."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .where(F.col("embedding").isNotNull()
                  & F.col("label").isNotNull()))
    e = emb.select(
        "vec_id", "label",
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * F.lit(1e4)
                                      + F.lit(0.5)).cast("long"))
         .alias("qe"))
    pd_ = e.select("vec_id", "label",
                   F.posexplode("qe").alias("dim", "v"))
    cg = (pd_.groupBy("label", "dim")
             .agg(F.expr("CAST(SUM(v) AS BIGINT) DIV COUNT(*)").alias("c")))
    pdist = (pd_.join(F.broadcast(cg.select(F.col("label").alias("lb"),
                                            F.col("dim").alias("dm"), "c")),
                      (F.col("lb") == F.col("label"))
                      & (F.col("dm") == F.col("dim")))
                .groupBy("vec_id", "label")
                .agg(F.expr("CAST(FLOOR(SQRT(CAST(SUM((v - c) * (v - c)) "
                            "AS DOUBLE)) + 0.5) AS BIGINT)")
                      .alias("dist_q")))
    s = (pdist.groupBy("label")
              .agg(F.count("*").cast("long").alias("nc"),
                   F.expr("CAST(SUM(dist_q) AS BIGINT) DIV COUNT(*)")
                    .alias("s_q")))
    ca = cg.select(F.col("label").alias("li"), F.col("dim").alias("da"),
                   F.col("c").alias("cc_a"))
    cb = cg.select(F.col("label").alias("lj"), F.col("dim").alias("db"),
                   F.col("c").alias("cc_b"))
    m = (ca.join(F.broadcast(cb),
                 (F.col("db") == F.col("da"))
                 & (F.col("lj") != F.col("li")))
           .groupBy("li", "lj")
           .agg(F.expr("CAST(FLOOR(SQRT(CAST(SUM((cc_a - cc_b) "
                       "* (cc_a - cc_b)) AS DOUBLE)) + 0.5) AS BIGINT)")
                 .alias("m_q")))
    si = s.select(F.col("label").alias("ls_i"), F.col("s_q").alias("si_q"))
    sj = s.select(F.col("label").alias("ls_j"), F.col("s_q").alias("sj_q"))
    r = (m.where(F.col("m_q") > 0)
          .join(F.broadcast(si), F.col("ls_i") == F.col("li"))
          .join(F.broadcast(sj), F.col("ls_j") == F.col("lj"))
          .groupBy("li")
          .agg(F.max(F.expr("CAST((si_q + sj_q) * 1000000 DIV m_q "
                            "AS BIGINT)")).alias("r_e6")))
    return r.agg(
        F.count("*").cast("long").alias("k_scored"),
        F.sum("r_e6").cast("long").alias("sum_r_e6"),
        pround(F.sum("r_e6").cast("double")
               / (F.count("*").cast("double") * F.lit(1e6)), 6)
          .alias("db_index"))


# =====================================================================
# corpus growth exponent and closed-population estimation
# =====================================================================

from access_mopper_spark.queries.clusters_search import _TOKS_SQL  # noqa: E402


@query(
    "q_heaps_exponent",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    mx AS (SELECT MAX(doc_id) AS mid FROM documents),
    tk AS (
      SELECT t.doc_id // GREATEST(1, (mx.mid + 1 + 15) // 16) AS bucket,
             u.t AS tok
      FROM toks t CROSS JOIN mx, UNNEST(t.w) AS u(t)
      WHERE u.t <> ''
    ),
    per_b AS (SELECT bucket, COUNT(*) AS n_tokens FROM tk GROUP BY bucket),
    fb AS (SELECT tok, MIN(bucket) AS fb FROM tk GROUP BY tok),
    nb AS (SELECT fb AS bucket, COUNT(*) AS new_types FROM fb GROUP BY fb),
    m AS (
      SELECT p.bucket, p.n_tokens, COALESCE(nb.new_types, 0) AS new_types
      FROM per_b p LEFT JOIN nb USING (bucket)
    ),
    cum AS (
      SELECT a.bucket,
             CAST(SUM(b.new_types) AS BIGINT) AS cum_types,
             CAST(SUM(b.n_tokens) AS BIGINT) AS cum_tokens
      FROM m a JOIN m b ON b.bucket <= a.bucket GROUP BY a.bucket
    ),
    xy AS (
      SELECT LN(CAST(cum_tokens AS DOUBLE)) AS x,
             LN(CAST(cum_types AS DOUBLE)) AS y
      FROM cum WHERE cum_tokens > 0 AND cum_types > 0
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_used, SUM(x) AS sx,
             SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM xy
    ),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(new_types) AS BIGINT) AS vocab_size
      FROM m
    )
    SELECT s.n_used, tot.total_tokens, tot.vocab_size,
           CASE WHEN s.n_used >= 2 AND s.n_used * s.sxx - s.sx * s.sx > 0
                THEN ROUND((s.n_used * s.sxy - s.sx * s.sy)
                           / (s.n_used * s.sxx - s.sx * s.sx), 6)
                ELSE NULL END AS heaps_beta,
           CASE WHEN s.n_used >= 2 AND s.n_used * s.sxx - s.sx * s.sx > 0
                THEN ROUND((s.sy - (s.n_used * s.sxy - s.sx * s.sy)
                                   / (s.n_used * s.sxx - s.sx * s.sx)
                                   * s.sx) / s.n_used, 6)
                ELSE NULL END AS heaps_ln_k
    FROM s CROSS JOIN tot
    """,
)
def q_heaps_exponent(spark, sf_dir):
    """Heaps'-law exponent fit V(n) ~ K*n^beta over the cumulative
    vocabulary-growth points — the SCALAR on top of q_vocab_growth's
    curve (natural corpora sit near beta ~ 0.4-0.6; duplicated or
    templated corpora collapse toward 0, random noise toward 1 — the
    single number a tokenizer-sizing or dedup-health dashboard tracks,
    exactly as q_zipf_alpha is the scalar on the rank-frequency curve).
    Same 16-bucket construction as q_vocab_growth (min-agg first
    occurrence, broadcast prefix join on the 16-row grid); the OLS runs
    over <= 16 (ln cum_tokens, ln cum_types) points — plain double LN
    sums under the repo's small-term-count exception (<= 24 terms, R6
    absorbs order noise; q_zipf_alpha precedent at 100).  Degenerate
    guard: NULL unless >= 2 points with positive spread.  One exploded
    corpus aggregate + one vocab-sized min-agg; everything else is
    16-row grid work."""
    from access_mopper_spark.operators.search import tokens

    docs = _wide(load_table(spark, sf_dir, "documents"))
    mx = docs.agg(F.max("doc_id").alias("mid"))
    width = F.greatest(F.lit(1).cast("long"),
                       F.floor((F.col("mid") + 1 + 15) / 16).cast("long"))
    tk = (docs.crossJoin(F.broadcast(mx))
              .select(F.floor(F.col("doc_id") / width).cast("long")
                      .alias("bucket"),
                      F.explode(tokens(F.col("text"))).alias("tok"))
              .where(F.col("tok") != ""))
    per_b = tk.groupBy("bucket").agg(F.count("*").alias("n_tokens"))
    fb = tk.groupBy("tok").agg(F.min("bucket").alias("fb"))
    nb = fb.groupBy(F.col("fb").alias("bucket")).agg(
        F.count("*").alias("new_types"))
    m = (per_b.join(nb, "bucket", "left")
              .select("bucket", "n_tokens",
                      F.coalesce("new_types", F.lit(0)).alias("new_types")))
    b2 = m.select(F.col("bucket").alias("__b2"),
                  F.col("n_tokens").alias("__nt2"),
                  F.col("new_types").alias("__ny2"))
    cum = (m.join(F.broadcast(b2), F.col("__b2") <= F.col("bucket"))
            .groupBy("bucket")
            .agg(F.sum("__ny2").cast("long").alias("cum_types"),
                 F.sum("__nt2").cast("long").alias("cum_tokens")))
    xy = (cum.where((F.col("cum_tokens") > 0) & (F.col("cum_types") > 0))
             .select(F.expr("LN(CAST(cum_tokens AS DOUBLE))").alias("x"),
                     F.expr("LN(CAST(cum_types AS DOUBLE))").alias("y")))
    s = xy.agg(F.count("*").cast("long").alias("n_used"),
               F.sum("x").alias("sx"), F.sum("y").alias("sy"),
               F.sum(F.col("x") * F.col("y")).alias("sxy"),
               F.sum(F.col("x") * F.col("x")).alias("sxx"))
    tot = m.agg(F.sum("n_tokens").cast("long").alias("total_tokens"),
                F.sum("new_types").cast("long").alias("vocab_size"))
    guard = F.expr("n_used >= 2 AND n_used * sxx - sx * sx > 0")
    beta = F.expr("(n_used * sxy - sx * sy) / (n_used * sxx - sx * sx)")
    lnk = F.expr("(sy - (n_used * sxy - sx * sy) "
                 "/ (n_used * sxx - sx * sx) * sx) / n_used")
    return (s.crossJoin(F.broadcast(tot))
             .select("n_used", "total_tokens", "vocab_size",
                     F.when(guard, pround(beta, 6))
                      .otherwise(F.lit(None).cast("double"))
                      .alias("heaps_beta"),
                     F.when(guard, pround(lnk, 6))
                      .otherwise(F.lit(None).cast("double"))
                      .alias("heaps_ln_k")))


@query(
    "q_capture_recapture",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    span AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
    flags AS (
      SELECT e.user_id,
             MAX(CASE WHEN e.us <= (span.mn + span.mx) // 2
                      THEN 1 ELSE 0 END) AS c1,
             MAX(CASE WHEN e.us > (span.mn + span.mx) // 2
                      THEN 1 ELSE 0 END) AS c2
      FROM ev e CROSS JOIN span GROUP BY e.user_id
    ),
    ct AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 * c2) AS BIGINT) AS m_both,
             CAST(COUNT(*) AS BIGINT) AS n_seen
      FROM flags
    )
    SELECT n1, n2, m_both, n_seen,
           CAST((n1 + 1) * (n2 + 1) // (m_both + 1) - 1 AS BIGINT)
             AS n_hat_chapman,
           ROUND(SQRT(CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
                      * CAST(n1 - m_both AS DOUBLE)
                      * CAST(n2 - m_both AS DOUBLE)
                      / (CAST(m_both + 1 AS DOUBLE)
                         * CAST(m_both + 1 AS DOUBLE)
                         * CAST(m_both + 2 AS DOUBLE))), 6) AS se_chapman
    FROM ct
    """,
)
def q_capture_recapture(spark, sf_dir):
    """Chapman capture-recapture estimate of the TRUE user population
    from two temporal captures (first vs second half of the observation
    window, split at the exact integer-microsecond midpoint — the DIV-2
    midpoint recipe): how many users exist beyond the ones ever seen —
    the closed-population audience-size estimator that pairs with
    q_chao1_richness (Chao1 infers unseen TOKEN types from singleton
    counts; Chapman infers unseen USERS from capture overlap).
    N_hat = (n1+1)(n2+1)/(m+1) - 1 is an exact integer `//`-vs-DIV
    surface; the Woolf-style SE stages BIGINT-to-double casts (correctly
    rounded, bit-identical) through one sqrt, then R6.  One corpus
    aggregate to user level, one 4-integer reduce; overflow bound
    (n1+1)*(n2+1) < 2^63 holds past 3e9 users."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
          .select("user_id",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("us")))
    span = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx"))
    flags = (ev.crossJoin(F.broadcast(span))
               .groupBy("user_id")
               .agg(F.max(F.expr("CASE WHEN us <= (mn + mx) DIV 2 "
                                 "THEN 1 ELSE 0 END")).alias("c1"),
                    F.max(F.expr("CASE WHEN us > (mn + mx) DIV 2 "
                                 "THEN 1 ELSE 0 END")).alias("c2")))
    ct = flags.agg(F.sum("c1").cast("long").alias("n1"),
                   F.sum("c2").cast("long").alias("n2"),
                   F.sum(F.col("c1") * F.col("c2")).cast("long")
                    .alias("m_both"),
                   F.count("*").cast("long").alias("n_seen"))
    return ct.select(
        "n1", "n2", "m_both", "n_seen",
        F.expr("(n1 + 1) * (n2 + 1) DIV (m_both + 1) - 1")
         .alias("n_hat_chapman"),
        pround(F.expr(
            "SQRT(CAST((n1 + 1) * (n2 + 1) AS DOUBLE) "
            "* CAST(n1 - m_both AS DOUBLE) "
            "* CAST(n2 - m_both AS DOUBLE) "
            "/ (CAST(m_both + 1 AS DOUBLE) "
            "* CAST(m_both + 1 AS DOUBLE) "
            "* CAST(m_both + 2 AS DOUBLE)))"), 6).alias("se_chapman"))


# =====================================================================
# partial autocorrelation (Durbin-Levinson closed forms, lags 1-3)
# =====================================================================

_RHO_SQL = """CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)
                                 * CAST(sy AS DOUBLE)))
                ELSE NULL END"""


@query(
    "q_pacf_daily",
    oracle=f"""
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
    lags AS (SELECT UNNEST(range(1, 4)) AS lag),
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
    ),
    rho AS (
      SELECT event_type, lag, {_RHO_SQL} AS r
      FROM m
    ),
    rr AS (
      SELECT event_type,
             MAX(CASE WHEN lag = 1 THEN r END) AS r1,
             MAX(CASE WHEN lag = 2 THEN r END) AS r2,
             MAX(CASE WHEN lag = 3 THEN r END) AS r3
      FROM rho GROUP BY event_type
    ),
    p2 AS (
      SELECT event_type, r1, r2, r3,
             CASE WHEN CAST(1 AS DOUBLE) - r1 * r1 <> CAST(0 AS DOUBLE)
                  THEN (r2 - r1 * r1)
                       / (CAST(1 AS DOUBLE) - r1 * r1)
                  ELSE NULL END AS phi22
      FROM rr
    )
    SELECT event_type,
           ROUND(r1, 6) AS pacf1,
           ROUND(phi22, 6) AS pacf2,
           CASE WHEN CAST(1 AS DOUBLE) - (r1 - phi22 * r1) * r1
                     - phi22 * r2 <> CAST(0 AS DOUBLE)
                THEN ROUND((r3 - (r1 - phi22 * r1) * r2 - phi22 * r1)
                           / (CAST(1 AS DOUBLE)
                              - (r1 - phi22 * r1) * r1 - phi22 * r2), 6)
                ELSE NULL END AS pacf3
    FROM p2
    """,
)
def q_pacf_daily(spark, sf_dir):
    """Partial autocorrelation of the daily cents series per event type
    at lags 1-3 via the Durbin-Levinson closed forms (phi11 = rho1,
    phi22 = (rho2-rho1^2)/(1-rho1^2), phi33 from the order-2
    coefficients) — the AR-order fingerprint q_acf_multilag's raw
    correlogram cannot give (ACF of an AR(1) decays forever; PACF cuts
    off, and THAT is how you pick the model order for a seasonal
    monitor).  rho_k uses the identical per-lag Pearson staging as
    q_acf_multilag (exact BIGINT moments on the day grid, guarded
    sqrt*sqrt denominator); every later op is rational arithmetic on
    those identically-staged doubles, column-staged through a CTE so
    both engines evaluate the same tree, with explicit zero-denominator
    guards (no inf/NULL seam), then R6.  Cost: one corpus aggregate to
    the day grid; the 3-lag self-join and everything after is
    grid-sized."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select("event_type",
                  F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("2000-01-01").cast("date")).alias("di"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents")))
    daily = (ev.groupBy("event_type", "di")
               .agg(F.sum("cents").cast("long").alias("tot")))
    lags = spark.range(1, 4).select(F.col("id").cast("long").alias("lag"))
    b = daily.select(F.col("event_type").alias("et2"),
                     F.col("di").alias("di2"), F.col("tot").alias("y"))
    pairs = (daily.crossJoin(F.broadcast(lags))
                  .join(b, (F.col("et2") == F.col("event_type"))
                        & (F.col("di2") == F.col("di") + F.col("lag")))
                  .select("event_type", "lag",
                          F.col("tot").alias("x"), "y"))
    m = (pairs.groupBy("event_type", "lag")
              .agg(F.count("*").cast("long").alias("n"),
                   F.sum("x").cast("long").alias("sx"),
                   F.sum("y").cast("long").alias("sy"),
                   F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
                   F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
                   F.sum(F.col("y") * F.col("y")).cast("long").alias("syy")))
    rho = m.select("event_type", "lag", F.expr(_RHO_SQL).alias("r"))
    rr = (rho.groupBy("event_type")
             .agg(F.max(F.when(F.col("lag") == 1, F.col("r"))).alias("r1"),
                  F.max(F.when(F.col("lag") == 2, F.col("r"))).alias("r2"),
                  F.max(F.when(F.col("lag") == 3, F.col("r"))).alias("r3")))
    p2 = rr.select(
        "event_type", "r1", "r2", "r3",
        F.expr("CASE WHEN CAST(1 AS DOUBLE) - r1 * r1 <> CAST(0 AS DOUBLE) "
               "THEN (r2 - r1 * r1) / (CAST(1 AS DOUBLE) - r1 * r1) "
               "ELSE NULL END").alias("phi22"))
    return p2.select(
        "event_type",
        pround(F.col("r1"), 6).alias("pacf1"),
        pround(F.col("phi22"), 6).alias("pacf2"),
        F.when(F.expr("CAST(1 AS DOUBLE) - (r1 - phi22 * r1) * r1 "
                      "- phi22 * r2 <> CAST(0 AS DOUBLE)"),
               pround(F.expr(
                   "(r3 - (r1 - phi22 * r1) * r2 - phi22 * r1) "
                   "/ (CAST(1 AS DOUBLE) - (r1 - phi22 * r1) * r1 "
                   "- phi22 * r2)"), 6))
         .otherwise(F.lit(None).cast("double")).alias("pacf3"))


# =====================================================================
# survey raking: 2-way iterative proportional fitting (3 rounds)
# =====================================================================

@query(
    "q_raking_ipf",
    oracle="""
    WITH e AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) % 7 AS dow
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    cells AS (
      SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM e GROUP BY event_type, dow
    ),
    tgt AS (
      SELECT CAST(SUM(n_obs) AS DOUBLE)
               / CAST(COUNT(DISTINCT event_type) AS DOUBLE) AS row_t,
             CAST(SUM(n_obs) AS DOUBLE)
               / CAST(COUNT(DISTINCT dow) AS DOUBLE) AS col_t
      FROM cells
    ),
    w0 AS (SELECT event_type, dow, n_obs,
                  CAST(n_obs AS DOUBLE) AS w FROM cells),
    r1m AS (SELECT event_type, SUM(w) AS rs FROM w0 GROUP BY event_type),
    w1 AS (
      SELECT w0.event_type, w0.dow, w0.n_obs,
             w0.w * (tgt.row_t / r1m.rs) AS w
      FROM w0 JOIN r1m USING (event_type) CROSS JOIN tgt
    ),
    c1m AS (SELECT dow, SUM(w) AS cs FROM w1 GROUP BY dow),
    w2 AS (
      SELECT w1.event_type, w1.dow, w1.n_obs,
             w1.w * (tgt.col_t / c1m.cs) AS w
      FROM w1 JOIN c1m USING (dow) CROSS JOIN tgt
    ),
    r2m AS (SELECT event_type, SUM(w) AS rs FROM w2 GROUP BY event_type),
    w3 AS (
      SELECT w2.event_type, w2.dow, w2.n_obs,
             w2.w * (tgt.row_t / r2m.rs) AS w
      FROM w2 JOIN r2m USING (event_type) CROSS JOIN tgt
    ),
    c2m AS (SELECT dow, SUM(w) AS cs FROM w3 GROUP BY dow),
    w4 AS (
      SELECT w3.event_type, w3.dow, w3.n_obs,
             w3.w * (tgt.col_t / c2m.cs) AS w
      FROM w3 JOIN c2m USING (dow) CROSS JOIN tgt
    )
    SELECT event_type, dow, n_obs, ROUND(w, 6) AS raked_w,
           ROUND(w / n_obs, 6) AS cell_factor
    FROM w4
    """,
)
def q_raking_ipf(spark, sf_dir):
    """Two-way survey raking (iterative proportional fitting) of the
    event_type x day-of-week cell counts to UNIFORM margins — the
    post-stratification weighting a mixture-balancing pass applies when
    a corpus over-represents some source x time cell (the survey-
    methodology shelf next to q_design_effect / q_stratified_neyman):
    two full IPF rounds (row-scale, col-scale, row-scale, col-scale),
    deterministic and fixed, no convergence loop.  Every scale factor
    is a division of identically-staged doubles built from exact BIGINT
    cell counts; margin sums run over <= 7 cells (small-term-count
    exception, R6 absorbs order noise).  The whole computation lives on
    the 35-cell grid after ONE corpus aggregate; the raked weight and
    per-cell adjustment factor are the outputs a downstream sampler
    joins back on."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  (F.datediff(F.date_trunc("day", "ts").cast("date"),
                              F.lit("1970-01-01").cast("date"))
                    .cast("long") % 7).alias("dow")))
    cells = (ev.groupBy("event_type", "dow")
               .agg(F.count("*").cast("long").alias("n_obs")))
    tgt = cells.agg(
        (F.sum("n_obs").cast("double")
         / F.countDistinct("event_type").cast("double")).alias("row_t"),
        (F.sum("n_obs").cast("double")
         / F.countDistinct("dow").cast("double")).alias("col_t"))
    w0 = cells.select("event_type", "dow", "n_obs",
                      F.col("n_obs").cast("double").alias("w"))

    def _row_scale(w, tname):
        rm = w.groupBy("event_type").agg(F.sum("w").alias("rs"))
        return (w.drop("rs")
                 .join(F.broadcast(rm), "event_type")
                 .crossJoin(F.broadcast(tgt))
                 .select("event_type", "dow", "n_obs",
                         (F.col("w") * (F.col(tname) / F.col("rs")))
                          .alias("w")))

    def _col_scale(w, tname):
        cm = w.groupBy("dow").agg(F.sum("w").alias("cs"))
        return (w.join(F.broadcast(cm), "dow")
                 .crossJoin(F.broadcast(tgt))
                 .select("event_type", "dow", "n_obs",
                         (F.col("w") * (F.col(tname) / F.col("cs")))
                          .alias("w")))

    w1 = _row_scale(w0, "row_t")
    w2 = _col_scale(w1, "col_t")
    w3 = _row_scale(w2, "row_t")
    w4 = _col_scale(w3, "col_t")
    return w4.select("event_type", "dow", "n_obs",
                     pround(F.col("w"), 6).alias("raked_w"),
                     pround(F.col("w") / F.col("n_obs"), 6)
                       .alias("cell_factor"))


# =====================================================================
# ordered-alternative rank trend and matched-sample price indices
# =====================================================================

from access_mopper_spark.operators.prefix import bucketed_prefix  # noqa: E402


@query(
    "q_jonckheere_terpstra",
    oracle="""
    WITH ev AS (
      SELECT hour(CAST(ts AS TIMESTAMP)) // 6 AS blk,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    g AS (
      SELECT c,
             CAST(SUM(CASE WHEN blk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN blk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN blk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN blk = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
      FROM ev GROUP BY c
    ),
    cum AS (
      SELECT c, n0, n1, n2, n3,
             CAST(SUM(n0) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_n0,
             CAST(SUM(n1) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_n1,
             CAST(SUM(n2) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_n2
      FROM g
    ),
    jt AS (
      SELECT CAST(SUM(n1 * (2 * cum_n0 - n0)
                      + n2 * (2 * cum_n0 - n0) + n2 * (2 * cum_n1 - n1)
                      + n3 * (2 * cum_n0 - n0) + n3 * (2 * cum_n1 - n1)
                      + n3 * (2 * cum_n2 - n2)) AS BIGINT) AS jt2
      FROM cum
    ),
    sz AS (
      SELECT CAST(SUM(n0) AS BIGINT) AS t0, CAST(SUM(n1) AS BIGINT) AS t1,
             CAST(SUM(n2) AS BIGINT) AS t2, CAST(SUM(n3) AS BIGINT) AS t3,
             CAST(SUM(n0) + SUM(n1) + SUM(n2) + SUM(n3) AS BIGINT) AS n
      FROM g
    )
    SELECT sz.n AS n_total, CAST(4 AS BIGINT) AS k_groups, jt.jt2,
           CAST(sz.n * sz.n - (sz.t0 * sz.t0 + sz.t1 * sz.t1
                               + sz.t2 * sz.t2 + sz.t3 * sz.t3)
                AS BIGINT) AS e4,
           CASE WHEN (CAST(sz.n AS DOUBLE) * sz.n * (2 * sz.n + 3)
                      - (CAST(sz.t0 AS DOUBLE) * sz.t0 * (2 * sz.t0 + 3)
                         + CAST(sz.t1 AS DOUBLE) * sz.t1 * (2 * sz.t1 + 3)
                         + CAST(sz.t2 AS DOUBLE) * sz.t2 * (2 * sz.t2 + 3)
                         + CAST(sz.t3 AS DOUBLE) * sz.t3
                           * (2 * sz.t3 + 3))) > 0
                THEN ROUND(CAST(2 * jt.jt2 - e4 AS DOUBLE)
                           / (4 * SQRT((CAST(sz.n AS DOUBLE) * sz.n
                                        * (2 * sz.n + 3)
                      - (CAST(sz.t0 AS DOUBLE) * sz.t0 * (2 * sz.t0 + 3)
                         + CAST(sz.t1 AS DOUBLE) * sz.t1 * (2 * sz.t1 + 3)
                         + CAST(sz.t2 AS DOUBLE) * sz.t2 * (2 * sz.t2 + 3)
                         + CAST(sz.t3 AS DOUBLE) * sz.t3
                           * (2 * sz.t3 + 3))) / 72)), 6)
                ELSE NULL END AS z_jt
    FROM jt CROSS JOIN sz
    """,
)
def q_jonckheere_terpstra(spark, sf_dir):
    """Jonckheere-Terpstra ordered-alternative trend test: does event
    value shift MONOTONICALLY across the four ordered 6-hour day blocks?
    — the directional k-group test q_kruskal_wallis cannot express (KW
    asks "any difference"; JT asks "increasing with time of day", at
    far higher power for trends; next to q_cochran_armitage which is
    the binary-outcome analog).  The doubled statistic jt2 = 2*JT
    counts, for every ordered block pair, 2*#(x<y) + #(x=y) via the
    global distinct-cents grid: per-cents block counts pivot to four
    columns, ONE bucketed_prefix pass carries their cumulatives, and
    every pair term reads off the same grid row — exact BIGINT, no
    alignment joins.  e4 = N^2 - sum(n_i^2) = 4*E[JT] is exact; the
    tie-uncorrected null variance stages BIGINT-to-double products
    (term counts <= 4, R6-absorbed) and z = (2*jt2-e4)/(4*sqrt(V)).
    Overflow bound: jt2, e4 < 2^63 to N ~ 3e9 events.  One corpus
    aggregate; everything after is cents-grid work."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select(F.expr("hour(CAST(ts AS TIMESTAMP)) DIV 6").alias("blk"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("c")))
    g = ev.groupBy("c").agg(
        *[F.sum(F.when(F.col("blk") == i, 1).otherwise(0)).cast("long")
           .alias(f"n{i}") for i in range(4)])
    cum = bucketed_prefix(g, "c", ["n0", "n1", "n2"])
    jt = cum.agg(F.sum(
        F.expr("n1 * (2 * cum_n0 - n0) "
               "+ n2 * (2 * cum_n0 - n0) + n2 * (2 * cum_n1 - n1) "
               "+ n3 * (2 * cum_n0 - n0) + n3 * (2 * cum_n1 - n1) "
               "+ n3 * (2 * cum_n2 - n2)")).cast("long").alias("jt2"))
    sz = g.agg(F.sum("n0").cast("long").alias("t0"),
               F.sum("n1").cast("long").alias("t1"),
               F.sum("n2").cast("long").alias("t2"),
               F.sum("n3").cast("long").alias("t3"))
    sz = sz.withColumn("n", F.expr("t0 + t1 + t2 + t3"))
    vexpr = ("(CAST(n AS DOUBLE) * n * (2 * n + 3) "
             "- (CAST(t0 AS DOUBLE) * t0 * (2 * t0 + 3) "
             "+ CAST(t1 AS DOUBLE) * t1 * (2 * t1 + 3) "
             "+ CAST(t2 AS DOUBLE) * t2 * (2 * t2 + 3) "
             "+ CAST(t3 AS DOUBLE) * t3 * (2 * t3 + 3)))")
    return (jt.crossJoin(F.broadcast(sz))
              .withColumn("e4", F.expr("n * n - (t0 * t0 + t1 * t1 "
                                       "+ t2 * t2 + t3 * t3)"))
              .select(F.col("n").alias("n_total"),
                      F.lit(4).cast("long").alias("k_groups"), "jt2", "e4",
                      F.when(F.expr(vexpr + " > 0"),
                             pround(F.expr(
                                 "CAST(2 * jt2 - e4 AS DOUBLE) "
                                 "/ (4 * SQRT(" + vexpr + " / 72))"), 6))
                       .otherwise(F.lit(None).cast("double"))
                       .alias("z_jt")))


@query(
    "q_price_index",
    oracle="""
    WITH li AS (
      SELECT l_partkey AS pk,
             CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_quantity IS NOT NULL
    ),
    pm AS (
      SELECT pk, m, CAST(SUM(cents) AS BIGINT) AS sc,
             CAST(SUM(qty) AS BIGINT) AS sq
      FROM li GROUP BY pk, m HAVING SUM(qty) > 0
    ),
    m0 AS (SELECT MIN(m) AS base_m FROM pm),
    base AS (
      SELECT pm.pk, pm.sc AS c0, pm.sq AS q0
      FROM pm CROSS JOIN m0 WHERE pm.m = m0.base_m
    ),
    j AS (
      SELECT pm.m, pm.pk, pm.sc, pm.sq, base.c0, base.q0,
             CAST(FLOOR(CAST(pm.sc AS DOUBLE) / pm.sq * base.q0 + 0.5)
                  AS BIGINT) AS lasp_c,
             CAST(FLOOR(CAST(base.c0 AS DOUBLE) / base.q0 * pm.sq + 0.5)
                  AS BIGINT) AS paas_c
      FROM pm JOIN base ON base.pk = pm.pk
    ),
    agg AS (
      SELECT m, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(lasp_c) AS BIGINT) AS lasp_num,
             CAST(SUM(c0) AS BIGINT) AS lasp_den,
             CAST(SUM(sc) AS BIGINT) AS paas_num,
             CAST(SUM(paas_c) AS BIGINT) AS paas_den
      FROM j GROUP BY m
    )
    SELECT m AS month, n_parts,
           CAST(lasp_num * 10000 // lasp_den AS BIGINT) AS laspeyres_bp,
           CAST(paas_num * 10000 // paas_den AS BIGINT) AS paasche_bp,
           CAST(FLOOR(SQRT(CAST((lasp_num * 10000 // lasp_den)
                                AS DOUBLE)
                           * CAST((paas_num * 10000 // paas_den)
                                  AS DOUBLE)) + 0.5) AS BIGINT)
             AS fisher_bp
    FROM agg
    """,
)
def q_price_index(spark, sf_dir):
    """Matched-sample Laspeyres / Paasche / Fisher price indices per
    ship month against the first month as base — the canonical
    warehouse price-level monitor (are unit prices drifting, holding
    the basket fixed?), built the index-number way: only parts traded
    in BOTH the base month and month t enter (matched sample), unit
    prices are monthly part aggregates sc/sq.  Exactness: each
    cross-period value p_t*q_0 / p_0*q_t is quantized to cents PER
    (part, month) pair (single staged division then FLOOR+0.5 — the
    per-distinct-value recipe), so the month rollups are exact BIGINT
    sums; base-period values need no quantization at all (p_0*q_0 =
    c0 exactly), giving the invariant laspeyres_bp = 10000 at the base
    month; indices are integer `//`-vs-DIV basis points and Fisher is
    one correctly-rounded sqrt of their exact product, snapped to the
    integer grid.  One corpus aggregate to the (part, month) grid; the
    base join is grid-sized on the part key."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_shipdate").isNotNull()
                 & F.col("l_extendedprice").isNotNull()
                 & F.col("l_quantity").isNotNull())
          .select(F.col("l_partkey").alias("pk"),
                  F.date_trunc("month", "l_shipdate").cast("date")
                   .alias("m"),
                  F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                   .cast("long").alias("cents"),
                  F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
                   .alias("qty")))
    pm = (li.groupBy("pk", "m")
            .agg(F.sum("cents").cast("long").alias("sc"),
                 F.sum("qty").cast("long").alias("sq"))
            .where(F.col("sq") > 0))
    m0 = pm.agg(F.min("m").alias("base_m"))
    base = (pm.crossJoin(F.broadcast(m0))
              .where(F.col("m") == F.col("base_m"))
              .select(F.col("pk").alias("pk0"), F.col("sc").alias("c0"),
                      F.col("sq").alias("q0")))
    j = (pm.join(base, F.col("pk0") == F.col("pk"))
           .select("m", "sc", "sq", "c0", "q0",
                   F.expr("CAST(FLOOR(CAST(sc AS DOUBLE) / sq * q0 + 0.5) "
                          "AS BIGINT)").alias("lasp_c"),
                   F.expr("CAST(FLOOR(CAST(c0 AS DOUBLE) / q0 * sq + 0.5) "
                          "AS BIGINT)").alias("paas_c")))
    agg = (j.groupBy("m")
            .agg(F.count("*").cast("long").alias("n_parts"),
                 F.sum("lasp_c").cast("long").alias("lasp_num"),
                 F.sum("c0").cast("long").alias("lasp_den"),
                 F.sum("sc").cast("long").alias("paas_num"),
                 F.sum("paas_c").cast("long").alias("paas_den")))
    return agg.select(
        F.col("m").alias("month"), "n_parts",
        F.expr("lasp_num * 10000 DIV lasp_den").alias("laspeyres_bp"),
        F.expr("paas_num * 10000 DIV paas_den").alias("paasche_bp"),
        F.expr("CAST(FLOOR(SQRT(CAST((lasp_num * 10000 DIV lasp_den) "
               "AS DOUBLE) * CAST((paas_num * 10000 DIV paas_den) "
               "AS DOUBLE)) + 0.5) AS BIGINT)").alias("fisher_bp"))


# =====================================================================
# long-range dependence and extreme-value monitors (daily volume)
# =====================================================================

@query(
    "q_hurst_exponent",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS di,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    mn AS (SELECT MIN(di) AS d0, CAST(COUNT(*) AS BIGINT) AS nd
           FROM daily),
    ws AS (SELECT UNNEST([4, 8, 16, 32]) AS w),
    blk AS (
      SELECT ws.w, (daily.di - mn.d0) // ws.w AS b,
             (daily.di - mn.d0) % ws.w + 1 AS t_idx, daily.x
      FROM daily CROSS JOIN mn CROSS JOIN ws
    ),
    full_b AS (
      SELECT w, b, CAST(SUM(x) AS BIGINT) AS sb,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM blk GROUP BY w, b HAVING COUNT(*) = w
    ),
    z AS (
      SELECT a.w, a.b,
             CAST(a.w * SUM(c.x) - a.t_idx * fb.sb AS BIGINT) AS zw
      FROM blk a
      JOIN full_b fb ON fb.w = a.w AND fb.b = a.b
      JOIN blk c ON c.w = a.w AND c.b = a.b AND c.t_idx <= a.t_idx
      GROUP BY a.w, a.b, a.t_idx, fb.sb
    ),
    rs AS (
      SELECT z.w, z.b,
             CAST(GREATEST(MAX(zw), 0) - LEAST(MIN(zw), 0) AS BIGINT)
               AS rw,
             MAX(fb.sxx) AS sxx, MAX(fb.sb) AS sb
      FROM z JOIN full_b fb ON fb.w = z.w AND fb.b = z.b
      GROUP BY z.w, z.b
    ),
    rsq AS (
      SELECT w, b,
             CAST(FLOOR(CAST(rw AS DOUBLE)
                        / SQRT(CAST(w * sxx - sb * sb AS DOUBLE))
                        * 1e6 + 0.5) AS BIGINT) AS rs_e6
      FROM rs WHERE w * sxx - sb * sb > 0
    ),
    per_w AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(rs_e6) AS BIGINT) AS s_rs
      FROM rsq GROUP BY w
    ),
    xy AS (
      SELECT LN(CAST(w AS DOUBLE)) AS lx,
             LN(CAST(s_rs AS DOUBLE) / (CAST(n_blocks AS DOUBLE) * 1e6))
               AS ly,
             w, n_blocks, s_rs
      FROM per_w WHERE s_rs > 0
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pts, SUM(lx) AS sx,
             SUM(ly) AS sy, SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
      FROM xy
    )
    SELECT mn.nd AS n_days, fit.n_pts,
           CASE WHEN fit.n_pts >= 2
                     AND fit.n_pts * fit.sxx - fit.sx * fit.sx > 0
                THEN ROUND((fit.n_pts * fit.sxy - fit.sx * fit.sy)
                           / (fit.n_pts * fit.sxx - fit.sx * fit.sx), 6)
                ELSE NULL END AS hurst_h,
           (SELECT ROUND(CAST(s_rs AS DOUBLE)
                         / (CAST(n_blocks AS DOUBLE) * 1e6), 6)
            FROM per_w WHERE w = 8) AS mean_rs_w8,
           (SELECT ROUND(CAST(s_rs AS DOUBLE)
                         / (CAST(n_blocks AS DOUBLE) * 1e6), 6)
            FROM per_w WHERE w = 16) AS mean_rs_w16
    FROM fit CROSS JOIN mn
    """,
)
def q_hurst_exponent(spark, sf_dir):
    """Hurst exponent of the daily event-volume series by classical
    rescaled-range (R/S) analysis over window sizes {4,8,16,32} days —
    the long-range-dependence monitor (H ~ 0.5 = memoryless, H > 0.5 =
    persistent load trends, the regime where naive CIs on daily metrics
    are anti-conservative; complements q_acf_multilag's short-lag view).
    Exactness: within each COMPLETE w-day block the cumulative deviation
    is multiplied through by w (zw = w*cum - t*blocksum, exact BIGINT),
    the range Rw = max(zw,0)-min(zw,0) is exact, and R/S quantizes to
    e6 per block with ONE staged division by the correctly-rounded
    population-sd sqrt; per-w means are exact integer sums with a
    single terminal division; the 4-point log-log OLS slope follows the
    small-term-count exception.  Overflow bound: w*sxx < 2^63 holds to
    ~5e8 events/day.  Cost: one corpus aggregate to the day grid; the
    within-block triangular join is <= 16*|days| tiny rows."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull())
          .select(F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("2000-01-01").cast("date")).alias("di")))
    daily = ev.groupBy("di").agg(F.count("*").cast("long").alias("x"))
    mn = daily.agg(F.min("di").alias("d0"),
                   F.count("*").cast("long").alias("nd"))
    ws = (spark.range(0, 4)
          .select(F.expr("CAST(shiftleft(4, CAST(id AS INT)) AS BIGINT)")
                   .alias("w")))
    blk = (daily.crossJoin(F.broadcast(mn)).crossJoin(F.broadcast(ws))
                .select("w", F.expr("(di - d0) DIV w").alias("b"),
                        F.expr("(di - d0) % w + 1").alias("t_idx"), "x"))
    full_b = (blk.groupBy("w", "b")
                 .agg(F.sum("x").cast("long").alias("sb"),
                      F.sum(F.col("x") * F.col("x")).cast("long")
                       .alias("sxx"), F.count("*").alias("__cnt"))
                 .where(F.col("__cnt") == F.col("w")).drop("__cnt"))
    c = blk.select(F.col("w").alias("w2"), F.col("b").alias("b2"),
                   F.col("t_idx").alias("t2"), F.col("x").alias("x2"))
    z = (blk.join(full_b.select(F.col("w").alias("wf"),
                                F.col("b").alias("bf"), "sb"),
                  (F.col("wf") == F.col("w")) & (F.col("bf") == F.col("b")))
            .join(c, (F.col("w2") == F.col("w"))
                  & (F.col("b2") == F.col("b"))
                  & (F.col("t2") <= F.col("t_idx")))
            .groupBy("w", "b", "t_idx", "sb")
            .agg(F.expr("CAST(w * SUM(x2) - t_idx * sb AS BIGINT)")
                  .alias("zw")))
    rs = (z.join(full_b.select(F.col("w").alias("wf2"),
                               F.col("b").alias("bf2"), "sxx",
                               F.col("sb").alias("sb2")),
                 (F.col("wf2") == F.col("w")) & (F.col("bf2") == F.col("b")))
            .groupBy("w", "b")
            .agg(F.expr("CAST(GREATEST(MAX(zw), 0) - LEAST(MIN(zw), 0) "
                        "AS BIGINT)").alias("rw"),
                 F.max("sxx").alias("sxx"), F.max("sb2").alias("sb")))
    rsq = (rs.where(F.expr("w * sxx - sb * sb > 0"))
             .select("w", F.expr(
                 "CAST(FLOOR(CAST(rw AS DOUBLE) "
                 "/ SQRT(CAST(w * sxx - sb * sb AS DOUBLE)) "
                 "* 1e6 + 0.5) AS BIGINT)").alias("rs_e6")))
    per_w = (rsq.groupBy("w")
                .agg(F.count("*").cast("long").alias("n_blocks"),
                     F.sum("rs_e6").cast("long").alias("s_rs")))
    xy = (per_w.where(F.col("s_rs") > 0)
               .select("w", "n_blocks", "s_rs",
                       F.expr("LN(CAST(w AS DOUBLE))").alias("lx"),
                       F.expr("LN(CAST(s_rs AS DOUBLE) "
                              "/ (CAST(n_blocks AS DOUBLE) * 1e6))")
                        .alias("ly")))
    fit = xy.agg(F.count("*").cast("long").alias("n_pts"),
                 F.sum("lx").alias("sx"), F.sum("ly").alias("sy"),
                 F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
                 F.sum(F.col("lx") * F.col("lx")).alias("sxx"))
    mw = per_w.select(
        "w", pround(F.expr("CAST(s_rs AS DOUBLE) "
                           "/ (CAST(n_blocks AS DOUBLE) * 1e6)"), 6)
               .alias("mrs"))
    w8 = (mw.where(F.col("w") == 8)
            .agg(F.max("mrs").alias("mean_rs_w8")))
    w16 = (mw.where(F.col("w") == 16)
             .agg(F.max("mrs").alias("mean_rs_w16")))
    return (fit.crossJoin(F.broadcast(mn.select("nd")))
               .crossJoin(F.broadcast(w8)).crossJoin(F.broadcast(w16))
               .select(F.col("nd").alias("n_days"), "n_pts",
                       F.when(F.expr("n_pts >= 2 AND n_pts * sxx "
                                     "- sx * sx > 0"),
                              pround(F.expr(
                                  "(n_pts * sxy - sx * sy) "
                                  "/ (n_pts * sxx - sx * sx)"), 6))
                        .otherwise(F.lit(None).cast("double"))
                        .alias("hurst_h"),
                       "mean_rs_w8", "mean_rs_w16"))


@query(
    "q_gumbel_maxima",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS di,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    wk AS (
      SELECT di // 7 AS wb, CAST(MAX(x) AS BIGINT) AS m
      FROM daily GROUP BY di // 7
    ),
    mo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(m) AS BIGINT) AS s,
             CAST(SUM(m * m) AS BIGINT) AS sxx,
             CAST(MAX(m) AS BIGINT) AS mx
      FROM wk
    )
    SELECT n AS n_blocks, mx AS max_daily,
           CASE WHEN n >= 2 AND n * sxx - s * s > 0 THEN
             ROUND(CAST(s AS DOUBLE) / n
                   - CAST(0.5772156649015329 AS DOUBLE)
                     * (SQRT(CAST(n * sxx - s * s AS DOUBLE)
                             / (CAST(n AS DOUBLE) * (n - 1)))
                        * CAST(0.7796968012336761 AS DOUBLE)), 6)
           ELSE NULL END AS gumbel_mu,
           CASE WHEN n >= 2 AND n * sxx - s * s > 0 THEN
             ROUND(SQRT(CAST(n * sxx - s * s AS DOUBLE)
                        / (CAST(n AS DOUBLE) * (n - 1)))
                   * CAST(0.7796968012336761 AS DOUBLE), 6)
           ELSE NULL END AS gumbel_beta
    FROM mo
    """,
)
def q_gumbel_maxima(spark, sf_dir):
    """Gumbel extreme-value fit to WEEKLY maxima of daily event volume
    by the method of moments — the capacity-planning tail monitor ("how
    big a peak day should we provision for?"), the extreme-value shelf
    beside q_pettitt_test / q_cusum_changepoint.  Weekly blocks are the
    portable epoch-week (di // 7); block maxima, their sum and squared
    sum are exact BIGINTs (counts bounded ~3e9/day for n*sxx < 2^63);
    beta = s_sample * sqrt(6)/pi and mu = mean - gamma*beta stage the
    sample sd as ONE correctly-rounded sqrt of the exact rational
    (n*sxx - s^2)/(n*(n-1)), times sqrt(6)/pi and Euler-Mascheroni
    embedded as decimal LITERALS parsed identically by both engines
    (no libm constant evaluation on either side), with R6 terminals.
    Degenerate NULL below 2 blocks or zero spread."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull())
          .select(F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("1970-01-01").cast("date")).alias("di")))
    daily = ev.groupBy("di").agg(F.count("*").cast("long").alias("x"))
    wk = (daily.groupBy(F.expr("di DIV 7").alias("wb"))
               .agg(F.max("x").cast("long").alias("m")))
    mo = wk.agg(F.count("*").cast("long").alias("n"),
                F.sum("m").cast("long").alias("s"),
                F.sum(F.col("m") * F.col("m")).cast("long").alias("sxx"),
                F.max("m").cast("long").alias("mx"))
    guard = F.expr("n >= 2 AND n * sxx - s * s > 0")
    beta = ("SQRT(CAST(n * sxx - s * s AS DOUBLE) "
            "/ (CAST(n AS DOUBLE) * (n - 1))) "
            "* CAST(0.7796968012336761 AS DOUBLE)")
    mu = ("CAST(s AS DOUBLE) / n "
          "- CAST(0.5772156649015329 AS DOUBLE) * (" + beta + ")")
    return mo.select(
        F.col("n").alias("n_blocks"), F.col("mx").alias("max_daily"),
        F.when(guard, pround(F.expr(mu), 6))
         .otherwise(F.lit(None).cast("double")).alias("gumbel_mu"),
        F.when(guard, pround(F.expr(beta), 6))
         .otherwise(F.lit(None).cast("double")).alias("gumbel_beta"))


# =====================================================================
# matched / stratified categorical tests
# =====================================================================

@query(
    "q_cochran_q",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN n_chars < 200 THEN 1 ELSE 0 END AS true_flag
      FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
    ),
    votes AS (
      SELECT doc_id, r.r,
             CASE WHEN ('0x' || substring(md5('flag' || CAST(r.r AS VARCHAR)
                        || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10 < 2
                  THEN CAST(('0x' || substring(md5('bit' || CAST(r.r AS VARCHAR)
                       || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 AS BIGINT)
                  ELSE CAST(true_flag AS BIGINT) END AS x
      FROM d CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS r) r
    ),
    rows_ AS (
      SELECT doc_id, CAST(SUM(x) AS BIGINT) AS ri
      FROM votes GROUP BY doc_id
    ),
    cols AS (
      SELECT CAST(SUM(CASE WHEN r = 1 THEN x ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN r = 2 THEN x ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN r = 3 THEN x ELSE 0 END) AS BIGINT) AS c3
      FROM votes
    ),
    rsum AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(ri) AS BIGINT) AS s,
             CAST(SUM(ri * ri) AS BIGINT) AS sr2
      FROM rows_
    )
    SELECT rsum.n_items, cols.c1, cols.c2, cols.c3,
           CASE WHEN 3 * rsum.s - rsum.sr2 > 0
                THEN ROUND(CAST(2 * (3 * (cols.c1 * cols.c1
                                          + cols.c2 * cols.c2
                                          + cols.c3 * cols.c3)
                                     - rsum.s * rsum.s) AS DOUBLE)
                           / CAST(3 * rsum.s - rsum.sr2 AS DOUBLE), 6)
                ELSE NULL END AS q_stat,
           CAST(2 AS BIGINT) AS df
    FROM rsum CROSS JOIN cols
    """,
)
def q_cochran_q(spark, sf_dir):
    """Cochran's Q test for k=3 matched binary raters — do the three
    md5 'annotators' (same fixed-panel construction as q_fleiss_kappa,
    binary task: flag short docs, 20% noise lane) flag at DIFFERENT
    rates?  The k-treatment extension of q_mcnemar_test, and the binary
    analog of q_kendall_w's ordinal panel.  Q = (k-1)(k*sum C_j^2 -
    S^2) / (k*S - sum R_i^2) is a SINGLE division of exact BIGINTs
    (column totals, row totals, grand total all integer; overflow at
    S ~ 3e9 flags, documented), chi-square with k-1 = 2 df; NULL when
    every item is unanimous (denominator 0).  One corpus-sized vote
    fan-out (3 md5 digests/doc), two aggregates; no windows, no
    joins beyond the final 1x1 cross."""
    d = (_wide(load_table(spark, sf_dir, "documents"))
         .where(F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
         .select("doc_id",
                 F.when(F.col("n_chars") < 200, 1).otherwise(0)
                  .alias("true_flag")))
    r = spark.range(1, 4).select(F.col("id").cast("long").alias("r"))
    lane = F.conv(F.substring(F.md5(F.concat(
        F.lit("flag"), F.col("r").cast("string"), F.lit(":"),
        F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 10
    bit = F.conv(F.substring(F.md5(F.concat(
        F.lit("bit"), F.col("r").cast("string"), F.lit(":"),
        F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 2
    votes = (d.crossJoin(F.broadcast(r))
              .select("doc_id", "r",
                      F.when(lane < 2, bit)
                       .otherwise(F.col("true_flag").cast("long"))
                       .alias("x")))
    rows_ = votes.groupBy("doc_id").agg(F.sum("x").cast("long").alias("ri"))
    cols = votes.agg(*[
        F.sum(F.when(F.col("r") == i, F.col("x")).otherwise(0))
         .cast("long").alias(f"c{i}") for i in (1, 2, 3)])
    rsum = rows_.agg(F.count("*").cast("long").alias("n_items"),
                     F.sum("ri").cast("long").alias("s"),
                     F.sum(F.col("ri") * F.col("ri")).cast("long")
                      .alias("sr2"))
    return (rsum.crossJoin(F.broadcast(cols))
                .select("n_items", "c1", "c2", "c3",
                        F.when(F.expr("3 * s - sr2 > 0"),
                               pround(F.expr(
                                   "CAST(2 * (3 * (c1 * c1 + c2 * c2 "
                                   "+ c3 * c3) - s * s) AS DOUBLE) "
                                   "/ CAST(3 * s - sr2 AS DOUBLE)"), 6))
                         .otherwise(F.lit(None).cast("double"))
                         .alias("q_stat"),
                        F.lit(2).cast("long").alias("df")))


@query(
    "q_page_trend",
    oracle="""
    WITH ev AS (
      SELECT user_id, hour(CAST(ts AS TIMESTAMP)) // 8 AS seg,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
    ),
    us AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN seg = 0 THEN cents ELSE 0 END) AS BIGINT)
               AS m0,
             CAST(SUM(CASE WHEN seg = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS m1,
             CAST(SUM(CASE WHEN seg = 2 THEN cents ELSE 0 END) AS BIGINT)
               AS m2,
             CAST(SUM(CASE WHEN seg = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS k0,
             CAST(SUM(CASE WHEN seg = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS k1,
             CAST(SUM(CASE WHEN seg = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS k2
      FROM ev GROUP BY user_id
    ),
    cpl AS (
      SELECT m0, m1, m2 FROM us WHERE k0 > 0 AND k1 > 0 AND k2 > 0
    ),
    r2 AS (
      SELECT
        2 + 2 * (CASE WHEN m1 < m0 THEN 1 ELSE 0 END
                 + CASE WHEN m2 < m0 THEN 1 ELSE 0 END)
          + (CASE WHEN m1 = m0 THEN 1 ELSE 0 END
             + CASE WHEN m2 = m0 THEN 1 ELSE 0 END) AS r2_0,
        2 + 2 * (CASE WHEN m0 < m1 THEN 1 ELSE 0 END
                 + CASE WHEN m2 < m1 THEN 1 ELSE 0 END)
          + (CASE WHEN m0 = m1 THEN 1 ELSE 0 END
             + CASE WHEN m2 = m1 THEN 1 ELSE 0 END) AS r2_1,
        2 + 2 * (CASE WHEN m0 < m2 THEN 1 ELSE 0 END
                 + CASE WHEN m1 < m2 THEN 1 ELSE 0 END)
          + (CASE WHEN m0 = m2 THEN 1 ELSE 0 END
             + CASE WHEN m1 = m2 THEN 1 ELSE 0 END) AS r2_2
      FROM cpl
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS b,
             CAST(SUM(r2_0) AS BIGINT) AS s0,
             CAST(SUM(r2_1) AS BIGINT) AS s1,
             CAST(SUM(r2_2) AS BIGINT) AS s2
      FROM r2
    )
    SELECT b AS n_blocks,
           CAST(1 * s0 + 2 * s1 + 3 * s2 AS BIGINT) AS l2,
           CAST(b * 3 * 4 * 4 // 2 AS BIGINT) AS e_l2,
           CASE WHEN b > 0 THEN
             ROUND(CAST(1 * s0 + 2 * s1 + 3 * s2
                        - b * 3 * 4 * 4 // 2 AS DOUBLE)
                   / (2 * SQRT(CAST(b AS DOUBLE) * 9 * 4 * 8 / 144)), 6)
           ELSE NULL END AS z_page
    FROM s
    """,
)
def q_page_trend(spark, sf_dir):
    """Page's L trend test across the three ordered day segments
    (0-7h / 8-15h / 16-23h) with users as matched blocks: does per-user
    spend rank INCREASE through the day?  The matched-blocks analog of
    q_jonckheere_terpstra (JT pools independent observations; Page
    ranks WITHIN each user, killing between-user spend variance), and
    the ordered-alternative sibling of q_kendall_w's panel.  Blocks are
    users active in all three segments (complete blocks only,
    documented); each user's segment spends rank by the closed 3-value
    midrank comparison in DOUBLED units (r2 = 2 + 2#(less) + #(equal),
    exact BIGINT — no window, no sort), L2 = sum j*R2_j is exact, the
    null mean E[L2] = 2*b*k(k+1)^2/4 = b*24 is exact integer, and z
    stages the no-tie null sd 2*sqrt(b*k^2(k+1)(k^2-1)/144) from one
    correctly-rounded sqrt (tie-uncorrected, documented).  One corpus
    aggregate to user level; everything after is per-user Column math
    and one reduce."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("user_id").isNotNull())
          .select("user_id",
                  F.expr("hour(CAST(ts AS TIMESTAMP)) DIV 8").alias("seg"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents")))
    us = ev.groupBy("user_id").agg(
        *[F.sum(F.when(F.col("seg") == i, F.col("cents")).otherwise(0))
           .cast("long").alias(f"m{i}") for i in range(3)],
        *[F.sum(F.when(F.col("seg") == i, 1).otherwise(0))
           .cast("long").alias(f"k{i}") for i in range(3)])
    cpl = us.where((F.col("k0") > 0) & (F.col("k1") > 0)
                   & (F.col("k2") > 0))
    r2 = cpl.select(
        F.expr("2 + 2 * (CASE WHEN m1 < m0 THEN 1 ELSE 0 END "
               "+ CASE WHEN m2 < m0 THEN 1 ELSE 0 END) "
               "+ (CASE WHEN m1 = m0 THEN 1 ELSE 0 END "
               "+ CASE WHEN m2 = m0 THEN 1 ELSE 0 END)").alias("r2_0"),
        F.expr("2 + 2 * (CASE WHEN m0 < m1 THEN 1 ELSE 0 END "
               "+ CASE WHEN m2 < m1 THEN 1 ELSE 0 END) "
               "+ (CASE WHEN m0 = m1 THEN 1 ELSE 0 END "
               "+ CASE WHEN m2 = m1 THEN 1 ELSE 0 END)").alias("r2_1"),
        F.expr("2 + 2 * (CASE WHEN m0 < m2 THEN 1 ELSE 0 END "
               "+ CASE WHEN m1 < m2 THEN 1 ELSE 0 END) "
               "+ (CASE WHEN m0 = m2 THEN 1 ELSE 0 END "
               "+ CASE WHEN m1 = m2 THEN 1 ELSE 0 END)").alias("r2_2"))
    s = r2.agg(F.count("*").cast("long").alias("b"),
               F.sum("r2_0").cast("long").alias("s0"),
               F.sum("r2_1").cast("long").alias("s1"),
               F.sum("r2_2").cast("long").alias("s2"))
    return s.select(
        F.col("b").alias("n_blocks"),
        F.expr("CAST(1 * s0 + 2 * s1 + 3 * s2 AS BIGINT)").alias("l2"),
        F.expr("CAST(b * 3 * 4 * 4 DIV 2 AS BIGINT)").alias("e_l2"),
        F.when(F.col("b") > 0,
               pround(F.expr(
                   "CAST(1 * s0 + 2 * s1 + 3 * s2 "
                   "- b * 3 * 4 * 4 DIV 2 AS DOUBLE) "
                   "/ (2 * SQRT(CAST(b AS DOUBLE) * 9 * 4 * 8 / 144))"), 6))
         .otherwise(F.lit(None).cast("double")).alias("z_page"))


@query(
    "q_mantel_haenszel",
    oracle="""
    WITH ev AS (
      SELECT hour(CAST(ts AS TIMESTAMP)) // 6 AS stratum,
             CAST(('0x' || substring(md5('mh:' || CAST(event_id AS VARCHAR)),
                                     1, 8))::BIGINT % 2 AS BIGINT) AS arm,
             CASE WHEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 5000
                  THEN 1 ELSE 0 END AS y
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND event_id IS NOT NULL
    ),
    cell AS (
      SELECT stratum,
             CAST(SUM(CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN arm = 1 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN arm = 0 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN arm = 0 AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY stratum
    ),
    q AS (
      SELECT stratum, a, b, c, d, n,
             CAST(FLOOR(CAST(a * d AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT)
               AS ad_e6,
             CAST(FLOOR(CAST(b * c AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT)
               AS bc_e6
      FROM cell WHERE n > 0
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(ad_e6) AS BIGINT) AS s_ad,
             CAST(SUM(bc_e6) AS BIGINT) AS s_bc
      FROM q
    )
    SELECT n_strata, s_ad, s_bc,
           CASE WHEN s_bc > 0
                THEN ROUND(CAST(s_ad AS DOUBLE) / CAST(s_bc AS DOUBLE), 6)
                ELSE NULL END AS or_mh
    FROM s
    """,
)
def q_mantel_haenszel(spark, sf_dir):
    """Mantel-Haenszel common odds ratio for high-value outcome vs md5
    arm, STRATIFIED by the four 6-hour day blocks — the
    confounder-adjusted counterpart of q_odds_ratio_ci (if arm
    assignment or outcome base rates vary by time of day, the crude OR
    is Simpson-biased; MH pools the per-stratum ORs with the canonical
    a_i*d_i/n_i weights).  Per-stratum cross products quantize to exact
    e6 BIGINTs (single staged division each — the per-distinct recipe;
    a*d < 2^53 holds past 9e7 events/stratum), sums are exact, and the
    estimate is ONE terminal division through R6; NULL when the
    denominator mass is zero.  One corpus aggregate to the 4x2x2 cube;
    everything after is 4-row work."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("event_id").isNotNull())
          .select(F.expr("hour(CAST(ts AS TIMESTAMP)) DIV 6")
                   .alias("stratum"),
                  (F.conv(F.substring(F.md5(F.concat(
                      F.lit("mh:"), F.col("event_id").cast("string"))),
                      1, 8), 16, 10).cast("long") % 2).alias("arm"),
                  F.when(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long") >= 5000, 1).otherwise(0)
                   .alias("y")))
    cell = ev.groupBy("stratum").agg(
        F.sum(F.when((F.col("arm") == 1) & (F.col("y") == 1), 1)
               .otherwise(0)).cast("long").alias("a"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("y") == 0), 1)
               .otherwise(0)).cast("long").alias("b"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("y") == 1), 1)
               .otherwise(0)).cast("long").alias("c"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("y") == 0), 1)
               .otherwise(0)).cast("long").alias("d"),
        F.count("*").cast("long").alias("n"))
    q = (cell.where(F.col("n") > 0)
             .select(F.expr("CAST(FLOOR(CAST(a * d AS DOUBLE) / n * 1e6 "
                            "+ 0.5) AS BIGINT)").alias("ad_e6"),
                     F.expr("CAST(FLOOR(CAST(b * c AS DOUBLE) / n * 1e6 "
                            "+ 0.5) AS BIGINT)").alias("bc_e6")))
    s = q.agg(F.count("*").cast("long").alias("n_strata"),
              F.sum("ad_e6").cast("long").alias("s_ad"),
              F.sum("bc_e6").cast("long").alias("s_bc"))
    return s.select(
        "n_strata", "s_ad", "s_bc",
        F.when(F.col("s_bc") > 0,
               pround(F.expr("CAST(s_ad AS DOUBLE) / CAST(s_bc AS DOUBLE)"),
                      6))
         .otherwise(F.lit(None).cast("double")).alias("or_mh"))


# =====================================================================
# product growth accounting and experiment guardrails
# =====================================================================

@query(
    "q_growth_accounting",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS d
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    first_d AS (
      SELECT user_id, MIN(d) AS f FROM ud GROUP BY user_id
    ),
    flags AS (
      SELECT a.user_id, a.d, fd.f,
             CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS had_prev
      FROM ud a
      JOIN first_d fd ON fd.user_id = a.user_id
      LEFT JOIN ud p ON p.user_id = a.user_id AND p.d = a.d - 1
    ),
    per_day AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau,
             CAST(SUM(CASE WHEN f = d THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
             CAST(SUM(had_prev) AS BIGINT) AS retained,
             CAST(SUM(CASE WHEN had_prev = 0 AND f < d THEN 1 ELSE 0 END)
                  AS BIGINT) AS resurrected
      FROM flags GROUP BY d
    )
    SELECT a.d AS day_idx, a.dau, a.new_users, a.retained, a.resurrected,
           CAST(COALESCE(p.dau, 0) - a.retained AS BIGINT) AS churned
    FROM per_day a LEFT JOIN per_day p ON p.d = a.d - 1
    """,
)
def q_growth_accounting(spark, sf_dir):
    """Daily growth accounting of the active-user base — the canonical
    product-analytics decomposition DAU(d) = new + retained +
    resurrected, with churned(d) = DAU(d-1) - retained(d), the identity
    every growth dashboard reconciles (q_cohort_retention gives the
    triangle; this is the day-over-day flow view).  All-integer
    surface: the distinct user-day grid, per-user first day (min-agg),
    yesterday membership via a keyed self-join on (user, d-1) — never
    a window — and calendar adjacency by day-index arithmetic so gaps
    in the grid read as zero retention (documented).  Scale: two
    shuffles on the user-day grid (distinct + self-join), both keyed;
    the day rollup and the previous-day join are grid-sized."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
          .select("user_id",
                  F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("2000-01-01").cast("date")).alias("d")))
    ud = ev.distinct()
    first_d = ud.groupBy("user_id").agg(F.min("d").alias("f"))
    p = ud.select(F.col("user_id").alias("pu"), F.col("d").alias("pd"))
    flags = (ud.join(first_d, "user_id")
               .join(p, (F.col("pu") == F.col("user_id"))
                     & (F.col("pd") == F.col("d") - 1), "left")
               .select("d", "f",
                       F.when(F.col("pu").isNotNull(), 1).otherwise(0)
                        .alias("had_prev")))
    per_day = flags.groupBy("d").agg(
        F.count("*").cast("long").alias("dau"),
        F.sum(F.when(F.col("f") == F.col("d"), 1).otherwise(0))
         .cast("long").alias("new_users"),
        F.sum("had_prev").cast("long").alias("retained"),
        F.sum(F.when((F.col("had_prev") == 0) & (F.col("f") < F.col("d")),
                     1).otherwise(0)).cast("long").alias("resurrected"))
    pp = per_day.select(F.col("d").alias("d2"), F.col("dau").alias("dau2"))
    return (per_day.join(F.broadcast(pp), F.col("d2") == F.col("d") - 1,
                         "left")
                   .select(F.col("d").alias("day_idx"), "dau", "new_users",
                           "retained", "resurrected",
                           (F.coalesce(F.col("dau2"), F.lit(0))
                            - F.col("retained")).cast("long")
                            .alias("churned")))


@query(
    "q_srm_check",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(('0x' || substring(md5('mh:' || CAST(event_id AS VARCHAR)),
                                     1, 8))::BIGINT % 2 AS BIGINT) AS arm
      FROM events WHERE event_type IS NOT NULL AND event_id IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
      FROM ev GROUP BY event_type
    )
    SELECT event_type, n0, n1,
           CASE WHEN n0 + n1 > 0
                THEN ROUND(CAST((n1 - n0) * (n1 - n0) AS DOUBLE)
                           / CAST(n0 + n1 AS DOUBLE), 6)
                ELSE NULL END AS chi2_srm,
           CASE WHEN n0 + n1 > 0
                 AND CAST((n1 - n0) * (n1 - n0) AS DOUBLE)
                     / CAST(n0 + n1 AS DOUBLE)
                     > CAST(3.841458820694124 AS DOUBLE)
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             AS srm_flag
    FROM g
    """,
)
def q_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch guardrail per event_type for the md5 arm
    assignment (same 'mh:' lane as q_mantel_haenszel): chi-square of
    the observed 50/50 split, chi2 = (n1-n0)^2/(n1+n0), flagged at the
    alpha = 0.05 critical value 3.8415 (embedded as a decimal literal,
    no distribution-function call) — the FIRST check an experimentation
    platform runs before trusting any treatment-effect row (a
    mismatched split invalidates q_cuped / q_ipw_ate / q_diff_in_diff
    downstream).  Exact BIGINT squared difference over one staged
    division through R6; the flag compares the identically-staged
    double on both engines.  One corpus aggregate, 5 rows."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("event_type").isNotNull()
                 & F.col("event_id").isNotNull())
          .select("event_type",
                  (F.conv(F.substring(F.md5(F.concat(
                      F.lit("mh:"), F.col("event_id").cast("string"))),
                      1, 8), 16, 10).cast("long") % 2).alias("arm")))
    g = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long")
         .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long")
         .alias("n1"))
    chi = F.expr("CAST((n1 - n0) * (n1 - n0) AS DOUBLE) "
                 "/ CAST(n0 + n1 AS DOUBLE)")
    return g.select(
        "event_type", "n0", "n1",
        F.when(F.expr("n0 + n1 > 0"), pround(chi, 6))
         .otherwise(F.lit(None).cast("double")).alias("chi2_srm"),
        F.when(F.expr("n0 + n1 > 0")
               & (chi > F.expr("CAST(3.841458820694124 AS DOUBLE)")),
               F.lit(1).cast("long"))
         .otherwise(F.lit(0).cast("long")).alias("srm_flag"))


# =====================================================================
# engagement ratio, shrinkage estimation, and rank post-hoc contrasts
# =====================================================================

@query(
    "q_dau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS d
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    days AS (SELECT DISTINCT d FROM ud),
    dau AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d
    ),
    wau AS (
      SELECT days.d, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
      FROM days JOIN ud ON ud.d > days.d - 7 AND ud.d <= days.d
      GROUP BY days.d
    )
    SELECT dau.d AS day_idx, dau.dau, wau.wau,
           CAST(dau.dau * 10000 // wau.wau AS BIGINT) AS stickiness_bp
    FROM dau JOIN wau ON wau.d = dau.d
    """,
)
def q_dau_stickiness(spark, sf_dir):
    """DAU / trailing-7-day-WAU stickiness per day — the engagement
    ratio every growth dashboard pairs with q_growth_accounting's flow
    decomposition (what share of this week's audience shows up on a
    given day).  The trailing distinct-user count is the user-day grid
    range-joined to the day grid (d-6..d window, <= 7x grid fan-out,
    keyed never cartesian at scale because the day grid broadcasts),
    then COUNT(DISTINCT) per day; DAU is the plain grid rollup; the
    ratio is an exact integer `//`-vs-DIV basis-point surface.  Two
    shuffles total on the user-day grid."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
          .select("user_id",
                  F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("2000-01-01").cast("date")).alias("d")))
    ud = ev.distinct()
    days = ud.select("d").distinct().withColumnRenamed("d", "dd")
    dau = ud.groupBy("d").agg(F.count("*").cast("long").alias("dau"))
    wau = (ud.join(F.broadcast(days),
                   (F.col("d") > F.col("dd") - 7)
                   & (F.col("d") <= F.col("dd")))
             .groupBy("dd")
             .agg(F.countDistinct("user_id").cast("long").alias("wau")))
    return (dau.join(wau, F.col("dd") == F.col("d"))
               .select(F.col("d").alias("day_idx"), "dau", "wau",
                       F.expr("dau * 10000 DIV wau").alias("stickiness_bp")))


@query(
    "q_eb_shrinkage",
    oracle="""
    WITH e AS (
      SELECT event_type, user_id % 20 AS cell,
             CASE WHEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 5000
                  THEN 1 ELSE 0 END AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
        AND user_id IS NOT NULL
    ),
    g AS (
      SELECT event_type, cell, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s
      FROM e GROUP BY event_type, cell
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(s AS DOUBLE) / n) AS sp,
             SUM((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS spp,
             SUM(CAST(1 AS DOUBLE) / n) AS sinv
      FROM g
    ),
    ab AS (
      SELECT k, sp / k AS mu,
             (spp / k - (sp / k) * (sp / k))
             - (sp / k) * (CAST(1 AS DOUBLE) - sp / k) * (sinv / k)
               AS excess,
             (sp / k) * (CAST(1 AS DOUBLE) - sp / k) AS mv
      FROM mom
    ),
    prior AS (
      SELECT k, mu,
             CASE WHEN excess > 0 AND mv / excess - 1 > 0
                  THEN mv / excess - 1 ELSE CAST(20 AS DOUBLE) END AS m
      FROM ab
    )
    SELECT g.event_type, g.cell, g.n, g.s,
           ROUND(CAST(g.s AS DOUBLE) / g.n, 6) AS raw_rate,
           ROUND((CAST(g.s AS DOUBLE) + prior.mu * prior.m)
                 / (CAST(g.n AS DOUBLE) + prior.m), 6) AS eb_rate
    FROM g CROSS JOIN prior
    """,
)
def q_eb_shrinkage(spark, sf_dir):
    """Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    per-(event_type, user-cell) high-value rates toward the grand prior
    — the small-area estimator that stops a 3-observation cell from
    topping a leaderboard (the standard companion to q_wilson_interval:
    Wilson widens the interval, EB moves the point estimate).  The
    moment-matched prior strength m = mu(1-mu)/excess - 1 uses the
    between-cell variance minus the expected binomial sampling noise;
    when the excess is non-positive (no overdispersion) m falls back to
    a documented constant 20.  All cell cores are exact BIGINTs; the
    prior scalars are sums of identically-staged per-cell doubles over
    a BOUNDED 100-cell grid (small-term-count exception), and each
    shrunken rate is one staged expression through R6.  One corpus
    aggregate; everything else is grid-sized."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_type").isNotNull()
                 & F.col("user_id").isNotNull())
          .select("event_type", (F.col("user_id") % 20).alias("cell"),
                  F.when(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long") >= 5000, 1).otherwise(0)
                   .alias("y")))
    g = ev.groupBy("event_type", "cell").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"))
    mom = g.agg(F.count("*").cast("long").alias("k"),
                F.sum(F.expr("CAST(s AS DOUBLE) / n")).alias("sp"),
                F.sum(F.expr("(CAST(s AS DOUBLE) / n) "
                             "* (CAST(s AS DOUBLE) / n)")).alias("spp"),
                F.sum(F.expr("CAST(1 AS DOUBLE) / n")).alias("sinv"))
    ab = mom.select(
        "k", F.expr("sp / k").alias("mu"),
        F.expr("(spp / k - (sp / k) * (sp / k)) "
               "- (sp / k) * (CAST(1 AS DOUBLE) - sp / k) * (sinv / k)")
         .alias("excess"),
        F.expr("(sp / k) * (CAST(1 AS DOUBLE) - sp / k)").alias("mv"))
    prior = ab.select(
        "k", "mu",
        F.expr("CASE WHEN excess > 0 AND mv / excess - 1 > 0 "
               "THEN mv / excess - 1 ELSE CAST(20 AS DOUBLE) END")
         .alias("m"))
    return (g.crossJoin(F.broadcast(prior))
             .select("event_type", "cell", "n", "s",
                     pround(F.expr("CAST(s AS DOUBLE) / n"), 6)
                       .alias("raw_rate"),
                     pround(F.expr("(CAST(s AS DOUBLE) + mu * m) "
                                   "/ (CAST(n AS DOUBLE) + m)"), 6)
                       .alias("eb_rate")))


@query(
    "q_dunn_posthoc",
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
    tot AS (
      SELECT CAST(SUM(n_t) AS BIGINT) AS n FROM per
    ),
    ties AS (
      SELECT CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS t3 FROM gc
    ),
    pairs AS (
      SELECT a.event_type AS g1, b.event_type AS g2,
             a.n_t AS n1, b.n_t AS n2, a.r2_sum AS s1, b.r2_sum AS s2
      FROM per a JOIN per b ON a.event_type < b.event_type
    )
    SELECT g1, g2, n1, n2,
           ROUND((CAST(s1 AS DOUBLE) / (2 * n1)
                  - CAST(s2 AS DOUBLE) / (2 * n2)), 6) AS mean_rank_diff,
           CASE WHEN tot.n > 1 THEN
             ROUND((CAST(s1 AS DOUBLE) / (2 * n1)
                    - CAST(s2 AS DOUBLE) / (2 * n2))
                   / SQRT((CAST(tot.n AS DOUBLE) * (tot.n + 1) / 12
                           - CAST(ties.t3 AS DOUBLE)
                             / (12 * (tot.n - 1)))
                          * (CAST(1 AS DOUBLE) / n1
                             + CAST(1 AS DOUBLE) / n2)), 6)
           ELSE NULL END AS z_dunn
    FROM pairs CROSS JOIN tot CROSS JOIN ties
    """,
)
def q_dunn_posthoc(spark, sf_dir):
    """Dunn's post-hoc pairwise mean-rank contrasts with the
    tie-corrected pooled variance — WHICH event types differ, after
    q_kruskal_wallis says SOME do (the standard follow-up; Bonferroni
    over the 10 pair rows is the reader's division).  Reuses the exact
    doubled-midrank machinery (same gcr grid as KW, one bucketed_prefix
    pass); mean ranks are single divisions of exact BIGINT rank masses,
    the tie term sum(t^3-t) is exact on the cents grid, and each z
    stages the textbook sd sqrt((N(N+1)/12 - T/(12(N-1)))(1/n1+1/n2))
    identically on both engines.  One corpus aggregate to the cents
    grid; the 10 pair rows are grid work."""
    from access_mopper_spark.operators.prefix import bucketed_prefix as _bp

    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("c")))
    gc = ev.groupBy("c").agg(F.count("*").cast("long").alias("cnt"))
    gcr = _bp(gc, "c", ["cnt"]).select(
        "c", "cnt", (2 * F.col("cum_cnt") - F.col("cnt") + 1).alias("r2"))
    tc = ev.groupBy("event_type", "c").agg(
        F.count("*").cast("long").alias("n_tc"))
    per = (tc.join(gcr.select("c", "r2"), "c")
             .groupBy("event_type")
             .agg(F.sum("n_tc").cast("long").alias("n_t"),
                  F.sum(F.col("n_tc") * F.col("r2")).cast("long")
                   .alias("r2_sum")))
    tot = per.agg(F.sum("n_t").cast("long").alias("n"))
    ties = gc.agg(F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt")
                        - F.col("cnt")).cast("long").alias("t3"))
    b = per.select(F.col("event_type").alias("g2"),
                   F.col("n_t").alias("n2"), F.col("r2_sum").alias("s2"))
    pairs = (per.select(F.col("event_type").alias("g1"),
                        F.col("n_t").alias("n1"),
                        F.col("r2_sum").alias("s1"))
                .join(F.broadcast(b), F.col("g1") < F.col("g2")))
    diff = ("(CAST(s1 AS DOUBLE) / (2 * n1) "
            "- CAST(s2 AS DOUBLE) / (2 * n2))")
    sd = ("SQRT((CAST(n AS DOUBLE) * (n + 1) / 12 "
          "- CAST(t3 AS DOUBLE) / (12 * (n - 1))) "
          "* (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2))")
    return (pairs.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ties))
                 .select("g1", "g2", "n1", "n2",
                         pround(F.expr(diff), 6).alias("mean_rank_diff"),
                         F.when(F.col("n") > 1,
                                pround(F.expr(diff + " / " + sd), 6))
                          .otherwise(F.lit(None).cast("double"))
                          .alias("z_dunn")))


# =====================================================================
# ordinal agreement and operating-point selection
# =====================================================================

@query(
    "q_weighted_kappa",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN n_chars < 120 THEN 0
                  WHEN n_chars < 300 THEN 1 ELSE 2 END AS true_cat
      FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
    ),
    votes AS (
      SELECT doc_id, r.r,
             CASE WHEN ('0x' || substring(md5('rate' || CAST(r.r AS VARCHAR)
                        || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10 < 2
                  THEN CAST(('0x' || substring(md5('cat' || CAST(r.r AS VARCHAR)
                       || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 3 AS BIGINT)
                  ELSE CAST(true_cat AS BIGINT) END AS cat
      FROM d CROSS JOIN (SELECT UNNEST([1, 2]) AS r) r
    ),
    pairc AS (
      SELECT doc_id,
             MAX(CASE WHEN r = 1 THEN cat END) AS c1,
             MAX(CASE WHEN r = 2 THEN cat END) AS c2
      FROM votes GROUP BY doc_id
    ),
    o AS (
      SELECT c1, c2, CAST(COUNT(*) AS BIGINT) AS o_ij
      FROM pairc GROUP BY c1, c2
    ),
    marg AS (
      SELECT r1.c1, r2.c2, r1.ri, r2.cj
      FROM (SELECT c1, CAST(SUM(o_ij) AS BIGINT) AS ri FROM o GROUP BY c1) r1
      CROSS JOIN (SELECT c2, CAST(SUM(o_ij) AS BIGINT) AS cj
                  FROM o GROUP BY c2) r2
    ),
    s AS (
      SELECT (SELECT CAST(SUM(o_ij) AS BIGINT) FROM o) AS n,
             (SELECT CAST(SUM(ABS(c1 - c2) * o_ij) AS BIGINT) FROM o)
               AS wo,
             (SELECT CAST(SUM(ABS(c1 - c2) * ri * cj) AS BIGINT)
              FROM marg) AS we_n
    )
    SELECT n AS n_items, wo AS sum_w_observed, we_n AS sum_w_expected_x_n,
           CASE WHEN we_n > 0
                THEN ROUND(CAST(1 AS DOUBLE)
                           - CAST(n * wo AS DOUBLE) / CAST(we_n AS DOUBLE),
                           6)
                ELSE NULL END AS kappa_w
    FROM s
    """,
)
def q_weighted_kappa(spark, sf_dir):
    """Linear-weighted Cohen's kappa between md5 raters 1 and 2 on the
    3-category ordinal length task (same fixed panel as q_fleiss_kappa
    / q_cohens_kappa) — the ordinal agreement scalar where a
    one-category miss costs half a two-category miss (unweighted kappa
    throws that away; for graded annotation tasks weighted kappa is the
    number that matches intuition).  Fully exact rational surface:
    disagreement mass sum|i-j|*O_ij and the expected counterpart
    sum|i-j|*r_i*c_j are BIGINTs off the 9-cell confusion grid, and
    kappa_w = 1 - N*WO/WE_N is ONE staged division (overflow at
    N ~ 5e7... no: N*WO <= 2N^2 < 2^63 to N ~ 2.1e9, documented);
    degenerate NULL when the expected disagreement is zero.  One
    corpus-sized double-digest vote pass; everything after is 9-cell
    work."""
    d = (_wide(load_table(spark, sf_dir, "documents"))
         .where(F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
         .select("doc_id",
                 F.when(F.col("n_chars") < 120, 0)
                  .when(F.col("n_chars") < 300, 1).otherwise(2)
                  .alias("true_cat")))
    r = spark.range(1, 3).select(F.col("id").cast("long").alias("r"))
    lane = F.conv(F.substring(F.md5(F.concat(
        F.lit("rate"), F.col("r").cast("string"), F.lit(":"),
        F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 10
    cat = F.conv(F.substring(F.md5(F.concat(
        F.lit("cat"), F.col("r").cast("string"), F.lit(":"),
        F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 3
    votes = (d.crossJoin(F.broadcast(r))
              .select("doc_id", "r",
                      F.when(lane < 2, cat)
                       .otherwise(F.col("true_cat").cast("long"))
                       .alias("cat")))
    pairc = votes.groupBy("doc_id").agg(
        F.max(F.when(F.col("r") == 1, F.col("cat"))).alias("c1"),
        F.max(F.when(F.col("r") == 2, F.col("cat"))).alias("c2"))
    o = pairc.groupBy("c1", "c2").agg(F.count("*").cast("long")
                                       .alias("o_ij"))
    r1 = o.groupBy("c1").agg(F.sum("o_ij").cast("long").alias("ri"))
    r2 = o.groupBy("c2").agg(F.sum("o_ij").cast("long").alias("cj"))
    marg = r1.crossJoin(F.broadcast(r2))
    n_ = o.agg(F.sum("o_ij").cast("long").alias("n"))
    wo = o.agg(F.sum(F.abs(F.col("c1") - F.col("c2")) * F.col("o_ij"))
                .cast("long").alias("wo"))
    we = marg.agg(F.sum(F.abs(F.col("c1") - F.col("c2")) * F.col("ri")
                        * F.col("cj")).cast("long").alias("we_n"))
    return (n_.crossJoin(F.broadcast(wo)).crossJoin(F.broadcast(we))
              .select(F.col("n").alias("n_items"),
                      F.col("wo").alias("sum_w_observed"),
                      F.col("we_n").alias("sum_w_expected_x_n"),
                      F.when(F.col("we_n") > 0,
                             pround(F.expr(
                                 "CAST(1 AS DOUBLE) - CAST(n * wo AS DOUBLE)"
                                 " / CAST(we_n AS DOUBLE)"), 6))
                       .otherwise(F.lit(None).cast("double"))
                       .alias("kappa_w")))


@query(
    "q_youden_cut",
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
      SELECT CAST(LEAST(prob_bp * 20 // 10000, 19) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS pos
      FROM scored GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(pos) AS BIGINT) AS pt FROM b),
    cum AS (
      SELECT a.bin, CAST(SUM(c.n) AS BIGINT) AS cum_n,
             CAST(SUM(c.pos) AS BIGINT) AS cum_pos
      FROM b a JOIN b c ON c.bin >= a.bin
      GROUP BY a.bin
    ),
    cand AS (
      SELECT cum.bin AS cut_bin, cum.cum_pos AS tp,
             cum.cum_n - cum.cum_pos AS fp,
             tot.pt - cum.cum_pos AS fn,
             (tot.nt - tot.pt) - (cum.cum_n - cum.cum_pos) AS tn,
             tot.pt, tot.nt,
             CAST(cum.cum_pos * (tot.nt - tot.pt)
                  - (cum.cum_n - cum.cum_pos) * tot.pt AS BIGINT)
               AS j_cross
      FROM cum CROSS JOIN tot
      WHERE tot.pt > 0 AND tot.nt - tot.pt > 0
    )
    SELECT cut_bin, tp, fp, fn, tn, j_cross,
           ROUND(CAST(tp AS DOUBLE) / pt, 6) AS tpr,
           ROUND(CAST(fp AS DOUBLE) / (nt - pt), 6) AS fpr,
           ROUND(CAST(tp AS DOUBLE) / pt
                 - CAST(fp AS DOUBLE) / (nt - pt), 6) AS youden_j
    FROM cand ORDER BY j_cross DESC, cut_bin ASC LIMIT 1
    """,
)
def q_youden_cut(spark, sf_dir):
    """Youden-optimal operating point for the md5 calibration
    classifier: the score-bin cut maximizing J = TPR - FPR — the
    threshold selector that turns q_auc_roc's ranking quality and
    q_confusion_thresholds' sweep into ONE recommended cut (equal-cost
    regime; the knee of the ROC curve).  The argmax is EXACT: J is
    compared via the cross-multiplied integer tp*(nt-pt) - fp*pt (no
    double enters the ordering; overflow at ~3e9 rows, documented),
    ties to the smallest bin; TPR/FPR/J ship as staged divisions
    through R6 alongside the full integer confusion at the cut.
    One corpus aggregate to 20 bins; cumulative-from-the-top is the
    broadcast triangular join; the pick is a 20-row sort."""
    li = load_table(spark, sf_dir, "lineitem")
    lane = (F.conv(F.substring(F.md5(F.concat(
        F.lit("cal:"), F.col("l_orderkey").cast("string"),
        F.lit(":"), F.col("l_linenumber").cast("string"))), 1, 8),
        16, 10).cast("long") % 10000)
    prob = (F.col("l_partkey") * 37 + F.col("l_suppkey")) % 10001
    scored = li.select(prob.alias("prob_bp"),
                       F.when(lane < prob, 1).otherwise(0).alias("label"))
    b = (scored.groupBy(F.expr("least(prob_bp * 20 DIV 10000, 19)")
                         .cast("long").alias("bin"))
               .agg(F.count("*").cast("long").alias("n"),
                    F.sum("label").cast("long").alias("pos")))
    tot = b.agg(F.sum("n").cast("long").alias("nt"),
                F.sum("pos").cast("long").alias("pt"))
    c = b.select(F.col("bin").alias("bin2"), F.col("n").alias("n2"),
                 F.col("pos").alias("pos2"))
    cum = (b.join(F.broadcast(c), F.col("bin2") >= F.col("bin"))
            .groupBy("bin")
            .agg(F.sum("n2").cast("long").alias("cum_n"),
                 F.sum("pos2").cast("long").alias("cum_pos")))
    cand = (cum.crossJoin(F.broadcast(tot))
               .where((F.col("pt") > 0) & (F.col("nt") - F.col("pt") > 0))
               .select(F.col("bin").alias("cut_bin"),
                       F.col("cum_pos").alias("tp"),
                       (F.col("cum_n") - F.col("cum_pos")).alias("fp"),
                       (F.col("pt") - F.col("cum_pos")).alias("fn"),
                       ((F.col("nt") - F.col("pt"))
                        - (F.col("cum_n") - F.col("cum_pos"))).alias("tn"),
                       F.col("pt"), F.col("nt"),
                       F.expr("CAST(cum_pos * (nt - pt) "
                              "- (cum_n - cum_pos) * pt AS BIGINT)")
                        .alias("j_cross")))
    best = cand.orderBy(F.col("j_cross").desc(),
                        F.col("cut_bin").asc()).limit(1)
    return best.select(
        "cut_bin", "tp", "fp", "fn", "tn", "j_cross",
        pround(F.expr("CAST(tp AS DOUBLE) / pt"), 6).alias("tpr"),
        pround(F.expr("CAST(fp AS DOUBLE) / (nt - pt)"), 6).alias("fpr"),
        pround(F.expr("CAST(tp AS DOUBLE) / pt "
                      "- CAST(fp AS DOUBLE) / (nt - pt)"), 6)
          .alias("youden_j"))


# =====================================================================
# step-down multiple testing and the CMH test statistic
# =====================================================================

@query(
    "q_holm_bonferroni",
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
    kstop AS (
      SELECT MIN(CASE WHEN r.p_e9 * (m.m - r.rank + 1) > 50000000
                      THEN r.rank ELSE NULL END) AS ks
      FROM r CROSS JOIN m
    )
    SELECT r.event_type, r.h, r.n_i, r.p_e9, r.rank,
           COALESCE(r.rank < kstop.ks, TRUE) AS rejected
    FROM r CROSS JOIN kstop
    """,
)
def q_holm_bonferroni(spark, sf_dir):
    """Holm step-down familywise-error control over the same
    (event_type x hour) p-proxy grid as q_benjamini_hochberg — the FWER
    twin (BH controls the false-DISCOVERY rate; Holm is the uniformly-
    more-powerful Bonferroni that a safety-critical alerting pipeline
    uses when a single false alarm is the cost).  Same rational
    p-proxy 1/(1+z^2) quantized to e9 integers (no distribution
    function anywhere), deterministic total order on the 120-cell
    grid, and the step-down boundary is the exact integer comparison
    p_(k) * (m-k+1) > alpha*1e9: the FIRST failing rank stops all
    later rejections (rejected = rank < min failing rank, everything
    rejected when none fail).  The row_number runs on the bounded
    cell grid (plan-audit allowlist, as in BH).  One corpus
    aggregate; grid work after."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("event_type").isNotNull())
          .select("event_type",
                  F.hour(F.col("ts").cast("timestamp")).alias("h"),
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
    kstop = (r.crossJoin(F.broadcast(m))
              .agg(F.min(F.when(F.col("p_e9")
                                * (F.col("m") - F.col("rank") + 1)
                                > 50000000,
                                F.col("rank"))).alias("ks")))
    return (r.crossJoin(F.broadcast(kstop))
             .select("event_type", "h", "n_i", "p_e9", "rank",
                     F.coalesce(F.col("rank") < F.col("ks"),
                                F.lit(True)).alias("rejected")))


@query(
    "q_cmh_test",
    oracle="""
    WITH ev AS (
      SELECT hour(CAST(ts AS TIMESTAMP)) // 6 AS stratum,
             CAST(('0x' || substring(md5('mh:' || CAST(event_id AS VARCHAR)),
                                     1, 8))::BIGINT % 2 AS BIGINT) AS arm,
             CASE WHEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) >= 5000
                  THEN 1 ELSE 0 END AS y
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND event_id IS NOT NULL
    ),
    cell AS (
      SELECT stratum,
             CAST(SUM(CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY stratum
    ),
    q AS (
      SELECT a, n1, m1, n,
             CAST(FLOOR(CAST(n1 * m1 AS DOUBLE) / n * 1e6 + 0.5)
                  AS BIGINT) AS e_e6,
             CAST(FLOOR(CAST(n1 AS DOUBLE) / n
                        * (CAST(n - n1 AS DOUBLE) / n) * m1
                        * (CAST(n - m1 AS DOUBLE) / (n - 1))
                        * 1e6 + 0.5) AS BIGINT) AS v_e6
      FROM cell WHERE n >= 2
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(a) AS BIGINT) AS sa,
             CAST(SUM(e_e6) AS BIGINT) AS se,
             CAST(SUM(v_e6) AS BIGINT) AS sv
      FROM q
    )
    SELECT n_strata, sa, se, sv,
           CASE WHEN sv > 0
                THEN ROUND(CAST(sa * 1000000 - se AS DOUBLE)
                           * CAST(sa * 1000000 - se AS DOUBLE)
                           / (CAST(1000000 AS DOUBLE)
                              * CAST(sv AS DOUBLE)), 6)
                ELSE NULL END AS chi2_cmh
    FROM s
    """,
)
def q_cmh_test(spark, sf_dir):
    """Cochran-Mantel-Haenszel chi-square (1 df, no continuity
    correction) for arm-vs-outcome association controlling the 6-hour
    strata — the TEST companion to q_mantel_haenszel's pooled OR
    estimate (same 'mh:' lanes and strata; the OR says how big, CMH
    says whether it survives stratification at all).  Per-stratum
    hypergeometric expectation n1*m1/n and variance
    n1*n0*m1*m0/(n^2(n-1)) micro-quantize to exact e6 BIGINTs (the
    same staging as q_logrank_test — this IS the log-rank machinery
    applied to one 2x2 per stratum), sums exact, and chi2 =
    (Sa-SE)^2/SV stages the squared difference in doubles from the
    exact e6 cores (the BIGINT square would overflow past ~3e9
    events).  One corpus aggregate to 4 strata rows."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull()
                 & F.col("event_id").isNotNull())
          .select(F.expr("hour(CAST(ts AS TIMESTAMP)) DIV 6")
                   .alias("stratum"),
                  (F.conv(F.substring(F.md5(F.concat(
                      F.lit("mh:"), F.col("event_id").cast("string"))),
                      1, 8), 16, 10).cast("long") % 2).alias("arm"),
                  F.when(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long") >= 5000, 1).otherwise(0)
                   .alias("y")))
    cell = ev.groupBy("stratum").agg(
        F.sum(F.when((F.col("arm") == 1) & (F.col("y") == 1), 1)
               .otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long")
         .alias("n1"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast("long")
         .alias("m1"),
        F.count("*").cast("long").alias("n"))
    q = (cell.where(F.col("n") >= 2)
             .select("a",
                     F.expr("CAST(FLOOR(CAST(n1 * m1 AS DOUBLE) / n * 1e6 "
                            "+ 0.5) AS BIGINT)").alias("e_e6"),
                     F.expr("CAST(FLOOR(CAST(n1 AS DOUBLE) / n "
                            "* (CAST(n - n1 AS DOUBLE) / n) * m1 "
                            "* (CAST(n - m1 AS DOUBLE) / (n - 1)) "
                            "* 1e6 + 0.5) AS BIGINT)").alias("v_e6")))
    s = q.agg(F.count("*").cast("long").alias("n_strata"),
              F.sum("a").cast("long").alias("sa"),
              F.sum("e_e6").cast("long").alias("se"),
              F.sum("v_e6").cast("long").alias("sv"))
    return s.select(
        "n_strata", "sa", "se", "sv",
        F.when(F.col("sv") > 0,
               pround(F.expr(
                   "CAST(sa * 1000000 - se AS DOUBLE) "
                   "* CAST(sa * 1000000 - se AS DOUBLE) "
                   "/ (CAST(1000000 AS DOUBLE) * CAST(sv AS DOUBLE))"), 6))
         .otherwise(F.lit(None).cast("double")).alias("chi2_cmh"))


# =====================================================================
# lead-lag structure between event streams
# =====================================================================

@query(
    "q_cross_correlation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS di,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT)
               // CAST(COUNT(*) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    lags AS (SELECT UNNEST(range(-3, 4)) AS lag),
    pairs AS (
      SELECT a.event_type AS et_x, b.event_type AS et_y, l.lag,
             a.v AS x, b.v AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.event_type <> a.event_type
                  AND b.di = a.di + l.lag
    ),
    m AS (
      SELECT et_x, et_y, lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY et_x, et_y, lag
    )
    SELECT et_x, et_y, CAST(lag AS INTEGER) AS lag, n AS n_pairs,
           ROUND({_RHO_SQL}, 6) AS ccf
    FROM m WHERE n >= 3
    """,
)
def q_cross_correlation(spark, sf_dir):
    """Cross-correlation function between every ordered pair of event
    types' daily mean-cents series at lags -3..+3 — the lead-lag map
    ("do clicks today predict purchases tomorrow?") that q_acf_multilag
    cannot see (ACF is within-series; CCF is the between-series
    matrix a mixture scheduler or anomaly correlator reads).  Daily
    values are integer DIV means (bounded by the value domain, so the
    BIGINT moment bound is scale-free — the reason means, not totals:
    totals overflow the moment products at x100), the per-(pair, lag)
    Pearson uses the identical staged-rho text as q_acf_multilag /
    q_pacf_daily, pairs with under 3 aligned days drop (documented).
    One corpus aggregate to the (type, day) grid; the 7-lag pair join
    is grid x grid with an equality key on day+lag — never cartesian
    at scale."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select("event_type",
                  F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("2000-01-01").cast("date")).alias("di"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents")))
    daily = (ev.groupBy("event_type", "di")
               .agg(F.expr("CAST(SUM(cents) AS BIGINT) DIV COUNT(*)")
                     .alias("v")))
    lags = spark.range(-3, 4).select(F.col("id").cast("long").alias("lag"))
    b = daily.select(F.col("event_type").alias("et_y"),
                     F.col("di").alias("di2"), F.col("v").alias("y"))
    pairs = (daily.crossJoin(F.broadcast(lags))
                  .join(b, (F.col("et_y") != F.col("event_type"))
                        & (F.col("di2") == F.col("di") + F.col("lag")))
                  .select(F.col("event_type").alias("et_x"), "et_y",
                          "lag", F.col("v").alias("x"), "y"))
    m = (pairs.groupBy("et_x", "et_y", "lag")
              .agg(F.count("*").cast("long").alias("n"),
                   F.sum("x").cast("long").alias("sx"),
                   F.sum("y").cast("long").alias("sy"),
                   F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
                   F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
                   F.sum(F.col("y") * F.col("y")).cast("long").alias("syy")))
    return (m.where(F.col("n") >= 3)
             .select("et_x", "et_y", F.col("lag").cast("int").alias("lag"),
                     F.col("n").alias("n_pairs"),
                     F.expr(_RHO_SQL).alias("ccf"))
             .withColumn("ccf", pround(F.col("ccf"), 6)))


@query(
    "q_granger_1lag",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS di,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT)
               // CAST(COUNT(*) AS BIGINT) AS v
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    tri AS (
      SELECT y.event_type AS et_y, x.event_type AS et_x,
             cy.v AS yt, y.v AS z1, x.v AS z2
      FROM daily cy
      JOIN daily y ON y.event_type = cy.event_type
                  AND y.di = cy.di - 1
      JOIN daily x ON x.event_type <> cy.event_type
                  AND x.di = cy.di - 1
    ),
    m AS (
      SELECT et_y, et_x, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yt) AS BIGINT) AS sy, CAST(SUM(z1) AS BIGINT) AS s1,
             CAST(SUM(z2) AS BIGINT) AS s2,
             CAST(SUM(yt * yt) AS BIGINT) AS syy,
             CAST(SUM(z1 * z1) AS BIGINT) AS s11,
             CAST(SUM(z2 * z2) AS BIGINT) AS s22,
             CAST(SUM(z1 * z2) AS BIGINT) AS s12,
             CAST(SUM(z1 * yt) AS BIGINT) AS s1y,
             CAST(SUM(z2 * yt) AS BIGINT) AS s2y
      FROM tri GROUP BY et_y, et_x
    ),
    c AS (
      SELECT et_y, et_x, n,
             CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
             CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
             CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
             CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
             CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
             CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y
      FROM m WHERE n >= 4
    ),
    f AS (
      SELECT et_y, et_x, n,
             cyy - c1y * c1y / c11 AS rss0,
             cyy - ((c1y * c22 - c2y * c12)
                    / (c11 * c22 - c12 * c12)) * c1y
                 - ((c2y * c11 - c1y * c12)
                    / (c11 * c22 - c12 * c12)) * c2y AS rss1,
             c11 * c22 - c12 * c12 AS det, c11
      FROM c
    )
    SELECT et_y, et_x, n AS n_obs,
           CASE WHEN c11 > 0 AND det > 0 AND rss1 > 0
                THEN ROUND((rss0 - rss1) * (n - 3) / rss1, 6)
                ELSE NULL END AS f_granger
    FROM f
    """,
)
def q_granger_1lag(spark, sf_dir):
    """One-lag Granger causality F between every ordered pair of event
    types' daily mean-cents series: does yesterday's X improve the
    AR(1) prediction of today's Y? — the directional companion to
    q_cross_correlation (CCF shows association at a lag; Granger asks
    whether it adds information BEYOND Y's own history, the standard
    lead-lag screen).  Restricted (y ~ y_lag) and unrestricted
    (y ~ y_lag + x_lag) RSS come in closed form from centered second
    moments: every raw moment is an exact BIGINT on the day grid
    (integer-DIV daily means keep the bound scale-free), centering
    n*S - s*s stays BIGINT, and the determinant solve stages
    identically in doubles; F = (RSS0-RSS1)(n-3)/RSS1 with
    degenerate guards (collinear or zero-variance pairs -> NULL,
    n >= 4).  One corpus aggregate; the triple alignment join is
    grid-keyed on (type, day)."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select("event_type",
                  F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("2000-01-01").cast("date")).alias("di"),
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("cents")))
    daily = (ev.groupBy("event_type", "di")
               .agg(F.expr("CAST(SUM(cents) AS BIGINT) DIV COUNT(*)")
                     .alias("v")))
    yl = daily.select(F.col("event_type").alias("et_l"),
                      F.col("di").alias("di_l"), F.col("v").alias("z1"))
    xl = daily.select(F.col("event_type").alias("et_x"),
                      F.col("di").alias("di_x"), F.col("v").alias("z2"))
    tri = (daily.join(yl, (F.col("et_l") == F.col("event_type"))
                      & (F.col("di_l") == F.col("di") - 1))
                .join(xl, (F.col("et_x") != F.col("event_type"))
                      & (F.col("di_x") == F.col("di") - 1))
                .select(F.col("event_type").alias("et_y"), "et_x",
                        F.col("v").alias("yt"), "z1", "z2"))
    m = (tri.groupBy("et_y", "et_x")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("yt").cast("long").alias("sy"),
                 F.sum("z1").cast("long").alias("s1"),
                 F.sum("z2").cast("long").alias("s2"),
                 F.sum(F.col("yt") * F.col("yt")).cast("long").alias("syy"),
                 F.sum(F.col("z1") * F.col("z1")).cast("long").alias("s11"),
                 F.sum(F.col("z2") * F.col("z2")).cast("long").alias("s22"),
                 F.sum(F.col("z1") * F.col("z2")).cast("long").alias("s12"),
                 F.sum(F.col("z1") * F.col("yt")).cast("long").alias("s1y"),
                 F.sum(F.col("z2") * F.col("yt")).cast("long").alias("s2y")))
    c = (m.where(F.col("n") >= 4)
          .select("et_y", "et_x", "n",
                  F.expr("CAST(n * syy - sy * sy AS DOUBLE)").alias("cyy"),
                  F.expr("CAST(n * s11 - s1 * s1 AS DOUBLE)").alias("c11"),
                  F.expr("CAST(n * s22 - s2 * s2 AS DOUBLE)").alias("c22"),
                  F.expr("CAST(n * s12 - s1 * s2 AS DOUBLE)").alias("c12"),
                  F.expr("CAST(n * s1y - s1 * sy AS DOUBLE)").alias("c1y"),
                  F.expr("CAST(n * s2y - s2 * sy AS DOUBLE)").alias("c2y")))
    f = c.select(
        "et_y", "et_x", "n",
        F.expr("cyy - c1y * c1y / c11").alias("rss0"),
        F.expr("cyy - ((c1y * c22 - c2y * c12) "
               "/ (c11 * c22 - c12 * c12)) * c1y "
               "- ((c2y * c11 - c1y * c12) "
               "/ (c11 * c22 - c12 * c12)) * c2y").alias("rss1"),
        F.expr("c11 * c22 - c12 * c12").alias("det"), F.col("c11"))
    return f.select(
        "et_y", "et_x", F.col("n").alias("n_obs"),
        F.when(F.expr("c11 > 0 AND det > 0 AND rss1 > 0"),
               pround(F.expr("(rss0 - rss1) * (n - 3) / rss1"), 6))
         .otherwise(F.lit(None).cast("double")).alias("f_granger"))


# =====================================================================
# periodicity detection and burst episodes (daily volume)
# =====================================================================

@query(
    "q_period_detect",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS di,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    mn AS (SELECT MIN(di) AS d0 FROM daily),
    ps AS (SELECT UNNEST(range(2, 11)) AS p),
    ph AS (
      SELECT ps.p, (daily.di - mn.d0) % ps.p AS phase,
             CAST(COUNT(*) AS BIGINT) AS n_ph,
             CAST(SUM(daily.x) AS BIGINT) AS s_ph
      FROM daily CROSS JOIN mn CROSS JOIN ps
      GROUP BY ps.p, (daily.di - mn.d0) % ps.p
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ss
      FROM daily
    ),
    str_ AS (
      SELECT ph.p,
             SUM(CAST(s_ph AS DOUBLE) * s_ph / n_ph)
             - CAST(tot.s AS DOUBLE) * tot.s / tot.n AS ssb,
             CAST(tot.ss AS DOUBLE)
             - CAST(tot.s AS DOUBLE) * tot.s / tot.n AS sst
      FROM ph CROSS JOIN tot
      GROUP BY ph.p, tot.s, tot.n, tot.ss
    ),
    r AS (
      SELECT p, CASE WHEN sst > 0 THEN ROUND(ssb / sst, 6)
                     ELSE NULL END AS strength
      FROM str_
    ),
    mx AS (SELECT MAX(strength) AS mr FROM r),
    bp AS (SELECT MIN(p) AS best FROM r CROSS JOIN mx
           WHERE strength = mx.mr)
    SELECT r.p, r.strength,
           COALESCE(r.p = bp.best, FALSE) AS is_best
    FROM r CROSS JOIN bp
    """,
)
def q_period_detect(spark, sf_dir):
    """Dominant-period detection on the daily event-volume series by
    phase folding: for every candidate period p in 2..10, fold days
    onto di mod p and score the between-phase variance share
    SSB/SST (the 'autoperiod' folding statistic) — q_dow_seasonality
    and q_seasonal_decompose ASSUME the week; this row DISCOVERS the
    period (templated crawls and batch jobs beat at 2-, 3-, or
    10-day cycles the weekly profile never shows).  Phase cores
    (n_ph, s_ph) and totals are exact BIGINTs; each p's strength sums
    <= 10 identically-staged per-phase doubles (small-term-count
    exception) with one SST division; the winner is the maximum of the
    R6-SNAPPED strengths with smallest-p tie-break — the argmax runs
    on the 1e-6 grid both engines share, so sub-grid summation-order
    noise cannot flip the flag (it did, on fuzz seeds, when the
    argmax read the raw doubles).  One corpus aggregate to the day
    grid; the 9-period folding is a broadcast fan-out over grid
    rows."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull())
          .select(F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("2000-01-01").cast("date")).alias("di")))
    daily = ev.groupBy("di").agg(F.count("*").cast("long").alias("x"))
    mn = daily.agg(F.min("di").alias("d0"))
    ps = spark.range(2, 11).select(F.col("id").cast("long").alias("p"))
    ph = (daily.crossJoin(F.broadcast(mn)).crossJoin(F.broadcast(ps))
               .groupBy("p", F.expr("(di - d0) % p").alias("phase"))
               .agg(F.count("*").cast("long").alias("n_ph"),
                    F.sum("x").cast("long").alias("s_ph")))
    tot = daily.agg(F.count("*").cast("long").alias("n"),
                    F.sum("x").cast("long").alias("s"),
                    F.sum(F.col("x") * F.col("x")).cast("long").alias("ss"))
    str_ = (ph.crossJoin(F.broadcast(tot))
              .groupBy("p", "s", "n", "ss")
              .agg(F.sum(F.expr("CAST(s_ph AS DOUBLE) * s_ph / n_ph"))
                    .alias("ssb_part"))
              .select("p",
                      F.expr("ssb_part - CAST(s AS DOUBLE) * s / n")
                       .alias("ssb"),
                      F.expr("CAST(ss AS DOUBLE) "
                             "- CAST(s AS DOUBLE) * s / n").alias("sst")))
    r = str_.select("p", F.when(F.col("sst") > 0,
                                pround(F.expr("ssb / sst"), 6))
                          .otherwise(F.lit(None).cast("double"))
                          .alias("strength"))
    mx = r.agg(F.max("strength").alias("mr"))
    bp = (r.crossJoin(F.broadcast(mx))
           .where(F.col("strength") == F.col("mr"))
           .agg(F.min("p").alias("best")))
    return (r.crossJoin(F.broadcast(bp))
             .select("p", "strength",
                     F.coalesce(F.col("p") == F.col("best"),
                                F.lit(False)).alias("is_best")))


@query(
    "q_burst_episodes",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2000-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS di,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    dd AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd
      FROM daily GROUP BY event_type
    ),
    dv AS (
      SELECT event_type, x AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM daily GROUP BY event_type, x
    ),
    cum AS (
      SELECT a.event_type, a.v, CAST(SUM(b.c) AS BIGINT) AS cle
      FROM dv a JOIN dv b ON b.event_type = a.event_type AND b.v <= a.v
      GROUP BY a.event_type, a.v
    ),
    med AS (
      SELECT cum.event_type, MIN(cum.v) AS m
      FROM cum JOIN dd ON dd.event_type = cum.event_type
      WHERE 2 * cum.cle >= dd.nd
      GROUP BY cum.event_type
    ),
    burst AS (
      SELECT daily.event_type, daily.di, daily.x, med.m
      FROM daily JOIN med ON med.event_type = daily.event_type
      WHERE 5 * daily.x > 6 * med.m
    ),
    starts AS (
      SELECT b.event_type, b.di
      FROM burst b LEFT JOIN burst p
        ON p.event_type = b.event_type AND p.di = b.di - 1
      WHERE p.di IS NULL
    ),
    assign AS (
      SELECT b.event_type, b.di, b.x, b.m, MAX(s.di) AS ep_start
      FROM burst b JOIN starts s
        ON s.event_type = b.event_type AND s.di <= b.di
      GROUP BY b.event_type, b.di, b.x, b.m
    )
    SELECT event_type, ep_start AS start_di,
           CAST(MAX(di) AS BIGINT) AS end_di,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(x) AS BIGINT) AS peak,
           CAST(SUM(x) AS BIGINT) AS total_events,
           CAST(MAX(m) AS BIGINT) AS median_daily
    FROM assign GROUP BY event_type, ep_start
    """,
)
def q_burst_episodes(spark, sf_dir):
    """Burst-episode extraction per event type: maximal runs of
    consecutive days whose volume exceeds 1.2x the type's median
    daily volume (the integer comparison 5x > 6m — no ratio double) — the episode view behind incident retros and crawl-storm
    forensics (q_cusum_changepoint finds ONE level shift;
    q_burstiness_fano scores dispersion; this row returns the actual
    episodes with start/end/peak/mass).  The threshold is the exact
    type-1 median off the per-type distinct-volume grid (ceil-rank
    conditional min — the QTE recipe); burst days are exact integer
    comparisons; episodes form relationally as gaps-and-islands
    WITHOUT windows (run starts by an anti-join on day-1 adjacency,
    membership by max-start-at-or-before via a grid triangular join).
    Everything after the one corpus aggregate is day-grid work; every
    output is an exact BIGINT."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("2000-01-01").cast("date")).alias("di")))
    daily = (ev.groupBy("event_type", "di")
               .agg(F.count("*").cast("long").alias("x")))
    dd = daily.groupBy("event_type").agg(F.count("*").cast("long")
                                          .alias("nd"))
    dv = (daily.groupBy("event_type", F.col("x").alias("v"))
               .agg(F.count("*").cast("long").alias("c")))
    dvb = dv.select(F.col("event_type").alias("et2"),
                    F.col("v").alias("v2"), F.col("c").alias("c2"))
    cum = (dv.join(F.broadcast(dvb),
                   (F.col("et2") == F.col("event_type"))
                   & (F.col("v2") <= F.col("v")))
             .groupBy("event_type", "v")
             .agg(F.sum("c2").cast("long").alias("cle")))
    med = (cum.join(dd.withColumnRenamed("event_type", "et3"),
                    F.col("et3") == F.col("event_type"))
              .where(2 * F.col("cle") >= F.col("nd"))
              .groupBy("event_type")
              .agg(F.min("v").alias("m")))
    burst = (daily.join(med.withColumnRenamed("event_type", "et4"),
                        F.col("et4") == F.col("event_type"))
                  .where(5 * F.col("x") > 6 * F.col("m"))
                  .select("event_type", "di", "x", "m"))
    bprev = burst.select(F.col("event_type").alias("et5"),
                         F.col("di").alias("di5"))
    starts = (burst.join(F.broadcast(bprev),
                         (F.col("et5") == F.col("event_type"))
                         & (F.col("di5") == F.col("di") - 1), "left_anti")
                   .select(F.col("event_type").alias("et6"),
                           F.col("di").alias("sdi")))
    assign = (burst.join(F.broadcast(starts),
                         (F.col("et6") == F.col("event_type"))
                         & (F.col("sdi") <= F.col("di")))
                   .groupBy("event_type", "di", "x", "m")
                   .agg(F.max("sdi").alias("ep_start")))
    return (assign.groupBy("event_type", F.col("ep_start").alias("start_di"))
                  .agg(F.max("di").cast("long").alias("end_di"),
                       F.count("*").cast("long").alias("n_days"),
                       F.max("x").cast("long").alias("peak"),
                       F.sum("x").cast("long").alias("total_events"),
                       F.max("m").cast("long").alias("median_daily")))


# =====================================================================
# streaming guardrail: running sample-ratio-mismatch
# =====================================================================

@query(
    "q_stream_srm",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(('0x' || substring(md5('mh:' || CAST(event_id AS VARCHAR)),
                                     1, 8))::BIGINT % 2 AS BIGINT) AS arm
      FROM events WHERE event_type IS NOT NULL AND event_id IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
      FROM ev GROUP BY event_type
    )
    SELECT event_type, n0, n1,
           CASE WHEN n0 + n1 > 0
                THEN ROUND(CAST((n1 - n0) * (n1 - n0) AS DOUBLE)
                           / CAST(n0 + n1 AS DOUBLE), 6)
                ELSE NULL END AS chi2_srm,
           CASE WHEN n0 + n1 > 0
                 AND CAST((n1 - n0) * (n1 - n0) AS DOUBLE)
                     / CAST(n0 + n1 AS DOUBLE)
                     > CAST(3.841458820694124 AS DOUBLE)
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             AS srm_flag
    FROM g
    """,
)
def q_stream_srm(spark, sf_dir):
    """The q_srm_check guardrail lifted onto Structured Streaming: a
    running per-event-type arm-split chi-square maintained as events
    arrive (complete-mode streaming aggregation, driven to completion
    with Trigger.AvailableNow into a memory sink so the finite testdata
    stream is deterministic and the batch oracle applies exactly) —
    the alerting form an experimentation platform actually deploys:
    SRM detected DURING the experiment, not at readout.  The md5 arm
    lane and the integer (n0, n1) cores are computed stream-side
    inside the streaming aggregation; the chi2/flag surface is the
    identical staged expression as the batch row.  At scale this is
    one streaming shuffle on the 5-key event_type space with
    partial aggregation ahead of the exchange."""
    from access_mopper_spark.streaming.resample import (events_stream,
                                                        harness_shuffle,
                                                        run_to_memory)
    stream = (events_stream(spark, sf_dir)
              .where(F.col("event_type").isNotNull()
                     & F.col("event_id").isNotNull())
              .select("event_type",
                      (F.conv(F.substring(F.md5(F.concat(
                          F.lit("mh:"), F.col("event_id").cast("string"))),
                          1, 8), 16, 10).cast("long") % 2).alias("arm")))
    agg = stream.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long")
         .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long")
         .alias("n1"))
    with harness_shuffle(spark):
        run_to_memory(agg, "q_stream_srm_sink", mode="complete")
    g = spark.table("q_stream_srm_sink")
    chi = F.expr("CAST((n1 - n0) * (n1 - n0) AS DOUBLE) "
                 "/ CAST(n0 + n1 AS DOUBLE)")
    return g.select(
        "event_type", "n0", "n1",
        F.when(F.expr("n0 + n1 > 0"), pround(chi, 6))
         .otherwise(F.lit(None).cast("double")).alias("chi2_srm"),
        F.when(F.expr("n0 + n1 > 0")
               & (chi > F.expr("CAST(3.841458820694124 AS DOUBLE)")),
               F.lit(1).cast("long"))
         .otherwise(F.lit(0).cast("long")).alias("srm_flag"))


# =====================================================================
# robust distribution summaries: median CI and quartile skewness
# =====================================================================

@query(
    "q_median_ci",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    grid AS (
      SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ev GROUP BY event_type, y
    ),
    cum AS (
      SELECT event_type, y,
             CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY y
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cd
      FROM grid
    ),
    na AS (
      SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
      FROM grid GROUP BY event_type
    ),
    rk AS (
      SELECT event_type, n,
             CAST((5000 * n + 9999) // 10000 AS BIGINT) AS k_med,
             GREATEST(CAST(1 AS BIGINT),
                      CAST(FLOOR(CAST(n AS DOUBLE) / 2
                                 - CAST(1.96 AS DOUBLE)
                                   * SQRT(CAST(n AS DOUBLE)) / 2)
                           AS BIGINT)) AS l_rank
      FROM na
    ),
    rk2 AS (
      SELECT event_type, n, k_med, l_rank,
             n - l_rank + 1 AS u_rank
      FROM rk
    ),
    vals AS (
      SELECT rk2.event_type, rk2.n, rk2.l_rank, rk2.u_rank,
             MIN(CASE WHEN cum.cd >= rk2.k_med THEN cum.y END) AS med,
             MIN(CASE WHEN cum.cd >= rk2.l_rank THEN cum.y END) AS lo,
             MIN(CASE WHEN cum.cd >= rk2.u_rank THEN cum.y END) AS hi
      FROM rk2 JOIN cum ON cum.event_type = rk2.event_type
      GROUP BY rk2.event_type, rk2.n, rk2.l_rank, rk2.u_rank
    )
    SELECT event_type, n, l_rank, u_rank,
           CAST(med AS BIGINT) AS median_cents,
           CAST(lo AS BIGINT) AS ci_lo_cents,
           CAST(hi AS BIGINT) AS ci_hi_cents
    FROM vals
    """,
)
def q_median_ci(spark, sf_dir):
    """Distribution-free 95% confidence interval for the per-type
    median (order-statistic CI: ranks n/2 -+ 1.96*sqrt(n)/2, the
    binomial-normal approximation every nonparametric text ships) —
    the uncertainty q_percentile's point estimate lacks, with no
    bootstrap resampling (q_bootstrap_ci) needed for the median case.
    All three order statistics are exact type-1 quantile probes off
    the per-type distinct-cents grid (ceil-rank conditional min, the
    QTE recipe; the rank cumulative is a window PARTITIONED by type
    over grid rows); the only double is ONE sqrt in the rank formula,
    floored per type (per-distinct quantization) and clamped to [1, n]
    by the symmetric u = n - l + 1.  Every output is an exact BIGINT.
    One corpus aggregate; grid work after."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y")))
    grid = ev.groupBy("event_type", "y").agg(
        F.count("*").cast("long").alias("cnt"))
    wcum = (W.partitionBy("event_type").orderBy("y")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = grid.withColumn("cd", F.sum("cnt").over(wcum).cast("long"))
    na = grid.groupBy("event_type").agg(F.sum("cnt").cast("long")
                                         .alias("n"))
    rk = na.select(
        "event_type", "n",
        F.expr("CAST((5000 * n + 9999) DIV 10000 AS BIGINT)")
         .alias("k_med"),
        F.expr("GREATEST(CAST(1 AS BIGINT), "
               "CAST(FLOOR(CAST(n AS DOUBLE) / 2 "
               "- CAST(1.96 AS DOUBLE) * SQRT(CAST(n AS DOUBLE)) / 2) "
               "AS BIGINT))").alias("l_rank"))
    rk2 = rk.withColumn("u_rank", F.expr("n - l_rank + 1"))
    cumb = cum.select(F.col("event_type").alias("et2"), "y", "cd")
    vals = (rk2.join(cumb, F.col("et2") == F.col("event_type"))
               .groupBy("event_type", "n", "l_rank", "u_rank")
               .agg(F.min(F.when(F.col("cd") >= F.col("k_med"),
                                 F.col("y"))).alias("med"),
                    F.min(F.when(F.col("cd") >= F.col("l_rank"),
                                 F.col("y"))).alias("lo"),
                    F.min(F.when(F.col("cd") >= F.col("u_rank"),
                                 F.col("y"))).alias("hi")))
    return vals.select("event_type", "n", "l_rank", "u_rank",
                       F.col("med").cast("long").alias("median_cents"),
                       F.col("lo").cast("long").alias("ci_lo_cents"),
                       F.col("hi").cast("long").alias("ci_hi_cents"))


@query(
    "q_bowley_skewness",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    grid AS (
      SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ev GROUP BY event_type, y
    ),
    cum AS (
      SELECT event_type, y,
             CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY y
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cd
      FROM grid
    ),
    na AS (
      SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
      FROM grid GROUP BY event_type
    ),
    qs AS (SELECT UNNEST([2500, 5000, 7500]) AS q_bp),
    kq AS (
      SELECT na.event_type, na.n, qs.q_bp,
             CAST((qs.q_bp * na.n + 9999) // 10000 AS BIGINT) AS k
      FROM na CROSS JOIN qs
    ),
    vq AS (
      SELECT kq.event_type, kq.n, kq.q_bp,
             MIN(CASE WHEN cum.cd >= kq.k THEN cum.y END) AS v
      FROM kq JOIN cum ON cum.event_type = kq.event_type
      GROUP BY kq.event_type, kq.n, kq.q_bp
    ),
    piv AS (
      SELECT event_type, MAX(n) AS n,
             MAX(CASE WHEN q_bp = 2500 THEN v END) AS q1,
             MAX(CASE WHEN q_bp = 5000 THEN v END) AS q2,
             MAX(CASE WHEN q_bp = 7500 THEN v END) AS q3
      FROM vq GROUP BY event_type
    )
    SELECT event_type, n, CAST(q1 AS BIGINT) AS q1_cents,
           CAST(q2 AS BIGINT) AS q2_cents, CAST(q3 AS BIGINT) AS q3_cents,
           CASE WHEN q3 > q1
                THEN ROUND(CAST(q3 + q1 - 2 * q2 AS DOUBLE)
                           / CAST(q3 - q1 AS DOUBLE), 6)
                ELSE NULL END AS bowley_skew
    FROM piv
    """,
)
def q_bowley_skewness(spark, sf_dir):
    """Bowley (quartile) skewness per event type — the outlier-immune
    asymmetry scalar ((Q3+Q1-2*Q2)/(Q3-Q1), bounded in [-1,1]) that
    q_skew_metrics' third-moment coefficient is not (one fat tail event
    saturates a moment skew; quartiles don't move), the robust twin the
    pair of them makes a distribution-health panel.  Quartiles are
    exact type-1 probes off the per-type distinct-cents grid (ceil-rank
    conditional min, partitioned grid window); the scalar is ONE
    division of exact integer differences through R6 with a
    zero-IQR NULL guard.  One corpus aggregate; grid work after."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y")))
    grid = ev.groupBy("event_type", "y").agg(
        F.count("*").cast("long").alias("cnt"))
    wcum = (W.partitionBy("event_type").orderBy("y")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = grid.withColumn("cd", F.sum("cnt").over(wcum).cast("long"))
    na = grid.groupBy("event_type").agg(F.sum("cnt").cast("long")
                                         .alias("n"))
    qs = (spark.range(1, 4)
          .select((F.col("id") * 2500).cast("long").alias("q_bp")))
    kq = (na.crossJoin(F.broadcast(qs))
            .select("event_type", "n", "q_bp",
                    F.expr("CAST((q_bp * n + 9999) DIV 10000 AS BIGINT)")
                     .alias("k")))
    cumb = cum.select(F.col("event_type").alias("et2"), "y", "cd")
    vq = (kq.join(cumb, F.col("et2") == F.col("event_type"))
            .groupBy("event_type", "n", "q_bp")
            .agg(F.min(F.when(F.col("cd") >= F.col("k"), F.col("y")))
                  .alias("v")))
    piv = (vq.groupBy("event_type")
             .agg(F.max("n").alias("n"),
                  F.max(F.when(F.col("q_bp") == 2500, F.col("v")))
                   .alias("q1"),
                  F.max(F.when(F.col("q_bp") == 5000, F.col("v")))
                   .alias("q2"),
                  F.max(F.when(F.col("q_bp") == 7500, F.col("v")))
                   .alias("q3")))
    return piv.select(
        "event_type", "n",
        F.col("q1").cast("long").alias("q1_cents"),
        F.col("q2").cast("long").alias("q2_cents"),
        F.col("q3").cast("long").alias("q3_cents"),
        F.when(F.col("q3") > F.col("q1"),
               pround(F.expr("CAST(q3 + q1 - 2 * q2 AS DOUBLE) "
                             "/ CAST(q3 - q1 AS DOUBLE)"), 6))
         .otherwise(F.lit(None).cast("double")).alias("bowley_skew"))


# =====================================================================
# distribution distances between event-type value distributions
# =====================================================================

@query(
    "q_wasserstein_1d",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    grid AS (
      SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ev GROUP BY event_type, y
    ),
    na AS (
      SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
      FROM grid GROUP BY event_type
    ),
    tp AS (
      SELECT a.event_type AS et_a, b.event_type AS et_b,
             a.n AS n_a, b.n AS n_b
      FROM na a JOIN na b ON a.event_type < b.event_type
    ),
    ug AS (
      SELECT tp.et_a, tp.et_b, tp.n_a, tp.n_b, g.y,
             CAST(SUM(CASE WHEN g.event_type = tp.et_a
                           THEN g.cnt ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN g.event_type = tp.et_b
                           THEN g.cnt ELSE 0 END) AS BIGINT) AS cb
      FROM tp JOIN grid g
        ON g.event_type = tp.et_a OR g.event_type = tp.et_b
      GROUP BY tp.et_a, tp.et_b, tp.n_a, tp.n_b, g.y
    ),
    cdf AS (
      SELECT et_a, et_b, n_a, n_b, y,
             CAST(SUM(ca) OVER (PARTITION BY et_a, et_b ORDER BY y
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS fa,
             CAST(SUM(cb) OVER (PARTITION BY et_a, et_b ORDER BY y
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS fb,
             LEAD(y) OVER (PARTITION BY et_a, et_b ORDER BY y) AS y_next
      FROM ug
    ),
    terms AS (
      SELECT et_a, et_b, n_a, n_b,
             CAST(SUM(ABS(fa * n_b - fb * n_a) * (y_next - y)) AS BIGINT)
               AS mass
      FROM cdf WHERE y_next IS NOT NULL
      GROUP BY et_a, et_b, n_a, n_b
    )
    SELECT et_a, et_b, n_a, n_b, mass,
           ROUND(CAST(mass AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
             AS w1_cents
    FROM terms
    """,
)
def q_wasserstein_1d(spark, sf_dir):
    """1-D Wasserstein (earth-mover) distance between every pair of
    event-type value distributions — the drift metric that sees HOW FAR
    mass moved, not just that it moved (KS saturates at the largest CDF
    gap; JSD at disjoint support; W1 in cents is the actionable
    'average shift' number a distribution-shift monitor reports).
    Closed 1-D form W1 = integral |F_a - F_b|: CDFs cross-multiplied to
    the common n_a*n_b denominator so every per-gap term
    |F_a*n_b - F_b*n_a| * gap is an exact BIGINT (bound n_a*n_b*gap <
    2^63 holds past 1e7 rows/type at the cents domain, documented),
    summed exactly, ONE terminal division through R6.  The pair CDFs
    ride partitioned windows over the union value grid (grid-sized
    payload); one corpus aggregate ahead of everything."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y")))
    grid = ev.groupBy("event_type", "y").agg(
        F.count("*").cast("long").alias("cnt"))
    na = grid.groupBy("event_type").agg(F.sum("cnt").cast("long")
                                         .alias("n"))
    nb = na.select(F.col("event_type").alias("et_b"),
                   F.col("n").alias("n_b"))
    tp = (na.select(F.col("event_type").alias("et_a"),
                    F.col("n").alias("n_a"))
            .join(F.broadcast(nb), F.col("et_a") < F.col("et_b")))
    g = grid.select(F.col("event_type").alias("et_g"), "y", "cnt")
    ug = (tp.join(F.broadcast(g), (F.col("et_g") == F.col("et_a"))
                  | (F.col("et_g") == F.col("et_b")))
            .groupBy("et_a", "et_b", "n_a", "n_b", "y")
            .agg(F.sum(F.when(F.col("et_g") == F.col("et_a"),
                              F.col("cnt")).otherwise(0)).cast("long")
                  .alias("ca"),
                 F.sum(F.when(F.col("et_g") == F.col("et_b"),
                              F.col("cnt")).otherwise(0)).cast("long")
                  .alias("cb")))
    wp = (W.partitionBy("et_a", "et_b").orderBy("y")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    wl = W.partitionBy("et_a", "et_b").orderBy("y")
    cdf = (ug.withColumn("fa", F.sum("ca").over(wp).cast("long"))
             .withColumn("fb", F.sum("cb").over(wp).cast("long"))
             .withColumn("y_next", F.lead("y").over(wl)))
    terms = (cdf.where(F.col("y_next").isNotNull())
                .groupBy("et_a", "et_b", "n_a", "n_b")
                .agg(F.sum(F.abs(F.col("fa") * F.col("n_b")
                                 - F.col("fb") * F.col("n_a"))
                           * (F.col("y_next") - F.col("y")))
                      .cast("long").alias("mass")))
    return terms.select(
        "et_a", "et_b", "n_a", "n_b", "mass",
        pround(F.expr("CAST(mass AS DOUBLE) "
                      "/ (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"), 6)
          .alias("w1_cents"))


@query(
    "q_distribution_overlap",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    grid AS (
      SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ev GROUP BY event_type, y
    ),
    na AS (
      SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
      FROM grid GROUP BY event_type
    ),
    tp AS (
      SELECT a.event_type AS et_a, b.event_type AS et_b,
             a.n AS n_a, b.n AS n_b
      FROM na a JOIN na b ON a.event_type < b.event_type
    ),
    ug AS (
      SELECT tp.et_a, tp.et_b, tp.n_a, tp.n_b, g.y,
             CAST(SUM(CASE WHEN g.event_type = tp.et_a
                           THEN g.cnt ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN g.event_type = tp.et_b
                           THEN g.cnt ELSE 0 END) AS BIGINT) AS cb
      FROM tp JOIN grid g
        ON g.event_type = tp.et_a OR g.event_type = tp.et_b
      GROUP BY tp.et_a, tp.et_b, tp.n_a, tp.n_b, g.y
    ),
    s AS (
      SELECT et_a, et_b, n_a, n_b,
             CAST(SUM(LEAST(ca * n_b, cb * n_a)) AS BIGINT) AS ov
      FROM ug GROUP BY et_a, et_b, n_a, n_b
    )
    SELECT et_a, et_b, n_a, n_b,
           CAST(ov * 10000 // (n_a * n_b) AS BIGINT) AS overlap_bp,
           CAST(10000 - ov * 10000 // (n_a * n_b) AS BIGINT) AS tv_bp
    FROM s
    """,
)
def q_distribution_overlap(spark, sf_dir):
    """Histogram overlap coefficient and total-variation distance
    between every pair of event-type value distributions — the bounded
    [0,1] companions to q_wasserstein_1d (overlap = sum min(p,q) is
    the probability mass the two types share; TV = 1 - overlap is the
    best-achievable classifier advantage — the interpretable pair a
    drift dashboard shows next to W1's magnitude).  Fully integer:
    per-value min(c_a*n_b, c_b*n_a) over the union grid under the
    common n_a*n_b denominator (LEAST of exact BIGINTs), overlap in
    basis points via integer `//`-vs-DIV, TV as its exact complement.
    One corpus aggregate; pair work is grid-sized with a broadcast
    type-pair fan-out."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & F.col("event_type").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                   .alias("y")))
    grid = ev.groupBy("event_type", "y").agg(
        F.count("*").cast("long").alias("cnt"))
    na = grid.groupBy("event_type").agg(F.sum("cnt").cast("long")
                                         .alias("n"))
    nb = na.select(F.col("event_type").alias("et_b"),
                   F.col("n").alias("n_b"))
    tp = (na.select(F.col("event_type").alias("et_a"),
                    F.col("n").alias("n_a"))
            .join(F.broadcast(nb), F.col("et_a") < F.col("et_b")))
    g = grid.select(F.col("event_type").alias("et_g"), "y", "cnt")
    ug = (tp.join(F.broadcast(g), (F.col("et_g") == F.col("et_a"))
                  | (F.col("et_g") == F.col("et_b")))
            .groupBy("et_a", "et_b", "n_a", "n_b", "y")
            .agg(F.sum(F.when(F.col("et_g") == F.col("et_a"),
                              F.col("cnt")).otherwise(0)).cast("long")
                  .alias("ca"),
                 F.sum(F.when(F.col("et_g") == F.col("et_b"),
                              F.col("cnt")).otherwise(0)).cast("long")
                  .alias("cb")))
    s = (ug.groupBy("et_a", "et_b", "n_a", "n_b")
           .agg(F.sum(F.least(F.col("ca") * F.col("n_b"),
                              F.col("cb") * F.col("n_a"))).cast("long")
                 .alias("ov")))
    return s.select(
        "et_a", "et_b", "n_a", "n_b",
        F.expr("ov * 10000 DIV (n_a * n_b)").alias("overlap_bp"),
        F.expr("10000 - ov * 10000 DIV (n_a * n_b)").alias("tv_bp"))


# =====================================================================
# marketing attribution: exact 3-channel Shapley values
# =====================================================================

_SHAP_V = ("CASE WHEN n{k} > 0 THEN CAST(c{k} AS DOUBLE) / n{k} "
           "ELSE CAST(0 AS DOUBLE) END")


@query(
    "q_shapley_attribution",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS tc,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS tv,
             MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS tsg,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY user_id
    ),
    co AS (
      SELECT tc * 4 + tv * 2 + tsg AS k,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS c
      FROM u GROUP BY tc * 4 + tv * 2 + tsg
    ),
    piv AS (
      SELECT
        CAST(COALESCE(MAX(CASE WHEN k = 0 THEN n END), 0) AS BIGINT) AS n0,
        CAST(COALESCE(MAX(CASE WHEN k = 1 THEN n END), 0) AS BIGINT) AS n1,
        CAST(COALESCE(MAX(CASE WHEN k = 2 THEN n END), 0) AS BIGINT) AS n2,
        CAST(COALESCE(MAX(CASE WHEN k = 3 THEN n END), 0) AS BIGINT) AS n3,
        CAST(COALESCE(MAX(CASE WHEN k = 4 THEN n END), 0) AS BIGINT) AS n4,
        CAST(COALESCE(MAX(CASE WHEN k = 5 THEN n END), 0) AS BIGINT) AS n5,
        CAST(COALESCE(MAX(CASE WHEN k = 6 THEN n END), 0) AS BIGINT) AS n6,
        CAST(COALESCE(MAX(CASE WHEN k = 7 THEN n END), 0) AS BIGINT) AS n7,
        CAST(COALESCE(MAX(CASE WHEN k = 0 THEN c END), 0) AS BIGINT) AS c0,
        CAST(COALESCE(MAX(CASE WHEN k = 1 THEN c END), 0) AS BIGINT) AS c1,
        CAST(COALESCE(MAX(CASE WHEN k = 2 THEN c END), 0) AS BIGINT) AS c2,
        CAST(COALESCE(MAX(CASE WHEN k = 3 THEN c END), 0) AS BIGINT) AS c3,
        CAST(COALESCE(MAX(CASE WHEN k = 4 THEN c END), 0) AS BIGINT) AS c4,
        CAST(COALESCE(MAX(CASE WHEN k = 5 THEN c END), 0) AS BIGINT) AS c5,
        CAST(COALESCE(MAX(CASE WHEN k = 6 THEN c END), 0) AS BIGINT) AS c6,
        CAST(COALESCE(MAX(CASE WHEN k = 7 THEN c END), 0) AS BIGINT) AS c7
      FROM co
    ),
    v AS (
      SELECT n0, n1, n2, n3, n4, n5, n6, n7,
             {v0} AS v0, {v1} AS v1, {v2} AS v2, {v3} AS v3,
             {v4} AS v4, {v5} AS v5, {v6} AS v6, {v7} AS v7
      FROM piv
    )
    SELECT 'click' AS channel,
           CAST(n4 + n5 + n6 + n7 AS BIGINT) AS n_touched,
           ROUND((v4 - v0) / 3 + (v6 - v2) / 6 + (v5 - v1) / 6
                 + (v7 - v3) / 3, 6) AS phi_shapley
    FROM v
    UNION ALL
    SELECT 'view' AS channel,
           CAST(n2 + n3 + n6 + n7 AS BIGINT) AS n_touched,
           ROUND((v2 - v0) / 3 + (v6 - v4) / 6 + (v3 - v1) / 6
                 + (v7 - v5) / 3, 6) AS phi_shapley
    FROM v
    UNION ALL
    SELECT 'signup' AS channel,
           CAST(n1 + n3 + n5 + n7 AS BIGINT) AS n_touched,
           ROUND((v1 - v0) / 3 + (v5 - v4) / 6 + (v3 - v2) / 6
                 + (v7 - v6) / 3, 6) AS phi_shapley
    FROM v
    """.format(**{f"v{k}": _SHAP_V.format(k=k) for k in range(8)}),
)
def q_shapley_attribution(spark, sf_dir):
    """Data-driven Shapley attribution of purchase conversion across
    the three touch channels (click / view / signup): the
    coalition-game split of credit that first/last-touch attribution
    (q_first_touch_attribution, q_last_touch) cannot justify — each
    channel gets its average marginal lift over every coalition it can
    join, with the exact 3-player weights 1/3, 1/6, 1/6, 1/3.  The
    game value v(S) is the observed conversion rate of users whose
    touch set is EXACTLY S (8 coalitions from one user-level
    aggregate; unobserved coalitions take v = 0, the standard
    practical convention, documented).  Each v is one staged division
    of exact BIGINTs, each phi a fixed 4-term chain of identically-
    staged doubles through R6.  One corpus aggregate to user level,
    one 8-row pivot; no joins, no windows."""
    u = (load_table(spark, sf_dir, "events")
         .where(F.col("user_id").isNotNull()
                & F.col("event_type").isNotNull())
         .groupBy("user_id")
         .agg(F.max(F.when(F.col("event_type") == "click", 1)
                     .otherwise(0)).alias("tc"),
              F.max(F.when(F.col("event_type") == "view", 1)
                     .otherwise(0)).alias("tv"),
              F.max(F.when(F.col("event_type") == "signup", 1)
                     .otherwise(0)).alias("tsg"),
              F.max(F.when(F.col("event_type") == "purchase", 1)
                     .otherwise(0)).alias("conv")))
    co = (u.groupBy((F.col("tc") * 4 + F.col("tv") * 2
                     + F.col("tsg")).alias("k"))
           .agg(F.count("*").cast("long").alias("n"),
                F.sum("conv").cast("long").alias("c")))
    piv = co.agg(*(
        [F.coalesce(F.max(F.when(F.col("k") == k, F.col("n"))), F.lit(0))
          .cast("long").alias(f"n{k}") for k in range(8)]
        + [F.coalesce(F.max(F.when(F.col("k") == k, F.col("c"))), F.lit(0))
            .cast("long").alias(f"c{k}") for k in range(8)]))
    v = piv.select(
        *[F.col(f"n{k}") for k in range(8)],
        *[F.expr(_SHAP_V.format(k=k)).alias(f"v{k}") for k in range(8)])
    click = v.select(
        F.lit("click").alias("channel"),
        F.expr("CAST(n4 + n5 + n6 + n7 AS BIGINT)").alias("n_touched"),
        pround(F.expr("(v4 - v0) / 3 + (v6 - v2) / 6 + (v5 - v1) / 6 "
                      "+ (v7 - v3) / 3"), 6).alias("phi_shapley"))
    view = v.select(
        F.lit("view").alias("channel"),
        F.expr("CAST(n2 + n3 + n6 + n7 AS BIGINT)").alias("n_touched"),
        pround(F.expr("(v2 - v0) / 3 + (v6 - v4) / 6 + (v3 - v1) / 6 "
                      "+ (v7 - v5) / 3"), 6).alias("phi_shapley"))
    signup = v.select(
        F.lit("signup").alias("channel"),
        F.expr("CAST(n1 + n3 + n5 + n7 AS BIGINT)").alias("n_touched"),
        pround(F.expr("(v1 - v0) / 3 + (v5 - v4) / 6 + (v3 - v2) / 6 "
                      "+ (v7 - v6) / 3"), 6).alias("phi_shapley"))
    return click.unionAll(view).unionAll(signup)
