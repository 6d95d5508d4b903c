"""§2.9 interpolation, as-of/range joins, physics, domain composites, planner.

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403


# =====================================================================
# §2.9 interpolation + §2.3 as-of/range joins + §2.8 physics
# =====================================================================

_INTERP_ORACLE = """
    WITH pts AS (
      SELECT l_orderkey AS k, CAST(l_linenumber AS DOUBLE) AS x, AVG(l_quantity) AS y
      FROM lineitem GROUP BY 1, 2
    ),
    tgt(plev) AS (VALUES (1.5), (2.5), (3.5)),
    br AS (
      SELECT k, plev,
             MAX(x) FILTER (x <= plev) AS lox,
             ARG_MAX(y, x) FILTER (x <= plev) AS loy,
             MIN(x) FILTER (x > plev) AS hix,
             ARG_MIN(y, x) FILTER (x > plev) AS hiy
      FROM pts CROSS JOIN tgt GROUP BY k, plev
    )
    SELECT k, plev,
           ROUND(CASE WHEN lox IS NULL THEN hiy
                      WHEN hix IS NULL THEN loy
                      ELSE loy + (hiy - loy) * ((plev - lox) / (hix - lox)) END, 6) AS value
    FROM br
"""


@query("q_plevinterp_pandas", oracle=_INTERP_ORACLE)
def q_plevinterp_pandas(spark, sf_dir):
    """Model-level→pressure-level interpolation, the reference's flagship
    numeric kernel (plevinterp, calculations.py:855-923): literal np.interp
    per column group via Arrow-batched applyInPandas. Group key is the
    column dims — even distribution, no skew; Python cost amortized over
    Arrow batches. Samples averaged per (group, x) first so x is strictly
    increasing (np.interp contract)."""
    from access_mopper_spark.operators.interp import plevinterp_pandas
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.groupBy(F.col("l_orderkey").alias("k"),
                     F.col("l_linenumber").cast("double").alias("x")) \
            .agg(F.avg("l_quantity").alias("y"))
    out = plevinterp_pandas(pts, ["k"], "x", "y", [1.5, 2.5, 3.5])
    return out.select("k", "plev", R6(F.col("value")).alias("value"))


@query("q_interp_sql", oracle=_INTERP_ORACLE)
def q_interp_sql(spark, sf_dir):
    """Same interpolation, zero-Python formulation: broadcast targets ×
    conditional-aggregate bracketing × linear blend (interp_at_targets).
    Validates the UDF kernel against a pure Catalyst plan — and is the
    preferred path when the target list is small (CMIP: 19 plevs)."""
    from access_mopper_spark.operators.interp import interp_at_targets
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.groupBy(F.col("l_orderkey").alias("k"),
                     F.col("l_linenumber").cast("double").alias("x")) \
            .agg(F.avg("l_quantity").alias("y"))
    out = interp_at_targets(pts, ["k"], "x", "y", [1.5, 2.5, 3.5])
    return out.select("k", "plev", R6(F.col("value")).alias("value"))


@query(
    "q_asof_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             TIMESTAMP '1995-01-01' + INTERVAL (CAST(FLOOR(value * 2400) AS INT)) DAY AS cutoff
      FROM events
    ),
    best AS (
      SELECT e.event_id, e.cutoff,
             MAX(o.o_orderdate) AS last_order_date
      FROM ev e LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.cutoff
      GROUP BY e.event_id, e.cutoff
    ),
    pick AS (
      SELECT b.event_id, b.last_order_date,
             MAX(o.o_orderkey) AS last_orderkey
      FROM best b LEFT JOIN ev e ON e.event_id = b.event_id
      LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate = b.last_order_date
      GROUP BY b.event_id, b.last_order_date
    )
    SELECT event_id, last_order_date, last_orderkey FROM pick
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join (reference: nearest-frequency ladder pick
    mop_setup.py:108-153 / reindex nearest calculations.py:901): for each
    event (with a deterministic synthetic cutoff date), the latest order
    of that customer at or before the cutoff. Union+window formulation —
    one shuffle on the key, one sort, no range self-join."""
    from access_mopper_spark.operators.asof import asof_join
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.expr("TIMESTAMP '1995-01-01' + make_dt_interval(CAST(FLOOR(value * 2400) AS INT))").alias("cutoff"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey")
    out = asof_join(ev, orders, on=["user_id"], left_ts="cutoff", right_ts="o_orderdate",
                    right_values=["o_orderkey"], direction="backward",
                    tiebreak=["o_orderkey"])
    return out.select("event_id",
                      F.col("o_orderdate_right").alias("last_order_date"),
                      F.col("o_orderkey").alias("last_orderkey"))


@query(
    "q_range_join",
    oracle="""
    SELECT a.o_orderkey, COUNT(b.o_orderkey) AS n_nearby
    FROM orders a LEFT JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND b.o_orderkey <> a.o_orderkey
     AND b.o_orderdate BETWEEN a.o_orderdate - INTERVAL 30 DAY
                           AND a.o_orderdate + INTERVAL 30 DAY
    GROUP BY a.o_orderkey
    """,
)
def q_range_join(spark, sf_dir):
    """Interval-overlap range join (mop_utils.py:320 predicate): orders of
    the same customer within ±30 days. Equi-join on the key carries the
    shuffle; the range predicate filters post-join — never a cartesian."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    b = orders.select(F.col("o_custkey").alias("b_custkey"),
                      F.col("o_orderkey").alias("b_orderkey"),
                      F.col("o_orderdate").alias("b_orderdate"))
    joined = a.join(
        b,
        (a.o_custkey == b.b_custkey) & (F.col("b_orderkey") != a.o_orderkey)
        & F.col("b_orderdate").between(
            F.col("o_orderdate") - F.expr("INTERVAL 30 DAY"),
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        "left",
    )
    return joined.groupBy("o_orderkey").agg(F.count("b_orderkey").alias("n_nearby"))


@query(
    "q_upsample_interp",
    oracle="""
    WITH obs AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu, value
      FROM events
    ),
    span AS (
      SELECT user_id,
             CAST(CEIL(MIN(tu) / 3600000000.0) AS BIGINT) * 3600000000 AS t0,
             MAX(tu) AS t1
      FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT s.user_id, s.t0 + g.i * 3600000000 AS tu
      FROM span s, (SELECT UNNEST(range(0, (SELECT CAST(FLOOR(COALESCE(MAX(t1 - t0), 0) / 3600000000.0) AS BIGINT) + 1 FROM span))) AS i) g
      WHERE s.t0 + g.i * 3600000000 <= s.t1
    ),
    br AS (
      SELECT g.user_id, g.tu,
             MAX(o.tu) FILTER (o.tu <= g.tu) AS lox,
             ARG_MAX(o.value, o.tu) FILTER (o.tu <= g.tu) AS loy,
             MIN(o.tu) FILTER (o.tu > g.tu) AS hix,
             ARG_MIN(o.value, o.tu) FILTER (o.tu > g.tu) AS hiy
      FROM grid g JOIN obs o ON o.user_id = g.user_id
      GROUP BY g.user_id, g.tu
    )
    SELECT user_id, make_timestamp(tu) AS ts,
           ROUND(CASE WHEN lox IS NULL THEN hiy
                      WHEN hix IS NULL THEN loy
                      WHEN hix = lox THEN loy
                      ELSE loy + (hiy - loy) * (CAST(tu - lox AS DOUBLE) / (hix - lox)) END,
                 6) AS value
    FROM br
    """,
)
def q_upsample_interp(spark, sf_dir):
    """Upsample + linear interpolation onto an hour-aligned grid
    (reference .resample(...).interpolate('linear'),
    calculations.py:127-132). Grid generated per group with sequence (no
    driver loop); bracketing via one ordered window pass per direction."""
    from access_mopper_spark.operators.resample import time_interpolate
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = time_interpolate(ev, "ts", "value", "1 hour", group_cols=["user_id"], align=True)
    return out.select("user_id", "ts", R6(F.col("value")).alias("value"))


@query(
    "q_physics_eos",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      ROUND((
        9.9984085444849347e2
        + t * (7.3471625860981584 + t * (-5.3211231792841769e-2 + t * 3.6492439109814549e-4))
        + s * (2.5880571023991390 - t * 6.7168282786692355e-3 + s * 1.9203202055760151e-3)
        + p * (1.1798263740430364e-2 + t * t * 9.8920219266399117e-8 + s * 4.6996642771754730e-6
               - p * (2.5862187075154352e-8 + t * t * 3.2921414007960662e-12))
      ) / (
        1.0
        + t * (7.2815210113327091e-3 + t * (-4.4787265461983921e-5 + t * (3.3851002965802430e-7 + t * 1.3651202389758572e-10)))
        + s * (1.7632126669040377e-3 - t * (8.8066583251206474e-6 + t * t * 1.8832689434804897e-10)
               + sqrt(s) * (5.7463776745432097e-6 + t * t * 1.4716275472242334e-9))
        + p * (6.7103246285651894e-6 - (p * t) * (t * t * 2.4461698007024582e-17 + p * 9.1534417604289062e-18))
      ), 6) AS rho
    FROM (
      SELECT l_orderkey, l_linenumber,
             l_quantity / 2.0 AS t, l_discount * 350.0 AS s, l_extendedprice * 0.1 AS p
      FROM lineitem
    ) x
    """,
)
def q_physics_eos(spark, sf_dir):
    """25-term EOS density polynomial (rho_from_theta,
    app_functions.py:683-714) as pure Column math — whole-stage codegen,
    no UDF. Inputs derived deterministically from lineitem columns."""
    from access_mopper_spark.functions.physics import rho_from_theta
    li = load_table(spark, sf_dir, "lineitem")
    rho = rho_from_theta(F.col("l_quantity") / 2.0,
                         F.col("l_discount") * 350.0,
                         F.col("l_extendedprice") * 0.1)
    return li.select("l_orderkey", "l_linenumber", R6(rho).alias("rho"))


# =====================================================================
# §2.10 domain composites on relational analogues
# =====================================================================

@query(
    "q_ocean_floor",
    oracle="""
    WITH pts AS (
      SELECT l_orderkey, l_linenumber, MAX(l_extendedprice) AS price
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_orderkey,
           ARG_MAX(price, CASE WHEN price IS NOT NULL THEN l_linenumber END)
             AS price_floor,
           MAX(CASE WHEN price IS NOT NULL THEN l_linenumber END) AS floor_depth
    FROM pts GROUP BY l_orderkey
    """,
)
def q_ocean_floor(spark, sf_dir):
    """Deepest non-null level per column (ocean_floor,
    calculations.py:683-698) — single max_by aggregate, no window/self-join.
    NOTE: (l_orderkey, l_linenumber) has duplicate rows in the testdata;
    max_by ties on the deepest level are broken by value on both sides via
    the same max-of-value convention."""
    li = load_table(spark, sf_dir, "lineitem")
    # dedupe to one sample per level so ARG_MAX ties cannot differ between engines
    pts = li.groupBy("l_orderkey", "l_linenumber").agg(F.max("l_extendedprice").alias("price"))
    return pts.groupBy("l_orderkey").agg(
        F.max_by("price", F.when(F.col("price").isNotNull(), F.col("l_linenumber"))).alias("price_floor"),
        F.max(F.when(F.col("price").isNotNull(), F.col("l_linenumber"))).alias("floor_depth"),
    )


@query(
    "q_tile_bucket",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN l_linenumber IN (1, 2) THEN 'psl'
                WHEN l_linenumber IN (3, 4) THEN 'crp'
                WHEN l_linenumber IN (5) THEN 'urb'
                ELSE 'other' END AS tile_class,
           ROUND(SUM(l_quantity * l_discount), 6) AS value
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
)
def q_tile_bucket(spark, sf_dir):
    """Land-use tile regrouping (fracLut, calculations.py:1073-1102):
    bucket pseudo-levels into classes via when/otherwise, then weighted
    sums per class."""
    from access_mopper_spark.operators.aggregates import tile_bucket_sum
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    df = orders.join(li, orders.o_orderkey == li.l_orderkey) \
               .withColumn("__w", F.col("l_quantity") * F.col("l_discount"))
    out = tile_bucket_sum(df, "__w", "l_linenumber",
                          {"psl": [1, 2], "crp": [3, 4], "urb": [5]},
                          ["o_orderkey"], out_col="value")
    return out.select("o_orderkey", "tile_class", R6(F.col("value")).alias("value"))


@query(
    "q_box_transport",
    oracle="""
    SELECT ROUND(SUM(l_quantity * l_extendedprice * 1e-9), 6) AS transport
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size BETWEEN 10 AND 25 AND l_linenumber BETWEEN 2 AND 4
    """,
)
def q_box_transport(spark, sf_dir):
    """Transport across an (i,j) index box (transAcrossLine,
    calculations.py:193-237): box-range predicate + weighted sum — filter
    pushdown does the heavy lifting; the dim join is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(F.col("p_size").between(10, 25) & F.col("l_linenumber").between(2, 4))
        .agg(R6(F.sum(F.col("l_quantity") * F.col("l_extendedprice") * 1e-9)).alias("transport"))
    )


# =====================================================================
# §3.1 planner (frequency ladder, file splitting) + §2.4 climatology/basin
# =====================================================================

@query(
    "q_climatology",
    oracle="""
    SELECT o_orderpriority, EXTRACT(month FROM o_orderdate) AS month,
           ROUND(SUM(o_totalprice * DAY(LAST_DAY(o_orderdate)))
                 / SUM(DAY(LAST_DAY(o_orderdate))), 6) AS o_totalprice_clim
    FROM orders GROUP BY 1, 2
    """,
)
def q_climatology(spark, sf_dir):
    """Day-weighted monthly climatology across years (axm_timeshot
    monthClim, mop_utils.py:815-845): groupBy calendar month with
    days-in-month weights — one shuffle, map-side partials."""
    from access_mopper_spark.operators.aggregates import climatology
    orders = load_table(spark, sf_dir, "orders")
    out = climatology(orders, "o_orderdate", "o_totalprice",
                      group_cols=["o_orderpriority"])
    return out.select("o_orderpriority", "month",
                      R6(F.col("o_totalprice_clim")).alias("o_totalprice_clim"))


@query(
    "q_basin_agg",
    oracle="""
    SELECT r_name AS basin, EXTRACT(month FROM o_orderdate) AS month,
           ROUND(SUM(o_totalprice), 6) AS flux
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)
def q_basin_agg(spark, sf_dir):
    """Basin-scoped flux sum (hfbasin/basinMeridFlux, app_functions.py:
    383-427): the basin mask is a small dim table — broadcast-joined so
    the only shuffle is the final groupBy on (basin, month)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    basin = (customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
             .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
             .select("c_custkey", "r_name"))
    return (
        orders.join(F.broadcast(basin), orders.o_custkey == basin.c_custkey)
        .groupBy(F.col("r_name").alias("basin"),
                 F.month("o_orderdate").alias("month"))
        .agg(R6(F.sum("o_totalprice")).alias("flux"))
    )


_LADDER_SQL = "['10yr','yr','mon','10day','7day','day','12hr','6hr','3hr','1hr','30min','10min']"


@query(
    "q_freq_ladder",
    oracle=f"""
    WITH ladder AS (
      SELECT f, i - 1 AS r FROM (SELECT UNNEST({_LADDER_SQL}) AS f,
                                        generate_subscripts({_LADDER_SQL}, 1) AS i)
    ),
    req AS (
      SELECT DISTINCT p_partkey % 50 AS var_id,
             list_extract({_LADDER_SQL}, (p_size % 12) + 1) AS frequency
      FROM part
    ),
    avail AS (
      SELECT DISTINCT l_partkey % 50 AS var_id,
             list_extract({_LADDER_SQL}, (l_suppkey % 12) + 1) AS frequency
      FROM lineitem
    ),
    j AS (
      SELECT q.var_id, q.frequency, lq.r AS req_rank, la.r AS a_rank, a.frequency AS a_freq
      FROM req q
      JOIN ladder lq ON lq.f = q.frequency
      LEFT JOIN avail a ON a.var_id = q.var_id
      LEFT JOIN ladder la ON la.f = a.frequency
    )
    SELECT var_id, frequency,
           ARG_MIN(a_freq, a_rank) FILTER (a_rank >= req_rank) AS src_frequency,
           CASE WHEN MIN(a_rank) FILTER (a_rank >= req_rank) IS NULL THEN NULL
                ELSE MIN(a_rank) FILTER (a_rank >= req_rank) <> req_rank END AS needs_resample
    FROM j GROUP BY var_id, frequency, req_rank
    """,
)
def q_freq_ladder(spark, sf_dir):
    """Nearest-frequency fallback (find_nearest, mop_setup.py:108-153):
    requested (var, freq) pairs resolve to the nearest finer available
    frequency on the ordered ladder, synthesizing a needs_resample flag —
    the planner rule that injects a resample step. Ranked broadcast joins
    + one min_by shuffle."""
    from access_mopper_spark.plans.planner import FREQ_LADDER, nearest_frequency
    ladder = F.array(*[F.lit(f) for f in FREQ_LADDER])
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    req = part.select((F.col("p_partkey") % 50).alias("var_id"),
                      F.element_at(ladder, ((F.col("p_size") % 12) + 1).cast("int"))
                       .alias("frequency")).distinct()
    avail = li.select((F.col("l_partkey") % 50).alias("var_id"),
                      F.element_at(ladder, ((F.col("l_suppkey") % 12) + 1).cast("int"))
                       .alias("frequency")).distinct()
    return nearest_frequency(req, avail, ["var_id"])


@query(
    "q_file_plan",
    oracle="""
    WITH vars AS (
      SELECT p_partkey AS var_id, CAST(p_size AS DOUBLE) AS size_per_step,
             50 + p_partkey % 100 AS nsteps,
             GREATEST(1, CAST(FLOOR(100.0 / p_size) AS BIGINT)) AS spf
      FROM part WHERE p_partkey <= 200
    )
    SELECT var_id, g.i AS file_idx,
           g.i * spf AS step_start,
           LEAST(nsteps, (g.i + 1) * spf) AS step_end,
           ROUND((LEAST(nsteps, (g.i + 1) * spf) - g.i * spf) * size_per_step, 6) AS est_size
    FROM vars, (SELECT UNNEST(range(0, (SELECT COALESCE(CAST(MAX(CEIL(CAST(nsteps AS DOUBLE) / spf)) AS BIGINT), 1) FROM vars))) AS i) g
    WHERE g.i < CEIL(CAST(nsteps AS DOUBLE) / spf)
    """,
)
def q_file_plan(spark, sf_dir):
    """Size-based output-file splitting (compute_fsize/define_files,
    setup_utils.py:428-482, :591-644): steps-per-file from bytes-per-step
    vs max_size, one plan row per output file — sequence+explode, fully
    distributed (no driver loop over the catalog)."""
    from access_mopper_spark.plans.planner import plan_output_files
    part = load_table(spark, sf_dir, "part")
    vars_df = part.where(F.col("p_partkey") <= 200).select(
        F.col("p_partkey").alias("var_id"),
        F.col("p_size").cast("double").alias("size_per_step"),
        (F.lit(50) + F.col("p_partkey") % 100).alias("nsteps"))
    out = plan_output_files(vars_df, "size_per_step", "nsteps",
                            max_size=100.0, key_cols=["var_id"])
    return out.select("var_id", "file_idx", "step_start", "step_end",
                      R6(F.col("est_size")).alias("est_size"))


