"""§2.1-§2.8 scans, aggregations, joins, windows, set ops, calc-DSL.

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403


# =====================================================================
# §2.1/§2.2 scans, projections, filters, predicates
# =====================================================================

@query(
    "q_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice * (1 - l_discount), 6) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_quantity > 45
    """,
)
def q_scan_filter_project(spark, sf_dir):
    """Column pruning + predicate pushdown (reference `_preselect` +
    time-range slice, mop_utils.py:116-122,342-343). The filter and the
    2-column projection must reach the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
                 & (F.col("l_quantity") > 45))
        .select("l_orderkey", "l_linenumber",
                R6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"))
    )


@query(
    "q_mask_fillna",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(COALESCE(CASE WHEN l_discount <> 0 THEN l_extendedprice END, 0.0), 6) AS masked_price
    FROM lineitem
    """,
)
def q_mask_fillna(spark, sf_dir):
    """Mask/conditional-null + fillna (maskSeaIce calculations.py:701-717;
    fillna mop_utils.py:920) as when/otherwise + coalesce."""
    li = load_table(spark, sf_dir, "lineitem")
    masked = F.when(F.col("l_discount") != 0, F.col("l_extendedprice"))
    return li.select(
        "l_orderkey", "l_linenumber",
        R6(F.coalesce(masked, F.lit(0.0))).alias("masked_price"),
    )


# =====================================================================
# §2.4 aggregations
# =====================================================================

@query(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           ROUND(SUM(l_extendedprice), 6) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — the grouped-aggregation core (§2.4). Map-side
    partial aggregation (HashAggregate partial/final) keeps the shuffle
    small at 100 TB: only |groups| rows move."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            R6(F.sum("l_quantity")).alias("sum_qty"),
            R6(F.sum("l_extendedprice")).alias("sum_base_price"),
            R6(F.sum(disc_price)).alias("sum_disc_price"),
            R6(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            R6(F.avg("l_quantity")).alias("avg_qty"),
            R6(F.avg("l_extendedprice")).alias("avg_price"),
            R6(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_weighted_mean",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6) AS wmean_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_weighted_mean(spark, sf_dir):
    """Weighted mean — calc_global_ave_ocean semantics
    (calculations.py:801-825): sum(v*w)/sum(w) per group; weights are a
    broadcastable companion column, never a driver-side array."""
    from access_mopper_spark.operators.aggregates import weighted_mean
    li = load_table(spark, sf_dir, "lineitem")
    out = weighted_mean(li, value="l_extendedprice", weight="l_quantity",
                        group_cols=["l_returnflag"], out_col="wmean_price")
    return out.select("l_returnflag", R6(F.col("wmean_price")).alias("wmean_price"))


@query(
    "q_hemi_threshold_sum",
    oracle="""
    SELECT ROUND(SUM(value), 6) AS area_sum, COUNT(*) AS n_cells
    FROM (SELECT (CAST(user_id AS DOUBLE) - 74.5) * (90.0 / 74.5) AS lat, value FROM events) t
    WHERE lat >= 0 AND value >= 0.15 AND value <= 1.0
    """,
)
def q_hemi_threshold_sum(spark, sf_dir):
    """Hemispheric threshold-band sum — sea-ice extent semantics
    (HemiSeaIce, calculations.py:628-646): hemisphere predicate + value
    band + sum. lat derived deterministically from user_id on both sides."""
    ev = load_table(spark, sf_dir, "events")
    lat = (F.col("user_id").cast("double") - 74.5) * (90.0 / 74.5)
    return (
        ev.select(lat.alias("lat"), "value")
        .where((F.col("lat") >= 0) & (F.col("value") >= 0.15) & (F.col("value") <= 1.0))
        .agg(R6(F.sum("value")).alias("area_sum"), F.count("*").alias("n_cells"))
    )


@query(
    "q_depth_integral",
    oracle="""
    SELECT l_orderkey, ROUND(SUM(l_quantity * (1.0 + l_tax) * 2.5), 6) AS depth_integral
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_depth_integral(spark, sf_dir):
    """Depth integral Σ_z v·rho·dz (ocndepthint app_functions.py:496-528):
    per-column weighted sum collapsing the level dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(R6(F.sum(F.col("l_quantity") * (1.0 + F.col("l_tax")) * 2.5)).alias("depth_integral"))
    )


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 6) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark, sf_dir):
    """Rollup/grouping-sets (§2.4 'Spark provides natively' extension)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        R6(F.sum("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))


@query(
    "q_mode_most_common",
    oracle="""
    SELECT user_id, event_type AS top_type, n FROM (
      SELECT user_id, event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def q_mode_most_common(spark, sf_dir):
    """most_common realm/frequency (Counter(...).most_common,
    mopdb_utils.py:334-349) → count + row_number ranking."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), "n")
    )


# =====================================================================
# §2.3 joins
# =====================================================================

@query(
    "q_join_revenue_by_nation",
    oracle="""
    SELECT n_name, r_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name, r_name
    """,
)
def q_join_revenue_by_nation(spark, sf_dir):
    """Multi-way equi-join (TPC-H Q5 shape; reference catalog equi-join
    parse_vars mopdb_utils.py:629-674). Dim tables (nation/region/customer)
    are broadcast — no shuffle of the fact table on dim keys; only the
    lineitem⋈orders join shuffles, and AQE can pick broadcast there too
    when the filtered orders side is small."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01"))
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(R6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """,
)
def q_semi_join(spark, sf_dir):
    """Left-semi join (EXISTS; reference set-intersection semantics
    mop_setup.py:287-289)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi") \
                 .select("o_orderkey", "o_totalprice")


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_join(spark, sf_dir):
    """Left-anti join (check_cmor set difference, mopdb/mopdb.py:101-108)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti") \
               .select("c_custkey", "c_name")


@query(
    "q_tiered_match",
    oracle="""
    SELECT c_custkey,
           CASE WHEN EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = c_nationkey)
                  THEN 'exact'
                WHEN EXISTS (SELECT 1 FROM supplier s JOIN nation sn ON s.s_nationkey = sn.n_nationkey
                             JOIN nation cn ON cn.n_nationkey = c_nationkey
                             WHERE sn.n_regionkey = cn.n_regionkey)
                  THEN 'no_ver'
                ELSE 'no_match' END AS match_tier
    FROM customer
    """,
)
def q_tiered_match(spark, sf_dir):
    """Tiered fallback matching (exact → relaxed → no_match), the
    reference's catalog join with progressively dropped keys
    (mopdb_utils.py:648-672, tiers no_ver/no_frq/no_match). Implemented as
    ranked broadcast joins — see catalog.matching.tiered_match."""
    from access_mopper_spark.catalog.matching import tiered_match
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier") \
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")) \
        .select(F.col("s_nationkey").alias("nationkey"), F.col("n_regionkey").alias("regionkey"))
    cust_k = cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")) \
        .select("c_custkey", F.col("c_nationkey").alias("nationkey"),
                F.col("n_regionkey").alias("regionkey"))
    out = tiered_match(cust_k, supp,
                       tiers=[("exact", ["nationkey"]), ("no_ver", ["regionkey"])])
    return out.select("c_custkey", "match_tier")


@query(
    "q_set_containment",
    oracle="""
    SELECT o_orderkey, BOOL_AND(l_quantity > 5) AS all_heavy, COUNT(*) AS n_items
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    """,
)
def q_set_containment(spark, sf_dir):
    """Grouped set-containment (potential_vars 'all inputs available',
    mopdb_utils.py:715-741) → bool_and aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.bool_and(F.col("l_quantity") > 5).alias("all_heavy"),
             F.count("*").alias("n_items"))
    )


# =====================================================================
# §2.5 window / time-series
# =====================================================================

@query(
    "q_resample_hourly",
    oracle="""
    SELECT bin_start, event_type,
           ROUND(AVG(value), 6) AS mean_value,
           ROUND(SUM(value), 6) AS sum_value,
           COUNT(*) AS n
    FROM (
      SELECT CASE WHEN tsu = date_trunc('hour', tsu) THEN tsu - INTERVAL 1 HOUR
                  ELSE date_trunc('hour', tsu) END AS bin_start,
             event_type, value
      FROM (SELECT CAST(ts AS TIMESTAMP) AS tsu, event_type, value FROM events) t
    )
    GROUP BY bin_start, event_type
    """,
)
def q_resample_hourly(spark, sf_dir):
    """Tumbling-window downsample with the reference's closed='right'
    bin-edge semantics (time_resample, calculations.py:68-137): a point
    exactly on an edge belongs to the EARLIER bin. Exact conditional
    arithmetic, no epsilon shifting."""
    ev = load_table(spark, sf_dir, "events")
    out = time_resample(
        ev, "ts", "1 hour",
        [R6(F.avg("value")).alias("mean_value"),
         R6(F.sum("value")).alias("sum_value"),
         F.count("*").alias("n")],
        group_cols=["event_type"], closed="right", label="left",
    )
    return out.select("bin_start", "event_type", "mean_value", "sum_value", "n")


@query(
    "q_resample_monthly",
    oracle="""
    SELECT bin_start, o_orderpriority,
           ROUND(SUM(o_totalprice), 6) AS month_total, COUNT(*) AS n_orders
    FROM (
      SELECT CASE WHEN o_orderdate = date_trunc('month', o_orderdate)
                  THEN date_trunc('month', o_orderdate) - INTERVAL 1 MONTH
                  ELSE date_trunc('month', o_orderdate) END AS bin_start,
             o_orderpriority, o_totalprice
      FROM orders
    )
    GROUP BY bin_start, o_orderpriority
    """,
)
def q_resample_monthly(spark, sf_dir):
    """Calendar-month tumbling window, closed-right (reference monthly
    resample 'M' bins + label recentring, calculations.py:111-122).
    Calendar bins can't use fixed-width arithmetic — add_months path."""
    orders = load_table(spark, sf_dir, "orders")
    out = time_resample(
        orders, "o_orderdate", "1 month",
        [R6(F.sum("o_totalprice")).alias("month_total"),
         F.count("*").alias("n_orders")],
        group_cols=["o_orderpriority"], closed="right", label="left",
    )
    return out.select("bin_start", "o_orderpriority", "month_total", "n_orders")


@query(
    "q_cumsum_minus_total",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (PARTITION BY l_orderkey
                                       ORDER BY l_linenumber, l_quantity, l_extendedprice
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - SUM(l_quantity) OVER (PARTITION BY l_orderkey), 6) AS overturning
    FROM lineitem
    """,
)
def q_cumsum_minus_total(spark, sf_dir):
    """Overturning streamfunction shape (calcOverturning,
    app_functions.py:154-205): cumulative sum over depth minus the column
    total — window cumsum + window total, one shuffle on the partition key.
    Order includes value tiebreakers: (l_orderkey, l_linenumber) is not
    unique in the testdata, and cumsum needs a total order per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_quantity", "l_extendedprice")
    cum = F.sum("l_quantity").over(w.rowsBetween(W.unboundedPreceding, 0))
    tot = F.sum("l_quantity").over(W.partitionBy("l_orderkey"))
    return li.select("l_orderkey", "l_linenumber", R6(cum - tot).alias("overturning"))


@query(
    "q_window_topk",
    oracle="""
    SELECT p_brand, p_partkey, rev FROM (
      SELECT p_brand, p_partkey, rev,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey) AS rn
      FROM (
        SELECT p_brand, p_partkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
      )
    ) WHERE rn <= 3
    """,
)
def q_window_topk(spark, sf_dir):
    """Per-group top-k (preference ranking, mopdb/mopdb.py:163-168) —
    row_number window; ties broken deterministically by key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(R6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev"))
    )
    w = W.partitionBy("p_brand").orderBy(F.col("rev").desc(), F.col("p_partkey"))
    return rev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3) \
              .select("p_brand", "p_partkey", "rev")


@query(
    "q_bounds_derive",
    oracle="""
    WITH axis AS (
      SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS t
      FROM events
    ),
    mid AS (
      SELECT t, epoch_us(t) AS tu,
             LAG(epoch_us(t)) OVER (ORDER BY t) AS pu,
             LEAD(epoch_us(t)) OVER (ORDER BY t) AS nu
      FROM axis
    )
    SELECT t,
           make_timestamp(CAST(COALESCE(pu + (tu - pu) / 2, tu - (nu - tu) / 2) AS BIGINT)) AS bnd_lo,
           make_timestamp(CAST(COALESCE(tu + (nu - tu) / 2, tu + (tu - pu) / 2) AS BIGINT)) AS bnd_hi
    FROM mid
    """,
)
def q_bounds_derive(spark, sf_dir):
    """Coordinate-bounds derivation from midpoints (get_bounds roll math,
    mop_utils.py:714-724): bnd = midpoint to neighbours, endpoint
    extrapolated symmetrically. lag/lead over the ordered axis."""
    from access_mopper_spark.operators.bounds import derive_time_bounds
    ev = load_table(spark, sf_dir, "events")
    axis = ev.select(F.date_trunc("day", "ts").alias("t")).distinct()
    return derive_time_bounds(axis, "t")


@query(
    "q_freq_infer",
    oracle="""
    SELECT user_id, MIN(delta_s) AS min_delta_s, ROUND(AVG(delta_s), 6) AS mean_delta_s,
           COUNT(*) AS n_deltas
    FROM (
      SELECT user_id,
             (epoch_us(CAST(ts AS TIMESTAMP))
              - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)) / 1e6
               AS delta_s
      FROM events
    ) t WHERE delta_s IS NOT NULL
    GROUP BY user_id
    """,
)
def q_freq_infer(spark, sf_dir):
    """Frequency inference from step deltas (build_umfrq,
    mopdb_utils.py:401-428): lag window per series → delta statistics.
    Partitioned per user — no global sort at scale."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    delta = (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1e6
    return (
        ev.select("user_id", delta.alias("delta_s"))
        .where(F.col("delta_s").isNotNull())
        .groupBy("user_id")
        .agg(F.min("delta_s").alias("min_delta_s"),
             R6(F.avg("delta_s")).alias("mean_delta_s"),
             F.count("*").alias("n_deltas"))
    )


# =====================================================================
# §2.7 set operations
# =====================================================================

@query(
    "q_set_except",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def q_set_except(spark, sf_dir):
    """Set difference (check_cmor, mopdb/mopdb.py:101-108)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")) \
              .select(F.col("o_custkey").alias("custkey")).distinct()
    b = orders.where((F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")) \
              .select(F.col("o_custkey").alias("custkey")).distinct()
    return a.exceptAll(b.distinct()).distinct()


# =====================================================================
# §2.8 calc-DSL scalar expression language
# =====================================================================

@query(
    "q_calc_dsl_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_extendedprice * (1 - l_discount)) * (1 + l_tax) - 273.15, 6) AS value
    FROM lineitem
    """,
)
def q_calc_dsl_arithmetic(spark, sf_dir):
    """Calc-string compilation (mapping `calculation` column, eval'd at
    mop_utils.py:899; corpus §2.8): parsed by AST whitelist into native
    Column arithmetic — never eval, stays in whole-stage codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    ctx = CalcContext(dim_cols=["l_orderkey", "l_linenumber"],
                      var_cols=["l_extendedprice", "l_discount", "l_tax"])
    plan = compile_calc("(var[0]*(1-var[1]))*(1+var[2]) - 273.15", ctx)
    out = plan.apply(li)
    return out.select("l_orderkey", "l_linenumber", R6(F.col("value")).alias("value"))


@query(
    "q_calc_dsl_mask_reduce",
    oracle="""
    SELECT l_orderkey, ROUND(SUM(CASE WHEN l_discount <> 0 THEN l_quantity END) * 0.5, 6) AS value
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_calc_dsl_mask_reduce(spark, sf_dir):
    """Calc-string with mask + dimension reduction + post-scalar
    (var.where(cond).sum(dim=...)×k — tileSum/topsoil shapes,
    app_functions.py:315-325, calculations.py:649-664)."""
    li = load_table(spark, sf_dir, "lineitem")
    ctx = CalcContext(dim_cols=["l_orderkey", "l_linenumber"],
                      var_cols=["l_quantity", "l_discount"])
    plan = compile_calc("var[0].where(var[1] != 0).sum(dim='l_linenumber') * 0.5", ctx)
    out = plan.apply(li)
    return out.select("l_orderkey", R6(F.col("value")).alias("value"))


@query(
    "q_monsecs_normalize",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice / (date_part('day', last_day(o_orderdate)) * 86400.0), 6) AS per_sec
    FROM orders
    """,
)
def q_monsecs_normalize(spark, sf_dir):
    """Monthly-seconds normalization (calc_monsecs, mop_utils.py:848-865):
    value / (days-in-month × 86400) — pure date scalar math."""
    orders = load_table(spark, sf_dir, "orders")
    per_sec = F.col("o_totalprice") / (F.dayofmonth(F.last_day("o_orderdate")) * 86400.0)
    return orders.select("o_orderkey", R6(per_sec).alias("per_sec"))


