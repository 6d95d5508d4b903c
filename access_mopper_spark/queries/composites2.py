"""§2.10 composites round 2 + bounds/tile/filename seams.

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403


# =====================================================================
# §2.10 composites round 2: straits, optical depth, zostoga, safe
# division, scalar-anomaly, timeshot dispatch, derivability closure
# =====================================================================

_STRAITS = [
    # (strait, key_lo, key_hi, line_lo, line_hi) — the (i0,i1,j0,j1) boxes
    ("drake", 100, 700, 1, 2),
    ("bering", 800, 1300, 2, 4),
    ("itf", 1400, 1900, 5, 7),
]


@query(
    "q_line_transports",
    oracle=f"""
    WITH straits(strait, key_lo, key_hi, line_lo, line_hi) AS (
      VALUES {", ".join(f"('{s}', {a}, {b}, {c}, {d})" for s, a, b, c, d in _STRAITS)}
    )
    SELECT strait, ROUND(SUM(l_quantity * l_extendedprice * 1e-9), 6) AS transport
    FROM straits JOIN lineitem
      ON l_partkey BETWEEN key_lo AND key_hi
     AND l_linenumber BETWEEN line_lo AND line_hi
    GROUP BY strait
    """,
)
def q_line_transports(spark, sf_dir):
    """Named-strait transports (lineTransports, calculations.py:240-321;
    strait dim from transport_lines.yaml): ONE scan with a broadcast
    range-join against the strait table — not a union of per-strait
    scans (the reference recomputes the masked sum 15×; here Catalyst
    sees a single pass and the box predicates vectorize)."""
    li = load_table(spark, sf_dir, "lineitem")
    straits = spark.createDataFrame(
        _STRAITS, ["strait", "key_lo", "key_hi", "line_lo", "line_hi"])
    return (
        li.join(F.broadcast(straits),
                F.col("l_partkey").between(F.col("key_lo"), F.col("key_hi"))
                & F.col("l_linenumber").between(F.col("line_lo"), F.col("line_hi")))
        .groupBy("strait")
        .agg(R6(F.sum(F.col("l_quantity") * F.col("l_extendedprice") * 1e-9))
             .alias("transport"))
    )


@query(
    "q_optical_depth",
    oracle="""
    SELECT l_orderkey, ROUND(SUM(l_quantity) * 0.5, 6) AS od
    FROM lineitem WHERE l_linenumber IN (1, 3, 5)
    GROUP BY l_orderkey
    """,
)
def q_optical_depth(spark, sf_dir):
    """Level-selected N-ary sum × const (optical_depth,
    calculations.py:760-781): isin pushdown + single groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_linenumber").isin(1, 3, 5))
        .groupBy("l_orderkey")
        .agg(R6(F.sum("l_quantity") * 0.5).alias("od"))
    )


@query(
    "q_zostoga",
    oracle="""
    WITH col_int AS (
      SELECT o_orderkey, o_orderdate, o_totalprice,
             SUM((1 - l_discount) * l_quantity) AS zint
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2, 3
    )
    SELECT EXTRACT(month FROM o_orderdate) AS month,
           ROUND(SUM(zint * o_totalprice) / SUM(o_totalprice), 6) AS zostoga
    FROM col_int GROUP BY 1
    """,
)
def q_zostoga(spark, sf_dir):
    """Two-stage global-mean sea-level aggregate (zost/calc_zostoga,
    app_functions.py:632-680): per-column depth integral Σ(1-ρ/ρ₀)dz,
    then area-weighted global mean per timestep — two groupBys, the
    second over far fewer rows (classic partial-agg pyramid)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    col_int = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum((1 - F.col("l_discount")) * F.col("l_quantity")).alias("zint"))
    )
    return (
        col_int.groupBy(F.month("o_orderdate").alias("month"))
        .agg(R6(F.sum(F.col("zint") * F.col("o_totalprice"))
                / F.sum("o_totalprice")).alias("zostoga"))
    )


@query(
    "q_safe_division",
    oracle="""
    WITH q AS (
      SELECT l_orderkey, l_linenumber,
             GREATEST(l_quantity - 45.0, 0.0) / l_extendedprice AS vout
      FROM lineitem
    ),
    minpos AS (
      SELECT MIN(vout) FILTER (vout > 0) AS mp FROM q
    )
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN vout = 0 THEN 0.5 * mp ELSE vout END, 9) AS packed
    FROM q, minpos
    """,
)
def q_safe_division(spark, sf_dir):
    """Packing fix (fix_packing_division, app_functions.py:735-738):
    divide FIRST, then replace zero results with half the smallest
    positive result — the reference's exact post-division semantics.
    The min-positive-quotient is a 1-row global aggregate broadcast back
    as a scalar (BroadcastNestedLoop over one row, i.e. free); the
    numerator is clipped so a large fraction of rows genuinely exercise
    the vout==0 replacement path."""
    from access_mopper_spark.functions.physics import fix_packing_division
    li = load_table(spark, sf_dir, "lineitem")
    num = F.greatest(F.col("l_quantity") - 45.0, F.lit(0.0))
    den = F.col("l_extendedprice")
    minpos = li.agg(
        F.min(F.when(num / den > 0, num / den)).alias("mp"))
    packed = fix_packing_division(num, den, F.col("mp"))
    return (
        li.crossJoin(F.broadcast(minpos))
        .select("l_orderkey", "l_linenumber",
                pround(packed, 9).alias("packed"))
    )


@query(
    "q_scalar_anomaly",
    oracle="""
    WITH agg AS (
      SELECT EXTRACT(month FROM o_orderdate) AS month, o_orderpriority,
             SUM(o_totalprice) AS tot
      FROM orders GROUP BY 1, 2
    ),
    ref AS (
      SELECT month, tot AS ref_tot FROM agg WHERE o_orderpriority = '1-URGENT'
    )
    SELECT a.month, a.o_orderpriority, ROUND(a.tot - r.ref_tot, 6) AS anomaly
    FROM agg a JOIN ref r ON a.month = r.month
    """,
)
def q_scalar_anomaly(spark, sf_dir):
    """Per-group scalar subtraction (msftbarot's psiu minus the
    drake-passage scalar per timestep, calculations.py:518-541): the
    reference-group value is a tiny per-month table, broadcast back
    against the full aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(F.month("o_orderdate").alias("month"), "o_orderpriority") \
                .agg(F.sum("o_totalprice").alias("tot"))
    ref = agg.where(F.col("o_orderpriority") == "1-URGENT") \
             .select("month", F.col("tot").alias("ref_tot"))
    return (
        agg.join(F.broadcast(ref), "month")
        .select("month", "o_orderpriority",
                R6(F.col("tot") - F.col("ref_tot")).alias("anomaly"))
    )


@query(
    "q_timeshot_dispatch",
    oracle="""
    SELECT user_id, event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           ROUND(CASE event_type
                 WHEN 'click' THEN AVG(value)
                 WHEN 'view' THEN SUM(value)
                 WHEN 'purchase' THEN MAX(value)
                 WHEN 'error' THEN MIN(value)
                 ELSE COUNT(value) END, 6) AS stat
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_timeshot_dispatch(spark, sf_dir):
    """Timeshot semantics (define_timeshot, setup_utils.py:53-78):
    cell_methods metadata picks the reducer (point/mean/max/min/sum) per
    variable. All candidate aggregates are computed in ONE grouped pass
    (they share the shuffle) and the metadata column selects via CASE —
    no per-reducer re-scan."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("user_id", "event_type",
                   F.date_trunc("day", "ts").alias("day"))
    out = g.agg(F.avg("value").alias("__mean"), F.sum("value").alias("__sum"),
                F.max("value").alias("__max"), F.min("value").alias("__min"),
                F.count("value").alias("__cnt"))
    stat = (F.when(F.col("event_type") == "click", F.col("__mean"))
            .when(F.col("event_type") == "view", F.col("__sum"))
            .when(F.col("event_type") == "purchase", F.col("__max"))
            .when(F.col("event_type") == "error", F.col("__min"))
            .otherwise(F.col("__cnt")))
    # day is midnight-valued → ship as DATE (TZ-render-immune; repo
    # convention: timestamps that are really dates ship as DATE)
    return out.select("user_id", "event_type",
                      F.col("day").cast("date").alias("day"),
                      R6(stat).alias("stat"))


_DERIV_MAPPINGS = [
    ("v_direct", "NATION_2"),
    ("v_pair", "NATION_0 NATION_1"),
    ("v_partial", "NATION_0 NATION_99"),
    ("v_triple", "NATION_3 NATION_4 NATION_5"),
    ("v_missing", "NATION_77"),
]


@query(
    "q_derivability",
    oracle=f"""
    WITH mapping(cmor_var, input_vars) AS (
      VALUES {", ".join(f"('{v}', '{iv}')" for v, iv in _DERIV_MAPPINGS)}
    ),
    avail AS (SELECT n_name FROM nation WHERE n_nationkey < 15),
    flags AS (
      SELECT m.cmor_var, m.input_vars,
             bool_and(a.n_name IS NOT NULL) AS ok
      FROM mapping m
      CROSS JOIN UNNEST(string_split(m.input_vars, ' ')) AS t(iv)
      LEFT JOIN avail a ON a.n_name = t.iv
      GROUP BY 1, 2
    )
    SELECT cmor_var, input_vars FROM flags WHERE ok
    """,
)
def q_derivability(spark, sf_dir):
    """Derivability closure (potential_vars, mopdb_utils.py:715-741):
    keep mapping rows whose input variables ALL exist in the scanned
    output — explode + broadcast semi-probe + grouped bool_and."""
    from access_mopper_spark.catalog.matching import derivability_closure
    nation = load_table(spark, sf_dir, "nation")
    avail = nation.where(F.col("n_nationkey") < 15).select(F.col("n_name").alias("name"))
    mapping = spark.createDataFrame(_DERIV_MAPPINGS, ["cmor_var", "input_vars"])
    return derivability_closure(avail, mapping)


# =====================================================================
# bounds validation, level relabel, tile average, filename timestamps
# =====================================================================

@query(
    "q_bounds_check",
    oracle="""
    WITH axis AS (
      SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS t
      FROM events
    ),
    e AS (
      SELECT t, epoch_us(t) AS tu,
             epoch_us(LAG(t) OVER (ORDER BY t)) AS pu,
             epoch_us(LEAD(t) OVER (ORDER BY t)) AS nu
      FROM axis
    ),
    b AS (
      SELECT t,
             make_timestamp(CAST(FLOOR(COALESCE(pu + (tu - pu) / 2.0,
                                                tu - (nu - tu) / 2.0)) AS BIGINT)) AS bnd_lo,
             make_timestamp(CAST(FLOOR(COALESCE(tu + (nu - tu) / 2.0,
                                                tu + (tu - pu) / 2.0)) AS BIGINT)) AS bnd_hi
      FROM e
    )
    SELECT t, bnd_lo, bnd_hi,
           ABS(epoch(bnd_hi) - epoch(bnd_lo) - 86400.0) / 86400.0 <= 0.01 AS width_ok
    FROM b
    """,
)
def q_bounds_check(spark, sf_dir):
    """Bounds derivation + width validation (get_bounds roll math +
    check_time_bnds ±1% tolerance, mop_utils.py:678-755, :630-642):
    lag/lead over the tiny axis table, then an assertion column."""
    from access_mopper_spark.operators.bounds import (check_bounds_width,
                                                      derive_time_bounds)
    ev = load_table(spark, sf_dir, "events")
    axis = ev.select(F.date_trunc("day", "ts").alias("t")).distinct()
    bounds = derive_time_bounds(axis, "t")
    return check_bounds_width(bounds, 86400.0, tol=0.01)


_LEVEL_HEIGHTS = [(1, 20.0), (2, 80.0), (3, 180.0), (4, 320.0),
                  (5, 500.0), (6, 720.0), (7, 980.0)]


@query(
    "q_level_to_height",
    oracle=f"""
    WITH levels(lev, height_m) AS (
      VALUES {", ".join(f"({l}, {h})" for l, h in _LEVEL_HEIGHTS)}
    )
    SELECT l_orderkey, CAST(height_m AS DOUBLE) AS height_m,
           ROUND(SUM(l_quantity), 6) AS qty
    FROM lineitem JOIN levels ON l_linenumber = lev
    GROUP BY 1, 2
    """,
)
def q_level_to_height(spark, sf_dir):
    """Vertical-dimension relabel: model level number → physical height
    from a static table (level_to_height, calculations.py:1160-1184;
    data/model_levels.yaml) — broadcast dim join, then the original level
    column is dropped."""
    li = load_table(spark, sf_dir, "lineitem")
    levels = spark.createDataFrame(_LEVEL_HEIGHTS, ["lev", "height_m"])
    return (
        li.join(F.broadcast(levels), li.l_linenumber == levels.lev)
        .groupBy("l_orderkey", "height_m")
        .agg(R6(F.sum("l_quantity")).alias("qty"))
    )


@query(
    "q_tile_ave",
    oracle="""
    SELECT l_orderkey, ROUND(SUM(l_quantity * l_tax), 6) AS tile_ave
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_tile_ave(spark, sf_dir):
    """Tile-weighted average — the reference's most-used operator
    (tileAve ×31 in shipped mappings; calculations.py:1117-1152):
    Σ_tiles value·frac collapsing the tile dimension. Single
    map-side-combined groupBy."""
    from access_mopper_spark.operators.aggregates import tile_weighted_sum
    li = load_table(spark, sf_dir, "lineitem")
    out = tile_weighted_sum(li, "l_quantity", "l_tax", ["l_orderkey"])
    return out.select("l_orderkey", R6(F.col("tile_ave")).alias("tile_ave"))


@query(
    "q_filename_timestamp",
    oracle="""
    WITH files AS (
      SELECT DISTINCT 'ocean_daily_' || strftime(o_orderdate, '%Y%m%d') || '.nc' AS fname
      FROM orders
    )
    SELECT fname,
           CAST(strptime(regexp_extract(fname, '([0-9]{8})', 1), '%Y%m%d') AS DATE)
             AS fstamp
    FROM files
    WHERE strptime(regexp_extract(fname, '([0-9]{8})', 1), '%Y%m%d')
          BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1996-12-31'
    """,
)
def q_filename_timestamp(spark, sf_dir):
    """Filename-timestamp partition pruning (check_timestamp,
    mop_utils.py:238-295): parse the digit stamp out of heterogeneous
    filenames, keep files overlapping [tstart, tend]. At ingest this
    becomes the partitioner; expressed here as regexp + to_timestamp +
    range predicate."""
    orders = load_table(spark, sf_dir, "orders")
    files = orders.select(
        F.concat(F.lit("ocean_daily_"),
                 F.date_format("o_orderdate", "yyyyMMdd"),
                 F.lit(".nc")).alias("fname")).distinct()
    stamp = F.to_timestamp(F.regexp_extract("fname", r"([0-9]{8})", 1), "yyyyMMdd")
    return (
        files.withColumn("fstamp", stamp)
        .where(F.col("fstamp").between(F.lit("1994-01-01"), F.lit("1996-12-31")))
        # yyyyMMdd stamps are midnight-valued → ship as DATE
        .select("fname", F.col("fstamp").cast("date").alias("fstamp"))
    )


