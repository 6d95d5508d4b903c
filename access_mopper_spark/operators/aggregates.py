"""Aggregation operator pack — the reference's §2.4 family re-expressed as
single-shuffle groupBy plans (map-side partial aggregation throughout).

Every function returns a DataFrame plan; nothing collects. Weights, masks
and basin/tile tables are companion columns or small broadcast dims — the
reference loads them as ancillary NetCDFs inside operators
(calculations.py:156-161, 1010-1036); here they arrive as DataFrames and
are broadcast-joined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def weighted_mean(df: DataFrame, value: str | Column, weight: str | Column,
                  group_cols: list[str], out_col: str = "wmean") -> DataFrame:
    """Mass-weighted mean: sum(v*w)/sum(w), skipna (calc_global_ave_ocean,
    calculations.py:801-825; OM2 variant app_functions.py:255-264).
    skipna='True' semantics: null values contribute neither numerator nor
    denominator."""
    v = F.col(value) if isinstance(value, str) else value
    w = F.col(weight) if isinstance(weight, str) else weight
    w_eff = F.when(v.isNotNull(), w)
    return df.groupBy(*group_cols).agg(
        (F.sum(v * w_eff) / F.sum(w_eff)).alias(out_col))


def hemi_sum(df: DataFrame, value: str, lat_col: str = "lat", hemisphere: str = "north",
             lo: float | None = None, hi: float | None = None,
             group_cols: list[str] = ()) -> DataFrame:
    """Hemispheric (optionally threshold-banded) sum — sea-ice
    area/volume/extent (HemiSeaIce, calculations.py:568-646)."""
    pred = (F.col(lat_col) >= 0) if hemisphere == "north" else (F.col(lat_col) < 0)
    if lo is not None:
        pred = pred & (F.col(value) >= lo)
    if hi is not None:
        pred = pred & (F.col(value) <= hi)
    return df.where(pred).groupBy(*group_cols).agg(F.sum(value).alias(f"{value}_sum"))


def depth_integral(df: DataFrame, value: str, rho: str | Column, dz: str | Column,
                   group_cols: list[str]) -> DataFrame:
    """Σ_z v·rho·dz then collapse depth (ocndepthint,
    app_functions.py:496-528)."""
    r = F.col(rho) if isinstance(rho, str) else rho
    d = F.col(dz) if isinstance(dz, str) else dz
    return df.groupBy(*group_cols).agg(F.sum(F.col(value) * r * d).alias(f"{value}_int"))


def cumsum_minus_total(df: DataFrame, value: str, part_cols: list[str], order_col: str,
                       out_col: str = "overturning") -> DataFrame:
    """Cumulative sum over depth minus the column total (calcOverturning /
    meridionalOverturning, app_functions.py:154-205, :101-145).

    One shuffle on part_cols serves both windows (cumsum frame and whole-
    partition total share the partitioning)."""
    w = W.partitionBy(*part_cols).orderBy(order_col)
    cum = F.sum(value).over(w.rowsBetween(W.unboundedPreceding, 0))
    tot = F.sum(value).over(W.partitionBy(*part_cols))
    return df.withColumn(out_col, cum - tot)


def tile_weighted_sum(df: DataFrame, value: str, frac: str, group_cols: list[str],
                      out_col: str = "tile_ave") -> DataFrame:
    """Tile-weighted average: Σ_tiles v·frac (tileAve,
    calculations.py:1117-1152; app_functions.py:292-313)."""
    return df.groupBy(*group_cols).agg(F.sum(F.col(value) * F.col(frac)).alias(out_col))


def tile_bucket_sum(df: DataFrame, value: str, tile_col: str, buckets: dict[str, list[int]],
                    group_cols: list[str], out_col: str = "value") -> DataFrame:
    """Bucket tiles into classes then sum per class (fracLut land-use
    regrouping, calculations.py:1073-1102, app_functions.py:207-243):
    when/otherwise bucket column + groupBy."""
    bucket = F.lit(None).cast("string")
    expr = None
    for name, tiles in buckets.items():
        cond = F.col(tile_col).isin(tiles)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    bucket = expr.otherwise(F.lit("other"))
    return df.withColumn("tile_class", bucket) \
             .groupBy(*group_cols, "tile_class") \
             .agg(F.sum(value).alias(out_col))


def climatology(df: DataFrame, ts_col: str, value: str, weight_days: Column | None = None,
                group_cols: list[str] = ()) -> DataFrame:
    """Monthly climatology: day-weighted mean per calendar month across
    years (axm_timeshot monthClim, mop_utils.py:815-845)."""
    w = weight_days if weight_days is not None else F.dayofmonth(F.last_day(ts_col))
    return (
        df.withColumn("month", F.month(ts_col))
        .groupBy(*group_cols, "month")
        .agg((F.sum(F.col(value) * w) / F.sum(w)).alias(f"{value}_clim"))
    )


def ocean_floor(df: DataFrame, value: str, depth_col: str, group_cols: list[str]) -> DataFrame:
    """Deepest non-null level per column (ocean_floor,
    calculations.py:683-698): max_by over non-null depths — a single
    aggregate, no window or self-join."""
    nn = F.when(F.col(value).isNotNull(), F.col(depth_col))
    return df.groupBy(*group_cols).agg(
        F.max_by(value, nn).alias(f"{value}_floor"),
        F.max(nn).alias("floor_depth"),
    )


def column_max(df: DataFrame, value: str, over_col: str, group_cols: list[str]) -> DataFrame:
    """Max over levels (column_max, app_functions.py:742-744)."""
    return df.groupBy(*group_cols).agg(F.max(value).alias(f"{value}_max"))


def add_axis(df: DataFrame, name: str, value) -> DataFrame:
    """Expand a singleton dimension (add_axis, calculations.py:1187-1205):
    a constant axis column, so downstream group/sort keys and the sink's
    schema see the dimension explicitly."""
    return df.withColumn(name, F.lit(value))


def fixed_width_histogram(df, value_col: str, n_buckets: int,
                          group_cols: list[str] | None = None):
    """Fixed-width histogram with data-derived bounds: global [min, max]
    from a 1-row aggregate broadcast back (scalar-subquery shape), bucket
    = floor((v − lo)/(hi − lo)·n) clamped to [0, n−1], then one
    map-side-combined count per (group, bucket).  Two passes over the
    column, no window, no sort — the shape that survives any row count;
    the bucket math is plain IEEE double ops so estimates replay
    identically on any engine."""
    from pyspark.sql import functions as F

    group_cols = group_cols or []
    bounds = df.agg(F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi"))
    raw = F.floor((F.col(value_col) - F.col("__lo"))
                  / (F.col("__hi") - F.col("__lo")) * n_buckets)
    # degenerate range (all values equal): Spark's non-ANSI 0/0 yields
    # NULL while IEEE engines yield inf — pin bucket 0 explicitly so the
    # semantics are engine-independent
    raw = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(raw)
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)).cast("int")
    return (df.crossJoin(F.broadcast(bounds))
              .withColumn("bucket", bucket)
              .groupBy(*group_cols, "bucket")
              .agg(F.count("*").alias("n"),
                   F.min(value_col).alias("bucket_min"),
                   F.max(value_col).alias("bucket_max")))


def time_range_mean(df: DataFrame, ts_col: str, value_col: str,
                    part_cols: list[str], window_seconds: int,
                    out_col: str = "moving_avg") -> DataFrame:
    """Sliding event-time moving average: mean of ``value_col`` over the
    trailing ``window_seconds`` (inclusive both ends), per partition key
    — the time-RANGE window frame (not ROWS: irregular event spacing
    means a fixed row count is the wrong window).  One keyed window
    shuffle; the frame is evaluated with a sliding two-pointer inside
    each partition, so cost is O(rows), not O(rows × frame).  Ordering
    key is ``unix_micros`` — event timestamps carry sub-second parts, so
    second-granular keys would mis-order peers and clip the frame."""
    w = (W.partitionBy(*part_cols)
          .orderBy(F.unix_micros(F.col(ts_col)))
          .rangeBetween(-window_seconds * 1_000_000, 0))
    return df.withColumn(out_col, F.avg(value_col).over(w)) \
             .withColumn("n_in_window", F.count("*").over(w))


def equi_depth_histogram(df: DataFrame, value_col: str, n_tiles: int,
                         group_cols: list[str],
                         tiebreak_col: str) -> DataFrame:
    """Equi-depth (equal-count) histogram via NTILE: per group, rank
    rows by (value, tiebreak) and slice into ``n_tiles`` buckets of
    near-equal population; report each bucket's boundaries and count.
    The complement of ``fixed_width_histogram`` — equi-depth adapts
    bucket edges to the distribution (what an optimizer's column stats
    store).  NTILE is a keyed window (one shuffle + per-key sort); the
    per-bucket rollup reuses the same partitioning key prefix so AQE
    coalesces it without a second exchange.  Null ordering is pinned
    explicitly: Spark's ASC default is NULLS FIRST, DuckDB's is NULLS
    LAST, so an unpinned window diverges tile assignment the moment the
    value column carries NULLs."""
    w = W.partitionBy(*group_cols).orderBy(F.asc_nulls_first(value_col),
                                           F.asc_nulls_first(tiebreak_col))
    tiled = df.withColumn("tile", F.ntile(n_tiles).over(w))
    return tiled.groupBy(*group_cols, "tile").agg(
        F.count("*").alias("n"),
        F.min(value_col).alias("tile_min"),
        F.max(value_col).alias("tile_max"))


def group_linreg(df: DataFrame, x: Column, y: Column,
                 group_cols: list[str]) -> DataFrame:
    """Per-group simple linear regression from explicit first/second
    moments — slope, intercept and r² computed from (n, Σx, Σy, Σxy,
    Σx², Σy²) so the whole fit is ONE map-side-combined aggregation
    (the textbook closed form; engines with regr_slope/regr_r2 built-ins
    differ in null/denominator edge handling, so the explicit sums are
    also what keeps the oracle bit-aligned).  Degenerate groups (single
    point, zero x-variance) yield NULL slope rather than ±inf."""
    agg = df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"))
    n = F.col("n").cast("double")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(varx != 0, cov / varx)
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = F.when((varx != 0) & (vary != 0), cov * cov / (varx * vary))
    return agg.select(*group_cols, "n", slope.alias("slope"),
                      intercept.alias("intercept"), r2.alias("r2"))


def weighted_median_2phase(df: DataFrame, value_col: str, weight_col: str,
                           group_cols: list[str], tiebreak: list[str],
                           bucket_width: float) -> DataFrame:
    """Exact per-group weighted median with DISTRIBUTED parallelism in
    both phases — the classic bucket-refinement answer to "an exact
    quantile sorts within each group" (few huge groups → few busy
    cores in the naive keyed-window formulation):

    phase 1: a value-bucket weight histogram per group (one small
    shuffle), cumulated over the TINY bucket table, locates the single
    bucket containing the half-total mass;
    phase 2: only that bucket's rows (≤ total_weight/width of the
    group, by construction) are re-scanned, sorted and cumulated — a
    sliver of the group, not the group.

    Costs one extra pass over the input; every window runs over
    bucket-level or sliver-level tables.  Result is identical to the
    one-pass definition: smallest value whose cumulative weight (in
    (value, tiebreak) order) reaches half the group total."""
    val, wt = F.col(value_col), F.col(weight_col)
    bucket = F.floor(val / bucket_width)
    hist = (df.groupBy(*group_cols, bucket.alias("__b"))
              .agg(F.sum(wt).alias("__bw")))
    wcum = (W.partitionBy(*group_cols).orderBy("__b")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    wtot = W.partitionBy(*group_cols)
    cum = (hist.withColumn("__cum", F.sum("__bw").over(wcum))
               .withColumn("__tot", F.sum("__bw").over(wtot)))
    target = (cum.where(F.col("__cum") >= F.col("__tot") / 2)
                 .groupBy(*group_cols)
                 .agg(F.min("__b").alias("__tb"),
                      F.min("__tot").alias("__tot")))
    before = (cum.join(target.select(*group_cols, "__tb"), group_cols)
                 .where(F.col("__b") < F.col("__tb"))
                 .groupBy(*group_cols)
                 .agg(F.sum("__bw").alias("__before")))
    sliver = (df.join(F.broadcast(target), group_cols)
                .where(bucket == F.col("__tb"))
                .join(F.broadcast(before), group_cols, "left")
                .na.fill({"__before": 0.0}))
    scum = (W.partitionBy(*group_cols).orderBy(value_col, *tiebreak)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    hit = (sliver.withColumn("__cum", F.col("__before")
                             + F.sum(wt).over(scum))
                 .where(F.col("__cum") >= F.col("__tot") / 2))
    return hit.groupBy(*group_cols).agg(
        F.min(val).alias("weighted_median"),
        F.min("__tot").alias("total_weight"))


def cohens_kappa(df: DataFrame, a_col: str, b_col: str,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Inter-annotator agreement (Cohen's kappa) over two binary label
    columns — the QC gate preference/annotation pipelines run before
    trusting pairwise labels: kappa = (p_o − p_e)/(1 − p_e), observed
    vs chance agreement.  All inputs reduce to INTEGER counts in one
    map-side-combined aggregation (n, n11, n00, marginals), so the only
    float work is the final snapped division — order-free and exact at
    any scale.  Perfect-chance marginals (p_e = 1) yield NULL.
    Returns one row per group: (*group_cols, n_items, n_agree, kappa).
    """
    from access_mopper_spark.functions.rounding import pround
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    agg = gb.agg(
        F.count("*").alias("__n"),
        F.sum(a * b).alias("__n11"),
        F.sum((1 - a) * (1 - b)).alias("__n00"),
        F.sum(a).alias("__sa"),
        F.sum(b).alias("__sb"))
    n = F.col("__n").cast("double")
    po = (F.col("__n11") + F.col("__n00")).cast("double") / n
    pa1, pb1 = F.col("__sa").cast("double") / n, F.col("__sb").cast("double") / n
    pe = pa1 * pb1 + (F.lit(1.0) - pa1) * (F.lit(1.0) - pb1)
    out_cols = (list(group_cols) if group_cols else [])
    return agg.select(
        *out_cols,
        F.col("__n").alias("n_items"),
        (F.col("__n11") + F.col("__n00")).alias("n_agree"),
        F.when(pe < 1.0, pround((po - pe) / (F.lit(1.0) - pe), 6))
         .alias("kappa"))
