"""Time resampling (downsample/upsample) as tumbling-window aggregation.

Reference semantics (``mopper/calculations.py:68-137`` ``time_resample``):
``var.resample({tdim: trange}, origin='start_day', closed='right')`` followed
by a reducer (``mean|min|max|sum``), then the bin *label* is re-centred with a
per-frequency offset (``calculations.py:111-113``: month → +15 days, day →
+12 h, hour → +30 min).  Bin-edge fidelity is the top correctness risk
(SURVEY §7.3), so edges are computed with exact integer/conditional
arithmetic — no epsilon shifts:

- closed='left'  : bin = [start, end);  a point on an edge opens a new bin.
- closed='right' : bin = (start, end];  a point exactly on an edge belongs
  to the *earlier* bin.

Implementation is pure Column expressions (whole-stage codegen, shuffles
once on (group_cols, bin_start)); no UDFs.  Fixed-width units use integer
microsecond arithmetic; calendar months/years use date_trunc/add_months with
an exact on-edge conditional.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FIXED_US = {
    "week": 7 * 86_400_000_000,
    "day": 86_400_000_000,
    "hour": 3_600_000_000,
    "minute": 60_000_000,
    "second": 1_000_000,
}


def parse_every(every: str) -> tuple[int, str]:
    """'1 hour' / '3 hours' / '1 month' → (n, unit)."""
    m = re.fullmatch(r"\s*(\d+)\s*(week|day|hour|minute|second|month|year)s?\s*", every)
    if not m:
        raise ValueError(f"unsupported interval: {every!r}")
    return int(m.group(1)), m.group(2)


def bin_edges(ts: Column, every: str, closed: str = "right",
              origin: str = "1970-01-01 00:00:00") -> tuple[Column, Column]:
    """Return (bin_start, bin_end) Columns for timestamp column ``ts``.

    ``origin`` anchors fixed-width grids (reference ``origin='start_day'``
    anchors at midnight of the series start; pass that midnight here — it is
    a cheap scalar agg for the caller, and an explicit anchor keeps the
    operator deterministic and distribution-friendly).
    """
    if closed not in ("left", "right"):
        raise ValueError("closed must be 'left' or 'right'")
    n, unit = parse_every(every)

    if unit in ("month", "year"):
        months = n * (12 if unit == "year" else 1)
        anchor = F.to_timestamp(F.lit(origin))
        anchor_m = F.year(anchor) * 12 + F.month(anchor) - 1
        ts_m = F.year(ts) * 12 + F.month(ts) - 1
        # month index relative to anchor, then floor to the n-month grid
        midx = ts_m - anchor_m
        start_of_month = F.date_trunc("month", ts)
        if closed == "right":
            # a point exactly on a month start belongs to the earlier month
            on_edge = ts == start_of_month
            midx = F.when(on_edge, midx - 1).otherwise(midx)
        grid = F.floor(midx / months) * months
        bin_start = F.to_timestamp(F.add_months(F.date_trunc("month", anchor), grid.cast("int")))
        bin_end = F.to_timestamp(F.add_months(bin_start, months))
        return bin_start, bin_end

    width = n * _FIXED_US[unit]
    delta = F.unix_micros(ts) - F.unix_micros(F.to_timestamp(F.lit(origin)))
    if closed == "left":
        idx = F.floor(delta / width)
        start_us = F.unix_micros(F.to_timestamp(F.lit(origin))) + idx * width
    else:
        # ceil(delta/width): bin (i-1)*w < delta <= i*w  → end index i
        idx = -F.floor(-delta / width)
        start_us = F.unix_micros(F.to_timestamp(F.lit(origin))) + (idx - 1) * width
    bin_start = F.timestamp_micros(start_us.cast("long"))
    bin_end = F.timestamp_micros((start_us + width).cast("long"))
    return bin_start, bin_end


# label re-centring offsets, mirroring the reference's FIXED offset table
# (calculations.py:111-113: '30m'→[15,'T'], 'H'→[30,'T'], 'D'→[12,'h'],
# 'M'→[15,'D'], 'Y'→[6,'M'], '10Y'→[5,'Y']): label = bin_start + half the
# NOMINAL interval.  For fixed-width units that equals half the bin width,
# but calendar bins diverge — the reference pins monthly labels at +15 days
# for 31-day and 28-day months alike, and yearly at +6 calendar months.
def label_offset(every: str) -> tuple[str, int]:
    """('us', micros) | ('months', k) | ('days', d) — half the nominal width."""
    n, unit = parse_every(every)
    if unit in ("month", "year"):
        months = n * (12 if unit == "year" else 1)
        if months % 2 == 0:
            return ("months", months // 2)       # 'Y'→+6M, '10Y'→+5Y
        return ("days", 15 * months)             # 'M'→+15D (not half-width)
    return ("us", n * _FIXED_US[unit] // 2)


def label_col(bin_start: Column, bin_end: Column, label: str = "middle",
              every: str | None = None) -> Column:
    if label == "left":
        return bin_start
    if label == "right":
        return bin_end
    if label == "middle":
        if every is None:
            # fall back to half the actual bin width (fixed-width bins only)
            half = (F.unix_micros(bin_end) - F.unix_micros(bin_start)) / F.lit(2)
            return F.timestamp_micros((F.unix_micros(bin_start) + half).cast("long"))
        kind, amt = label_offset(every)
        if kind == "months":
            return F.to_timestamp(F.add_months(bin_start, amt))
        if kind == "days":
            return F.timestamp_micros((F.unix_micros(bin_start)
                                       + F.lit(amt * 86_400_000_000)).cast("long"))
        return F.timestamp_micros((F.unix_micros(bin_start) + F.lit(amt)).cast("long"))
    raise ValueError("label must be left|right|middle")


def time_resample(df: DataFrame, ts_col: str, every: str, aggs: list[Column],
                  group_cols: list[str] | None = None, closed: str = "right",
                  label: str = "middle", origin: str = "1970-01-01 00:00:00") -> DataFrame:
    """Downsample: tumbling-window groupBy with exact edge semantics.

    ``aggs`` are ready aggregate Columns (``F.mean('value').alias('v')``).
    Scale note: single shuffle on (group_cols, bin_start); partial
    aggregation is map-side (Catalyst HashAggregate partial/final), so this
    holds at 100 TB as long as group cardinality × bins fits the reducers —
    time-binned keys are naturally well distributed.
    """
    group_cols = list(group_cols or [])
    bs, be = bin_edges(F.col(ts_col), every, closed=closed, origin=origin)
    out = (
        df.withColumn("__bin_start", bs)
        .withColumn("__bin_end", be)
        .groupBy(*group_cols, "__bin_start", "__bin_end")
        .agg(*aggs)
    )
    return (
        out.withColumn(ts_col, label_col(F.col("__bin_start"), F.col("__bin_end"), label,
                                         every=every))
        .withColumnRenamed("__bin_start", "bin_start")
        .withColumnRenamed("__bin_end", "bin_end")
    )


def start_day_origin(df: DataFrame, ts_col: str) -> str:
    """Reference ``origin='start_day'``: midnight of the first timestamp.
    One cheap scalar aggregate (min pushes down to parquet stats)."""
    row = df.select(F.date_format(F.date_trunc("day", F.min(ts_col)), "yyyy-MM-dd HH:mm:ss")).first()
    return row[0]


def time_interpolate(df: DataFrame, ts_col: str, value_col: str, every: str,
                     group_cols: list[str] | None = None,
                     align: bool = False) -> DataFrame:
    """Upsample + linear interpolation (reference ``calculations.py:127-132``
    ``.resample(...).interpolate('linear')``).

    Spark-first formulation: per group, generate the target timestamp grid
    with ``sequence`` between the observed min/max (aggregate, no driver
    loop), explode, then bracket each target between the previous/next
    observation via a union + window scan (the scalable as-of pattern — one
    sort per group partition, no range self-join), and linearly blend.
    """
    from pyspark.sql import Window as W

    group_cols = list(group_cols or [])
    n, unit = parse_every(every)

    span = df.groupBy(*group_cols).agg(F.min(ts_col).alias("__t0"), F.max(ts_col).alias("__t1"))
    if unit in ("month", "year"):
        # calendar grid (reference accepts 'M'/'Y' upsample targets,
        # calculations.py:127-132): month steps via timestampadd so
        # time-of-day is preserved; align=True snaps the first grid point
        # up to the next month start.  k range is over-generated from a
        # 28-day lower bound on month length, then filtered to <= __t1 —
        # exact without trusting fractional months_between.
        months = n * (12 if unit == "year" else 1)
        if align:
            trunc = F.date_trunc("month", F.col("__t0"))
            span = span.withColumn(
                "__t0",
                F.when(F.col("__t0") == trunc, F.col("__t0"))
                 .otherwise(F.to_timestamp(F.add_months(trunc, 1))))
        kmax = F.floor(
            F.datediff("__t1", "__t0") / F.lit(28 * months)).cast("int")
        ks = F.when(F.col("__t0") <= F.col("__t1"),
                    F.sequence(F.lit(0), kmax))
        grid = (
            span.select(*group_cols, "__t0", "__t1", F.explode(ks).alias("__k"))
            .select(*group_cols, "__t1",
                    F.expr(f"timestampadd(MONTH, __k * {months}, __t0)").alias(ts_col))
            .where(F.col(ts_col) <= F.col("__t1"))
            .drop("__t1")
        )
    else:
        step = F.expr(f"interval {n} {unit}")
        if align:
            # epoch-aligned grid (pandas .resample(...).interpolate
            # semantics): first grid point = ceil(min/step)*step
            width = n * _FIXED_US[unit]
            t0u = F.unix_micros("__t0")
            aligned = (-F.floor(-t0u / width) * width).cast("long")
            span = span.withColumn("__t0", F.timestamp_micros(aligned))
        # guard: a group spanning less than one step can leave the aligned
        # __t0 past __t1; sequence(start, stop, +step) would throw at
        # runtime.  when() leaves the sequence unevaluated and yields NULL,
        # and explode drops NULL rows — the group simply contributes no
        # grid points.
        seq = F.when(F.col("__t0") <= F.col("__t1"),
                     F.sequence("__t0", "__t1", step))
        grid = span.select(*group_cols, F.explode(seq).alias(ts_col))
    obs = df.select(*group_cols, ts_col, F.col(value_col).cast("double").alias("__obs"),
                    F.lit(0).alias("__grid"))
    tagged = grid.select(*group_cols, ts_col, F.lit(None).cast("double").alias("__obs"),
                         F.lit(1).alias("__grid")).unionByName(obs)

    # at equal ts, sort the observation before the grid row in BOTH window
    # directions so a grid point coinciding with an observation sees it as
    # its bracketing value on both sides (→ exact passthrough).
    w = W.partitionBy(*group_cols).orderBy(F.col(ts_col).asc(), F.col("__obs").asc_nulls_last())
    prev_v = F.last("__obs", ignorenulls=True).over(w.rowsBetween(W.unboundedPreceding, 0))
    prev_t = F.last(F.when(F.col("__obs").isNotNull(), F.col(ts_col)), ignorenulls=True) \
              .over(w.rowsBetween(W.unboundedPreceding, 0))
    w_rev = W.partitionBy(*group_cols).orderBy(F.col(ts_col).desc(), F.col("__obs").asc_nulls_last())
    next_v = F.last("__obs", ignorenulls=True).over(w_rev.rowsBetween(W.unboundedPreceding, 0))
    next_t = F.last(F.when(F.col("__obs").isNotNull(), F.col(ts_col)), ignorenulls=True) \
              .over(w_rev.rowsBetween(W.unboundedPreceding, 0))

    enriched = tagged.select(
        *group_cols, ts_col, "__grid",
        prev_v.alias("__pv"), prev_t.alias("__pt"), next_v.alias("__nv"), next_t.alias("__nt"),
    )
    frac = (F.unix_micros(F.col(ts_col)) - F.unix_micros("__pt")) / \
           (F.unix_micros("__nt") - F.unix_micros("__pt"))
    interp = (
        F.when(F.col("__pt").isNull(), F.col("__nv"))
        .when(F.col("__nt").isNull(), F.col("__pv"))
        .when(F.col("__nt") == F.col("__pt"), F.col("__pv"))
        .otherwise(F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac)
    )
    return enriched.where(F.col("__grid") == 1) \
                   .select(*group_cols, ts_col, interp.alias(value_col))
