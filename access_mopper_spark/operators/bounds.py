"""Coordinate-bounds derivation and validation.

Reference: ``get_bounds`` (mop_utils.py:678-755) — cell bounds from axis
midpoints via roll: lo = (x + roll(x,1))/2, endpoints extrapolated
1.5·x0 − 0.5·x1 (i.e. x0 − (x1−x0)/2), latitude clamped to ±90, heights
floored at 0.  In Spark: lag/lead window over the ordered axis.  Axis
tables are tiny (they are coordinate dimensions, not data) — a single-
partition window here is fine at any data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def derive_numeric_bounds(axis: DataFrame, col: str, clamp_lo: float | None = None,
                          clamp_hi: float | None = None) -> DataFrame:
    """Bounds for a numeric axis (lat/lon/height). Returns (col, bnd_lo, bnd_hi)."""
    w = W.orderBy(col)
    prev = F.lag(col).over(w)
    nxt = F.lead(col).over(w)
    x = F.col(col)
    lo = F.coalesce((prev + x) / 2, x - (nxt - x) / 2)
    hi = F.coalesce((x + nxt) / 2, x + (x - prev) / 2)
    if clamp_lo is not None:
        lo = F.greatest(lo, F.lit(clamp_lo))
        hi = F.greatest(hi, F.lit(clamp_lo))
    if clamp_hi is not None:
        lo = F.least(lo, F.lit(clamp_hi))
        hi = F.least(hi, F.lit(clamp_hi))
    return axis.select(x.alias(col), lo.alias("bnd_lo"), hi.alias("bnd_hi"))


def derive_time_bounds(axis: DataFrame, col: str) -> DataFrame:
    """Bounds for a time axis — same roll math in microsecond space."""
    w = W.orderBy(col)
    t = F.unix_micros(F.col(col))
    prev = F.unix_micros(F.lag(col).over(w))
    nxt = F.unix_micros(F.lead(col).over(w))
    lo = F.coalesce(prev + (t - prev) / 2, t - (nxt - t) / 2)
    hi = F.coalesce(t + (nxt - t) / 2, t + (t - prev) / 2)
    return axis.select(
        F.col(col),
        F.timestamp_micros(lo.cast("long")).alias("bnd_lo"),
        F.timestamp_micros(hi.cast("long")).alias("bnd_hi"),
    )


def check_bounds_width(bounds: DataFrame, expected_seconds: float,
                       tol: float = 0.01) -> DataFrame:
    """Bounds-width validation (check_time_bnds, mop_utils.py:630-642):
    each bin width within ±tol of the expected interval."""
    width = (F.unix_micros("bnd_hi") - F.unix_micros("bnd_lo")) / 1e6
    return bounds.withColumn(
        "width_ok",
        (F.abs(width - expected_seconds) / expected_seconds) <= tol,
    )
