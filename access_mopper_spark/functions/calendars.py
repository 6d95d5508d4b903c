"""Non-Gregorian CF calendar support (360_day, noleap/365_day, all_leap).

The reference runs all time math through cftime with the experiment's CF
calendar (``cftime.date2num`` → "days since <ref>", mopper.py:241-243;
calendar from config, mopper.py:183, CMIP6_conf.yaml:118).  Real ACCESS
archives use noleap and 360_day axes that Spark's proleptic-Gregorian
``TimestampType`` cannot represent, so — per SURVEY §7.3 — this module
keeps CF time as a plain numeric "days since reference" column (double;
fractional days carry time-of-day) and does every calendar computation as
exact integer/conditional Column arithmetic.  Everything here is
whole-stage-codegen Column math (no UDFs, no shuffle beyond the resample
groupBy) and is expressible 1:1 in ANSI SQL for the DuckDB oracle.

Fixed-length calendars only: every year has the same month-length table,
so decomposition is pure modular arithmetic — the property that makes
these calendars *simpler* than Gregorian once timestamps are abandoned.
For ``proleptic_gregorian`` data use the native TimestampType operators
(operators/resample.py).

Bounds on a days-since axis come from the generic numeric path
(operators/bounds.derive_numeric_bounds) — no calendar awareness needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from access_mopper_spark.operators.resample import parse_every

#: month-length tables for fixed-length CF calendars
_MONTH_DAYS = {
    "360_day": [30] * 12,
    "noleap": [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
    "all_leap": [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
}
_MONTH_DAYS["365_day"] = _MONTH_DAYS["noleap"]
_MONTH_DAYS["366_day"] = _MONTH_DAYS["all_leap"]


def month_lengths(calendar: str) -> list[int]:
    try:
        return _MONTH_DAYS[calendar]
    except KeyError:
        raise ValueError(
            f"unsupported CF calendar {calendar!r}; fixed-length calendars "
            f"only ({sorted(_MONTH_DAYS)}) — use TimestampType operators for "
            "gregorian/proleptic_gregorian") from None


def year_length(calendar: str) -> int:
    return sum(month_lengths(calendar))


def month_starts(calendar: str) -> list[int]:
    """Day-of-year (0-based) each month starts on."""
    out, acc = [], 0
    for d in month_lengths(calendar):
        out.append(acc)
        acc += d
    return out


def cf_components(day: Column, calendar: str) -> Column:
    """Decompose days-since-ref into struct(year, month, day, dayofyear).

    ``year`` is relative to the reference date's year (the reference must
    be a Jan-1 midnight, which is how the reference configs state it);
    ``month``/``day`` are 1-based; ``dayofyear`` is 0-based (fractional
    part preserved).  Mirrors ``cftime.num2date`` component math for
    fixed-length calendars.
    """
    ylen = year_length(calendar)
    starts = month_starts(calendar)
    yr = F.floor(day / ylen).cast("long")
    doy = day - yr * ylen
    m0 = F.lit(11)
    for m in range(10, -1, -1):  # month = last m with starts[m] <= doy
        m0 = F.when(doy < starts[m + 1], F.lit(m)).otherwise(m0)
    start_arr = F.array(*[F.lit(s) for s in starts])
    dom = doy - F.element_at(start_arr, m0.cast("int") + 1) + 1
    return F.struct(yr.alias("year"), (m0 + 1).cast("int").alias("month"),
                    dom.alias("day"), doy.alias("dayofyear"))


def cf_from_components(year: Column, month: Column, day: Column,
                       calendar: str) -> Column:
    """(year, month 1-based, day 1-based) → days since ref — the
    ``cftime.date2num`` mirror for fixed-length calendars."""
    ylen = year_length(calendar)
    start_arr = F.array(*[F.lit(s) for s in month_starts(calendar)])
    return year * ylen + F.element_at(start_arr, month.cast("int")) + (day - 1)


def cf_month_index(day: Column, calendar: str) -> Column:
    """Absolute month index since the reference date (floor)."""
    ylen = year_length(calendar)
    starts = month_starts(calendar)
    yr = F.floor(day / ylen).cast("long")
    doy = day - yr * ylen
    m0 = F.lit(11)
    for m in range(10, -1, -1):
        m0 = F.when(doy < starts[m + 1], F.lit(m)).otherwise(m0)
    return yr * 12 + m0


def cf_month_start_days(midx: Column, calendar: str) -> Column:
    """Month index → days-since-ref of that month's start."""
    ylen = year_length(calendar)
    start_arr = F.array(*[F.lit(s) for s in month_starts(calendar)])
    yr = F.floor(midx / 12).cast("long")
    m = (midx - yr * 12).cast("int")
    return (yr * ylen + F.element_at(start_arr, m + 1)).cast("double")


def cf_bin_edges(day: Column, calendar: str, every: str,
                 closed: str = "right") -> tuple[Column, Column]:
    """(bin_start_days, bin_end_days) for a days-since column — the CF
    analogue of operators/resample.bin_edges, same exact edge semantics:
    closed='right' puts a point exactly on an edge into the EARLIER bin.

    Units: day/week/month/year.  Sub-daily resampling of CF axes should
    convert fractional days to an integer sub-unit first — binning
    fractional doubles on sub-daily widths is an FP-edge hazard this
    operator refuses to paper over.
    """
    if closed not in ("left", "right"):
        raise ValueError("closed must be 'left' or 'right'")
    n, unit = parse_every(every)
    if unit in ("month", "year"):
        months = n * (12 if unit == "year" else 1)
        midx = cf_month_index(day, calendar)
        if closed == "right":
            on_edge = day == cf_month_start_days(midx, calendar)
            midx = F.when(on_edge, midx - 1).otherwise(midx)
        grid = F.floor(midx / months) * months
        return (cf_month_start_days(grid, calendar),
                cf_month_start_days(grid + months, calendar))
    if unit not in ("day", "week"):
        raise ValueError(
            f"CF bin unit must be day/week/month/year, got {unit!r}")
    width = n * (7 if unit == "week" else 1)
    if closed == "left":
        idx = F.floor(day / width)
        start = idx * width
    else:
        idx = -F.floor(-day / width)
        start = (idx - 1) * width
    return start.cast("double"), (start + width).cast("double")


def cf_label_days(bin_start: Column, calendar: str, every: str,
                  label: str = "middle", bin_end: Column | None = None) -> Column:
    """Label re-centring in days-since space, mirroring the reference's
    FIXED offsets (calculations.py:111-113): month → +15 d, year → +6
    calendar months, day/week → +half width."""
    if label == "left":
        return bin_start
    if label == "right":
        if bin_end is None:
            raise ValueError("label='right' needs bin_end")
        return bin_end
    if label != "middle":
        raise ValueError("label must be left|right|middle")
    n, unit = parse_every(every)
    if unit in ("month", "year"):
        months = n * (12 if unit == "year" else 1)
        if months % 2 == 0:
            # bin_start sits exactly on a month boundary, so its month
            # index needs no edge adjustment
            return cf_month_start_days(
                cf_month_index(bin_start, calendar) + months // 2, calendar)
        return bin_start + F.lit(15.0 * months)
    width = n * (7 if unit == "week" else 1)
    return bin_start + F.lit(width / 2.0)


def cf_time_resample(df: DataFrame, day_col: str, calendar: str, every: str,
                     aggs: list[Column], group_cols: list[str] | None = None,
                     closed: str = "right", label: str = "middle") -> DataFrame:
    """Downsample a CF days-since axis: tumbling-window groupBy, exactly
    the plan shape of operators/resample.time_resample — ONE shuffle on
    (group_cols, bin_start_days) with map-side partial aggregation; bin
    keys are plain doubles so the shuffle never touches calendar logic.
    Output: group_cols, bin_start_days, bin_end_days, <day_col> (label),
    aggs."""
    group_cols = list(group_cols or [])
    bs, be = cf_bin_edges(F.col(day_col), calendar, every, closed=closed)
    out = (
        df.withColumn("__bin_start", bs)
        .withColumn("__bin_end", be)
        .groupBy(*group_cols, "__bin_start", "__bin_end")
        .agg(*aggs)
    )
    lab = cf_label_days(F.col("__bin_start"), calendar, every, label=label,
                        bin_end=F.col("__bin_end"))
    return (
        out.withColumn(day_col, lab)
        .withColumnRenamed("__bin_start", "bin_start_days")
        .withColumnRenamed("__bin_end", "bin_end_days")
    )
