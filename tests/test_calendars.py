"""CF fixed-length calendar math vs a pure-Python cftime mirror.

cftime itself is not in this container, so the oracle here is a direct
reimplementation of its fixed-length-calendar component math (trivial
modular arithmetic — 360_day/noleap years are all identical), which is
exactly what cftime.num2date/date2num reduce to for these calendars.
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from access_mopper_spark.functions.calendars import (
    cf_components,
    cf_from_components,
    cf_time_resample,
    month_lengths,
    month_starts,
    year_length,
)


def py_num2comp(day: float, calendar: str):
    """Pure-Python mirror of cftime component math (fixed-length cals)."""
    ylen = year_length(calendar)
    yr = int(day // ylen)
    doy = day - yr * ylen
    starts = month_starts(calendar)
    m = max(i for i in range(12) if starts[i] <= doy)
    return yr, m + 1, doy - starts[m] + 1, doy


def py_comp2num(yr: int, month: int, day: float, calendar: str) -> float:
    return yr * year_length(calendar) + month_starts(calendar)[month - 1] + (day - 1)


CALS = ["360_day", "noleap", "all_leap"]


@pytest.mark.parametrize("calendar", CALS)
def test_components_match_python_mirror(spark, calendar):
    days = [0.0, 1.0, 29.0, 30.0, 31.0, 58.5, 59.0, 60.0, 360.0, 364.0,
            365.0, 366.0, 719.25, 730.0, -1.0, -30.0, -365.0, 3650.5]
    df = spark.createDataFrame([(d,) for d in days], ["t"])
    got = df.select("t", cf_components(F.col("t"), calendar).alias("c")) \
            .select("t", "c.year", "c.month", "c.day", "c.dayofyear").collect()
    for row in got:
        yr, m, dom, doy = py_num2comp(row["t"], calendar)
        assert (row["year"], row["month"]) == (yr, m), (calendar, row["t"])
        assert row["day"] == pytest.approx(dom)
        assert row["dayofyear"] == pytest.approx(doy)


@settings(max_examples=20, deadline=None)
@given(day=st.integers(min_value=-40_000, max_value=40_000),
       frac=st.sampled_from([0.0, 0.25, 0.5]),
       calendar=st.sampled_from(CALS))
def test_roundtrip_property(spark, day, frac, calendar):
    t = day + frac
    df = spark.createDataFrame([(t,)], ["t"])
    back = df.select(
        cf_components(F.col("t"), calendar).alias("c")
    ).select(
        cf_from_components(F.col("c.year"), F.col("c.month"), F.col("c.day"),
                           calendar).alias("t2")
    ).first()["t2"]
    assert back == pytest.approx(t)


def test_360day_monthly_resample_edges(spark):
    # closed='right': day exactly on a month start (e.g. 60.0 = Mar 1)
    # belongs to the EARLIER month; 60.25 opens March.
    rows = [(0.5, 1.0), (29.0, 2.0), (30.0, 3.0),  # 30.0 → Jan (on edge)
            (30.25, 4.0), (60.0, 5.0), (60.25, 6.0)]
    df = spark.createDataFrame(rows, ["t", "v"])
    got = cf_time_resample(df, "t", "360_day", "1 month",
                           [F.sum("v").alias("v")], closed="right",
                           label="left").orderBy("bin_start_days").collect()
    assert [(r["bin_start_days"], r["v"]) for r in got] == [
        (0.0, 6.0),    # 0.5, 29.0, 30.0
        (30.0, 9.0),   # 30.25, 60.0
        (60.0, 6.0),
    ]


def test_noleap_monthly_label_plus_15d(spark):
    # Feb of a noleap year is 28 days; the reference still labels +15 d
    df = spark.createDataFrame([(32.0, 1.0), (40.0, 2.0)], ["t", "v"])  # Feb
    got = cf_time_resample(df, "t", "noleap", "1 month",
                           [F.sum("v").alias("v")], label="middle").collect()
    assert got[0]["bin_start_days"] == 31.0
    assert got[0]["t"] == pytest.approx(46.0)  # 31 + 15, not 31 + 14


def test_noleap_yearly_label_plus_6_months(spark):
    df = spark.createDataFrame([(400.0, 1.0)], ["t", "v"])
    got = cf_time_resample(df, "t", "noleap", "1 year",
                           [F.sum("v").alias("v")], label="middle").collect()
    assert got[0]["bin_start_days"] == 365.0
    # +6 calendar months from Jan 1 = Jul 1 = 181 days into a noleap year
    assert got[0]["t"] == pytest.approx(365.0 + 181.0)


def test_month_tables():
    assert year_length("360_day") == 360
    assert year_length("noleap") == 365
    assert year_length("all_leap") == 366
    assert month_lengths("365_day") == month_lengths("noleap")
    with pytest.raises(ValueError):
        month_lengths("julian")
