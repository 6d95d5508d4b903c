"""Bin-edge fidelity tests for time_resample — the reference's exact
closed-right / origin semantics (calculations.py:68-137) checked against
pandas.resample, which is the behavior the reference relies on."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from access_mopper_spark.operators.resample import (
    start_day_origin,
    time_interpolate,
    time_resample,
)


@pytest.fixture(scope="module")
def series(spark):
    # irregular-ish but deterministic series incl. points exactly on edges
    ts = pd.date_range("2024-01-01", periods=500, freq="17min")
    pdf = pd.DataFrame({"time": ts, "value": [float(i % 37) for i in range(500)]})
    return spark.createDataFrame(pdf), pdf


@pytest.mark.parametrize("every,rule", [("1 hour", "1h"), ("1 day", "1D"), ("3 hours", "3h")])
@pytest.mark.parametrize("closed", ["left", "right"])
def test_fixed_width_matches_pandas(spark, series, every, rule, closed):
    df, pdf = series
    got = (
        time_resample(df, "time", every, [F.mean("value").alias("v")],
                      closed=closed, label="left")
        .orderBy("time")
        .toPandas()
    )
    exp = (
        pdf.set_index("time")["value"]
        .resample(rule, closed=closed, label="left", origin="epoch")
        .mean()
        .dropna()
    )
    assert len(got) == len(exp)
    assert list(got["time"]) == list(exp.index)
    assert got["v"].tolist() == pytest.approx(exp.values.tolist())


@pytest.mark.parametrize("closed", ["left", "right"])
def test_monthly_matches_pandas(spark, closed):
    ts = pd.date_range("2023-11-15", periods=200, freq="31h")
    pdf = pd.DataFrame({"time": ts, "value": [float(i) for i in range(200)]})
    df = spark.createDataFrame(pdf)
    got = (
        time_resample(df, "time", "1 month", [F.sum("value").alias("v")],
                      closed=closed, label="left")
        .orderBy("time").toPandas()
    )
    exp = (
        pdf.set_index("time")["value"]
        .resample("MS", closed=closed, label="left")
        .sum()
    )
    exp = exp[exp != 0.0].dropna()
    assert list(got["time"]) == list(exp.index)
    assert got["v"].tolist() == pytest.approx(exp.values.tolist())


def test_edge_point_goes_to_earlier_bin_closed_right(spark):
    pdf = pd.DataFrame({
        "time": [pd.Timestamp("2024-01-01 01:00:00"), pd.Timestamp("2024-01-01 01:00:00.000001")],
        "value": [1.0, 2.0],
    })
    df = spark.createDataFrame(pdf)
    got = time_resample(df, "time", "1 hour", [F.sum("value").alias("v")],
                        closed="right", label="left").orderBy("time").toPandas()
    # 01:00:00 exactly → bin (00:00, 01:00]; the +1us point → (01:00, 02:00]
    assert got["v"].tolist() == [1.0, 2.0]


def test_start_day_origin(spark, series):
    df, pdf = series
    assert start_day_origin(df, "time") == "2024-01-01 00:00:00"


def test_label_middle_recentres(spark, series):
    df, _ = series
    got = time_resample(df, "time", "1 day", [F.count("*").alias("n")],
                        closed="right", label="middle").orderBy("time").toPandas()
    assert got["time"].iloc[0].hour == 12  # day label recentred by +12h


def test_label_middle_monthly_fixed_15d(spark):
    # reference pins the monthly label at bin_start + 15 DAYS regardless of
    # month length (calculations.py:111-113 'M'→[15,'D']): February bins get
    # +15 d too, NOT +14 d (half of 28).
    pdf = pd.DataFrame({
        "time": pd.to_datetime(["2023-02-03", "2023-02-20", "2023-03-05"]),
        "value": [1.0, 2.0, 3.0],
    })
    df = spark.createDataFrame(pdf)
    got = time_resample(df, "time", "1 month", [F.sum("value").alias("v")],
                        closed="right", label="middle").orderBy("bin_start").toPandas()
    assert list(got["time"]) == [pd.Timestamp("2023-02-16"), pd.Timestamp("2023-03-16")]


def test_label_middle_yearly_plus_6_months(spark):
    # 'Y' → [6, 'M']: yearly label = Jan 1 + 6 calendar months = Jul 1,
    # not half of 365 days (Jul 2 12:00).
    pdf = pd.DataFrame({"time": pd.to_datetime(["2023-04-01", "2023-09-01"]),
                        "value": [1.0, 2.0]})
    df = spark.createDataFrame(pdf)
    got = time_resample(df, "time", "1 year", [F.sum("value").alias("v")],
                        closed="right", label="middle").toPandas()
    assert list(got["time"]) == [pd.Timestamp("2023-07-01")]


def test_time_interpolate_linear(spark):
    pdf = pd.DataFrame({
        "time": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 02:00"]),
        "value": [0.0, 4.0],
    })
    df = spark.createDataFrame(pdf)
    got = time_interpolate(df, "time", "value", "30 minutes").orderBy("time").toPandas()
    assert got["value"].tolist() == pytest.approx([0.0, 1.0, 2.0, 3.0, 4.0])


def test_time_interpolate_align_short_span_no_crash(spark):
    # regression (ADVICE r1): a group spanning less than one step leaves the
    # epoch-aligned __t0 past __t1; sequence(start, stop, +step) used to
    # throw and fail the whole job. Now the group yields no grid points
    # while other groups are unaffected.
    pdf = pd.DataFrame({
        "g": ["short", "short", "ok", "ok"],
        "time": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:20",
                                "2024-01-01 00:30", "2024-01-01 02:30"]),
        "value": [1.0, 2.0, 0.0, 4.0],
    })
    df = spark.createDataFrame(pdf)
    got = time_interpolate(df, "time", "value", "1 hour",
                           group_cols=["g"], align=True).orderBy("g", "time").toPandas()
    assert got[got["g"] == "short"].empty
    assert got[got["g"] == "ok"]["value"].tolist() == pytest.approx([1.0, 3.0])


def test_time_interpolate_month_grid(spark):
    # calendar-unit upsample: quarterly obs -> month-start grid, linear
    pdf = pd.DataFrame({
        "time": pd.to_datetime(["2024-01-01", "2024-04-01"]),
        "value": [0.0, 91.0],  # 91 days apart -> value == day offset
    })
    df = spark.createDataFrame(pdf)
    got = time_interpolate(df, "time", "value", "1 month", align=True) \
        .orderBy("time").toPandas()
    assert list(got["time"]) == list(pd.to_datetime(
        ["2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"]))
    assert got["value"].tolist() == pytest.approx([0.0, 31.0, 60.0, 91.0])


def test_time_interpolate_month_align_snaps_up(spark):
    pdf = pd.DataFrame({
        "time": pd.to_datetime(["2024-01-15", "2024-03-20"]),
        "value": [0.0, 65.0],  # 65 days apart -> value == day offset
    })
    df = spark.createDataFrame(pdf)
    got = time_interpolate(df, "time", "value", "1 month", align=True) \
        .orderBy("time").toPandas()
    assert list(got["time"]) == list(pd.to_datetime(["2024-02-01", "2024-03-01"]))
    assert got["value"].tolist() == pytest.approx([17.0, 46.0])
