"""Invariant tests for the round-5 time-series analytics batch:
rolling distinct users, lag-1 autocorrelation, truncated EWMA,
frequency dictionary encoding.  Each checks a mathematical property a
hash comparison can't express (bounds, monotonicity, permutation)."""

import pytest
from pyspark.sql import functions as F

from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_rolling_distinct_dominates_daily(spark):
    """users_7d on day d must be >= the exact 1-day distinct for d (the
    window contains the day) and <= total distinct users (it is a
    subset of everyone)."""
    # the registry ships `day` as midnight timestamp (round-8 DATE
    # rendering canonicalization, queries._apply_spark_date_casts) —
    # normalize back to date for the key comparison
    # native DATE since r9 (the DATE-seam adjudication): the cell
    # is already a datetime.date, no midnight-TIMESTAMP unwrap
    roll = {r["day"]: r["users_7d"]
            for r in QUERIES["q_rolling_distinct_users"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    daily = {r["day"]: r["n"] for r in ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.countDistinct("user_id").alias("n")).collect()}
    total = ev.select("user_id").distinct().count()
    assert set(daily) == set(roll)
    for d, n7 in roll.items():
        assert daily[d] <= n7 <= total


def test_rolling_distinct_window_is_union(spark):
    """Spot-check one day against a brute-force union of its 7-day
    membership computed independently."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ud = ev.select("user_id",
                   F.to_date(F.date_trunc("day", "ts")).alias("d")).distinct()
    days = sorted(r["d"] for r in ud.select("d").distinct().collect())
    target = days[len(days) // 2]
    brute = (ud.where((F.col("d") <= F.lit(target))
                      & (F.col("d") >= F.date_sub(F.lit(target), 6)))
               .select("user_id").distinct().count())
    # native DATE since r9 (the DATE-seam adjudication): the cell
    # is already a datetime.date, no midnight-TIMESTAMP unwrap
    roll = {r["day"]: r["users_7d"]
            for r in QUERIES["q_rolling_distinct_users"](spark, SF).collect()}
    assert roll[target] == brute


def test_autocorr_in_unit_interval(spark):
    rows = QUERIES["q_autocorr_lag1"](spark, SF).collect()
    assert rows
    for r in rows:
        if r["acf1"] is not None:
            assert -1.0 - 1e-9 <= r["acf1"] <= 1.0 + 1e-9
        assert r["n_pairs"] >= 1


def test_ewma_bounded_by_window_extremes(spark):
    """A convex combination of the window's counts lies within the
    window's [min, max] — check against an independently computed band
    join."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    daily = ev.groupBy("event_type",
                       F.to_date(F.date_trunc("day", "ts")).alias("d")) \
        .agg(F.count("*").alias("n"))
    b = daily.select(F.col("event_type").alias("et"),
                     F.col("d").alias("db"), "n")
    band = (daily.select("event_type", F.col("d").alias("da"))
            .join(b, (F.col("event_type") == F.col("et"))
                  & (F.col("db") >= F.date_sub(F.col("da"), 13))
                  & (F.col("db") <= F.col("da")))
            .groupBy("event_type", F.col("da").alias("day"))
            .agg(F.min("n").alias("lo"), F.max("n").alias("hi")))
    got = QUERIES["q_ewma_daily"](spark, SF)
    joined = got.join(band, ["event_type", "day"]).collect()
    assert joined
    for r in joined:
        assert r["lo"] - 1e-6 <= r["ewma14"] <= r["hi"] + 1e-6


def test_dict_encode_is_permutation(spark):
    """Codes are exactly 1..n with no gaps/duplicates, ordered by
    (count desc, source)."""
    rows = QUERIES["q_dict_encode"](spark, SF).collect()
    codes = sorted(r["code"] for r in rows)
    assert codes == list(range(1, len(rows) + 1))
    by_code = sorted(rows, key=lambda r: r["code"])
    for a, b in zip(by_code, by_code[1:]):
        assert (a["cnt"], b["source"] or "") >= (b["cnt"], a["source"] or "") \
            or a["cnt"] > b["cnt"]
        # frequency never increases with code
        assert a["cnt"] >= b["cnt"]
