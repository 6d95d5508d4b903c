"""Invariants for the round-5 statistics/cohort batch: trimmed mean,
chi-square decomposition, path n-grams, LTV cohort curves."""

from collections import defaultdict

from pyspark.sql import functions as F

from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_trimmed_mean_between_bounds(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    stats = {r["event_type"]: r for r in ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.1)").alias("lo"),
        F.expr("percentile(value, 0.9)").alias("hi"),
        F.count("value").alias("n")).collect()}
    for r in QUERIES["q_trimmed_mean"](spark, SF).collect():
        s = stats[r["event_type"]]
        assert s["lo"] - 1e-9 <= r["trimmed_mean"] <= s["hi"] + 1e-9
        # trimming removes at most ~20% (plus ties keep more)
        assert r["n_kept"] >= 0.75 * s["n"]


def test_chi_square_nonnegative_and_counts(spark):
    rows = QUERIES["q_chi_square"](spark, SF).collect()
    ev_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n_obs"] for r in rows) == ev_n
    for r in rows:
        assert r["chi2_part"] >= 0


def test_path_ngrams_shape(spark):
    rows = QUERIES["q_path_ngrams"](spark, SF).collect()
    assert rows
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= 3


def test_ltv_cumulative_monotone(spark):
    rows = QUERIES["q_ltv_cohorts"](spark, SF).collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_month"]].append(r)
    total = sum(r["rev_cents"] for r in rows)
    # cents total reconciles with a direct scan
    od = spark.read.parquet(f"{SF}/orders.parquet")
    direct = od.select(F.sum(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .alias("s")).collect()[0]["s"]
    assert total == direct
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["month_offset"])
        cum = 0
        for r in rs:
            cum += r["rev_cents"]
            assert r["cum_rev_cents"] == cum


def test_twap_within_value_bounds(spark):
    """A convex (time-weighted) combination lies within the per-type
    min/max of the contributing values."""
    from access_mopper_spark.sources.readers import load_table

    ev = load_table(spark, SF, "events")
    cents = F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100
                    + F.lit(0.5)).cast("long")
    bounds = {r["event_type"]: r for r in ev.groupBy("event_type").agg(
        (F.min(cents) / 100.0).alias("lo"),
        (F.max(cents) / 100.0).alias("hi")).collect()}
    for r in QUERIES["q_time_weighted_avg"](spark, SF).collect():
        b = bounds[r["event_type"]]
        assert b["lo"] - 1e-6 <= r["twap"] <= b["hi"] + 1e-6
        assert r["total_us"] > 0 and r["n_intervals"] > 0


def test_percent_of_parent_shares_sum_to_one(spark):
    from collections import defaultdict

    rows = QUERIES["q_percent_of_parent"](spark, SF).collect()
    by_region = defaultdict(list)
    for r in rows:
        by_region[r["regionkey"]].append(r)
    region_shares = {}
    for rk, rs in by_region.items():
        assert abs(sum(x["share_of_region"] for x in rs) - 1.0) < 1e-4
        assert sum(x["nation_cents"] for x in rs) == rs[0]["region_cents"]
        region_shares[rk] = rs[0]["region_share_of_total"]
    assert abs(sum(region_shares.values()) - 1.0) < 1e-4


def test_survival_curve_monotone_nonincreasing(spark):
    rows = sorted(QUERIES["q_survival_km"](spark, SF).collect(),
                  key=lambda r: r["day"])
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= prev + 1e-9
        prev = r["survival"]
        assert r["n_events"] <= r["n_risk"]
    # risk set shrinks along the axis
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_token_entropy_bounds(spark):
    import math

    for r in QUERIES["q_token_entropy"](spark, SF).collect():
        # 0 <= H <= ln(n_types)
        assert -1e-9 <= r["entropy_nats"] \
            <= math.log(max(r["n_types"], 1)) + 1e-6
        assert r["n_types"] <= r["n_tokens"]
