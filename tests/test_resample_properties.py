"""Property-based tests (hypothesis) for resample bin-edge semantics —
SURVEY §7.3 calls bin-edge fidelity the top correctness risk, so the
invariants are fuzzed rather than spot-checked:

- partition: every point belongs to exactly one bin
- closed-right: bin_start < t <= bin_end; a point on an edge closes the
  EARLIER bin (the reference's resample(closed='right'))
- width: fixed-unit bins are exactly n·unit wide; month bins start on
  month boundaries
- label: 'middle' is the exact midpoint of the bin
"""

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from access_mopper_spark.operators.resample import bin_edges

BASE = datetime(2001, 1, 1)

ts_lists = st.lists(
    st.integers(min_value=0, max_value=400 * 24 * 3600),  # seconds over ~13 months
    min_size=1, max_size=40, unique=True,
)
widths = st.sampled_from(["1 hour", "3 hours", "1 day", "2 days",
                          "1 month", "2 months", "1 year"])


def edges_for(spark, seconds, every, closed):
    df = spark.createDataFrame(
        [(BASE + timedelta(seconds=s),) for s in seconds], ["t"])
    bs, be = bin_edges(F.col("t"), every, closed=closed,
                       origin="2001-01-01 00:00:00")
    return df.select("t", bs.alias("s"), be.alias("e")).collect()


@settings(max_examples=12, deadline=None)
@given(secs=ts_lists, every=widths)
def test_closed_right_membership(spark, secs, every):
    for r in edges_for(spark, secs, every, "right"):
        assert r["s"] < r["t"] <= r["e"], (r, every)


@settings(max_examples=12, deadline=None)
@given(secs=ts_lists, every=widths)
def test_closed_left_membership(spark, secs, every):
    for r in edges_for(spark, secs, every, "left"):
        assert r["s"] <= r["t"] < r["e"], (r, every)


@settings(max_examples=8, deadline=None)
@given(secs=ts_lists, every=st.sampled_from(["1 hour", "1 day", "2 days"]))
def test_fixed_width_exact(spark, secs, every):
    n, unit = every.split()
    width = timedelta(**{unit.rstrip("s") + "s": int(n)})
    for r in edges_for(spark, secs, every, "right"):
        assert r["e"] - r["s"] == width
        # grid-aligned to the origin
        assert (r["s"] - BASE) % width == timedelta(0)


@settings(max_examples=8, deadline=None)
@given(secs=ts_lists, every=st.sampled_from(["1 month", "2 months", "1 year"]))
def test_month_bins_start_on_month_boundaries(spark, secs, every):
    for r in edges_for(spark, secs, every, "right"):
        assert r["s"].day == 1 and r["s"].hour == 0 and r["s"].minute == 0
        assert r["e"].day == 1 and r["e"].hour == 0
        # edge membership: a point exactly on a bin-closing month start
        # belongs to the earlier bin
        if (r["t"].day == 1 and r["t"].hour == 0 and r["t"].minute == 0
                and r["t"].second == 0 and every == "1 month"):
            assert r["e"] == r["t"]


def test_on_edge_point_closes_earlier_bin(spark):
    rows = edges_for(spark, [86400], "1 day", "right")  # exactly midnight day 2
    assert rows[0]["e"] == BASE + timedelta(days=1)
    assert rows[0]["s"] == BASE


# ---------------------------------------------------------- as-of join

asof_pairs = st.tuples(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15,
             unique=True),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15,
             unique=True),
)


@settings(max_examples=10, deadline=None)
@given(pair=asof_pairs)
def test_asof_backward_matches_bruteforce(spark, pair):
    from access_mopper_spark.operators.asof import asof_join
    lsecs, rsecs = pair
    left = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(lsecs)],
        ["lid", "lt"]).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(rsecs)],
        ["rid", "rt"]).withColumn("k", F.lit(1))
    out = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt",
                    right_values=["rid"], direction="backward",
                    tiebreak=["rid"])
    got = {r["lid"]: r["rid"] for r in out.collect()}
    for i, s in enumerate(lsecs):
        cands = [(rs, j) for j, rs in enumerate(rsecs) if rs <= s]
        want = max(cands)[1] if cands else None
        assert got.get(i) == want, (s, sorted(rsecs))


@settings(max_examples=10, deadline=None)
@given(pair=asof_pairs)
def test_asof_forward_matches_bruteforce(spark, pair):
    from access_mopper_spark.operators.asof import asof_join
    lsecs, rsecs = pair
    left = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(lsecs)],
        ["lid", "lt"]).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(rsecs)],
        ["rid", "rt"]).withColumn("k", F.lit(1))
    out = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt",
                    right_values=["rid"], direction="forward",
                    tiebreak=["rid"])
    got = {r["lid"]: r["rid"] for r in out.collect()}
    for i, s in enumerate(lsecs):
        cands = [(rs, j) for j, rs in enumerate(rsecs) if rs >= s]
        # forward nearest: smallest rt >= lt; tiebreak keeps the LAST in
        # descending (rid) order, i.e. the smallest rid — min() matches
        want = min(cands)[1] if cands else None
        assert got.get(i) == want, (s, sorted(rsecs))


def test_range_join_count_semantics(spark):
    # regression (ADVICE r1): the operator now aggregates an in-range COUNT
    # per left row, with 0 for both no-key-match and all-out-of-range lefts.
    from access_mopper_spark.operators.asof import range_join_count
    left = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 500), ("b", 3, 100), ("c", 4, 100)],
        ["k", "lid", "pt"])
    right = spark.createDataFrame(
        [("a", 95), ("a", 108), ("a", 400), ("b", 900)], ["k", "rp"])
    out = range_join_count(left, right, on=["k"],
                           left_point=F.col("pt"), right_point=F.col("rp"),
                           radius_expr="10", left_keys=["k", "lid"])
    got = {r["lid"]: r["n_in_range"] for r in out.collect()}
    # lid=1: 95 and 108 in [90,110] -> 2; lid=2: none of a's in [490,510] -> 0
    # lid=3: b's 900 out of range -> 0; lid=4: key c unmatched -> 0
    assert got == {1: 2, 2: 0, 3: 0, 4: 0}
    assert out.schema["n_in_range"].dataType.simpleString() == "bigint"
