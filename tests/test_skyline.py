"""skyline_2d: brute-force parity and dominance edge cases."""

import random

from pyspark.sql import functions as F

from access_mopper_spark.operators.skyline import skyline_2d


def _brute(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (bx <= x and by >= y and (bx < x or by > y))
            for j, (bx, by) in enumerate(points) if j != i)
        if not dominated:
            out.append((x, y))
    return sorted(out)


def _run(spark, points, n_buckets=8):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(points)], ["id", "x", "y"])
    df = df.select("id", F.col("x").cast("long"), F.col("y").cast("long"))
    got = skyline_2d(df, "x", "y", n_buckets=n_buckets).collect()
    return sorted((r["x"], r["y"]) for r in got)


def test_skyline_random_parity(spark):
    rng = random.Random(7)
    points = [(rng.randrange(0, 1000), rng.randrange(0, 1000))
              for _ in range(300)]
    assert _run(spark, points) == _brute(points)


def test_skyline_duplicates_survive_together(spark):
    # equal (x, y) twins: neither dominates; both stay
    points = [(10, 10), (10, 10), (5, 5), (20, 20)]
    got = _run(spark, points)
    assert got == [(5, 5), (10, 10), (10, 10), (20, 20)]


def test_skyline_same_x_keeps_only_max_y(spark):
    points = [(10, 1), (10, 9), (11, 9)]
    # (10,9) dominates (10,1) (same x, higher y) and (11,9) (cheaper, same y)
    assert _run(spark, points) == [(10, 9)]


def test_skyline_degenerate_single_value(spark):
    # all points identical: zero x-span exercises the width>=1 guard
    points = [(7, 3)] * 5
    assert _run(spark, points) == [(7, 3)] * 5


def test_skyline_bucket_count_invariance(spark):
    rng = random.Random(11)
    points = [(rng.randrange(0, 50), rng.randrange(0, 50))
              for _ in range(120)]
    assert _run(spark, points, n_buckets=1) \
        == _run(spark, points, n_buckets=64) == _brute(points)
