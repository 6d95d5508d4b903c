"""Distributed prefix sums over value grids — the two-phase pattern
behind q_pareto_class / q_lorenz_curve, factored for reuse.

A cumulative sum ordered by one column is the classic single-reducer
trap: ``SUM(x) OVER (ORDER BY v)`` with no partition spec serializes the
whole input through one task (and trips the repo's plan audit).  The
scale-correct shape for a *grid* frame (one row per distinct value —
domain-bounded or at worst distinct-value-bounded, never raw-corpus
row count) is:

1. bucket the order column's range into ``n_buckets`` contiguous slices
   (min/max from a broadcast 1-row aggregate);
2. run the cumulative window PARTITIONED by bucket (parallel, each
   bucket a ~1/n_buckets slice of the grid);
3. add each bucket's exclusive offset — the sum of all earlier buckets'
   totals — via a broadcast triangular self-join over the ≤ n_buckets
   bucket-total rows.

The result equals the global cumulative exactly (integer inputs sum
exactly in any order), with max parallelism n_buckets and no stage that
scales worse than |grid| / n_buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def bucketed_prefix(grid: DataFrame, order_col: str, sum_cols: list[str],
                    n_buckets: int = 256) -> DataFrame:
    """Append inclusive prefix sums ``cum_<c>`` for each ``c`` in
    ``sum_cols``, ordered by numeric ``order_col``, to a grid frame.

    ``order_col`` must be numeric and unique per row (a grid key).
    Sum columns should be integral so partial sums are order-free.
    """
    st = grid.agg(F.max(order_col).alias("__mx"),
                  F.min(order_col).alias("__mn"))
    b = grid.crossJoin(F.broadcast(st)).withColumn(
        "__bk", F.least(
            ((F.col(order_col) - F.col("__mn")) * n_buckets
             / (F.col("__mx") - F.col("__mn") + 1)).cast("long"),
            F.lit(n_buckets - 1)))
    wrun = (W.partitionBy("__bk").orderBy(order_col)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = b
    for c in sum_cols:
        run = run.withColumn(f"__run_{c}", F.sum(c).over(wrun))
    bt = run.groupBy("__bk").agg(
        *[F.sum(c).alias(f"__bt_{c}") for c in sum_cols])
    off = (bt.alias("a")
             .join(F.broadcast(bt.select(
                 F.col("__bk").alias("__bk2"),
                 *[F.col(f"__bt_{c}").alias(f"__bt2_{c}")
                   for c in sum_cols])),
                   F.col("__bk2") < F.col("a.__bk"), "left")
             .groupBy("a.__bk")
             .agg(*[F.sum(F.coalesce(f"__bt2_{c}", F.lit(0)))
                    .alias(f"__off_{c}") for c in sum_cols]))
    out = run.join(F.broadcast(off), "__bk")
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}",
            F.coalesce(f"__off_{c}", F.lit(0)) + F.col(f"__run_{c}"))
    drop = (["__bk", "__mx", "__mn"]
            + [f"__run_{c}" for c in sum_cols]
            + [f"__off_{c}" for c in sum_cols])
    return out.drop(*drop)
