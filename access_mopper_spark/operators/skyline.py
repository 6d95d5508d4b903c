"""2-D skyline (Pareto frontier) as a distributed two-phase plan.

The skyline operator (Börzsönyi et al., ICDE 2001) returns the points
not dominated by any other — here minimize ``x``, maximize ``y``:
``p`` is dominated iff some ``q`` has ``x_q <= x_p`` and ``y_q >= y_p``
with at least one strict.  The naive formulation is an O(n²) self-join;
the 2-D case collapses to a prefix-max scan over x-sorted points, but a
single global sort is exactly the unpartitioned-window shape this repo
bans (one task owns the whole key table at scale).

Instead the same bucket-refinement used by
``aggregates.weighted_median_2phase``:

1. bucket x into ~``n_buckets`` ranges from a broadcast 1-row min/max
   (no collect);
2. per-bucket y-max (tiny table) → broadcast non-equi self-join gives
   each bucket the max y of all STRICTLY EARLIER buckets;
3. within a bucket, the running max over strictly-smaller x is a
   RANGE-framed window PARTITIONED by bucket (x is integer, so
   "strictly smaller" is the range frame ending at −1), and the
   same-x tie group max is a full-frame window over (bucket, x).

``keep ⇔ y > max(prefix, in-bucket running) ∧ y = same-x max`` —
equal (x, y) duplicates survive together (neither dominates).  Every
window is bucket-partitioned; the only broadcast is bucket-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, x_col: str, y_col: str,
               n_buckets: int = 1024) -> DataFrame:
    """Pareto frontier minimizing ``x_col``, maximizing ``y_col``.

    Both columns must be integer-valued (LONG) so strict comparisons
    and the range frame are exact.  Returns the input rows (all
    columns) that sit on the frontier.
    """
    x, y = F.col(x_col), F.col(y_col)
    span = df.agg(F.min(x).alias("__xmin"), F.max(x).alias("__xmax"))
    w_width = F.greatest(
        F.lit(1).cast("long"),
        ((F.col("__xmax") - F.col("__xmin")) / F.lit(n_buckets))
        .cast("long"))
    pts = (df.crossJoin(F.broadcast(span))
             .withColumn("__b", ((x - F.col("__xmin")) / w_width)
                         .cast("long"))
             .drop("__xmin", "__xmax"))

    bmax = pts.groupBy("__b").agg(F.max(y).alias("__bymax"))
    earlier = bmax.select(F.col("__b").alias("__b2"),
                          F.col("__bymax").alias("__by2"))
    prefix = (bmax.join(F.broadcast(earlier), F.col("__b2") < F.col("__b"),
                        "left")
                  .groupBy("__b")
                  .agg(F.max("__by2").alias("__premax")))

    w_run = (W.partitionBy("__b").orderBy(x.cast("long"))
              .rangeBetween(W.unboundedPreceding, -1))
    w_tie = W.partitionBy("__b", x)
    scored = (pts.join(F.broadcast(prefix), "__b")
                 .withColumn("__runmax", F.max(y).over(w_run))
                 .withColumn("__tiemax", F.max(y).over(w_tie)))
    dom = F.greatest(F.col("__premax"), F.col("__runmax"))
    keep = ((dom.isNull() | (y > dom)) & (y == F.col("__tiemax")))
    return (scored.where(keep)
                  .drop("__b", "__premax", "__runmax", "__tiemax"))
