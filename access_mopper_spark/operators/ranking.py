"""Distributed global ranking without a single-partition sort.

``row_number() OVER (ORDER BY x)`` with no PARTITION BY serializes the
whole table through one task — the unpartitioned-window shape this repo
bans (VERDICT r4 item 5).  ``global_rank`` computes the identical
1-based dense row numbering with the bucket-offset decomposition:

1. bucket the (integer) sort key into ~``n_buckets`` ranges from a
   broadcast 1-row min/max — no collect;
2. per-bucket counts (tiny table) → broadcast non-equi self-join gives
   each bucket the number of rows in STRICTLY EARLIER buckets (its
   rank offset);
3. within a bucket, ``row_number`` over a window PARTITIONED by the
   bucket, ordered by (key, *tiebreaks*).

``global rank = bucket offset + in-bucket row_number`` — exactly the
unpartitioned formulation's answer, with parallelism ~n_buckets in the
sort phase.  Tiebreak columns must make the order total or the rank is
nondeterministic (same contract as any ORDER BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def global_rank(df: DataFrame, key_col: str, tiebreaks: list[str],
                out_col: str = "rank", n_buckets: int = 1024) -> DataFrame:
    """Append ``out_col`` = 1-based global row number by
    (``key_col``, *tiebreaks*) ascending.  ``key_col`` must be
    integer-valued (LONG) so bucket boundaries are exact."""
    k = F.col(key_col)
    span = df.agg(F.min(k).alias("__kmin"), F.max(k).alias("__kmax"))
    width = F.greatest(
        F.lit(1).cast("long"),
        ((F.col("__kmax") - F.col("__kmin")) / F.lit(n_buckets))
        .cast("long"))
    pts = (df.crossJoin(F.broadcast(span))
             .withColumn("__b", ((k - F.col("__kmin")) / width).cast("long"))
             .drop("__kmin", "__kmax"))

    counts = pts.groupBy("__b").agg(F.count("*").alias("__bn"))
    earlier = counts.select(F.col("__b").alias("__b2"),
                            F.col("__bn").alias("__n2"))
    offsets = (counts.join(F.broadcast(earlier),
                           F.col("__b2") < F.col("__b"), "left")
                     .groupBy("__b")
                     .agg(F.sum(F.coalesce("__n2", F.lit(0)))
                          .alias("__off")))

    w = (W.partitionBy("__b")
          .orderBy(k, *[F.col(t) for t in tiebreaks]))
    return (pts.join(F.broadcast(offsets), "__b")
               .withColumn(out_col,
                           (F.col("__off") + F.row_number().over(w))
                           .cast("long"))
               .drop("__b", "__off"))
