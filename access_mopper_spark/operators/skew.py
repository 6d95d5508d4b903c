"""Skew mitigation: salted two-stage aggregation.

At 100 TB a handful of hot keys (a popular user, a default timestamp, a
null-ish sentinel) can put one reducer orders of magnitude behind the
rest.  AQE's skew-join splitting covers joins; for aggregations the
classic fix is salting: shard each key across ``n_salts`` partial groups,
aggregate the shards map-side, then combine shards in a second (tiny)
aggregation.  Correct for any algebraic aggregate (sum/count/min/max and
mean via sum+count).

Spark's partial aggregation already does this implicitly for simple
cases; the explicit form matters when the per-key partial state is large
(collect_set-like, HLL sketches) or the grouping feeds a window — and it
makes the skew story testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum": F.sum, "count": "count", "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, keys: list[str], value_col: str, n_salts: int = 16,
               aggs: tuple[str, ...] = ("sum", "count", "min", "max")) -> DataFrame:
    """Two-stage salted aggregation of ``value_col`` by ``keys``.

    Stage 1 groups on (keys, salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 merges the shards per key: sum of sums,
    sum of counts, min of mins, max of maxes (mean = sum/count).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value_col).alias("__s"), F.count(value_col).alias("__c"),
             F.min(value_col).alias("__mn"), F.max(value_col).alias("__mx"))
    )
    out = stage1.groupBy(*keys).agg(
        F.sum("__s").alias("sum"), F.sum("__c").alias("count"),
        F.min("__mn").alias("min"), F.max("__mx").alias("max"),
    )
    return out.withColumn("mean", F.col("sum") / F.col("count")) \
              .select(*keys, *[a for a in aggs if a in ("sum", "count", "min", "max")], "mean")


def explode_salt_join(big: DataFrame, small: DataFrame, key: str,
                      n_salts: int = 8) -> DataFrame:
    """Skewed equi-join: salt the big side's key, replicate the small side
    across every salt, join on (key, salt) — the hot key's rows land on
    ``n_salts`` reducers instead of one.  (AQE skew-join does this
    adaptively for sort-merge joins; the explicit form works everywhere,
    e.g. under a window or when the skew is known up front.)"""
    b = big.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                                        F.lit(n_salts)))
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return b.join(s, [key, "__salt"]).drop("__salt")
