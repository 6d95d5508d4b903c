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


def skew_profile(df: DataFrame, key_cols: list[str],
                 top_n: int = 20, n_rows: int | None = None) -> DataFrame:
    """Heavy-key diagnostic for join/aggregation planning — the report
    read before choosing broadcast vs salting vs AQE skew-join: for
    each candidate key column, the ``top_n`` heaviest keys with count,
    basis-point share, and rank.

    Returns ``(col_name, key_value, cnt, share_bp, rank)`` — key values
    cast to string so one tidy frame covers heterogeneous key types;
    share_bp = FLOOR(cnt·10000/n_rows) is integer-exact (no float in
    the hash surface); ties break (cnt DESC, key_value ASC).

    Scale shape: ALL columns profile in ONE pass and ONE shuffle — the
    (col_name, key_value) pairs explode map-side (×|key_cols| row
    multiplier, like Expand), the grouped count combines map-side, and
    the per-column top-n runs through ``partial_topk`` (local top-n per
    physical partition, then a ≤ n·p merge) — never a full sort, never
    a per-column re-scan.  NULL keys are real rows (a NULL-heavy join
    key is exactly what this report must surface) and profile as the
    string sentinel '<NULL>'."""
    from access_mopper_spark.operators.similarity import partial_topk

    # the per-column denominator is CONSTANT: every base row emits
    # exactly one (col, value) pair per profiled column (NULLs
    # included), so total-per-column = |df|.  NOTE: when ``n_rows`` is
    # not supplied this runs an EAGER df.count() at call time — free
    # (footer-stats only) when df is a raw parquet scan, but a full
    # extra pass when df carries upstream filters/joins (r8 ADVICE);
    # callers profiling a derived frame should pass a precomputed
    # ``n_rows``.  The profile itself then costs exactly one scan + one
    # shuffle (a derived-totals branch would duplicate the scan subtree
    # instead: dedup attribute rewriting defeats exchange reuse across
    # self-join branches).
    if n_rows is None:
        n_rows = df.count()
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
                 .alias("key_value"))
        for c in key_cols])).alias("kv")) \
        .select("kv.col_name", "kv.key_value")
    counts = pairs.groupBy("col_name", "key_value").agg(
        F.count("*").alias("cnt"))
    top = partial_topk(counts, ["col_name"],
                       [F.col("cnt").desc(), F.col("key_value").asc()],
                       top_n)
    return top.select(
        "col_name", "key_value", "cnt",
        F.floor(F.col("cnt") * 10000 / F.lit(n_rows)).cast("long")
        .alias("share_bp"),
        F.col("rank").cast("long").alias("rank"))
