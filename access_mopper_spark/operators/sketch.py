"""Mergeable frequency sketching: count-min sketch (CMS) over a term
column — approximate per-term counts in fixed memory, the streaming/
distributed answer to "how often does each of billions of tokens occur"
when an exact groupBy's key cardinality is itself the problem.

Properties (Cormode & Muthukrishnan 2005): estimate ≥ true count always
(one-sided error); overestimate ≤ εN with probability 1−δ for
width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.

Scale design:
- build = one explode (depth rows per term occurrence) + one
  map-side-combined count on (row, bucket) — the sketch is depth×width
  rows TOTAL regardless of corpus size, so it broadcasts for estimation
  and merges across corpora/partitions by simple addition.
- hashes are md5 lanes mod width (engine-portable, oracle-replayable);
  production can swap xxhash64 for pure-codegen hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(term, d: int, width: int, salt: str):
    digest = F.md5(F.concat(F.lit(f"{salt}{d}:"), term))
    return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
            % F.lit(width)).alias("bucket")


def cms_build(terms_df: DataFrame, term_col: str = "term",
              depth: int = 4, width: int = 1024,
              salt: str = "cms") -> DataFrame:
    """Build a count-min sketch from a (multiset) term column: returns
    ``(d, bucket, cnt)`` — depth×width counters.  One explode + one
    shuffle on uniformly-hashed (d, bucket) keys; partial aggregation
    does the heavy counting map-side."""
    pairs = terms_df.select(F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 _bucket(F.col(term_col), d, width, salt))
        for d in range(depth)])).alias("__c")) \
        .select("__c.d", "__c.bucket")
    return pairs.groupBy("d", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(sketch: DataFrame, terms_df: DataFrame,
                 term_col: str = "term", depth: int = 4, width: int = 1024,
                 salt: str = "cms") -> DataFrame:
    """Estimate each distinct term's count: min over the depth rows of
    its bucket counters.  The sketch is tiny (depth×width) → broadcast
    join; the term side stays distributed and map-only."""
    probes = terms_df.select(term_col).distinct().select(
        term_col, F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     _bucket(F.col(term_col), d, width, salt))
            for d in range(depth)])).alias("__c")) \
        .select(term_col, "__c.d", "__c.bucket")
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left") \
        .select(term_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    return joined.groupBy(term_col).agg(F.min("cnt").alias("est_count"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, salt): counters
    add cell-wise — the property that lets per-partition / per-day / per-
    corpus sketches combine without rescanning anything."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------
# Portable HyperLogLog registers (Flajolet et al. 2007): unlike
# F.approx_count_distinct (whose sketch lives inside the JVM and cannot
# be replayed by another engine), these registers are plain md5 integer
# arithmetic, so per-corpus sketches built by ANY engine merge with a
# register-wise MAX — the property that lets a 100 TB corpus keep one
# tiny (2^p rows) distinct-count summary per partition/day/source and
# combine them without rescanning anything.
# ---------------------------------------------------------------------

def hll_registers(df: DataFrame, item_col: str, group_cols: list[str]
                  | None = None, p: int = 6, salt: str = "hll") -> DataFrame:
    """Per-group HLL registers over an item column: ``(…group, bucket,
    rho)`` with bucket = first md5 word mod 2^p and rho = leading-zero
    rank (position of the first set bit) of the second md5 word.  One
    map-side-combined MAX aggregation; the result is ≤ groups×2^p rows
    regardless of input size."""
    group_cols = group_cols or []
    digest = F.md5(F.concat(F.lit(salt + ":"), F.col(item_col).cast("string")))
    bucket = (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
              % F.lit(2 ** p))
    w = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    # rho(w) over a 32-bit word via BIN string length (exact integer
    # math, same cross-engine recipe as q_quantile_sketch); w == 0 →
    # all 32 bits zero → rho = 33 by convention on both engines.
    rho = F.when(w == 0, F.lit(33)).otherwise(33 - F.length(F.bin(w)))
    return (df.select(*group_cols, bucket.alias("bucket"),
                      rho.cast("long").alias("rho"))
              .groupBy(*group_cols, "bucket")
              .agg(F.max("rho").alias("rho")))


def hll_merge(sketch: DataFrame, group_cols: list[str] | None = None
              ) -> DataFrame:
    """Merge HLL register sets built with the same (p, salt): registers
    combine with MAX — fold out ``group_cols`` to get the union
    sketch."""
    group_cols = group_cols or []
    return sketch.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, group_cols: list[str] | None = None,
                 p: int = 6) -> DataFrame:
    """Cardinality estimate from registers: the raw HLL harmonic-mean
    formula E = α·m² / Σ 2^(−M_j) with the small-range linear-counting
    correction gated on the STANDARD Flajolet et al. condition — apply
    E_lc = m·ln(m/V) only when raw E ≤ 2.5·m AND V > 0 (a single empty
    register must not force linear counting in the mid range).
    Registers that never saw a value are absent from the sparse table,
    so V = m − present.

    ``p`` must match the p the registers were built with; a mismatch
    silently skews V and α, so the estimate guards itself: any bucket
    id ≥ 2^p raises at evaluation time (``assert_true``) instead of
    returning a corrupted estimate."""
    group_cols = group_cols or []
    m = 2 ** p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s"),
        F.count("*").alias("__present"),
        F.max("bucket").alias("__maxb"))
    v = F.lit(m) - F.col("__present")
    raw = F.lit(alpha * m * m) / (F.col("__s") + v.cast("double"))
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((v > 0) & (raw <= F.lit(2.5 * m)), lc).otherwise(raw)
    guard = F.assert_true(F.col("__maxb") < F.lit(m),
                          F.lit(f"hll_estimate: bucket >= 2^{p} — "
                                "sketch built with a larger p"))
    return agg.select(*group_cols,
                      F.when(guard.isNull(), est).alias("hll_estimate"))
