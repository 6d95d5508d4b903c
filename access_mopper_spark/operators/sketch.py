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
