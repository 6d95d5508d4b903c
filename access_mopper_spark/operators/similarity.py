"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the query vector(s)
against the corpus, pure Column math (F.aggregate/zip_with dot product),
fully distributed, no UDF.

Scale path: LSH bucketing by random-hyperplane signs (deterministic,
seed-derived planes) so candidate generation shuffles on bucket keys
instead of scanning everything per query; and an IVF-style coarse
quantizer where centroid assignment is a broadcast join.  At 100 TB the
brute-force scan parallelizes embarrassingly (map-only + top-k
tree-reduce); LSH/IVF cut the per-query cost when query volume is high.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns — zip_with + aggregate, JVM-side."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def cosine_topk(corpus: DataFrame, query: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Brute-force cosine top-k of each query vector against the corpus.

    ``query`` is small (broadcast); the corpus is scanned once for ALL
    queries (crossJoin + per-query top-k via window), which is the right
    plan when |queries| ≪ |corpus|: one pass, map-side compute, shuffle
    only (|corpus|·|queries| → k·|queries|) via partial top-k."""
    from pyspark.sql import Window as W

    q = query.select(F.col(query_id_col),
                     as_double(F.col(vec_col)).alias("__qv"))
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, cosine(F.col("__cv"), F.col("__qv")).alias("cosine_sim"))
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# --------------------------------------------------------------- LSH ANN

def _det_plane(dim: int, plane_idx: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random hyperplane (no RNG state — values from
    a hash-like recurrence so executors/engines agree)."""
    vals = []
    x = (seed * 2654435761 + plane_idx * 40503) % 2**32
    for _ in range(dim):
        x = (1103515245 * x + 12345) % 2**31
        vals.append((x / 2**31) * 2.0 - 1.0)
    return vals


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 7) -> Column:
    """Sign-pattern bucket id from n deterministic hyperplanes."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _det_plane(dim, p, seed)])
        s = dot(as_double(vec), plane)
        bucket = bucket * 2 + F.when(s >= 0, 1).otherwise(0)
    return bucket


def ann_lsh_topk(corpus: DataFrame, query: DataFrame, dim: int, k: int = 5,
                 n_planes: int = 6, id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's hyperplane
    bucket (plus Hamming-1 neighbor buckets) are scored.  Recall trades
    against bucket fan-out via n_planes."""
    c = corpus.withColumn("__bucket", hyperplane_bucket(F.col(vec_col), dim, n_planes))
    q = query.withColumn("__qb", hyperplane_bucket(F.col(vec_col), dim, n_planes))
    # query probes: own bucket + all Hamming-1 buckets
    probes = F.array(F.col("__qb"), *[
        F.col("__qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])
    q = q.select(F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv"),
                 F.explode(probes).alias("__bucket"))
    from pyspark.sql import Window as W

    scored = c.join(F.broadcast(q), "__bucket").select(
        query_id_col, id_col,
        cosine(as_double(F.col(vec_col)), F.col("__qv")).alias("cosine_sim"))
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return scored.dropDuplicates([query_id_col, id_col]) \
                 .withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# --------------------------------------------------------------- IVF ANN

def ivf_assign(corpus: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", cent_id: str = "centroid_id",
               cent_vec: str = "centroid") -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast join + min_by)
    — the build side of an IVF index, as a plain DataFrame op."""
    c = corpus.select(id_col, vec_col)
    cents = centroids.select(cent_id, as_double(F.col(cent_vec)).alias("__cent"))
    joined = c.crossJoin(F.broadcast(cents)).select(
        id_col, vec_col, cent_id,
        cosine(as_double(F.col(vec_col)), F.col("__cent")).alias("__sim"))
    return joined.groupBy(id_col).agg(
        F.max_by(cent_id, "__sim").alias(cent_id),
        F.first(vec_col).alias(vec_col),
    )
