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

from access_mopper_spark.functions.rounding import pround


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns — zip_with + aggregate, JVM-side."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """NULL for zero-norm inputs: a zero vector has no direction, and
    under Spark 4's ANSI default a raw division would ERROR the whole
    query on one degenerate row (caught by the round-7 adversarial
    embedding fuzz).  Callers that rank by cosine filter zero-norm rows
    at the operator edge (`nonzero_norm`) so NULLs never reach a
    top-k ordering."""
    den = norm(a) * norm(b)
    return F.when(den != 0, dot(a, b) / den)


def nonzero_norm(a: Column) -> Column:
    """Predicate: the vector carries directional information (any
    nonzero coordinate).  The shared zero-vector contract of every
    cosine-ranked operator — L2/PQ distance operators keep zero
    vectors (euclidean distance is well-defined for them)."""
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v) > 0


def as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def partial_topk(scored: DataFrame, part_cols: list[str], order: list[Column],
                 k: int, rank_col: str = "rank") -> DataFrame:
    """Top-k that never funnels the full input to one reducer, and (r13)
    never pays an exchange the native rank pushdown already avoids.

    Grouped (``part_cols`` non-empty): a single rank window with the
    ``rank <= k`` filter — Spark pushes the filter down as
    Partial/Final ``WindowGroupLimit`` (SPARK-37099, k below
    ``spark.sql.optimizer.windowGroupLimitThreshold`` = 1000), so every
    map task pre-prunes to its per-group top-k BEFORE the one
    hash(part_cols) exchange and the final window sees ≤ k·p rows per
    group.  The r12 formulation hand-rolled the same bound by salting a
    first window with ``spark_partition_id()`` — which cost an EXTRA
    full exchange on (part_cols, pid) before the pruning sort; the
    native pushdown prunes on the map side of the only exchange
    (measured on the 90M-row q_adamic_adar candidate table at ×10:
    the salted phase-1 shuffle was pure overhead).

    Global (``part_cols`` empty): ``orderBy(...).limit(k)`` plans as
    ``TakeOrderedAndProject`` — a bounded per-partition heap merged at
    k rows, no partition ever sorts its full input — then the rank
    attaches via a window over those k rows (the ``rank <= k`` filter
    keeps the WindowGroupLimit marker the plan audit keys on).
    Identical rows to a single global window for any total ``order``."""
    from pyspark.sql import Window as W

    if part_cols:
        w = W.partitionBy(*part_cols).orderBy(*order)
        return (scored.withColumn(rank_col, F.row_number().over(w))
                      .where(F.col(rank_col) <= k))
    cand = scored.orderBy(*order).limit(k)
    return (cand.withColumn(rank_col, F.row_number().over(W.orderBy(*order)))
                .where(F.col(rank_col) <= k))


def cosine_topk(corpus: DataFrame, query: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Brute-force cosine top-k of each query vector against the corpus.

    ``query`` is small (broadcast); the corpus is scanned once for ALL
    queries (crossJoin + per-query top-k), which is the right plan when
    |queries| ≪ |corpus|: one pass, map-side compute.  Ranking uses
    ``partial_topk`` — per-partition local top-k then a k·p-row merge —
    so no reducer ever sees more than its partition's scores."""
    q = query.select(F.col(query_id_col),
                     as_double(F.col(vec_col)).alias("__qv")) \
              .where(nonzero_norm(F.col("__qv")))
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv")) \
              .where(nonzero_norm(F.col("__cv")))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, cosine(F.col("__cv"), F.col("__qv")).alias("cosine_sim"))
    return partial_topk(scored, [query_id_col],
                        [F.col("cosine_sim").desc(), F.col(id_col)], k)


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
    corpus = corpus.where(nonzero_norm(as_double(F.col(vec_col))))
    query = query.where(nonzero_norm(as_double(F.col(vec_col))))
    c = corpus.withColumn("__bucket", hyperplane_bucket(F.col(vec_col), dim, n_planes))
    q = query.withColumn("__qb", hyperplane_bucket(F.col(vec_col), dim, n_planes))
    # query probes: own bucket + all Hamming-1 buckets
    probes = F.array(F.col("__qb"), *[
        F.col("__qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)])
    q = q.select(F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv"),
                 F.explode(probes).alias("__bucket"))
    # 6dp-rounded sims + id tiebreak: ordering is deterministic across
    # engines/summation orders (same convention as ivf_search)
    scored = c.join(F.broadcast(q), "__bucket").select(
        query_id_col, id_col,
        pround(cosine(as_double(F.col(vec_col)), F.col("__qv")), 6).alias("cosine_sim"))
    return partial_topk(scored.dropDuplicates([query_id_col, id_col]),
                        [query_id_col],
                        [F.col("cosine_sim").desc(), F.col(id_col)], k)


# --------------------------------------------------------------- IVF ANN

def ivf_assign(corpus: DataFrame, centroids: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", cent_id: str = "centroid_id",
               cent_vec: str = "centroid") -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast join + min_by)
    — the build side of an IVF index, as a plain DataFrame op."""
    c = corpus.select(id_col, vec_col) \
              .where(nonzero_norm(as_double(F.col(vec_col))))
    cents = centroids.select(cent_id, as_double(F.col(cent_vec)).alias("__cent")) \
                     .where(nonzero_norm(F.col("__cent")))
    joined = c.crossJoin(F.broadcast(cents)).select(
        id_col, vec_col, cent_id,
        cosine(as_double(F.col(vec_col)), F.col("__cent")).alias("__sim"))
    # ties (exact-duplicate centroids are REAL in corpus data) break
    # toward the LOWEST centroid id — max_by on a bare double is
    # partition-order nondeterministic and flipped 410 assignments when
    # an upstream filter reordered the plan (round-7 finding)
    return joined.groupBy(id_col).agg(
        F.max_by(cent_id, F.struct(F.col("__sim"),
                                   (-F.col(cent_id)).alias("__nc")))
        .alias(cent_id),
        F.first(vec_col).alias(vec_col),
    )


def semantic_dedup(corpus: DataFrame, centroids: DataFrame,
                   threshold: float, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   use_gemm: bool = True) -> DataFrame:
    """Semantic deduplication (the SemDedup recipe, Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding space, then WITHIN
    each cluster drop every item whose cosine to a lower-id clustermate
    is ≥ ``threshold`` — keeping one representative per semantic
    near-duplicate group without any global pairwise compare.

    Scale shape: this is exactly why SemDedup clusters first — the O(n²)
    compare is confined to clusters (k ≈ √n keeps cluster sizes ~√n, so
    the self-join does Σ|c|² ≪ n² work).  One broadcast of the centroid
    table for assignment, one equi-join keyed on centroid_id (balanced
    when k is sized right; a runaway cluster is an AQE skew split), one
    anti-join back.  Lower-id-wins needs no iterative connected
    components: membership is decided per pair, map-side after the
    cluster join.

    ``use_gemm`` (default): the within-cluster compare runs as ONE
    chunked BLAS GEMM per cluster inside ``applyInPandas`` — the right
    granularity (few, large groups: one Python call per cluster), and
    ~100× faster than per-pair JVM array folds.  Memory stays bounded by
    chunking the left operand (chunk × |cluster| similarity blocks).
    ``use_gemm=False`` keeps the pure-Column self-join formulation."""
    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    if use_gemm:
        import numpy as np
        import pandas as pd

        tau = float(threshold)

        def drop_ids(pdf: pd.DataFrame) -> pd.DataFrame:
            order = np.argsort(pdf[id_col].to_numpy())
            ids = pdf[id_col].to_numpy()[order]
            m = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            m = m / norms[:, None]
            dup = np.zeros(len(ids), dtype=bool)
            for lo in range(0, len(ids), 1024):       # bound the sim block
                hi = min(lo + 1024, len(ids))
                s = m[lo:hi] @ m.T                    # (chunk, |cluster|)
                # j is a duplicate if some i < j has sim >= tau
                for r in range(hi - lo):
                    j = lo + r
                    if (s[r, :j] >= tau).any():
                        dup[j] = True
            return pd.DataFrame({id_col: ids[dup]})

        dropped = assigned.groupBy("centroid_id").applyInPandas(
            drop_ids, f"{id_col} long")
    else:
        a = assigned.select(F.col(id_col).alias("__ida"), "centroid_id",
                            as_double(F.col(vec_col)).alias("__va"))
        b = assigned.select(F.col(id_col).alias("__idb"), "centroid_id",
                            as_double(F.col(vec_col)).alias("__vb"))
        dropped = (a.join(b, "centroid_id")
                    .where(F.col("__idb") > F.col("__ida"))
                    .where(cosine(F.col("__va"), F.col("__vb"))
                           >= F.lit(float(threshold)))
                    .select(F.col("__idb").alias(id_col)).distinct())
    return corpus.join(dropped, id_col, "left_anti")


# ------------------------------------------------- exact pairs via BLAS

def cosine_pairs_exact(corpus: DataFrame, threshold: float, dim: int,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       max_broadcast_rows: int = 200_000) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold, exact, via blocked
    matrix multiplication: the normalized corpus is broadcast as one numpy
    matrix; each partition's rows multiply against it with BLAS
    (``A_chunk @ B.T``) inside ``mapInPandas``.

    This is the dense-similarity scale pattern: the O(n²) compare runs as
    n/p × n GEMMs — hundreds of times faster than per-pair JVM array
    folds.  The broadcast side is guarded (``max_broadcast_rows``); above
    it the computation automatically switches to
    ``cosine_pairs_blocked`` — both sides blocked, no driver collect, no
    broadcast of the corpus.
    """
    import numpy as np

    corpus = corpus.where(nonzero_norm(as_double(F.col(vec_col))))
    spark = corpus.sparkSession
    n = corpus.count()
    if n > max_broadcast_rows:
        n_blocks = max(2, math.ceil(n / max(1, max_broadcast_rows // 8)))
        return cosine_pairs_blocked(corpus, threshold, id_col=id_col,
                                    vec_col=vec_col, n_blocks=n_blocks)

    rows = corpus.select(id_col, vec_col).collect()   # bounded by guard above
    ids = np.array([r[id_col] for r in rows], dtype="int64")
    mat = np.array([r[vec_col] for r in rows], dtype="float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    from access_mopper_spark.operators.partitioning import ensure_min_partitions

    def blocks(batches):
        import pandas as pd

        B, BI = b_mat.value, b_ids.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(list(pdf[vec_col]), dtype="float64")
            A /= np.linalg.norm(A, axis=1, keepdims=True)
            AI = pdf[id_col].to_numpy(dtype="int64")
            sims = A @ B.T
            ai, bi = np.nonzero((sims >= threshold) & (AI[:, None] < BI[None, :]))
            yield pd.DataFrame({
                "id_a": AI[ai], "id_b": BI[bi],
                "cosine_sim": sims[ai, bi],
            })

    src = ensure_min_partitions(corpus.select(id_col, vec_col))
    return src.mapInPandas(blocks, "id_a long, id_b long, cosine_sim double")


def cosine_pairs_blocked(corpus: DataFrame, threshold: float,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         n_blocks: int = 8) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold — exact, with BOTH
    sides blocked: no broadcast, no driver collect, unbounded corpus size.

    Each row hashes to one of ``n_blocks`` blocks (xxhash64 of id —
    uniform, no skew).  For every block pair (i ≤ j) the rows of block i
    ship as the 'A' side and the rows of block j as the 'B' side; a row
    therefore replicates ~n_blocks times (once per pair it participates
    in), the shuffle moves n·n_blocks rows total, and each reducer runs
    one |block|×|block| GEMM via ``applyInPandas``.  This is the
    standard O(n²) similarity sharding: quadratic FLOPs spread over
    n_blocks·(n_blocks+1)/2 independent GEMM tasks, each with bounded
    memory (|block| ≈ n/n_blocks rows per side).

    Pick ``n_blocks`` so one block's matrix fits executor memory
    (n/n_blocks · dim · 8 bytes); FLOPs are invariant to n_blocks.
    """
    import numpy as np

    src = corpus.where(nonzero_norm(as_double(F.col(vec_col)))) \
                .select(F.col(id_col).cast("long").alias("__id"),
                        F.col(vec_col).alias("__v"))
    blk = src.withColumn(
        "__blk", F.pmod(F.xxhash64(F.col("__id")), F.lit(n_blocks)).cast("int"))

    # row in block b → A-side of pairs (b, j≥b), B-side of pairs (i≤b, b)
    a_targets = F.filter(F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                         lambda j: j >= F.col("__blk"))
    b_targets = F.filter(F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                         lambda i: i < F.col("__blk"))  # i==b covered by A side
    a_rows = blk.select(
        "__id", "__v", F.lit(0).alias("__role"),
        F.col("__blk").alias("__bi"), F.explode(a_targets).alias("__bj"))
    b_rows = blk.select(
        "__id", "__v", F.lit(1).alias("__role"),
        F.explode(b_targets).alias("__bi"), F.col("__blk").alias("__bj"))
    tagged = a_rows.unionByName(b_rows)

    def gemm(pdf):
        import pandas as pd

        same = pdf["__bi"].iat[0] == pdf["__bj"].iat[0]
        a = pdf[pdf["__role"] == 0]
        b = a if same else pdf[pdf["__role"] == 1]
        if not len(a) or not len(b):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "cosine_sim": pd.Series(dtype="float64")})
        A = np.array(list(a["__v"]), dtype="float64")
        B = A if same else np.array(list(b["__v"]), dtype="float64")
        A = A / np.linalg.norm(A, axis=1, keepdims=True)
        Bn = A if same else B / np.linalg.norm(B, axis=1, keepdims=True)
        AI = a["__id"].to_numpy(dtype="int64")
        BI = AI if same else b["__id"].to_numpy(dtype="int64")
        sims = A @ Bn.T
        if same:
            # A ≡ B: the grid holds every unordered pair twice ((x,y) and
            # (y,x)); keep only the id_a < id_b cell
            ai, bi = np.nonzero((sims >= threshold) & (AI[:, None] < BI[None, :]))
            id_a, id_b = AI[ai], BI[bi]
        else:
            # disjoint blocks: each unordered pair appears in exactly one
            # cell; min/max normalizes output order
            lo = np.minimum(AI[:, None], BI[None, :])
            hi = np.maximum(AI[:, None], BI[None, :])
            ai, bi = np.nonzero((sims >= threshold) & (lo < hi))
            id_a, id_b = lo[ai, bi], hi[ai, bi]
        return pd.DataFrame({"id_a": id_a, "id_b": id_b,
                             "cosine_sim": sims[ai, bi]})

    return (tagged.groupBy("__bi", "__bj")
            .applyInPandas(gemm, "id_a long, id_b long, cosine_sim double"))


def ivf_search(assigned: DataFrame, centroids: DataFrame, query: DataFrame,
               k: int = 5, nprobe: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding", cent_id: str = "centroid_id",
               cent_vec: str = "centroid",
               query_id_col: str = "query_id") -> DataFrame:
    """IVF probe: rank centroids per query, keep the top ``nprobe``, and
    score ONLY the corpus vectors assigned to those lists.

    The scan cost drops from |corpus| to |corpus|·nprobe/n_centroids per
    query; the join shuffles on centroid id (bounded fan-out), never the
    full corpus × queries.  With nprobe = n_centroids the result is
    exactly brute force — the recall/latency dial.  Ranking uses the
    6dp-rounded similarity with id tiebreak so ordering is deterministic
    across engines."""
    from pyspark.sql import Window as W

    cents = centroids.select(cent_id, as_double(F.col(cent_vec)).alias("__cv")) \
                     .where(nonzero_norm(F.col("__cv")))
    q = query.select(query_id_col, as_double(F.col(vec_col)).alias("__qv")) \
             .where(nonzero_norm(F.col("__qv")))
    qc = q.crossJoin(F.broadcast(cents)).select(
        query_id_col, "__qv", cent_id,
        pround(cosine(F.col("__qv"), F.col("__cv")), 6).alias("__csim"))
    wq = W.partitionBy(query_id_col).orderBy(F.col("__csim").desc(), F.col(cent_id))
    probes = qc.withColumn("__r", F.row_number().over(wq)) \
               .where(F.col("__r") <= nprobe).select(query_id_col, "__qv", cent_id)

    lists = assigned.select(id_col, cent_id, as_double(F.col(vec_col)).alias("__ev"))
    scored = lists.join(F.broadcast(probes), cent_id).select(
        query_id_col, id_col,
        pround(cosine(F.col("__ev"), F.col("__qv")), 6).alias("cosine_sim"))
    return partial_topk(scored.dropDuplicates([query_id_col, id_col]),
                        [query_id_col],
                        [F.col("cosine_sim").desc(), F.col(id_col)], k)


# -------------------------------------------------- scalar quantization

def quantize_int8(vec: Column) -> Column:
    """Per-vector symmetric int8 quantization: scale = max(|x|)/127,
    q_i = round(x_i/scale).  The storage-side primitive for embedding
    tables at scale — 4× smaller than float32, 8× smaller than the
    double math Spark does on read, with the scale kept alongside for
    dequantization.  Pure Column math (higher-order functions, no UDF);
    returns struct(scale double, q array<int>).

    Zero vectors quantize to scale 0 + all-zero codes (guarded divide)."""
    amax = F.aggregate(vec, F.lit(0.0),
                       lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))))
    scale = amax / F.lit(127.0)
    # let-bind the scale via a 1-element transform: referencing `scale`
    # (itself an aggregate over the vector) inside the per-element lambda
    # would re-run that aggregate for EVERY element — O(d²) per vector
    # (HOF lambdas are interpreted; captured trees re-evaluate).  As a
    # lambda variable it is computed once.
    return F.element_at(
        F.transform(F.array(scale), lambda s: F.struct(
            s.alias("scale"),
            F.when(s > 0,
                   F.transform(vec, lambda v: pround(v.cast("double") / s, 0)
                               .cast("int")))
             .otherwise(F.transform(vec, lambda v: F.lit(0))).alias("q"))),
        1)


def dequantize_int8(quant: Column) -> Column:
    """Inverse of ``quantize_int8``: x̂_i = q_i · scale (array<double>)."""
    return F.transform(quant["q"], lambda v: v.cast("double") * quant["scale"])


# ---------------------------------------------- product quantization
#
# The memory side of billion-scale ANN (IVF-PQ): each vector splits into
# m subvectors, each subvector maps to the id of its nearest codeword in
# a per-subspace codebook of ksub entries — 64 float32 dims become m
# small ints.  Search then runs against the codes with asymmetric
# distance computation (ADC): the query stays exact, each corpus vector
# is approximated by its codewords, so the scan is a map-only lookup—sum
# over codes instead of full-dimension float math.

def subvectors(vec: Column, m: int, dsub: int) -> Column:
    """array of the m contiguous subvectors of ``vec`` (each dsub long)."""
    return F.transform(F.sequence(F.lit(0), F.lit(m - 1)),
                       lambda s: F.slice(vec, s * dsub + 1, dsub))


def _sq_l2(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def pq_codebooks(corpus: DataFrame, m: int, dsub: int, ksub: int,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic baseline codebooks ``(sub, code, codeword)``: the
    subvectors of the ksub lowest-id corpus vectors — the same
    lowest-id-prefix convention as ``kmeans_train``'s init, so the DuckDB
    oracle can rebuild them exactly.  ``pq_train`` is the quality path
    (Lloyd per subspace); the encode/search plumbing is identical."""
    base = (corpus.orderBy(id_col).limit(ksub)
            .select(F.col(id_col).alias("code"),
                    as_double(F.col(vec_col)).alias("__v")))
    return (base.select("code", F.posexplode(subvectors(F.col("__v"), m, dsub))
                        .alias("sub", "codeword")))


def pq_train(corpus: DataFrame, m: int, dsub: int, ksub: int,
             n_iter: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Trained codebooks ``(sub, code, codeword)``: one distributed Lloyd
    run (``kmeans_train``) per subspace over the sliced subvector column.
    m driver-side loop iterations, each a linear pass — never a corpus
    self-join."""
    out = None
    for s in range(m):
        sub = corpus.select(F.col(id_col),
                            F.slice(as_double(F.col(vec_col)),
                                    s * dsub + 1, dsub).alias("__sv"))
        cb = kmeans_train(sub, k=ksub, n_iter=n_iter, id_col=id_col,
                          vec_col="__sv").select(
            F.lit(s).alias("sub"), F.col("centroid_id").alias("code"),
            F.col("centroid").alias("codeword"))
        out = cb if out is None else out.unionByName(cb)
    return out


def pq_encode(corpus: DataFrame, codebooks: DataFrame, m: int, dsub: int,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """PQ codes ``(id, codes array<int>)``: per subspace, the code of the
    nearest codeword by squared L2 (6dp-rounded, code tiebreak — the
    cross-engine-deterministic argmin convention used throughout).

    Plan: posexplode to (id, sub, subvector) — m·n rows, map-only — then
    a broadcast join against the (m·ksub)-row codebook, a keyed
    (id, sub) argmin, and a keyed (id) reassembly.  No driver collect,
    no corpus self-join; codes are 4–8× smaller than int8 quantization
    and 16–32× smaller than float32."""
    sv = corpus.select(
        F.col(id_col),
        F.posexplode(subvectors(as_double(F.col(vec_col)), m, dsub))
        .alias("sub", "__sv"))
    d = sv.join(F.broadcast(codebooks), "sub").select(
        id_col, "sub", "code",
        pround(_sq_l2(F.col("__sv"), F.col("codeword")), 6).alias("__d"))
    codes = d.groupBy(id_col, "sub").agg(
        F.min_by("code", F.struct("__d", "code")).alias("code"))
    return (codes.groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.struct("sub", "code")))
                 .alias("__sc"))
            .select(id_col,
                    F.transform(F.col("__sc"), lambda s: s["code"].cast("int"))
                    .alias("codes")))


def pq_adc_topk(codes: DataFrame, codebooks: DataFrame, query: DataFrame,
                m: int, dsub: int, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id",
                rank_col: str = "adc_rank") -> DataFrame:
    """Asymmetric-distance top-k: exact query subvectors against each
    corpus vector's codewords.  adc = Σ_sub ‖q_sub − codeword(code_sub)‖²
    (each subspace term 6dp-rounded, then the 6dp-rounded sum — the
    oracle replays both layers).

    Plan: the per-(query, sub, code) distance table is |queries|·m·ksub
    rows — computed once and broadcast (this is the classic ADC lookup
    table); the corpus codes then resolve distances with a map-side
    lookup join and one keyed sum per (query, id).  The corpus-side scan
    never touches float vectors — the 100 TB memory win of PQ."""
    qsv = query.select(
        F.col(query_id_col),
        F.posexplode(subvectors(as_double(F.col(vec_col)), m, dsub))
        .alias("sub", "__qv"))
    lut = qsv.join(codebooks, "sub").select(
        query_id_col, "sub", "code",
        pround(_sq_l2(F.col("__qv"), F.col("codeword")), 6).alias("__d"))

    expanded = codes.select(
        F.col(id_col), F.posexplode(F.col("codes")).alias("sub", "code"))
    per_doc = (expanded.join(F.broadcast(lut), ["sub", "code"])
               .groupBy(query_id_col, id_col)
               .agg(pround(F.sum("__d"), 6).alias("adc_dist")))
    return partial_topk(per_doc, [query_id_col],
                        [F.col("adc_dist").asc(), F.col(id_col)], k,
                        rank_col=rank_col)


# -------------------------------------------------- k-means (IVF build)

def kmeans_train(corpus: DataFrame, k: int, n_iter: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 cent_id: str = "centroid_id",
                 cent_vec: str = "centroid") -> DataFrame:
    """Train IVF coarse-quantizer centroids with Lloyd iterations as
    plain DataFrame ops — the build step ``ivf_assign``/``ivf_search``
    assume already happened.

    Deterministic throughout (cross-engine replayable): init = the k
    lowest-id vectors; assignment = argmax 6dp-rounded cosine with
    centroid-id tiebreak; update = elementwise member mean, rounded to
    6dp (empty clusters keep their previous centroid).  Per iteration:
    one broadcast of the k centroids (tiny), one map-side scored pass
    over the corpus, one shuffle keyed by (centroid, dim) for the mean —
    the textbook distributed Lloyd round, linear in corpus size, never a
    corpus self-join.
    """
    from pyspark.sql import Window as W

    c = corpus.select(F.col(id_col).alias("__id"),
                      as_double(F.col(vec_col)).alias("__v")) \
              .where(nonzero_norm(F.col("__v")))
    cents = (c.orderBy("__id").limit(k)
             .select(F.col("__id").alias(cent_id), F.col("__v").alias("__c")))

    for _ in range(n_iter):
        scored = c.crossJoin(F.broadcast(cents)).select(
            "__id", "__v", cent_id,
            pround(cosine(F.col("__v"), F.col("__c")), 6).alias("__sim"))
        wv = W.partitionBy("__id").orderBy(F.col("__sim").desc(), F.col(cent_id))
        assigned = (scored.withColumn("__r", F.row_number().over(wv))
                    .where(F.col("__r") == 1).select("__id", "__v", cent_id))
        # elementwise mean via (centroid, dim) shuffle; array_agg ordered
        # by dim index rebuilds the vector
        means = (assigned.select(cent_id, F.posexplode("__v").alias("__d", "__x"))
                 .groupBy(cent_id, "__d").agg(F.avg("__x").alias("__m"))
                 .groupBy(cent_id)
                 .agg(F.array_sort(F.collect_list(F.struct("__d", "__m"))).alias("__dm"))
                 .select(cent_id,
                         F.transform(F.col("__dm"), lambda s: pround(s["__m"], 6))
                         .alias("__cnew")))
        cents = (cents.join(means, cent_id, "left")
                 .select(cent_id, F.coalesce("__cnew", "__c").alias("__c")))

    return cents.select(cent_id, F.col("__c").alias(cent_vec))


def ivf_pq_search(corpus: DataFrame, centroids: DataFrame,
                  codebooks: DataFrame, query: DataFrame, m: int, dsub: int,
                  k: int = 10, nprobe: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  cent_id: str = "centroid_id", cent_vec: str = "centroid",
                  query_id_col: str = "query_id",
                  rank_col: str = "adc_rank") -> DataFrame:
    """IVF-PQ: the composed billion-scale ANN — IVF cuts WHICH vectors
    are scored (only the top-``nprobe`` centroid lists per query), PQ
    cuts WHAT is scored (int codes via the ADC lookup table, never the
    float vectors).

    Build side: one ``ivf_assign`` pass + one ``pq_encode`` pass, joined
    on id — in production both persist as the index.  Search side: probe
    selection is a |queries|×|centroids| broadcast ranking; candidates
    come from a broadcast semi-join of the code table on centroid id;
    scoring is the same lookup-join + keyed sum as ``pq_adc_topk``.
    Per-query work is |corpus|·nprobe/n_centroids code lookups — the
    only shape that survives both the compute AND the memory wall at
    100 TB."""
    from pyspark.sql import Window as W

    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col,
                          cent_id=cent_id, cent_vec=cent_vec) \
        .select(id_col, cent_id)
    codes = pq_encode(corpus, codebooks, m, dsub, id_col=id_col,
                      vec_col=vec_col).join(assigned, id_col)

    cents = centroids.select(cent_id, as_double(F.col(cent_vec)).alias("__cv")) \
                     .where(nonzero_norm(F.col("__cv")))
    q = query.select(query_id_col, as_double(F.col(vec_col)).alias("__qv")) \
             .where(nonzero_norm(F.col("__qv")))
    qc = q.crossJoin(F.broadcast(cents)).select(
        query_id_col, "__qv", cent_id,
        pround(cosine(F.col("__qv"), F.col("__cv")), 6).alias("__csim"))
    wq = W.partitionBy(query_id_col).orderBy(F.col("__csim").desc(),
                                             F.col(cent_id))
    probes = qc.withColumn("__r", F.row_number().over(wq)) \
               .where(F.col("__r") <= nprobe).select(query_id_col, cent_id)

    qsv = query.select(
        F.col(query_id_col),
        F.posexplode(subvectors(as_double(F.col(vec_col)), m, dsub))
        .alias("sub", "__qv"))
    lut = qsv.join(codebooks, "sub").select(
        query_id_col, "sub", "code",
        pround(_sq_l2(F.col("__qv"), F.col("codeword")), 6).alias("__d"))

    cand = codes.join(F.broadcast(probes), cent_id) \
                .select(query_id_col, id_col, "codes")
    expanded = cand.select(
        query_id_col, id_col, F.posexplode(F.col("codes")).alias("sub", "code"))
    per_doc = (expanded.join(F.broadcast(lut), [query_id_col, "sub", "code"])
               .groupBy(query_id_col, id_col)
               .agg(pround(F.sum("__d"), 6).alias("adc_dist")))
    return partial_topk(per_doc, [query_id_col],
                        [F.col("adc_dist").asc(), F.col(id_col)], k,
                        rank_col=rank_col)


def embedding_covariance(corpus: DataFrame, dim: int,
                         vec_col: str = "embedding") -> DataFrame:
    """Uncentered second-moment (Gram) matrix Σ xᵀx of the embedding
    column as ONE distributed pass — the input to PCA / whitening /
    covariance-shift monitoring over billion-row embedding tables.

    Each Arrow batch contributes a dim×dim partial via a single BLAS
    GEMM (``X.T @ X``); partials are dim² scalars regardless of row
    count, so the reduce is a fixed-size tree aggregation — the
    canonical outer-product-accumulation pattern that never shuffles
    the data itself (contrast: exploding to (row, i, j, xᵢxⱼ) triples
    shuffles dim² copies of the corpus).  Returns the upper triangle
    ``(i, j, s)`` with i ≤ j (the matrix is symmetric); callers divide
    by n or center externally if they need the true covariance.
    Determinism note: per-batch GEMM sums floats in a fixed order but
    batch partitioning varies, so downstream parity comparisons round
    (same contract as every aggregated double in the repo)."""
    import numpy as np
    import pandas as pd

    from access_mopper_spark.operators.partitioning import ensure_min_partitions

    src = ensure_min_partitions(corpus.select(vec_col))

    def partials(batches):
        acc = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if len(pdf):
                x = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf.iloc[:, 0]])
                acc += x.T @ x
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame({"i": iu.astype("int32"), "j": ju.astype("int32"),
                            "s": acc[iu, ju]})

    part = src.mapInPandas(partials, "i int, j int, s double")
    return part.groupBy("i", "j").agg(F.sum("s").alias("s"))


def random_projection(corpus: DataFrame, dim: int, out_dim: int,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      seed: str = "rp0") -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim`` via a
    DETERMINISTIC ±1 (Achlioptas) matrix derived from md5 parity —
    R[i][k] = +1 if the first hex nibble of md5('seed:i:k') is even
    else −1.  No RNG state ships anywhere: the matrix is a pure
    function of (seed, i, k), so any engine (and any retry of any
    task) regenerates exactly the same projection — the property that
    makes the op replayable in a SQL oracle and idempotent under
    speculative execution.

    The matrix materializes ONCE as a dim×out_dim literal built
    driver-side (bounded: e.g. 64×16) and is baked into the plan as a
    Column expression — y_k = Σ_i R[i][k]·x_i via one ``aggregate``
    fold per output coordinate, all JVM-side, map-only, no shuffle.
    Scaling by 1/√out_dim keeps expected norms (standard JL)."""
    import hashlib

    signs = [[1.0 if int(hashlib.md5(
                 f"{seed}:{i}:{k}".encode()).hexdigest()[0], 16) % 2 == 0
              else -1.0 for k in range(out_dim)] for i in range(dim)]
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scale = 1.0 / float(out_dim) ** 0.5
    comps = [
        (F.aggregate(
            F.zip_with(x, F.array(*[F.lit(signs[i][k]) for i in range(dim)]),
                       lambda a, b: a * b),
            F.lit(0.0), lambda acc, t: acc + t) * F.lit(scale)).alias(f"y{k}")
        for k in range(out_dim)
    ]
    return corpus.select(F.col(id_col), *comps)
