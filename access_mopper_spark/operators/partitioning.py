"""Physical-layout helpers.

``ensure_min_partitions`` exists for the local-testing shape of a problem
that disappears at scale: a CPU-heavy narrow op (md5 shingling, Arrow
feature extraction) over a source that arrived as very few input splits
runs on as few cores.  At 100 TB a parquet scan yields thousands of
splits and this is a no-op; on a single small file it round-robins rows
across the cluster once so the expensive map runs wide.  Gated on the
current parallelism so the shuffle is only paid when parallelism is
actually missing — never blanket-repartition a big scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition up to ``n`` (default: cluster default parallelism) only
    if the source's parallelism is below it.

    The probe avoids ``df.rdd`` where it can: for file-backed plans the
    file count (``inputFiles`` — a driver-side listing, no physical
    planning) bounds the scan's split count from below, so ``files >=
    target`` proves parallelism without planning the query twice.  Only
    in-memory/local sources fall through to the ``rdd`` probe, where the
    plan is trivial and the conversion is cheap.
    """
    if df.isStreaming:
        # parallelism of an unbounded source is the source's concern
        # (micro-batch splits); inputFiles()/rdd probes don't apply
        return df
    sc = df.sparkSession.sparkContext
    target = n or sc.defaultParallelism
    if len(df.inputFiles()) >= target:
        return df  # ≥ one split per file → already wide enough, no planning
    # few/no files: a single big file may still split wide — confirm with
    # the rdd probe before paying a shuffle (rare branch, plan is small)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def zorder_key(cols, bits: int = 16):
    """Z-order (Morton) clustering key: interleave the low ``bits`` bits
    of each non-negative integer column so rows close in EVERY dimension
    get close keys.  Sorting / range-partitioning output files by this
    key tightens per-file min/max statistics on ALL participating
    columns at once — multi-dimensional data skipping from
    one-dimensional layout, the trick behind z-ordered table formats.

    Pure Column bit math (shift/mask/sum — whole-stage codegen, no UDF);
    callers normalize real-valued columns to [0, 2^bits) first (rank or
    min/max scale).  Key width = len(cols)·bits ≤ 63 bits."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError("len(cols) * bits must fit in a signed 64-bit key")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(cl, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, n * i + j)
    return key
