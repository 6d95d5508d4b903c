"""Physical-layout helpers.

``ensure_min_partitions`` exists for the local-testing shape of a problem
that disappears at scale: a CPU-heavy narrow op (md5 shingling, Arrow
feature extraction) over a source that arrived as very few input splits
runs on as few cores.  At 100 TB a parquet scan yields thousands of
splits and this is a no-op; on a single small file it round-robins rows
across the cluster once so the expensive map runs wide.  Gated on the
current partition count so the shuffle is only paid when parallelism is
actually missing — never blanket-repartition a big scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition up to ``n`` (default: cluster default parallelism) only
    if the DataFrame currently has fewer partitions."""
    sc = df.sparkSession.sparkContext
    target = n or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
