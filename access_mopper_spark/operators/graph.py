"""Iterative graph algorithms as DataFrame loops — PageRank here,
connected components in ``operators/dedup.dedup_clusters`` (both follow
the GraphX/Pregel message-passing shape re-expressed as joins).

Scale design (100 TB edge tables):
- each iteration is exactly ONE shuffle: contributions = edges ⋈ ranks
  on src (both sides hash-partitioned by node id), then a sum by dst.
  Ranks and out-degrees are node-sized, edges edge-sized; nothing is
  ever collected to the driver and no step is quadratic.
- the rank table is re-used across iterations; for tens of iterations
  the plan lineage grows linearly, so a production run inserts
  ``localCheckpoint()`` every ~10 rounds to truncate it (same pattern
  as dedup_clusters' label propagation).  The bounded-iteration runs
  here keep pure lineage so the whole computation stays one
  deterministic, resumable plan.
- convergence checks (L1 delta < ε) cost one extra 1-row aggregation
  per round; fixed-iteration mode (used by the oracle-checked query)
  skips them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Nodes are the union of src and dst; every rank update is
    r'(n) = (1-d)/N + d · Σ_{(m,n)∈E} r(m)/outdeg(m).  Dangling nodes
    (no out-edges) simply leak their mass — callers that need the
    strict stochastic fix symmetrize the edge list or add a dangling
    redistribution term; the oracle-checked query symmetrizes.

    Returns ``(node, rank)``."""
    # the loop-invariant tables persist so each iteration's plan reads
    # them from cache instead of re-running the distinct/degree shuffles
    # (without this the k-th iteration replays k copies of the edge prep
    # — visible as 3× the Exchange count in the physical plan)
    e = edges.select("src", "dst").distinct().persist()
    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node"))).distinct()
              .persist())
    deg = (e.groupBy(F.col("src").alias("node"))
            .agg(F.count("*").alias("outdeg")).persist())
    # N and the teleport term are scalar: computed once, broadcast into
    # every iteration as a 1-row cross join (no driver round-trip)
    n_row = nodes.agg(F.count("*").alias("__n"))
    ranks = (nodes.crossJoin(F.broadcast(n_row))
                  .select("node", (F.lit(1.0) / F.col("__n")).alias("rank")))
    for _ in range(iterations):
        contrib = (e.join(ranks.withColumnRenamed("node", "src"), "src")
                    .join(deg.withColumnRenamed("node", "src"), "src")
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("outdeg")).alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("__in"))
        ranks = (nodes.join(summed, "node", "left")
                      .crossJoin(F.broadcast(n_row))
                      .select("node",
                              ((1.0 - damping) / F.col("__n")
                               + damping * F.coalesce(F.col("__in"),
                                                      F.lit(0.0)))
                              .alias("rank")))
    # materialize the final ranks into cache (one count job — the same
    # single computation the caller's action would have paid), then
    # release the loop invariants: without this every invocation leaks
    # three cached tables for the session lifetime (mirrors bpe_train's
    # base.unpersist()).  The returned ranks table itself stays cached
    # (node-sized); callers that are done with it unpersist it.
    out = ranks.persist()
    out.count()
    for t in (e, nodes, deg):
        t.unpersist()
    return out
