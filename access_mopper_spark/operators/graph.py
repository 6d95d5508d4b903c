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


def _pagerank_invariants(edges: DataFrame):
    """The two loop-invariant tables, persisted so each iteration's
    plan reads cache instead of re-running the dedup/degree shuffles
    (without this the k-th iteration replays k copies of the edge prep
    — visible as 3× the Exchange count in the physical plan).

    ``e`` persists HASH-PARTITIONED ON src, deduplicated AND carrying
    ``outdeg``, all inside ONE exchange: the numeric repartition pins
    HashPartitioning(src), the (src, dst) dedup aggregate runs on that
    partitioning (ClusteredDistribution(src, dst) is satisfied by the
    src hash), and the per-src count rides a window over the same
    partitioning — so the edge table is shuffled exactly once and the
    old per-iteration ``deg`` join disappears (outdeg is already on
    the edge row).  A ``distinct().repartition()`` formulation costs
    two full edge shuffles plus a third for the degree aggregate, and
    caches ``e`` WITHOUT outdeg so every iteration pays a node-keyed
    join to fetch it.  Cached with the right outputPartitioning,
    EnsureRequirements reuses it (verified: zero Exchange above the
    edge InMemoryTableScan in the executed sort-merge plan) and each
    iteration shuffles only the node-sized rank table.
    tests/test_explain_plans.py pins the cached partitioning.

    The repartition is NUMERIC (shuffle.partitions), not by-column:
    with canChangeCachedPlanOutputPartitioning=true (session.py — lets
    AQE coalesce every OTHER cache build) a by-column repartition is
    AQE-coalescible, so the cached partitioning could shift under the
    consumer join and re-introduce the per-iteration edge shuffle;
    REPARTITION_BY_NUM is never coalesced, which keeps the pin."""
    from pyspark.sql import Window as W

    n = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    e = (edges.select("src", "dst")
              .repartition(n, "src")
              .dropDuplicates(["src", "dst"])
              .withColumn("outdeg", F.count("*").over(W.partitionBy("src")))
              .persist())
    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node"))).distinct()
              .persist())
    return e, nodes


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85, complete: bool = False) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Nodes are the union of src and dst; every rank update is
    r'(n) = (1-d)/N + d · Σ_{(m,n)∈E} r(m)/outdeg(m).  Dangling nodes
    (no out-edges) simply leak their mass — callers that need the
    strict stochastic fix symmetrize the edge list or add a dangling
    redistribution term; the oracle-checked query symmetrizes.

    ``complete=True`` asserts every node has at least one IN-edge
    (true for any symmetrized graph: each node's out-edge is its
    in-edge flipped), which lets each iteration emit the new ranks
    straight off the contribution aggregate instead of left-joining
    the node table to fill never-occurring zero rows — one fewer
    node-keyed shuffle per iteration, identical results whenever the
    precondition holds.

    Returns ``(node, rank)``."""
    e, nodes = _pagerank_invariants(edges)
    # N and the teleport term are scalar: computed once, broadcast into
    # every iteration as a 1-row cross join (no driver round-trip)
    n_row = nodes.agg(F.count("*").alias("__n"))
    ranks = (nodes.crossJoin(F.broadcast(n_row))
                  .select("node", (F.lit(1.0) / F.col("__n")).alias("rank")))
    for _ in range(iterations):
        contrib = (e.join(ranks.withColumnRenamed("node", "src"), "src")
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("outdeg")).alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("__in"))
        if complete:
            ranks = (summed.crossJoin(F.broadcast(n_row))
                           .select("node",
                                   ((1.0 - damping) / F.col("__n")
                                    + damping * F.col("__in")).alias("rank")))
            continue
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
    for t in (e, nodes):
        t.unpersist()
    return out


def wedge_pairs_arrow(adjl: DataFrame, nbrs_col: str = "nbrs",
                      payload_col: str = "wq",
                      max_pairs_per_chunk: int = 1 << 21) -> DataFrame:
    """Columnar wedge-pair emit: for each row carrying a SORTED array of
    distinct BIGINT neighbour ids plus one BIGINT payload, emit every
    unordered pair ``(v < w)`` of that array with the payload attached —
    the fan-out step of wedge-counting algorithms (Adamic-Adar, common-
    neighbour scoring) where the middle node's neighbourhood expands to
    C(d, 2) candidate rows.

    Why Arrow and not an expression rewrite or a self-join (guide §4.2):
    the expression-level HOF emit (``transform``/``flatten`` lambdas) is
    INTERPRETED per element — measured 25 s vs 7 s at deg ≤ 64 fan-out
    (~2000 structs per middle) in r12; the codegen self-join pays a
    join build + the full wedge multiset through an exchange.  Here the
    grouped adjacency crosses the Python boundary ONCE (narrow: one
    array + one long per middle), and the quadratic expansion runs as
    a handful of NumPy gathers per batch — rows are bucketed by degree
    so each distinct d expands as one vectorized ``triu_indices``
    gather over a (rows, d) matrix, never a per-row Python loop.

    Contract: arrays must be sorted ascending and duplicate-free
    (``array_sort(collect_list(...))`` over distinct edges) — sortedness
    is what guarantees v < w positionally with zero comparisons.  Output
    chunks are capped at ``max_pairs_per_chunk`` rows so a batch of
    deg-64 middles (2016 pairs each) cannot materialize an unbounded
    record batch.  Returns ``(v, w, <payload_col>)``, all BIGINT."""
    import pyarrow as pa

    import numpy as np

    def emit(batches):
        for b in batches:
            nb = b.column(0)
            if isinstance(nb, pa.ChunkedArray):  # defensive: combine
                nb = nb.combine_chunks()
            offs = nb.offsets.to_numpy().astype(np.int64)
            flat = nb.values.to_numpy()
            payv = b.column(1).to_numpy()
            starts = offs[:-1]
            sizes = offs[1:] - starts
            npairs = sizes * (sizes - 1) // 2
            cum = np.cumsum(npairs)
            lo, n = 0, len(sizes)
            while lo < n:
                base = cum[lo - 1] if lo else 0
                hi = int(np.searchsorted(cum, base + max_pairs_per_chunk,
                                         side="right"))
                hi = max(hi, lo + 1)
                vs, ws, ps = [], [], []
                seg = sizes[lo:hi]
                for d in np.unique(seg):
                    if d < 2:
                        continue
                    rows = np.nonzero(seg == d)[0] + lo
                    mat = flat[starts[rows][:, None]
                               + np.arange(d)[None, :]]
                    iu, ju = np.triu_indices(d, 1)
                    vs.append(mat[:, iu].ravel())
                    ws.append(mat[:, ju].ravel())
                    ps.append(np.repeat(payv[rows], len(iu)))
                if vs:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(np.concatenate(vs)),
                         pa.array(np.concatenate(ws)),
                         pa.array(np.concatenate(ps))],
                        ["v", "w", payload_col])
                lo = hi

    # project to exactly the two columns the kernel reads (§4.1: Spark
    # cannot see inside the function and would ship everything)
    return adjl.select(nbrs_col, payload_col).mapInArrow(
        emit, f"v long, w long, {payload_col} long")


def triangle_counts(edges: DataFrame,
                    assume_canonical: bool = False) -> DataFrame:
    """Per-node triangle counts over an undirected edge list ``(a, b)``
    via degree orientation — the standard O(m^1.5) distributed triangle
    algorithm (each edge is directed from its lower-(degree, id)
    endpoint, so every triangle has exactly ONE apex with two out-edges
    and the wedge join fans out by oriented out-degree ≤ √(2m) instead
    of raw degree; the hub that breaks the naive a<b<c join is exactly
    the node the orientation demotes to wedge-closing duty).

    Input may contain duplicates/self-loops/either direction; it is
    canonicalized first.  Returns ``(node, triangles)`` for every node
    incident to ≥1 edge (0 rows for isolated nodes — callers outer-join
    their node table if they need zeros).  Three shuffles total: the
    degree agg, the wedge self-join, the closing-edge semi-join; per-
    node reduce is map-side combined.  Nothing driver-side."""
    # und feeds TWO consumers (the degree aggregate and the orientation
    # join) — persist it, or the canonicalizing distinct replays.  With
    # assume_canonical the caller vouches the input is already the
    # deduped a<b set (and manages its own caching — typically it
    # persisted the frame because it reuses it too), so the extra
    # distinct exchange is skipped outright.
    own_cache = not assume_canonical
    if assume_canonical:
        und = edges.select("a", "b")
    else:
        und = (edges.select(F.least("a", "b").alias("a"),
                            F.greatest("a", "b").alias("b"))
                    .where(F.col("a") != F.col("b"))
                    .distinct().persist())
        # materialize BEFORE the consumers fan out: a lazily-persisted
        # frame read by concurrent stages of one action is recomputed by
        # every racing stage until a block lands in the cache
        und.count()
    deg = (und.select(F.col("a").alias("node"))
              .unionAll(und.select(F.col("b").alias("node")))
              .groupBy("node").agg(F.count("*").alias("deg")))
    # persist: the oriented edge table is read three times (two wedge
    # legs + closing side) — without it the degree shuffle replays 3×
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    lower_first = ((F.col("dega") < F.col("degb"))
                   | ((F.col("dega") == F.col("degb"))
                      & (F.col("a") < F.col("b"))))
    o = (und.join(da, "a").join(db, "b")
            .select(F.when(lower_first, F.col("a")).otherwise(F.col("b"))
                    .alias("src"),
                    F.when(lower_first, F.col("b")).otherwise(F.col("a"))
                    .alias("dst"),
                    F.when(lower_first, F.col("dega")).otherwise(F.col("degb"))
                    .alias("sdeg"),
                    F.when(lower_first, F.col("degb")).otherwise(F.col("dega"))
                    .alias("ddeg"))
            .persist())
    o.count()  # eager: three racing consumers (two wedge legs + closing)
    # wedges at the apex u: pairs of out-neighbours (v, w), canonical in
    # the SAME (deg, id) order the orientation uses, so the closing edge
    # is guaranteed oriented v→w and ONE semi-join finds it
    l1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                  F.col("ddeg").alias("vdeg"))
    l2 = o.select(F.col("src").alias("u"), F.col("dst").alias("w"),
                  F.col("ddeg").alias("wdeg"))
    wedge = (l1.join(l2, "u")
               .where((F.col("vdeg") < F.col("wdeg"))
                      | ((F.col("vdeg") == F.col("wdeg"))
                         & (F.col("v") < F.col("w")))))
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedge.join(closing, ["v", "w"], "leftsemi").select("u", "v", "w")
    out = (tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
              .groupBy("node").agg(F.count("*").alias("triangles")))
    out = out.persist()
    out.count()
    o.unpersist()
    if own_cache:
        und.unpersist()
    return out


def k_core_peel(edges: DataFrame, k: int, rounds: int,
                assume_canonical: bool = False) -> DataFrame:
    """Fixed-round k-core peeling over an undirected edge list
    ``(a, b)``: each round drops every node whose CURRENT degree is
    below k, plus all its edges, and recomputes degrees — the standard
    iterative core-decomposition step (full convergence iterates until
    stable; a FIXED round count keeps the computation a deterministic,
    engine-replayable plan, same policy as the PageRank/dedup-cluster
    bounded loops).  Returns ``(node, deg)`` for the nodes still
    meeting the threshold after ``rounds`` peels, with their degree in
    the surviving subgraph.

    Scale: each round is one degree aggregation (shuffle on node id)
    plus two semi-joins to drop edges — no step holds more than the
    edge table, nothing is collected.  Each round's edge table goes
    through an EAGER ``localCheckpoint()``: round i references e_{i-1}
    three times (both union legs of the degree agg + the semi-join
    source), so pure lineage re-evaluates the base subtree ~3^rounds
    times, and even persist() is not enough — the cache keeps the FULL
    logical plan for cache-key matching, whose canonicalization over
    the 3^r-node tree OOMed the driver at 5 rounds.  localCheckpoint
    truncates the plan itself to the materialized RDD, so every round
    starts from a flat scan.  (Executor-loss caveat: localCheckpoint
    blocks are not recomputable; a fault-tolerant production run uses
    reliable checkpoint() to durable storage instead.)"""
    if assume_canonical:
        # caller vouches the input is already the deduped a<b set —
        # skip the canonicalizing distinct (one full edge shuffle)
        e = edges.select("a", "b").localCheckpoint()
    else:
        e = (edges.select(F.least("a", "b").alias("a"),
                          F.greatest("a", "b").alias("b"))
                  .where(F.col("a") != F.col("b"))
                  .distinct()).localCheckpoint()
    for _ in range(rounds):
        deg = (e.select(F.col("a").alias("node"))
                .unionAll(e.select(F.col("b").alias("node")))
                .groupBy("node").agg(F.count("*").alias("deg")))
        keep = deg.where(F.col("deg") >= k).select("node")
        e = (e.join(keep.withColumnRenamed("node", "a"), "a", "leftsemi")
              .join(keep.withColumnRenamed("node", "b"), "b", "leftsemi")
              .select("a", "b")).localCheckpoint()
    deg = (e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count("*").alias("deg")))
    return deg.where(F.col("deg") >= k)


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Fixed-round synchronous label propagation (community detection)
    over an undirected edge list ``(a, b)``: every node starts with its
    own id as the label; each round it adopts the most frequent label
    among its neighbours, ties broken toward the SMALLEST label — the
    deterministic variant (plain LPA tie-breaks randomly, which no
    cross-engine oracle could replay).  Fixed rounds, same policy as
    ``k_core_peel``/``pagerank``.

    Returns ``(node, label)``.  One shuffle per round: edges ⋈ labels
    on the neighbour key, then a (node, label) count and a max_by
    reduce — label tables are node-sized, nothing collects.  Lineage
    is linear in rounds (each label table feeds the next exactly once)
    so no checkpoint is required at bounded rounds."""
    e = (edges.select(F.least("a", "b").alias("a"),
                      F.greatest("a", "b").alias("b"))
              .where(F.col("a") != F.col("b"))
              .distinct())
    sym = (e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(e.select(F.col("b").alias("src"),
                               F.col("a").alias("dst"))))
    lab = (sym.select(F.col("src").alias("node")).distinct()
              .withColumn("lbl", F.col("node")))
    for _ in range(rounds):
        votes = (sym.join(lab.withColumnRenamed("node", "dst"), "dst")
                    .groupBy(F.col("src").alias("node"), "lbl")
                    .agg(F.count("*").alias("c")))
        lab = votes.groupBy("node").agg(
            F.max_by("lbl", F.struct(F.col("c"),
                                     (-F.col("lbl")).alias("n"))).alias("lbl"))
    return lab.select("node", F.col("lbl").alias("label"))


def cc_large_small_star(edges: DataFrame, nodes: DataFrame | None = None,
                        id_a: str = "a", id_b: str = "b",
                        max_rounds: int = 12) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the O(log n)-round variant the min-label loop in
    ``dedup.dedup_clusters`` defers to for high-diameter graphs: label
    propagation needs DIAMETER rounds (a 10⁶-node path = 10⁶ shuffles),
    star contraction squares progress each alternation.

    large-star: every node u points its LARGER neighbours at
    m = min(Γ(u) ∪ {u}); small-star: its smaller-or-equal neighbours.
    The edge set contracts toward stars rooted at component minima; at
    the fixpoint every edge is (root, member).

    Returns ``(node, cluster_id)`` with cluster_id = the component's
    minimum node id (singletons keep their own id — same contract as
    ``dedup_clusters``).  Each half-round is one groupBy shuffle on the
    node key plus one join; edge tables stay distributed end-to-end and
    the only driver action is the bounded early-exit probe (one
    ``limit(1).count()`` per round, the dedup_clusters convention).
    ``localCheckpoint`` truncates the per-round lineage exactly as the
    iterative operators in this module do."""
    base = (edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
                 .where(F.col("u").isNotNull() & F.col("v").isNotNull()
                        & (F.col("u") != F.col("v"))))
    e = (base.select(F.least("u", "v").alias("u"),
                     F.greatest("u", "v").alias("v"))
             .distinct().persist())
    e_cnt = e.count()

    def _star(cur: DataFrame, large: bool, dedup: bool = True) -> DataFrame:
        # m = min(Γ(u) ∪ {u}) rides a whole-partition window over the
        # SAME hash(u) shuffle that feeds the neighbour rows, instead of
        # a groupBy + self-join back on u: one exchange + one in-place
        # sort per star where the join formulation paid the aggregate
        # exchange, the join sort AND the hash-relation build (the
        # small-star extra (u, m) leg now emits once per neighbour and
        # lets the closing distinct dedup it — same set, no extra pass).
        # ``dedup=False`` defers the closing distinct: the consumer's
        # window-min is multiset-invariant, so the large-star half of a
        # round skips its dedup exchange outright and the round's single
        # distinct (on the small-star output) restores the set.
        from pyspark.sql import Window as W

        sym = cur.select("u", "v").unionAll(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        nbrs = sym.withColumn(
            "m", F.least(F.col("u"), F.min("v").over(W.partitionBy("u"))))
        keep = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        out = (nbrs.where(keep)
                   .select(F.col("v").alias("a"), F.col("m").alias("b")))
        if not large:
            out = out.unionAll(nbrs.select(F.col("u").alias("a"),
                                           F.col("m").alias("b")))
        out = (out.where(F.col("a") != F.col("b"))
                  .select(F.least("a", "b").alias("u"),
                          F.greatest("a", "b").alias("v")))
        return out.distinct() if dedup else out

    for _ in range(max_rounds):
        nxt = _star(_star(e, large=True, dedup=False),
                    large=False).localCheckpoint()
        # equal-cardinality distinct sets with an empty one-sided
        # difference ARE equal — one count (free on the checkpointed
        # table) plus at most one bounded anti probe per round
        nxt_cnt = nxt.count()
        changed = (nxt_cnt != e_cnt
                   or nxt.exceptAll(e).limit(1).count() > 0)
        e.unpersist()
        e, e_cnt = nxt, nxt_cnt
        if not changed:
            break
    # at the fixpoint e is a star set: min(Γ(u) ∪ {u}) IS the component
    # minimum for every member, and the root's own min is itself
    sym = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (sym.groupBy(F.col("u").alias("node"))
                 .agg(F.min("v").alias("__mn"))
                 .select("node", F.least("node", "__mn").alias("cluster_id")))
    if nodes is not None:
        labels = (nodes.select(F.col(nodes.columns[0]).alias("node"))
                       .distinct()
                       .join(labels, "node", "left")
                       .select("node", F.coalesce("cluster_id", "node")
                               .alias("cluster_id")))
    e.unpersist()
    return labels
