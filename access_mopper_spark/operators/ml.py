"""Distributed classical-ML training/inference as DataFrame algebra.

The reference pipeline stops at data curation; a training-data engine
sitting in front of an LLM run also needs the cheap classical models
that curation itself uses — a fastText-style linear quality classifier
(trained ON the cluster, applied map-only) and a kNN labeler over the
embedding table.  Both are expressed as pure DataFrame plans:

- ``logreg_train``: full-batch gradient descent where each iteration is
  ONE map-side-combined aggregation producing the (dim+1)-value
  gradient; the weight vector lives in a 1-row DataFrame that is
  broadcast back into the next pass (the pagerank pattern — no
  ``collect``, no driver round-trip, so the same plan runs with 10⁹
  rows).  Iterations are unrolled into a single lazy plan.
- ``knn_classify``: brute-force cosine top-k via the salted two-phase
  ``partial_topk`` (no single-reducer sort), then a per-query majority
  vote — two bounded shuffles after the one corpus scan.

Determinism contract (oracle parity): weights are snapped to the 1e-6
grid (portable floor rounding) at every iteration boundary, so both
engines thread EXACTLY the same weight vector into the next pass and
the only float noise left is one aggregation's summation order —
absorbed by the same rounding.  Sign tests (prediction = σ(z) > 0.5 ⇔
z > 0) are exact, making accuracy counts integer-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from access_mopper_spark.functions.rounding import pround
from access_mopper_spark.operators.similarity import (as_double, cosine,
                                                      partial_topk)


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(df: DataFrame, feature_cols: list[str], label_col: str,
                 iterations: int = 3, lr: float = 0.5) -> DataFrame:
    """Full-batch logistic-regression GD, iterations unrolled into one
    plan.  Returns a 1-row DataFrame ``(w_0 … w_d, bias)`` (weights on
    the 1e-6 grid).

    Each iteration re-scans the (cached by the caller if desired)
    feature table once and reduces to dim+1 numbers — the map-side
    partial aggregation means only |partitions|·(dim+1) values ever
    move, identical at 500 rows or 100 TB.  The 1-row weight table
    joins back via broadcast crossJoin, never ``collect``.
    """
    d = len(feature_cols)
    feats = df.select(*[F.col(c).cast("double").alias(f"x{i}")
                        for i, c in enumerate(feature_cols)],
                      F.col(label_col).cast("double").alias("y"))
    # w starts at the exact zero vector — a literal 1-row frame
    w = feats.sparkSession.range(1).select(
        *[F.lit(0.0).alias(f"w{i}") for i in range(d)],
        F.lit(0.0).alias("b"))
    for _ in range(iterations):
        joined = feats.crossJoin(F.broadcast(w))
        z = F.col("b")
        for i in range(d):
            z = z + F.col(f"x{i}") * F.col(f"w{i}")
        err = _sigmoid(z) - F.col("y")
        grads = joined.agg(
            *[pround(F.sum(err * F.col(f"x{i}"))
                     / F.count("*").cast("double"), 6)
              .alias(f"g{i}") for i in range(d)],
            pround(F.sum(err) / F.count("*").cast("double"), 6).alias("gb"),
            # carry the previous weights through the agg (constant per
            # row — F.first is exact)
            *[F.first(f"w{i}").alias(f"pw{i}") for i in range(d)],
            F.first("b").alias("pb"))
        w = grads.select(
            *[pround(F.col(f"pw{i}") - F.lit(lr) * F.col(f"g{i}"), 6)
              .alias(f"w{i}") for i in range(d)],
            pround(F.col("pb") - F.lit(lr) * F.col("gb"), 6).alias("b"))
    return w


def logreg_apply(df: DataFrame, w: DataFrame, feature_cols: list[str],
                 label_col: str, id_col: str) -> DataFrame:
    """Map-only scoring with a broadcast 1-row weight table: returns
    ``(id, y, pred)`` where pred = 1 iff z > 0 (exact sign test — no
    float-boundary hash risk)."""
    d = len(feature_cols)
    feats = df.select(F.col(id_col), F.col(label_col).cast("int").alias("y"),
                      *[F.col(c).cast("double").alias(f"x{i}")
                        for i, c in enumerate(feature_cols)])
    joined = feats.crossJoin(F.broadcast(w))
    z = F.col("b")
    for i in range(d):
        z = z + F.col(f"x{i}") * F.col(f"w{i}")
    return joined.select(id_col, "y",
                         F.when(z > 0, 1).otherwise(0).alias("pred"))


def knn_classify(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label",
                 query_id_col: str = "query_id") -> DataFrame:
    """kNN majority-vote labeling: each query's cosine top-k corpus
    neighbours vote; ties break (votes DESC, label ASC).  Returns
    ``(query_id, pred_label, n_votes)``.

    Scale shape: ONE corpus scan scores all queries per Arrow batch
    with a single BLAS GEMM (Xn @ Qnᵀ) and keeps only each batch's
    per-query top-k (≤ |queries|·k rows leave every batch — the
    61M-pair row explosion of the naive crossJoin never materializes;
    measured 246 s → seconds at the ×10 sweep point), then the salted
    two-phase top-k merges batch winners and the vote is a
    ≤ |queries|·k aggregation.  The query side is bounded by contract
    (annotation batches) — a guard refuses silent broadcast blowups.
    Neighbour rank snaps cosine to the 1e-6 grid with an id tie-break
    so both engines pick identical neighbour sets."""
    import numpy as np
    import pandas as pd

    from access_mopper_spark.operators.partitioning import \
        ensure_min_partitions

    from access_mopper_spark.operators.similarity import nonzero_norm

    label_type = dict(corpus.dtypes)[label_col]
    cid_type = dict(corpus.dtypes)[id_col]
    qid_type = dict(queries.dtypes)[query_id_col]
    out_schema = (f"{query_id_col} {qid_type}, {id_col} {cid_type}, "
                  f"{label_col} {label_type}, __sim double")

    max_queries = 100_000
    qrows = (queries.select(F.col(query_id_col),
                            as_double(F.col(vec_col)).alias("__qv"))
             .where(nonzero_norm(F.col("__qv")))
             .limit(max_queries + 1).collect())
    if len(qrows) > max_queries:
        raise ValueError(
            f"knn_classify: > {max_queries} queries — broadcast GEMM "
            "scoring no longer applies; block the query side "
            "(similarity.cosine_pairs_blocked) instead")
    if not qrows:
        empty = corpus.sparkSession.createDataFrame([], out_schema)
        return empty.select(query_id_col,
                            F.col(label_col).alias("pred_label"),
                            F.lit(0).cast("long").alias("n_votes"))
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype="float64")
    qnorm = np.linalg.norm(qmat, axis=1)

    # an unlabeled corpus row cannot vote (and a NULL label in the
    # vote tie-break orders NULLS FIRST on Spark, NULLS LAST on DuckDB)
    c = ensure_min_partitions(
        corpus.select(F.col(id_col), F.col(label_col),
                      as_double(F.col(vec_col)).alias("__cv"))
              .where(nonzero_norm(F.col("__cv"))
                     & F.col(label_col).isNotNull()))

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["__cv"]), dtype="float64")
            # dot(x,q)/(|x||q|) in the ORACLE's formula order (divide the
            # GEMM dot by the norm product, not pre-normalized rows) so
            # the 1e-6 snap sees the same float as DuckDB's
            # list_cosine_similarity replay; residual exposure is only
            # BLAS summation order inside the dot itself.
            xnorm = np.linalg.norm(x, axis=1)
            sims = np.floor((x @ qmat.T) / np.outer(xnorm, qnorm)
                            * 1e6 + 0.5) / 1e6  # pround grid
            cids = pdf[id_col].to_numpy()
            labels = pdf[label_col].to_numpy()
            kk = min(k, len(pdf))
            # batch-local top-k per query under the GLOBAL order
            # (sim desc, id asc): global top-k ⊆ union of batch top-ks.
            # lexsort can't take object arrays — sort string ids as 'U'.
            sort_ids = (cids.astype("U") if cids.dtype == object else cids)
            order = np.lexsort((sort_ids[:, None].repeat(len(qids), 1),
                                -sims), axis=0)[:kk]
            out_q = np.repeat(qids[None, :], kk, axis=0).ravel()
            rows = order.ravel()
            cols = np.tile(np.arange(len(qids)), kk)
            yield pd.DataFrame({
                query_id_col: out_q,
                id_col: cids[rows],
                label_col: labels[rows],
                "__sim": sims[rows, cols]})

    scored = c.mapInPandas(score_batches, out_schema)
    nn = partial_topk(scored, [query_id_col],
                      [F.col("__sim").desc(), F.col(id_col)], k)
    votes = nn.groupBy(query_id_col, label_col).agg(
        F.count("*").alias("n_votes"))
    best = partial_topk(votes, [query_id_col],
                        [F.col("n_votes").desc(), F.col(label_col)], 1)
    return best.select(query_id_col,
                       F.col(label_col).alias("pred_label"), "n_votes")


def hard_negatives(corpus: DataFrame, anchors: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   anchor_id_col: str = "anchor_id") -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the cosine top-k corpus rows whose label DIFFERS from the anchor's —
    the near-miss negatives that carry the gradient signal (the
    retrieval/embedding-training companion to ``knn_classify``).
    Returns ``(anchor_id, vec_id, label, sim)``, k rows per anchor.

    Scale shape mirrors knn_classify: anchors (bounded, guarded)
    broadcast into a single-corpus-scan Arrow GEMM; same-label pairs are
    masked BEFORE the batch-local top-k, so each batch emits ≤
    |anchors|·k rows and the global top-k is a salted two-phase merge —
    the |corpus|×|anchors| pair table never materializes.  Similarity
    snaps to the 1e-6 grid with an id tie-break (identical neighbour
    sets on both engines)."""
    import numpy as np
    import pandas as pd

    from access_mopper_spark.operators.partitioning import \
        ensure_min_partitions
    from access_mopper_spark.operators.similarity import nonzero_norm

    label_type = dict(corpus.dtypes)[label_col]
    cid_type = dict(corpus.dtypes)[id_col]
    aid_type = dict(anchors.dtypes)[anchor_id_col]
    out_schema = (f"{anchor_id_col} {aid_type}, {id_col} {cid_type}, "
                  f"{label_col} {label_type}, sim double")

    max_anchors = 100_000
    arows = (anchors.select(F.col(anchor_id_col), F.col(label_col),
                            as_double(F.col(vec_col)).alias("__av"))
             .where(nonzero_norm(F.col("__av"))
                    & F.col(label_col).isNotNull())
             .limit(max_anchors + 1).collect())
    if len(arows) > max_anchors:
        raise ValueError(
            f"hard_negatives: > {max_anchors} anchors — broadcast GEMM "
            "no longer applies; block the anchor side "
            "(similarity.cosine_pairs_blocked) instead")
    spark = corpus.sparkSession
    if not arows:
        return spark.createDataFrame([], out_schema)
    aids = np.array([r[0] for r in arows])
    alabels = np.array([r[1] for r in arows])
    amat = np.array([r[2] for r in arows], dtype="float64")
    anorm = np.linalg.norm(amat, axis=1)

    c = ensure_min_partitions(
        corpus.select(F.col(id_col), F.col(label_col),
                      as_double(F.col(vec_col)).alias("__cv"))
              .where(nonzero_norm(F.col("__cv"))
                     & F.col(label_col).isNotNull()))

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["__cv"]), dtype="float64")
            xnorm = np.linalg.norm(x, axis=1)
            # oracle formula order (dot / norm-product), then 1e-6 snap
            sims = np.floor((x @ amat.T) / np.outer(xnorm, anorm)
                            * 1e6 + 0.5) / 1e6
            labels = pdf[label_col].to_numpy()
            # mask SAME-label pairs below any real cosine so they can
            # never enter the top-k; leftovers are filtered after select
            sims = np.where(labels[:, None] == alabels[None, :],
                            -9.0, sims)
            cids = pdf[id_col].to_numpy()
            kk = min(k, len(pdf))
            sort_ids = (cids.astype("U") if cids.dtype == object else cids)
            order = np.lexsort((sort_ids[:, None].repeat(len(aids), 1),
                                -sims), axis=0)[:kk]
            rows = order.ravel()
            cols = np.tile(np.arange(len(aids)), kk)
            picked = sims[rows, cols]
            ok = picked > -2.0  # batches with < k different-label rows
            yield pd.DataFrame({
                anchor_id_col: np.repeat(aids[None, :], kk, axis=0)
                                 .ravel()[ok],
                id_col: cids[rows][ok],
                label_col: labels[rows][ok],
                "sim": picked[ok]})

    scored = c.mapInPandas(score_batches, out_schema)
    return partial_topk(scored, [anchor_id_col],
                        [F.col("sim").desc(), F.col(id_col)], k) \
        .select(anchor_id_col, id_col, label_col, "sim")


def pca_power_iteration(gram_upper: DataFrame, dim: int,
                        iterations: int = 3) -> DataFrame:
    """Leading principal component by power iteration over a
    PRE-REDUCED Gram matrix — the scale pattern for PCA on billion-row
    embedding tables: the corpus is touched ONCE (similarity.
    embedding_covariance's per-batch GEMM → dim² scalars) and every
    iteration after that runs on the dim×dim matrix, never the data.

    ``gram_upper`` is the (i, j, s) upper triangle with s ALREADY
    snapped to the 1e-6 grid (the repo's aggregated-double contract);
    each iteration re-snaps the matvec, the norm and the normalized
    vector, so both engines walk identical grid points (the
    logreg_train convention) and the result is cross-engine stable.

    Returns ``(i, loading, eigenvalue)`` — the unit leading eigenvector
    and its Rayleigh-quotient eigenvalue.  Everything is DataFrame
    algebra on dim-sized tables: no collect, no driver math; on a
    cluster the iteration cost is independent of corpus size."""
    up = gram_upper.select("i", "j", "s")
    # localCheckpoint(eager) MATERIALIZES the ≤ dim² mirrored Gram now:
    # a lazy persist would leave the corpus-scanning Gram subtree live
    # in the returned plan, and the ~2·iterations+2 references below
    # would each re-scan the corpus when the caller finally materializes
    # (the r7 PLANS.md repeated-MapInPandas bug).  After this line every
    # iteration is dim-sized algebra, corpus touched exactly once.
    m = up.unionByName(
        up.where(F.col("i") < F.col("j"))
          .select(F.col("j").alias("i"), F.col("i").alias("j"), "s")) \
        .localCheckpoint(eager=True)
    # v0 = uniform unit vector; 1/sqrt(dim) is exact for power-of-two dim
    v = m.select(F.col("i").alias("idx")).distinct() \
         .withColumn("val", F.lit(1.0 / (dim ** 0.5)))
    for _ in range(iterations):
        w = (m.join(v.withColumnRenamed("idx", "j"), "j")
              .groupBy(F.col("i").alias("idx"))
              .agg(pround(F.sum(F.col("s") * F.col("val")), 6).alias("w")))
        n2 = w.agg(pround(F.sum(F.col("w") * F.col("w")), 6).alias("n2"))
        v = (w.crossJoin(F.broadcast(n2))
              .select("idx", pround(F.col("w") / F.sqrt(F.col("n2")), 6)
                      .alias("val")))
    wf = (m.join(v.withColumnRenamed("idx", "j"), "j")
           .groupBy(F.col("i").alias("idx"))
           .agg(pround(F.sum(F.col("s") * F.col("val")), 6).alias("w")))
    lam = (v.join(wf, "idx")
            .agg(pround(F.sum(F.col("val") * F.col("w")), 6)
                 .alias("eigenvalue")))
    out = (v.crossJoin(F.broadcast(lam))
            .select(F.col("idx").alias("i"), F.col("val").alias("loading"),
                    "eigenvalue"))
    m.unpersist()
    return out


def kmeans_parallel_init(corpus: DataFrame, rounds: int = 2,
                         oversample: int = 4, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         salt: str = "kmpp") -> DataFrame:
    """k-means|| oversampling initialization (Bahmani et al., VLDB
    2012) — the distributed replacement for k-means++'s inherently
    sequential seeding: instead of k passes picking one center each,
    O(log φ) rounds each sample ~``oversample`` points with probability
    ∝ their squared distance to the current candidate set, then the
    small weighted candidate set is handed to any local k-means++.

    Determinism: the seed candidate is the minimum-id vector; the
    per-round coin is the md5-uniform of (salt, round, id) against
    u·φ < oversample·d² — a pure function of the data, so any engine
    replays the identical candidate sequence (no RNG).  Per-pair d²
    snaps to the 1e-6 grid before the min/φ/threshold arithmetic (the
    PQ-oracle convention), keeping both engines on one grid.

    Returns the candidate set with weights ``(cand_id, n_points)`` —
    n_points = corpus points whose nearest candidate it is (ties to
    the smaller candidate id), the weight k-means++ consumes.

    Scale shape: candidates BROADCAST every round (|C| ≤ 1 +
    rounds·O(oversample) by construction), distances are map-only, φ
    is one scalar aggregate — the corpus shuffles ZERO times; the
    final weighting is the same broadcast probe plus one grouped
    count."""
    from access_mopper_spark.operators.similarity import _sq_l2, as_double

    pts = corpus.select(F.col(id_col).alias("pid"),
                        as_double(F.col(vec_col)).alias("pv"))
    cand = (pts.orderBy("pid").limit(1)
               .select(F.col("pid").alias("cid"), F.col("pv").alias("cv")))
    cached = []
    for r in range(1, rounds + 1):
        d2 = (pts.crossJoin(F.broadcast(cand))
                 .select("pid", "pv",
                         pround(_sq_l2(F.col("pv"), F.col("cv")), 6)
                         .alias("d2"))
                 .groupBy("pid", "pv").agg(F.min("d2").alias("dmin")))
        phi = d2.agg(pround(F.sum("dmin"), 6).alias("phi"))
        u = (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{salt}:{r}:"),
                               F.col("pid").cast("string"))), 1, 8),
                16, 10).cast("double") / F.lit(4294967296.0))
        picked = (d2.crossJoin(F.broadcast(phi))
                    .where(u * F.col("phi")
                           < F.lit(float(oversample)) * F.col("dmin"))
                    .select(F.col("pid").alias("cid"),
                            F.col("pv").alias("cv")))
        cand = cand.unionByName(picked).persist()
        cached.append(cand)
    assign = (pts.crossJoin(F.broadcast(cand))
                 .select("pid", "cid",
                         pround(_sq_l2(F.col("pv"), F.col("cv")), 6)
                         .alias("d2")))
    from pyspark.sql import Window
    w = Window.partitionBy("pid").orderBy("d2", "cid")
    nearest = (assign.withColumn("rn", F.row_number().over(w))
                     .where(F.col("rn") == 1))
    out = (nearest.groupBy(F.col("cid").alias("cand_id"))
                  .agg(F.count("*").alias("n_points"))
                  .persist())
    out.count()  # materialize, then release the per-round candidate caches
    for c in cached:
        c.unpersist()
    return out


def bt_rating(comps: DataFrame, iterations: int = 3, lr: float = 1.0,
              a_col: str = "a", b_col: str = "b",
              w_col: str = "w") -> DataFrame:
    """Bradley-Terry rating from pairwise preferences — the model
    behind RLHF preference-data curation (rank responses/annotators
    from win/loss pairs; p(a beats b) = sigmoid(r_a - r_b)).  Full-batch
    gradient ascent, ``iterations`` unrolled: each round joins the
    comparisons against the BROADCAST rating table (items are few,
    comparisons are the 100 TB side), explodes each comparison into two
    signed residuals, and reduces them map-side to one mean gradient
    per item.  Ratings snap to the 1e-6 grid per round (the
    logreg_train convention) so an oracle replay threads bit-identical
    doubles; each round's rating table is eagerly localCheckpoint-ed
    (the pca_power pattern — the comparison scan runs once per round,
    never once per downstream reference).

    ``comps``: (a, b, w) with w = 1.0 when a wins, 0.0 when b wins.
    Returns one row per item: (item, r).
    """
    items = (comps.select(F.col(a_col).alias("item"))
             .unionByName(comps.select(F.col(b_col).alias("item")))
             .distinct())
    r = items.withColumn("r", F.lit(0.0)).localCheckpoint(eager=True)
    for _ in range(iterations):
        ra = r.select(F.col("item").alias(a_col), F.col("r").alias("__ra"))
        rb = r.select(F.col("item").alias(b_col), F.col("r").alias("__rb"))
        e = comps.join(F.broadcast(ra), a_col).join(F.broadcast(rb), b_col)
        err = (F.col(w_col)
               - F.lit(1.0) / (F.lit(1.0)
                               + F.exp(-(F.col("__ra") - F.col("__rb")))))
        signed = (e.select(F.col(a_col).alias("item"), err.alias("__e"))
                  .unionByName(e.select(F.col(b_col).alias("item"),
                                        (-err).alias("__e"))))
        g = signed.groupBy("item").agg(
            pround(F.sum("__e") / F.count("*").cast("double"), 6)
            .alias("__g"))
        r = (r.join(g, "item", "left")
             .select("item",
                     pround(F.col("r")
                            + F.lit(lr) * F.coalesce(F.col("__g"),
                                                     F.lit(0.0)),
                            6).alias("r"))
             .localCheckpoint(eager=True))
    return r


def annotator_bias(votes: DataFrame, item_col: str = "item",
                   annotator_col: str = "annotator",
                   vote_col: str = "vote") -> DataFrame:
    """Per-annotator bias vs consensus — the preference-data QC readout
    next to inter-annotator kappa (cohens_kappa) and label-conflict
    detection: for each annotator, how often do they agree with the
    strict-majority consensus of the items they judged, and how much
    more (or less) often do they vote positive than that consensus?
    An annotator whose agree rate is low or whose positive-rate delta
    is large is mislabeling or gaming — drop or reweight before reward
    training (builder brief: preference-data QC).

    ``votes``: one row per (item, annotator) binary judgment
    (``vote`` ∈ {0, 1}).  Consensus per item is the STRICT majority
    (ties → 0 — deterministic on any engine).  Output one row per
    annotator: ``(annotator, n_votes, n_agree, agree_bp, pos_bp,
    consensus_pos_bp, bias_bp)`` — all INTEGER (basis points via
    integer division), so the hash surface is order-free.

    Scale shape: one shuffle keyed by item for the consensus aggregate
    (items are the wide side but the aggregate is map-side combined);
    the consensus table rides back on the item key the votes already
    hash by, and the per-annotator rollup is a second map-side-combined
    aggregate on a small key space.  No windows, no floats."""
    cons = (votes.groupBy(item_col)
            .agg(((F.sum(vote_col) * 2 > F.count("*")).cast("int"))
                 .alias("__cons")))
    j = votes.join(cons, item_col)
    agree = (F.col(vote_col) == F.col("__cons")).cast("long")
    # basis points derive from the aggregated columns (one source of
    # truth per predicate; no user column names spliced into SQL text)
    agged = (j.groupBy(annotator_col)
             .agg(F.count("*").alias("n_votes"),
                  F.sum(agree).cast("long").alias("n_agree"),
                  F.sum(F.col(vote_col).cast("long")).alias("__npos"),
                  F.sum(F.col("__cons").cast("long")).alias("__ncons")))
    bp = lambda c: F.expr(f"CAST({c} * 10000 DIV n_votes AS BIGINT)")
    return agged.select(
        annotator_col, "n_votes", "n_agree",
        bp("n_agree").alias("agree_bp"),
        bp("__npos").alias("pos_bp"),
        bp("__ncons").alias("consensus_pos_bp"),
        (bp("__npos") - bp("__ncons")).cast("long").alias("bias_bp"))


def position_bias(comps: DataFrame, first_col: str = "a_shown_first",
                  winner_col: str = "a_wins",
                  group_cols: list[str] | None = None) -> DataFrame:
    """Position-bias readout for preference data: the first-shown
    response's win rate.  Unbiased annotation wins ~50% for the
    first-shown side under randomized presentation; a higher rate means
    annotators favor whatever they read first, and a reward model
    trained on it inherits the artifact (builder brief:
    preference-data QC).

    ``comps``: one row per pairwise comparison with ``a_shown_first``
    (1 = response A presented first) and ``a_wins`` (1 = A chosen).
    The first-shown side wins when the two flags agree.  Output per
    group: ``(..., n_pairs, n_first_wins, first_win_bp)`` — integer
    basis points, order-free.  One scan, one map-side-combined
    aggregate on the (small) group key."""
    first_wins = (F.col(first_col) == F.col(winner_col)).cast("long")
    keys = [F.col(c) for c in (group_cols or [])]
    g = comps.groupBy(*keys) if keys else comps.groupBy()
    return (g.agg(F.count("*").alias("n_pairs"),
                  F.sum(first_wins).cast("long").alias("n_first_wins"))
            .withColumn("first_win_bp",
                        F.expr("CAST(n_first_wins * 10000 DIV n_pairs "
                               "AS BIGINT)")))


def krippendorff_alpha_binary(votes: DataFrame, item_col: str = "item",
                              vote_col: str = "vote") -> DataFrame:
    """Krippendorff's alpha for binary nominal judgments — the
    inter-annotator reliability coefficient that, unlike Cohen's kappa
    (operators/aggregates.cohens_kappa), handles ANY number of
    annotators per item and missing judgments, which is what real
    preference-data collection looks like (items get 2-5 ratings from a
    rotating pool).

    Coincidence-matrix closed form over items with m_u ≥ 2 judgments
    (singletons are unpairable and drop out, per Krippendorff):

        alpha = 1 − (n − 1) · Σ_u [ n_u1·n_u0 / (m_u − 1) ]
                        / (n_1 · n_0)

    with n = Σ m_u pairable values, n_1/n_0 the global value counts.
    Plan: ONE map-side-combined aggregate per item (the 100 TB side),
    then a 1-row reduce — no windows, no joins.  The per-item term is
    the only float (integer ratio with denominator m_u − 1); the final
    alpha snaps to the 1e-6 grid.  Output 1 row: (n_items, n_values,
    n_pos, alpha); alpha NULL when a value class is absent (De = 0)."""
    from access_mopper_spark.functions.rounding import pround
    # missing judgments DROP (the coefficient's definition): a NULL
    # vote must not inflate m while SUM skips it — that would score the
    # phantom judgment as a 0-vote and admit unpairable singletons
    per_item = (votes.where(F.col(vote_col).isNotNull())
                .groupBy(item_col)
                .agg(F.count("*").alias("__m"),
                     F.sum(F.col(vote_col).cast("long")).alias("__n1"))
                .where(F.col("__m") >= 2))
    term = (F.col("__n1") * (F.col("__m") - F.col("__n1"))).cast("double") \
        / (F.col("__m") - 1).cast("double")
    return (per_item.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("__m").cast("long").alias("n_values"),
        F.sum("__n1").cast("long").alias("n_pos"),
        F.sum(term).alias("__S"),
    ).select(
        "n_items", "n_values", "n_pos",
        pround(
            F.when((F.col("n_pos") > 0)
                   & (F.col("n_values") - F.col("n_pos") > 0),
                   F.lit(1.0)
                   - (F.col("n_values") - 1).cast("double") * F.col("__S")
                   / (F.col("n_pos")
                      * (F.col("n_values") - F.col("n_pos"))).cast("double")),
            6).alias("alpha")))
