"""Round-4: tokenizer training, bloom decontamination, windows, histograms.

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403
from access_mopper_spark.queries.curation_dedup import _ann_lsh_oracle  # noqa: F401


# =====================================================================
# round 4 extension: tokenizer training, bloom decontamination,
# time-range windows, equi-depth stats, grouped regression,
# unicode normalization, streaming exact dedup
# =====================================================================

def _bpe_oracle(n_merges: int, final: str | None = None) -> str:
    """Chained-CTE DuckDB replay of the exact per-round BPE loop
    (operators/bpe.py): one (pair-count → argmax → replace) block per
    merge step, identical delimiter/replace semantics, identical
    (count DESC, sym_a, sym_b) tie-break.  ``final`` overrides the
    closing SELECT (default: the merge table) — q_bpe_encode points it
    at the post-merge word table instead."""
    parts = [r"""
    WITH w0 AS (
      SELECT word, COUNT(*) AS wc FROM (
        SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '), ' ')) AS word
        FROM documents
      ) WHERE length(word) > 0 GROUP BY word
    ),
    mx AS (SELECT COALESCE(MAX(length(word)), 1) AS m FROM w0),
    g AS (SELECT UNNEST(range(1, (SELECT m FROM mx))) AS i),
    s0 AS (
      SELECT word, wc,
             chr(31) || regexp_replace(word, '(.)', '\1' || chr(31), 'g') AS seq
      FROM w0
    )"""]
    for k in range(1, n_merges + 1):
        parts.append(f""",
    p{k} AS (
      SELECT arr[g.i] AS sym_a, arr[g.i + 1] AS sym_b, SUM(wc) AS pair_count
      FROM (SELECT wc, string_split(trim(seq, chr(31)), chr(31)) AS arr
            FROM s{k - 1}) t, g
      WHERE g.i <= length(arr) - 1
      GROUP BY 1, 2
    ),
    b{k} AS (
      SELECT sym_a, sym_b, pair_count FROM p{k}
      ORDER BY pair_count DESC, sym_a ASC, sym_b ASC LIMIT 1
    ),
    s{k} AS (
      SELECT word, wc,
             replace(seq, chr(31) || sym_a || chr(31) || sym_b || chr(31),
                          chr(31) || sym_a || sym_b || chr(31)) AS seq
      FROM s{k - 1}, b{k}
    )""")
    selects = [
        f"SELECT {k} AS step, sym_a, sym_b, sym_a || sym_b AS merged,"
        f" pair_count FROM b{k}"
        for k in range(1, n_merges + 1)
    ]
    tail = final if final is not None else "\n    UNION ALL ".join(selects)
    return "".join(parts) + "\n    " + tail


@query("q_bpe_train", oracle=_bpe_oracle(6))
def q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer-merge training (operators/bpe.py;
    Sennrich et al. 2016) — learn 6 merge rules over the corpus.  After
    ONE corpus tokenize+count shuffle, every iteration runs on the
    vocabulary-sized word-frequency table: a map-side-combined pair
    count plus a 1-row argmax collect, then a map-only replace.  The
    returned merge table is the artifact a tokenizer ships."""
    from access_mopper_spark.operators.bpe import bpe_train
    docs = load_table(spark, sf_dir, "documents")
    return bpe_train(spark, docs, "text", n_merges=6)


@query(
    "q_bloom_decontaminate",
    oracle="""
    WITH fps AS (
      SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
      FROM documents
    ),
    refpos AS (
      SELECT (('0x' || substring(md5('b' || h.h || ':' || fp), 1, 8))::BIGINT
              % 1024) AS pos
      FROM fps, generate_series(0, 2) h(h)
      WHERE doc_id < 40
    ),
    words AS (
      SELECT CAST(pos // 32 AS INT) AS word_idx,
             BIT_OR(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
      FROM refpos GROUP BY 1
    ),
    probes AS (
      SELECT doc_id,
             (('0x' || substring(md5('b' || h.h || ':' || fp), 1, 8))::BIGINT
              % 1024) AS pos
      FROM fps, generate_series(0, 2) h(h)
    )
    SELECT p.doc_id,
           CAST(SUM(CASE WHEN ((w.bits >> CAST(p.pos % 32 AS INT)) & 1) = 1
                         THEN 1 ELSE 0 END) AS INT) AS hits
    FROM probes p
    LEFT JOIN words w ON CAST(p.pos // 32 AS INT) = w.word_idx
    GROUP BY p.doc_id
    HAVING hits < 3
    """,
)
def q_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter decontamination (operators/bloomfilter.py): the
    held-out set (doc_id < 40) is compressed into a constant-size bit
    array (m=1024, k=3) and broadcast; the corpus side is MAP-ONLY —
    fingerprint, three bit probes against the packed map, keep docs
    missing at least one bit.  The structure that replaces
    q_decontaminate's exact fingerprint broadcast when the reference
    set has billions of entries; the oracle builds the identical filter
    so false-positive drops match bit-for-bit."""
    from access_mopper_spark.operators.bloomfilter import (
        bloom_build, bloom_decontaminate)
    docs = load_table(spark, sf_dir, "documents")
    bloom = bloom_build(docs.where(F.col("doc_id") < 40))
    return bloom_decontaminate(docs, bloom, "doc_id")


@query(
    "q_moving_avg",
    oracle="""
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           ROUND(AVG(value) OVER w, 6) AS moving_avg,
           COUNT(*) OVER w AS n_in_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                 RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING
                           AND CURRENT ROW)
    """,
)
def q_moving_avg(spark, sf_dir):
    """Trailing 30-minute moving average per user — the event-time
    RANGE window frame (operators/aggregates.time_range_mean).  One
    keyed window shuffle, O(rows) sliding-frame evaluation, ordering on
    unix_micros so sub-second timestamps bound the frame exactly as
    DuckDB's µs-precision interval frame does."""
    from access_mopper_spark.operators.aggregates import time_range_mean
    ev = load_table(spark, sf_dir, "events")
    out = time_range_mean(ev, "ts", "value", ["user_id"], 1800)
    return out.select("user_id", "ts",
                      R6(F.col("moving_avg")).alias("moving_avg"),
                      "n_in_window")


@query(
    "q_equi_depth",
    oracle="""
    WITH t AS (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY value NULLS FIRST,
                                      event_id NULLS FIRST) AS tile
      FROM events
    )
    SELECT event_type, tile, COUNT(*) AS n,
           ROUND(MIN(value), 6) AS tile_min,
           ROUND(MAX(value), 6) AS tile_max
    FROM t GROUP BY 1, 2
    """,
)
def q_equi_depth(spark, sf_dir):
    """Equi-depth 10-bucket histogram per event type (aggregates.
    equi_depth_histogram) — adaptive bucket edges, the optimizer-stats
    complement of q_value_histogram's fixed-width buckets.  NTILE ties
    are totally ordered by (value, event_id) so both engines slice
    identically."""
    from access_mopper_spark.operators.aggregates import equi_depth_histogram
    ev = load_table(spark, sf_dir, "events")
    h = equi_depth_histogram(ev, "value", 10, ["event_type"], "event_id")
    return h.select("event_type", "tile", "n",
                    R6(F.col("tile_min")).alias("tile_min"),
                    R6(F.col("tile_max")).alias("tile_max"))


@query(
    "q_group_regression",
    oracle="""
    WITH base AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP))
              - (SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) FROM events))
             / 86400000000.0 AS x,
             value AS y
      FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM base GROUP BY event_type
    ),
    r AS (
      SELECT event_type, n, sx, sy, sxx, syy, sxy,
             CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx <> 0
                  THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                       / (CAST(n AS DOUBLE) * sxx - sx * sx) END AS slope
      FROM m
    )
    SELECT event_type, n, ROUND(slope, 6) AS slope,
           ROUND((sy - slope * sx) / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND(CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx <> 0
                       AND CAST(n AS DOUBLE) * syy - sy * sy <> 0
                      THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                           * (CAST(n AS DOUBLE) * sxy - sx * sy)
                           / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n AS DOUBLE) * syy - sy * sy)) END,
                 6) AS r2
    FROM r
    """,
)
def q_group_regression(spark, sf_dir):
    """Per-group linear trend fit (aggregates.group_linreg): slope /
    intercept / r² of value vs time for each event type, from explicit
    first and second moments — the whole fit is ONE map-side-combined
    aggregation over the corpus, no second pass.  x is days since the
    global min timestamp (µs-exact integers into identical doubles), so
    moment magnitudes stay small enough that 6-dp rounding is stable."""
    from access_mopper_spark.operators.aggregates import group_linreg
    ev = load_table(spark, sf_dir, "events")
    mn = ev.agg(F.min(F.unix_micros("ts")).alias("__mn"))
    based = ev.crossJoin(F.broadcast(mn)).select(
        "event_type",
        ((F.unix_micros("ts") - F.col("__mn")) / 86400000000.0).alias("x"),
        F.col("value").alias("y"))
    out = group_linreg(based, F.col("x"), F.col("y"), ["event_type"])
    return out.select("event_type", "n", R6(F.col("slope")).alias("slope"),
                      R6(F.col("intercept")).alias("intercept"),
                      R6(F.col("r2")).alias("r2"))


@query(
    "q_text_normalize",
    oracle="""
    SELECT doc_id,
           length(trim(regexp_replace(
             regexp_replace(lower(nfc_normalize(text)),
                            '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g'),
             '[ \t\n\r]+', ' ', 'g'), ' ')) AS n_norm_chars,
           md5(trim(regexp_replace(
             regexp_replace(lower(nfc_normalize(text)),
                            '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g'),
             '[ \t\n\r]+', ' ', 'g'), ' ')) AS norm_fp
    FROM documents
    """,
)
def q_text_normalize(spark, sf_dir):
    """Unicode canonicalization pass (functions/text.
    unicode_nfc_normalize): NFC → lowercase → control-strip →
    whitespace-collapse, then fingerprint — what runs before any
    dedup/decontamination so byte-different renderings of the same text
    hash identically.  NFC is the one Arrow-batched Python step (no JVM
    built-in); everything else stays in codegen."""
    from access_mopper_spark.functions.text import unicode_nfc_normalize
    docs = _wide(load_table(spark, sf_dir, "documents"))
    norm = unicode_nfc_normalize(F.col("text"))
    return docs.select("doc_id", F.length(norm).alias("n_norm_chars"),
                       F.md5(norm).alias("norm_fp"))


@query(
    "q_stream_dedup_exact",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 6) AS value
    FROM events
    """,
)
def q_stream_dedup_exact(spark, sf_dir):
    """Streaming EXACT dedup at ingest (streaming/resample.
    stream_exact_dedup): the event stream is unioned with a second
    delivery of itself (an at-least-once redelivery), and
    dropDuplicatesWithinWatermark keeps exactly the first arrival per
    event_id — state rows are evicted once older than the watermark, so
    dedup state is bounded by rate × watermark, not stream history.
    The oracle is simply the distinct original events."""
    from access_mopper_spark.streaming.resample import (
        events_stream, harness_shuffle, run_to_memory, stream_exact_dedup)
    once = events_stream(spark, sf_dir)
    again = events_stream(spark, sf_dir)
    dup = once.unionByName(again)
    deduped = stream_exact_dedup(dup, ["event_id"], "ts", watermark="1 hour")
    out = deduped.select("event_id", "event_type",
                         R6(F.col("value")).alias("value"))
    with harness_shuffle(spark):
        run_to_memory(out, "q_stream_dedup_exact_sink", mode="append")
    return spark.table("q_stream_dedup_exact_sink")


@query(
    "q_pagerank",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst
      FROM lineitem
    ),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank
           FROM nodes),
    r1 AS (
      SELECT n.node,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
             + CAST(0.85 AS DOUBLE)
               * COALESCE(SUM(r.rank / d.outdeg), 0) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN r0 r ON r.node = e.src
      LEFT JOIN deg d ON d.node = e.src
      GROUP BY n.node
    ),
    r2 AS (
      SELECT n.node,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
             + CAST(0.85 AS DOUBLE)
               * COALESCE(SUM(r.rank / d.outdeg), 0) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN r1 r ON r.node = e.src
      LEFT JOIN deg d ON d.node = e.src
      GROUP BY n.node
    ),
    r3 AS (
      SELECT n.node,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
             + CAST(0.85 AS DOUBLE)
               * COALESCE(SUM(r.rank / d.outdeg), 0) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.node
      LEFT JOIN r2 r ON r.node = e.src
      LEFT JOIN deg d ON d.node = e.src
      GROUP BY n.node
    )
    SELECT node, ROUND(rank, 6) AS rank FROM r3
    """,
)
def q_pagerank(spark, sf_dir):
    """PageRank (operators/graph.pagerank), 3 iterations over the
    symmetrized part↔supplier co-occurrence graph from lineitem — the
    iterative-algorithm complement of dedup_clusters' connected
    components.  Each round is one edges⋈ranks shuffle + one sum by
    dst; N and the teleport term ride a broadcast 1-row aggregate, and
    nothing ever collects to the driver.

    Edge-build shape (r12 optimization): the graph runs on BIGINT node
    ids (partkey·2 / suppkey·2+1 — the two families are disjoint, so
    the 'p…'/'s…' labels are re-attached only on the node-sized output)
    and both edge directions come off ONE lineitem scan via explode, so
    the operator's single repartition+dedup exchange is the only edge
    shuffle.  The old string-keyed distinct→union→distinct shape cost
    two scans and three full edge shuffles of 16-char keys (measured
    9.5 s of the query's 10.5 s at sf0.1)."""
    from access_mopper_spark.operators.graph import pagerank
    li = load_table(spark, sf_dir, "lineitem")
    p = (F.col("l_partkey") * 2).cast("long")
    s = (F.col("l_suppkey") * 2 + 1).cast("long")
    edges = (li.select(F.explode(F.array(
                 F.struct(p.alias("src"), s.alias("dst")),
                 F.struct(s.alias("src"), p.alias("dst")))).alias("e"))
               .select("e.src", "e.dst"))
    ranks = pagerank(edges, iterations=3, damping=0.85, complete=True)
    node_str = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("p"), F.expr("CAST(node DIV 2 AS STRING)"))
    ).otherwise(
        F.concat(F.lit("s"), F.expr("CAST((node - 1) DIV 2 AS STRING)")))
    return ranks.select(node_str.alias("node"),
                        R6(F.col("rank")).alias("rank"))


@query(
    "q_correlated_subquery",
    oracle="""
    SELECT l.l_partkey,
           ROUND(SUM(l.l_extendedprice), 2) AS small_lot_value,
           COUNT(*) AS n_small
    FROM lineitem l
    WHERE l.l_quantity < CAST(0.2 AS DOUBLE) *
          (SELECT AVG(l2.l_quantity) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    """,
)
def q_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery (the TPC-H Q17 'small-lot' shape),
    submitted through the SQL front-end so CATALYST does the
    decorrelation: the per-part average becomes one partial aggregate
    joined back on l_partkey — the rewrite a user would otherwise
    hand-write.  Boundary determinism: l_quantity is integer-valued, so
    the per-part AVG is an exact double on both engines and the strict
    < cannot flip with summation order.  2-dp rounding per the big-sum
    convention."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem_q17")
    out = spark.sql("""
        SELECT l.l_partkey,
               SUM(l.l_extendedprice) AS small_lot_value,
               COUNT(*) AS n_small
        FROM v_lineitem_q17 l
        WHERE l.l_quantity < CAST(0.2 AS DOUBLE) *
              (SELECT AVG(l2.l_quantity) FROM v_lineitem_q17 l2
               WHERE l2.l_partkey = l.l_partkey)
        GROUP BY l.l_partkey
    """)
    return out.select("l_partkey",
                      pround(F.col("small_lot_value"), 2)
                      .alias("small_lot_value"),
                      "n_small")


@query(
    "q_having_global_share",
    oracle="""
    SELECT l_partkey, ROUND(SUM(l_extendedprice), 2) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(l_extendedprice) >
           (SELECT SUM(l_extendedprice) FROM lineitem)
           * CAST(0.00075 AS DOUBLE)
    """,
)
def q_having_global_share(spark, sf_dir):
    """HAVING against a global scalar subquery (the TPC-H Q11 value
    concentration shape) through the SQL front-end: the corpus total
    is one extra 1-row aggregate broadcast into the HAVING filter, not
    a second grouped pass.  Threshold comparison is on the RAW sums
    (both engines sum the same exact-integer-valued doubles... prices
    have cents, so sums can differ in the last ulp between engines —
    the 0.00075 share threshold sits far from any part's sum, which
    the companion test asserts), output rounded at 2 dp."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem_q11")
    out = spark.sql("""
        SELECT l_partkey, SUM(l_extendedprice) AS part_value
        FROM v_lineitem_q11
        GROUP BY l_partkey
        HAVING SUM(l_extendedprice) >
               (SELECT SUM(l_extendedprice) FROM v_lineitem_q11)
               * CAST(0.00075 AS DOUBLE)
    """)
    return out.select("l_partkey",
                      pround(F.col("part_value"), 2).alias("part_value"))


@query(
    "q_bpe_encode",
    oracle=_bpe_oracle(6, final=""", docwords AS (
      SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text),
                        '[^a-z]+', ' ', 'g'), ' '), ' ')) AS word
        FROM documents
      ) WHERE length(word) > 0
    ),
    wsym AS (
      SELECT word,
             length(string_split(trim(seq, chr(31)), chr(31))) AS n_symbols
      FROM s6
    )
    SELECT d.doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(w.n_symbols) AS BIGINT) AS n_tokens
    FROM docwords d JOIN wsym w USING (word)
    GROUP BY d.doc_id"""),
)
def q_bpe_encode(spark, sf_dir):
    """Tokenizer APPLICATION after training (operators/bpe.bpe_apply):
    learn 6 merges, run the map-only replace chain over the word table,
    then join each document's words against the per-word symbol counts
    — per-doc token counts under the learned vocabulary (the
    train→encode round trip; the merge table rides into the plan as six
    literals, the moral equivalent of broadcasting it).  Oracle replays
    the identical 6 rounds and the identical encode join.

    Note the oracle's ``final`` tail must open as a CTE continuation —
    _bpe_oracle splices it after the s6 block."""
    from access_mopper_spark.operators.bpe import (bpe_apply, bpe_train,
                                                   word_frequency_table)
    docs = load_table(spark, sf_dir, "documents")
    merge_rows = bpe_train(spark, docs, "text", n_merges=6).collect()
    merges = [(r.sym_a, r.sym_b) for r in merge_rows]
    wf = word_frequency_table(docs, "text")
    wsym = bpe_apply(wf, merges).select("word", "n_symbols")
    docwords = (docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.regexp_replace(portable_lower(F.col("text")),
                                                  "[^a-z]+", " ")),
                          " ")).alias("word"))
        .where(F.length("word") > 0))
    return (docwords.join(wsym, "word")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_symbols").alias("n_tokens")))


@query(
    "q_token_budget_fill",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents
    ),
    c AS (
      SELECT doc_id, source,
             CASE WHEN length(tn) = 0 THEN 0
                  ELSE length(tn) - length(replace(tn, ' ', '')) + 1
             END AS ntok
      FROM t
    ),
    r AS (
      SELECT doc_id, source, ntok,
             SUM(ntok) OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM c
    )
    SELECT doc_id, source, ntok, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM r WHERE cum_tokens <= 900
    """,
)
def q_token_budget_fill(spark, sf_dir):
    """Token-budget mixture assembly (operators/sampling.
    token_budget_fill): admit docs per source, in a corpus-stable
    md5(doc_id) order, until each source holds ≤900 tokens — the
    budget form of training-data mixing ('exactly N tokens of web, M
    of code'), next to mixture_sample's probability form.  One keyed
    window cumsum; integer arithmetic end-to-end, so both engines cut
    at the identical document."""
    from access_mopper_spark.functions.text import token_count
    from access_mopper_spark.operators.sampling import token_budget_fill
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "source",
                         token_count(F.col("text")).alias("ntok"))
    return token_budget_fill(scored, "ntok", 900, "source", "doc_id") \
        .select("doc_id", "source", "ntok", "cum_tokens")


@query(
    "q_salted_agg",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value), 2) AS sum,
           COUNT(value) AS count,
           ROUND(MIN(value), 6) AS min,
           ROUND(MAX(value), 6) AS max,
           ROUND(AVG(value), 6) AS mean
    FROM events GROUP BY event_type
    """,
)
def q_salted_agg(spark, sf_dir):
    """Two-stage SALTED aggregation (operators/skew.salted_agg) checked
    against the plain one-stage GROUP BY oracle — the skew-hardening
    rewrite must be a pure physical transformation, invisible in the
    results.  Stage 1 spreads each (possibly hot) key over 16 salt
    shards, stage 2 merges shard partials; sum rounds at 2 dp because
    the extra merge stage reorders double summation."""
    from access_mopper_spark.operators.skew import salted_agg
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(ev, ["event_type"], "value")
    return out.select("event_type",
                      pround(F.col("sum"), 2).alias("sum"),
                      "count",
                      R6(F.col("min")).alias("min"),
                      R6(F.col("max")).alias("max"),
                      R6(F.col("mean")).alias("mean"))


@query(
    "q_time_gaps",
    oracle="""
    WITH o AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
             LAG(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_t
      FROM events
    )
    SELECT user_id, prev_t AS gap_start, t AS gap_end,
           (epoch_us(t) - epoch_us(prev_t)) // 1000000 AS gap_seconds
    FROM o
    WHERE prev_t IS NOT NULL
      AND epoch_us(t) - epoch_us(prev_t) > 3600::BIGINT * 1000000
    """,
)
def q_time_gaps(spark, sf_dir):
    """Per-user time-series GAP detection: flag successive-event pairs
    more than an hour apart — the data-quality probe behind the
    reference's frequency inference and file-interval planning (a gap
    is a missing chunk).  One keyed window (lag), µs-integer
    arithmetic end-to-end, deterministic tie order (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    o = ev.select("user_id", F.col("ts").alias("t"), "event_id",
                  F.lag("ts").over(w).alias("prev_t"))
    delta_us = F.unix_micros("t") - F.unix_micros("prev_t")
    return (o.where(F.col("prev_t").isNotNull()
                    & (delta_us > 3600 * 1000000))
             .select("user_id", F.col("prev_t").alias("gap_start"),
                     F.col("t").alias("gap_end"),
                     F.expr("(unix_micros(t) - unix_micros(prev_t))"
                            " div 1000000").alias("gap_seconds")))


@query(
    "q_gopher_rules",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents
    ),
    c AS (
      SELECT doc_id, tn,
             CASE WHEN length(tn) = 0 THEN 0
                  ELSE length(tn) - length(replace(tn, ' ', '')) + 1
             END AS n_words
      FROM t
    )
    SELECT doc_id, n_words,
           ROUND(CASE WHEN n_words = 0 THEN 0
                 ELSE CAST(length(tn) - (n_words - 1) AS DOUBLE) / n_words
                 END, 6) AS mean_word_len,
           (position(' the ' IN ' ' || tn || ' ') > 0
            OR position(' a ' IN ' ' || tn || ' ') > 0
            OR position(' of ' IN ' ' || tn || ' ') > 0) AS has_stopword,
           (n_words BETWEEN 20 AND 100000
            AND CASE WHEN n_words = 0 THEN 0
                ELSE CAST(length(tn) - (n_words - 1) AS DOUBLE) / n_words
                END BETWEEN 2 AND 12
            AND (position(' the ' IN ' ' || tn || ' ') > 0
                 OR position(' a ' IN ' ' || tn || ' ') > 0
                 OR position(' of ' IN ' ' || tn || ' ') > 0)) AS keep
    FROM c
    """,
)
def q_gopher_rules(spark, sf_dir):
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1
    re-expressed on this corpus): word-count bounds, mean-word-length
    band, stopword presence — each an explicit named flag plus the
    conjunctive keep decision.  Pure Column arithmetic (the mean word
    length is (chars − separators)/words — no split array), map-only at
    any corpus size; the flags are what a curation report aggregates."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = _wide(load_table(spark, sf_dir, "documents"))
    # STAGED projection: the regex normal form and the counts derived
    # from it materialize once per row — inlining them into every
    # downstream flag re-evaluates the regexp per flag (the r3
    # captured-expression lesson, commit 6ef811f: 5× wall time at ×10)
    staged = docs.select(
        "doc_id", ws_normalized(portable_lower(F.col("text"))).alias("__tn"))
    counted = staged.select(
        "doc_id", "__tn",
        F.when(F.length("__tn") == 0, F.lit(0)).otherwise(
            F.length("__tn")
            - F.length(F.replace(F.col("__tn"), F.lit(" "), F.lit("")))
            + 1).alias("n_words"),
        F.concat(F.lit(" "), F.col("__tn"), F.lit(" ")).alias("__pad"))
    flagged = counted.select(
        "doc_id", "n_words",
        F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
            (F.length("__tn") - (F.col("n_words") - 1)).cast("double")
            / F.col("n_words")).alias("mwl"),
        ((F.instr(F.col("__pad"), " the ") > 0)
         | (F.instr(F.col("__pad"), " a ") > 0)
         | (F.instr(F.col("__pad"), " of ") > 0)).alias("has_stopword"))
    keep = F.col("n_words").between(20, 100000) \
        & F.col("mwl").between(2, 12) & F.col("has_stopword")
    return flagged.select("doc_id", "n_words",
                          R6(F.col("mwl")).alias("mean_word_len"),
                          "has_stopword", keep.alias("keep"))


@query(
    "q_order_count_distribution",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM co GROUP BY n_orders
    """,
)
def q_order_count_distribution(spark, sf_dir):
    """Customer order-count distribution (the TPC-H Q13 shape): LEFT
    OUTER join so zero-order customers stay in the histogram, then a
    second tiny regroup on the count — outer-join aggregation, the one
    join flavor no other registry query exercised.  First shuffle keys
    by custkey (both sides), second by the ≤ dozens-valued n_orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    co = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
              .groupBy("c_custkey")
              .agg(F.count("o_orderkey").alias("n_orders")))
    return co.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@query(
    "q_incremental_agg",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total,
           ROUND(MIN(value), 6) AS vmin,
           ROUND(MAX(value), 6) AS vmax
    FROM events
    GROUP BY 1, 2
    """,
)
def q_incremental_agg(spark, sf_dir):
    """Incremental aggregate maintenance: a materialized daily rollup
    built from a HISTORICAL state (events before the corpus midpoint)
    merged with a DELTA batch (the rest) must equal the from-scratch
    aggregation — the pattern that updates a 100 TB rollup by touching
    only the new partition (count/sum/min/max are decomposable; avg
    re-derives as sum/count).  The merge is state ∪ delta → re-agg on
    the same (type, day) key: state stays partitioned by the group key,
    so only the delta shuffles.  Oracle = the from-scratch GROUP BY,
    proving the incremental path is result-invariant."""
    ev = load_table(spark, sf_dir, "events")
    # integer midpoint (exact at any magnitude, unlike double division)
    mid = (ev.agg(F.min(F.unix_micros("ts")).alias("__mn"),
                  F.max(F.unix_micros("ts")).alias("__mx"))
             .select(F.timestamp_micros(F.expr("(__mn + __mx) DIV 2"))
                      .alias("__mid")))
    tagged = ev.crossJoin(F.broadcast(mid))
    day = F.date_trunc("day", F.col("ts"))

    def rollup(df):
        return df.groupBy("event_type", day.alias("day")).agg(
            F.count("*").alias("n"), F.sum("value").alias("total"),
            F.min("value").alias("vmin"), F.max("value").alias("vmax"))

    state = rollup(tagged.where(F.col("ts") < F.col("__mid")))
    delta = rollup(tagged.where(F.col("ts") >= F.col("__mid")))
    merged = (state.unionByName(delta)
              .groupBy("event_type", "day")
              .agg(F.sum("n").alias("n"), F.sum("total").alias("total"),
                   F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax")))
    # day is midnight-valued → ship as DATE (TZ-render-immune)
    return merged.select("event_type",
                         F.col("day").cast("date").alias("day"), "n",
                         pround(F.col("total"), 2).alias("total"),
                         R6(F.col("vmin")).alias("vmin"),
                         R6(F.col("vmax")).alias("vmax"))


_ANN_RECALL_TAIL = """, ann AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, vec_id) AS rank
        FROM scored
      ) t WHERE rank <= 5
    ),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 ROUND(list_dot_product(e.v, q.qv)
                       / (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
                 e.vec_id) AS rank
        FROM q CROSS JOIN b e
      ) t WHERE rank <= 5
    )
    SELECT e.query_id,
           CAST(COUNT(a.vec_id) AS INT) AS n_hit,
           ROUND(COUNT(a.vec_id) / 5.0, 6) AS recall_at_k
    FROM exact e
    LEFT JOIN ann a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
    GROUP BY e.query_id"""


@query("q_ann_recall", oracle=_ann_lsh_oracle(final=_ANN_RECALL_TAIL))
def q_ann_recall(spark, sf_dir):
    """Recall@5 of the hyperplane-LSH ANN path against brute-force
    cosine ground truth, per query — the EVALUATION harness an ANN
    deployment runs before trusting the approximate index (index-quality
    measurement as a first-class query, not a unit test).  Both rankings
    round to 6 dp with an id tie-break so the ground-truth SET is
    engine-deterministic; the LSH side reuses the exact q_ann_lsh
    construction.  Plan: candidates via the bucket join, truth via one
    broadcast corpus pass, recall via a tiny per-query join."""
    from access_mopper_spark.operators.similarity import (
        ann_lsh_topk, as_double, cosine, partial_topk)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 4) \
           .select(F.col("vec_id").alias("query_id"), "embedding")
    ann = ann_lsh_topk(emb, q, dim=64, k=5, n_planes=6) \
        .select("query_id", "vec_id")
    qv = q.select("query_id", as_double(F.col("embedding")).alias("__qv"))
    scored = (emb.select("vec_id", as_double(F.col("embedding")).alias("__cv"))
                 .crossJoin(F.broadcast(qv))
                 .select("query_id", "vec_id",
                         pround(cosine(F.col("__cv"), F.col("__qv")), 6)
                         .alias("cosine_sim")))
    exact = partial_topk(scored, ["query_id"],
                         [F.col("cosine_sim").desc(), F.col("vec_id")], 5) \
        .select("query_id", "vec_id")
    hit = exact.join(ann.withColumn("__hit", F.lit(1)),
                     ["query_id", "vec_id"], "left")
    return hit.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("int")
        .alias("n_hit"),
        pround(F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / 5.0, 6)
        .alias("recall_at_k"))


@query(
    "q_embedding_truncate",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT vec_id,
           ROUND(sqrt(list_dot_product(e, e)), 6) AS norm_full,
           ROUND(sqrt(list_dot_product(e[1:16], e[1:16])), 6) AS norm_16,
           -- zero-energy vectors have no defined ratio (NULL on both
           -- engines; an unguarded division ERRORS under Spark ANSI)
           CASE WHEN list_dot_product(e, e) = 0 THEN NULL
                ELSE ROUND(list_dot_product(e[1:16], e[1:16])
                           / list_dot_product(e, e), 6) END AS energy_ratio
    FROM v
    """,
)
def q_embedding_truncate(spark, sf_dir):
    """Matryoshka-style truncation probe (Kusupati et al. 2022): how
    much of each embedding's energy the first 16 of 64 dims retain —
    the measurement that decides whether an index can store truncated
    vectors (4× memory/bandwidth saving) without retraining.  Map-only
    `F.aggregate` dot products over the sliced array; the slice itself
    is free (no copy in Tungsten)."""
    from access_mopper_spark.operators.similarity import as_double
    emb = load_table(spark, sf_dir, "embeddings")
    e = as_double(F.col("embedding"))
    t = F.slice(e, 1, 16)
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    full = dot(e, e)
    part = dot(t, t)
    return emb.select(
        "vec_id",
        R6(F.sqrt(full)).alias("norm_full"),
        R6(F.sqrt(part)).alias("norm_16"),
        F.when(full != 0, R6(part / full)).alias("energy_ratio"))


@query(
    "q_phrase_search",
    oracle=r"""
    WITH toks AS (
      -- same explicit class as the Spark split: RE2 '\s' matches \f
      -- (Java's adds \x0B) — '\s+' here diverges on form-feed corpora
      SELECT doc_id, regexp_split_to_array(trim(text, ' '), '[ \t\n\r]+') AS w
      FROM documents
    ),
    pos AS (
      SELECT doc_id, g.i AS p, w[g.i] AS t1, w[g.i + 1] AS t2, w[g.i + 2] AS t3
      FROM toks,
           (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(w)), 1) FROM toks)
                                 + 1)) AS i) g
      WHERE g.i <= length(w) - 2
    ),
    top AS (
      SELECT t1, t2, t3 FROM pos
      GROUP BY t1, t2, t3
      -- tie-break on the SAME concatenated key the Spark side sorts
      -- (byte-wise comparison parity; \x1f sorts below word chars)
      ORDER BY COUNT(*) DESC, t1 || chr(31) || t2 || chr(31) || t3 LIMIT 1
    )
    SELECT p.doc_id, CAST(COUNT(*) AS INT) AS n_occurrences,
           CAST(MIN(p.p) AS INT) AS first_pos
    FROM pos p JOIN top USING (t1, t2, t3)
    GROUP BY p.doc_id
    """,
)
def q_phrase_search(spark, sf_dir):
    """Positional phrase search over an inverted index: find every
    occurrence of the corpus's most frequent word TRIGRAM (data-derived,
    deterministic tie-break — no constant that breaks when testdata
    regenerates) using (doc, position, term) postings — the adjacency
    join (p, p+1, p+2) that phrase queries run on a positional index,
    which BM25's bag-of-words scoring cannot express.  Plan: one
    explode to postings, a map-side-combined trigram count for the
    phrase, then the postings self-alignment via the precomputed
    trigram keys (zero extra join — adjacency is baked into the
    position table)."""
    docs = _wide(load_table(spark, sf_dir, "documents"))
    w = F.split(F.trim(F.col("text")), "[ \t\n\r]+")
    n = F.size(w)
    tri = F.zip_with(
        F.slice(w, 1, F.greatest(n - 2, F.lit(0))),
        F.zip_with(F.slice(w, 2, F.greatest(n - 2, F.lit(0))),
                   F.slice(w, 3, F.greatest(n - 2, F.lit(0))),
                   lambda b, c: F.concat_ws("\x1f", b, c)),
        lambda a, bc: F.concat_ws("\x1f", a, bc))
    pos = (docs.where(n >= 3)
               .select("doc_id", F.posexplode(tri).alias("p0", "gram"))
               .select("doc_id", (F.col("p0") + 1).alias("p"), "gram"))
    top = (pos.groupBy("gram").agg(F.count("*").alias("c"))
              .orderBy(F.desc("c"), F.asc("gram")).limit(1)
              .select("gram"))
    return (pos.join(F.broadcast(top), "gram")
               .groupBy("doc_id")
               .agg(F.count("*").cast("int").alias("n_occurrences"),
                    F.min("p").cast("int").alias("first_pos")))


@query(
    "q_record_linkage",
    oracle="""
    WITH k AS (
      SELECT c_custkey AS id, lower(c_name) AS nm, c_nationkey AS nat,
             c_acctbal AS bal, c_mktsegment AS seg,
             c_nationkey || ':' || CAST(FLOOR(c_acctbal / 500) AS BIGINT)
               AS blk
      FROM customer WHERE c_custkey < 600
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CASE WHEN levenshtein(a.nm, b.nm) <= 2 THEN 2.0 ELSE -1.0 END
             + CASE WHEN a.nat = b.nat THEN 1.5 ELSE -0.5 END
             + CASE WHEN ABS(a.bal - b.bal) < 250 THEN 1.0 ELSE -0.5 END
             + CASE WHEN a.seg = b.seg THEN 0.5 ELSE -0.25 END AS score
      FROM k a JOIN k b ON a.blk = b.blk AND a.id < b.id
    )
    SELECT id_a, id_b, ROUND(score, 6) AS score,
           score >= 2.5 AS is_match
    FROM pairs
    """,
)
def q_record_linkage(spark, sf_dir):
    """Fellegi–Sunter-style record-linkage scoring: blocked candidate
    pairs get per-field agreement/disagreement weights (name edit
    distance, nation equality, balance proximity, segment equality)
    summed into a match score and thresholded — the probabilistic-
    linkage layer ABOVE q_entity_blocks' candidate generation.  One
    equi-join shuffle on the block key; every weight is Column
    arithmetic on the joined row, so scoring adds zero extra exchanges
    at any scale."""
    cust = load_table(spark, sf_dir, "customer") \
        .where(F.col("c_custkey") < 600)
    # blocking key = (nation, balance band): TPC-H names share a long
    # constant prefix, so a name-prefix block degenerates into one giant
    # bucket (a full cross product in disguise) — the selective
    # attribute pair bounds every block like real linkage blocking does
    k = cust.select(F.col("c_custkey").alias("id"),
                    F.lower(F.col("c_name")).alias("nm"),
                    F.col("c_nationkey").alias("nat"),
                    F.col("c_acctbal").alias("bal"),
                    F.col("c_mktsegment").alias("seg"),
                    F.concat(F.col("c_nationkey").cast("string"), F.lit(":"),
                             F.floor(F.col("c_acctbal") / 500)
                             .cast("string")).alias("blk"))
    a = k.select(*[F.col(c).alias(f"{c}_a") for c in k.columns])
    b = k.select(*[F.col(c).alias(f"{c}_b") for c in k.columns])
    joined = a.join(b, (F.col("blk_a") == F.col("blk_b"))
                    & (F.col("id_a") < F.col("id_b")))
    score = (
        F.when(portable_levenshtein(F.col("nm_a"), F.col("nm_b")) <= 2, 2.0)
         .otherwise(-1.0)
        + F.when(F.col("nat_a") == F.col("nat_b"), 1.5).otherwise(-0.5)
        + F.when(F.abs(F.col("bal_a") - F.col("bal_b")) < 250, 1.0)
           .otherwise(-0.5)
        + F.when(F.col("seg_a") == F.col("seg_b"), 0.5).otherwise(-0.25))
    return joined.select("id_a", "id_b", R6(score).alias("score"),
                         (score >= 2.5).alias("is_match"))


@query(
    "q_mutual_information",
    oracle="""
    WITH base AS (
      SELECT event_type AS x,
             CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) // 6 AS INT) AS y
      FROM events
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base),
    jxy AS (SELECT x, y, COUNT(*) AS cxy FROM base GROUP BY x, y),
    mx AS (SELECT x, COUNT(*) AS cx FROM base GROUP BY x),
    my AS (SELECT y, COUNT(*) AS cy FROM base GROUP BY y)
    SELECT j.x, j.y, CAST(j.cxy AS BIGINT) AS n_xy,
           ROUND((j.cxy / n.n)
                 * ln((j.cxy * n.n) / (CAST(m.cx AS DOUBLE) * t.cy)), 6)
             AS mi_term
    FROM jxy j
    JOIN mx m USING (x) JOIN my t USING (y) CROSS JOIN n
    """,
)
def q_mutual_information(spark, sf_dir):
    """Mutual-information decomposition between event type and
    time-of-day quadrant: the per-cell terms p(x,y)·ln(p(x,y)/p(x)p(y))
    whose sum is MI — the dependence probe a feature-selection or
    drift-detection pass runs over 100 TB of logs.  Three
    map-side-combined counts (joint + two marginals, each keyed tiny)
    joined on the ≤|X|·|Y| cell table; the corpus is scanned once."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(F.col("event_type").alias("x"),
                     (F.hour("ts") / 6).cast("int").alias("y"))
    n = base.agg(F.count("*").cast("double").alias("n"))
    jxy = base.groupBy("x", "y").agg(F.count("*").alias("cxy"))
    mx = base.groupBy("x").agg(F.count("*").alias("cx"))
    my = base.groupBy("y").agg(F.count("*").alias("cy"))
    out = (jxy.join(mx, "x").join(my, "y").crossJoin(F.broadcast(n)))
    term = (F.col("cxy") / F.col("n")) * F.log(
        (F.col("cxy") * F.col("n"))
        / (F.col("cx").cast("double") * F.col("cy")))
    return out.select("x", "y", F.col("cxy").alias("n_xy"),
                      R6(term).alias("mi_term"))


@query(
    "q_weighted_median",
    oracle="""
    WITH o AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             l_quantity AS qty,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey,
                                            l_linenumber
                                   ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
      FROM lineitem
    )
    SELECT flag, ROUND(MIN(price), 6) AS weighted_median,
           ROUND(MIN(tot), 2) AS total_weight
    FROM o WHERE cum >= tot / 2 GROUP BY flag
    """,
)
def q_weighted_median(spark, sf_dir):
    """Weighted median: the smallest price whose cumulative quantity
    weight reaches half the group total — the weighted-quantile shape
    (exact, one keyed window cumsum + the partition-total frame sharing
    the same sort, then a tiny min-reduce).  Quantities are
    integer-valued doubles, so the half-total threshold is exact on
    both engines; the cumsum order is totally tie-broken.

    Scale note: an exact per-group weighted quantile sorts WITHIN each
    group key, so parallelism = number of groups (3 here — the 10×
    sweep's 10 s is that sort).  With few huge groups production uses
    the two-phase bucket refinement (broadcast weight histogram → exact
    pass over the one bucket containing the target mass) or
    percentile_approx when ±ε is acceptable."""
    li = load_table(spark, sf_dir, "lineitem")
    wcum = W.partitionBy("l_returnflag") \
            .orderBy("l_extendedprice", "l_orderkey", "l_linenumber") \
            .rowsBetween(W.unboundedPreceding, W.currentRow)
    wtot = W.partitionBy("l_returnflag")
    o = li.select(F.col("l_returnflag").alias("flag"),
                  F.col("l_extendedprice").alias("price"),
                  F.sum("l_quantity").over(wcum).alias("cum"),
                  F.sum("l_quantity").over(wtot).alias("tot"))
    return (o.where(F.col("cum") >= F.col("tot") / 2)
             .groupBy("flag")
             .agg(R6(F.min("price")).alias("weighted_median"),
                  pround(F.min("tot"), 2).alias("total_weight")))


@query(
    "q_cusum_changepoint",
    oracle="""
    WITH med AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, CAST(e.ts AS TIMESTAMP) AS ts, e.event_id,
             SUM(e.value - m.med) OVER (
               PARTITION BY e.event_type
               ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id
               ROWS UNBOUNDED PRECEDING) AS s
      FROM events e JOIN med m USING (event_type)
    ),
    pick AS (
      -- ties on max |s| are reachable (zero-deviation rows repeat the
      -- running max) → total order (|s|, ts, event_id); COALESCE keeps
      -- an all-NULL prefix from winning on engine-specific null order
      SELECT event_type, ts,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY COALESCE(ABS(s), -1) DESC,
                                         ts DESC, event_id DESC) AS rn,
             MAX(ABS(s)) OVER (PARTITION BY event_type) AS mx
      FROM dev
    )
    SELECT event_type, ts AS change_ts, ROUND(mx, 6) AS max_cusum
    FROM pick WHERE rn = 1
    """,
)
def q_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection per event type: the running sum of
    deviations from the type's MEDIAN peaks where the level shifts —
    the classic mean-shift detector, as one keyed window cumsum plus an
    argmax reduce.  The median (exact interpolated percentile) is used
    as the reference instead of the mean deliberately: it is
    arithmetic-exact on both engines, and the window cumsum then adds
    bit-identical terms in the identical (ts, event_id) order, so even
    the running sums agree to the last bit."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"))
    w = (W.partitionBy("event_type").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    dev = (ev.join(F.broadcast(med), "event_type")
             .withColumn("s", F.sum(F.col("value") - F.col("med")).over(w)))
    # deterministic argmax: ties on max |s| break by (ts, event_id)
    key = F.struct(F.coalesce(F.abs(F.col("s")), F.lit(-1.0)).alias("a"),
                   F.col("ts").alias("t"), F.col("event_id").alias("i"))
    return dev.groupBy("event_type").agg(
        F.max_by("ts", key).alias("change_ts"),
        R6(F.max(F.abs(F.col("s")))).alias("max_cusum"))


@query(
    "q_quality_blend",
    oracle="""
    WITH t AS (
      -- COALESCE: NULL text ranks like the empty document (0 signals);
      -- without it the engines disagree on where NULLs sort
      SELECT doc_id,
             trim(regexp_replace(COALESCE(text, ''), '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
             CASE WHEN length(tn) = 0 THEN 0
                  ELSE length(tn) - length(replace(tn, ' ', '')) + 1
             END AS ntok,
             length(tn) AS nch
      FROM t
    ),
    ranked AS (
      SELECT doc_id, ntok,
             percent_rank() OVER (ORDER BY ntok, doc_id) AS pr_tok,
             percent_rank() OVER (ORDER BY nch, doc_id) AS pr_len
      FROM sig
    )
    SELECT doc_id, ntok,
           ROUND(0.7 * pr_tok + 0.3 * pr_len, 6) AS blend
    FROM ranked
    ORDER BY blend DESC, doc_id LIMIT 100
    """,
)
def q_quality_blend(spark, sf_dir):
    """Multi-signal quality blending: each signal (token count, char
    length) converts to a corpus percentile with a deterministic tie
    order, signals combine as a weighted blend, and the top-100 docs
    win — the composite-score selection every curation pipeline runs
    over its individual quality signals.  percent_rank is exact integer
    arithmetic ((rank−1)/(n−1)) so the blend is engine-identical;
    CDF-broadcast + keyed-window formulation keeps every stage
    distributed (no single-partition global window); percent_rank is
    exact integer arithmetic ((rank−1)/(n−1)) so the blend is
    engine-identical; final selection is TakeOrdered (partial top-k).
    The corpus count is one driver-side scalar (bounded, like
    dedup_clusters' round counts)."""
    docs = _wide(load_table(spark, sf_dir, "documents"))
    from access_mopper_spark.functions.text import token_count, ws_normalized
    # persist the slim projected signals: the CDF range-join and the two
    # rank stages each re-read this table, and recomputing the text
    # scoring per consumer is the filter-pushdown-recompute pathology
    # (see plans/curation.py) — the count() below materializes it
    # NULL text ranks like the empty document: 0 tokens / 0 chars (a
    # NULL signal would silently drop out of the CDF equi-join on the
    # Spark side while the oracle ranks it — fuzz-caught)
    txt = F.coalesce(F.col("text"), F.lit(""))
    sig = docs.select(
        "doc_id",
        token_count(txt).alias("ntok"),
        F.length(ws_normalized(txt)).alias("nch")).persist()

    def dist_percent_rank(df, col):
        # percent_rank WITHOUT any single-partition window: the
        # per-value CDF ("count of rows with a smaller value") is a
        # broadcast range-join over the distinct-value table — integer
        # counts, so the sum is exact and order-free — and the
        # within-value tie rank is a KEYED window; identical integer
        # arithmetic (rank-1)/(n-1) on both engines (r4 verdict item 5:
        # the previous ordered-window prefix was the last unpartitioned
        # WindowExec in the registry)
        # the CDF always derives from the CACHED slim sig table (the
        # value distribution is identical in any chained stage) so the
        # second rank stage never re-evaluates the first stage's joins
        cdf0 = sig.groupBy(col).agg(F.count("*").alias("__c"))
        cdf = (cdf0.alias("a")
               .join(F.broadcast(cdf0.select(F.col(col).alias("__v2"),
                                             F.col("__c").alias("__c2"))),
                     F.col("__v2") < F.col(f"a.{col}"), "left")
               .groupBy(f"a.{col}")
               .agg(F.sum(F.coalesce("__c2", F.lit(0)))
                    .alias(f"__before_{col}")))
        within = F.row_number().over(
            W.partitionBy(col).orderBy("doc_id")) - 1
        return (df.join(F.broadcast(cdf), col)
                  .withColumn(f"__pr_{col}",
                              (F.col(f"__before_{col}") + within)))
    n1 = sig.count() - 1
    r1 = dist_percent_rank(sig, "ntok")
    r2 = dist_percent_rank(r1, "nch")
    blend = (0.7 * (F.col("__pr_ntok") / n1)
             + 0.3 * (F.col("__pr_nch") / n1))
    return (r2.select("doc_id", "ntok", R6(blend).alias("blend"))
              .orderBy(F.desc("blend"), F.asc("doc_id")).limit(100))


@query(
    "q_weighted_median_2phase",
    oracle="""
    WITH o AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             l_quantity AS qty,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey,
                                            l_linenumber
                                   ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
      FROM lineitem
    )
    SELECT flag, ROUND(MIN(price), 6) AS weighted_median,
           ROUND(MIN(tot), 2) AS total_weight
    FROM o WHERE cum >= tot / 2 GROUP BY flag
    """,
)
def q_weighted_median_2phase(spark, sf_dir):
    """The SAME weighted median through the distributed two-phase
    bucket refinement (aggregates.weighted_median_2phase): phase 1
    locates the half-mass bucket from a tiny per-group histogram,
    phase 2 sorts only that bucket's sliver — parallelism no longer
    bounded by the number of groups, at the cost of a second input
    pass.  Same oracle as q_weighted_median: the algorithm must be
    result-invariant."""
    from access_mopper_spark.operators.aggregates import weighted_median_2phase
    li = load_table(spark, sf_dir, "lineitem")
    out = weighted_median_2phase(
        li.withColumn("flag", F.col("l_returnflag")),
        "l_extendedprice", "l_quantity", ["flag"],
        ["l_orderkey", "l_linenumber"], bucket_width=500.0)
    return out.select("flag",
                      R6(F.col("weighted_median")).alias("weighted_median"),
                      pround(F.col("total_weight"), 2).alias("total_weight"))


@query(
    "q_salted_join",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             -- integer weights keep value*weight on the exact cent
             -- grid: fractional weights (0.5, 0.1) put products on the
             -- half-cent grid, which IS the 2-dp rounding tie — sums
             -- then flip with engine summation order
             CASE event_type WHEN 'view' THEN 1.0 WHEN 'click' THEN 2.0
                  WHEN 'purchase' THEN 5.0 ELSE 3.0 END AS weight
      FROM events
    )
    SELECT e.event_type, COUNT(*) AS n,
           ROUND(SUM(e.value * d.weight), 2) AS weighted_total
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_salted_join(spark, sf_dir):
    """Salted skew join (operators/skew.explode_salt_join) checked
    against the plain equi-join oracle: the big side's hot key (every
    event shares one of 5 types — maximal key skew) spreads over 8
    salt shards, the dim side replicates across the salts, and the
    rewrite must be invisible in the results.  The explicit form of
    what AQE skew-join does adaptively — used when the skew is known
    up front or the join feeds a window AQE can't split."""
    from access_mopper_spark.operators.skew import explode_salt_join
    ev = load_table(spark, sf_dir, "events")
    dim = (ev.select("event_type").distinct()
             .withColumn("weight",
                         F.when(F.col("event_type") == "view", 1.0)
                          .when(F.col("event_type") == "click", 2.0)
                          .when(F.col("event_type") == "purchase", 5.0)
                          .otherwise(3.0)))
    joined = explode_salt_join(ev, dim, "event_type", n_salts=8)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        pround(F.sum(F.col("value") * F.col("weight")), 2)
        .alias("weighted_total"))


@query(
    "q_gap_fill_locf",
    oracle="""
    WITH obs AS (
      SELECT user_id,
             CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS h,
             last(value ORDER BY CAST(ts AS TIMESTAMP), event_id) AS v
      FROM events WHERE user_id < 40
      GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM obs GROUP BY user_id
    ),
    spine AS (
      SELECT s.user_id, s.lo + g.i * INTERVAL 1 HOUR AS h
      FROM span s,
           (SELECT UNNEST(range(0,
              (SELECT CAST(MAX(epoch_us(hi) - epoch_us(lo))
                           // 3600000000 AS BIGINT) + 1 FROM span))) AS i) g
      WHERE g.i <= (epoch_us(s.hi) - epoch_us(s.lo)) // 3600000000
    ),
    joined AS (
      SELECT sp.user_id, sp.h, o.v,
             COUNT(o.v) OVER (PARTITION BY sp.user_id ORDER BY sp.h
                              ROWS UNBOUNDED PRECEDING) AS grp
      FROM spine sp LEFT JOIN obs o USING (user_id, h)
    )
    SELECT user_id, h,
           ROUND(MAX(v) OVER (PARTITION BY user_id, grp), 6) AS v_filled,
           v IS NOT NULL AS observed
    FROM joined
    """,
)
def q_gap_fill_locf(spark, sf_dir):
    """Gap filling with last-observation-carried-forward: build each
    user's hourly spine (sequence + explode — no cross join with a
    global calendar), left-join the observed hourly values, and fill
    holes with the latest earlier observation via last(ignoreNulls)
    over the keyed order — the standard LOCF/ffill shape for sensor
    and telemetry series, complementary to upsample's interpolation.
    The oracle expresses the same fill as a count-of-observed grouping
    (each observation opens a group; the group max is that
    observation) — same semantics, engine-portable syntax."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    obs = (ev.groupBy("user_id",
                      F.date_trunc("hour", "ts").alias("h"))
             .agg(F.max_by("value",
                           F.struct(F.col("ts"), F.col("event_id")))
                  .alias("v")))
    span = obs.groupBy("user_id").agg(F.min("h").alias("lo"),
                                      F.max("h").alias("hi"))
    spine = span.select(
        "user_id",
        F.explode(F.sequence("lo", "hi",
                             F.expr("INTERVAL 1 HOUR"))).alias("h"))
    joined = spine.join(obs, ["user_id", "h"], "left")
    w = (W.partitionBy("user_id").orderBy("h")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return joined.select(
        "user_id", "h",
        R6(F.last("v", ignorenulls=True).over(w)).alias("v_filled"),
        F.col("v").isNotNull().alias("observed"))


@query(
    "q_stream_static_join",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             -- integer weights keep value*weight on the exact cent
             -- grid: fractional weights (0.5, 0.1) put products on the
             -- half-cent grid, which IS the 2-dp rounding tie — sums
             -- then flip with engine summation order
             CASE event_type WHEN 'view' THEN 1.0 WHEN 'click' THEN 2.0
                  WHEN 'purchase' THEN 5.0 ELSE 3.0 END AS weight
      FROM events
    )
    SELECT CAST(date_trunc('hour', CAST(e.ts AS TIMESTAMP)) AS TIMESTAMP)
             AS hour,
           e.event_type,
           COUNT(*) AS n,
           ROUND(SUM(e.value * d.weight), 2) AS weighted_total
    FROM events e JOIN dim d USING (event_type)
    GROUP BY 1, 2
    """,
)
def q_stream_static_join(spark, sf_dir):
    """Stream-static enrichment join: the unbounded event stream joins
    a STATIC dimension (no watermark needed on the static side — it is
    re-read per micro-batch, so dim updates between batches are picked
    up), then aggregates per hour×type — ingest-time enrichment, the
    most common production streaming join.  The static side broadcasts
    into every micro-batch; state is only the windowed aggregate's."""
    from access_mopper_spark.streaming.resample import (
        events_stream, harness_shuffle, run_to_memory)
    ev = events_stream(spark, sf_dir)
    static_dim = (load_table(spark, sf_dir, "events")
                  .select("event_type").distinct()
                  .withColumn("weight",
                              F.when(F.col("event_type") == "view", 1.0)
                               .when(F.col("event_type") == "click", 2.0)
                               .when(F.col("event_type") == "purchase", 5.0)
                               .otherwise(3.0)))
    enriched = ev.join(F.broadcast(static_dim), "event_type")
    agg = (enriched.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("__w"), "event_type")
           .agg(F.count("*").alias("n"),
                F.sum(F.col("value") * F.col("weight")).alias("__wt"))
           .select(F.col("__w.start").alias("hour"), "event_type", "n",
                   pround(F.col("__wt"), 2).alias("weighted_total")))
    with harness_shuffle(spark):
        run_to_memory(agg, "q_stream_static_join_sink", mode="complete")
    return spark.table("q_stream_static_join_sink")


@query(
    "q_set_similarity_join",
    oracle=r"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest(string_split(trim(lower(text), ' '), ' '))
               AS tok
      FROM (SELECT doc_id,
                   regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')
                     AS text
            FROM documents WHERE doc_id < 120)
      WHERE length(trim(text, ' ')) > 0
    ),
    tf AS (SELECT tok, COUNT(*) AS f FROM dt GROUP BY tok),
    ranked AS (
      SELECT d.doc_id, d.tok,
             ROW_NUMBER() OVER (PARTITION BY d.doc_id
                                ORDER BY t.f, d.tok) AS pos,
             COUNT(*) OVER (PARTITION BY d.doc_id) AS n
      FROM dt d JOIN tf t USING (tok)
    ),
    prefix AS (
      SELECT doc_id, tok, n FROM ranked
      WHERE pos <= n - (n + 1) // 2 + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM prefix a JOIN prefix b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS ni
      FROM cand c
      JOIN dt x ON x.doc_id = c.id_a
      JOIN dt y ON y.doc_id = c.id_b AND y.tok = x.tok
      GROUP BY c.id_a, c.id_b
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM dt GROUP BY doc_id)
    SELECT i.id_a, i.id_b, CAST(i.ni AS INT) AS n_shared,
           ROUND(CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.5
    """,
)
def q_set_similarity_join(spark, sf_dir):
    """Exact set-similarity join with PREFIX FILTERING (the AllPairs /
    PPJoin family): order each document's distinct tokens rarest-first
    by global frequency, join candidates only on the first
    n−⌈t·n⌉+1 tokens (any pair with Jaccard ≥ t MUST share a prefix
    token — the pigeonhole bound), then verify the exact Jaccard.
    DETERMINISTIC exact-threshold output, unlike MinHash-LSH's
    probabilistic recall — the two coexist in a dedup stack (LSH for
    web scale, prefix join for exact SLAs on narrower slices).  Plan:
    token-frequency count, one keyed window for per-doc rank, prefix
    equi-join (rare tokens → tiny buckets), verification join on the
    candidate pairs only.  Jaccard is a ratio of ints — engine-exact."""
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("doc_id") < 120)
    tn = F.trim(F.regexp_replace(portable_lower(F.col("text")), "[ \t\n\r]+", " "))
    dt = (docs.select("doc_id", F.explode(F.array_distinct(
              F.split(tn, " "))).alias("tok"))
              .where(F.length("tok") > 0)).distinct()
    tf = dt.groupBy("tok").agg(F.count("*").alias("f"))
    ranked = (dt.join(tf, "tok")
                .withColumn("pos", F.row_number().over(
                    W.partitionBy("doc_id").orderBy("f", "tok")))
                .withColumn("n", F.count("*").over(
                    W.partitionBy("doc_id"))))
    prefix = ranked.where(
        F.col("pos") <= F.col("n") - ((F.col("n") + 1) / 2).cast("int") + 1)
    a = prefix.select(F.col("doc_id").alias("id_a"), "tok")
    b = prefix.select(F.col("doc_id").alias("id_b"), "tok")
    cand = (a.join(b, "tok")
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    x = dt.select(F.col("doc_id").alias("id_a"), "tok")
    y = dt.select(F.col("doc_id").alias("id_b"), "tok")
    inter = (cand.join(x, "id_a").join(y, ["id_b", "tok"])
                 .groupBy("id_a", "id_b").agg(F.count("*").alias("ni")))
    sizes = dt.groupBy("doc_id").agg(F.count("*").alias("n"))
    out = (inter
           .join(sizes.select(F.col("doc_id").alias("id_a"),
                              F.col("n").alias("na")), "id_a")
           .join(sizes.select(F.col("doc_id").alias("id_b"),
                              F.col("n").alias("nb")), "id_b"))
    jac = F.col("ni").cast("double") / (F.col("na") + F.col("nb")
                                        - F.col("ni"))
    return (out.where(jac >= 0.5)
               .select("id_a", "id_b", F.col("ni").cast("int")
                       .alias("n_shared"), R6(jac).alias("jaccard")))


@query(
    "q_point_in_time_join",
    oracle="""
    WITH hist AS (
      SELECT s_suppkey,
             'v1_' || s_name AS attr,
             TIMESTAMP '2023-10-01' AS valid_from,
             TIMESTAMP '2024-01-15' AS valid_to
      FROM supplier
      UNION ALL
      SELECT s_suppkey, 'v2_' || s_name,
             TIMESTAMP '2024-01-15', TIMESTAMP '2024-04-01'
      FROM supplier
      UNION ALL
      SELECT s_suppkey, 'v3_' || s_name,
             TIMESTAMP '2024-04-01', TIMESTAMP '9999-12-31'
      FROM supplier
    ),
    ev AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(user_id % 100 + 1 AS BIGINT) AS s_suppkey, value
      FROM events
    )
    SELECT e.event_id, e.s_suppkey, h.attr,
           ROUND(e.value, 6) AS value
    FROM ev e
    JOIN hist h
      ON h.s_suppkey = e.s_suppkey
     AND e.ts >= h.valid_from AND e.ts < h.valid_to
    """,
)
def q_point_in_time_join(spark, sf_dir):
    """Point-in-time-correct dimension lookup (the feature-store /
    warehouse PIT join): every event joins the SCD2 history version
    that was valid AT the event's timestamp — equi-join on the key
    carries the shuffle, the validity-interval predicate filters
    post-match (same never-cartesian shape as q_range_join; each event
    matches exactly one version, which the history's non-overlapping
    intervals guarantee).  Training-data relevance: features must be
    computed with point-in-time values or the dataset leaks the
    future."""
    sup = load_table(spark, sf_dir, "supplier")
    ev = load_table(spark, sf_dir, "events")
    versions = [("v1_", "2023-10-01", "2024-01-15"),
                ("v2_", "2024-01-15", "2024-04-01"),
                ("v3_", "2024-04-01", "9999-12-31")]
    hist = None
    for pre, lo, hi in versions:
        v = sup.select(
            "s_suppkey",
            F.concat(F.lit(pre), F.col("s_name")).alias("attr"),
            F.lit(lo).cast("timestamp").alias("valid_from"),
            F.lit(hi).cast("timestamp").alias("valid_to"))
        hist = v if hist is None else hist.unionByName(v)
    e = ev.select("event_id", "ts",
                  (F.col("user_id") % 100 + 1).alias("s_suppkey"), "value")
    joined = e.join(hist,
                    (e.s_suppkey == hist.s_suppkey)
                    & (e.ts >= hist.valid_from) & (e.ts < hist.valid_to))
    return joined.select("event_id", e.s_suppkey.alias("s_suppkey"),
                         "attr", R6(F.col("value")).alias("value"))


@query(
    "q_daily_percentiles",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
             AS day,
           COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    GROUP BY 1, 2
    """,
)
def q_daily_percentiles(spark, sf_dir):
    """Daily P50/P95 bands per event type — the SLO/latency-dashboard
    aggregation, exact interpolated percentiles per (type, day) group
    in one shuffle (many small groups → full parallelism; the
    extreme-cardinality swap is percentile_approx, same plan shape)."""
    ev = load_table(spark, sf_dir, "events")
    # day ships as DATE (midnight-valued; TZ-render-immune)
    return (ev.groupBy("event_type",
                       F.date_trunc("day", "ts").cast("date").alias("day"))
              .agg(F.count("*").alias("n"),
                   R6(F.expr("percentile(value, 0.5)")).alias("p50"),
                   R6(F.expr("percentile(value, 0.95)")).alias("p95")))


@query(
    "q_skew_metrics",
    oracle="""
    WITH ks AS (
      SELECT l_partkey AS key, COUNT(*) AS c FROM lineitem GROUP BY 1
    )
    SELECT COUNT(*) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_key_rows,
           ROUND(AVG(CAST(c AS DOUBLE)), 6) AS mean_key_rows,
           ROUND(MAX(c) / AVG(CAST(c AS DOUBLE)), 6) AS skew_ratio,
           ROUND(quantile_cont(c, 0.99), 6) AS p99_key_rows
    FROM ks
    """,
)
def q_skew_metrics(spark, sf_dir):
    """Join-key skew diagnostics: per-key row counts reduced to the
    numbers that decide a join strategy BEFORE running it — max key
    cardinality, mean, max/mean skew ratio, discrete P99.  This is the
    probe that tells you whether l_partkey needs salting/AQE skew
    handling at 100 TB (ratio ≈ 1 → uniform; ≫ 1 → hot keys).  One
    map-side-combined count plus a 1-row reduce; the P99 is the
    exact INTERPOLATED quantile (both engines run the identical
    integer-lerp arithmetic; discrete-quantile index conventions
    differ between engines at some n, interpolation cannot)."""
    li = load_table(spark, sf_dir, "lineitem")
    ks = li.groupBy(F.col("l_partkey").alias("key")) \
           .agg(F.count("*").alias("c"))
    return ks.agg(
        F.count("*").alias("n_keys"),
        F.max("c").alias("max_key_rows"),
        R6(F.avg(F.col("c").cast("double"))).alias("mean_key_rows"),
        R6(F.max("c") / F.avg(F.col("c").cast("double")))
        .alias("skew_ratio"),
        R6(F.expr("percentile(c, 0.99)")).alias("p99_key_rows"))


@query(
    "q_pareto_class",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    c AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS tot
      FROM pr
    )
    SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                WHEN cum * 20 <= tot * 19 THEN 'B' ELSE 'C' END AS class,
           COUNT(*) AS n_parts,
           CAST(SUM(rev) AS DOUBLE) / 100.0 AS class_revenue
    FROM c GROUP BY 1
    """,
)
def q_pareto_class(spark, sf_dir):
    """ABC / Pareto classification: parts ranked by revenue, cumulative
    share cut at 80 % / 95 % — the inventory-analysis shape (a few keys
    carry most of the mass).

    Scale + determinism design (r4 verdict item 5): revenues are summed
    as integer CENTS, so every sum is exact and order-free — the 80/95
    boundary tests become integer inequalities (5·cum ≤ 4·tot) that
    cannot flip on summation order.  That exactness is what licenses a
    DISTRIBUTED cumsum: parts bucket by revenue range (any bucketing
    that respects the sort order works), the running sum is a window
    PARTITIONED by bucket, and each bucket's exclusive prefix offset
    comes from a broadcast join over the ≤256-row bucket-total table —
    no single-partition global window anywhere, and the result is
    bit-identical to the oracle's straight ordered cumsum."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    pr = li.groupBy("l_partkey").agg(F.sum(cents).alias("rev"))
    st = pr.agg(F.max("rev").alias("__mx"), F.min("rev").alias("__mn"),
                F.sum("rev").alias("__tot"))
    # value-range bucket id ascending in the (rev DESC) sort order:
    # every row of bucket b sorts before every row of bucket b+1
    b = pr.crossJoin(F.broadcast(st)).withColumn(
        "__bk", F.least(
            ((F.col("__mx") - F.col("rev")) * 256
             / (F.col("__mx") - F.col("__mn") + 1)).cast("long"),
            F.lit(255)))
    wrun = (W.partitionBy("__bk")
             .orderBy(F.desc("rev"), F.asc("l_partkey"))
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = b.withColumn("__run", F.sum("rev").over(wrun))
    bt = run.groupBy("__bk").agg(F.sum("rev").alias("__btot"))
    off = (bt.alias("a")
             .join(F.broadcast(bt.select(F.col("__bk").alias("__bk2"),
                                         F.col("__btot").alias("__bt2"))),
                   F.col("__bk2") < F.col("a.__bk"), "left")
             .groupBy("a.__bk")
             .agg(F.sum(F.coalesce("__bt2", F.lit(0))).alias("__off")))
    c = (run.join(F.broadcast(off), "__bk")
            .select("rev", (F.coalesce("__off", F.lit(0)) + F.col("__run"))
                    .alias("cum"), F.col("__tot").alias("tot")))
    cls = F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A") \
           .when(F.col("cum") * 20 <= F.col("tot") * 19, "B").otherwise("C")
    return c.groupBy(cls.alias("class")).agg(
        F.count("*").alias("n_parts"),
        (F.sum("rev").cast("double") / 100.0).alias("class_revenue"))


@query(
    "q_null_profile",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(value) AS null_value,
           COUNT(*) - COUNT(props) AS null_props,
           COUNT(DISTINCT event_type) AS card_event_type,
           COUNT(DISTINCT user_id) AS card_user,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events
    """,
)
def q_null_profile(spark, sf_dir):
    """Column profiling in one pass: row count, per-column null counts,
    low-cardinality exact distincts, id range — the data-quality probe
    a pipeline runs on every new partition before processing it (and
    what an optimizer's ANALYZE collects).  Single aggregation, all
    counters map-side combined; at extreme cardinality the distincts
    swap to approx_count_distinct, same plan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("value")).alias("null_value"),
        (F.count("*") - F.count("props")).alias("null_props"),
        F.countDistinct("event_type").alias("card_event_type"),
        F.countDistinct("user_id").alias("card_user"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"))


