"""Corpus assembly (mixture/packing/sharding) + event analytics.

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403
from access_mopper_spark.queries.clusters_search import _DEDUP_CLUSTERS_ORACLE  # noqa: F401


# =====================================================================
# corpus assembly: mixture sampling, quantile/cap filtering, packing,
# sharding (operators/sampling.py)
# =====================================================================

@query(
    "q_mixture_sample",
    oracle="""
    WITH c AS (
      SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source
    ), m AS (
      SELECT MIN(cnt) AS cmin FROM c
    ), p AS (
      SELECT source, LEAST(1.0, POW(CAST(cnt AS DOUBLE) / cmin, -0.5)) AS p
      FROM c, m
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN p USING (source)
    WHERE ('0x' || substring(md5('mix0:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          / 4294967296.0 < p.p
    """,
)
def q_mixture_sample(spark, sf_dir):
    """Temperature-flattened source mixture (alpha=0.5): large sources
    downsampled toward share ∝ count^alpha (the smallest source keeps
    everything — sampling never upsamples), membership a deterministic
    md5 test against the broadcast per-source keep probability — two
    tiny aggregates + a map-only filter, no data shuffle."""
    from access_mopper_spark.operators.sampling import mixture_sample
    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(docs, "source", alpha=0.5).select("doc_id", "source")


@query(
    "q_quality_quantile_filter",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents
    ), c AS (
      SELECT doc_id, lang,
             CASE WHEN length(tn) = 0 THEN 0
                  ELSE length(tn) - length(replace(tn, ' ', '')) + 1 END AS ntok
      FROM t
    ), r AS (
      SELECT doc_id, lang, ntok,
             PERCENT_RANK() OVER (PARTITION BY lang
                                  ORDER BY ntok DESC, doc_id) AS pr
      FROM c
    )
    SELECT doc_id, lang, ntok FROM r WHERE pr < 0.5
    """,
)
def q_quality_quantile_filter(spark, sf_dir):
    """Per-language quality thresholding: keep the top half of each
    language by token count, so high-resource languages don't set the
    bar for low-resource ones.  Exact percent_rank over one keyed window
    shuffle; deterministic id tiebreak (at extreme scale the documented
    swap is an approx-percentile threshold broadcast back + map filter)."""
    from access_mopper_spark.functions.text import token_count
    from access_mopper_spark.operators.sampling import quality_quantile_filter
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang",
                         token_count(F.col("text")).alias("ntok"))
    return quality_quantile_filter(scored, "ntok", "lang", keep_top=0.5)


@query(
    "q_cap_per_group",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, source, n_chars FROM r WHERE rn <= 50
    """,
)
def q_cap_per_group(spark, sf_dir):
    """Per-source document cap (anti single-origin domination): keep the
    50 largest documents per source — one keyed window shuffle,
    best-first with deterministic id tiebreak."""
    from access_mopper_spark.operators.sampling import cap_per_group
    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(docs, "source", "n_chars", 50) \
        .select("doc_id", "source", "n_chars")


@query(
    "q_pack_sequences",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents
    ), c AS (
      SELECT doc_id, source,
             CASE WHEN length(tn) = 0 THEN 0
                  ELSE length(tn) - length(replace(tn, ' ', '')) + 1 END AS ntok
      FROM t
    ), s AS (
      SELECT doc_id, source, ntok,
             COALESCE(SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS before
      FROM c
    )
    SELECT doc_id, source, ntok,
           CAST(FLOOR(before / 2048.0) AS BIGINT) AS bin_id,
           CAST(before % 2048 AS BIGINT) AS bin_offset
    FROM s
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Context-window packing: lay documents out in id order per source
    and assign each to the token-budget bin (2048) where the running
    total stood when it arrived, with its offset in that bin — the
    deterministic streaming-fill packing a trainer's concat-and-chunk
    loader consumes.  One keyed window shuffle (a grouped running sum)."""
    from access_mopper_spark.functions.text import token_count
    from access_mopper_spark.operators.sampling import pack_sequences
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source",
                       token_count(F.col("text")).alias("ntok"))
    return pack_sequences(toks, "ntok", 2048, "source") \
        .select("doc_id", "source", "ntok", "bin_id", "bin_offset")


@query(
    "q_shard_assign",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substring(md5('shard0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % 16 AS INT) AS shard
    FROM documents
    """,
)
def q_shard_assign(spark, sf_dir):
    """Deterministic output sharding: shard = md5-lane(id) mod 16 —
    map-only, engine-portable, uniform shard sizes; writing is then one
    partitionBy('shard') pass."""
    from access_mopper_spark.operators.sampling import shard_assign
    docs = load_table(spark, sf_dir, "documents")
    return shard_assign(docs, 16).select("doc_id", "shard")


@query(
    "q_chunk_documents",
    oracle="""
    WITH n AS (
      SELECT doc_id, text,
             GREATEST(1, CAST(CEIL((length(text) - 50) / 150.0) AS BIGINT)) AS nch
      FROM documents
    )
    SELECT doc_id, g.i AS chunk_id,
           substring(text, g.i * 150 + 1, 200) AS chunk,
           length(substring(text, g.i * 150 + 1, 200)) AS chunk_len
    FROM n, (SELECT UNNEST(range(0, (SELECT COALESCE(MAX(nch), 1) FROM n))) AS i) g
    WHERE g.i < nch
    """,
)
def q_chunk_documents(spark, sf_dir):
    """Context-window chunking: 200-char windows, 50-char overlap
    (stride 150), last chunk runs to the document end.  Map-only
    sequence→explode — output volume scales with corpus bytes, not
    document count, and no shuffle is involved."""
    from access_mopper_spark.operators.sampling import chunk_documents
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, size=200, overlap=50) \
        .select("doc_id", "chunk_id", "chunk",
                F.length("chunk").alias("chunk_len"))


@query(
    "q_cross_dedup",
    oracle=r"""
    WITH toks AS (SELECT doc_id, string_split(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' '), ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[g.i : g.i + 2], ' ') AS s
      FROM toks, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(w)), 1) FROM toks) + 1)) AS i) g
      WHERE g.i <= greatest(length(w) - 2, 1)
    ),
    sig AS (
      SELECT doc_id,
             MIN(substring(md5('seed0:' || s), 1, 8)) AS m0,
             MIN(substring(md5('seed0:' || s), 9, 8)) AS m1,
             MIN(substring(md5('seed0:' || s), 17, 8)) AS m2,
             MIN(substring(md5('seed0:' || s), 25, 8)) AS m3,
             MIN(substring(md5('seed1:' || s), 1, 8)) AS m4,
             MIN(substring(md5('seed1:' || s), 9, 8)) AS m5
      FROM sh GROUP BY doc_id
    ),
    band AS (SELECT doc_id, md5(m0 || '|' || m1) AS b0, md5(m2 || '|' || m3) AS b1,
                    md5(m4 || '|' || m5) AS b2 FROM sig)
    SELECT d.doc_id FROM band d
    WHERE d.doc_id >= 50
      AND NOT EXISTS (
        SELECT 1 FROM band r
        WHERE r.doc_id < 50
          AND (r.b0 = d.b0 OR r.b1 = d.b1 OR r.b2 = d.b2))
    """,
)
def q_cross_dedup(spark, sf_dir):
    """Fuzzy cross-corpus decontamination: docs with id >= 50 are the
    incoming corpus, id < 50 the held-out reference; any incoming doc
    sharing an LSH band (6 minhashes, 3 bands of 2, word 3-shingles)
    with the reference is dropped.  Both sides shuffle only
    (id, band_idx, band_key); matched ids anti-join back."""
    from access_mopper_spark.operators.dedup import cross_corpus_dedup
    docs = load_table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") >= 50)
    ref = docs.where(F.col("doc_id") < 50)
    return cross_corpus_dedup(new, ref, "text", "doc_id",
                              n_hashes=6, band_size=2, shingle_k=3,
                              shingle_kind="word").select("doc_id")


@query(
    "q_lm_score",
    oracle=r"""
    WITH tn AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents
    ),
    toks AS (
      -- blank docs filtered BEFORE split: DuckDB splits '' to [''] while
      -- Spark tokenization yields [], which would skew c_uni and V
      SELECT doc_id, regexp_split_to_array(tn, ' ') AS w
      FROM tn WHERE length(tn) > 0
    ),
    g AS (  -- data-derived bound, not a constant cap
      SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(w)), 1) FROM toks))) AS i
    ),
    pairs AS (
      SELECT doc_id, w[g.i] AS w1, w[g.i] || ' ' || w[g.i + 1] AS bigram
      FROM toks, g
      WHERE g.i <= length(w) - 1
    ),
    big AS (SELECT bigram, COUNT(*) AS c_big FROM pairs GROUP BY bigram),
    uni AS (
      SELECT w1, COUNT(*) AS c_uni FROM (
        SELECT doc_id, unnest(w) AS w1 FROM toks
      ) GROUP BY w1
    ),
    v AS (SELECT COUNT(*) AS v FROM uni),
    perdoc AS (
      SELECT p.doc_id,
             ROUND(AVG(ln((b.c_big + 1.0) / (u.c_uni + 1.0 * v.v))), 6)
               AS lm_score,
             COUNT(*) AS n_bigrams
      FROM pairs p
      JOIN big b USING (bigram)
      JOIN uni u USING (w1)
      CROSS JOIN v
      GROUP BY p.doc_id
    )
    -- operator contract: docs with <2 tokens keep a row with NULL
    -- score/n_bigrams (the downstream filter decides), so the oracle
    -- left-joins from documents instead of dropping them
    SELECT d.doc_id, pd.lm_score, pd.n_bigrams
    FROM documents d LEFT JOIN perdoc pd USING (doc_id)
    """,
)
def q_lm_score(spark, sf_dir):
    """Corpus-trained bigram language-model quality score (the model-based
    filter of a curation pipeline, the role KenLM perplexity plays in
    public web-corpus pipelines): train add-1-smoothed bigram statistics
    on the corpus (one shuffle), score each doc by mean bigram
    log-probability (explode + two n-gram-key equi-joins + one per-doc
    aggregate — the model stays distributed, never collected)."""
    from access_mopper_spark.operators.lm import (score_bigram_logprob,
                                                  train_bigram_lm)
    docs = load_table(spark, sf_dir, "documents")
    big, uni, vocab = train_bigram_lm(docs)
    out = score_bigram_logprob(docs, big, uni, vocab, k=1.0)
    return out.select("doc_id", R6(F.col("lm_score")).alias("lm_score"),
                      "n_bigrams")


@query(
    "q_cms_counts",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'), ' '),
               ' ')) AS term
      FROM documents
    ),
    pairs AS (
      SELECT term, g.d,
             ('0x' || substring(md5('cms' || g.d || ':' || term), 1, 8))::BIGINT
               % 512 AS bucket
      FROM toks, generate_series(0, 3) g(d)
    ),
    sketch AS (
      SELECT d, bucket, COUNT(*) AS cnt FROM pairs GROUP BY d, bucket
    ),
    truth AS (SELECT term, COUNT(*) AS true_count FROM toks GROUP BY term),
    probes AS (
      SELECT t.term, g.d,
             ('0x' || substring(md5('cms' || g.d || ':' || t.term), 1, 8))::BIGINT
               % 512 AS bucket
      FROM (SELECT DISTINCT term FROM toks) t, generate_series(0, 3) g(d)
    ),
    est AS (
      SELECT p.term, MIN(COALESCE(s.cnt, 0)) AS est_count
      FROM probes p LEFT JOIN sketch s USING (d, bucket)
      GROUP BY p.term
    )
    SELECT e.term, t.true_count, e.est_count
    FROM est e JOIN truth t USING (term)
    ORDER BY t.true_count DESC, e.term
    LIMIT 20
    """,
)
def q_cms_counts(spark, sf_dir):
    """Count-min sketch frequency estimation (mergeable sketch, fixed
    depth×width memory at any corpus size): build a 4×512 CMS over the
    corpus token stream, estimate every distinct token, and report the
    top-20 tokens with true vs estimated counts — the one-sided
    overestimate guarantee (est ≥ true) is visible in the output and
    asserted in tests."""
    from access_mopper_spark.operators.search import tokens as tok_fn
    from access_mopper_spark.operators.sketch import cms_build, cms_estimate
    docs = _wide(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tok_fn(portable_lower(F.col("text")))).alias("term"))
    sketch = cms_build(toks, "term", depth=4, width=512)
    est = cms_estimate(sketch, toks, "term", depth=4, width=512)
    truth = toks.groupBy("term").agg(F.count("*").alias("true_count"))
    return (truth.join(est, "term")
            .orderBy(F.col("true_count").desc(), F.col("term"))
            .limit(20)
            .select("term", "true_count", "est_count"))


# =====================================================================
# event analytics: funnel, cohort retention, outlier filtering
# =====================================================================

@query(
    "q_funnel",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t_view) AS step_view,
           COUNT(CASE WHEN t_click > t_view THEN 1 END) AS step_click,
           COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
             AS step_purchase
    FROM steps
    """,
)
def q_funnel(spark, sf_dir):
    """Ordered conversion funnel (view → click → purchase): one grouped
    conditional-min pass per user (map-side combined), then counting
    users whose step timestamps are strictly increasing.  No joins, no
    window — the funnel semantics live in conditional aggregation, the
    shape that survives billions of users."""
    ev = load_table(spark, sf_dir, "events")
    steps = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"))
    return steps.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("step_click"),
        F.count(F.when((F.col("t_purchase") > F.col("t_click"))
                       & (F.col("t_click") > F.col("t_view")), 1))
        .alias("step_purchase"))


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS TIMESTAMP)
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(FLOOR(epoch(CAST(e.ts AS TIMESTAMP) - f.cohort_week)
                        / 604800.0) AS BIGINT) AS week_k
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week, week_k,
           COUNT(*) AS active_users
    FROM activity GROUP BY cohort_week, week_k
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-activity week;
    for each cohort, how many are active k weeks later.  Two shuffles
    (first-touch per user, then distinct cohort-week activity) — the
    user-keyed join broadcasts nothing and stays co-partitioned on
    user_id, the property that matters at 10^9 users."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    week_k = F.floor(
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("cohort_week")))
        / F.lit(604800.0 * 1e6)).cast("long")
    activity = (ev.join(firsts, "user_id")
                  .select("user_id", "cohort_week", week_k.alias("week_k"))
                  .distinct())
    # cohort_week is week-truncated (midnight) → ship as DATE
    return (activity.groupBy("cohort_week", "week_k")
            .agg(F.count("*").alias("active_users"))
            .select(F.col("cohort_week").cast("date").alias("cohort_week"),
                    "week_k", "active_users"))


@query(
    "q_outlier_filter",
    oracle="""
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND((e.value - s.mu) / s.sigma, 6) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE ABS((e.value - s.mu) / s.sigma) > 3.0
    """,
)
def q_outlier_filter(spark, sf_dir):
    """Per-type z-score outlier detection: tiny per-type stats broadcast
    back onto the stream, outliers flagged map-side — the data side never
    shuffles (same shape as mixture_sample)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma"))
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (ev.join(F.broadcast(stats), "event_type")
              .where(F.abs(z) > 3.0)
              .select("event_id", "event_type", R6(z).alias("zscore")))


@query(
    "q_scd2_merge",
    oracle="""
    WITH cur_closed AS (
      SELECT s_suppkey, 'OLD_' || s_name AS s_name,
             TIMESTAMP '2023-01-01' AS valid_from,
             TIMESTAMP '2024-01-01' AS valid_to
      FROM supplier WHERE s_suppkey < 5
    ),
    changed AS (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0)
    SELECT * FROM cur_closed
    UNION ALL   -- open rows whose snapshot matches: pass through
    SELECT s_suppkey, s_name, TIMESTAMP '2024-01-01', CAST(NULL AS TIMESTAMP)
    FROM supplier WHERE s_suppkey % 10 <> 0
    UNION ALL   -- changed open rows: closed at the effective date
    SELECT s_suppkey, s_name, TIMESTAMP '2024-01-01', TIMESTAMP '2024-06-01'
    FROM supplier WHERE s_suppkey % 10 = 0
    UNION ALL   -- their new open versions
    SELECT s_suppkey, 'NEW_' || s_name, TIMESTAMP '2024-06-01',
           CAST(NULL AS TIMESTAMP)
    FROM supplier WHERE s_suppkey % 10 = 0
    UNION ALL   -- never-seen keys: brand-new open rows
    SELECT s_suppkey + 200000, 'BRAND_' || s_name, TIMESTAMP '2024-06-01',
           CAST(NULL AS TIMESTAMP)
    FROM supplier WHERE s_suppkey < 3
    """,
)
def q_scd2_merge(spark, sf_dir):
    """Type-2 slowly-changing-dimension merge: an incoming supplier
    snapshot (10% renamed, 3 brand-new keys) applied to a history table
    with open and closed rows — changed rows close at the effective
    date and reopen with new values.  One key-co-partitioned full-outer
    join + a three-branch union; the MERGE INTO shape of an ACID table
    format."""
    from access_mopper_spark.catalog.matching import scd2_merge
    sup = load_table(spark, sf_dir, "supplier")
    cur_open = sup.select(
        "s_suppkey", "s_name",
        F.lit("2024-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"))
    cur_closed = sup.where(F.col("s_suppkey") < 5).select(
        "s_suppkey", F.concat(F.lit("OLD_"), F.col("s_name")).alias("s_name"),
        F.lit("2023-01-01").cast("timestamp").alias("valid_from"),
        F.lit("2024-01-01").cast("timestamp").alias("valid_to"))
    current = cur_closed.unionByName(cur_open)
    incoming = sup.select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 10 == 0,
               F.concat(F.lit("NEW_"), F.col("s_name")))
        .otherwise(F.col("s_name")).alias("s_name")) \
        .unionByName(sup.where(F.col("s_suppkey") < 3).select(
            (F.col("s_suppkey") + 200000).alias("s_suppkey"),
            F.concat(F.lit("BRAND_"), F.col("s_name")).alias("s_name")))
    return scd2_merge(current, incoming, ["s_suppkey"], ["s_name"],
                      "2024-06-01")


@query(
    "q_zorder_key",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           -- per-row lambda, NOT a GROUP BY over the key tuple: lineitem
           -- key tuples are not unique, and grouping would collapse
           -- duplicate rows that the Spark projection preserves
           CAST(list_sum(list_transform(range(0, 16), i ->
                  ((((l_partkey % 65536) >> i) & 1) << (2 * i))
                + ((((l_suppkey % 65536) >> i) & 1) << (2 * i + 1))))
                AS BIGINT) AS zkey
    FROM lineitem
    """,
)
def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey):
    interleaved 16-bit lanes as pure codegen bit math.  Sorting output
    files by this key gives tight min/max stats on both columns at once
    — multi-dimensional data skipping from a one-dimensional sort (see
    tests/test_sampling.py zorder locality test)."""
    from access_mopper_spark.operators.partitioning import zorder_key
    li = load_table(spark, sf_dir, "lineitem")
    zkey = zorder_key([F.col("l_partkey") % 65536,
                       F.col("l_suppkey") % 65536], bits=16)
    return li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                     zkey.alias("zkey"))


@query(
    "q_value_histogram",
    oracle="""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
    SELECT event_type,
           CAST(LEAST(GREATEST(CASE WHEN hi = lo THEN 0
                               ELSE FLOOR((value - lo) / (hi - lo) * 20) END,
                               0), 19)
                AS INT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(value), 6) AS bucket_min,
           ROUND(MAX(value), 6) AS bucket_max
    FROM events, b
    GROUP BY event_type, bucket
    """,
)
def q_value_histogram(spark, sf_dir):
    """Fixed-width 20-bucket histogram of event values per type: bounds
    from a broadcast 1-row aggregate, bucket assignment map-side, one
    combined count shuffle on the tiny (type, bucket) key."""
    from access_mopper_spark.operators.aggregates import fixed_width_histogram
    ev = load_table(spark, sf_dir, "events")
    h = fixed_width_histogram(ev, "value", 20, ["event_type"])
    return h.select("event_type", "bucket", "n",
                    R6(F.col("bucket_min")).alias("bucket_min"),
                    R6(F.col("bucket_max")).alias("bucket_max"))


@query(
    "q_entity_blocks",
    oracle="""
    WITH k AS (
      SELECT c_custkey AS id, lower(c_name) AS t,
             substring(lower(c_name), 1, 12) AS blk
      FROM customer WHERE c_custkey < 500
    )
    SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.t, b.t) AS edit_dist
    FROM k a JOIN k b ON a.blk = b.blk AND a.id < b.id
    WHERE ABS(length(a.t) - length(b.t)) <= 1
      AND levenshtein(a.t, b.t) <= 1
    """,
)
def q_entity_blocks(spark, sf_dir):
    """Corpus×corpus entity resolution with prefix blocking: customer
    names sharing a 12-char prefix are candidates; only candidates pay
    levenshtein.  One equi-join shuffle on the block key — the shape
    that replaces a cross product when both sides are large."""
    from access_mopper_spark.operators.fuzzy import blocked_entity_pairs
    cust = load_table(spark, sf_dir, "customer") \
        .where(F.col("c_custkey") < 500)
    return blocked_entity_pairs(cust, "c_name", "c_custkey",
                                block_prefix=12, max_dist=1)


@query(
    "q_max_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_id,
             CAST(ts AS TIMESTAMP) AS s,
             LEAST(CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   + INTERVAL 1 DAY) AS e
      FROM events
    ),
    pts AS (
      SELECT event_id, CAST(date_trunc('day', s) AS TIMESTAMP) AS d,
             s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_id, CAST(date_trunc('day', s) AS TIMESTAMP) AS d,
             e AS t, -1 AS delta FROM iv
    ),
    sweep AS (
      SELECT d, SUM(delta) OVER (PARTITION BY d ORDER BY t, delta DESC, event_id
                                 ROWS UNBOUNDED PRECEDING) AS running
      FROM pts
    )
    SELECT CAST(d AS DATE) AS day, MAX(running) AS max_concurrent
    FROM sweep GROUP BY d
    """,
)
def q_max_concurrency(spark, sf_dir):
    """Per-day peak concurrency of 5-minute event intervals — the
    interval-sweep (+1/−1 endpoint cumsum) pattern for "max simultaneous
    sessions".  Intervals clip at midnight so every endpoint lands in
    its start's day and the sweep partitions cleanly by date: one keyed
    window shuffle, deterministic tie order (arrivals before
    departures, then event id).

    The day key ships as DATE, not the midnight TIMESTAMP (r4 verdict
    item 2): a timestamp cell renders through the session timezone and
    was the one remaining non-integer hash surface when this row failed
    its first driver exposure."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("s"))
    iv = ev.select(
        "event_id", F.col("ts").alias("s"),
        F.least(F.col("ts") + F.expr("INTERVAL 5 MINUTE"),
                F.date_trunc("day", F.col("ts")) + F.expr("INTERVAL 1 DAY"))
        .alias("e"))
    pts = iv.select("event_id", day.alias("d"), F.col("s").alias("t"),
                    F.lit(1).alias("delta")) \
        .unionByName(iv.select("event_id", day.alias("d"),
                               F.col("e").alias("t"),
                               F.lit(-1).alias("delta")))
    w = (W.partitionBy("d")
         .orderBy(F.col("t"), F.col("delta").desc(), F.col("event_id"))
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    sweep = pts.withColumn("running", F.sum("delta").over(w))
    return sweep.groupBy(F.to_date("d").alias("day")) \
        .agg(F.max("running").alias("max_concurrent"))


@query(
    "q_pivot",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot (long → wide): per-user event counts as one column per
    event type.  An EXPLICIT value list keeps the plan a single
    conditional aggregate (one shuffle, map-side combined) — omitting it
    costs an extra distinct-values job and is the classic pivot
    anti-pattern at scale."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return ev.groupBy("user_id").pivot("event_type", types).count() \
        .na.fill(0, types)


@query(
    "q_unpivot",
    oracle="""
    WITH wide AS (
      SELECT user_id,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      FROM events GROUP BY user_id
    )
    SELECT user_id, 'click' AS event_type, click AS n FROM wide
    UNION ALL
    SELECT user_id, 'view' AS event_type, view AS n FROM wide
    """,
)
def q_unpivot(spark, sf_dir):
    """Unpivot/melt (wide → long): the inverse reshape via
    ``DataFrame.unpivot`` — stack expressions, map-only over the wide
    frame (no shuffle beyond the upstream aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", ["click", "view"]).count() \
        .na.fill(0, ["click", "view"])
    return wide.unpivot("user_id", ["click", "view"], "event_type", "n")


@query(
    "q_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             POW(('0x' || substring(md5('wrs0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 / 4294967296.0, 1.0 / n_chars) AS wkey
      FROM documents
      WHERE n_chars > 0  -- zero/NULL weight = never sampled (matches operator)
    ),
    ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY wkey DESC, doc_id) AS rn
      FROM keyed
    )
    SELECT doc_id, source, n_chars FROM ranked WHERE rn <= 20
    """,
)
def q_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (20 docs per source,
    weight = document length) via Efraimidis–Spirakis exponential keys
    over the portable md5 uniform — deterministic, one keyed window
    shuffle, no RNG state."""
    from access_mopper_spark.operators.sampling import weighted_sample_per_group
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_per_group(docs, "n_chars", 20, "source") \
        .select("doc_id", "source", "n_chars")


@query(
    "q_stream_trending",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'), ' '),
               ' ')) AS term
      FROM documents
    )
    SELECT term, COUNT(*) AS n
    FROM toks GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
)
def q_stream_trending(spark, sf_dir):
    """Trending terms over a document STREAM: per-micro-batch token
    explode feeding a running complete-mode count — the streaming
    word-count that backs a live "what's trending" panel.  With
    AvailableNow over finite input the final state equals the batch
    aggregate, which is what the oracle checks; an unbounded deployment
    adds a window + watermark to age terms out."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    from access_mopper_spark.operators.search import tokens as tok_fn
    from access_mopper_spark.streaming.resample import (harness_shuffle,
                                                        run_to_memory,
                                                        stream_source)
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    raw = stream_source(spark, sf_dir, schema, glob="documents.parquet")
    counts = (raw.select(F.explode(tok_fn(portable_lower(F.col("text")))).alias("term"))
              .groupBy("term").agg(F.count("*").alias("n")))
    with harness_shuffle(spark):
        run_to_memory(counts, "q_stream_trending_sink", mode="complete")
    return (spark.table("q_stream_trending_sink")
            .orderBy(F.col("n").desc(), F.col("term")).limit(20))


@query(
    "q_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct(spark, sf_dir):
    """HLL++ approximate distinct count next to the exact one, emitting
    a deterministic within-5%% flag the oracle can value-check: the
    sketch (mergeable, fixed memory) is the 100 TB path where exact
    COUNT(DISTINCT) would shuffle every key; at rsd=0.01 the estimate
    sits far inside the 5%% band, so the flag is stably TRUE on both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("__approx"))
    return agg.select(
        "event_type", "exact_users",
        (F.abs(F.col("__approx") - F.col("exact_users"))
         / F.col("exact_users") < 0.05).alias("approx_within_5pct"))


ORACLES["q_dedup_keep_list"] = f"""
    SELECT doc_id FROM ({_DEDUP_CLUSTERS_ORACLE}) WHERE doc_id = cluster_id
"""


@query("q_dedup_keep_list")
def q_dedup_keep_list(spark, sf_dir):
    """The end of the dedup chain: LSH pairs → connected components →
    keep ONE document per cluster (the min-id representative; singletons
    keep themselves).  This is the list a curation run joins back to
    materialize the deduplicated corpus — same plan as
    q_dedup_clusters plus a map-side representative filter."""
    from access_mopper_spark.operators.dedup import dedup_clusters, near_dup_pairs
    docs = load_table(spark, sf_dir, "documents")
    pairs = near_dup_pairs(docs, "text", "doc_id", n_hashes=6, band_size=2,
                           shingle_k=3, jaccard_threshold=0.5, shingle_kind="word")
    clusters = dedup_clusters(pairs, docs.select("doc_id"))
    return clusters.where(F.col("doc_id") == F.col("cluster_id")) \
        .select("doc_id")


@query(
    "q_chunk_tokens",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(
               trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' '), ' ') AS w
      FROM documents
    ),
    n AS (
      SELECT doc_id, w,
             GREATEST(1, CAST(CEIL((length(w) - 8) / 24.0) AS BIGINT)) AS nch
      FROM t
    )
    SELECT doc_id, g.i AS chunk_id,
           array_to_string(w[g.i * 24 + 1 : g.i * 24 + 32], ' ') AS chunk,
           length(w[g.i * 24 + 1 : g.i * 24 + 32]) AS chunk_ntok
    FROM n, (SELECT UNNEST(range(0, (SELECT COALESCE(MAX(nch), 1) FROM n))) AS i) g
    WHERE g.i < nch
    """,
)
def q_chunk_tokens(spark, sf_dir):
    """Token-aligned context-window chunking: 32-token windows with
    8-token overlap (stride 24); boundaries never split a word.
    Map-only sequence→explode, no shuffle."""
    from access_mopper_spark.operators.sampling import chunk_documents_tokens
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents_tokens(docs, size=32, overlap=8) \
        .select("doc_id", "chunk_id", "chunk", "chunk_ntok")


@query(
    "q_assembly_pipeline",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents
    ),
    c AS (
      SELECT doc_id, source,
             CASE WHEN length(tn) = 0 THEN 0
                  ELSE length(tn) - length(replace(tn, ' ', '')) + 1 END AS ntok
      FROM t
    ),
    f AS (SELECT * FROM c WHERE ntok >= 10),
    cnt AS (SELECT source, COUNT(*) AS n FROM f GROUP BY source),
    m AS (SELECT MIN(n) AS cmin FROM cnt),
    p AS (
      SELECT source, LEAST(1.0, POW(CAST(n AS DOUBLE) / cmin, -0.5)) AS p
      FROM cnt, m
    ),
    kept AS (
      SELECT f.doc_id, f.source, f.ntok
      FROM f JOIN p USING (source)
      WHERE ('0x' || substring(md5('mix0:' || CAST(f.doc_id AS VARCHAR)), 1, 8))::BIGINT
            / 4294967296.0 < p.p
    ),
    s AS (
      SELECT doc_id, source, ntok,
             COALESCE(SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS before
      FROM kept
    )
    SELECT doc_id, source, ntok,
           CAST(FLOOR(before / 2048.0) AS BIGINT) AS bin_id,
           CAST(before % 2048 AS BIGINT) AS bin_offset,
           CAST(('0x' || substring(md5('shard0:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % 8 AS INT) AS shard
    FROM s
    """,
)
def q_assembly_pipeline(spark, sf_dir):
    """End-to-end corpus assembly in ONE declarative plan: quality floor
    (≥10 tokens) → temperature-flattened mixture sampling (broadcast
    per-source probabilities) → token-budget sequence packing (one keyed
    window shuffle) → deterministic sharding (map-only).  The whole
    pipeline is one corpus scan, one broadcast of tiny stats, and one
    window shuffle — the round-3 counterpart of q_curation_pipeline's
    filter→scrub→dedup→split composite."""
    from access_mopper_spark.functions.text import token_count
    from access_mopper_spark.operators.sampling import (mixture_sample,
                                                        pack_sequences,
                                                        shard_assign)
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "source",
                         token_count(F.col("text")).alias("ntok"))
    filtered = scored.where(F.col("ntok") >= 10)
    kept = mixture_sample(filtered, "source", alpha=0.5)
    packed = pack_sequences(kept, "ntok", 2048, "source")
    return shard_assign(packed, 8).select(
        "doc_id", "source", "ntok", "bin_id", "bin_offset", "shard")


