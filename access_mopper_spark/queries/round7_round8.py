"""Round-7/8/9: decontam, DSIR, CC, profiling, web/line curation, preference QC.

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403
from access_mopper_spark.queries.clusters_search import _DEDUP_CLUSTERS_ORACLE  # noqa: F401


# =====================================================================
# round 7 additions: exact n-gram decontamination, DSIR importance
# weights, log-round connected components
# =====================================================================


@query(
    "q_ngram_decontaminate",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'),
                               ' '), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    g AS (
      SELECT UNNEST(range(1, (SELECT MAX(len(w)) FROM toks) + 1)) AS i
    ),
    sh AS (
      SELECT doc_id, array_to_string(w[g.i : g.i + 7], ' ') AS gram
      FROM toks, g WHERE g.i <= greatest(len(w) - 7, 1)
    ),
    refg AS (SELECT DISTINCT gram FROM sh WHERE doc_id < 40),
    newg AS (SELECT DISTINCT doc_id, gram FROM sh WHERE doc_id >= 40),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM newg GROUP BY doc_id),
    hit AS (
      SELECT n.doc_id, COUNT(*) AS n_shared
      FROM newg n JOIN refg r USING (gram) GROUP BY n.doc_id
    )
    SELECT h.doc_id, t.n_grams, h.n_shared
    FROM hit h JOIN tot t USING (doc_id)
    """,
)
def q_ngram_decontaminate(spark, sf_dir):
    """Exact 8-gram overlap decontamination (operators/dedup.
    ngram_decontaminate) — the GPT-3/PaLM published method: training
    documents sharing ANY verbatim word 8-gram with the benchmark set
    (docs 0-39 here) are flagged with their shared-gram count.  The
    exact-match complement of q_cross_dedup's MinHash banding: LSH
    catches paraphrases, this catches short verbatim spans below the
    banding's similarity floor.  Reference grams broadcast (benchmarks
    are small by construction); the corpus probe is map-only + one
    per-doc rollup."""
    from access_mopper_spark.operators.dedup import ngram_decontaminate
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.where(F.col("doc_id") < 40)
    new = docs.where(F.col("doc_id") >= 40)
    return ngram_decontaminate(new, ref, "text", "doc_id", n=8)


@query(
    "q_importance_weights",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
             unnest(string_split(trim(regexp_replace(text, '[ \t\n\r]+',
                                                     ' ', 'g'), ' '),
                                 ' ')) AS word
      FROM documents WHERE text IS NOT NULL
    ),
    tw AS (
      SELECT doc_id, t,
             ('0x' || substring(md5('dsir:' || word), 1, 8))::BIGINT % 64
               AS b
      FROM toks WHERE length(word) > 0
    ),
    counts AS (SELECT b, SUM(t) AS ct, COUNT(*) AS cs FROM tw GROUP BY b),
    tot AS (SELECT SUM(ct) AS tt, SUM(cs) AS ts FROM counts),
    lr AS (
      SELECT b,
             CAST(FLOOR((ln((ct + 1) / CAST(tt + 64 AS DOUBLE))
                         - ln((cs + 1) / CAST(ts + 64 AS DOUBLE)))
                        * 1e6 + 0.5) AS BIGINT) AS lr_micro
      FROM counts, tot
    )
    SELECT tw.doc_id, COUNT(*) AS n_toks, SUM(lr.lr_micro) AS imp_micro
    FROM tw JOIN lr USING (b) GROUP BY tw.doc_id
    """,
)
def q_importance_weights(spark, sf_dir):
    """Hashed-unigram importance weights (DSIR, Xie et al. 2023) with
    lang='en' as the target domain: every document scored by how much
    its hashed word distribution resembles the target vs the raw corpus
    (operators/sampling.importance_weights).  The per-bucket log-ratio
    snaps to the 1e-6 micro-nat grid BEFORE the per-document sum, so
    the score is an exact BIGINT — order-free, partition-invariant,
    hash-stable.  One bucket-count shuffle; the 64-row ratio table
    broadcasts; scoring is map-side + one per-doc rollup."""
    from access_mopper_spark.operators.sampling import importance_weights
    docs = load_table(spark, sf_dir, "documents")
    return importance_weights(docs, F.col("lang") == "en",
                              "text", "doc_id", n_buckets=64)


@query(
    "q_cc_large_small_star",
    oracle="""
    WITH RECURSIVE o AS (
      SELECT o_orderkey, o_orderkey % 50 AS grp,
             o_custkey * 50 + (o_orderkey % 50) AS node
      FROM orders WHERE o_orderkey % 16 = 0
    ),
    ed AS (
      SELECT LAG(node) OVER (PARTITION BY grp ORDER BY o_orderkey) AS a,
             node AS b
      FROM o
    ),
    e AS (SELECT a, b FROM ed WHERE a IS NOT NULL AND a <> b),
    und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
    reach(node, lbl) AS (
      SELECT node, node AS lbl FROM (SELECT DISTINCT node FROM o)
      UNION
      SELECT u.a AS node, r.lbl
      FROM und u JOIN reach r ON r.node = u.b
    )
    SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node
    """,
)
def q_cc_large_small_star(spark, sf_dir):
    """Connected components in O(log n) rounds via alternating
    large-star/small-star contraction (Kiveris et al. 2014;
    operators/graph.cc_large_small_star) over an order-chain graph:
    consecutive orders inside each of 50 hash groups link their
    (customer, group) nodes, giving long chains whose diameter would
    cost the min-label loop hundreds of shuffles — star contraction
    converges in ~log rounds.  The oracle is a genuinely INDEPENDENT
    algorithm: DuckDB's recursive transitive closure with min-label
    aggregation, not a replay of the Spark loop."""
    from access_mopper_spark.operators.graph import cc_large_small_star
    o = load_table(spark, sf_dir, "orders") \
        .where(F.col("o_orderkey") % 16 == 0) \
        .select("o_orderkey", (F.col("o_orderkey") % 50).alias("grp"),
                (F.col("o_custkey") * 50 + F.col("o_orderkey") % 50)
                .alias("node"))
    wlag = W.partitionBy("grp").orderBy("o_orderkey")
    ed = o.select(F.lag("node").over(wlag).alias("a"),
                  F.col("node").alias("b"))
    edges = ed.where(F.col("a").isNotNull() & (F.col("a") != F.col("b")))
    nodes = o.select("node").distinct()
    return cc_large_small_star(edges, nodes, "a", "b", max_rounds=12)


_GRAM_SQL = """src AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (
      SELECT UNNEST(range(1, (SELECT MAX(len(v)) FROM src) + 1)) AS i
    ),
    el AS (
      SELECT vec_id, CAST(i - 1 AS INT) AS i, v[i] AS x
      FROM src CROSS JOIN dims
    ),
    gut AS (
      SELECT a.i AS i, b.i AS j, ROUND(SUM(a.x * b.x), 6) AS s
      FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i
    ),
    m AS (
      SELECT i, j, s FROM gut
      UNION ALL
      SELECT j AS i, i AS j, s FROM gut WHERE i < j
    )"""


def _pca_iter_sql(k: int) -> str:
    return f""",
    w{k} AS (
      SELECT m.i AS idx, ROUND(SUM(m.s * v.val), 6) AS w
      FROM m JOIN v{k - 1} v ON v.idx = m.j GROUP BY m.i
    ),
    n{k} AS (SELECT sqrt(ROUND(SUM(w * w), 6)) AS nrm FROM w{k}),
    v{k} AS (
      SELECT idx, ROUND(w / (SELECT nrm FROM n{k}), 6) AS val FROM w{k}
    )"""


@query(
    "q_pca_power",
    oracle="WITH " + _GRAM_SQL + """,
    v0 AS (SELECT DISTINCT i AS idx, 0.125 AS val FROM m)"""
    + "".join(_pca_iter_sql(k) for k in (1, 2, 3)) + """,
    wf AS (
      SELECT m.i AS idx, ROUND(SUM(m.s * v.val), 6) AS w
      FROM m JOIN v3 v ON v.idx = m.j GROUP BY m.i
    ),
    lam AS (
      SELECT ROUND(SUM(v.val * w.w), 6) AS eigenvalue
      FROM v3 v JOIN wf w USING (idx)
    )
    SELECT v3.idx AS i, v3.val AS loading,
           (SELECT eigenvalue FROM lam) AS eigenvalue
    FROM v3
    """,
)
def q_pca_power(spark, sf_dir):
    """Leading principal component of the embedding corpus: ONE
    distributed pass reduces the data to the 64×64 Gram matrix
    (per-batch BLAS GEMM, q_embedding_covariance), then power iteration
    runs entirely on that dim-sized table (operators/ml.
    pca_power_iteration) — the PCA-at-scale pattern where iteration
    cost is independent of corpus size.  Every matvec/norm/normalize
    snaps to the 1e-6 grid (the logreg convention), so both engines
    walk identical grid points; v0 = 1/√64 = 0.125 is exact."""
    from access_mopper_spark.operators.ml import pca_power_iteration
    from access_mopper_spark.operators.similarity import embedding_covariance
    emb = _wide(load_table(spark, sf_dir, "embeddings"))
    gut = embedding_covariance(emb, dim=64).select(
        "i", "j", R6(F.col("s")).alias("s"))
    return pca_power_iteration(gut, dim=64, iterations=3)


def _kmpp_round_sql(r: int) -> str:
    return f""",
    d{r}p AS (
      SELECT s.vec_id AS pid, c.cid,
             ROUND(SUM((s.v[g.i] - c.cv[g.i]) * (s.v[g.i] - c.cv[g.i])), 6)
               AS d2
      FROM src s CROSS JOIN c{r - 1} c, g
      GROUP BY s.vec_id, c.cid
    ),
    d{r} AS (SELECT pid, MIN(d2) AS dmin FROM d{r}p GROUP BY pid),
    phi{r} AS (SELECT ROUND(SUM(dmin), 6) AS phi FROM d{r}),
    p{r} AS (
      SELECT d.pid FROM d{r} d, phi{r}
      WHERE (('0x' || substring(md5('kmpp:{r}:' || CAST(d.pid AS VARCHAR)),
                                1, 8))::BIGINT / 4294967296.0) * phi
            < 4.0 * d.dmin
    ),
    c{r} AS (
      SELECT cid, cv FROM c{r - 1}
      UNION ALL
      SELECT s.vec_id AS cid, s.v AS cv FROM src s JOIN p{r} ON p{r}.pid = s.vec_id
    )"""


@query(
    "q_kmeans_parallel_init",
    oracle="""
    WITH src AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    g AS (
      SELECT UNNEST(range(1, (SELECT MAX(len(v)) FROM src) + 1)) AS i
    ),
    c0 AS (
      SELECT vec_id AS cid, v AS cv FROM src ORDER BY vec_id LIMIT 1
    )""" + "".join(_kmpp_round_sql(r) for r in (1, 2)) + """,
    asg AS (
      SELECT s.vec_id AS pid, c.cid,
             ROUND(SUM((s.v[g.i] - c.cv[g.i]) * (s.v[g.i] - c.cv[g.i])), 6)
               AS d2
      FROM src s CROSS JOIN c2 c, g
      GROUP BY s.vec_id, c.cid
    ),
    rn AS (
      SELECT pid, cid,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d2, cid) AS r
      FROM asg
    )
    SELECT cid AS cand_id, COUNT(*) AS n_points
    FROM rn WHERE r = 1 GROUP BY cid
    """,
)
def q_kmeans_parallel_init(spark, sf_dir):
    """k-means|| oversampling (Bahmani et al., VLDB 2012;
    operators/ml.kmeans_parallel_init) over the embedding corpus: two
    rounds sample points with probability ∝ oversample·d²/φ against a
    deterministic md5 coin, the candidate set broadcasts every round,
    and the corpus never shuffles — the distributed fix for k-means++'s
    k sequential passes.  Output is the weighted candidate set
    (integer weights = nearest-point counts, ties to the smaller id)
    that a local k-means++ consumes."""
    from access_mopper_spark.operators.ml import kmeans_parallel_init
    emb = _wide(load_table(spark, sf_dir, "embeddings"))
    return kmeans_parallel_init(emb, rounds=2, oversample=4)


#: category → phrases (1-2 words) for broadcast lexicon tagging; a
#: FlashText-style dictionary pass (the lexicon is tiny and broadcast,
#: the corpus is scanned once, map-only until the per-doc rollup)
_TAG_LEXICON = [
    ("db", "table"), ("db", "row"), ("db", "column"), ("db", "query"),
    ("db", "join"), ("db", "hash join"), ("db", "sort merge"),
    ("perf", "fast"), ("perf", "slow"), ("perf", "batch"),
    ("compute", "spark"), ("compute", "stream"), ("compute", "vector"),
    ("compute", "window"),
]


@query(
    "q_keyword_tagging",
    oracle=r"""
    WITH lex(category, phrase) AS (VALUES
      ('db', 'table'), ('db', 'row'), ('db', 'column'), ('db', 'query'),
      ('db', 'join'), ('db', 'hash join'), ('db', 'sort merge'),
      ('perf', 'fast'), ('perf', 'slow'), ('perf', 'batch'),
      ('compute', 'spark'), ('compute', 'stream'), ('compute', 'vector'),
      ('compute', 'window')
    ),
    toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[ \t\n\r]+',
                                              ' ', 'g'), ' '), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    g AS (
      SELECT UNNEST(range(1, (SELECT MAX(len(w)) FROM toks) + 1)) AS i
    ),
    uni AS (
      SELECT doc_id, w[g.i] AS phrase FROM toks, g WHERE g.i <= len(w)
    ),
    bi AS (
      SELECT doc_id, w[g.i] || ' ' || w[g.i + 1] AS phrase
      FROM toks, g WHERE g.i <= len(w) - 1
    ),
    hits AS (
      SELECT t.doc_id, l.category
      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) t
      JOIN lex l USING (phrase)
    )
    SELECT doc_id, category, COUNT(*) AS n_matches
    FROM hits GROUP BY doc_id, category
    """,
)
def q_keyword_tagging(spark, sf_dir):
    """Broadcast phrase-lexicon tagging (the FlashText/Aho-Corasick
    dictionary pass of a curation pipeline, taxonomy/topic labelling at
    corpus scale): every unigram+bigram position joins the BROADCAST
    category lexicon; output is per-(doc, category) match counts.  The
    corpus never shuffles except the per-doc rollup; the lexicon is
    constant-size by construction.  Overlapping phrases count per
    position (a 'hash join' occurrence also matches 'join' — the
    positional contract, identical in the oracle)."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = _wide(load_table(spark, sf_dir, "documents")) \
        .where(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.split(ws_normalized(portable_lower(F.col("text"))), " ", -1).alias("w"))
    n = F.size("w")
    uni = toks.select("doc_id", F.explode("w").alias("phrase"))
    bi = toks.select("doc_id", F.explode(F.zip_with(
        F.slice(F.col("w"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("w"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))).alias("phrase"))
    lex = spark.createDataFrame(_TAG_LEXICON, "category STRING, phrase STRING")
    hits = uni.unionByName(bi).join(F.broadcast(lex), "phrase")
    return hits.groupBy("doc_id", "category").agg(
        F.count("*").alias("n_matches"))


@query(
    "q_survival_curve",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE ts IS NOT NULL
    ),
    horizon AS (SELECT MAX(us) AS tmax FROM ev),
    t0 AS (
      SELECT user_id, MIN(us) AS view_us FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t1 AS (
      SELECT e.user_id, MIN(e.us) AS buy_us
      FROM ev e JOIN t0 ON t0.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.us >= t0.view_us
      GROUP BY e.user_id
    ),
    spans AS (
      SELECT t0.user_id,
             CASE WHEN t1.buy_us IS NOT NULL
                  THEN (t1.buy_us - t0.view_us) // 86400000000
                  ELSE ((SELECT tmax FROM horizon) - t0.view_us)
                       // 86400000000 END AS day,
             CASE WHEN t1.buy_us IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM t0 LEFT JOIN t1 ON t1.user_id = t0.user_id
    ),
    days AS (SELECT DISTINCT day FROM spans)
    SELECT d.day,
           (SELECT COUNT(*) FROM spans s WHERE s.day >= d.day) AS n_at_risk,
           SUM(CASE WHEN s.ev = 1 THEN 1 ELSE 0 END) AS n_events,
           SUM(CASE WHEN s.ev = 0 THEN 1 ELSE 0 END) AS n_censored
    FROM days d JOIN spans s ON s.day = d.day
    GROUP BY d.day
    """,
)
def q_survival_curve(spark, sf_dir):
    """Kaplan-Meier survival-curve INPUTS for time-from-first-view to
    first-purchase per user, right-censored at the observation horizon:
    per duration day, the risk-set size, event count and censor count —
    the exact (nᵢ, dᵢ) table S(t) = Π(1 − dᵢ/nᵢ) consumes, kept
    INTEGER-ONLY so the hash surface is exact (the product itself is
    one map over this ≤horizon-days table).  Durations are epoch-µs
    integer arithmetic; the risk set is a broadcast range join against
    the distinct-day axis (bounded by the observation window), never a
    global window."""
    ev = load_table(spark, sf_dir, "events") \
        .where(F.col("ts").isNotNull()) \
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
    t0 = ev.where(F.col("event_type") == "view") \
        .groupBy("user_id").agg(F.min("us").alias("view_us"))
    t1 = (ev.where(F.col("event_type") == "purchase")
            .join(t0, "user_id")
            .where(F.col("us") >= F.col("view_us"))
            .groupBy("user_id").agg(F.min("us").alias("buy_us")))
    horizon = ev.agg(F.max("us").alias("tmax"))
    spans = (t0.join(t1, "user_id", "left")
               .crossJoin(F.broadcast(horizon))
               .select("user_id",
                       F.when(F.col("buy_us").isNotNull(),
                              F.expr("(buy_us - view_us) div 86400000000"))
                       .otherwise(F.expr("(tmax - view_us) div 86400000000"))
                       .alias("day"),
                       F.when(F.col("buy_us").isNotNull(), F.lit(1))
                       .otherwise(F.lit(0)).alias("ev")))
    days = spans.select("day").distinct()
    risk = (days.alias("d")
            .join(F.broadcast(spans.alias("s")),
                  F.col("s.day") >= F.col("d.day"))
            .groupBy(F.col("d.day").alias("day"))
            .agg(F.count("*").alias("n_at_risk")))
    per_day = spans.groupBy("day").agg(
        F.sum(F.when(F.col("ev") == 1, 1).otherwise(0)).alias("n_events"),
        F.sum(F.when(F.col("ev") == 0, 1).otherwise(0)).alias("n_censored"))
    return risk.join(per_day, "day").select(
        "day", "n_at_risk", "n_events", "n_censored")


@query(
    "q_token_fertility",
    oracle=r"""
    WITH t AS (
      SELECT lang, length(text) AS n_chars,
             CASE WHEN length(tn) = 0 THEN 0
                  ELSE length(tn) - length(replace(tn, ' ', '')) + 1 END
               AS n_tokens
      FROM (SELECT lang, text,
                   trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ')
                     AS tn
            FROM documents WHERE text IS NOT NULL) x
    )
    SELECT lang, COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars,
           SUM(n_tokens) AS total_tokens,
           CASE WHEN SUM(n_tokens) = 0 THEN NULL
                ELSE (SUM(n_chars) * 100) // SUM(n_tokens) END
             AS chars_per_100_tokens
    FROM t GROUP BY lang
    """,
)
def q_token_fertility(spark, sf_dir):
    """Tokenizer fertility per language — the dataset-card ratio
    (chars per 100 whitespace tokens, integer-floored) that prices
    multilingual corpora in tokens and flags languages where the
    tokenizer over-fragments.  One tiny grouped aggregate; INTEGER-ONLY
    output (the repo convention for driver-hash-proof stats)."""
    from access_mopper_spark.functions.text import token_count
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("text").isNotNull())
    t = docs.select("lang", F.length("text").alias("n_chars"),
                    token_count(F.col("text")).alias("n_tokens"))
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.when(F.sum("n_tokens") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("(sum(n_chars) * 100) div sum(n_tokens)"))
        .alias("chars_per_100_tokens"))


@query(
    "q_pii_luhn",
    oracle="""
    WITH cand AS (
      SELECT c_custkey,
             substring(regexp_replace(c_name, '[^0-9]', '', 'g')
                       || CAST(c_custkey AS VARCHAR) || '000000000000000', 1, 15) AS c
      FROM customer
    ),
    g AS (SELECT UNNEST(range(1, 16)) AS i),
    digs AS (
      SELECT c_custkey,
             CAST(substring(c, 16 - g.i, 1) AS INT) AS d, g.i
      FROM cand, g
    ),
    sums AS (
      SELECT c_custkey,
             SUM(CASE WHEN i % 2 = 0 THEN
                        CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
                      ELSE d END) AS luhn_sum
      FROM digs GROUP BY c_custkey
    )
    SELECT c_custkey, luhn_sum, (luhn_sum % 10 = 0) AS card_valid
    FROM sums
    """,
)
def q_pii_luhn(spark, sf_dir):
    """Luhn-checksum PII validation (functions/pii.luhn_valid): the
    gate that separates true payment-card numbers from arbitrary digit
    runs, so a redactor can scrub validated hits aggressively without
    eating order ids — regex alone cannot make that distinction.  The
    15-digit candidates are derived deterministically from customer
    name digits + key (the corpus carries no card-like runs; the
    q_fuzzy_match fixture convention).  Pure integer Column math inside
    one ``aggregate`` over the digit positions — map-only, no shuffle;
    the oracle replays it with a bounded positions join (integer sums
    are order-free)."""
    from access_mopper_spark.functions.pii import luhn_valid
    cust = load_table(spark, sf_dir, "customer")
    cand = cust.select(
        "c_custkey",
        F.substring(F.concat(F.regexp_replace(F.col("c_name"),
                                              "[^0-9]", ""),
                             F.col("c_custkey").cast("string"),
                             F.lit("000000000000000")), 1, 15).alias("c"))
    n = F.length("c")

    def step(acc, i):
        d = F.substring(F.col("c"), (n - i + 1).cast("int"), 1).cast("int")
        dbl = F.when(i % 2 == 0, d * 2).otherwise(d)
        return acc + F.when(dbl > 9, dbl - 9).otherwise(dbl)

    out = cand.select(
        "c_custkey",
        F.aggregate(F.sequence(F.lit(1), n), F.lit(0), step)
        .alias("luhn_sum"),
        luhn_valid(F.col("c")).alias("card_valid"))
    return out.select("c_custkey", "luhn_sum", "card_valid")


@query(
    "q_stream_join_outer",
    oracle="""
    WITH v AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts,
             event_id AS view_id
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
             event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
      SELECT LEAST((SELECT MAX(view_ts) FROM v),
                   (SELECT MAX(purchase_ts) FROM p))
             - INTERVAL 1 HOUR AS w
    ),
    matched AS (
      SELECT v.user_id, v.view_ts, v.view_id, p.purchase_id
      FROM v JOIN p
        ON p.user_id = v.user_id
       AND p.purchase_ts > v.view_ts
       AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
    ),
    unmatched AS (
      SELECT v.user_id, v.view_ts, v.view_id,
             CAST(NULL AS BIGINT) AS purchase_id
      FROM v
      WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = v.user_id
          AND p.purchase_ts > v.view_ts
          AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE)
        AND v.view_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
)
def q_stream_join_outer(spark, sf_dir):
    """LEFT OUTER watermarked stream-stream interval join — attribution
    that also reports NON-converting views.  The outer semantics are
    inseparable from state eviction: an unmatched view null-emits only
    once the global watermark (min over both inputs of max event time −
    1 h) passes view_ts + 30 min; younger views are still awaiting a
    match when the finite run ends and are withheld.  The oracle
    replays the inner matches as a batch join PLUS exactly that
    eviction cutoff for the null rows — pinning Spark's outer-join
    watermark contract cross-engine."""
    from access_mopper_spark.streaming.resample import (
        events_stream, harness_shuffle, run_to_memory,
        stream_interval_join_outer)
    ev = events_stream(spark, sf_dir)
    views = (ev.where(F.col("event_type") == "view")
               .select(F.col("user_id").alias("__ju"),
                       F.col("ts").alias("view_ts"),
                       F.col("event_id").alias("view_id")))
    purchases = (ev.where(F.col("event_type") == "purchase")
                   .select(F.col("user_id").alias("__ju"),
                           F.col("ts").alias("purchase_ts"),
                           F.col("event_id").alias("purchase_id")))
    joined = stream_interval_join_outer(
        views, purchases, key="__ju", left_ts="view_ts",
        right_ts="purchase_ts", within="30 MINUTE")
    out = joined.select(F.col("l.__ju").alias("user_id"),
                        "view_ts", "view_id", "purchase_id")
    with harness_shuffle(spark):
        run_to_memory(out, "q_stream_join_outer_sink", mode="append")
    return spark.table("q_stream_join_outer_sink")


@query(
    "q_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT doc_id,
             md5(concat_ws(chr(1), COALESCE(text, chr(2)),
                           COALESCE(lang, chr(2)),
                           COALESCE(source, chr(2)),
                           COALESCE(CAST(n_chars AS VARCHAR), chr(2)))) AS fp
      FROM documents WHERE doc_id < 480
    ),
    v2 AS (
      SELECT doc_id,
             md5(concat_ws(chr(1),
                           COALESCE(CASE WHEN doc_id % 37 = 0
                                         THEN text || ' [v2-edit]'
                                         ELSE text END,
                                    chr(2)),
                           COALESCE(lang, chr(2)),
                           COALESCE(source, chr(2)),
                           COALESCE(CAST(n_chars AS VARCHAR), chr(2)))) AS fp
      FROM documents WHERE doc_id >= 20
    )
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.fp <> v2.fp
    """,
)
def q_snapshot_diff(spark, sf_dir):
    """Snapshot diff between two corpus versions — the table-level CDC
    primitive (what changed between yesterday's crawl and today's):
    full outer join on the key, rows classified added / removed /
    changed by a full-payload md5 fingerprint so the payload compare is
    one string per side regardless of column count.  Version 2 is
    derived deterministically (drop ids < 20, add ids ≥ 480, append an
    edit marker to every 37th text — the fixture convention;
    upper() is NOT dialect-portable: Java full-cases ß→SS while
    utf8proc maps ß→ẞ).  One keyed shuffle; at
    100 TB both sides bucket by the key and the join is co-located.
    Unchanged rows never leave the join."""
    docs = load_table(spark, sf_dir, "documents")

    def fp(text_col):
        return F.md5(F.concat_ws(
            "\x01", F.coalesce(text_col, F.lit("\x02")),
            F.coalesce(F.col("lang"), F.lit("\x02")),
            F.coalesce(F.col("source"), F.lit("\x02")),
            F.coalesce(F.col("n_chars").cast("string"), F.lit("\x02"))))

    v1 = docs.where(F.col("doc_id") < 480).select(
        "doc_id", fp(F.col("text")).alias("fp"))
    v2 = docs.where(F.col("doc_id") >= 20).select(
        "doc_id",
        fp(F.when(F.col("doc_id") % 37 == 0,
                  F.concat(F.col("text"), F.lit(" [v2-edit]")))
           .otherwise(F.col("text"))).alias("fp"))
    j = v1.alias("a").join(v2.alias("b"),
                           F.col("a.doc_id") == F.col("b.doc_id"), "full")
    return (j.where(F.col("a.doc_id").isNull() | F.col("b.doc_id").isNull()
                    | (F.col("a.fp") != F.col("b.fp")))
             .select(F.coalesce(F.col("a.doc_id"), F.col("b.doc_id"))
                     .alias("doc_id"),
                     F.when(F.col("a.doc_id").isNull(), F.lit("added"))
                     .when(F.col("b.doc_id").isNull(), F.lit("removed"))
                     .otherwise(F.lit("changed")).alias("change_type")))


@query(
    "q_probe_dup_fraction_micro",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'),
                               ' '), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    g AS (
      SELECT UNNEST(range(1, (SELECT MAX(len(w)) FROM toks) + 1)) AS i
    ),
    sh AS (
      SELECT doc_id, array_to_string(w[g.i : g.i + 4], ' ') AS gram
      FROM toks, g WHERE g.i <= greatest(len(w) - 4, 1)
    ),
    gc AS (SELECT gram, COUNT(*) AS c FROM sh GROUP BY gram)
    SELECT sh.doc_id,
           CAST(FLOOR(CAST(SUM(CASE WHEN gc.c >= 2 THEN 1 ELSE 0 END)
                           AS DOUBLE) / COUNT(*) * 1e6 + 0.5) AS BIGINT)
             AS dup_frac_micro
    FROM sh JOIN gc ON gc.gram = sh.gram
    GROUP BY sh.doc_id
    """,
)
def q_probe_dup_fraction_micro(spark, sf_dir):
    """dup_ngrams stage 4: the dup_fraction DIVISION itself, shipped as
    a ×1e6 BIGINT (identical floor recipe, no float in the hash
    surface).  With stages 1-3 green, this failing would mean the
    engines disagree on the n_dup/n_grams double division or the snap;
    this passing while q_dup_ngrams fails leaves only the raw float
    CELL RENDERING in the driver's hasher as the divergence."""
    from access_mopper_spark.operators.dedup import dup_ngram_fraction
    docs = load_table(spark, sf_dir, "documents") \
        .where(F.col("text").isNotNull())
    out = dup_ngram_fraction(docs, n=5, min_count=2, hot_threshold=50)
    return out.select(
        "doc_id",
        F.floor(F.col("n_dup").cast("double") / F.col("n_grams")
                * F.lit(1e6) + F.lit(0.5)).cast("long")
        .alias("dup_frac_micro"))


@query(
    "q_position_attribution",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             event_id
      FROM events WHERE ts IS NOT NULL
    ),
    conv AS (
      SELECT user_id, MIN(us) AS buy_us FROM ev
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    path AS (
      SELECT e.user_id, e.event_type,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
                                ORDER BY e.us, e.event_id) AS pos,
             COUNT(*) OVER (PARTITION BY e.user_id) AS n
      FROM ev e JOIN conv c ON c.user_id = e.user_id
      WHERE e.us < c.buy_us AND e.event_type <> 'purchase'
    ),
    credited AS (
      SELECT event_type,
             CASE WHEN n = 1 THEN 10000
                  WHEN n = 2 THEN 5000
                  WHEN pos = 1 OR pos = n THEN 4000
                  WHEN pos = 2 THEN 2000 // (n - 2) + 2000 % (n - 2)
                  ELSE 2000 // (n - 2) END AS credit_bp
      FROM path
    )
    SELECT event_type AS channel,
           SUM(credit_bp) AS total_credit_bp,
           COUNT(*) AS n_touches
    FROM credited GROUP BY event_type
    """,
)
def q_position_attribution(spark, sf_dir):
    """U-shaped (position-based) conversion attribution — the third
    classic next to first/last-touch (q_first_touch_attribution,
    q_last_touch): each user's pre-purchase path credits 40% to the
    first touch, 40% to the last, 20% split across the middles.
    Credits are INTEGER basis points with the split remainder pinned to
    the first middle touch, so per-channel sums are exact and
    order-free (every path's credits add to exactly 10000).  One
    user-keyed window shuffle + a channel-sized rollup."""
    ev = load_table(spark, sf_dir, "events") \
        .where(F.col("ts").isNotNull()) \
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"),
                "event_id")
    conv = ev.where(F.col("event_type") == "purchase") \
        .groupBy("user_id").agg(F.min("us").alias("buy_us"))
    path = (ev.join(conv, "user_id")
              .where((F.col("us") < F.col("buy_us"))
                     & (F.col("event_type") != "purchase"))
              .select("user_id", "event_type",
                      F.row_number().over(
                          W.partitionBy("user_id")
                          .orderBy("us", "event_id")).alias("pos"),
                      F.count("*").over(
                          W.partitionBy("user_id")).alias("n")))
    n, pos = F.col("n"), F.col("pos")
    mid = F.expr("2000 div (n - 2)")
    rem = F.expr("2000 % (n - 2)")
    credit = (F.when(n == 1, F.lit(10000))
               .when(n == 2, F.lit(5000))
               .when((pos == 1) | (pos == n), F.lit(4000))
               .when(pos == 2, mid + rem)
               .otherwise(mid))
    return (path.select(F.col("event_type").alias("channel"),
                        credit.alias("credit_bp"))
                .groupBy("channel")
                .agg(F.sum("credit_bp").alias("total_credit_bp"),
                     F.count("*").alias("n_touches")))


@query(
    "q_probe_date_render",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(datediff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                              AS DATE)) AS BIGINT) AS day_num,
           COUNT(*) AS n_events
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
)
def q_probe_date_render(spark, sf_dir):
    """Round-8 rendering probe, now the DATE regression SENTINEL:
    EXACTLY the driver-green q_probe_day_counts aggregation plus a raw
    DATE output cell.  DuckDB DATE lands in pandas as datetime64[ns]
    midnight while Spark DATE collects as datetime.date — the suspected
    second strict-rendering seam next to the (solved) HUGEINT
    divergence.  VERDICT (r8 driver): PASS — rows+schema+hash green on
    the raw DATE cell, so the seam does not exist; the r8
    DATE→TIMESTAMP canonicalization (_apply_spark_date_casts) was
    retired in r9 and every real query ships native DATE.  This probe
    stays in the driver prefix so any future harness change that
    re-opens the seam is caught on a 1-row diagnostic, not a real
    query."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    return (ev.groupBy(
        day.alias("day"),
        F.datediff(day, F.lit("1970-01-01").cast("date"))
        .cast("long").alias("day_num"))
        .agg(F.count("*").alias("n_events")))


# =====================================================================
# round 8: one-pass table profiling (ANALYZE-style statistics)
# =====================================================================


def _profile_col_oracle(c, kind):
    num = {"num": f"CAST(MIN({c}) AS DOUBLE)", "str": "CAST(NULL AS DOUBLE)"}
    nmx = {"num": f"CAST(MAX({c}) AS DOUBLE)", "str": "CAST(NULL AS DOUBLE)"}
    smn = {"num": "CAST(NULL AS VARCHAR)", "str": f"MIN({c})"}
    smx = {"num": "CAST(NULL AS VARCHAR)", "str": f"MAX({c})"}
    return (f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_null, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"{num[kind]} AS min_num, {nmx[kind]} AS max_num, "
            f"{smn[kind]} AS min_str, {smx[kind]} AS max_str "
            f"FROM documents")


_PROFILE_ORACLE = " UNION ALL ".join([
    _profile_col_oracle("doc_id", "num"),
    _profile_col_oracle("text", "str"),
    _profile_col_oracle("lang", "str"),
    _profile_col_oracle("source", "str"),
    _profile_col_oracle("n_chars", "num"),
])


@query("q_table_profile", oracle=_PROFILE_ORACLE)
def q_table_profile(spark, sf_dir):
    """ANALYZE-style one-pass profile of the documents table
    (operators/profile.profile_table): per column the non-NULL/NULL
    split, exact distinct count, typed min/max (numeric vs string
    lanes — no stringified doubles in the hash surface).  ONE scan:
    every statistic is an aggregate expression in a single agg; the
    multi-column exact COUNT(DISTINCT) compiles to one Expand + a
    two-level hash aggregate with map-side partials, and the tidy
    unpivot is a JVM-side ``stack``.  At petabyte scale the same
    operator runs with approx=True (HyperLogLog++ distinct, no
    Expand) — the mode a 100 TB pre-curation ANALYZE would use; the
    exact mode is the oracle-checked one because HLL estimates are
    engine-specific.  Reference parity: mopdb's ad-hoc per-mapping
    row counts + variable domain scans before CMORisation planning."""
    from access_mopper_spark.operators.profile import profile_table

    docs = load_table(spark, sf_dir, "documents")
    out = profile_table(docs)
    return out.withColumnRenamed("column", "col_name")


@query(
    "q_skew_profile",
    oracle="""
    WITH pairs AS (
      SELECT 'user_id' AS col_name,
             COALESCE(CAST(user_id AS VARCHAR), '<NULL>') AS key_value
      FROM events
      UNION ALL
      SELECT 'event_type', COALESCE(event_type, '<NULL>') FROM events
      UNION ALL
      SELECT 'props', COALESCE(props, '<NULL>') FROM events
    ),
    c AS (SELECT col_name, key_value, COUNT(*) AS cnt
          FROM pairs GROUP BY 1, 2),
    t AS (SELECT col_name, SUM(cnt) AS n FROM c GROUP BY 1),
    r AS (SELECT c.col_name, c.key_value, c.cnt, t.n,
                 row_number() OVER (PARTITION BY c.col_name
                                    ORDER BY c.cnt DESC, c.key_value)
                   AS rank
          FROM c JOIN t USING (col_name))
    SELECT col_name, key_value, cnt,
           CAST(FLOOR(cnt * 10000 / n) AS BIGINT) AS share_bp, rank
    FROM r WHERE rank <= 15
    """,
)
def q_skew_profile(spark, sf_dir):
    """Heavy-key diagnostic (operators/skew.skew_profile): top-15
    heaviest keys of three candidate join/agg columns of events —
    including NULL-as-a-key, the classic silent skew source — with
    integer basis-point shares.  The report a planner reads before
    choosing broadcast vs salting (skew.salted_agg /
    explode_salt_join) vs AQE skew-join.  One scan, one shuffle for
    ALL columns (map-side exploded (col, value) pairs + combined
    count), per-column top-n via the two-phase partial_topk — no full
    sort, no per-column re-scan."""
    from access_mopper_spark.operators.skew import skew_profile

    ev = load_table(spark, sf_dir, "events")
    return skew_profile(ev, ["user_id", "event_type", "props"], top_n=15)


@query(
    "q_lsh_calibration",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, text,
             string_split(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'),
                               ' '), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    sh AS (
      SELECT doc_id, array_to_string(w[g.i : g.i + 2], ' ') AS s
      FROM toks, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(w)), 1)
                                          FROM toks) + 1)) AS i) g
      WHERE g.i <= greatest(len(w) - 2, 1)
    ),
    ds AS (SELECT DISTINCT doc_id, s FROM sh),
    sets AS (SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY doc_id),
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
    bands AS (
      SELECT s.doc_id,
             md5(m0 || '|' || m1) AS b0, md5(m2 || '|' || m3) AS b1,
             md5(m4 || '|' || m5) AS b2, md5(t.text) AS h
      FROM sig s JOIN toks t USING (doc_id) JOIN sets st USING (doc_id)
      WHERE st.n_sh > 0
    ),
    rn AS (
      SELECT *, substring(b0, 1, 2) AS bk,
             row_number() OVER (PARTITION BY substring(b0, 1, 2)
                                ORDER BY b0, h, doc_id) AS r
      FROM bands
    ),
    prs AS (
      SELECT a.doc_id AS ia, c.doc_id AS ic,
             (CASE WHEN a.b0 = c.b0 THEN 1 ELSE 0 END
              + CASE WHEN a.b1 = c.b1 THEN 1 ELSE 0 END
              + CASE WHEN a.b2 = c.b2 THEN 1 ELSE 0 END) AS nc
      FROM rn a JOIN rn c ON a.bk = c.bk AND c.r = a.r + 1
    ),
    ix AS (
      SELECT p.ia, p.ic, COUNT(*) AS i
      FROM prs p JOIN ds x ON x.doc_id = p.ia
                 JOIN ds y ON y.doc_id = p.ic AND y.s = x.s
      GROUP BY p.ia, p.ic
    ),
    jac AS (
      SELECT p.nc,
             (10 * COALESCE(ix.i, 0))
               // (sa.n_sh + sc.n_sh - COALESCE(ix.i, 0)) AS s_decile
      FROM prs p
      LEFT JOIN ix ON ix.ia = p.ia AND ix.ic = p.ic
      JOIN sets sa ON sa.doc_id = p.ia
      JOIN sets sc ON sc.doc_id = p.ic
    )
    SELECT s_decile, COUNT(*) AS n_pairs,
           SUM(CASE WHEN nc >= 1 THEN 1 ELSE 0 END) AS n_candidates,
           SUM(nc) AS sum_collide_bands,
           CAST(CASE s_decile WHEN 0 THEN 7481 WHEN 1 THEN 65992 WHEN 2 THEN 176025 WHEN 3 THEN 324319 WHEN 4 THEN 492785 WHEN 5 THEN 660661 WHEN 6 THEN 807400 WHEN 7 THEN 916259 WHEN 8 THEN 978630 WHEN 9 THEN 999073 WHEN 10 THEN 1000000 END AS BIGINT) AS theory_ppm
    FROM jac GROUP BY s_decile
    """,
)
def q_lsh_calibration(spark, sf_dir):
    """MinHash-LSH parameter calibration (operators/dedup.
    lsh_calibration): measured band-collision rates vs exact word-3
    Jaccard per similarity decile, against the closed-form S-curve
    p = 1-(1-s^r)^b for the deployed b=3 x r=2 scheme — the report
    that picks (bands, rows) BEFORE a 100 TB dedup commits to a
    configuration.  The quadratic all-pairs comparison is replaced by
    a deterministic linear neighbour sample keyed on the first band
    (near-dup families sort adjacent and populate the high deciles;
    band-prefix strangers give the low-similarity mass).  Theory ppm
    values are driver-evaluated literals on BOTH engines — no
    cross-engine pow in the hash surface."""
    from access_mopper_spark.operators.dedup import lsh_calibration

    docs = load_table(spark, sf_dir, "documents")
    return lsh_calibration(docs)


@query(
    "q_file_plan_plev",
    oracle=r"""
    WITH vars AS (
      SELECT p_partkey AS var_id,
             CAST((1 + p_partkey % 97) * 100000 AS DOUBLE) AS insize,
             1 + p_partkey % 70 AS levnum,
             CASE p_partkey % 3
               WHEN 0 THEN 'plevinterp(var, plev, '
                           || CAST(3 + p_partkey % 24 AS VARCHAR) || ')'
               WHEN 1 THEN 'mask(var)'
               ELSE '' END AS calculation,
             list_extract(['10min','30min','1hr','3hr','6hr','day',
                           '10day','mon','yr','dec','fx'],
                          CAST(p_partkey % 11 AS INTEGER) + 1) AS frequency,
             30 + (p_partkey * 7) % 3600 AS span_days
      FROM part WHERE p_partkey <= 300
    ),
    adj AS (
      SELECT *, CASE WHEN calculation LIKE '%plevinterp%'
                     THEN insize / levnum * TRY_CAST(
                            regexp_replace(string_split(calculation, ',')[-1],
                                           '[)\s]', '', 'g') AS DOUBLE)
                     ELSE insize END AS grid_size
      FROM vars
    ),
    sized AS (
      SELECT var_id, frequency, span_days, grid_size,
             CAST(FLOOR(grid_size) AS DOUBLE) / 1048576.0 *
             CASE frequency WHEN '10min' THEN 144.0 WHEN '30min' THEN 48.0
               WHEN '1hr' THEN 24.0 WHEN '3hr' THEN 8.0 WHEN '6hr' THEN 4.0
               WHEN 'day' THEN 1.0 WHEN '10day' THEN 0.1
               WHEN 'mon' THEN 1.0/30.0 WHEN 'yr' THEN 1.0/365.0
               WHEN 'dec' THEN 1.0/3652.0 WHEN 'fx' THEN 1.0/5000.0 END
             AS day1
      FROM adj
    )
    SELECT var_id, frequency, ROUND(grid_size, 6) AS grid_size,
           CASE WHEN day1 * span_days <= 100.0 * 1.1
                  THEN 'days=' || CAST(span_days AS VARCHAR)
                WHEN day1 * 36000.0 <= 100.0 * 1.1 THEN 'years=100'
                WHEN day1 * 3600.0 <= 100.0 * 1.1 THEN 'years=10'
                WHEN day1 * 360.0 <= 100.0 * 1.1 THEN 'years=1'
                WHEN day1 * 30.0 <= 100.0 * 1.1 THEN 'months=1'
                WHEN day1 * 7.0 <= 100.0 * 1.1 THEN 'days=7'
                WHEN day1 * 1.0 <= 100.0 * 1.1 THEN 'days=1'
                WHEN day1 * 0.5 <= 100.0 * 1.1 THEN 'days=0.5'
                ELSE 'days=0.25' END AS interval,
           ROUND(CASE WHEN day1 * span_days <= 100.0 * 1.1
                        THEN day1 * span_days
                      WHEN day1 * 36000.0 <= 100.0 * 1.1 THEN day1 * 36000.0
                      WHEN day1 * 3600.0 <= 100.0 * 1.1 THEN day1 * 3600.0
                      WHEN day1 * 360.0 <= 100.0 * 1.1 THEN day1 * 360.0
                      WHEN day1 * 30.0 <= 100.0 * 1.1 THEN day1 * 30.0
                      WHEN day1 * 7.0 <= 100.0 * 1.1 THEN day1 * 7.0
                      WHEN day1 * 1.0 <= 100.0 * 1.1 THEN day1 * 1.0
                      WHEN day1 * 0.5 <= 100.0 * 1.1 THEN day1 * 0.5
                      ELSE day1 * 0.25 END, 6) AS interval_size_mb
    FROM sized
    """,
)
def q_file_plan_plev(spark, sf_dir):
    """Calculation-aware output-size planning (reference adjust_size +
    compute_fsize, setup_utils.py:405-482): a plevinterp(var, plev, N)
    calculation rescales the per-step byte estimate by N/levnum BEFORE
    the file-interval choice, then the interval ladder (whole-span file
    if it fits max_size*1.1, else years=100 ... days=0.25 longest-first,
    reference fall-through to days=0.25) picks the sink partitioning.
    Pure Column math, map-only at any scale — at 100 TB this is the
    policy that stops interpolated variables from mis-sizing their
    output files."""
    from access_mopper_spark.plans.planner import (adjust_plev_size,
                                                   choose_file_interval)
    freqs = F.array(*[F.lit(f) for f in
                      ["10min", "30min", "1hr", "3hr", "6hr", "day",
                       "10day", "mon", "yr", "dec", "fx"]])
    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    plev_n = (F.lit(3) + k % 24).cast("string")
    calc = (F.when(k % 3 == 0,
                   F.concat(F.lit("plevinterp(var, plev, "), plev_n, F.lit(")")))
             .when(k % 3 == 1, F.lit("mask(var)"))
             .otherwise(F.lit("")))
    vars_df = part.where(k <= 300).select(
        k.alias("var_id"),
        ((F.lit(1) + k % 97) * F.lit(100000)).cast("double").alias("insize"),
        (F.lit(1) + k % 70).alias("levnum"),
        calc.alias("calculation"),
        F.element_at(freqs, (k % 11).cast("int") + 1).alias("frequency"),
        (F.lit(30) + (k * 7) % 3600).alias("span_days"))
    adj = vars_df.withColumn(
        "grid_size", adjust_plev_size("insize", "calculation", "levnum"))
    out = choose_file_interval(adj, "grid_size", "frequency", "span_days",
                               max_size=100.0)
    return out.select("var_id", "frequency",
                      R6(F.col("grid_size")).alias("grid_size"),
                      "interval",
                      R6(F.col("interval_size_mb")).alias("interval_size_mb"))


# ---------------------------------------------------------------------
# Web-curation stage (operators/web.py): URL canonicalization, registered
# domains, deterministic per-host caps.  The URL fixture is derived from
# doc_id with identical expressions on both engines (documents has no url
# column, same derivation pattern as the customer digit fixtures).
# ---------------------------------------------------------------------

_URL_HOSTS = ["WWW.Example.COM", "news.site.co.uk", "CDN.Assets.org",
              "blog.example.com", "shop.example.co.uk", "Api.Service.IO",
              "www.archive.net"]

_URL_FIXTURE_SQL = (
    "CASE doc_id % 2 WHEN 0 THEN 'https' ELSE 'HTTP' END || '://' "
    "|| list_extract([" + ",".join(f"'{h}'" for h in _URL_HOSTS) + "], "
    "CAST(doc_id % 7 AS INTEGER) + 1) "
    "|| CASE doc_id % 5 WHEN 0 THEN ':443' WHEN 1 THEN ':80' "
    "WHEN 2 THEN ':8080' ELSE '' END "
    "|| CASE doc_id % 4 WHEN 0 THEN '/articles/' || CAST(doc_id AS VARCHAR) || '/' "
    "WHEN 1 THEN '' WHEN 2 THEN '/index.html' ELSE '/a/b/c/' END "
    "|| CASE doc_id % 3 WHEN 0 THEN '?utm_source=x&b=2&a=1' "
    "WHEN 1 THEN '?id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=y&fbclid=z' "
    "ELSE '' END "
    "|| CASE doc_id % 2 WHEN 0 THEN '#frag' ELSE '' END")

_URL_TRACK_FILTER = (
    "p -> p <> '' AND NOT starts_with(p, 'utm_')"
    + "".join(f" AND p <> '{t}' AND NOT starts_with(p, '{t}=')"
              for t in ("fbclid", "gclid", "msclkid", "mc_eid", "igshid")))

_URL_MULTI_TLD_SQL = ("('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',"
                      "'org.au','co.jp','co.nz','co.in','com.br','com.cn',"
                      "'com.mx','co.za')")

# authority with userinfo stripped — mirrors web._url_hostport (the r8
# ADVICE fix); the oracle must replay it or any fixture URL with
# user:pass@ or a bracketed IPv6 host silently diverges cross-engine
_URL_HP_SQL = ("regexp_replace(regexp_extract(url, "
               "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^.*@', '')")

_URL_CANON_CTES = f"""
    u AS (SELECT doc_id, {_URL_FIXTURE_SQL} AS url FROM documents),
    parsed AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        CASE WHEN starts_with({_URL_HP_SQL}, '[')
             THEN lower(regexp_extract({_URL_HP_SQL}, '^(\\[[^\\]]*\\])', 1))
             ELSE lower(regexp_extract({_URL_HP_SQL}, '^([^:]*)', 1))
        END AS host,
        regexp_extract({_URL_HP_SQL}, ':([0-9]+)$', 1) AS port,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
        regexp_extract(url, '\\?([^#]*)', 1) AS rawq
      FROM u
    ),
    pieces AS (
      SELECT *,
        CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS p2,
        CASE WHEN rawq = '' THEN ''
             ELSE array_to_string(list_sort(list_filter(
                    string_split(rawq, '&'), {_URL_TRACK_FILTER})), '&')
        END AS q2,
        string_split(host, '.') AS labels
      FROM parsed
    ),
    canon AS (
      SELECT doc_id, url,
        scheme || '://' || host
        || CASE WHEN port <> '' AND NOT (scheme = 'https' AND port = '443')
                              AND NOT (scheme = 'http' AND port = '80')
                THEN ':' || port ELSE '' END
        || CASE WHEN p2 LIKE '_%/' THEN substring(p2, 1, length(p2) - 1) ELSE p2 END
        || CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canonical_url,
        CASE WHEN len(labels) >= 3
              AND array_to_string(list_slice(labels,
                    greatest(len(labels) - 1, 1), len(labels)), '.')
                  IN {_URL_MULTI_TLD_SQL}
             THEN array_to_string(list_slice(labels,
                    greatest(len(labels) - 2, 1), len(labels)), '.')
             ELSE array_to_string(list_slice(labels,
                    greatest(len(labels) - 1, 1), len(labels)), '.')
        END AS domain
      FROM pieces
    )"""


def _url_expr():
    k = F.col("doc_id")
    hosts = F.array(*[F.lit(h) for h in _URL_HOSTS])
    return F.concat(
        F.when(k % 2 == 0, F.lit("https")).otherwise(F.lit("HTTP")),
        F.lit("://"),
        F.element_at(hosts, (k % 7).cast("int") + 1),
        F.when(k % 5 == 0, F.lit(":443")).when(k % 5 == 1, F.lit(":80"))
         .when(k % 5 == 2, F.lit(":8080")).otherwise(F.lit("")),
        F.when(k % 4 == 0, F.concat(F.lit("/articles/"), k.cast("string"), F.lit("/")))
         .when(k % 4 == 1, F.lit("")).when(k % 4 == 2, F.lit("/index.html"))
         .otherwise(F.lit("/a/b/c/")),
        F.when(k % 3 == 0, F.lit("?utm_source=x&b=2&a=1"))
         .when(k % 3 == 1, F.concat(F.lit("?id="), k.cast("string"),
                                    F.lit("&utm_campaign=y&fbclid=z")))
         .otherwise(F.lit("")),
        F.when(k % 2 == 0, F.lit("#frag")).otherwise(F.lit("")))


def _url_fixture(docs):
    return docs.select("doc_id", _url_expr().alias("url"))


@query(
    "q_url_canonical",
    oracle=f"""
    WITH {_URL_CANON_CTES}
    SELECT doc_id, canonical_url, domain FROM canon
    """,
)
def q_url_canonical(spark, sf_dir):
    """URL canonicalization + registered-domain extraction
    (operators/web.py): lower scheme/host, strip default ports and
    fragments, drop tracking params, sort survivors, drop non-root
    trailing slash; domain = last 2 labels (3 over multi-label TLDs).
    The key-normalization stage every exact-dup and host-policy pass
    depends on.  Pure Column math, map-only at any scale."""
    from access_mopper_spark.operators.web import (canonicalize_url,
                                                   registered_domain,
                                                   url_host)
    docs = load_table(spark, sf_dir, "documents")
    u = _url_fixture(docs)
    return u.select("doc_id",
                    canonicalize_url(F.col("url")).alias("canonical_url"),
                    registered_domain(url_host(F.col("url"))).alias("domain"))


@query(
    "q_host_cap",
    oracle=f"""
    WITH {_URL_CANON_CTES}
    SELECT doc_id, domain, canonical_url FROM (
      SELECT doc_id, domain, canonical_url,
             row_number() OVER (PARTITION BY domain
                                ORDER BY md5(canonical_url), doc_id) AS rk
      FROM canon
    ) WHERE rk <= 20
    """,
)
def q_host_cap(spark, sf_dir):
    """Deterministic per-domain document cap (operators/web.per_host_cap):
    keep <= 20 docs per registered domain under the md5(canonical_url)
    pseudo-random order, id tiebreak.  Rank-pushed window
    (WindowGroupLimit): map tasks forward at most cap rows per domain,
    so one megasite never sorts its full row set in a single task."""
    from access_mopper_spark.operators.web import per_host_cap
    docs = load_table(spark, sf_dir, "documents")
    u = _url_fixture(docs)
    out = per_host_cap(u, "url", cap=20, id_col="doc_id")
    return out.select("doc_id", "domain", "canonical_url")


@query(
    "q_html_strip",
    oracle="""
    WITH h AS (
      SELECT doc_id,
        '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        || '</title><style>p { color: red }</style></head><body><h1 class="t">Doc '
        || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
        || ' &amp; tail</p><script type="text/javascript">var x = 1; if (x < 2) { x = 3; }</script></body></html>'
        AS html
      FROM documents
    ),
    tagless AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(html,
          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
          '<[^>]+>', ' ', 'g') AS t1
      FROM h
    ),
    clean AS (
      SELECT doc_id,
        trim(regexp_replace(
          replace(replace(replace(replace(replace(replace(t1,
            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
            '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
          '[ \t\n\r]+', ' ', 'g'), ' ') AS clean
      FROM tagless
    )
    SELECT doc_id, clean, length(clean) AS clean_chars FROM clean
    """,
)
def q_html_strip(spark, sf_dir):
    """HTML boilerplate strip (functions/text.strip_html): drop
    script/style elements with contents, drop tags, unescape core
    entities, collapse whitespace — the first stage of web-crawl
    curation.  No regex backreferences (RE2-portable), lazy spans with
    inline (?s).  Pure Column math over _wide partitions."""
    from access_mopper_spark.functions.text import strip_html
    docs = _wide(load_table(spark, sf_dir, "documents"))
    k = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "), k,
        F.lit('</title><style>p { color: red }</style></head>'
              '<body><h1 class="t">Doc '), k,
        F.lit("</h1><p>"), F.col("text"),
        F.lit(' &amp; tail</p><script type="text/javascript">'
              "var x = 1; if (x < 2) { x = 3; }</script></body></html>"))
    return (docs.withColumn("clean", strip_html(html))
            .select("doc_id", "clean", F.length("clean").alias("clean_chars")))


@query(
    "q_line_boilerplate",
    oracle="""
    WITH d AS (
      SELECT doc_id,
        'COOKIE NOTICE' || chr(10) || text || chr(10)
        || CASE doc_id % 4 WHEN 0 THEN 'Subscribe to our newsletter'
           ELSE 'Footer note ' || CAST(doc_id AS VARCHAR) END
        || chr(10) || 'Copyright 2024 Example Corp' AS txt
      FROM documents
    ),
    sp AS (SELECT doc_id, regexp_split_to_array(txt, '\\r?\\n') AS ls FROM d),
    lines AS (
      SELECT doc_id, g.i AS pos, list_extract(ls, g.i) AS line
      FROM sp, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(ls)), 1)
                                        FROM sp) + 1)) AS i) g
      WHERE g.i <= len(ls)
    ),
    boiler AS (
      SELECT line FROM (SELECT DISTINCT line, doc_id FROM lines)
      GROUP BY line HAVING COUNT(*) >= 50
    ),
    kept AS (SELECT l.* FROM lines l ANTI JOIN boiler b ON l.line = b.line),
    tot AS (SELECT doc_id, COUNT(*) AS n_total FROM lines GROUP BY doc_id)
    SELECT k.doc_id, string_agg(k.line, chr(10) ORDER BY k.pos) AS clean,
           COUNT(*) AS n_kept, MIN(t.n_total) - COUNT(*) AS n_dropped
    FROM kept k JOIN tot t ON t.doc_id = k.doc_id
    GROUP BY k.doc_id
    """,
)
def q_line_boilerplate(spark, sf_dir):
    """Cross-document boilerplate-line removal (operators/lines.
    remove_boilerplate_lines — the CCNet/RefinedWeb line-dedup pass):
    any line appearing in >= 50 distinct documents (cookie banners,
    footers, nav) is dropped from every document; survivors re-join in
    order.  Hot lines collapse map-side in the distinct/count partial
    aggregates, so a banner on a billion pages reaches the reducer once
    per task."""
    from access_mopper_spark.operators.lines import remove_boilerplate_lines
    docs = _wide(load_table(spark, sf_dir, "documents"))
    k = F.col("doc_id")
    txt = F.concat(
        F.lit("COOKIE NOTICE\n"), F.col("text"), F.lit("\n"),
        F.when(k % 4 == 0, F.lit("Subscribe to our newsletter"))
         .otherwise(F.concat(F.lit("Footer note "), k.cast("string"))),
        F.lit("\nCopyright 2024 Example Corp"))
    fix = docs.select("doc_id", txt.alias("txt"))
    return remove_boilerplate_lines(fix, "doc_id", "txt", min_docs=50)


@query(
    "q_c4_line_filter",
    oracle="""
    WITH d AS (
      SELECT doc_id,
        'This is a good sentence number ' || CAST(doc_id AS VARCHAR) || '.'
        || chr(10)
        || CASE doc_id % 3 WHEN 0 THEN 'short line'
             WHEN 1 THEN 'Another fine sentence with many words here.'
             ELSE 'no terminal punctuation in this line' END
        || chr(10)
        || CASE doc_id % 7 WHEN 0 THEN 'Lorem Ipsum dolor sit amet placeholder.'
             ELSE 'A third proper sentence appears right here!' END
        || chr(10)
        || CASE doc_id % 5 WHEN 0 THEN 'function() { return 1; }'
             ELSE 'Final words make a valid closing statement.' END AS txt
      FROM documents
    ),
    f AS (
      SELECT doc_id, txt,
        list_filter(regexp_split_to_array(txt, '\\r?\\n'), ln ->
          (ends_with(trim(ln, ' '), '.') OR ends_with(trim(ln, ' '), '!')
           OR ends_with(trim(ln, ' '), '?') OR ends_with(trim(ln, ' '), '"'))
          AND (CASE WHEN length(regexp_replace(trim(ln, ' '),
                                               '[ \t\r]+', ' ', 'g')) = 0
                    THEN 0
                    ELSE length(regexp_replace(trim(ln, ' '),
                                               '[ \t\r]+', ' ', 'g'))
                         - length(replace(regexp_replace(trim(ln, ' '),
                                          '[ \t\r]+', ' ', 'g'), ' ', ''))
                         + 1 END) >= 5) AS kept
      FROM d
    )
    SELECT doc_id, array_to_string(kept, chr(10)) AS clean,
           len(kept) AS n_kept
    FROM f
    WHERE len(kept) >= 3 AND NOT contains(lower(txt), 'lorem ipsum')
      AND NOT contains(txt, '{') AND NOT contains(txt, '}')
    """,
)
def q_c4_line_filter(spark, sf_dir):
    """C4-style line cleaning (operators/lines.c4_line_filter, Raffel
    et al. 2020 §2.2): keep lines ending in terminal punctuation with
    >= 5 words; drop documents with < 3 surviving lines or containing
    curly braces / 'lorem ipsum'.  Map-only — the per-line predicate
    runs in a higher-order filter over the split array, no explode, no
    shuffle, one corpus scan."""
    from access_mopper_spark.operators.lines import c4_line_filter
    docs = _wide(load_table(spark, sf_dir, "documents"))
    k = F.col("doc_id")
    txt = F.concat(
        F.lit("This is a good sentence number "), k.cast("string"), F.lit(".\n"),
        F.when(k % 3 == 0, F.lit("short line"))
         .when(k % 3 == 1, F.lit("Another fine sentence with many words here."))
         .otherwise(F.lit("no terminal punctuation in this line")),
        F.lit("\n"),
        F.when(k % 7 == 0, F.lit("Lorem Ipsum dolor sit amet placeholder."))
         .otherwise(F.lit("A third proper sentence appears right here!")),
        F.lit("\n"),
        F.when(k % 5 == 0, F.lit("function() { return 1; }"))
         .otherwise(F.lit("Final words make a valid closing statement.")))
    fix = docs.select("doc_id", txt.alias("txt"))
    return c4_line_filter(fix, "doc_id", "txt", min_words=5, min_lines=3)


@query(
    "q_jsonl_roundtrip",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           MIN(md5(CAST(doc_id AS VARCHAR) || ':' || text)) AS fp_min,
           MAX(md5(CAST(doc_id AS VARCHAR) || ':' || text)) AS fp_max
    FROM documents WHERE text IS NOT NULL
    GROUP BY source
    """,
)
def q_jsonl_roundtrip(spark, sf_dir):
    """JSONL sink + source roundtrip — the standard interchange format
    for LLM corpora (one JSON object per line, splittable, append-able).
    The corpus writes to newline-delimited JSON and reads back with an
    EXPLICIT schema (no inference scan — at 100 TB schema inference is a
    full extra pass); the oracle aggregates the ORIGINAL parquet, so the
    match proves the roundtrip byte-lossless (per-source counts, char
    sums, and min/max row fingerprints over id:text).  Scratch dir is
    keyed by source stat + pid (process-private, replays fresh on
    regenerated testdata)."""
    import hashlib
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    tag = hashlib.md5(f"{sf_dir}:{st.st_size}:{st.st_mtime_ns}".encode()) \
                 .hexdigest()[:12]
    path = _pid_scratch(f"access_mopper_spark_jsonl_{tag}")
    docs.coalesce(8).write.mode("overwrite").json(path)
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(path)
    fp = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                        F.col("text")))
    return (back.where(F.col("text").isNotNull())
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length("text")).cast("long").alias("total_chars"),
                 F.min(fp).alias("fp_min"),
                 F.max(fp).alias("fp_max")))


@query(
    "q_hard_negatives_gemm",
    oracle=r"""
    WITH c AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
      WHERE vec_id % 25 <> 0 AND label IS NOT NULL
        AND list_dot_product(CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[])) > 0
    ),
    a AS (
      SELECT vec_id AS anchor_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
      WHERE vec_id % 25 = 0 AND vec_id < 12500 AND label IS NOT NULL
        AND list_dot_product(CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[])) > 0
    ),
    scored AS (
      SELECT a.anchor_id, c.vec_id, c.label,
             ROUND(list_dot_product(c.e, a.e)
                   / (sqrt(list_dot_product(c.e, c.e))
                      * sqrt(list_dot_product(a.e, a.e))), 6) AS sim
      FROM c JOIN a ON c.label <> a.label
    )
    SELECT anchor_id, vec_id, label, sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                   ORDER BY sim DESC, vec_id) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
)
def q_hard_negatives_gemm(spark, sf_dir):
    """Hard-negative mining at ANNOTATION-BATCH scale (operators/ml.
    hard_negatives — the GEMM path; q_hard_negatives is the small-batch
    broadcast-join variant): every 25th vector anchors a search for its
    cosine top-5 DIFFERENT-label corpus rows — the near-miss negatives
    that carry gradient signal.  One corpus scan, Arrow-batch GEMM
    against the broadcast anchors with same-label masking BEFORE the
    batch-local top-k; salted two-phase merge — the full pair table
    never materializes (the per-pair fold-dot join is the 246 s
    q_knn_classify pathology at this anchor count)."""
    from access_mopper_spark.operators.ml import hard_negatives
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") % 25 != 0)
    # anchors are a BOUNDED annotation batch by contract — the fixture
    # caps them (vec_id < 12500: all of sf0.01, ~500 at x100) instead of
    # growing linearly with the corpus, which would contradict the
    # operator's contract and quadratic-ize the sweep
    anchors = emb.where((F.col("vec_id") % 25 == 0)
                        & (F.col("vec_id") < 12500)) \
        .select(F.col("vec_id").alias("anchor_id"), "embedding", "label")
    return hard_negatives(corpus, anchors, k=5)


from access_mopper_spark.functions.text import MOJIBAKE_MARKERS as _MOJI
from access_mopper_spark.functions.text import SCRIPT_RANGES as _SCRIPTS

_MOJI_SUM_SQL = " + ".join(
    f"CAST((length(t) - length(replace(t, '{m}', ''))) / {len(m)} AS BIGINT)"
    for m in _MOJI)


@query(
    "q_mojibake_flags",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             text || CASE doc_id % 5
               WHEN 0 THEN ' Ã©tÃ© â€œquotedâ€ here'
               WHEN 1 THEN ' perfectly clean suffix text' ELSE '' END AS t
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, {_MOJI_SUM_SQL} AS moji_score,
           ({_MOJI_SUM_SQL}) > 0 AS is_mojibake
    FROM d
    """,
)
def q_mojibake_flags(spark, sf_dir):
    """Mojibake (double-encoded UTF-8) detection (functions/text.
    mojibake_score, the ftfy-heuristic signal): literal marker counting
    — 'Ã'+letter, 'â€' punctuation leads, replacement chars, Cyrillic
    lead pairs — via length-difference arithmetic, so the identical
    expression runs on any engine.  Any positive score on a crawl doc
    routes it to re-decode instead of training.  Map-only, one scan."""
    from access_mopper_spark.functions.text import mojibake_score
    docs = _wide(load_table(spark, sf_dir, "documents"))
    k = F.col("doc_id")
    t = F.concat(F.col("text"),
                 F.when(k % 5 == 0, F.lit(" Ã©tÃ© â€œquotedâ€ here"))
                  .when(k % 5 == 1, F.lit(" perfectly clean suffix text"))
                  .otherwise(F.lit("")))
    score = mojibake_score(t)
    return (docs.where(F.col("text").isNotNull())
            .select("doc_id", score.alias("moji_score"),
                    (score > 0).alias("is_mojibake")))


@query(
    "q_domain_scorecard",
    oracle=f"""
    WITH {_URL_CANON_CTES},
    scored AS (
      SELECT c.domain, d.text
      FROM canon c JOIN documents d USING (doc_id)
      WHERE d.text IS NOT NULL
    )
    SELECT domain, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN length(text) < 100 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_short
    FROM scored GROUP BY domain
    """,
)
def q_domain_scorecard(spark, sf_dir):
    """Per-registered-domain quality scorecard — the aggregation a
    crawl pipeline feeds into host blocklists and per-domain sampling
    rates (the web stage's decision output): document counts, total
    text volume, short-doc counts keyed by operators/web.
    registered_domain.  Domain derivation is map-side Column math on
    the same scan; ONE shuffle (the groupBy), partial-aggregated."""
    from access_mopper_spark.operators.web import (registered_domain,
                                                   url_host)
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    # the url (and so the domain) is row-local — derived inline on the
    # same scan, no self-join
    return (docs.where(t.isNotNull())
            .select("doc_id", "text",
                    registered_domain(url_host(_url_expr())).alias("domain"))
            .groupBy("domain")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length(t)).cast("long").alias("total_chars"),
                 F.sum(F.when(F.length(t) < 100, 1).otherwise(0))
                  .cast("long").alias("n_short")))

_SCRIPT_COUNT_SQL = ",\n           ".join(
    f"length(text) - length(regexp_replace(text, '[{r}]', '', 'g')) AS {s}"
    for s, r in _SCRIPTS.items())
_SCRIPT_DOM_SQL = ("CASE "
                   + " ".join(f"WHEN m > 0 AND {s} = m THEN '{s}'"
                              for s in _SCRIPTS)
                   + " ELSE 'none' END")


@query(
    "q_script_profile",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, length(text) AS n_chars,
           {_SCRIPT_COUNT_SQL}
      FROM documents WHERE text IS NOT NULL
    ),
    m AS (SELECT *, greatest({", ".join(_SCRIPTS)}) AS m FROM c)
    SELECT doc_id, n_chars, {", ".join(_SCRIPTS)},
           {_SCRIPT_DOM_SQL} AS dominant
    FROM m
    """,
)
def q_script_profile(spark, sf_dir):
    """Unicode script profiling (functions/text.script_count /
    dominant_script): per-document codepoint counts for latin /
    cyrillic / greek / arabic / cjk / hangul BMP ranges plus the
    dominant script — the multilingual routing signal ahead of
    language-ID (scripts are cheap and unambiguous; langid models are
    per-script).  Counting is remove-and-length-diff arithmetic, so the
    same class runs identically under Java regex and RE2; BMP-only by
    design (astral chars fall to 'other' on both engines).  Map-only,
    one scan."""
    from access_mopper_spark.functions.text import (dominant_script,
                                                    script_count)
    docs = _wide(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    cols = [script_count(t, s).cast("long").alias(s) for s in _SCRIPTS]
    return (docs.where(t.isNotNull())
            .select("doc_id", F.length(t).cast("long").alias("n_chars"),
                    *cols, dominant_script(t).alias("dominant")))


@query(
    "q_epoch_shuffle",
    oracle="""
    SELECT doc_id,
           ROW_NUMBER() OVER (
             ORDER BY ('0x' || substring(md5('ep1:' || CAST(doc_id AS VARCHAR)),
                                         1, 15))::BIGINT,
                      doc_id) AS epoch_rank
    FROM documents
    """,
)
def q_epoch_shuffle(spark, sf_dir):
    """Epoch-deterministic corpus shuffle — the training-order
    permutation (seeded hash rank, so every worker/rerun/engine
    materializes the SAME epoch order without coordination).  The rank
    is computed with operators/ranking.global_rank's bucket-offset
    decomposition: no unpartitioned window, no single-task sort — the
    permutation of a 100 TB corpus sorts in ~n_buckets parallel
    ranges.  The oracle replays the same order with a plain global
    ROW_NUMBER."""
    from access_mopper_spark.operators.ranking import global_rank
    docs = load_table(spark, sf_dir, "documents")
    key = F.conv(F.substring(
        F.md5(F.concat(F.lit("ep1:"), F.col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("long")
    keyed = docs.select("doc_id", key.alias("__shuf"))
    ranked = global_rank(keyed, "__shuf", ["doc_id"], out_col="epoch_rank")
    return ranked.select("doc_id", "epoch_rank")


# q_minhash_xxhash64 (the xxhash64 fast-path probe) was the registry's
# only oracle-less row: xxhash64 is Spark-native and has no DuckDB
# replay, and a value-pinned fixture would break whenever the driver
# regenerates testdata.  Demoted in round 10 (VERDICT r9 item 5) to
# tests/test_minhash_xxhash64.py, which pins the invariants the probe
# carried (exact-dup signature equality, the NULL-text contract, and
# class agreement with the oracle-checked md5 path on exact dups) —
# queries() is now 100% oracle-paired.  The ×10 build-cost measurement
# lives in minhash_signature's docstring (operators/dedup.py).


@query(
    "q_decay_engagement",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS mt FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * exp(
                 -(CAST(epoch_us(mx.mt) - epoch_us(CAST(ts AS TIMESTAMP))
                        AS DOUBLE) / 1000000.0) / 604800.0)
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_micro
    FROM events, mx
    WHERE value IS NOT NULL
    GROUP BY user_id
    """,
)
def q_decay_engagement(spark, sf_dir):
    """Exponential time-decay engagement score per user (tau = 7 days)
    — the recency-weighted aggregate behind freshness-aware sampling
    and user activity ranking.  Each term value*exp(-age/tau) snaps to
    integer micro-units BEFORE summation (the repo's integer-sum
    convention: the per-user sum is then exact and order-free on both
    engines — no float summation-order exposure).  Broadcast 1-row max
    timestamp; one keyed shuffle."""
    events = load_table(spark, sf_dir, "events")
    mx = events.agg(F.max("ts").alias("__mt"))
    age_s = (F.unix_micros(F.col("__mt")) - F.unix_micros(F.col("ts"))) \
        .cast("double") / F.lit(1000000.0)
    term_micro = F.floor(F.col("value") * F.exp(-age_s / F.lit(604800.0))
                         * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (events.where(F.col("value").isNotNull())
            .crossJoin(F.broadcast(mx))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum(term_micro).alias("score_micro")))


@query(
    "q_dedup_keep_best",
    oracle=f"""
    WITH clus AS ({_DEDUP_CLUSTERS_ORACLE}),
    sizes AS (SELECT cluster_id, COUNT(*) AS n_members
              FROM clus GROUP BY cluster_id),
    d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS qlen
          FROM documents WHERE text IS NOT NULL),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, d.qlen,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.qlen DESC, c.doc_id) AS rk
      FROM clus c JOIN d USING (doc_id)
    )
    SELECT r.cluster_id, r.doc_id AS keep_id, r.qlen, s.n_members
    FROM ranked r JOIN sizes s USING (cluster_id) WHERE r.rk = 1
    """,
)
def q_dedup_keep_best(spark, sf_dir):
    """Quality-ranked cluster representative selection (operators/dedup.
    dedup_keep_best — the CCNet policy: keep the BEST member of each
    near-dup cluster, not the arbitrary min-id; here quality = text
    length, production swaps in any score column e.g. lm_score).
    Clusters come from the same LSH-pairs + connected-components chain
    as q_dedup_clusters; selection is a rank-pushed per-cluster top-1.
    The oracle replays closure + ranking as a recursive CTE."""
    from access_mopper_spark.operators.dedup import (dedup_clusters,
                                                     dedup_keep_best,
                                                     near_dup_pairs)
    docs = load_table(spark, sf_dir, "documents")
    pairs = near_dup_pairs(docs, "text", "doc_id", n_hashes=6, band_size=2,
                           shingle_k=3, jaccard_threshold=0.5,
                           shingle_kind="word")
    clusters = dedup_clusters(pairs, docs.select("doc_id"))
    scored = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.length("text").cast("long").alias("qlen"))
    return dedup_keep_best(clusters, scored, score_col="qlen")


@query(
    "q_readability",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             text || CASE doc_id % 3
               WHEN 0 THEN ' Final sentence lands here. Another one follows!'
               WHEN 1 THEN ' One closing question appears?' ELSE '' END AS t
      FROM documents WHERE text IS NOT NULL
    ),
    m AS (
      SELECT doc_id,
        CASE WHEN length(trim(regexp_replace(t, '[ \t\n\r]+', ' ', 'g'), ' ')) = 0
             THEN 0
             ELSE length(trim(regexp_replace(t, '[ \t\n\r]+', ' ', 'g'), ' '))
                  - length(replace(trim(regexp_replace(t, '[ \t\n\r]+', ' ', 'g'),
                                        ' '), ' ', '')) + 1 END AS n_words,
        greatest(1, (length(t) - length(replace(t, '.', '')))
                   + (length(t) - length(replace(t, '!', '')))
                   + (length(t) - length(replace(t, '?', '')))) AS n_sents,
        length(regexp_replace(lower(t), '[aeiouy]+', chr(4), 'g'))
          - length(replace(regexp_replace(lower(t), '[aeiouy]+', chr(4), 'g'),
                           chr(4), '')) AS n_syls
      FROM d
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sents AS BIGINT) AS n_sentences,
           CAST(n_syls AS BIGINT) AS n_syllables,
           CASE WHEN n_words > 0 THEN
             ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE)
                                      / CAST(n_sents AS DOUBLE))
                   - 84.6 * (CAST(n_syls AS DOUBLE)
                             / CAST(n_words AS DOUBLE)), 6)
           END AS flesch
    FROM m
    """,
)
def q_readability(spark, sf_dir):
    """Flesch reading-ease scoring (functions/text.flesch_reading_ease
    — the readability signal edu-quality corpus filters threshold on):
    whitespace-word count, terminal-punctuation sentence proxy
    (clamped >= 1), vowel-group syllable proxy — all length-difference
    arithmetic, identical on any engine.  Fixture appends deterministic
    sentence tails so the sentence branch is exercised on the
    word-salad corpus.  Map-only, one scan."""
    from access_mopper_spark.functions.text import (flesch_reading_ease,
                                                    sentence_count_proxy,
                                                    syllable_proxy,
                                                    token_count)
    docs = _wide(load_table(spark, sf_dir, "documents"))
    k = F.col("doc_id")
    t = F.concat(F.col("text"),
                 F.when(k % 3 == 0,
                        F.lit(" Final sentence lands here. Another one follows!"))
                  .when(k % 3 == 1, F.lit(" One closing question appears?"))
                  .otherwise(F.lit("")))
    return (docs.where(F.col("text").isNotNull())
            .select("doc_id",
                    token_count(t).cast("long").alias("n_words"),
                    F.greatest(F.lit(1).cast("long"),
                               sentence_count_proxy(t)).alias("n_sentences"),
                    syllable_proxy(t).alias("n_syllables"),
                    R6(flesch_reading_ease(t)).alias("flesch")))


@query(
    "q_annotator_agreement",
    oracle="""
    WITH lab AS (
      SELECT l_returnflag,
             CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS a,
             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS b
      FROM lineitem
    ),
    agg AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(a * b) AS BIGINT) AS n11,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00,
             CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb
      FROM lab GROUP BY l_returnflag
    )
    SELECT l_returnflag, n AS n_items, n11 + n00 AS n_agree,
           CASE WHEN (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
                   + (1.0 - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                     * (1.0 - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) < 1.0
             THEN ROUND(
               ((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE))
                - ((CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
                   + (1.0 - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                     * (1.0 - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))))
               / (1.0 - ((CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
                         + (1.0 - CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                           * (1.0 - CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))),
               6)
           END AS kappa
    FROM agg
    """,
)
def q_annotator_agreement(spark, sf_dir):
    """Inter-annotator agreement (operators/aggregates.cohens_kappa —
    the QC gate preference/annotation pipelines run before trusting
    pairwise labels): kappa per group from one map-side-combined
    integer-count aggregation; the only float work is the final
    snapped division, order-free at any scale."""
    from access_mopper_spark.operators.aggregates import cohens_kappa
    li = load_table(spark, sf_dir, "lineitem")
    lab = li.select(
        "l_returnflag",
        F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("a"),
        F.when(F.col("l_extendedprice") > 30000, 1).otherwise(0).alias("b"))
    return cohens_kappa(lab, "a", "b", group_cols=["l_returnflag"])


@query(
    "q_length_bias",
    oracle="""
    WITH comps AS (
      SELECT CAST(l_quantity AS BIGINT) AS len_a,
             CAST(l_linenumber * 10 AS BIGINT) AS len_b,
             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS a_wins
      FROM lineitem
    ),
    b AS (
      SELECT CASE WHEN len_a - len_b < -20 THEN -2
                  WHEN len_a - len_b < 0 THEN -1
                  WHEN len_a = len_b THEN 0
                  WHEN len_a - len_b <= 20 THEN 1 ELSE 2 END AS delta_bucket,
             a_wins
      FROM comps
    )
    SELECT delta_bucket, COUNT(*) AS n_pairs,
           CAST(SUM(a_wins) AS BIGINT) AS n_a_wins,
           CAST(SUM(a_wins) * 10000 // COUNT(*) AS BIGINT) AS win_rate_bp
    FROM b GROUP BY delta_bucket
    """,
)
def q_length_bias(spark, sf_dir):
    """Length-bias diagnostic for preference data (the RLHF QC readout:
    does the LONGER response win regardless of content? — reward models
    trained on length-biased pairs learn verbosity).  Pairs bucket by
    length delta; win rates ship as integer basis points (integer
    division — no float in the hash surface).  One scan, one
    partial-aggregated shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    len_a = F.col("l_quantity").cast("long")
    len_b = (F.col("l_linenumber") * 10).cast("long")
    a_wins = F.when(F.col("l_extendedprice") > 30000, 1).otherwise(0)
    d = len_a - len_b
    bucket = (F.when(d < -20, -2).when(d < 0, -1)
              .when(len_a == len_b, 0).when(d <= 20, 1).otherwise(2))
    return (li.select(bucket.alias("delta_bucket"), a_wins.alias("a_wins"))
            .groupBy("delta_bucket")
            .agg(F.count("*").alias("n_pairs"),
                 F.sum("a_wins").cast("long").alias("n_a_wins"),
                 F.expr("CAST(SUM(a_wins) * 10000 DIV COUNT(*) AS BIGINT)")
                 .alias("win_rate_bp")))


@query(
    "q_label_conflicts",
    oracle="""
    WITH comps AS (
      SELECT CAST(l_partkey % 100 AS BIGINT) AS pair_key,
             CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS a_wins
      FROM lineitem
    )
    SELECT pair_key, COUNT(*) AS n_votes,
           CAST(SUM(a_wins) AS BIGINT) AS n_a,
           CAST(LEAST(SUM(a_wins), COUNT(*) - SUM(a_wins)) AS BIGINT)
             AS n_minority,
           (SUM(a_wins) > 0 AND SUM(a_wins) < COUNT(*)) AS conflicted
    FROM comps GROUP BY pair_key
    """,
)
def q_label_conflicts(spark, sf_dir):
    """Contradictory-label detection over repeated preference pairs
    (the same pair judged both ways — annotation noise that poisons a
    reward model): per pair key, vote counts, minority size, and a
    conflict flag.  Pure integer aggregation, one partial-combined
    shuffle on the pair key."""
    li = load_table(spark, sf_dir, "lineitem")
    comps = li.select(
        (F.col("l_partkey") % 100).alias("pair_key"),
        F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("a_wins"))
    return (comps.groupBy("pair_key")
            .agg(F.count("*").alias("n_votes"),
                 F.sum("a_wins").cast("long").alias("n_a"),
                 F.least(F.sum("a_wins"),
                         F.count("*") - F.sum("a_wins"))
                  .cast("long").alias("n_minority"),
                 ((F.sum("a_wins") > 0)
                  & (F.sum("a_wins") < F.count("*"))).alias("conflicted")))


@query(
    "q_annotator_bias",
    oracle="""
    WITH votes AS (
      SELECT CAST(l_partkey % 200 AS BIGINT) AS item,
             CAST(l_suppkey % 11 AS BIGINT) AS annotator,
             CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS vote
      FROM lineitem
    ),
    cons AS (
      SELECT item,
             CASE WHEN SUM(vote) * 2 > COUNT(*) THEN 1 ELSE 0 END AS c
      FROM votes GROUP BY item
    )
    SELECT v.annotator, COUNT(*) AS n_votes,
           CAST(SUM(CASE WHEN v.vote = c.c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_agree,
           CAST(SUM(CASE WHEN v.vote = c.c THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS agree_bp,
           CAST(SUM(v.vote) * 10000 // COUNT(*) AS BIGINT) AS pos_bp,
           CAST(SUM(c.c) * 10000 // COUNT(*) AS BIGINT) AS consensus_pos_bp,
           CAST(SUM(v.vote) * 10000 // COUNT(*)
                - SUM(c.c) * 10000 // COUNT(*) AS BIGINT) AS bias_bp
    FROM votes v JOIN cons c USING (item)
    GROUP BY v.annotator
    """,
)
def q_annotator_bias(spark, sf_dir):
    """Per-annotator bias vs consensus (operators/ml.annotator_bias —
    the preference-QC readout next to kappa/label-conflicts, verdict r8
    item 7): each annotator's agreement rate with the strict-majority
    consensus of the items they judged, plus their positive-rate delta
    against that consensus — all integer basis points.  Two map-side-
    combined aggregations and one item-keyed join; no floats, no
    windows."""
    from access_mopper_spark.operators.ml import annotator_bias
    li = load_table(spark, sf_dir, "lineitem")
    votes = li.select(
        (F.col("l_partkey") % 200).cast("long").alias("item"),
        (F.col("l_suppkey") % 11).cast("long").alias("annotator"),
        F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("vote"))
    return annotator_bias(votes, "item", "annotator", "vote")


@query(
    "q_position_bias",
    oracle="""
    WITH comps AS (
      SELECT l_returnflag,
             CAST((l_orderkey + l_linenumber) % 2 AS INT) AS a_shown_first,
             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS a_wins
      FROM lineitem
    )
    SELECT l_returnflag, COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN a_shown_first = a_wins THEN 1 ELSE 0 END)
                AS BIGINT) AS n_first_wins,
           CAST(SUM(CASE WHEN a_shown_first = a_wins THEN 1 ELSE 0 END)
                * 10000 // COUNT(*) AS BIGINT) AS first_win_bp
    FROM comps GROUP BY l_returnflag
    """,
)
def q_position_bias(spark, sf_dir):
    """Position-bias (first-response win rate) per annotation cohort
    (operators/ml.position_bias, verdict r8 item 7): under randomized
    presentation the first-shown response should win ~50%; a higher
    basis-point rate flags order-anchored annotators.  Presentation
    order derives deterministically from the pair key; one scan, one
    map-side-combined aggregate, integer-only output."""
    from access_mopper_spark.operators.ml import position_bias
    li = load_table(spark, sf_dir, "lineitem")
    comps = li.select(
        "l_returnflag",
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 2)
        .cast("int").alias("a_shown_first"),
        F.when(F.col("l_extendedprice") > 30000, 1).otherwise(0)
        .alias("a_wins"))
    return position_bias(comps, "a_shown_first", "a_wins",
                         group_cols=["l_returnflag"])


@query(
    "q_template_dedup",
    oracle=r"""
    WITH ins AS (
      SELECT doc_id,
        CASE doc_id % 4
          WHEN 0 THEN 'Write a story about "' || source || '" in '
                      || CAST(50 + doc_id % 200 AS VARCHAR) || ' words'
          WHEN 1 THEN 'Translate "' || lang || '" sample number '
                      || CAST(doc_id AS VARCHAR)
          WHEN 2 THEN 'Summarize the following: ' || text
          ELSE 'List ' || CAST(3 + doc_id % 7 AS VARCHAR)
               || ' facts about "' || source || '"' END AS instr
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
    ),
    tpl AS (
      SELECT doc_id,
             md5(trim(regexp_replace(
               regexp_replace(regexp_replace(lower(instr),
                 '"[^"]*"', '<quote>', 'g'),
                 '[0-9]+(\.[0-9]+)?', '<num>', 'g'),
               '[ \t\n\r]+', ' ', 'g'), ' ')) AS template_fp
      FROM ins
    ),
    counts AS (SELECT template_fp, COUNT(*) AS n_docs
               FROM tpl GROUP BY template_fp),
    kept AS (
      SELECT template_fp, doc_id,
             row_number() OVER (PARTITION BY template_fp
                                ORDER BY doc_id) AS rk
      FROM tpl
    )
    SELECT k.template_fp, k.doc_id, c.n_docs
    FROM kept k JOIN counts c USING (template_fp) WHERE k.rk <= 10
    """,
)
def q_template_dedup(spark, sf_dir):
    """Instruction-template dedup/capping (functions/text.
    instruction_template — the Self-Instruct-era diversity control):
    instructions normalize to templates (<num>/<quote> slots, case and
    whitespace folded) so a template repeated with varied slot fillers
    — which exact dedup misses and whole-text near-dup dilutes — caps
    at 10 representatives.  Rank-pushed per-template window + one
    partial-combined count; map-only normalization."""
    from access_mopper_spark.functions.text import instruction_template
    from pyspark.sql.window import Window
    docs = _wide(load_table(spark, sf_dir, "documents"))
    k = F.col("doc_id")
    instr = (F.when(k % 4 == 0,
                    F.concat(F.lit('Write a story about "'), F.col("source"),
                             F.lit('" in '),
                             (F.lit(50) + k % 200).cast("string"),
                             F.lit(" words")))
             .when(k % 4 == 1,
                   F.concat(F.lit('Translate "'), F.col("lang"),
                            F.lit('" sample number '), k.cast("string")))
             .when(k % 4 == 2,
                   F.concat(F.lit("Summarize the following: "),
                            F.col("text")))
             .otherwise(
                   F.concat(F.lit("List "),
                            (F.lit(3) + k % 7).cast("string"),
                            F.lit(' facts about "'), F.col("source"),
                            F.lit('"'))))
    tpl = (docs.where(F.col("text").isNotNull()
                      & F.col("lang").isNotNull()
                      & F.col("source").isNotNull())
           .select("doc_id",
                   F.md5(instruction_template(instr)).alias("template_fp")))
    counts = tpl.groupBy("template_fp").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("template_fp").orderBy("doc_id")
    kept = tpl.withColumn("__rk", F.row_number().over(w)) \
              .where(F.col("__rk") <= 10).drop("__rk")
    return kept.join(counts, "template_fp") \
               .select("template_fp", "doc_id", "n_docs")


def _bt_oracle_sql(iters: int = 3, lr: float = 1.0) -> str:
    """Unrolled Bradley-Terry gradient replay for DuckDB — per-round
    mean gradients and ratings snap to the 1e-6 grid exactly as the
    Spark plan does (logreg_train convention), so both engines thread
    identical doubles into each sigmoid pass."""
    parts = [
        "WITH comps AS (SELECT CAST(l_partkey % 20 AS BIGINT) AS a, "
        "CAST(l_suppkey % 20 AS BIGINT) AS b, "
        "CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS w "
        "FROM lineitem WHERE l_partkey % 20 <> l_suppkey % 20),\n"
        "items AS (SELECT DISTINCT a AS item FROM comps "
        "UNION SELECT DISTINCT b FROM comps),\n"
        "r0 AS (SELECT item, 0.0 AS r FROM items)"]
    for k in range(1, iters + 1):
        parts.append(
            f"e{k} AS (SELECT c.a, c.b, c.w, "
            f"(c.w - 1.0/(1.0 + exp(-(ra.r - rb.r)))) AS err "
            f"FROM comps c JOIN r{k - 1} ra ON ra.item = c.a "
            f"JOIN r{k - 1} rb ON rb.item = c.b)")
        parts.append(
            f"g{k} AS (SELECT item, "
            f"ROUND(SUM(err)/CAST(COUNT(*) AS DOUBLE), 6) AS g "
            f"FROM (SELECT a AS item, err FROM e{k} "
            f"UNION ALL SELECT b, -err FROM e{k}) GROUP BY item)")
        parts.append(
            f"r{k} AS (SELECT r.item, "
            f"ROUND(r.r + {lr} * COALESCE(g.g, 0.0), 6) AS r "
            f"FROM r{k - 1} r LEFT JOIN g{k} g USING (item))")
    parts.append(
        "stats AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_comps, "
        "CAST(SUM(win) AS BIGINT) AS n_wins FROM ("
        "SELECT a AS item, CAST(w AS BIGINT) AS win FROM comps "
        "UNION ALL SELECT b, CAST(1.0 - w AS BIGINT) FROM comps) "
        "GROUP BY item)")
    return (",\n".join(parts)
            + f"\nSELECT r.item, r.r AS rating, s.n_comps, s.n_wins "
            f"FROM r{iters} r JOIN stats s USING (item)")


@query("q_bt_rating", oracle=_bt_oracle_sql())
def q_bt_rating(spark, sf_dir):
    """Bradley-Terry preference rating (operators/ml.bt_rating — the
    RLHF preference-data model: rank items from pairwise win/loss
    records, p(a beats b) = sigmoid(r_a - r_b)).  3 unrolled full-batch
    rounds: comparisons join the BROADCAST 20-row rating table, each
    comparison explodes into two signed residuals, and the gradient is
    a map-side-combined per-item mean — at 100 TB of comparisons each
    round moves |items| values, nothing else.  Ratings snap to the
    1e-6 grid per round; the oracle replays the identical trajectory."""
    from access_mopper_spark.operators.ml import bt_rating
    li = load_table(spark, sf_dir, "lineitem")
    comps = (li.where((F.col("l_partkey") % 20) != (F.col("l_suppkey") % 20))
             .select((F.col("l_partkey") % 20).alias("a"),
                     (F.col("l_suppkey") % 20).alias("b"),
                     F.when(F.col("l_quantity") > 25, F.lit(1.0))
                      .otherwise(F.lit(0.0)).alias("w")))
    r = bt_rating(comps, iterations=3, lr=1.0)
    stats = (comps.select(F.col("a").alias("item"),
                          F.col("w").cast("long").alias("win"))
             .unionByName(comps.select(F.col("b").alias("item"),
                                       (F.lit(1.0) - F.col("w"))
                                       .cast("long").alias("win")))
             .groupBy("item")
             .agg(F.count("*").alias("n_comps"),
                  F.sum("win").alias("n_wins")))
    return (r.join(stats, "item")
            .select("item", F.col("r").alias("rating"),
                    "n_comps", "n_wins"))




# =====================================================================
# round 9: corpus drift monitors (PSI, unigram KL) — the snapshot-to-
# snapshot readouts run before committing a training-data refresh
# =====================================================================

@query(
    "q_psi_drift",
    oracle="""
    WITH b AS (
      SELECT CAST(n_chars AS BIGINT) // 64 AS bucket,
             CASE WHEN COALESCE(lang, '') = 'en' THEN 0 ELSE 1 END AS side
      FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ref,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cur
      FROM b GROUP BY bucket
    ),
    t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
                 CAST(SUM(n_cur) AS BIGINT) AS tc,
                 COUNT(*) AS nb FROM counts)
    SELECT c.bucket, c.n_ref, c.n_cur,
           ROUND((CAST(c.n_cur + 1 AS DOUBLE) / CAST(t.tc + t.nb AS DOUBLE)
                  - CAST(c.n_ref + 1 AS DOUBLE) / CAST(t.tr + t.nb AS DOUBLE))
                 * LN((CAST(c.n_cur + 1 AS DOUBLE)
                       / CAST(t.tc + t.nb AS DOUBLE))
                      / (CAST(c.n_ref + 1 AS DOUBLE)
                         / CAST(t.tr + t.nb AS DOUBLE))), 6) AS psi_term
    FROM counts c, t
    """,
)
def q_psi_drift(spark, sf_dir):
    """Population Stability Index decomposition between two corpus
    snapshots (operators/drift.psi_buckets — the distribution-shift
    gate run before committing a data refresh; PSI > 0.2 is the
    conventional 'distribution moved' alarm).  Reference = English
    docs, current = the rest; doc length buckets by integer division
    (exact on both engines), add-1 smoothing over the union bucket
    set.  One map-side-combined (bucket, side) count + a broadcast
    1-row totals join; floats only in the final p·ln(p/q) terms on
    exact integer counts."""
    from access_mopper_spark.operators.drift import psi_buckets
    docs = load_table(spark, sf_dir, "documents")
    d = docs.where(F.col("text").isNotNull()).select(
        "n_chars",
        F.when(F.coalesce(F.col("lang"), F.lit("")) == "en", 0)
         .otherwise(1).alias("side"))
    out = psi_buckets(d, "n_chars", "side", bucket_width=64)
    return out.select("bucket", "n_ref", "n_cur",
                      R6(F.col("psi_term")).alias("psi_term"))


@query(
    "q_kl_unigram_drift",
    oracle="""
    WITH toks AS (
      SELECT CASE WHEN COALESCE(lang, '') = 'en' THEN 0 ELSE 1 END AS side,
             string_split(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ',
                                              'g'), ' '), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    tk AS (
      SELECT side, u.t AS tok FROM toks, UNNEST(w) AS u(t) WHERE u.t <> ''
    ),
    c AS (
      SELECT tok,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_ref,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_cur
      FROM tk GROUP BY tok
    ),
    t AS (SELECT CAST(SUM(c_ref) AS BIGINT) AS nr,
                 CAST(SUM(c_cur) AS BIGINT) AS nc,
                 COUNT(*) AS v FROM c)
    SELECT t.nr AS n_tokens_ref, t.nc AS n_tokens_cur, t.v AS vocab,
           ROUND(SUM((CAST(c.c_cur + 1 AS DOUBLE) / CAST(t.nc + t.v AS DOUBLE))
                     * LN((CAST(c.c_cur + 1 AS DOUBLE)
                           / CAST(t.nc + t.v AS DOUBLE))
                          / (CAST(c.c_ref + 1 AS DOUBLE)
                             / CAST(t.nr + t.v AS DOUBLE)))), 6) AS kl_nats
    FROM c, t
    GROUP BY t.nr, t.nc, t.v
    """,
)
def q_kl_unigram_drift(spark, sf_dir):
    """Smoothed unigram KL divergence KL(current ‖ reference) between
    corpus snapshots (operators/drift.unigram_kl — the vocabulary-
    drift readout next to PSI).  Reference = English docs, current =
    the rest; whitespace tokens (the repo's corpus-stats convention),
    add-1 smoothing over the union vocabulary so absent tokens carry
    their smoothed mass.  One (token) count with conditional side
    sums, a broadcast 1-row totals join, one scalar reduce — the same
    plan class as q_token_entropy."""
    from access_mopper_spark.operators.drift import unigram_kl
    from access_mopper_spark.operators.search import tokens

    docs = _wide(load_table(spark, sf_dir, "documents"))
    tk = (docs.where(F.col("text").isNotNull())
          .select(F.when(F.coalesce(F.col("lang"), F.lit("")) == "en", 0)
                  .otherwise(1).alias("side"),
                  F.explode(tokens(F.col("text"))).alias("tok"))
          .where(F.col("tok") != ""))
    out = unigram_kl(tk, "tok", "side")
    return out.select("n_tokens_ref", "n_tokens_cur", "vocab",
                      R6(F.col("kl_nats")).alias("kl_nats"))


@query(
    "q_url_dedup",
    oracle=f"""
    WITH {_URL_CANON_CTES}
    SELECT canonical_url, MIN(doc_id) AS keep_id,
           COUNT(*) - 1 AS n_dups
    FROM canon GROUP BY canonical_url
    """,
)
def q_url_dedup(spark, sf_dir):
    """URL-level exact dedup — the FIRST dedup stage of every web
    pipeline (the same page recrawled under tracker params / default
    ports / fragments is one document): group by the canonical URL
    (operators/web.canonicalize_url), keep the lowest doc id, count
    the shadowed fetches.  One map-side-combined shuffle on the
    canonical key; canonicalization is inline Column math on the
    scan."""
    from access_mopper_spark.operators.web import canonicalize_url
    docs = load_table(spark, sf_dir, "documents")
    u = _url_fixture(docs)
    canon = u.select("doc_id", canonicalize_url(F.col("url"))
                     .alias("canonical_url"))
    return (canon.groupBy("canonical_url")
            .agg(F.min("doc_id").alias("keep_id"),
                 (F.count("*") - 1).alias("n_dups")))


@query(
    "q_paragraph_dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id,
        text || chr(10) || 'Shared disclaimer block.' || chr(10)
             || CASE WHEN doc_id % 3 = 0 THEN text
                     ELSE 'Unique tail ' || CAST(doc_id AS VARCHAR) END
             || chr(10) || 'Shared disclaimer block.' AS txt
      FROM documents WHERE text IS NOT NULL
    ),
    paras AS (
      SELECT doc_id, g.i AS pos,
             list_extract(regexp_split_to_array(txt, '\\r?\\n'), g.i) AS p,
             len(regexp_split_to_array(txt, '\\r?\\n')) AS n_paragraphs
      FROM d, (SELECT UNNEST(range(1,
               (SELECT COALESCE(MAX(len(regexp_split_to_array(
                        txt, '\\r?\\n'))), 1) FROM d) + 1)) AS i) g
      WHERE g.i <= len(regexp_split_to_array(txt, '\\r?\\n'))
    ),
    firsts AS (
      SELECT doc_id, p, MIN(pos) AS first_pos, MIN(n_paragraphs) AS np
      FROM paras GROUP BY doc_id, p
    )
    SELECT doc_id,
           string_agg(p, chr(10) ORDER BY first_pos) AS clean,
           CAST(MIN(np) AS BIGINT) AS n_paragraphs,
           CAST(MIN(np) - COUNT(*) AS BIGINT) AS n_removed
    FROM firsts GROUP BY doc_id
    """,
)
def q_paragraph_dedup(spark, sf_dir):
    """Intra-document repeated-paragraph removal, keep-first
    (operators/lines.dedup_paragraphs — the within-doc cousin of
    cross-document boilerplate removal).  Fixture injects a repeated
    disclaimer block (every doc) and a full-body repeat (every third
    doc).  MAP-ONLY on the Spark side: array_distinct preserves
    first-occurrence order, so the pass is one scan, zero shuffles —
    the oracle replays keep-first via min-position grouping."""
    from access_mopper_spark.operators.lines import dedup_paragraphs
    docs = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    txt = F.concat(
        F.col("text"), F.lit("\nShared disclaimer block.\n"),
        F.when(k % 3 == 0, F.col("text"))
         .otherwise(F.concat(F.lit("Unique tail "), k.cast("string"))),
        F.lit("\nShared disclaimer block."))
    fix = docs.where(F.col("text").isNotNull()).select(
        "doc_id", txt.alias("txt"))
    return dedup_paragraphs(fix, "doc_id", "txt")


@query(
    "q_temperature_mixture",
    oracle="""
    WITH c AS (
      SELECT COALESCE(lang, '<null>') AS lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY COALESCE(lang, '<null>')
    ),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM c),
    p AS (
      SELECT c.lang, c.n_docs,
             CAST(c.n_docs AS DOUBLE) / CAST(t.n AS DOUBLE) AS share,
             POW(CAST(c.n_docs AS DOUBLE) / CAST(t.n AS DOUBLE),
                 CAST(0.5 AS DOUBLE)) AS pa
      FROM c, t
    ),
    z AS (SELECT SUM(pa) AS z FROM p)
    SELECT p.lang, p.n_docs, ROUND(p.share, 6) AS share,
           ROUND(p.pa / z.z, 6) AS weight,
           ROUND(p.pa / z.z / p.share, 6) AS boost
    FROM p, z
    """,
)
def q_temperature_mixture(spark, sf_dir):
    """Temperature-based multilingual mixture weights (operators/
    sampling.temperature_weights, α = 0.5): p_l ∝ share_l^α normalized
    — the rebalancing rule multilingual LM mixes use to up-weight tail
    languages without flattening the head.  One map-side-combined
    count on the language key + two broadcast 1-row normalizers; the
    corpus never shuffles.  Floats only in the final pow/divide on
    exact integer counts, snapped to the 1e-6 grid."""
    from access_mopper_spark.operators.sampling import temperature_weights
    docs = load_table(spark, sf_dir, "documents").select(
        F.coalesce(F.col("lang"), F.lit("<null>")).alias("lang"))
    out = temperature_weights(docs, "lang", alpha=0.5)
    return out.select("lang", "n_docs", R6(F.col("share")).alias("share"),
                      R6(F.col("weight")).alias("weight"),
                      R6(F.col("boost")).alias("boost"))


@query(
    "q_winnowing_fingerprints",
    oracle="""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE text IS NOT NULL AND length(text) >= 8
    ),
    g AS (
      SELECT d.doc_id, gi.i AS i,
             substring(md5(substring(d.text, gi.i, 5)), 1, 8) AS h,
             length(d.text) - 4 AS n_grams
      FROM d, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(length(text)), 1)
                                       FROM d) + 1)) AS i) gi
      WHERE gi.i <= length(d.text) - 4
    ),
    wmin AS (
      SELECT doc_id, i, n_grams,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM g
    )
    SELECT DISTINCT doc_id, fp FROM wmin WHERE i <= n_grams - 3
    """,
)
def q_winnowing_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) rolling-hash document fingerprints
    (operators/dedup.winnowing_fingerprints, k=5, w=4): the min 5-gram
    hash of every 4-gram-hash window — guarantees any shared substring
    of length >= 8 chars yields a shared fingerprint.  The substring-
    match fingerprinting stage next to MinHash's set-resemblance.
    Spark side is MAP-ONLY (chained higher-order transforms in-row, no
    explode until output, one distinct exchange); the oracle replays
    the identical md5-lane minima through a windowed MIN — same
    selection, different physical shape, one more cross-engine
    invariant."""
    from access_mopper_spark.operators.dedup import winnowing_fingerprints
    docs = _wide(load_table(spark, sf_dir, "documents"))
    return winnowing_fingerprints(docs, "doc_id", "text", k=5, w=4)
