"""Round-5 training-data additions (splits, Zipf, char-grams, graph).

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403


# =====================================================================
# Round-5 training-data additions: exact-count stratified split,
# per-source Zipf slope, char-gram duplicated-span detection
# =====================================================================

@query(
    "q_exact_stratified_split",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang AS stratum,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('strat0:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS rnk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT doc_id, stratum,
           CASE WHEN rnk <= FLOOR(CAST(0.8 AS DOUBLE) * n) THEN 'train'
                WHEN rnk <= FLOOR((CAST(0.8 AS DOUBLE)
                                   + CAST(0.1 AS DOUBLE)) * n) THEN 'val'
                ELSE 'test' END AS split
    FROM r
    """,
)
def q_exact_stratified_split(spark, sf_dir):
    """EXACT-count stratified train/val/test split (80/10/10 per
    language): within every stratum the first ⌊0.8n⌋ docs of a
    deterministic md5 shuffle are train — the exact-proportion
    contract hash-threshold sampling (`q_stratified_sample`) only hits
    in expectation.  Strata are few and HUGE at corpus scale, so the
    within-stratum rank is bucket-decomposed (256 hash-prefix buckets,
    broadcast offset join, windows partitioned by (stratum, bucket) —
    `operators/sampling.exact_stratified_split`), never a single
    per-language sort.  The oracle runs the naive one-window
    formulation; equality IS the decomposition's correctness proof.
    Split fractions enter as IEEE doubles on both sides so the floor
    boundary cannot disagree."""
    from access_mopper_spark.operators.sampling import exact_stratified_split
    docs = load_table(spark, sf_dir, "documents")
    return exact_stratified_split(docs, "doc_id", "lang",
                                  train_frac=0.8, val_frac=0.1,
                                  salt="strat0")


@query(
    "q_zipf_alpha",
    oracle=r"""
    WITH toks AS (
      SELECT trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn,
             source
      FROM documents WHERE text IS NOT NULL
    ),
    tk AS (
      SELECT source, u.t AS tok
      FROM toks, UNNEST(string_split(tn, ' ')) AS u(t) WHERE u.t <> ''
    ),
    c AS (
      SELECT source, tok, COUNT(*) AS c FROM tk GROUP BY source, tok
    ),
    ranked AS (
      SELECT source, c,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY c DESC, tok ASC) AS rnk
      FROM c
    ),
    xy AS (
      SELECT source, LN(CAST(rnk AS DOUBLE)) AS x, LN(CAST(c AS DOUBLE)) AS y
      FROM ranked WHERE rnk <= 100
    ),
    s AS (
      SELECT source, COUNT(*) AS n_used, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM xy GROUP BY source
    )
    SELECT source, n_used,
           ROUND(-(n_used * sxy - sx * sy) / (n_used * sxx - sx * sx), 6)
             AS alpha
    FROM s WHERE n_used >= 2
    """,
)
def q_zipf_alpha(spark, sf_dir):
    """Per-source Zipf exponent: OLS slope of ln(frequency) on ln(rank)
    over the top-100 token types — the classic corpus-health diagnostic
    (natural text sits near α≈1; templated/spammy sources drift).  The
    rank window is a per-source top-k (row_number + rnk≤100 filter →
    WindowGroupLimit pushes the limit into the sort, no full-vocab
    window materialization), then one tiny grouped regression — the
    `group_linreg` moment pattern.  Tokenization follows the repo's
    explicit `[ \\t\\n\\r]` class; ties on count rank by token text so
    the top-100 cut is deterministic on both engines."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = (_wide(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull()))
    toks = docs.select(
        "source",
        F.explode(F.filter(F.split(ws_normalized(F.col("text")), " ", -1),
                           lambda t: t != "")).alias("tok"))
    c = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    w = W.partitionBy("source").orderBy(F.desc("c"), F.asc("tok"))
    xy = (c.withColumn("rnk", F.row_number().over(w))
           .where(F.col("rnk") <= 100)
           .select("source",
                   F.log(F.col("rnk").cast("double")).alias("x"),
                   F.log(F.col("c").cast("double")).alias("y")))
    s = xy.groupBy("source").agg(
        F.count("*").alias("n_used"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"), F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    alpha = -(F.col("n_used") * F.col("sxy") - F.col("sx") * F.col("sy")) / \
        (F.col("n_used") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return (s.where(F.col("n_used") >= 2)
             .select("source", "n_used", R6(alpha).alias("alpha")))


@query(
    "q_dup_span_chargrams",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents WHERE text IS NOT NULL
    ),
    t2 AS (
      SELECT doc_id, tn FROM t WHERE len(tn) >= 32
    ),
    g AS (
      SELECT doc_id, md5(substring(tn, CAST(i AS INTEGER), 32)) AS h
      FROM t2, (SELECT UNNEST(range(1,
                 (SELECT COALESCE(MAX(len(tn)), 1) FROM t2) + 1, 16)) AS i) r
      WHERE i <= len(tn) - 31
    ),
    d AS (
      SELECT h, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY h
    )
    SELECT g.doc_id, COUNT(*) AS n_grams,
           SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS n_dup_grams
    FROM g JOIN d ON d.h = g.h
    GROUP BY g.doc_id
    """,
)
def q_dup_span_chargrams(spark, sf_dir):
    """Cross-document duplicated-SPAN detection (ExactSubstr-lite, after
    Lee et al.'s dedup-training-data observation): 32-char shingles at
    stride 16 — any duplicated run ≥ 47 chars is guaranteed to produce
    at least one shared gram — hashed and counted across documents.
    Character level, so it catches copied passages word-n-gram dedup
    misses under re-tokenization.  Stride bounds the blowup to
    len/16 rows per doc (a true suffix automaton is superlinear state);
    the shape is two hash-keyed shuffles (gram → doc-count, gram join
    back) and never all-pairs.  Integer-only output."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = (_wide(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull()))
    t2 = (docs.select("doc_id", ws_normalized(F.col("text")).alias("tn"))
              .where(F.length("tn") >= 32))
    # Column.substr takes Column positions (F.substring is int-only)
    grams = t2.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("tn") - 31, F.lit(16)),
            lambda i: F.md5(F.col("tn").substr(i, F.lit(32))))).alias("h"))
    d = grams.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd"))
    return (grams.join(d, "h")
                 .groupBy("doc_id")
                 .agg(F.count("*").alias("n_grams"),
                      F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                       .alias("n_dup_grams")))


@query(
    "q_sentence_stats",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT doc_id,
             list_filter(
               list_transform(regexp_split_to_array(tn, '[.!?]+'),
                              x -> trim(x, ' ')),
               x -> x <> '') AS segs
      FROM t
    )
    SELECT doc_id, len(segs) AS n_sentences,
           COALESCE(list_max(list_transform(segs, x -> len(x))), 0)
             AS max_sentence_chars
    FROM s
    """,
)
def q_sentence_stats(spark, sf_dir):
    """Sentence segmentation stats (the chunking/windowing primitive
    RAG-style passage splitters build on): segments = runs between
    ``[.!?]+`` enders, whitespace-trimmed, empties dropped.  Pure
    Column pipeline — split/transform/filter/array_max — no explode
    (per-doc stats don't need row expansion) and no UDF; the regex
    class contains no ``\\s``-style dialect traps.  Integer-only
    output."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = (_wide(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull()))
    segs = F.filter(
        F.transform(F.split(ws_normalized(F.col("text")), r"[.!?]+", -1),
                    lambda x: F.trim(x)),
        lambda x: x != "")
    return (docs.select("doc_id", segs.alias("segs"))
                .select("doc_id", F.size("segs").alias("n_sentences"),
                        F.coalesce(
                            F.array_max(F.transform(
                                F.col("segs"), lambda x: F.length(x))),
                            F.lit(0)).alias("max_sentence_chars")))


@query(
    "q_code_detect",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(text) - len(replace(text, ';', '')) AS BIGINT) AS semis,
             CAST(len(text) - len(replace(text, '{', '')) AS BIGINT)
               + CAST(len(text) - len(replace(text, '}', '')) AS BIGINT)
               AS braces,
             CAST((len(text) - len(replace(text, '
    ', ''))) / 5 AS BIGINT) AS indents,
             CAST(len(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' '))
                  - len(replace(trim(regexp_replace(text, '[ \t\n\r]+', ' ',
                                                    'g'), ' '), ' ', ''))
                  + CASE WHEN trim(regexp_replace(text, '[ \t\n\r]+', ' ',
                                                  'g'), ' ') = '' THEN 0
                         ELSE 1 END AS BIGINT) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, 3 * braces + 2 * semis + indents AS code_score,
           CASE WHEN (3 * braces + 2 * semis + indents) * 20 > n_tokens
                THEN 1 ELSE 0 END AS is_code
    FROM f
    """,
)
def q_code_detect(spark, sf_dir):
    """Code-vs-prose heuristic (corpus routing: code wants different
    dedup/tokenization than prose): integer score from brace/semicolon
    density and 4-space-indented newlines, thresholded against the
    token count.  Every feature is a length-difference occurrence
    count — the repo's dialect-portable counting idiom — so the rule
    is exact integer math on both engines, map-only at any scale."""
    from access_mopper_spark.functions.text import token_count
    docs = (_wide(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull()))
    def occ(needle, width):
        return ((F.length("text")
                 - F.length(F.replace(F.col("text"), F.lit(needle),
                                      F.lit(""))))
                / width).cast("long")
    semis = occ(";", 1)
    braces = occ("{", 1) + occ("}", 1)
    indents = occ("\n    ", 5)
    score = (3 * braces + 2 * semis + indents).alias("code_score")
    return docs.select(
        "doc_id", score,
        F.when((3 * braces + 2 * semis + indents) * 20
               > token_count(F.col("text")), 1).otherwise(0)
         .alias("is_code"))


@query(
    "q_kneser_ney_bigram",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(text,
               '[ \t\n\r]+', ' ', 'g'), ' '), ' '), t -> t <> '') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    big AS (
      SELECT w[CAST(i AS INTEGER)] AS w1, w[CAST(i AS INTEGER) + 1] AS w2
      FROM toks, (SELECT UNNEST(range(1,
             (SELECT COALESCE(MAX(len(w)), 1) FROM toks))) AS i) r
      WHERE i <= len(w) - 1
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c) AS cw1, COUNT(*) AS ntypes FROM c2 GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS nprec FROM c2 GROUP BY w2),
    tot AS (SELECT COUNT(*) AS nbig FROM c2),
    top AS (
      SELECT w1, w2, c FROM c2 ORDER BY c DESC, w1, w2 LIMIT 200
    )
    SELECT t.w1, t.w2, t.c,
           ROUND((GREATEST(CAST(t.c AS DOUBLE) - CAST(0.75 AS DOUBLE),
                           CAST(0 AS DOUBLE)) / c1.cw1)
                 + (CAST(0.75 AS DOUBLE) * c1.ntypes / c1.cw1)
                   * (CAST(cont.nprec AS DOUBLE) / tot.nbig), 6) AS p_kn
    FROM top t
    JOIN c1 ON c1.w1 = t.w1
    JOIN cont ON cont.w2 = t.w2
    CROSS JOIN tot
    """,
)
def q_kneser_ney_bigram(spark, sf_dir):
    """Kneser-Ney smoothed bigram probabilities (the standard n-gram
    LM smoothing; the repo's bigram LM uses add-k — KN's
    continuation-count back-off is what production n-gram scoring
    uses).  Every ingredient is a keyed aggregate of the bigram-count
    table: c(w1,w2), c(w1)=Σc, distinct-successor and
    distinct-predecessor type counts, and the global bigram-type
    count as a broadcast scalar — the model NEVER collects to the
    driver and joins stay on (w1)/(w2) keys.  Reported for the
    top-200 bigrams (count-desc, word tie-break) so the output is a
    stable, bounded slice; discount enters as an IEEE double on both
    engines and the probability rounds via R6."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = (_wide(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull()))
    w = F.filter(F.split(ws_normalized(F.col("text")), " ", -1),
                 lambda t: t != "")
    pairs = docs.select(
        F.explode(F.zip_with(
            F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
            F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))))
        .alias("p"))
    c2 = (pairs.select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
               .groupBy("w1", "w2").agg(F.count("*").alias("c")))
    c1 = c2.groupBy(F.col("w1").alias("k1")).agg(
        F.sum("c").alias("cw1"), F.count("*").alias("ntypes"))
    cont = c2.groupBy(F.col("w2").alias("k2")).agg(
        F.count("*").alias("nprec"))
    tot = c2.agg(F.count("*").alias("nbig"))
    top = (c2.orderBy(F.desc("c"), "w1", "w2").limit(200))
    D = F.lit(0.75)
    p_kn = ((F.greatest(F.col("c").cast("double") - D, F.lit(0.0))
             / F.col("cw1"))
            + (D * F.col("ntypes") / F.col("cw1"))
            * (F.col("nprec").cast("double") / F.col("nbig")))
    return (top.join(c1, F.col("k1") == F.col("w1"))
               .join(cont, F.col("k2") == F.col("w2"))
               .crossJoin(F.broadcast(tot))
               .select("w1", "w2", "c", R6(p_kn).alias("p_kn")))


@query(
    "q_passage_windows",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents WHERE text IS NOT NULL
    ),
    sg AS (
      SELECT doc_id,
             list_filter(
               list_transform(regexp_split_to_array(tn, '[.!?]+'),
                              x -> trim(x, ' ')),
               x -> x <> '') AS segs
      FROM t
    ),
    s AS (
      SELECT doc_id, segs[CAST(i AS INTEGER)] AS seg, i AS idx
      FROM sg, (SELECT UNNEST(range(1,
             (SELECT COALESCE(MAX(len(segs)), 0) FROM sg) + 1)) AS i) g
      WHERE i <= len(segs)
    ),
    c AS (
      SELECT doc_id, idx, len(seg) AS n_chars,
             SUM(len(seg)) OVER (PARTITION BY doc_id ORDER BY idx
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM s
    )
    SELECT doc_id, CAST(FLOOR((cum - 1) / 200) AS BIGINT) AS passage_id,
           COUNT(*) AS n_sentences, SUM(n_chars) AS n_chars
    FROM c
    GROUP BY doc_id, passage_id
    """,
)
def q_passage_windows(spark, sf_dir):
    """Sentence-boundary passage windowing (the RAG chunker contract:
    never split mid-sentence, target ~200 chars/passage): sentences
    index in document order, an inclusive character cumsum assigns
    each to passage ⌊(cum−1)/200⌋ — deterministic integer math, no
    greedy state.  One keyed window (cumsum per doc_id) is the only
    shuffle; sentence explode carries ordinality via ``posexplode`` so
    both engines agree on order without relying on array iteration
    semantics.  Integer-only output."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = (_wide(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull()))
    segs = F.filter(
        F.transform(F.split(ws_normalized(F.col("text")), r"[.!?]+", -1),
                    lambda x: F.trim(x)),
        lambda x: x != "")
    s = (docs.select("doc_id", F.posexplode(segs).alias("idx0", "seg"))
             .select("doc_id", (F.col("idx0") + 1).alias("idx"),
                     F.length("seg").alias("n_chars")))
    w = (W.partitionBy("doc_id").orderBy("idx")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    c = s.withColumn("cum", F.sum("n_chars").over(w))
    return (c.groupBy("doc_id",
                      F.floor((F.col("cum") - 1) / 200).cast("long")
                       .alias("passage_id"))
             .agg(F.count("*").alias("n_sentences"),
                  F.sum("n_chars").alias("n_chars")))


@query(
    "q_dup_family_census",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             substring(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'),
                            ' '), 1, 48) AS f
      FROM documents WHERE text IS NOT NULL
    ),
    fam AS (
      SELECT f, COUNT(*) AS family_size,
             COUNT(DISTINCT source) AS n_sources
      FROM fp GROUP BY f
    )
    SELECT family_size, n_sources, COUNT(*) AS n_families
    FROM fam GROUP BY family_size, n_sources
    """,
)
def q_dup_family_census(spark, sf_dir):
    """Boilerplate FAMILY census: how many shared-prefix families (48
    normalized chars — the templated-opening signature) exist at each
    (size, cross-source spread) — the corpus-health summary dedup
    planning starts from (a 2×-heavy family histogram means dedup
    pays; wide n_sources means mirrors, not re-crawls).  Two
    map-side-combined groupBys on the family key; output cardinality
    is bounded by the histogram support, so the census is safe to
    collect at any corpus size."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = (_wide(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull()))
    fam = (docs.select(ws_normalized(F.col("text"))
                        .substr(F.lit(1), F.lit(48)).alias("f"), "source")
               .groupBy("f")
               .agg(F.count("*").alias("family_size"),
                    F.count_distinct("source").alias("n_sources")))
    return (fam.groupBy("family_size", "n_sources")
               .agg(F.count("*").alias("n_families")))


@query(
    "q_boundary_overlap",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents WHERE text IS NOT NULL
    ),
    t2 AS (SELECT doc_id, tn FROM t WHERE len(tn) >= 24),
    pre AS (SELECT doc_id, substring(tn, 1, 12) AS k FROM t2),
    suf AS (SELECT doc_id, substring(tn, len(tn) - 11, 12) AS k FROM t2)
    SELECT s.doc_id AS head_doc, p.doc_id AS tail_doc
    FROM suf s JOIN pre p ON p.k = s.k AND p.doc_id <> s.doc_id
    """,
)
def q_boundary_overlap(spark, sf_dir):
    """Split-document detection: doc A's boundary suffix equal to doc
    B's boundary prefix flags a document pair that was probably ONE
    document cut at a shard boundary (a real crawl-pipeline artifact;
    repairing them beats deduping them).  One equi-join on the derived
    boundary key — never a substring scan — and docs shorter than 2
    keys opt out so prefix and suffix can't self-overlap.  Key width
    12 matches this testdata's short synthetic docs (production crawls
    would use 64+); the key stays raw text, not a hash — equality is
    the semantics and the join key is fixed-width either way."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = (_wide(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull()))
    t2 = (docs.select("doc_id", ws_normalized(F.col("text")).alias("tn"))
              .where(F.length("tn") >= 24))
    pre = t2.select(F.col("doc_id").alias("tail_doc"),
                    F.col("tn").substr(F.lit(1), F.lit(12)).alias("k"))
    suf = t2.select(F.col("doc_id").alias("head_doc"),
                    F.col("tn").substr(F.length("tn") - 11, F.lit(12))
                     .alias("k"))
    return (suf.join(pre, "k")
               .where(F.col("head_doc") != F.col("tail_doc"))
               .select("head_doc", "tail_doc"))


@query(
    "q_ndcg_eval",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
      WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0
    ),
    q AS (SELECT vec_id AS qid, v AS qv, label AS qlabel
          FROM e WHERE vec_id < 10),
    lc AS (SELECT label, COUNT(*) AS c FROM e GROUP BY label),
    scored AS (
      SELECT q.qid, q.qlabel, e.vec_id AS cid, e.label AS clabel,
             ROUND(list_sum(list_transform(range(1, 65),
                                           i -> e.v[i] * q.qv[i]))
                   / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(q.qv, x -> x * x)))),
                   6) AS sim
      FROM e JOIN q ON e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY sim DESC, cid) AS rnk
      FROM scored
    ),
    d AS (
      SELECT qid, qlabel,
             SUM(CASE WHEN clabel = qlabel
                      THEN CAST(1 AS DOUBLE) / log2(rnk + 1)
                      ELSE CAST(0 AS DOUBLE) END) AS dcg
      FROM ranked WHERE rnk <= 10 GROUP BY qid, qlabel
    )
    SELECT d.qid AS query_id, lc.c - 1 AS n_rel,
           ROUND(d.dcg / list_sum(list_transform(
                   range(1, LEAST(10, lc.c - 1) + 1),
                   i -> CAST(1 AS DOUBLE) / log2(CAST(i AS DOUBLE) + 1))),
                 6) AS ndcg
    FROM d JOIN lc ON lc.label = d.qlabel
    """,
)
def q_ndcg_eval(spark, sf_dir):
    """NDCG@10 retrieval evaluation over the embedding corpus: cosine
    ranking graded against label agreement — the eval-harness op that
    closes the loop on the ANN/similarity family (recall@k exists;
    NDCG adds position-weighted credit).  Ranking happens on ROUNDED
    sims with id tie-breaks (the repo's cross-engine ranking
    convention), per-query windows are WindowGroupLimit top-10, and
    the ideal-DCG denominator folds a ≤10-element sequence — the only
    broadcast is the tiny per-label count table.  Queries are a fixed
    sample; at production scale candidates come from the IVF/LSH index
    instead of the full cross join."""
    from access_mopper_spark.operators.similarity import (as_double,
                                                           cosine,
                                                           nonzero_norm)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", as_double(F.col("embedding")).alias("v"),
                   "label") \
           .where(nonzero_norm(F.col("v")))
    q = (e.where(F.col("vec_id") < 10)
          .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                  F.col("label").alias("qlabel")))
    lc = e.groupBy(F.col("label").alias("lbl")).agg(F.count("*").alias("c"))
    scored = (e.crossJoin(F.broadcast(q))
               .where(F.col("vec_id") != F.col("qid"))
               .select("qid", "qlabel", F.col("vec_id").alias("cid"),
                       F.col("label").alias("clabel"),
                       R6(cosine(F.col("v"), F.col("qv"))).alias("sim")))
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    ranked = (scored.withColumn("rnk", F.row_number().over(w))
                    .where(F.col("rnk") <= 10))
    dcg = F.sum(F.when(F.col("clabel") == F.col("qlabel"),
                       F.lit(1.0) / F.log2(F.col("rnk") + 1))
                 .otherwise(F.lit(0.0))).alias("dcg")
    d = ranked.groupBy("qid", "qlabel").agg(dcg)
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(10), F.col("c") - 1)),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1))
    return (d.join(F.broadcast(lc), F.col("lbl") == F.col("qlabel"))
             .select(F.col("qid").alias("query_id"),
                     (F.col("c") - 1).alias("n_rel"),
                     R6(F.col("dcg") / idcg).alias("ndcg")))


@query(
    "q_idf_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(text,
               '[ \t\n\r]+', ' ', 'g'), ' '), ' '), t -> t <> '') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    dt AS (
      SELECT DISTINCT doc_id, u.t AS tok
      FROM toks, UNNEST(w) AS u(t)
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM dt),
    df AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok)
    SELECT dt.doc_id, COUNT(*) AS n_types,
           ROUND(SUM(LN((CAST(n.nd AS DOUBLE) + 1) / (df.df + 1)))
                 / COUNT(*), 6) AS mean_idf
    FROM dt JOIN df ON df.tok = dt.tok CROSS JOIN n
    GROUP BY dt.doc_id
    """,
)
def q_idf_novelty(spark, sf_dir):
    """Information-density quality signal: a document's mean smoothed
    IDF over its distinct tokens — boilerplate scores low (its tokens
    appear everywhere), novel content high; the cheap complement to
    the bigram-LM score for curation blending.  Shape: one distinct
    (doc, token) pass, document frequencies as a map-combined groupBy,
    join back on the token key, per-doc aggregate — the postings-join
    skeleton the BM25 family already scales on; the corpus size is
    the only broadcast scalar."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = (_wide(load_table(spark, sf_dir, "documents"))
            .where(F.col("text").isNotNull()))
    dt = (docs.select(
            "doc_id",
            F.explode(F.array_distinct(
                F.filter(F.split(ws_normalized(F.col("text")), " ", -1),
                         lambda t: t != ""))).alias("tok")))
    n = dt.agg(F.count_distinct("doc_id").alias("nd"))
    df = dt.groupBy(F.col("tok").alias("k")).agg(F.count("*").alias("df"))
    idf = F.log((F.col("nd").cast("double") + 1) / (F.col("df") + 1))
    return (dt.join(df, F.col("k") == F.col("tok"))
              .crossJoin(F.broadcast(n))
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_types"),
                   R6(F.sum(idf) / F.count("*")).alias("mean_idf")))


def _diurnal_weights():
    import math
    s = [math.sin(2 * math.pi * h / 24) for h in range(24)]
    c = [math.cos(2 * math.pi * h / 24) for h in range(24)]
    return s, c


def _diurnal_oracle():
    s, c = _diurnal_weights()
    scase = " ".join(f"WHEN {h} THEN CAST({s[h]!r} AS DOUBLE)"
                     for h in range(24))
    ccase = " ".join(f"WHEN {h} THEN CAST({c[h]!r} AS DOUBLE)"
                     for h in range(24))
    return f"""
    WITH e AS (
      SELECT event_type,
             EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS h,
             CAST(FLOOR(COALESCE(value, 0) * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    m AS (
      SELECT event_type, h, SUM(cents) AS sc, COUNT(*) AS n
      FROM e GROUP BY event_type, h
    )
    SELECT event_type, SUM(n) AS n_events,
           ROUND(SUM((CAST(sc AS DOUBLE) / n / 100)
                     * CASE h {scase} ELSE 0 END), 6) AS b1,
           ROUND(SUM((CAST(sc AS DOUBLE) / n / 100)
                     * CASE h {ccase} ELSE 0 END), 6) AS c1
    FROM m GROUP BY event_type
    """


@query("q_diurnal_spectrum", oracle=_diurnal_oracle())
def q_diurnal_spectrum(spark, sf_dir):
    """First-harmonic DFT of the hourly activity profile per event
    type: project the 24 hourly mean values onto sin/cos at period 24h
    — the one-number seasonality diagnostic (|{b1,c1}| ≈ 0 means flat
    load; large means a daily cycle with phase atan2(b1,c1)).  The 24
    sin/cos weights are Python-repr literals baked into BOTH the Spark
    plan and the oracle SQL (the md5-parity-JL trick), so no libm
    divergence between engines can reach the hash; hourly means come
    from integer-cent sums.  Two map-combined groupBys; the second is
    24 rows per type."""
    s, c = _diurnal_weights()
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100
                    + F.lit(0.5)).cast("long")
    m = (ev.select("event_type", F.hour("ts").alias("h"), cents.alias("cents"))
           .groupBy("event_type", "h")
           .agg(F.sum("cents").alias("sc"), F.count("*").alias("n")))
    mean = F.col("sc").cast("double") / F.col("n") / 100
    sw = F.element_at(F.array(*[F.lit(v) for v in s]), F.col("h") + 1)
    cw = F.element_at(F.array(*[F.lit(v) for v in c]), F.col("h") + 1)
    return (m.groupBy("event_type")
             .agg(F.sum("n").alias("n_events"),
                  R6(F.sum(mean * sw)).alias("b1"),
                  R6(F.sum(mean * cw)).alias("c1")))


@query(
    "q_cms_merge_law",
    oracle=r"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'), ' '),
               ' ')) AS term
      FROM documents
    ),
    pairs AS (
      SELECT source, term, g.d,
             ('0x' || substring(md5('cms' || g.d || ':' || term), 1, 8))::BIGINT
               % 512 AS bucket
      FROM toks, generate_series(0, 3) g(d)
    ),
    per_src AS (
      SELECT source, d, bucket, COUNT(*) AS cnt
      FROM pairs GROUP BY source, d, bucket
    ),
    merged AS (
      SELECT d, bucket, SUM(cnt) AS cnt FROM per_src GROUP BY d, bucket
    ),
    truth AS (SELECT term, COUNT(*) AS true_count FROM toks GROUP BY term),
    probes AS (
      SELECT t.term, g.d,
             ('0x' || substring(md5('cms' || g.d || ':' || t.term), 1, 8))::BIGINT
               % 512 AS bucket
      FROM (SELECT DISTINCT term FROM toks) t, generate_series(0, 3) g(d)
    ),
    est AS (
      SELECT p.term, MIN(COALESCE(m.cnt, 0)) AS est_count
      FROM probes p LEFT JOIN merged m USING (d, bucket)
      GROUP BY p.term
    )
    SELECT e.term, t.true_count, e.est_count
    FROM est e JOIN truth t USING (term)
    ORDER BY t.true_count DESC, e.term
    LIMIT 20
    """,
)
def q_cms_merge_law(spark, sf_dir):
    """CMS merge law, end-to-end: build one sketch PER SOURCE, merge
    them by cell-wise counter addition (``cms_merge``), and estimate
    from the merged sketch — estimates must equal the single global
    sketch's exactly (counter addition is exact integer math), which
    is the property that lets per-day/per-corpus sketches combine at
    100 TB without rescanning anything.  The per-source stage is one
    grouped count keyed by (source, d, bucket); the merge is a second
    tiny aggregate over depth×width×n_sources rows."""
    from access_mopper_spark.operators.search import tokens as tok_fn
    from access_mopper_spark.operators.sketch import cms_estimate
    from access_mopper_spark.operators.sketch import _bucket
    docs = _wide(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(tok_fn(portable_lower(F.col("text")))).alias("term"))
    pairs = toks.select("source", F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"), _bucket(F.col("term"), d, 512, "cms"))
        for d in range(4)])).alias("__c")) \
        .select("source", "__c.d", "__c.bucket")
    per_src = (pairs.groupBy("source", "d", "bucket")
                    .agg(F.count("*").alias("cnt")))
    merged = per_src.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
    est = cms_estimate(merged, toks, "term", depth=4, width=512)
    truth = toks.groupBy("term").agg(F.count("*").alias("true_count"))
    return (truth.join(est, "term")
            .orderBy(F.col("true_count").desc(), F.col("term"))
            .limit(20)
            .select("term", "true_count", "est_count"))


@query(
    "q_active_days_histogram",
    oracle="""
    WITH ad AS (
      SELECT user_id,
             COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_days
      FROM events GROUP BY user_id
    )
    SELECT n_days, COUNT(*) AS n_users FROM ad GROUP BY n_days
    """,
)
def q_active_days_histogram(spark, sf_dir):
    """Engagement distribution: users by number of distinct active
    days — the DAU-stickiness histogram.  Two map-combined groupBys
    (per-user distinct-day count, then the histogram); output
    cardinality is bounded by the date span, so the result is
    driver-safe at any user count.  Integer-only."""
    ev = load_table(spark, sf_dir, "events")
    ad = (ev.groupBy("user_id")
            .agg(F.count_distinct(F.to_date("ts")).alias("n_days")))
    return ad.groupBy("n_days").agg(F.count("*").alias("n_users"))


@query(
    "q_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    e AS (
      SELECT e.user_id, CAST(CAST(e.ts AS TIMESTAMP) AS DATE) AS day,
             f.first_day
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT day,
           COUNT(DISTINCT CASE WHEN day = first_day THEN user_id END)
             AS new_users,
           COUNT(DISTINCT CASE WHEN day > first_day THEN user_id END)
             AS returning_users,
           COUNT(*) AS n_events
    FROM e GROUP BY day
    """,
)
def q_new_vs_returning(spark, sf_dir):
    """Daily new-vs-returning decomposition: each day's distinct users
    split by whether it is their first active day.  The first-day
    table is keyed by user and joins back on the SAME key its groupBy
    just shuffled on (no new exchange); day cells ship as DATE per
    the repo's hash convention.  Integer-only output."""
    ev = load_table(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id")
                .agg(F.min(F.to_date("ts")).alias("first_day")))
    e = (ev.select("user_id", F.to_date("ts").alias("day"))
           .join(firsts, "user_id"))
    return (e.groupBy("day")
             .agg(F.count_distinct(
                      F.when(F.col("day") == F.col("first_day"),
                             F.col("user_id"))).alias("new_users"),
                  F.count_distinct(
                      F.when(F.col("day") > F.col("first_day"),
                             F.col("user_id"))).alias("returning_users"),
                  F.count("*").alias("n_events")))


@query(
    "q_quantile_sketch",
    oracle="""
    WITH e AS (
      SELECT event_type,
             GREATEST(CAST(FLOOR(COALESCE(value, 0) * 100 + 0.5) AS BIGINT),
                      0) AS cents
      FROM events
    ),
    b AS (
      SELECT event_type, LENGTH(BIN(cents + 1)) - 1 AS bucket,
             COUNT(*) AS cnt
      FROM e GROUP BY event_type, bucket
    ),
    c AS (
      SELECT event_type, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM b
    )
    SELECT event_type, MAX(n) AS n_events,
           MIN(CASE WHEN cum * 2 >= n THEN (1::BIGINT << bucket) - 1 END)
             AS p50_lo_cents,
           MIN(CASE WHEN cum * 20 >= 19 * n THEN (1::BIGINT << bucket) - 1 END)
             AS p95_lo_cents
    FROM c GROUP BY event_type
    """,
)
def q_quantile_sketch(spark, sf_dir):
    """Mergeable quantile sketch: a log2-bucket histogram (bucket =
    bit-length of the non-negative integer cents (clamped at 0 so a
    negative value can't produce a 64-bit two's-complement bucket),
    computed via BIN string length —
    exact integer math, no libm) whose per-group counters merge by
    addition like CMS/HLL; quantiles read off as the lower edge of
    the first bucket whose INTEGER cumulative count crosses the rank
    target (cum·2 ≥ n for P50, cum·20 ≥ 19n for P95) — no float
    anywhere, so the estimate is bit-identical on any engine and
    under any merge order.  One grouped count + one ≤64-row window
    per group; the sketch is ~64 counters per key at any data size."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.greatest(
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100
                + F.lit(0.5)).cast("long"), F.lit(0).cast("long"))
    b = (ev.select("event_type", cents.alias("cents"))
           .withColumn("bucket", F.length(F.bin(F.col("cents") + 1)) - 1)
           .groupBy("event_type", "bucket")
           .agg(F.count("*").alias("cnt")))
    wc = (W.partitionBy("event_type").orderBy("bucket")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    wn = W.partitionBy("event_type")
    c = (b.withColumn("cum", F.sum("cnt").over(wc))
          .withColumn("n", F.sum("cnt").over(wn)))
    edge = (F.lit(1).cast("long") * F.pow(F.lit(2.0), F.col("bucket"))
            .cast("long") - 1)
    return (c.groupBy("event_type")
             .agg(F.max("n").alias("n_events"),
                  F.min(F.when(F.col("cum") * 2 >= F.col("n"), edge))
                   .alias("p50_lo_cents"),
                  F.min(F.when(F.col("cum") * 20 >= 19 * F.col("n"), edge))
                   .alias("p95_lo_cents")))


@query(
    "q_first_touch_attribution",
    oracle="""
    WITH u AS (
      SELECT user_id,
             ARG_MIN(event_type,
                     printf('%020d|%012d', epoch_us(ts), event_id))
               AS first_touch,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    )
    SELECT first_touch, COUNT(*) AS n_users,
           COUNT(*) FILTER (WHERE converted = 1) AS n_converted
    FROM u GROUP BY first_touch
    """,
)
def q_first_touch_attribution(spark, sf_dir):
    """First-touch attribution: each user's acquisition channel is the
    event_type of their earliest event (tie-broken on event_id so the
    argmin is total), credited with whether the user ever purchased.
    Both the argmin and the converted flag come out of ONE user-keyed
    groupBy via ``min_by(type, key)`` over a zero-padded
    ``epoch_us|event_id`` string key (lexicographic = numeric, and this
    DuckDB build's ``arg_min`` takes scalar keys only) — no window, no
    second scan — then a 5-row channel rollup.  At 100 TB this is one
    user-hash shuffle with map-side partial aggregation; the channel
    re-agg is vocabulary-sized.  Integer-only output.  Mirrors the
    reference's per-entity earliest-record dispatch
    (mopper/setup_utils.py first-file selection), generalized to
    marketing-style attribution."""
    ev = load_table(spark, sf_dir, "events")
    key = F.format_string("%020d|%012d",
                          F.unix_micros("ts"), F.col("event_id"))
    u = (ev.groupBy("user_id")
           .agg(F.min_by("event_type", key).alias("first_touch"),
                F.max(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).alias("converted")))
    return (u.groupBy("first_touch")
             .agg(F.count("*").alias("n_users"),
                  F.count(F.when(F.col("converted") == 1, F.lit(1)))
                   .alias("n_converted")))


@query(
    "q_peak_hour",
    oracle="""
    WITH h AS (
      SELECT event_type, EXTRACT(hour FROM ts)::BIGINT AS hr,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, hr
    )
    SELECT event_type,
           ARG_MAX(hr, cnt * 100 - hr) AS peak_hr,
           MAX(cnt) AS peak_cnt,
           SUM(cnt)::BIGINT AS n_events
    FROM h GROUP BY event_type
    """,
)
def q_peak_hour(spark, sf_dir):
    """Peak activity hour per event type: hour-of-day histogram then a
    total-ordered argmax (max count, smallest hour among ties, encoded
    as the scalar key ``cnt*100 − hr`` — hr < 24 < 100 keeps the two
    orders non-interfering, and scalar because this DuckDB build's
    ``arg_max`` rejects struct keys).  Two shuffles, the second over ≤ types×24 rows;
    at scale the hour histogram is the only data-sized agg and it
    map-side combines.  Integer-only output (counts + hour), so the
    cross-engine hash cannot flip on floats or timestamp rendering —
    the repo's post-r4 hash-proof-by-construction convention."""
    ev = load_table(spark, sf_dir, "events")
    h = (ev.select("event_type", F.hour("ts").cast("long").alias("hr"))
           .groupBy("event_type", "hr")
           .agg(F.count("*").alias("cnt")))
    return (h.groupBy("event_type")
             .agg(F.max_by("hr", F.col("cnt") * 100 - F.col("hr"))
                   .alias("peak_hr"),
                  F.max("cnt").alias("peak_cnt"),
                  F.sum("cnt").cast("long").alias("n_events")))


@query(
    "q_last_touch",
    oracle="""
    WITH o AS (
      SELECT event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id
               ORDER BY printf('%020d|%012d', epoch_us(ts), event_id))
               AS prev_type
      FROM events
    )
    SELECT COALESCE(prev_type, 'none') AS last_touch,
           COUNT(*) AS n_purchases
    FROM o WHERE event_type = 'purchase' GROUP BY last_touch
    """,
)
def q_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's
    immediately preceding event (LAG over a user-partitioned window
    ordered by the total ``epoch_us|event_id`` key; first-session
    purchases credit 'none').  The window is user-keyed — fully
    parallel, no global sort — and the rollup after the purchase
    filter is vocabulary-sized.  Integer-only counts.  Companion to
    q_first_touch_attribution; together they bracket the standard
    attribution models."""
    ev = load_table(spark, sf_dir, "events")
    key = F.format_string("%020d|%012d",
                          F.unix_micros("ts"), F.col("event_id"))
    w = W.partitionBy("user_id").orderBy(key)
    o = ev.select("event_type",
                  F.lag("event_type").over(w).alias("prev_type"))
    return (o.where(F.col("event_type") == "purchase")
             .groupBy(F.coalesce("prev_type", F.lit("none"))
                       .alias("last_touch"))
             .agg(F.count("*").alias("n_purchases")))


@query(
    "q_lang_confusion",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             (length(p) - length(replace(p, ' the ', ''))) / 5.0
               + (length(p) - length(replace(p, ' and ', ''))) / 5.0
               + (length(p) - length(replace(p, ' of ', ''))) / 4.0 AS s_en,
             (length(p) - length(replace(p, ' le ', ''))) / 4.0
               + (length(p) - length(replace(p, ' la ', ''))) / 4.0
               + (length(p) - length(replace(p, ' et ', ''))) / 4.0 AS s_fr,
             (length(p) - length(replace(p, ' der ', ''))) / 5.0
               + (length(p) - length(replace(p, ' und ', ''))) / 5.0
               + (length(p) - length(replace(p, ' die ', ''))) / 5.0 AS s_de,
             (length(p) - length(replace(p, ' el ', ''))) / 4.0
               + (length(p) - length(replace(p, ' los ', ''))) / 5.0
               + (length(p) - length(replace(p, ' y ', ''))) / 3.0 AS s_es
      FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p
            FROM documents) t
    ),
    g AS (
      SELECT COALESCE(lang, '<null>') AS gold,
             CASE WHEN s_en = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'en'
                  WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'fr'
                  WHEN s_de = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'de'
                  WHEN s_es = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'es'
                  ELSE 'und' END AS guessed
      FROM scored
    )
    SELECT gold, guessed, COUNT(*) AS n_docs
    FROM g GROUP BY gold, guessed
    """,
)
def q_lang_confusion(spark, sf_dir):
    """Classifier-evaluation confusion matrix: the corpus's gold lang
    label crossed with the marker-word language guess
    (functions/text.lang_guess — the same replace-difference scoring
    q_lang_guess already proves cross-engine-exact).  One map-side
    scoring pass + one tiny (≤ langs²) grouped count; NULL gold labels
    bucket as '<null>' and NULL text guesses 'und' on both engines.
    Integer-only output."""
    from access_mopper_spark.functions.text import lang_guess

    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        F.coalesce("lang", F.lit("<null>")).alias("gold"),
        lang_guess(F.col("text")).alias("guessed"))
    return g.groupBy("gold", "guessed").agg(F.count("*").alias("n_docs"))


@query(
    "q_dup_rate_by_length",
    oracle="""
    WITH d AS (
      SELECT (LENGTH(BIN(LENGTH(text) + 1)) - 1)::BIGINT AS len_bucket,
             COUNT(*) OVER (
               PARTITION BY md5(regexp_replace(lower(text),
                                               '[^a-z0-9]', '', 'g'))
             ) AS fam
      FROM documents WHERE text IS NOT NULL
    )
    SELECT len_bucket, COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE fam > 1) AS dup_docs
    FROM d GROUP BY len_bucket
    """,
)
def q_dup_rate_by_length(spark, sf_dir):
    """Curation diagnostic: exact-duplicate share per log2 document-
    length bucket (short boilerplate duplicates at far higher rates
    than long-form text, and this is the histogram that shows it).
    Family size comes from ONE fingerprint-partitioned window count
    (the md5-normalized fingerprint of functions/text.fingerprint;
    raw lengths can differ within a family, so the bucket stays
    per-doc), then an integer ≤64-bucket rollup; NULL text is
    excluded on both engines rather than fingerprint-grouped.
    Bucket = bit-length via BIN string length — exact integer math,
    same recipe as q_quantile_sketch.  Integer-only output."""
    docs = load_table(spark, sf_dir, "documents")
    d = (docs.where(F.col("text").isNotNull())
             .select((F.length(F.bin(F.length("text") + 1)) - 1)
                      .cast("long").alias("len_bucket"),
                     F.md5(F.regexp_replace(portable_lower(F.col("text")),
                                            "[^a-z0-9]", ""))
                      .alias("fp")))
    fam = F.count("*").over(W.partitionBy("fp"))
    return (d.withColumn("fam", fam)
             .groupBy("len_bucket")
             .agg(F.count("*").alias("n_docs"),
                  F.count(F.when(F.col("fam") > 1, F.lit(1)))
                   .alias("dup_docs")))


