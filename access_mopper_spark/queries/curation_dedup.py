"""Beyond-reference training-data operators: dedup, similarity, text analysis.

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403


# =====================================================================
# Beyond-reference: training-data pipeline operators (dedup, similarity,
# text analysis) — SURVEY.md §7.1 step 8 / BASELINE.json north star
# =====================================================================

@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized-text fingerprint. One
    shuffle on md5 keys — uniform, skew-free at any scale."""
    from access_mopper_spark.operators.dedup import exact_dedup
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


@query(
    "q_fingerprint",
    oracle="""
    SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
    FROM documents
    """,
)
def q_fingerprint(spark, sf_dir):
    """Document fingerprinting (md5 over normalized text) — pure Column,
    byte-identical across engines."""
    from access_mopper_spark.functions.text import fingerprint
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@query(
    "q_minhash_band",
    oracle="""
    WITH sh AS (
      SELECT d.doc_id, substring(d.text, g.i, 5) AS s
      FROM documents d, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(length(text)), 1) FROM documents) + 1)) AS i) g
      WHERE g.i <= greatest(length(d.text) - 4, 1)
    )
    SELECT doc_id,
           MIN(substring(md5('seed0:' || s), 1, 8)) AS minhash_0,
           MIN(substring(md5('seed0:' || s), 9, 8)) AS minhash_1,
           MIN(substring(md5('seed0:' || s), 17, 8)) AS minhash_2,
           MIN(substring(md5('seed0:' || s), 25, 8)) AS minhash_3
    FROM sh GROUP BY doc_id
    """,
)
def q_minhash_band(spark, sf_dir):
    """MinHash signatures over 5-char shingles: min of seeded md5 strings
    (min of hex ≡ min of 128-bit ints; portable, no RNG state). Shingling
    is sequence+transform — narrow, no explode, no UDF."""
    from access_mopper_spark.operators.dedup import minhash_signature
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signature(docs, "text", n_hashes=4, shingle_k=5)
    return sig.select("doc_id", "minhash_0", "minhash_1", "minhash_2", "minhash_3")


@query(
    "q_near_dup_pairs",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g'), ' '), ' ') AS w FROM documents),
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
                    md5(m4 || '|' || m5) AS b2 FROM sig),
    ids AS (
      SELECT doc_id, 0 AS bi, b0 AS bk FROM band
      UNION ALL SELECT doc_id, 1, b1 FROM band
      UNION ALL SELECT doc_id, 2, b2 FROM band
    ),
    capped AS (  -- replay the deterministic per-band candidate cap
      SELECT doc_id, bi, bk FROM (
        SELECT doc_id, bi, bk,
               row_number() OVER (PARTITION BY bi, bk ORDER BY doc_id) AS r
        FROM ids WHERE bk IS NOT NULL) WHERE r <= 64
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM capped a JOIN capped b USING (bi, bk)
      WHERE a.doc_id < b.doc_id
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS ni
      FROM cand c
      JOIN sh x ON x.doc_id = c.id_a
      JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           ROUND(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 6) AS jaccard
    FROM inter i
    JOIN cnt ca ON ca.doc_id = i.id_a
    JOIN cnt cb ON cb.doc_id = i.id_b
    WHERE CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) >= 0.5
    """,
)
def q_near_dup_pairs(spark, sf_dir):
    """MinHash-LSH near-dup detection over word 3-gram shingles:
    band-bucket join on (id, band_key) only → id-pair dedup → exact
    Jaccard verify with shingle sets re-joined by id. The cross-product
    never materializes and shingle arrays never enter the candidate
    shuffle — the properties that make this viable at 100 TB.
    band_cap=64 bounds every band bucket's pair count at 64² (duplicate
    families grow buckets quadratically with corpus replication — the
    r4 ×10 sweep's one superlinear headliner); the cap is deterministic
    (smallest ids per bucket) and the oracle replays it exactly.  An
    invariant test pins cap-large ≡ uncapped."""
    from access_mopper_spark.operators.dedup import near_dup_pairs
    docs = load_table(spark, sf_dir, "documents")
    return near_dup_pairs(docs, "text", "doc_id", n_hashes=6, band_size=2,
                          shingle_k=3, jaccard_threshold=0.5,
                          shingle_kind="word", band_cap=64)


@query(
    "q_text_quality",
    oracle="""
    WITH t AS (
      SELECT source, text,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents
    ), c AS (
      SELECT source, text,
             CASE WHEN length(tn) = 0 THEN 0
                  ELSE length(tn) - length(replace(tn, ' ', '')) + 1 END AS ntok
      FROM t
    )
    SELECT source,
           ROUND(AVG(CAST(ntok AS DOUBLE)), 6) AS avg_tokens,
           ROUND(AVG(CAST(length(text) AS DOUBLE)), 6) AS avg_chars,
           ROUND(AVG(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / nullif(ntok, 0)), 6) AS avg_word_len,
           COUNT(*) AS n_docs
    FROM c GROUP BY source
    """,
)
def q_text_quality(spark, sf_dir):
    """Quality-scoring features (token count, char count, mean word len)
    aggregated per source — the C4/Gopher-style filter signals as pure
    Column math."""
    from access_mopper_spark.functions.text import token_count
    docs = _wide(load_table(spark, sf_dir, "documents"))
    ntok = token_count(F.col("text"))
    word_len = (F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                / F.nullif(ntok, F.lit(0)))
    return docs.groupBy("source").agg(
        R6(F.avg(ntok.cast("double"))).alias("avg_tokens"),
        R6(F.avg(F.length("text").cast("double"))).alias("avg_chars"),
        R6(F.avg(word_len)).alias("avg_word_len"),
        F.count("*").alias("n_docs"),
    )


@query(
    "q_token_count",
    oracle="""
    WITH t AS (
      SELECT lang,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents
    ), c AS (
      SELECT lang,
             CASE WHEN length(tn) = 0 THEN 0
                  ELSE length(tn) - length(replace(tn, ' ', '')) + 1 END AS ntok
      FROM t
    )
    SELECT lang,
           CAST(SUM(ntok) AS BIGINT) AS total_tokens,
           ROUND(AVG(CAST(ntok AS DOUBLE)), 6) AS avg_tokens
    FROM c GROUP BY lang
    """,
)
def q_token_count(spark, sf_dir):
    """Token counting (whitespace tokenizer) rolled up per language.
    Token = maximal non-whitespace run, counted arithmetically over an
    explicit [ \\t\\n\\r] class on BOTH engines — no regex-split, no \\s
    dialect drift (the r1 driver hash-mismatch)."""
    from access_mopper_spark.functions.text import token_count
    docs = load_table(spark, sf_dir, "documents")
    ntok = token_count(F.col("text"))
    return docs.groupBy("lang").agg(
        F.sum(ntok).cast("long").alias("total_tokens"),
        R6(F.avg(ntok.cast("double"))).alias("avg_tokens"),
    )


@query(
    "q_lang_guess",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
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
      FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents) t
    )
    SELECT doc_id,
           CASE WHEN s_en = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'en'
                WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'fr'
                WHEN s_de = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'de'
                WHEN s_es = greatest(s_en, s_fr, s_de, s_es) AND greatest(s_en, s_fr, s_de, s_es) > 0 THEN 'es'
                ELSE 'und' END AS guessed_lang
    FROM scored
    """,
)
def q_lang_guess(spark, sf_dir):
    """Language-ID heuristic: marker-word occurrence scores + deterministic
    argmax. Occurrence counting via replace-difference — dialect-portable,
    exact (no fp ambiguity: length deltas are multiples of needle length)."""
    from access_mopper_spark.functions.text import lang_guess
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_guess(F.col("text")).alias("guessed_lang"))


@query(
    "q_cosine_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = 0 AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
    scored AS (
      SELECT e.vec_id,
             ROUND(
               list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
               / (sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)))
                  * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6) AS cosine_sim
      FROM embeddings e, q
      WHERE e.vec_id <> 0 AND list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) > 0
    )
    SELECT vec_id, cosine_sim, rank FROM (
      SELECT vec_id, cosine_sim,
             ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, vec_id) AS rank
      FROM scored
    ) t WHERE rank <= 5
    """,
)
def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k against a query vector: zip_with+aggregate
    dot product (JVM-side fold, no UDF), broadcast query, then
    partial_topk — per-partition local top-k and a tiny candidate merge,
    never a single-reducer global sort of the corpus.  Ranked on ROUNDED
    sims so ulp-level engine differences can't flip order; ties broken by
    id."""
    from access_mopper_spark.operators.similarity import (as_double, cosine,
                                                          partial_topk)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(as_double(F.col("embedding")).alias("qv"))
    scored = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id",
                R6(cosine(as_double(F.col("embedding")), F.col("qv"))).alias("cosine_sim"))
    )
    return partial_topk(scored, [], [F.col("cosine_sim").desc(), F.col("vec_id")], 5)


@query(
    "q_simhash",
    oracle="""
    WITH sh AS (
      -- COALESCE: NULL text fingerprints like the empty document
      SELECT DISTINCT d.doc_id, substring(COALESCE(d.text, ''), g.i, 5) AS s
      FROM documents d, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(length(text)), 1) FROM documents) + 1)) AS i) g
      WHERE g.i <= greatest(length(COALESCE(d.text, '')) - 4, 1)
    ),
    h AS (
      SELECT doc_id,
             ('0x' || substring(md5(s), 1, 8))::BIGINT AS hi,
             ('0x' || substring(md5(s), 9, 8))::BIGINT AS lo
      FROM sh
    ),
    votes AS (
      SELECT doc_id, g.b AS bit,
             SUM(CASE WHEN (((CASE WHEN g.b >= 32 THEN hi ELSE lo END)
                             >> (g.b % 32)) & 1) = 1 THEN 1 ELSE -1 END) AS v
      FROM h, generate_series(0, 63) g(b)
      GROUP BY doc_id, g.b
    ),
    packed AS (
      SELECT doc_id,
             SUM(CASE WHEN bit >= 32 AND v > 0 THEN (1::BIGINT << (bit - 32)) ELSE 0 END) AS hi_s,
             SUM(CASE WHEN bit < 32 AND v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS lo_s
      FROM votes GROUP BY doc_id
    )
    SELECT doc_id,
           lpad(to_hex(hi_s), 8, '0') || lpad(to_hex(lo_s), 8, '0') AS simhash_hex
    FROM packed
    """,
)
def q_simhash(spark, sf_dir):
    """64-bit SimHash fingerprints over distinct 5-char shingles: each
    shingle's 64 bits are two 32-bit lanes of its md5 digest (engine-
    portable — DuckDB computes the identical digest), the per-bit ±1
    vote runs as ONE Arrow-batched numpy pass, and the fingerprint is
    emitted as 16 hex chars so both engines agree bit-for-bit.  The md5
    lane choice is what upgrades this from a rows-only check to a full
    value-hash oracle."""
    from access_mopper_spark.operators.dedup import simhash64
    docs = load_table(spark, sf_dir, "documents")
    sim = simhash64(docs, "text", shingle_k=5, hash_kind="md5")
    return sim.select(
        "doc_id", F.lpad(F.hex(F.col("simhash")), 16, "0").alias("simhash_hex"))


def _ann_lsh_oracle(dim: int = 64, n_planes: int = 6, seed: int = 7,
                    k: int = 5, n_queries: int = 4,
                    final: str | None = None) -> str:
    """Generate the DuckDB oracle for q_ann_lsh: the hyperplanes are
    deterministic constants (no RNG state), so they inline into the SQL
    verbatim and DuckDB replays the ENTIRE LSH pipeline — bucketing,
    Hamming-1 probes, candidate join, rounded cosine ranking."""
    from access_mopper_spark.operators.similarity import _det_plane
    bucket_terms = []
    for p in range(n_planes):
        plane = "[" + ", ".join(repr(v) for v in _det_plane(dim, p, seed)) + "]"
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(v, {plane}) >= 0"
            f" THEN {1 << (n_planes - 1 - p)} ELSE 0 END)")
    bucket = " + ".join(bucket_terms)
    probes = ", ".join(f"xor(qb, {1 << p})" for p in range(n_planes))
    tail = final if final is not None else f"""SELECT query_id, vec_id, cosine_sim, rank FROM (
      SELECT query_id, vec_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, vec_id) AS rank
      FROM scored
    ) t WHERE rank <= {k}"""
    return f"""
    WITH b AS (
      -- zero-norm vectors carry no direction: excluded per the shared
      -- cosine-operator contract (similarity.nonzero_norm)
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0
    ),
    bk AS (SELECT vec_id, v, {bucket} AS bucket FROM b),
    q AS (
      SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM bk
      WHERE vec_id < {n_queries}
    ),
    probes AS (
      SELECT query_id, qv, unnest([qb, {probes}]) AS bucket FROM q
    ),
    scored AS (
      SELECT p.query_id, e.vec_id,
             ROUND(list_dot_product(e.v, p.qv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(p.qv, p.qv))), 6) AS cosine_sim
      FROM probes p JOIN bk e USING (bucket)
    )
    {tail}
    """


@query("q_ann_lsh", oracle=_ann_lsh_oracle())
def q_ann_lsh(spark, sf_dir):
    """Hyperplane-LSH approximate nearest neighbours (bucket + Hamming-1
    probes).  Approximate vs BRUTE FORCE, but fully deterministic given
    the seed-derived planes — so the oracle replays the same LSH
    construction in SQL (planes inlined as literals) and the driver
    hash-checks the exact candidate ranking, not just row counts.
    Recall vs brute force is separately asserted in tests."""
    from access_mopper_spark.operators.similarity import ann_lsh_topk
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 4).select(F.col("vec_id").alias("query_id"), "embedding")
    return ann_lsh_topk(emb, q, dim=64, k=5, n_planes=6)


