"""Round-10 operator additions: asymmetric containment dedup, homoglyph
skeleton dedup, and graph degree assortativity.

Each row follows the registry conventions (queries/_core.py): integer
hash surfaces where possible (basis points via DIV // parity), R6 for
the one unavoidable double, identical aliases both sides, fuzz + TZ
gates run before any driver exposure.
"""

from __future__ import annotations

from access_mopper_spark.queries._core import (  # noqa: F401
    F, W, query, R6, _wide, load_table, pround)
from access_mopper_spark.functions.text import confusable_skeleton_sql


@query(
    "q_minhash_containment",
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
    ),
    pairs AS (
      SELECT i.id_a, i.id_b, i.ni,
             CAST(ca.n AS BIGINT) AS na, CAST(cb.n AS BIGINT) AS nb
      FROM inter i
      JOIN cnt ca ON ca.doc_id = i.id_a
      JOIN cnt cb ON cb.doc_id = i.id_b
    ),
    directed AS (
      SELECT id_a AS id_sub, id_b AS id_sup,
             (CAST(ni AS BIGINT) * 10000) // na AS containment_bp
      FROM pairs WHERE na > 0
      UNION ALL
      SELECT id_b, id_a, (CAST(ni AS BIGINT) * 10000) // nb
      FROM pairs WHERE nb > 0
    )
    SELECT id_sub, id_sup, CAST(containment_bp AS BIGINT) AS containment_bp
    FROM directed WHERE containment_bp >= 8000
    """,
)
def q_minhash_containment(spark, sf_dir):
    """Directed near-containment pairs (|A∩B| / |A| over word 3-gram
    shingle sets, ≥0.8 in integer basis points) — the asymmetric
    complement to ``q_near_dup_pairs``: Jaccard misses a short doc
    fully embedded in a long one (quotes, excerpt pages,
    boilerplate-wrapped copies), containment fires at ~1.0.
    Same 100 TB shape as near_dup_pairs (operators/dedup.
    containment_pairs): banding carries only (id, band_key), pair
    materialization is bucket-bounded (band_cap=64, deterministic,
    oracle-replayed), shingle sets re-join by id for the exact verify,
    both directions emitted from ONE verified row via explode —
    never a second candidate scan."""
    from access_mopper_spark.operators.dedup import containment_pairs
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "text", "doc_id", n_hashes=6,
                             band_size=2, shingle_k=3,
                             containment_bp_threshold=8000, band_cap=64)


@query(
    "q_confusable_skeleton",
    oracle=f"""
    WITH sk AS (
      SELECT doc_id, md5({confusable_skeleton_sql('text')}) AS skeleton_fp
      FROM documents WHERE text IS NOT NULL
    )
    SELECT skeleton_fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_id
    FROM sk GROUP BY skeleton_fp
    """,
)
def q_confusable_skeleton(spark, sf_dir):
    """Homoglyph-aware skeleton dedup (functions/text.
    confusable_skeleton): docs re-spelled with Cyrillic/Greek lookalike
    codepoints or exotic spaces — the classic SEO-spam / dedup-evasion
    trick — fold to the same md5 skeleton as their ASCII originals
    (Unicode TR#39 skeleton idea over the high-frequency crawl
    confusables).  Output is every skeleton family (fp, size,
    keep_id = min doc_id) — the full surface, so the gate checks every
    doc's skeleton hash, not just the dup families (clean testdata has
    none; fuzz seeds inject them).  Pure map-side Column math
    (portable_lower + one translate + whitespace collapse) into a
    single hash-groupBy shuffle — the exact_dedup scale shape; NULL
    docs are excluded on both sides (no content, no signal)."""
    from access_mopper_spark.functions.text import confusable_skeleton
    docs = _wide(load_table(spark, sf_dir, "documents")) \
        .where(F.col("text").isNotNull())
    sk = docs.select(
        "doc_id", F.md5(confusable_skeleton(F.col("text"))).alias("skeleton_fp"))
    return (sk.groupBy("skeleton_fp")
              .agg(F.count("*").cast("long").alias("n_docs"),
                   F.min("doc_id").alias("keep_id")))


@query(
    "q_degree_assortativity",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      WHERE l1.l_quantity > 25 AND l2.l_quantity > 25
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY node
    ),
    dir AS (
      SELECT a AS x, b AS y FROM pairs
      UNION ALL SELECT b, a FROM pairs
    ),
    j AS (
      SELECT dx.d AS xd, dy.d AS yd
      FROM dir JOIN deg dx ON dx.node = dir.x
               JOIN deg dy ON dy.node = dir.y
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(xd) AS BIGINT) AS sx, CAST(SUM(yd) AS BIGINT) AS sy,
             CAST(SUM(xd * yd) AS BIGINT) AS sxy,
             CAST(SUM(xd * xd) AS BIGINT) AS sxx,
             CAST(SUM(yd * yd) AS BIGINT) AS syy
      FROM j
    )
    SELECT m AS m_directed,
           CASE WHEN sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) > 0
                THEN ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                  * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                ELSE NULL END AS assortativity
    FROM s
    """,
)
def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the co-purchase part graph (Newman 2002):
    Pearson correlation of endpoint degrees over the directed edge list
    (both directions of every undirected edge) — the graph-structure
    health metric next to q_triangle_counts / q_k_core: positive r =
    hubs link to hubs (dup-family webs), negative r = hub-and-spoke
    (boilerplate templates).  Every moment is an exact BIGINT sum (one
    edge-degree join, two shuffles total); only the final correlation
    is double math, with the IDENTICAL staged IEEE ops on both engines
    (cast-to-double per factor, then multiply/subtract/divide/sqrt) and
    a shared den>0 NULL guard, so the R6 surface cannot flip."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey"))
    e1 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("a"))
    e2 = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("b"))
    pairs = (e1.join(e2, "l_orderkey")
               .where(F.col("a") < F.col("b"))
               .select("a", "b").distinct())
    deg = (pairs.select(F.col("a").alias("node"))
                .unionAll(pairs.select(F.col("b").alias("node")))
                .groupBy("node")
                .agg(F.count("*").cast("long").alias("d")))
    direct = (pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
                   .unionAll(pairs.select(F.col("b").alias("x"),
                                          F.col("a").alias("y"))))
    j = (direct
         .join(deg.select(F.col("node").alias("x"), F.col("d").alias("xd")), "x")
         .join(deg.select(F.col("node").alias("y"), F.col("d").alias("yd")), "y"))
    s = j.agg(F.count("*").cast("long").alias("m"),
              F.sum("xd").alias("sx"), F.sum("yd").alias("sy"),
              F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
              F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
              F.sum(F.col("yd") * F.col("yd")).alias("syy"))
    md = F.col("m").cast("double")
    num = (md * F.col("sxy").cast("double")
           - F.col("sx").cast("double") * F.col("sy").cast("double"))
    vx = (md * F.col("sxx").cast("double")
          - F.col("sx").cast("double") * F.col("sx").cast("double"))
    vy = (md * F.col("syy").cast("double")
          - F.col("sy").cast("double") * F.col("sy").cast("double"))
    den = F.sqrt(vx * vy)
    return s.select(
        F.col("m").alias("m_directed"),
        F.when(den > 0, pround(num / den, 6))
         .otherwise(F.lit(None).cast("double")).alias("assortativity"))
