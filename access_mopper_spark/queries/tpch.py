"""TPC-H: all 22 classic shapes adapted to the driver tables.

Split from the monolithic queries.py registry (r9 verdict item 6):
same @query registrations, byte-identical bodies; shared helpers
live in queries._core.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403
from access_mopper_spark.queries.clusters_search import _DEDUP_CLUSTERS_ORACLE  # noqa: F401


# =====================================================================
# TPC-H join/agg shapes not yet in the registry: Q9/Q10/Q14/Q15/Q16/
# Q18/Q19/Q22 adapted to the driver's columns (no partsupp table, no
# l_commitdate/l_shipmode — the JOIN/AGG shape is what each row proves,
# cf. SURVEY.md §2.3/§2.4; the reference's own joins are the catalog
# equi/tiered matches in mopdb/utils.py, already covered — these rows
# extend the SQL-analytics surface the way q_volume_shipping (Q7) and
# q_correlated_subquery (Q17) already do).
# =====================================================================

@query(
    "q_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           YEAR(CAST(l.l_shipdate AS TIMESTAMP)) AS o_year,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                    AS BIGINT)) AS profit_cents
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, YEAR(CAST(l.l_shipdate AS TIMESTAMP))
    """,
)
def q_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit, minus the partsupp cost leg
    this testdata lacks): fact⋈3 filtered dims grouped by (nation,
    year).  The p_name LIKE filter prunes the part dim BEFORE the join
    (Catalyst pushes it below the broadcast exchange), all three dims
    broadcast, and the grouped money sum snaps to integer cents so the
    hash is summation-order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100 + F.lit(0.5)).cast("long")
    return (li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
              .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
              .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
              .groupBy(F.col("n_name").alias("nation"),
                       F.year("l_shipdate").alias("o_year"))
              .agg(F.sum(cents).alias("profit_cents")))


@query(
    "q_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                    AS BIGINT)) AS rev_cents
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY rev_cents DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): the 'which customers
    returned the most last quarter' top-k over a 4-table join.  The
    returnflag filter pushes to the lineitem scan, the orderdate window
    prunes orders before its join, customer/nation broadcast, and the
    final top-20 is TakeOrdered (partial top-k, no global sort) with a
    custkey tie-break so the cut is deterministic."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1998-07-01"))
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100 + F.lit(0.5)).cast("long")
    return (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
              .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
              .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
              .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
              .agg(F.sum(cents).alias("rev_cents"))
              .orderBy(F.desc("rev_cents"), "c_custkey")
              .limit(20))


@query(
    "q_promo_revenue",
    oracle="""
    SELECT SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                    * 100 + 0.5) AS BIGINT) ELSE 0 END)
             AS promo_cents,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                    AS BIGINT)) AS total_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-02-01'
    """,
)
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): conditional share of revenue
    from PROMO-type parts in one ship month.  Emits the numerator and
    denominator as integer cents instead of the classic 100*x/y float —
    the ratio is derivable, the hash surface is integer-only (the
    q_corpus_report recipe), and the plan is the same: date-window scan,
    broadcast part join, one conditional aggregate, single output row."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01"))
    p = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100 + F.lit(0.5)).cast("long")
    return (li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
              .agg(F.sum(F.when(F.col("p_type") == "PROMO", cents)
                          .otherwise(F.lit(0))).alias("promo_cents"),
                   F.sum(cents).alias("total_cents")))


@query(
    "q_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                      AS BIGINT)) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM rev r JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
    """,
)
def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): the revenue 'view' reused twice —
    once for the per-supplier quarter totals, once reduced to the global
    max — then an equality join back.  Integer-cents revenue makes the
    max-equality exact (the classic float formulation can drop the true
    top supplier to summation-order noise); the rev table is persisted
    so the scan+agg runs once, the 1-row max broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01"))
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100 + F.lit(0.5)).cast("long")
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
             .agg(F.sum(cents).alias("total_cents"))).persist()
    mx = rev.agg(F.max("total_cents").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    out = (rev.crossJoin(F.broadcast(mx))
              .where(F.col("total_cents") == F.col("mx"))
              .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
              .select("s_suppkey", "s_name", "total_cents"))
    return out


@query(
    "q_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 9, 19, 29, 39, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 50
    """,
)
def q_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship) over the lineitem
    association (this testdata has no partsupp): distinct-supplier
    counts per (brand, type, size) bucket, excluding flagged suppliers
    via NOT IN → broadcast anti-join.  The size IN-list and type
    predicate prune the part dim before its broadcast; COUNT(DISTINCT)
    is Spark's two-phase partial-distinct aggregate (no row explosion);
    deterministic full tie-break on the top-50 cut."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 9, 19, 29, 39, 49))
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
              .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                    "left_anti")
              .groupBy("p_brand", "p_type", "p_size")
              .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
              .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
              .limit(50))


@query(
    "q_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 180
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
           CAST(b.sum_qty AS BIGINT) AS sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customer): orders whose line
    quantities sum past a threshold, joined back to orders+customer.
    The HAVING pre-aggregate shrinks the fact side BEFORE any join
    (~20% of orders at the 180 threshold), the filtered key set then
    drives the orders join; quantities in this data are integral
    doubles so the BIGINT cast is exact; day-grain key ships as DATE
    not TIMESTAMP (the q_max_concurrency timezone lesson)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
             .agg(F.sum("l_quantity").alias("sq"))
             .where(F.col("sq") > 180))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
               .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
               .select("c_custkey", "c_name", "o_orderkey",
                       F.col("o_orderdate").cast("date").alias("o_orderdate"),
                       F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                        .cast("long").alias("total_cents"),
                       F.col("sq").cast("long").alias("sum_qty")))


@query(
    "q_discounted_brand_revenue",
    oracle="""
    SELECT SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                    AS BIGINT)) AS rev_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_discounted_brand_revenue(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue): three OR'd predicate
    brackets mixing part attributes (brand, size) with lineitem
    attributes (quantity) across the join.  Catalyst extracts the
    common single-side conjuncts (brand IN-list, size ≤ 35, quantity ≤
    30 bounds) below the join and evaluates the residual disjunction
    post-join — the standard disjunctive-pushdown test.  Output is one
    integer-only row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    br = (((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(1, 11))
          | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
             & F.col("l_quantity").between(10, 20))
          | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
             & F.col("l_quantity").between(20, 30)))
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100 + F.lit(0.5)).cast("long")
    return j.where(br).agg(F.sum(cents).alias("rev_cents"),
                           F.count("*").alias("n_lines"))


@query(
    "q_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS bal_cents
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
)
def q_dormant_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape (global-sales-opportunity): customers with
    above-average positive balance and NO recent orders — a global
    scalar subquery plus NOT EXISTS anti-join, grouped by nation.
    (Classic Q22 keys on phone prefix and all-time orders; this data
    has every customer ordering, so the anti-join keys on the recent
    window instead — same decorrelated shape.)  The scalar avg reduces
    to ONE broadcast row, the anti-join's right side is the pre-filtered
    recent orderkey set, balances snap to integer cents."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    recent = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"))
    return (c.crossJoin(F.broadcast(avg_bal))
             .where(F.col("c_acctbal") > F.col("ab"))
             .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
             .groupBy("c_nationkey")
             .agg(F.count("*").alias("numcust"),
                  F.sum(F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
                        .cast("long")).alias("bal_cents")))


@query(
    "q_triangle_counts",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      WHERE l1.l_quantity > 25 AND l2.l_quantity > 25
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.a = e1.b
      JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT node, COUNT(*) AS triangles FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ) GROUP BY node
    """,
)
def q_triangle_counts(spark, sf_dir):
    """Per-part triangle counts in the co-purchase graph (parts bought
    together in one order, both in volume) — the graph-structure metric
    (clustering, community density) run over association graphs.

    The Spark side is ``operators/graph.triangle_counts``: DEGREE
    ORIENTATION, so wedge fan-out is bounded by oriented out-degree
    ≤ √(2m) and the hot-hub quadratic blowup of the naive a<b<c
    double-join cannot happen at 100 TB.  The oracle deliberately IS
    the naive formulation (exact and fine at oracle scale) — the two
    different algorithms agreeing on every per-node count is the
    strongest check.  Edge build is one orderkey self-join (≤13 lines
    per order, bounded fan-out); output is integer-only."""
    from access_mopper_spark.operators.graph import triangle_counts
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey"))
    # basket-built canonical pair set (one scan + two shuffles; the old
    # orderkey self-join + operator-side distinct cost two scans and
    # four) — persisted because the operator reads it twice (degree agg
    # + orientation join)
    pairs = copurchase_pairs(li).persist()
    pairs.count()  # eager: degree agg + orientation join race otherwise
    out = triangle_counts(pairs, assume_canonical=True)
    return eager_release(out, pairs, out)


@query(
    "q_similarity_join_exact",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'),
                               ' '), ' ') AS w
      FROM documents WHERE text IS NOT NULL
    ),
    tok AS (
      SELECT DISTINCT doc_id AS id,
             array_to_string(w[g.i : g.i + 2], ' ') AS tok
      FROM t, (SELECT UNNEST(range(1, (SELECT COALESCE(MAX(len(w)), 1)
                                       FROM t) + 1)) AS i) g
      WHERE g.i <= greatest(len(w) - 2, 1)
        AND array_to_string(w[g.i : g.i + 2], ' ') <> ''
    ),
    sz AS (SELECT id, COUNT(*) AS s FROM tok GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
           CAST(sa.s + sb.s - i AS BIGINT) AS uni
    FROM inter
    JOIN sz sa ON sa.id = id_a
    JOIN sz sb ON sb.id = id_b
    WHERE CAST(i AS DOUBLE) >= CAST(0.8 AS DOUBLE)
                               * CAST(sa.s + sb.s - i AS DOUBLE)
    """,
)
def q_similarity_join_exact(spark, sf_dir):
    """Exact-threshold Jaccard set-similarity self-join (AllPairs/PPJoin
    prefix filtering, `operators/dedup.prefix_filter_join`) at t=0.8
    over 3-word SHINGLE sets — the guaranteed-recall complement to
    MinHash-LSH dedup.  Shingles, not words: this corpus has ~31
    distinct words, so word-set Jaccard is degenerate (nearly every
    pair qualifies — measured 6.5M candidate pairs at sf0.1, output
    itself quadratic); order-sensitive shingles restore selectivity
    (25 true pairs at sf0.01).  The oracle is the brute-force
    all-pairs shingle join (exact at oracle scale); the Spark side
    only ever joins on each document's rare-shingle prefix plus the
    PPJoin length filter — the two formulations agreeing on every
    (pair, inter, uni) proves the filter loses no pair.  Integer-only
    output."""
    from access_mopper_spark.operators.dedup import prefix_filter_join
    docs = _wide(load_table(spark, sf_dir, "documents"))
    return prefix_filter_join(docs, "text", "doc_id", threshold=0.8,
                              shingle_k=3)


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled fixed-round peel as a WITH chain (DuckDB has recursive
    CTEs, but unrolling keeps the oracle the same bounded computation
    the Spark side runs — no convergence-order ambiguity).  Every stage
    is AS MATERIALIZED: DuckDB inlines plain CTEs, so the 3-references-
    per-round chain re-evaluates the base self-join ~3^rounds times —
    the same exponential blowup the Spark side dodges with
    localCheckpoint (measured: 324 s inlined → sub-second materialized
    at sf0.01)."""
    parts = ["""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT LEAST(l1.l_partkey, l2.l_partkey) AS a,
                      GREATEST(l1.l_partkey, l2.l_partkey) AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey
       AND l1.l_partkey <> l2.l_partkey
      WHERE l1.l_quantity > 25 AND l2.l_quantity > 25
    )"""]
    prev = "e0"
    for i in range(1, rounds + 1):
        parts.append(f""",
    d{i} AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}
      ) GROUP BY node
    ),
    k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k}),
    e{i} AS MATERIALIZED (
      SELECT e.a, e.b FROM {prev} e
      JOIN k{i} x ON x.node = e.a
      JOIN k{i} y ON y.node = e.b
    )""")
        prev = f"e{i}"
    parts.append(f"""
    SELECT node, deg FROM (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}
      ) GROUP BY node
    ) WHERE deg >= {k}""")
    return "".join(parts)


@query("q_k_core", oracle=_kcore_oracle(k=18, rounds=5))
def q_k_core(spark, sf_dir):
    """18-core of the co-purchase part graph after 5 fixed peel rounds
    (`operators/graph.k_core_peel`) — the dense-community extraction
    step (spam rings, template families, co-occurrence cliques) of
    graph-shaped curation.  The oracle is the SAME bounded peel
    unrolled as a 5-stage CTE chain, so both engines run an identical
    deterministic computation; outputs are integer (node, deg).  Each
    Spark round is one degree shuffle + two semi-joins; nothing
    collects."""
    from access_mopper_spark.operators.graph import k_core_peel
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey"))
    # basket-built canonical pair set straight into the operator's
    # round-0 checkpoint — the old directed self-join emitted every
    # edge twice and paid an extra canonicalizing distinct
    return k_core_peel(copurchase_pairs(li), k=18, rounds=5,
                       assume_canonical=True)


_LEAKFREE_SPLIT_ORACLE = f"""
    WITH clusters AS ({_DEDUP_CLUSTERS_ORACLE})
    SELECT doc_id, cluster_id,
           CASE WHEN substring(md5('split1:' || CAST(cluster_id AS VARCHAR)),
                               1, 8) < '1999999a'
                THEN 'holdout' ELSE 'train' END AS split
    FROM clusters
"""


@query("q_leakage_free_split", oracle=_LEAKFREE_SPLIT_ORACLE)
def q_leakage_free_split(spark, sf_dir):
    """Group-disjoint train/holdout split: documents are first clustered
    by near-duplicate connected components (q_dedup_clusters' min-label
    propagation), then the SPLIT DECISION hashes the CLUSTER id, not the
    document id — so no near-duplicate family ever straddles the
    boundary and the holdout cannot be contaminated by paraphrases of
    training docs (the eval-leakage failure mode doc-level hashing
    cannot prevent).  ~10% holdout via the repo's portable md5-hex
    threshold (deterministic_sample convention: membership is a pure
    function of the id — no RNG, engine/cluster-size invariant,
    map-only after the cluster labels exist)."""
    from access_mopper_spark.operators.dedup import dedup_clusters, near_dup_pairs
    docs = load_table(spark, sf_dir, "documents")
    pairs = near_dup_pairs(docs, "text", "doc_id", n_hashes=6, band_size=2,
                           shingle_k=3, jaccard_threshold=0.5,
                           shingle_kind="word")
    clusters = dedup_clusters(pairs, docs.select("doc_id"))
    digest = F.md5(F.concat(F.lit("split1:"),
                            F.col("cluster_id").cast("string")))
    return clusters.select(
        "doc_id", "cluster_id",
        F.when(F.substring(digest, 1, 8) < "1999999a", F.lit("holdout"))
         .otherwise(F.lit("train")).alias("split"))


@query(
    "q_embedding_covariance",
    oracle="""
    WITH src AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (
      SELECT UNNEST(range(1, (SELECT MAX(len(v)) FROM src) + 1)) AS i
    ),
    el AS (
      SELECT vec_id, CAST(i - 1 AS INT) AS i, v[i] AS x
      FROM src CROSS JOIN dims
    )
    SELECT a.i AS i, b.i AS j, ROUND(SUM(a.x * b.x), 6) AS s
    FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
)
def q_embedding_covariance(spark, sf_dir):
    """Uncentered 64×64 second-moment (Gram) matrix of the embedding
    corpus in ONE distributed pass (`operators/similarity.
    embedding_covariance`) — the PCA/whitening input.  Each Arrow batch
    reduces to a dim² partial via one BLAS GEMM, so the shuffle carries
    2080 scalars per partition REGARDLESS of row count; the oracle is
    the exploded (row, i, j) self-join — quadratic in dim and shuffle-
    heavy, exactly the formulation the operator exists to avoid, which
    makes the agreement the point.  Upper triangle only (symmetric)."""
    from access_mopper_spark.operators.similarity import embedding_covariance
    emb = _wide(load_table(spark, sf_dir, "embeddings"))
    cov = embedding_covariance(emb, dim=64)
    return cov.select("i", "j", R6(F.col("s")).alias("s"))


@query(
    "q_random_projection",
    oracle="""
    WITH src AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (
      SELECT UNNEST(range(1, (SELECT MAX(len(v)) FROM src) + 1)) AS i
    ),
    ks AS (SELECT UNNEST(range(0, 8)) AS k),
    m AS (
      SELECT CAST(i AS INT) AS i, CAST(k AS INT) AS k,
             CASE WHEN strpos('02468ace',
                    substring(md5('rp0:' || CAST(i - 1 AS VARCHAR) || ':'
                                  || CAST(k AS VARCHAR)), 1, 1)) > 0
                  THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS sgn
      FROM dims CROSS JOIN ks
    )
    SELECT s.vec_id, m.k,
           ROUND(SUM(s.v[m.i] * m.sgn)
                 * (CAST(1 AS DOUBLE) / SQRT(CAST(8 AS DOUBLE))), 6) AS y
    FROM src s CROSS JOIN m
    GROUP BY s.vec_id, m.k
    """,
)
def q_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss projection 64→8 with a DETERMINISTIC
    Achlioptas ±1 matrix from md5 parity (`operators/similarity.
    random_projection`): no RNG state, so the projection is a pure
    function of (seed, i, k) that any engine and any task retry
    regenerates identically — the md5-threshold convention
    (deterministic_sample) lifted to matrices.  Spark bakes the
    bounded 64×8 sign matrix into the plan as literals (map-only,
    JVM-side fold per output coordinate, no shuffle); the oracle
    regenerates the same matrix IN SQL and replays the contraction as
    an explode-join.  Long (vec_id, k, y) output."""
    from access_mopper_spark.operators.similarity import random_projection
    emb = _wide(load_table(spark, sf_dir, "embeddings"))
    rp = random_projection(emb, dim=64, out_dim=8, seed="rp0")
    pairs = ", ".join(f"{k}, y{k}" for k in range(8))
    return rp.select(
        "vec_id",
        F.expr(f"stack(8, {pairs}) AS (k, y)")
    ).select("vec_id", F.col("k").cast("int").alias("k"),
             R6(F.col("y")).alias("y"))


def _lpa_oracle(rounds: int) -> str:
    """Unrolled deterministic label propagation (min label among modal
    neighbour labels), every stage MATERIALIZED (same exponential-
    inlining hazard as the k-core oracle)."""
    parts = ["""
    WITH und AS MATERIALIZED (
      SELECT DISTINCT LEAST(l1.l_partkey, l2.l_partkey) AS a,
                      GREATEST(l1.l_partkey, l2.l_partkey) AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey
       AND l1.l_partkey <> l2.l_partkey
      WHERE l1.l_quantity > 40 AND l2.l_quantity > 40
    ),
    sym AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM und
      UNION ALL SELECT b, a FROM und
    ),
    lab0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS lbl FROM sym
    )"""]
    prev = "lab0"
    for i in range(1, rounds + 1):
        parts.append(f""",
    v{i} AS MATERIALIZED (
      SELECT e.src AS node, l.lbl, COUNT(*) AS c
      FROM sym e JOIN {prev} l ON l.node = e.dst
      GROUP BY e.src, l.lbl
    ),
    lab{i} AS MATERIALIZED (
      SELECT node, FIRST(lbl ORDER BY c DESC, lbl ASC) AS lbl
      FROM v{i} GROUP BY node
    )""")
        prev = f"lab{i}"
    parts.append(f"""
    SELECT node, lbl AS label FROM {prev}""")
    return "".join(parts)


@query("q_label_propagation", oracle=_lpa_oracle(rounds=3))
def q_label_propagation(spark, sf_dir):
    """Deterministic synchronous label propagation (3 rounds) on the
    high-volume co-purchase graph (`operators/graph.label_propagation`)
    — community detection for entity/template families.  Ties on the
    modal neighbour label break toward the smallest label on BOTH
    engines (struct max_by / ARG_MAX on (count, -label)), which is
    what makes plain LPA — normally randomized — oracle-replayable.
    The quantity > 40 cut thins the graph so communities are
    non-trivial (the >25 graph is near-complete and collapses to one
    label).  Integer-only output."""
    from access_mopper_spark.operators.graph import label_propagation
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_quantity") > 40)
          .select("l_orderkey", "l_partkey"))
    l2 = li.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_partkey").alias("b"))
    edges = (li.join(l2, (F.col("l_orderkey") == F.col("o2"))
                     & (F.col("l_partkey") != F.col("b")))
               .select(F.col("l_partkey").alias("a"), "b"))
    return label_propagation(edges, rounds=3)


@query(
    "q_feature_hash_tf",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'), ' ') AS tn
      FROM documents WHERE text IS NOT NULL
    ),
    tok AS (
      SELECT doc_id, UNNEST(string_split(tn, ' ')) AS w
      FROM t WHERE tn <> ''
    )
    SELECT doc_id,
           substring(md5('fh0:' || w), 1, 2) AS bucket,
           COUNT(*) AS tf
    FROM tok GROUP BY doc_id, bucket
    """,
)
def q_feature_hash_tf(spark, sf_dir):
    """Hashing-trick TF vectorization (256 buckets): token → bucket =
    first two hex chars of md5('fh0:' || token) — sparse model-free
    features for dedup/classification at corpus scale.  Buckets stay
    STRINGS (the repo's portable-hash convention: both engines md5
    identically, and no portable hex→int cast exists); multiplicity is
    preserved (term frequency, not set membership).  One explode + one
    map-side-combined groupBy — the vectorizer is embarrassingly
    parallel and the output is integer counts keyed by (doc, bucket)."""
    from access_mopper_spark.functions.text import ws_normalized
    docs = _wide(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(ws_normalized(F.col("text")), " ", -1),
                           lambda t: t != "")).alias("w"))
    bucket = F.substring(F.md5(F.concat(F.lit("fh0:"), F.col("w"))), 1, 2)
    return (toks.groupBy("doc_id", bucket.alias("bucket"))
                .agg(F.count("*").alias("tf")))


# =====================================================================
# TPC-H completion: the remaining 7 of the 22 classic shapes (Q2/Q4/Q6/
# Q8/Q12/Q20/Q21), adapted to the driver's columns the same way the
# round-5 batch was (no partsupp, no l_commitdate/l_receiptdate/
# l_shipmode — the JOIN/AGG/EXISTS shape is what each row proves).
# With these, every TPC-H query class has a registry analog.
# =====================================================================

@query(
    "q_min_cost_supplier",
    oracle="""
    WITH sp AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'SMALL' AND p.p_size < 10
    ),
    mn AS (
      SELECT sp.l_partkey AS p_key, MIN(s.s_acctbal) AS min_bal
      FROM sp JOIN supplier s ON s.s_suppkey = sp.l_suppkey
      GROUP BY sp.l_partkey
    ),
    best AS (
      SELECT sp.l_partkey AS p_key, MIN(s.s_suppkey) AS best_supp
      FROM sp
      JOIN supplier s ON s.s_suppkey = sp.l_suppkey
      JOIN mn ON mn.p_key = sp.l_partkey AND s.s_acctbal = mn.min_bal
      GROUP BY sp.l_partkey
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
           CAST(FLOOR(s.s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM best b
    JOIN part p     ON p.p_partkey = b.p_key
    JOIN supplier s ON s.s_suppkey = b.best_supp
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    """,
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): the correlated
    'supplier with the minimum cost for each qualifying part' pick,
    with the part⋈supplier relationship derived from lineitem (this
    testdata has no partsupp) and s_acctbal standing in for
    ps_supplycost.  The part filter prunes BEFORE the fact join
    (broadcast), the per-part argmin is one map-side-combinable
    ``min_by`` over a (acctbal, suppkey) struct — deterministic under
    ties — and supplier/nation broadcast.  No window, no self-join:
    the classic correlated-subquery formulation becomes a single
    grouped argmin, which is the shape that survives a 100× fact
    table."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where((F.col("p_type") == "SMALL") & (F.col("p_size") < 10)))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sp = (li.join(F.broadcast(p.select("p_partkey", "p_name")),
                  F.col("p_partkey") == F.col("l_partkey"))
            .select("p_partkey", "p_name", "l_suppkey").distinct())
    j = sp.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
    pick = F.min_by(
        F.struct("s_name", "s_nationkey", "s_acctbal"),
        F.struct(F.col("s_acctbal").alias("a"), F.col("s_suppkey").alias("k")))
    best = (j.groupBy("p_partkey", "p_name").agg(pick.alias("b"))
             .select("p_partkey", "p_name", F.col("b.s_name").alias("s_name"),
                     F.col("b.s_nationkey").alias("s_nationkey"),
                     F.col("b.s_acctbal").alias("s_acctbal")))
    return (best.join(F.broadcast(n),
                      F.col("n_nationkey") == F.col("s_nationkey"))
                .select("p_partkey", "p_name", "s_name",
                        F.col("n_name").alias("nation"),
                        F.floor(F.col("s_acctbal") * 100 + F.lit(0.5))
                         .cast("long").alias("acctbal_cents")))


@query(
    "q_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q_order_priority_check(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): EXISTS decorrelated to
    a LEFT SEMI join with a non-equi residual (l_shipdate more than 60
    days after o_orderdate).  The quarter filter pushes to the orders
    scan; the semi join shuffles on o_orderkey only (no payload from
    lineitem crosses the exchange, and duplicates never materialize —
    the property EXISTS needs).  Orders grows with SF, so the semi
    join is NOT force-broadcast; AQE picks the strategy per scale."""
    o = (load_table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1997-04-01")))
    li = load_table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")))
    return (o.join(li, cond, "left_semi")
             .groupBy("o_orderpriority")
             .agg(F.count("*").alias("order_count")))


@query(
    "q_forecast_revenue",
    oracle="""
    SELECT SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5)
                    AS BIGINT)) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape (forecasting-revenue change): the pure
    scan-filter-aggregate — every predicate reaches the parquet scan
    (PushedFilters on shipdate/discount/quantity), zero joins, one
    map-side-combined global sum.  Money snaps to integer cents
    per-row before summing so the single-row hash is summation-order
    free."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100
                     + F.lit(0.5)).cast("long"))
    return (li.where((F.col("l_shipdate") >= "1997-01-01")
                     & (F.col("l_shipdate") < "1998-01-01")
                     & (F.col("l_discount") >= 0.05)
                     & (F.col("l_discount") <= 0.07)
                     & (F.col("l_quantity") < 24))
              .agg(F.sum(cents).alias("revenue_cents"),
                   F.count("*").alias("n_items")))


@query(
    "q_market_share",
    oracle="""
    SELECT YEAR(o.o_orderdate) AS o_year,
           SUM(CASE WHEN sn.n_name = 'NATION_7'
                    THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                    * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS nation_cents,
           SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                    AS BIGINT)) AS total_cents
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
    JOIN region r    ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
    GROUP BY YEAR(o.o_orderdate)
    """,
)
def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): NATION_7 suppliers'
    share of revenue among ASIA-region customers, per order year.
    The region filter prunes the customer side through two broadcast
    dims BEFORE the fact joins; the only shuffle is lineitem⋈orders on
    the order key (customer/nation/region/supplier all broadcast).
    Share is emitted as the (numerator, denominator) integer-cent pair
    — hash-proof, and the ratio is a trivial post-step — instead of a
    float division."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = (load_table(spark, sf_dir, "region")
         .where(F.col("r_name") == "ASIA"))
    s = load_table(spark, sf_dir, "supplier")
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    cust = (c.join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
             .join(F.broadcast(r), F.col("r_regionkey") == F.col("cn_region"))
             .select("c_custkey"))
    cents = (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                     * 100 + F.lit(0.5)).cast("long"))
    return (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
              .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
              .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
              .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
              .groupBy(F.year("o_orderdate").alias("o_year"))
              .agg(F.sum(F.when(F.col("supp_nation") == "NATION_7", cents)
                          .otherwise(F.lit(0))).alias("nation_cents"),
                   F.sum(cents).alias("total_cents")))


@query(
    "q_ship_delay_priority",
    oracle="""
    SELECT CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) < 30
                THEN 'fast'
                WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) < 90
                THEN 'medium' ELSE 'slow' END AS ship_bucket,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_bucket
    """,
)
def q_ship_delay_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipping modes / order priority): priority mix
    per shipping-delay bucket (this testdata has no l_shipmode or
    l_receiptdate — days from order to ship stands in).  One big-big
    equi-join on the order key (the Q12 shape), shipdate window pushed
    to the fact scan, integer-only output.  Both engines see
    midnight-aligned timestamps, so the day diff is exact."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1997-01-01")
                 & (F.col("l_shipdate") < "1998-01-01")))
    o = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (F.when(delay < 30, "fast")
               .when(delay < 90, "medium").otherwise("slow"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
              .groupBy(bucket.alias("ship_bucket"))
              .agg(F.sum(F.when(high, 1).otherwise(0))
                    .alias("high_line_count"),
                   F.sum(F.when(high, 0).otherwise(1))
                    .alias("low_line_count")))


@query(
    "q_part_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%blue%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 50)
    """,
)
def q_part_promotion(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers who moved
    a significant quantity of qualifying parts — the nested
    IN-subquery chain decorrelated to aggregate → LEFT SEMI join.
    The part-name filter prunes via broadcast before the fact agg; the
    per-(supplier, part) quantity sum is map-side combinable; the
    supplier dim is probed with a semi join so qualifying suppliers
    appear exactly once.  Quantities are integral doubles, so the sum
    and threshold are exact on both engines."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1997-01-01")
                 & (F.col("l_shipdate") < "1998-01-01")))
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_name").like("%blue%")))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    qualified = (li.join(F.broadcast(p.select("p_partkey")),
                         F.col("p_partkey") == F.col("l_partkey"))
                   .groupBy("l_suppkey", "l_partkey")
                   .agg(F.sum("l_quantity").alias("qty"))
                   .where(F.col("qty") > 50)
                   .select("l_suppkey").distinct())
    return (s.join(qualified, F.col("l_suppkey") == F.col("s_suppkey"),
                   "left_semi")
             .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
             .select("s_suppkey", "s_name", F.col("n_name").alias("nation")))


@query(
    "q_waiting_suppliers",
    oracle="""
    WITH ls AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    po AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
      FROM ls GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM ls
    JOIN po ON po.l_orderkey = ls.l_orderkey
    JOIN supplier s ON s.s_suppkey = ls.l_suppkey
    WHERE ls.late = 1 AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS + NOT-EXISTS double self-join rewritten as ONE grouped pass
    — per (order, supplier) a late flag (shipped >90 days after the
    order; this testdata has no commit/receipt dates), per order the
    supplier and late counts, then 'this supplier late, others
    involved, no other supplier late'.  The classic formulation
    shuffles lineitem three times; this shape shuffles it once on
    l_orderkey and reuses that partitioning for both the per-order
    rollup and the flag⋈rollup join (no new exchange — same-key
    aggregations chain).  Top-10 is TakeOrdered with a name
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderstatus") == "F"))
    s = load_table(spark, sf_dir, "supplier")
    late = F.when(F.col("l_shipdate")
                  > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                  1).otherwise(0)
    ls = (li.join(o.select("o_orderkey", "o_orderdate"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("l_orderkey", "l_suppkey")
            .agg(F.max(late).alias("late")))
    po = (ls.groupBy(F.col("l_orderkey").alias("po_key"))
            .agg(F.count("*").alias("n_supp"), F.sum("late").alias("n_late")))
    return (ls.join(po, F.col("po_key") == F.col("l_orderkey"))
              .where((F.col("late") == 1) & (F.col("n_supp") > 1)
                     & (F.col("n_late") == 1))
              .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
              .groupBy("s_name").agg(F.count("*").alias("numwait"))
              .orderBy(F.desc("numwait"), F.asc("s_name")).limit(10))


