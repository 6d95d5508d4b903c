"""Physical-plan audits: the properties that matter at 100 TB, asserted
on the actual Catalyst output so regressions surface in CI, not on the
cluster.

- filters/projections reach the parquet scan (PushedFilters, ReadSchema)
- small dims broadcast (BroadcastHashJoin), big joins never cartesian
- scalar math stays inside WholeStageCodegen (no Python in the hot path)
"""

import contextlib
import io

from pyspark.sql import functions as F

from access_mopper_spark.queries import QUERIES


def plan_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_scan_pushdown(spark, sf_dir):
    df = QUERIES["q_scan_filter_project"](spark, sf_dir)
    plan = plan_str(df)
    assert "PushedFilters: [" in plan
    # at least one real predicate pushed, not an empty list
    assert "PushedFilters: []" not in plan
    # projection pruned to the referenced columns only
    readschema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in readschema


def test_broadcast_dim_join(spark, sf_dir):
    df = QUERIES["q_join_revenue_by_nation"](spark, sf_dir)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_range_join_not_cartesian(spark, sf_dir):
    df = QUERIES["q_range_join"](spark, sf_dir)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan
    # the equi-key carries the join; range predicate is a post-filter
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_physics_stays_in_codegen(spark, sf_dir):
    df = QUERIES["q_physics_eos"](spark, sf_dir)
    plan = plan_str(df, mode="simple")
    # '*(n)' prefixes mark WholeStageCodegen stages in simple mode
    assert "*(" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_interp_sql_no_python(spark, sf_dir):
    plan = plan_str(QUERIES["q_interp_sql"](spark, sf_dir), mode="simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_join_single_shuffle_no_cartesian(spark, sf_dir):
    plan = plan_str(QUERIES["q_asof_join"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_resample_partial_aggregation(spark, sf_dir):
    # tumbling-window agg must do map-side partial aggregation:
    # two HashAggregate levels around the exchange
    plan = plan_str(QUERIES["q_resample_hourly"](spark, sf_dir), mode="simple")
    assert plan.count("HashAggregate") >= 2


def test_line_transports_single_scan(spark, sf_dir):
    # one scan of lineitem feeding all straits — not a union of re-scans
    plan = plan_str(QUERIES["q_line_transports"](spark, sf_dir), mode="simple")
    assert plan.count("Scan parquet") == 1


def test_pricing_summary_pushes_date_filter(spark, sf_dir):
    plan = plan_str(QUERIES["q_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [" in plan


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    # AQE must be on and rewriting shuffle reads at runtime
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = QUERIES["q_pricing_summary"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()   # materialize -> final plan
    plan = plan_str(df, mode="simple")
    assert "AdaptiveSparkPlan" in plan


def test_tiered_match_single_scan_of_big_side(spark, sf_dir):
    plan = plan_str(QUERIES["q_tiered_match"](spark, sf_dir), mode="simple")
    # single-pass: the big (customer-derived) side appears once; all tier
    # dims are broadcast left joins — no anti-join rescans
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftAnti" not in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Bucketing co-locates join keys at write time: a join of two tables
    bucketed on the same key by the same bucket count needs NO exchange —
    the pre-shuffle is amortized across every later join (the 100 TB
    repeated-join strategy)."""
    from access_mopper_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a fresh metastore forgets tables but their directories persist —
    # clear the locations or the managed-table write refuses
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"/tmp/spark-warehouse/{t}", ignore_errors=True)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey") \
          .mode("overwrite").saveAsTable("b_orders")
    li.withColumnRenamed("l_orderkey", "o_orderkey") \
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey") \
      .mode("overwrite").saveAsTable("b_lineitem")
    joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    plan = plan_str(joined, mode="simple")
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
    # result is still correct
    assert joined.count() == li.count()


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """HLL sketch vs exact: the 100 TB cardinality-estimate path must
    land within its advertised error (rsd 5% default ~ allow 10%)."""
    from access_mopper_spark.sources.readers import load_table
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact")).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.10


def test_bm25_no_global_single_partition_sort(spark, sf_dir):
    """BM25 ranking must go through partial_topk: the global top-k is a
    TakeOrderedAndProject (bounded per-partition heap + k-row merge —
    r13 replaced the salted __pid double-window, which paid an extra
    full exchange), and the corpus-side plan keeps partial aggregation
    (map-side combine) around the (doc, term) shuffle.  No partition
    ever sorts its full input for the ranking."""
    df = QUERIES["q_bm25_topk"](spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert "partial_count" in plan or "HashAggregate" in plan
    # the bounded-heap top-k operator carries the ranking
    assert "TakeOrderedAndProject" in plan


def test_pii_redact_is_map_only(spark, sf_dir):
    """The PII scrub pass must not shuffle on any KEY or call Python.
    The only exchange permitted is the data-independent round-robin
    widen of a few-split local scan (ensure_min_partitions) — a keyed
    hashpartitioning exchange would mean the scrub itself shuffles."""
    df = QUERIES["q_pii_redact"](spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_pq_adc_corpus_scan_reads_codes_not_vectors(spark, sf_dir):
    """ADC search plan: the lookup table joins broadcast; no cartesian
    product; no Python evaluation anywhere."""
    df = QUERIES["q_pq_adc_topk"](spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_funnel_is_two_level_aggregate(spark, sf_dir):
    """The funnel is conditional aggregation only: no join, no window,
    exactly one data shuffle (user_id) + the final single-row reduce."""
    from access_mopper_spark.queries import QUERIES
    plan = QUERIES["q_funnel"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") <= 2
    assert "partial" in plan  # map-side combine before the user shuffle


def test_outlier_filter_data_side_no_shuffle(spark, sf_dir):
    """Per-type stats broadcast back; the event stream itself is never
    exchanged."""
    from access_mopper_spark.queries import QUERIES
    plan = QUERIES["q_outlier_filter"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    streamed = plan.split("BroadcastHashJoin", 1)[1].split("BroadcastExchange", 1)[0]
    assert "Exchange" not in streamed


def test_partitioned_layout_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned output layout + partition pruning end-to-end:
    writing events partitionBy(date) and reading with a date predicate
    must prune at the FILE INDEX (PartitionFilters), not post-scan."""
    from access_mopper_spark.sources.readers import load_table
    ev = load_table(spark, sf_dir, "events") \
        .withColumn("day", F.to_date("ts"))
    out = str(tmp_path / "by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).where(F.col("day") == "2024-01-05")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the day predicate must appear in PartitionFilters, not PushedFilters
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in pf
    want = ev.where(F.col("day") == "2024-01-05").count()
    assert back.count() == want


def test_semantic_dedup_broadcast_assign_no_cartesian(spark, sf_dir):
    """SemDedup: centroid assignment broadcasts the centroid table (the
    8-row cross shows as BroadcastNestedLoopJoin BuildRight — broadcast
    side is the bounded one); the within-cluster compare is ONE grouped
    Arrow stage (FlatMapGroupsInPandas) keyed on centroid_id — no
    all-pairs join over the corpus anywhere."""
    df = QUERIES["q_semantic_dedup"](spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "CartesianProduct" not in plan
    # every nested-loop node is the broadcast centroid seed, never a
    # corpus-side build
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "BuildRight" in line


def test_dup_ngrams_hardened_split_plan(spark, sf_dir):
    """Skew-hardened dup-ngrams: the hot-gram filter joins map-side —
    both the hot inner join and the left-anti exclusion build on the
    broadcast (bounded) side, so no occurrence shuffles on a hot key."""
    df = QUERIES["q_dup_ngrams"](spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert "CartesianProduct" not in plan
    anti = [l for l in plan.splitlines()
            if "LeftAnti" in l and "Join" in l]
    assert anti and all("BuildRight" in l for l in anti)
    assert "BroadcastHashJoin" in plan


def test_mop_process_e2e_single_python_boundary_per_stage(spark, sf_dir):
    """The e2e splice keeps Python at exactly its three honest seams
    (NetCDF decode mapInPandas, NetCDF write applyInPandas, manifest
    re-decode) — everything between is JVM: calc in codegen, one
    resample exchange, no extra Arrow hops."""
    df = QUERIES["q_mop_process_e2e"](spark, sf_dir)
    plan = plan_str(df, mode="simple")
    assert plan.count("MapInPandas") == 2          # decode + read-back
    assert plan.count("FlatMapGroupsInPandas") == 1  # the file writer
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_on_hive_layout(spark, sf_dir):
    """Dynamic partition pruning: a fact table Hive-partitioned on a
    derived key joined to a FILTERED dim must scan only the surviving
    partitions — Catalyst injects a dynamicpruning subquery into the
    fact scan at runtime.  This is the 100 TB star-join lever the
    static PushedFilters test cannot see (the pruning value is only
    known after the dim filter runs)."""
    import shutil

    from access_mopper_spark.sources.readers import load_table

    base = "/tmp/dpp_lineitem_by_month"
    shutil.rmtree(base, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem")
    (li.withColumn("ship_month",
                   F.date_format("l_shipdate", "yyyy-MM"))
       .write.partitionBy("ship_month").mode("overwrite").parquet(base))

    fact = spark.read.parquet(base)
    months = (fact.select("ship_month").distinct()
                  .withColumn("pick", F.length("ship_month")))
    dim = months.where(F.col("ship_month") <= "1995-06")
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled",
                          "true")
    try:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        joined = fact.join(dim.hint("no_broadcast_hash"), "ship_month") \
            .groupBy("ship_month").agg(F.count("*").alias("n"))
        plan = plan_str(joined, mode="formatted").lower()
        assert "dynamicpruning" in plan, plan[:4000]
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
        shutil.rmtree(base, ignore_errors=True)


def test_tpch_shapes_broadcast_dims_and_push_filters(spark, sf_dir):
    # Q9/Q10/Q19 shapes: every dimension side must broadcast (the fact
    # table never shuffles for a dim join) and the dim predicates must
    # prune below the broadcast exchange
    for q in ("q_product_profit", "q_returned_items",
              "q_discounted_brand_revenue"):
        plan = plan_str(QUERIES[q](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, q
        assert "CartesianProduct" not in plan, q
    p9 = plan_str(QUERIES["q_product_profit"](spark, sf_dir))
    # the p_name LIKE filter sits on the part scan, not post-join
    assert "PushedFilters: []" not in p9


def test_similarity_join_verify_is_array_side_not_explode(spark, sf_dir, monkeypatch):
    # the verify stage must fetch token ARRAYS per candidate pair and
    # intersect per-row — never re-explode candidates × tokens into a
    # shuffle (the 103 s sf0.1 pathology this operator was rebuilt from).
    # SPARK_GRAFT_PLAN_LAZY keeps the operator's eager release from
    # collapsing the inspectable plan to a post-checkpoint RDD scan.
    monkeypatch.setenv("SPARK_GRAFT_PLAN_LAZY", "1")
    plan = plan_str(QUERIES["q_similarity_join_exact"](spark, sf_dir))
    assert "array_intersect" in plan
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()  # the lazy path leaves the token cache


def test_feature_hash_tf_single_shuffle(spark, sf_dir):
    # explode + one map-side-combined groupBy: exactly one exchange
    plan = plan_str(QUERIES["q_feature_hash_tf"](spark, sf_dir))
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 2, plan[:2000]  # agg partial+final pair
    assert "CartesianProduct" not in plan


def test_pagerank_edge_cache_partitioned_on_join_key(spark, sf_dir):
    # The per-iteration contrib join requires HashPartitioning(src).
    # distinct() alone caches e partitioned on (src, dst) and every
    # iteration re-shuffles the FULL edge table; _pagerank_invariants
    # repartitions on src before persisting so the cached table's
    # outputPartitioning satisfies the join: in the executed
    # (non-broadcast) join plan there is NO Exchange above the edge
    # InMemoryTableScan -- the section of the plan tree printed before
    # the cached relation body is exchange-free.
    from access_mopper_spark.operators.graph import _pagerank_invariants
    edges = spark.range(2000).select(
        (F.col("id") % 53).cast("string").alias("src"),
        (F.col("id") % 17).cast("string").alias("dst"))
    e, nodes = _pagerank_invariants(edges)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        e.count()  # materialize the cache
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ranks = spark.range(53).select(
            F.col("id").cast("string").alias("src"),
            F.lit(1.0).alias("rank"))
        j = e.join(ranks, "src")
        j.write.format("noop").mode("overwrite").save()
        plan = j._jdf.queryExecution().executedPlan().toString()
        head = plan.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in head, head
        assert "Exchange" not in head, head
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for t in (e, nodes):
            t.unpersist()


def test_host_cap_window_is_rank_pushed(spark, sf_dir):
    # per-domain cap must partial-limit map-side (WindowGroupLimit) so a
    # megasite never funnels its full row set through one task's sort
    df = QUERIES["q_host_cap"](spark, sf_dir)
    plan = plan_str(df)
    assert plan.count("WindowGroupLimit") >= 2  # partial + final
    # and the web stage stays codegen Column math (no Python workers)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_and_html_stages_are_map_only(spark, sf_dir):
    # q_url_canonical: zero exchanges; q_html_strip: only the deliberate
    # _wide round-robin widen (CPU-bound text stage), never a hash shuffle
    plan = plan_str(QUERIES["q_url_canonical"](spark, sf_dir))
    assert "Exchange" not in plan
    plan = plan_str(QUERIES["q_html_strip"](spark, sf_dir))
    assert "RoundRobinPartitioning" in plan      # the widen is there
    assert "hashpartitioning" not in plan        # and nothing else shuffles
    for name in ("q_url_canonical", "q_html_strip"):
        plan = plan_str(QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_similarity_join_releases_token_cache(spark, sf_dir):
    # prefix_filter_join eagerly persists the corpus-sized tokenized
    # array table (racing-consumer rule); the r12 verdict flagged that
    # the cache was never unpersisted and outlived the query for the
    # whole session (guide §5 accumulation across an 87-row bench /
    # 463-row gate).  The operator now checkpoints its bounded pair
    # output and releases the cache before returning: after the query
    # function returns, NO CacheManager entry may remain.
    spark.catalog.clearCache()
    out = QUERIES["q_similarity_join_exact"](spark, sf_dir)
    assert out.count() >= 0  # already materialized; any action is cheap
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), \
        "q_similarity_join_exact left a persisted intermediate cached"
