"""Registry-wide physical-plan audit: build (don't execute) every batch
query's plan and assert no unbounded CartesianProduct ever appears —
broadcast nested-loop joins are permitted (bounded build side: tiny
dictionaries, 1-row scalar aggregates), a shuffled cartesian never is."""

from access_mopper_spark.queries import QUERIES

# streaming harness queries EXECUTE during construction (memory sink +
# awaitTermination) — their plan shape is covered by their own tests
STREAMING = {"q_stream_resample", "q_stateful_totals", "q_stream_curation",
             "q_stream_trending", "q_stream_sink_replay",
             "q_stream_stream_join", "q_stream_dedup_ingest",
             "q_stream_dedup_exact", "q_stream_static_join"}


def test_no_cartesian_product_in_any_query(spark, sf_dir):
    offenders = []
    for name, fn in QUERIES.items():
        if name in STREAMING:
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"
