"""Registry-wide physical-plan audit: build (don't execute) every batch
query's plan and assert no unbounded CartesianProduct ever appears —
broadcast nested-loop joins are permitted (bounded build side: tiny
dictionaries, 1-row scalar aggregates), a shuffled cartesian never is.

Also asserts no UNPARTITIONED window runs over unbounded rows: a window
with an empty partition spec serializes the whole input through one
task.  Permitted exceptions: (a) plans where Spark pushed the rank
filter down as Partial/Final WindowGroupLimit — every partition
pre-prunes to top-k, so the final ordered pass sees ≤ partitions·k
rows; (b) the NetCDF time-axis lag in bounds derive/check — inherently
sequential over a calendar-bounded coordinate table; (c) plans whose
global top-k runs through TakeOrderedAndProject (r13 partial_topk — a
bounded per-partition heap merged at k rows), where the unpartitioned
rank window executes over the ≤ k surviving rows only."""

import re

from access_mopper_spark.queries import QUERIES

# streaming harness queries EXECUTE during construction (memory sink +
# awaitTermination) — their plan shape is covered by their own tests
STREAMING = {"q_stream_resample", "q_stateful_totals", "q_stream_curation",
             "q_stream_trending", "q_stream_sink_replay",
             "q_stream_stream_join", "q_stream_dedup_ingest",
             "q_stream_dedup_exact", "q_stream_static_join",
             "q_stream_srm"}


#: unpartitioned windows over a BOUNDED sequential axis (time
#: coordinates: cardinality = calendar length, not data volume).
#: q_seasonal_decompose's 7-day moving average runs AFTER the corpus
#: reduces to one row per day — |days| rows regardless of corpus size.
AXIS_WINDOW_OK = {"q_bounds_derive", "q_bounds_check",
                  "q_seasonal_decompose",
                  # coverage curve ranks AFTER the corpus reduces to
                  # one row per source — |sources| rows, not volume
                  "q_coverage_topk",
                  # largest-remainder ranks the same |sources|-row
                  # reduction (one row per source post-count)
                  "q_largest_remainder",
                  # BH ranks the |event_types| x 24 cell grid — domain-
                  # bounded (120 rows), never corpus row count
                  "q_benjamini_hochberg",
                  # Holm ranks the identical 120-cell p-proxy grid
                  "q_holm_bonferroni",
                  # Neyman allocation ranks remainders over the
                  # |sources| grid (one row per source post-rollup)
                  "q_stratified_neyman"}


def _unpartitioned_windows(plan: str) -> list[str]:
    out = []
    for line in plan.splitlines():
        m = re.search(r"windowspecdefinition\(([^)]*)\)", line)
        if not m:
            continue
        first = m.group(1).split(",")[0]
        # partition columns precede the ordering spec; a spec that STARTS
        # with an ordering column has no partition
        if "ASC NULLS" in first or "DESC NULLS" in first:
            out.append(line.strip()[:90])
    return out


def test_no_cartesian_product_or_global_window_in_any_query(spark, sf_dir):
    cartesian, global_windows = [], []
    for name, fn in QUERIES.items():
        if name in STREAMING:
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if name not in AXIS_WINDOW_OK and _unpartitioned_windows(plan) \
                and "WindowGroupLimit" not in plan \
                and "TakeOrderedAndProject" not in plan:
            global_windows.append(name)
    assert not cartesian, f"cartesian products in: {cartesian}"
    assert not global_windows, \
        f"unbounded single-partition windows in: {global_windows}"
