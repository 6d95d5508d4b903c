"""One-pass table profiling — the ANALYZE-style statistics pass a
curation pipeline runs before choosing partition counts, join
strategies, and dedup thresholds (the reference's mopdb does the same
job ad hoc per mapping CSV: row counts + per-variable domains before
CMORisation planning; see SURVEY.md §2.1 catalog scans).

Design for 100 TB:

* ONE pass over the data.  Every per-column statistic (non-null count,
  distinct count, numeric min/max, string min/max) is an aggregate
  expression in a SINGLE ``agg`` call.  Multiple exact COUNT(DISTINCT)
  columns compile to one Expand + two-level hash aggregate — still a
  single scan, with map-side partial aggregation; the row multiplier is
  #profiled-columns, which AQE handles like any other widened map
  stage.
* ``approx=True`` swaps exact COUNT(DISTINCT) for HyperLogLog++
  (``approx_count_distinct``) — no Expand, pure map-side sketch merge,
  the right mode at petabyte scale where ±2% on distinct counts is
  fine.  Exact mode is the oracle-checked one (HLL estimates are
  engine-specific).
* min/max ship TYPED, never stringified doubles: numeric columns (incl.
  timestamps as epoch-µs, dates as epoch-days) land in ``min_num`` /
  ``max_num`` DOUBLE columns, string columns in ``min_str``/``max_str``
  — min/max are selections, not sums, so the values are exact and
  engine-portable (no float-formatting dialect surface).
* The wide 1-row aggregate unpivots to the tidy (column, stats) layout
  with a JVM-side ``stack`` — no Python, no second job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NUM_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double")


def _num_view(col, dtype: str):
    """Numeric projection of a column for min/max: numbers cast double,
    timestamps to epoch-µs, dates to epoch-days; None if non-numeric."""
    if dtype in _NUM_TYPES or dtype.startswith("decimal"):
        return col.cast("double")
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if dtype == "date":
        return F.datediff(col, F.lit("1970-01-01").cast("date")) \
                .cast("double")
    return None


def profile_table(df: DataFrame, cols: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """Tidy per-column profile: ``(column, n_rows, n_null, n_distinct,
    min_num, max_num, min_str, max_str)`` — one row per profiled
    column, computed in ONE scan (see module docstring).

    ``n_distinct`` excludes NULL (SQL COUNT(DISTINCT) semantics); NULL
    presence is reported separately by ``n_null``.  ``approx=True``
    uses HyperLogLog++ for ``n_distinct`` (scale mode, not
    oracle-comparable)."""
    dtypes = dict(df.dtypes)
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        # quote + double embedded backticks: bare F.col(c)/df[c] parse
        # backticks in quirky column names as quoting syntax (r8 ADVICE)
        col = F.col(f"`{c.replace('`', '``')}`")
        nd = (F.approx_count_distinct(col) if approx
              else F.countDistinct(col))
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0))
             .cast("long").alias(f"__null__{c}"),
            nd.cast("long").alias(f"__nd__{c}"),
        ]
        num = _num_view(col, dtypes[c])
        if num is not None:
            aggs += [F.min(num).alias(f"__min__{c}"),
                     F.max(num).alias(f"__max__{c}")]
        else:
            aggs += [F.lit(None).cast("double").alias(f"__min__{c}"),
                     F.lit(None).cast("double").alias(f"__max__{c}")]
        if dtypes[c] == "string":
            aggs += [F.min(col).alias(f"__mins__{c}"),
                     F.max(col).alias(f"__maxs__{c}")]
        else:
            aggs += [F.lit(None).cast("string").alias(f"__mins__{c}"),
                     F.lit(None).cast("string").alias(f"__maxs__{c}")]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        # injection-safe interpolation: SQL string literals double
        # embedded single quotes, backtick identifiers double embedded
        # backticks (a quirky column name must not produce a malformed
        # or mislabeled stack() expression, r8 ADVICE)
        lbl = c.replace("'", "''")
        bt = c.replace("`", "``")
        stack_args += [f"'{lbl}'", f"`__null__{bt}`", f"`__nd__{bt}`",
                       f"`__min__{bt}`", f"`__max__{bt}`",
                       f"`__mins__{bt}`", f"`__maxs__{bt}`"]
    stacked = wide.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(f"stack({len(cols)}, {', '.join(stack_args)}) AS "
               "(column, n_null, n_distinct, min_num, max_num, "
               "min_str, max_str)"))
    return stacked.select("column", "n_rows", "n_null", "n_distinct",
                          "min_num", "max_num", "min_str", "max_str")


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                fp_col: str = "fp") -> DataFrame:
    """Snapshot diff between two corpus versions — the governance
    readout before promoting a refreshed crawl: how many documents were
    added, removed, changed (same id, different content fingerprint),
    or carried unchanged.

    Both sides project to (id, fingerprint) — at 100 TB the fingerprint
    column should be a precomputed digest (md5 of the content), so the
    full-outer equi-join on id carries two slim columns and hashes both
    snapshots by the same key.  ONE join + one map-side-combined
    aggregate; all-integer output, one row per status."""
    # presence is decided by explicit flags, NOT fingerprint nullness —
    # a row present in both snapshots with a NULL fp on one side must
    # read 'changed', not 'added'/'removed'; fp equality is null-safe
    # so two NULL fps compare as unchanged
    o = old.select(F.col(id_col).alias("__id"),
                   F.col(fp_col).alias("__fo"),
                   F.lit(True).alias("__po"))
    n = new.select(F.col(id_col).alias("__id"),
                   F.col(fp_col).alias("__fn"),
                   F.lit(True).alias("__pn"))
    j = o.join(n, "__id", "full_outer")
    status = (F.when(F.col("__po").isNull(), F.lit("added"))
              .when(F.col("__pn").isNull(), F.lit("removed"))
              .when(F.col("__fo").eqNullSafe(F.col("__fn")),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return (j.select(status.alias("status"))
            .groupBy("status").agg(F.count("*").alias("n_docs")))
