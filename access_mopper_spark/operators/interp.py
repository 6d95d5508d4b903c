"""Vertical-level interpolation — the reference's flagship numeric kernel.

``plevinterp`` (calculations.py:855-923) interpolates a variable from
model levels to fixed pressure levels: per column (time,y,x), run
``np.interp(plev, pres(t,y,x,:), var(t,y,x,:))`` — vectorized through
``xr.apply_ufunc(..., dask='parallelized')`` (kernel ``pointwise_interp``,
calculations.py:847-851).

Two Spark formulations, validated against each other and DuckDB:

- :func:`plevinterp_pandas` — grouped Arrow-batched pandas UDF running
  the literal ``np.interp`` per column group.  This is the faithful
  kernel; Arrow batching keeps the Python boundary amortized, and the
  shuffle key (the column dims) distributes evenly at any scale.
- :func:`interp_at_targets` — pure-SQL bracketing: broadcast the target
  levels, conditional min/max aggregates find the bracketing samples,
  a linear blend computes the value.  No Python at all; preferable when
  the target list is small (the CMIP case: 19 pressure levels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plevinterp_pandas(df: DataFrame, group_cols: list[str], x_col: str, y_col: str,
                      targets: list[float], out_x: str = "plev",
                      out_y: str = "value") -> DataFrame:
    """np.interp per column group, streamed through ``mapInPandas``.

    NOT ``applyInPandas``: that issues one Python call per group, which
    collapses when groups are small and numerous (a (time,y,x) column key
    at climate resolution is millions of tiny groups).  Instead the data
    is hash-partitioned on the group key and sorted within partitions, so
    each Arrow batch carries thousands of whole groups; the kernel loops
    groups inside the batch and carries the (possibly split) trailing
    group over to the next batch.  Python cost amortizes to one IPC per
    ~10k rows instead of one per group — at any scale.

    Output: one row per (group, target); x need not be pre-sorted
    (partition sort handles np.interp's increasing-x contract)."""
    import numpy as np
    import pandas as pd

    schema_parts = []
    for c in group_cols:
        schema_parts.append(f"{c} {dict(df.dtypes)[c]}")
    schema_parts.append(f"{out_x} double")
    schema_parts.append(f"{out_y} double")
    schema = ", ".join(schema_parts)
    tgt = np.asarray(targets, dtype="float64")
    nt = len(tgt)

    def interp_block(block: pd.DataFrame) -> pd.DataFrame:
        keys, xs = [], block[x_col].to_numpy(dtype="float64")
        ys = block[y_col].to_numpy(dtype="float64")
        # group boundaries over the sorted block (no pandas groupby loop)
        gvals = [block[c].to_numpy() for c in group_cols]
        change = np.zeros(len(block), dtype=bool)
        change[0] = True
        for gv in gvals:
            change[1:] |= gv[1:] != gv[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(block))
        out_vals = np.empty(len(starts) * nt, dtype="float64")
        for i, (s, e) in enumerate(zip(starts, ends)):
            out_vals[i * nt:(i + 1) * nt] = np.interp(tgt, xs[s:e], ys[s:e])
        data = {c: np.repeat(gv[starts], nt) for c, gv in zip(group_cols, gvals)}
        data[out_x] = np.tile(tgt, len(starts))
        data[out_y] = out_vals
        return pd.DataFrame(data)

    def run(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # the trailing group may continue in the next batch — hold it
            last = pdf.iloc[-1]
            eq = np.ones(len(pdf), dtype=bool)
            for c in group_cols:
                eq &= (pdf[c].to_numpy() == last[c])
            tail = int(np.argmin(eq[::-1])) if not eq.all() else len(pdf)
            split = len(pdf) - tail
            head, carry = pdf.iloc[:split], pdf.iloc[split:]
            if len(head):
                yield interp_block(head)
        if carry is not None and len(carry):
            yield interp_block(carry)

    part = (df.select(*group_cols, x_col, y_col)
            .repartition(*group_cols)
            .sortWithinPartitions(*group_cols, x_col))
    return part.mapInPandas(run, schema)


def interp_at_targets(df: DataFrame, group_cols: list[str], x_col: str, y_col: str,
                      targets: list[float], out_x: str = "plev",
                      out_y: str = "value") -> DataFrame:
    """Pure-SQL np.interp: broadcast targets × conditional-aggregate
    bracketing × linear blend.  Exactly np.interp semantics: clamp to
    endpoint values outside the sample range."""
    tgt = F.explode(F.array(*[F.lit(float(t)) for t in targets])).alias(out_x)
    spark = df.sparkSession
    targets_df = spark.range(1).select(tgt)

    x, y, t = F.col(x_col).cast("double"), F.col(y_col).cast("double"), F.col(out_x)
    joined = df.select(*group_cols, x.alias("__x"), y.alias("__y")) \
               .crossJoin(F.broadcast(targets_df))
    xx, yy = F.col("__x"), F.col("__y")
    agg = joined.groupBy(*group_cols, out_x).agg(
        F.max(F.when(xx <= t, xx)).alias("lox"),
        F.max_by(yy, F.when(xx <= t, xx)).alias("loy"),
        F.min(F.when(xx > t, xx)).alias("hix"),
        F.min_by(yy, F.when(xx > t, xx)).alias("hiy"),
    )
    blended = (
        F.when(F.col("lox").isNull(), F.col("hiy"))
        .when(F.col("hix").isNull(), F.col("loy"))
        .otherwise(F.col("loy") + (F.col("hiy") - F.col("loy"))
                   * ((t - F.col("lox")) / (F.col("hix") - F.col("lox"))))
    )
    return agg.select(*group_cols, out_x, blended.alias(out_y))
