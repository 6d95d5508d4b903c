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
    """np.interp per group via applyInPandas.

    Input: tall frame with one sample per row; ``x_col`` need not be
    sorted (sorted in-kernel, matching np.interp's increasing-x
    contract).  Output: one row per (group, target)."""
    import numpy as np
    import pandas as pd

    schema_parts = []
    for c in group_cols:
        schema_parts.append(f"{c} {dict(df.dtypes)[c]}")
    schema_parts.append(f"{out_x} double")
    schema_parts.append(f"{out_y} double")
    schema = ", ".join(schema_parts)
    tgt = np.asarray(targets, dtype="float64")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col)
        xs = pdf[x_col].to_numpy(dtype="float64")
        ys = pdf[y_col].to_numpy(dtype="float64")
        vals = np.interp(tgt, xs, ys)
        out = pd.DataFrame({out_x: tgt, out_y: vals})
        for c in group_cols:
            out[c] = pdf[c].iloc[0]
        return out[group_cols + [out_x, out_y]]

    return df.select(*group_cols, x_col, y_col).groupBy(*group_cols).applyInPandas(kernel, schema)


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
