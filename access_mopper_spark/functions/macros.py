"""Domain-function macro registry for the calc DSL.

The reference's mapping rows call named functions (``plevinterp(var[0],
var[1], 24)``, ``level_to_height(var[0])`` — docs/customising.rst:58-76).
In this engine those names resolve to DataFrame-transformer macros via
``CalcContext.macros``; the compiler hands them the parsed arguments and
they take over the plan (functions/calc_dsl.py ``_call``).

``default_macros()`` wires the shipped operator pack under the
reference's names, so a mapping catalog written for the reference
executes unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: CMIP standard pressure levels (get_plev, calculations.py:829-844) —
#: the plev19 set, hPa→Pa.
PLEV19 = [100000.0, 92500.0, 85000.0, 70000.0, 60000.0, 50000.0, 40000.0,
          30000.0, 25000.0, 20000.0, 15000.0, 10000.0, 7000.0, 5000.0,
          3000.0, 2000.0, 1000.0, 500.0, 100.0]


def plevinterp_macro(ctx, var_col: Column, pres_col: Column, levnum=19):
    """``plevinterp(var[0], var[1], 24)`` — interpolate var from model
    levels to fixed pressure levels using the pressure field, per column
    group (every dim except the level dim)."""
    targets = PLEV19 if int(levnum) == 19 else PLEV19[: int(levnum)]

    def tf(df: DataFrame) -> DataFrame:
        from access_mopper_spark.operators.interp import interp_at_targets
        group = [d for d in ctx.dim_cols if d != "lev" and d in df.columns]
        pts = df.select(*group, pres_col.alias("__x"), var_col.alias("__y"))
        return interp_at_targets(pts, group, "__x", "__y", targets,
                                 out_x="plev", out_y="value")

    return tf


def level_to_height_macro(ctx, var_col: Column):
    """``level_to_height(var[0])`` — relabel the lev dimension to height
    via the model-levels table joined in by the caller as ``height_m``."""
    def tf(df: DataFrame) -> DataFrame:
        keep = [d for d in ctx.dim_cols if d != "lev" and d in df.columns]
        return df.select(*keep, F.col("height_m"), var_col.alias("value"))

    return tf


def topsoil_macro(ctx, var_col: Column, n_levels=3, frac=0.343):
    """``topsoil(var[0])`` (calculations.py:649-663): sum the first
    ``n_levels`` soil levels, scale the last by ``frac``."""
    def tf(df: DataFrame) -> DataFrame:
        keep = [d for d in ctx.dim_cols if d != "lev" and d in df.columns]
        w = F.when(F.col("lev") < n_levels - 1, 1.0) \
             .when(F.col("lev") == n_levels - 1, frac).otherwise(0.0)
        return df.groupBy(*keep).agg(F.sum(var_col * w).alias("value"))

    return tf


def ocean_surface_macro(ctx, var_col: Column):
    """``ocean_surface(var[0])`` (app_functions.py:448-450): level 0."""
    def tf(df: DataFrame) -> DataFrame:
        keep = [d for d in ctx.dim_cols if d != "lev" and d in df.columns]
        return df.where(F.col("lev") == 0).select(*keep, var_col.alias("value"))

    return tf


def default_macros() -> dict:
    return {
        "plevinterp": plevinterp_macro,
        "level_to_height": level_to_height_macro,
        "topsoil": topsoil_macro,
        "ocean_surface": ocean_surface_macro,
    }
