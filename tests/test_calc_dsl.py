"""Calc-DSL compiler tests over the shipped mapping corpus shapes
(data/access.db mapping rows, data/mappings/master_map.csv)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from access_mopper_spark.functions.calc_dsl import (
    CalcCompileError,
    CalcContext,
    compile_calc,
)


@pytest.fixture(scope="module")
def grid(spark):
    rows = []
    for t in range(2):
        for lev in range(3):
            for lat in (-45.0, 45.0):
                rows.append({
                    "time": pd.Timestamp("2024-01-01") + pd.Timedelta(hours=t),
                    "lev": lev, "lat": lat, "lon": 10.0,
                    "var0": float(t * 10 + lev), "var1": float(lev + 1), "var2": 2.0,
                })
    return spark.createDataFrame(pd.DataFrame(rows))


def _vals(df, cols=("value",)):
    return [tuple(r[c] for c in cols) for r in df.orderBy(*[c for c in df.columns if c != "value"]).collect()]


def test_arithmetic(spark, grid):
    plan = compile_calc("var[0]+var[1]*2")
    out = plan.apply(grid)
    exp = grid.select("time", "lev", "lat", "lon",
                      (F.col("var0") + F.col("var1") * 2).alias("value"))
    assert _vals(out) == _vals(exp)


def test_unit_conversion_and_pow(spark, grid):
    plan = compile_calc("((var[0]**2+var[1]**2)**(0.5))*1e-2")
    out = plan.apply(grid).collect()
    for r in out:
        pass  # shape check; numeric check below on one row
    one = plan.apply(grid.limit(1)).first()["value"]
    src = grid.limit(1).first()
    assert one == pytest.approx(((src["var0"] ** 2 + src["var1"] ** 2) ** 0.5) * 1e-2)


def test_isel_filters_frame(spark, grid):
    plan = compile_calc("var[0].isel(lev=0)")
    out = plan.apply(grid)
    assert out.select("lev").distinct().collect()[0][0] == 0
    assert out.count() == grid.where("lev = 0").count()


def test_where_mask(spark, grid):
    plan = compile_calc("var[0].where(var[1] != 1)")
    out = plan.apply(grid)
    nulls = out.where(F.col("value").isNull()).count()
    assert nulls == grid.where("var1 = 1").count()


def test_fillna_and_astype(spark, grid):
    plan = compile_calc("var[0].where(var[1] != 1).fillna(0).astype(int)")
    out = plan.apply(grid)
    assert dict(out.dtypes)["value"] == "bigint"
    assert out.where(F.col("value").isNull()).count() == 0


def test_reduction_sum_dim(spark, grid):
    plan = compile_calc("var[0].sum(dim='lev')")
    out = plan.apply(grid)
    assert "lev" not in out.columns
    exp = grid.groupBy("time", "lat", "lon").agg(F.sum("var0").alias("value"))
    assert sorted(r["value"] for r in out.collect()) == sorted(r["value"] for r in exp.collect())


def test_post_reduction_scalar(spark, grid):
    plan = compile_calc("var[0].sum(dim='lev') * 2 + 1")
    out = plan.apply(grid)
    exp = grid.groupBy("time", "lat", "lon").agg((F.sum("var0") * 2 + 1).alias("value"))
    assert sorted(r["value"] for r in out.collect()) == sorted(r["value"] for r in exp.collect())


def test_exp_function(spark, grid):
    # sisnconc: 1 - exp(-0.2*330*var) (calculations.py:740-753)
    plan = compile_calc("1 - exp(-0.2*330*var[0])")
    one = plan.apply(grid.limit(1)).first()["value"]
    import math
    src = grid.limit(1).first()
    assert one == pytest.approx(1 - math.exp(-0.2 * 330 * src["var0"]))


def test_eval_is_rejected(spark):
    for bad in ("__import__('os')", "var[0].__class__", "open('/etc/passwd')",
                "(lambda: 1)()", "[x for x in var]"):
        with pytest.raises(CalcCompileError):
            compile_calc(bad)


def test_macro_dispatch(spark, grid):
    def double_macro(ctx, col):
        def tf(df):
            return df.select(*[d for d in ctx.dim_cols if d in df.columns],
                             (col * 2).alias("value"))
        return tf

    ctx = CalcContext(macros={"double": double_macro})
    plan = compile_calc("double(var[0])", ctx)
    out = plan.apply(grid)
    exp = grid.select((F.col("var0") * 2).alias("v")).collect()
    assert sorted(r["value"] for r in out.collect()) == sorted(r["v"] for r in exp)


def test_ten_term_sum(spark, grid):
    # master_map has up to 10-term sums; 3 vars here, repeated terms
    plan = compile_calc("var[0]+var[1]+var[2]+var[0]+var[1]+var[2]+var[0]+var[1]+var[2]+var[0]")
    one = plan.apply(grid.limit(1)).first()["value"]
    src = grid.limit(1).first()
    want = 4 * src["var0"] + 3 * src["var1"] + 3 * src["var2"]
    assert one == pytest.approx(want)


def test_isel_chain_astype(spark, grid):
    # access.db row shape: var[0].isel(lev=0).astype(int)
    plan = compile_calc("var[0].isel(lev=0).astype(int)")
    out = plan.apply(grid)
    assert dict(out.dtypes)["value"] == "bigint"
    assert out.count() == grid.where("lev = 0").count()


def test_mixed_scalar_linear_transform(spark, grid):
    # "(var[0]*106*24)/(16*86400)" family
    plan = compile_calc("(var[0]*106*24)/(16*86400)")
    one = plan.apply(grid.limit(1)).first()["value"]
    src = grid.limit(1).first()
    assert one == pytest.approx((src["var0"] * 106 * 24) / (16 * 86400))


def test_weighted_two_var_mix(spark, grid):
    # "var[0]*917+var[1]*330" (ice+snow mass)
    plan = compile_calc("var[0]*917+var[1]*330")
    one = plan.apply(grid.limit(1)).first()["value"]
    src = grid.limit(1).first()
    assert one == pytest.approx(src["var0"] * 917 + src["var1"] * 330)


def test_where_drop_true_filters_rows(spark, grid):
    # sithick shape: aice.where(aice > 1e-3, drop=True)
    plan = compile_calc("var[0].where(var[1] != 1, drop=True)")
    out = plan.apply(grid)
    assert out.count() == grid.where("var1 != 1").count()
    assert out.where(F.col("value").isNull()).count() == 0
