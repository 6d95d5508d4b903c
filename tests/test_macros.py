"""Domain-macro tests: mapping-catalog function calls (plevinterp,
ocean_surface, topsoil) compiled through the calc DSL."""

import numpy as np
import pandas as pd
import pytest

from access_mopper_spark.functions.calc_dsl import CalcContext, compile_calc
from access_mopper_spark.functions.macros import PLEV19, default_macros

DIMS = ["time", "lev", "lat", "lon"]


@pytest.fixture(scope="module")
def column_grid(spark):
    """One (time,lat,lon) column with 5 model levels: var0 = temperature,
    var1 = pressure decreasing with level."""
    rows = []
    for lev in range(5):
        rows.append({
            "time": pd.Timestamp("2024-01-01"), "lev": lev,
            "lat": 0.0, "lon": 0.0,
            "var0": 250.0 + 10 * lev,
            "var1": 100000.0 - 20000.0 * lev,   # 1000→200 hPa
        })
    return spark.createDataFrame(pd.DataFrame(rows))


def ctx():
    return CalcContext(dim_cols=DIMS, macros=default_macros())


def test_plevinterp_macro_matches_numpy(spark, column_grid):
    plan = compile_calc("plevinterp(var[0], var[1], 19)", ctx())
    out = plan.apply(column_grid)
    got = {r["plev"]: r["value"] for r in out.collect()}
    assert len(got) == 19
    xs = np.array([100000.0 - 20000.0 * l for l in range(5)])[::-1]
    ys = np.array([250.0 + 10 * l for l in range(5)])[::-1]
    want = np.interp(np.array(PLEV19), xs, ys)
    for t, w in zip(PLEV19, want):
        assert got[t] == pytest.approx(w), t


def test_ocean_surface_macro(spark, column_grid):
    plan = compile_calc("ocean_surface(var[0])", ctx())
    out = plan.apply(column_grid).collect()
    assert len(out) == 1 and out[0]["value"] == 250.0


def test_topsoil_macro(spark, column_grid):
    plan = compile_calc("topsoil(var[0], 3, 0.343)", ctx())
    out = plan.apply(column_grid).collect()
    assert len(out) == 1
    assert out[0]["value"] == pytest.approx(250.0 + 260.0 + 0.343 * 270.0)
