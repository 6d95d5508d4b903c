"""Domain operators on the FIXTURES.md grid_var model — each checked
against an independent pandas/numpy computation of the reference
semantics."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tests import gridvar as G


@pytest.fixture(scope="module")
def tall2d(spark):
    return spark.createDataFrame(G.grid_var_2d())


@pytest.fixture(scope="module")
def ancillaries(spark):
    return {
        "tile_frac": spark.createDataFrame(G.tile_frac()),
        "basin_mask": spark.createDataFrame(G.basin_mask()),
        "cell_area": spark.createDataFrame(G.cell_area()),
        "model_levels": spark.createDataFrame(G.model_levels()),
        "transport_lines": spark.createDataFrame(G.transport_lines()),
    }


def test_tile_ave_against_pandas(spark, ancillaries):
    tv = G.tile_var()
    df = spark.createDataFrame(tv)
    joined = df.join(F.broadcast(ancillaries["tile_frac"]), ["lat", "lon", "tile"])
    out = joined.groupBy("time", "lat", "lon") \
                .agg(F.sum(F.col("value") * F.col("frac")).alias("tile_ave"))
    got = {(r["time"], r["lat"], r["lon"]): r["tile_ave"] for r in out.collect()}

    ref = tv.merge(G.tile_frac(), on=["lat", "lon", "tile"])
    ref["w"] = ref["value"] * ref["frac"]
    want = ref.groupby(["time", "lat", "lon"])["w"].sum()
    for k, v in want.items():
        assert got[k] == pytest.approx(v), k


def test_basin_transport_against_pandas(spark, tall2d, ancillaries):
    out = (tall2d.join(F.broadcast(ancillaries["basin_mask"]), ["lat", "lon"])
           .where(F.col("basin") > 0)
           .groupBy("basin", "lat")
           .agg(F.sum("value").alias("flux")))
    got = {(r["basin"], r["lat"]): r["flux"] for r in out.collect()}
    ref = G.grid_var_2d().merge(G.basin_mask(), on=["lat", "lon"])
    ref = ref[ref.basin > 0].groupby(["basin", "lat"])["value"].sum()
    assert len(got) == len(ref)
    for k, v in ref.items():
        assert got[k] == pytest.approx(v), k


def test_weighted_global_mean_against_pandas(spark, tall2d, ancillaries):
    out = (tall2d.join(F.broadcast(ancillaries["cell_area"]), ["lat", "lon"])
           .groupBy("time")
           .agg((F.sum(F.col("value") * F.col("area_t")) / F.sum("area_t")).alias("gm")))
    got = {r["time"]: r["gm"] for r in out.limit(5).collect()}
    ref = G.grid_var_2d().merge(G.cell_area(), on=["lat", "lon"])
    ref["w"] = ref["value"] * ref["area_t"]
    g = ref.groupby("time").agg(w=("w", "sum"), a=("area_t", "sum"))
    for t, r in got.items():
        row = g.loc[t]
        assert r == pytest.approx(row["w"] / row["a"])


def test_trans_across_line_with_dim_table(spark, ancillaries):
    """transAcrossLine on index grids: lat/lon become i/j indices via
    rank over the sorted axes (curvilinear-safe), boxes from the dim."""
    tall = spark.createDataFrame(G.grid_var_2d(name="tx_trans",
                                               times=G.TIMES_1H[:2]))
    lats, lons = sorted(float(v) for v in G.LATS), sorted(float(v) for v in G.LONS)
    lat_idx = {v: i for i, v in enumerate(lats)}
    lon_idx = {v: i for i, v in enumerate(lons)}
    lat_dim = spark.createDataFrame([(v, i) for v, i in lat_idx.items()], ["lat", "j"])
    lon_dim = spark.createDataFrame([(v, i) for v, i in lon_idx.items()], ["lon", "i"])
    indexed = tall.join(F.broadcast(lat_dim), "lat").join(F.broadcast(lon_dim), "lon")
    lines = ancillaries["transport_lines"]
    out = (indexed.join(F.broadcast(lines),
                        F.col("i").between(F.col("i0"), F.col("i1"))
                        & F.col("j").between(F.col("j0"), F.col("j1")))
           .groupBy("name", "time").agg(F.sum("value").alias("transport")))
    got = {(r["name"], r["time"]): r["transport"] for r in out.collect()}

    ref = G.grid_var_2d(name="tx_trans", times=G.TIMES_1H[:2])
    ref["j"] = ref["lat"].map(lat_idx)
    ref["i"] = ref["lon"].map(lon_idx)
    for _, ln in G.transport_lines().iterrows():
        box = ref[(ref.i >= ln.i0) & (ref.i <= ln.i1) & (ref.j >= ln.j0) & (ref.j <= ln.j1)]
        for t, v in box.groupby("time")["value"].sum().items():
            assert got[(ln["name"], t)] == pytest.approx(v)


def test_plevinterp_on_gridvar(spark, ancillaries):
    from access_mopper_spark.operators.interp import interp_at_targets
    theta = G.grid_var_3d()
    pres = G.pressure_field()
    sp_t = spark.createDataFrame(theta).select("time", "lev", "lat", "lon",
                                               F.col("value").alias("var0"))
    sp_p = spark.createDataFrame(pres).select("time", "lev", "lat", "lon",
                                              F.col("value").alias("var1"))
    bound = sp_t.join(sp_p, ["time", "lev", "lat", "lon"])
    targets = [90000.0, 60000.0, 35000.0]
    out = interp_at_targets(bound, ["time", "lat", "lon"], "var1", "var0", targets)
    one = out.where((F.col("lat") == G.LATS[0]) & (F.col("lon") == G.LONS[0])).collect()
    t0 = theta.time.min()
    m_t = theta[(theta.lat == G.LATS[0]) & (theta.lon == G.LONS[0]) & (theta.time == t0)]
    m_p = pres[(pres.lat == G.LATS[0]) & (pres.lon == G.LONS[0]) & (pres.time == t0)]
    xs = m_p.sort_values("lev")["value"].to_numpy()[::-1]
    ys = m_t.sort_values("lev")["value"].to_numpy()[::-1]
    want = dict(zip(targets, np.interp(np.array(targets), xs, ys)))
    for r in one:
        if r["time"] == t0:
            assert r["value"] == pytest.approx(want[r["plev"]]), r["plev"]


def test_catalog_driven_monthly_tas(spark):
    """The reference's canonical example end-to-end (SURVEY §7.1): monthly
    tas requested, only 1hr source available → ladder fallback injects a
    resample → pipeline emits the monthly mean, verified against pandas."""
    from access_mopper_spark.plans.pipeline import MappingRow, execute_mapping
    from access_mopper_spark.plans.planner import nearest_frequency

    req = spark.createDataFrame([("tas", "mon")], ["cmor_var", "frequency"])
    avail = spark.createDataFrame([("tas", "1hr")], ["cmor_var", "frequency"])
    resolved = nearest_frequency(req, avail, ["cmor_var"]).first()
    assert resolved["src_frequency"] == "1hr" and resolved["needs_resample"] is True

    src = spark.createDataFrame(G.grid_var_2d()).select("time", "lat", "lon", "value")
    row = MappingRow("tas", ["fld_s03i236"], None, frequency="mon",
                     resample="1 month", reducer="mean")
    out = execute_mapping(spark, row, {"fld_s03i236": src},
                          ["time", "lat", "lon"], ts_col="time")
    got = {(r["lat"], r["lon"]): r["value"] for r in out.collect()
           if r["lat"] == G.LATS[0]}

    ref = G.grid_var_2d()
    # closed-right monthly bins: 01:00..00:00-next-day all land in January
    jan = ref[ref.time <= pd.Timestamp("2000-02-01 00:00:00")]
    want = jan.groupby(["lat", "lon"])["value"].mean()
    for (la, lo), v in want.items():
        if la == G.LATS[0]:
            assert got[(la, lo)] == pytest.approx(v)
