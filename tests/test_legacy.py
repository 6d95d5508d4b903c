"""Edge-semantics tests for the legacy composite remainder
(functions/legacy.py) — the cases the SQL oracles don't reach:
mask propagation, sentinel handling, the temp variant of
ocnrmadvect_offine."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from access_mopper_spark.functions.legacy import (
    ICE_DENSITY,
    SNOW_DENSITY,
    calc_areacello,
    calc_tslsi,
    calc_volcello,
    depth100,
    ice_transport,
    masked_seaice_temp,
    ocnrmadvect_offine,
    rsdoabsorb,
    snow_transport,
    tslsi_tiles,
)


def test_calc_tslsi_pure_land_and_pure_ice(spark):
    # pure land (A_l=1): tslsi == ts; pure ice over ocean (A_l=0, sic=1):
    # tslsi == ts (no open-ocean contribution to remove)
    df = spark.createDataFrame(
        [(280.0, 275.0, 0.0, 1.0),   # pure land
         (260.0, 275.0, 1.0, 0.0),   # pure sea ice
         (270.0, 270.0, 0.5, 0.5)],  # mixed: A_o=0.25, A_lsi=0.75
        ["ts", "ts_sea", "sic", "land"])
    out = df.select(calc_tslsi(F.col("ts"), F.col("ts_sea"), F.col("sic"),
                               F.col("land")).alias("v")).collect()
    assert out[0]["v"] == pytest.approx(280.0)
    assert out[1]["v"] == pytest.approx(260.0)
    assert out[2]["v"] == pytest.approx((270.0 - 270.0 * 0.25) / 0.75)


def test_masked_seaice_sentinel(spark):
    df = spark.createDataFrame([(271.35,), (260.0,)], ["t"])
    got = df.select(masked_seaice_temp(F.col("t")).alias("m")).collect()
    assert got[0]["m"] is None and got[1]["m"] == 260.0


def test_tslsi_tiles_mask_and(spark):
    # group 1: land present, sea sentinel-masked → land only
    # group 2: land null (temp null), sea present → sea only
    # group 3: both absent → null (reference mask-AND, app_functions.py:366)
    rows = [
        (1, 1, 10.0, 0.5, 271.35),
        (1, 2, 20.0, 0.5, 271.35),
        (2, 1, None, 0.5, 260.0),
        (3, 1, None, 0.5, 271.35),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "tile", "temp", "land", "si"]))
    tf = spark.createDataFrame([(1, 0.6), (2, 0.4)], ["tile", "frac"])
    out = {r["g"]: r["tslsi"] for r in tslsi_tiles(
        df, tf, ["g"], "temp", "tile", "frac", "land", "si").collect()}
    assert out[1] == pytest.approx((10.0 * 0.6 + 20.0 * 0.4) * 0.5)
    assert out[2] == pytest.approx(260.0)
    assert out[3] is None


def test_depth100_mask_transplant(spark):
    df = spark.createDataFrame([(95.0, 105.0), (95.0, None)], ["d95", "d105"])
    got = df.select(depth100(F.col("d95"), F.col("d105")).alias("d")).collect()
    assert got[0]["d"] == pytest.approx(100.0)
    assert got[1]["d"] is None


def test_rsdoabsorb_levels(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 2.0), (2, 7.0, 2.0), (1, 3.0, None)],
        ["lev", "heat", "flux"])
    got = df.select(rsdoabsorb(F.col("heat"), F.col("flux"),
                               F.col("lev"), 1).alias("v")).collect()
    # surface adds flux; deeper passes through; null flux coalesces to 0
    assert [r["v"] for r in got] == [7.0, 7.0, 3.0]


def test_ocnrmadvect_temp_variant(spark):
    # temp variant: CON2D (PME+SMO) enters RHS only at the surface level
    base = {f"var{i}": float(i + 1) for i in range(12)}
    rows = [tuple([lev] + [base[f"var{i}"] for i in range(12)] + [0.5, 0.25])
            for lev in (1, 2)]
    cols = ["lev"] + [f"var{i}" for i in range(12)] + ["pme", "smo"]
    df = spark.createDataFrame(rows, cols)
    v = {k: F.col(k) for k in base}
    out = df.select(
        "lev",
        ocnrmadvect_offine(v, "temp", surface=F.col("lev") == 1,
                           con2d=F.col("pme") + F.col("smo")).alias("adv")).collect()
    got = {r["lev"]: r["adv"] for r in out}
    dia, kpp = 1.0 - 2.0, 3.0
    eit, sub = 4.0 + 5.0, 6.0
    con, riv, sig, net = 2.0 + 7.0, 8.0, 9.0, 10.0
    swp, frz = 11.0, 12.0
    con3d = dia + kpp + eit + sub + con + riv + sig + swp + frz
    exp_deep = (net - con3d) + 4.0 + sub
    assert got[2] == pytest.approx(exp_deep)
    assert got[1] == pytest.approx(exp_deep - 0.75)  # surface RHS += pme+smo
    with pytest.raises(ValueError):
        ocnrmadvect_offine(v, "neither")


def test_areacello_volcello(spark):
    df = spark.createDataFrame([(10.0, 1.0, 2.0), (10.0, None, 2.0)],
                               ["area", "mask_v", "dht"])
    got = df.select(
        calc_areacello(F.col("area"), F.col("mask_v")).alias("a"),
        calc_volcello(F.col("area"), F.col("dht")).alias("v")).collect()
    assert (got[0]["a"], got[0]["v"]) == (10.0, 20.0)
    assert (got[1]["a"], got[1]["v"]) == (0.0, 20.0)  # masked → filled 0


def test_transport_constants(spark):
    df = spark.createDataFrame([(2.0, 0.5, 1000.0)], ["th", "vel", "L"])
    got = df.select(
        ice_transport(F.col("th"), F.col("vel"), F.col("L")).alias("i"),
        snow_transport(F.col("th"), F.col("vel"), F.col("L")).alias("s")).collect()[0]
    assert got["i"] == pytest.approx(ICE_DENSITY * 2.0 * 0.5 * 1000.0)
    assert got["s"] == pytest.approx(SNOW_DENSITY * 2.0 * 0.5 * 1000.0)
