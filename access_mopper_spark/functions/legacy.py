"""Legacy composite remainder — the last unported function families from
the reference's original subroutine layer, re-expressed as Spark Column /
DataFrame algebra.

Reference provenance (semantics only; the formulations here are
independent DataFrame algebra):

- ``tslsi`` / ``calc_tslsi``      original/subroutines/app_functions.py:354-378
- ``tileFraci317``                original/subroutines/app_functions.py:266-273
- ``apply_landfrac``              original/subroutines/app_functions.py:275-287
- ``depth100``                    original/subroutines/app_functions.py:452-455
- ``calcrsdoabsorb``              original/subroutines/app_functions.py:457-466
- ``ocnrmadvect_offine``          original/subroutines/app_functions.py:468-494
- ``calc_areacello`` / volcello   original/subroutines/app_functions.py:610-625
- ``getdeptho``                   original/subroutines/app_functions.py:627-630
- ice/snow/icearea transports     mopper/calculations.py:323-395

Scale notes: every function here is either pure Column math (map-only,
whole-stage codegen, zero shuffle) or one keyed groupBy with map-side
partials.  Ancillary fields (tile fractions, land fraction, grid cell
lengths) are small dimension tables — always broadcast, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference constants (mopper/calculations.py:45-46)
ICE_DENSITY = 900.0   # kg/m3
SNOW_DENSITY = 300.0  # kg/m3

# CICE sentinel for open water in sea-ice temperature fields
# (np.ma.masked_values(si_temp, 271.35), app_functions.py:364)
SI_TEMP_SENTINEL = 271.35


def calc_tslsi(ts: Column, ts_sea: Column, sic: Column, land_frac: Column) -> Column:
    """Surface temperature over land + sea-ice (calc_tslsi,
    app_functions.py:370-378): remove the open-ocean contribution from the
    total and renormalize by the land-or-sea-ice fraction.

    A_lsi = A_l + (1-A_l)·sic ; A_o = (1-A_l)·(1-sic) ;
    tslsi = (ts - ts_sea·A_o) / A_lsi.

    Callers must guarantee A_lsi > 0 (i.e. some land or some ice); all-
    open-ocean cells are undefined in the reference too (0/0).
    """
    a_lsi = land_frac + (1 - land_frac) * sic
    a_o = (1 - land_frac) * (1 - sic)
    return (ts - ts_sea * a_o) / a_lsi


def masked_seaice_temp(si_temp: Column) -> Column:
    """Null out the CICE open-water sentinel (271.35 K) — the Spark
    rendering of ``np.ma.masked_values`` (app_functions.py:364)."""
    return F.when(si_temp != SI_TEMP_SENTINEL, si_temp)


def tslsi_tiles(df: DataFrame, tile_frac: DataFrame, group_cols: list[str],
                temp_col: str, tile_key: str, frac_col: str,
                land_frac_col: str, si_temp_col: str,
                out_col: str = "tslsi") -> DataFrame:
    """Land-surface + sea-ice temperature composite (tslsi,
    app_functions.py:354-366): Σ_tiles temp·tileFrac (tileFraci317
    ancillary, broadcast), scaled by the land fraction
    (apply_landfrac), plus the sentinel-masked sea-ice temperature.

    The reference loops over pft tiles in numpy; here the tile dimension
    collapses in ONE map-side-combined groupBy after a broadcast join of
    the tile-fraction ancillary — no loop, no shuffle of the ancillary.
    Rows where BOTH contributions are absent stay null (mask AND,
    app_functions.py:366)."""
    joined = df.join(F.broadcast(tile_frac), tile_key)
    sea = masked_seaice_temp(F.col(si_temp_col))
    return (
        joined.groupBy(*group_cols)
        .agg(
            (F.sum(F.col(temp_col) * F.col(frac_col))
             * F.first(F.col(land_frac_col))).alias("__land"),
            F.first(sea, ignorenulls=True).alias("__sea"),
        )
        .withColumn(out_col,
                    F.when(F.col("__land").isNotNull() | F.col("__sea").isNotNull(),
                           F.coalesce("__land", F.lit(0.0))
                           + F.coalesce("__sea", F.lit(0.0))))
        .drop("__land", "__sea")
    )


def depth100(d95: Column, d105: Column) -> Column:
    """Mid-point depth of the 100 m layer (depth100,
    app_functions.py:452-455): (d95+d105)/2, masked wherever the deeper
    field is masked — CASE-null rendering of the numpy mask copy."""
    return F.when(d105.isNotNull(), (d95 + d105) / 2.0)


def rsdoabsorb(heat: Column, flux: Column, level: Column,
               surface_level) -> Column:
    """Absorbed shortwave (calcrsdoabsorb, app_functions.py:457-466):
    the 2-D surface flux joins the 3-D heating ONLY at the top level;
    deeper levels pass through unchanged.  Level-conditional add — pure
    Column math, no per-level loop."""
    return F.when(level == surface_level, heat + F.coalesce(flux, F.lit(0.0))) \
            .otherwise(heat)


def ocnrmadvect_offine(v: dict[str, Column], tempsalt: str = "salt",
                       surface: Column | None = None,
                       con2d: Column | None = None) -> Column:
    """Residual advection offline (ocnrmadvect_offine,
    app_functions.py:468-494): a named linear combination of tendency
    terms; ADV = NET − RHS; result = ADV + EIT_a + SUB.

    ``v`` maps term names var0..var9 (plus var10..var13 for the 'temp'
    variant) to Columns; the temp variant adds the 2-D terms
    (PME + SMO) at the surface level only (``surface`` boolean Column).
    Pure Column arithmetic — one projection, zero shuffles.
    """
    dia = v["var0"] - v["var1"]
    kpp = v["var2"]
    eit = v["var3"] + v["var4"]
    sub = v["var5"]
    con = v["var1"] + v["var6"]
    riv = v["var7"]
    sig = v["var8"]
    net = v["var9"]
    if tempsalt == "temp":
        swp = v["var10"]
        frz = v["var11"]
        con3d = dia + kpp + eit + sub + con + riv + sig + swp + frz
        if surface is None or con2d is None:
            raise ValueError("temp variant needs surface flag and con2d (PME+SMO)")
        rhs = F.when(surface, con3d + con2d).otherwise(con3d)
    elif tempsalt == "salt":
        rhs = dia + kpp + eit + sub + con + riv + sig
    else:
        raise ValueError("tempsalt must be 'temp' or 'salt'")
    adv = net - rhs
    return adv + v["var3"] + sub


def calc_areacello(area: Column, mask_v: Column) -> Column:
    """Cell area with the land mask transplanted from a companion field
    then filled with 0 (calc_areacello, app_functions.py:610-613)."""
    return F.when(mask_v.isNotNull(), area).otherwise(F.lit(0.0))


def calc_volcello(area: Column, dht: Column) -> Column:
    """Cell volume = area × layer thickness (calc_volcello_om2,
    app_functions.py:621-625)."""
    return area * dht


def getdeptho(grid: DataFrame, depth_col: str = "deptho") -> DataFrame:
    """Ocean depth ancillary scan (getdeptho, app_functions.py:627-630):
    in Spark the ancillary is just a (small, broadcastable) dimension
    table; this is the projection that reads it."""
    return grid.select("*").withColumnRenamed(depth_col, "deptho") \
        if depth_col != "deptho" else grid


def ice_transport(thickness: Column, vel: Column, cell_len: Column) -> Column:
    """Ice mass transport ρ_ice·h·v·L (iceTransport,
    calculations.py:323-346)."""
    return F.lit(ICE_DENSITY) * thickness * vel * cell_len


def snow_transport(thickness: Column, vel: Column, cell_len: Column) -> Column:
    """Snow mass transport ρ_snow·h·v·L (snowTransport,
    calculations.py:348-371)."""
    return F.lit(SNOW_DENSITY) * thickness * vel * cell_len


def icearea_transport(frac: Column, vel: Column, cell_len: Column) -> Column:
    """Ice area transport a·v·L (iceareaTransport,
    calculations.py:373-395)."""
    return frac * vel * cell_len
