"""Deterministic grid_var + ancillary fixtures per FIXTURES.md §1-§3.

A tall gridded-variable table (time, lev, lat, lon, tile, value) for a
small set of model variables, plus broadcast-side ancillary tables and a
mapping-catalog fixture — the reference's data model in miniature
(mop_utils.py:582-627 dim classification; conftest.py:41-73 seeds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
TIMES_1H = pd.date_range("2000-01-01 01:00", periods=31 * 24, freq="1h")  # one month+
LATS = np.linspace(-82.5, 82.5, 8)
LONS = np.linspace(0.0, 315.0, 8)
LEVS = np.arange(4)
TILES = np.arange(1, 6)


def _val(name: str, *coords) -> float:
    h = hash((name,) + tuple(float(c) if isinstance(c, (int, float, np.floating)) else str(c)
                             for c in coords)) % 10_000
    return h / 100.0


def grid_var_2d(name="fld_s03i236", times=None) -> pd.DataFrame:
    times = times if times is not None else TIMES_1H
    rows = [(name, t, None, la, lo, None,
             250.0 + _val(name, i % 24, la, lo) / 10)
            for i, t in enumerate(times) for la in LATS for lo in LONS]
    return pd.DataFrame(rows, columns=["var_name", "time", "lev", "lat", "lon", "tile", "value"])


def grid_var_3d(name="theta", times=None, nt=4) -> pd.DataFrame:
    times = (times if times is not None else TIMES_1H)[:nt]
    rows = [(name, t, int(lv), la, lo, None,
             250.0 + 10.0 * lv + _val(name, la, lo) / 100)
            for t in times for lv in LEVS for la in LATS for lo in LONS]
    return pd.DataFrame(rows, columns=["var_name", "time", "lev", "lat", "lon", "tile", "value"])


def pressure_field(name="pres", times=None, nt=4) -> pd.DataFrame:
    times = (times if times is not None else TIMES_1H)[:nt]
    rows = [(name, t, int(lv), la, lo, None,
             100000.0 - 20000.0 * lv - _val(name, la, lo))
            for t in times for lv in LEVS for la in LATS for lo in LONS]
    return pd.DataFrame(rows, columns=["var_name", "time", "lev", "lat", "lon", "tile", "value"])


def tile_var(name="tile_temp", times=None, nt=2) -> pd.DataFrame:
    times = (times if times is not None else TIMES_1H)[:nt]
    rows = [(name, t, None, la, lo, int(ti),
             270.0 + ti + _val(name, la, lo) / 50)
            for t in times for ti in TILES for la in LATS for lo in LONS]
    return pd.DataFrame(rows, columns=["var_name", "time", "lev", "lat", "lon", "tile", "value"])


def land_frac() -> pd.DataFrame:
    rows = [(la, lo, round((_val("lf", la, lo) % 100) / 100.0, 3))
            for la in LATS for lo in LONS]
    return pd.DataFrame(rows, columns=["lat", "lon", "landfrac"])


def basin_mask() -> pd.DataFrame:
    # atl-arctic (2), indo-pac (3), other (0) — deterministic by longitude
    rows = [(la, lo, 2 if lo < 120 else (3 if lo < 240 else 0))
            for la in LATS for lo in LONS]
    return pd.DataFrame(rows, columns=["lat", "lon", "basin"])


def cell_area() -> pd.DataFrame:
    rows = [(la, lo, round(np.cos(np.radians(la)) * 1e9, 3)) for la in LATS for lo in LONS]
    return pd.DataFrame(rows, columns=["lat", "lon", "area_t"])


def tile_frac() -> pd.DataFrame:
    rows = []
    for la in LATS:
        for lo in LONS:
            raw = np.array([(_val("tf", la, lo, int(t)) % 97) + 1 for t in TILES])
            frac = raw / raw.sum()
            rows += [(la, lo, int(t), float(f)) for t, f in zip(TILES, frac)]
    return pd.DataFrame(rows, columns=["lat", "lon", "tile", "frac"])


def model_levels() -> pd.DataFrame:
    return pd.DataFrame(
        [(int(l), 20.0 + 100.0 * l, 100000.0 - 20000.0 * l) for l in LEVS],
        columns=["lev", "height", "plev"])


def transport_lines() -> pd.DataFrame:
    return pd.DataFrame(
        [(1, "drake", 0, 2, 0, 3, "x"), (2, "bering", 4, 6, 2, 5, "y")],
        columns=["line_id", "name", "i0", "i1", "j0", "j1", "component"])


MAPPING_ROWS = [
    # (cmor_var, input_vars, calculation, units, dimensions, frequency,
    #  realm, cell_methods, positive, cmor_table, model, notes, origin)
    ("tas", "fld_s03i236", "", "K", "time lat lon", "1hr", "atmos",
     "area: time: mean", "", "CMIP6_Amon", "CM2", "air_temperature", "cm000"),
    ("ta_sum", "fld_s03i236 theta", "var[0]+var[1]", "K", "time lat lon",
     "1hr", "atmos", "", "", "CMIP6_Amon", "CM2", "", "cm000"),
    ("ta19", "theta pres", "plevinterp(var[0], var[1], 19)", "K",
     "time plev lat lon", "1hr", "atmos", "", "", "CMIP6_Amon", "CM2", "", "cm000"),
]
