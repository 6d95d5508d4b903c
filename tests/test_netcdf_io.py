"""NetCDF ingest bridge tests: filename-stamp normalization/pruning,
opener gating, and tall-layout plumbing (sources/netcdf_io.py vs
reference check_timestamp / _preselect / open_mfdataset,
mop_utils.py:116-122, 238-295, 330-346)."""

import importlib.util

import pytest
from pyspark.sql import functions as F

from access_mopper_spark.sources.netcdf_io import (
    SYN_DIMS,
    _stamp_of,
    filename_timestamp,
    prune_files_by_timestamp,
    scan_netcdf,
    synthetic_opener,
    xarray_opener,
)


def test_filename_timestamp_formats(spark):
    files = spark.createDataFrame(
        [("atm_199502.nc",),            # yyyymm → month start
         ("ocn_daily_19950215.nc",),    # yyyymmdd
         ("ice_19950215T0630.nc",)],    # yyyymmddThhmm
        ["path"])
    got = {r["path"]: r["st"] for r in files.select(
        "path", filename_timestamp(F.col("path")).alias("st")).collect()}
    assert str(got["atm_199502.nc"]) == "1995-02-01 00:00:00"
    assert str(got["ocn_daily_19950215.nc"]) == "1995-02-15 00:00:00"
    assert str(got["ice_19950215T0630.nc"]) == "1995-02-15 06:30:00"


def test_prune_files_by_timestamp(spark):
    files = spark.createDataFrame(
        [("a_19941231.nc",), ("b_19950101.nc",), ("c_19950301.nc",),
         ("d_19950302.nc",), ("e_199502.nc",)], ["path"])
    kept = {r["path"] for r in prune_files_by_timestamp(
        files, "1995-01-01", "1995-03-01 23:59:59").collect()}
    # bounds inclusive, stamp-precision compare (check_timestamp semantics)
    assert kept == {"b_19950101.nc", "c_19950301.nc", "e_199502.nc"}


def test_stamp_of_matches_spark_normalization():
    assert str(_stamp_of("atm_199502.nc")) == "1995-02-01 00:00:00"
    assert str(_stamp_of("ice_19950215T0630.nc")) == "1995-02-15 06:30:00"
    with pytest.raises(ValueError):
        _stamp_of("no_digits_here.nc")


HAVE_XARRAY = importlib.util.find_spec("xarray") is not None


@pytest.mark.skipif(HAVE_XARRAY, reason="xarray installed — gate inactive")
def test_xarray_opener_gated():
    # container has no xarray: the production opener must fail loud+clear
    with pytest.raises(NotImplementedError):
        xarray_opener("whatever_19950101.nc", ["temp"])


@pytest.mark.skipif(not HAVE_XARRAY,
                    reason="xarray not installed in this container")
def test_xarray_opener_matches_nc3_codec(tmp_path):
    """When the production lib IS present (CI with xarray+scipy/netCDF4),
    the xarray opener must decode the classic-NetCDF-3 fixture to the
    same arrays as the vendored codec — the documented production path
    for NetCDF-4/HDF5 files the classic codec cannot read."""
    import numpy as np

    from access_mopper_spark.sources.netcdf_io import (nc3_opener,
                                                       write_nc3_fixture)

    p = str(tmp_path / "fx_19950101.nc")
    write_nc3_fixture(p, ["temp"])
    a = nc3_opener(p, ["temp"])
    b = xarray_opener(p, ["temp"])
    for k in ("time", "lev", "j", "i", "temp"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_scan_netcdf_tall_layout(spark):
    files = spark.createDataFrame(
        [("ocean_19950101.nc",), ("ocean_19950102.nc",),
         ("ocean_19960101.nc",)], ["path"])
    out = scan_netcdf(files, ["temp"], tstart="1995-01-01",
                      tend="1995-12-31", opener=synthetic_opener)
    rows = out.collect()
    nt, nl, nj, ni = SYN_DIMS
    assert len(rows) == 2 * nt * nl * nj * ni       # 1996 file pruned
    assert out.columns == ["time", "lev", "j", "i", "temp"]
    # spot-check the deterministic value function at a known cell
    d = {(str(r["time"]), r["lev"], r["j"], r["i"]): r["temp"] for r in rows}
    base = (9131 % 100)  # days 1970-01-01 → 1995-01-01
    assert d[("1995-01-01 00:00:00", 0, 0, 0)] == pytest.approx(base)
    assert d[("1995-01-02 00:00:00", 1, 2, 3)] == pytest.approx(
        base + 100.0 + 10.0 + 4.0 + 1.5)


def test_scan_netcdf_multi_var_columns(spark):
    files = spark.createDataFrame([("x_19950101.nc",)], ["path"])
    out = scan_netcdf(files, ["temp", "salt"], opener=synthetic_opener)
    assert out.columns == ["time", "lev", "j", "i", "temp", "salt"]
    r = out.where((F.col("lev") == 0) & (F.col("j") == 0) & (F.col("i") == 0)) \
           .orderBy("time").first()
    # var index offsets by 1000 (the _preselect analogue: each requested
    # variable lands in its own column)
    assert r["salt"] - r["temp"] == pytest.approx(1000.0)
