"""Vendored classic-NetCDF-3 codec + native sink tests.

The codec (sources/netcdf3.py) is the container's stand-in for
netCDF4/xarray at the reference's decode boundary (mop_utils.py:330-346)
and write boundary (mopper/mopper.py:174-351): spec-faithful classic
format — big-endian, 4-byte padding, record-slab interleaving, the
single-small-record-var packing special case."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from access_mopper_spark.sources.netcdf3 import read_netcdf3, write_netcdf3
from access_mopper_spark.sources.netcdf_io import (nc3_opener, scan_netcdf,
                                                   write_nc3_fixture)


def _grid_file(path, nt=3, nl=2, nj=3, ni=4):
    temp = (np.arange(nt * nl * nj * ni, dtype="f8")
            .reshape(nt, nl, nj, ni) * 0.5)
    salt = (temp + 1000).astype("f4")
    write_netcdf3(
        path,
        dims={"time": nt, "lev": nl, "j": nj, "i": ni},
        variables={
            "time": (("time",), np.arange(10, 10 + nt, dtype="f8"),
                     {"units": "days since 1970-01-01"}),
            "lev": (("lev",), np.arange(nl, dtype="i4"), {}),
            "j": (("j",), np.arange(nj, dtype="i4"), {}),
            "i": (("i",), np.arange(ni, dtype="i4"), {}),
            "temp": (("time", "lev", "j", "i"), temp, {"units": "degC"}),
            "salt": (("time", "lev", "j", "i"), salt, {}),
        },
        gatts={"title": "fixture", "version": np.array([3], dtype="i4")},
        record_dim="time")
    return temp, salt


def test_round_trip_mixed_record_and_fixed(tmp_path):
    p = str(tmp_path / "grid.nc")
    temp, salt = _grid_file(p)
    dims, gatts, v = read_netcdf3(p)
    assert dims == {"time": 3, "lev": 2, "j": 3, "i": 4}
    assert gatts["title"] == "fixture"
    assert v["temp"]["attrs"]["units"] == "degC"
    assert v["temp"]["dims"] == ("time", "lev", "j", "i")
    np.testing.assert_array_equal(v["temp"]["data"], temp)
    np.testing.assert_array_equal(v["salt"]["data"], salt)  # f4 survives
    assert v["salt"]["data"].dtype == np.dtype("float32")


def test_round_trip_fixed_only_padding(tmp_path):
    p = str(tmp_path / "fixed.nc")
    s = np.array([1, 2, 3], dtype="i2")       # 6 bytes → padded to 8
    b = np.array([-1, 5], dtype="i1")         # 2 bytes → padded to 4
    write_netcdf3(p, dims={"x": 3, "y": 2},
                  variables={"s": (("x",), s, {}), "b": (("y",), b, {})})
    _, _, v = read_netcdf3(p)
    np.testing.assert_array_equal(v["s"]["data"], s)
    np.testing.assert_array_equal(v["b"]["data"], b)


def test_single_short_record_var_packed_special_case(tmp_path):
    p = str(tmp_path / "packed.nc")
    r = np.array([[1, 2, 3], [4, 5, 6]], dtype="i2")
    write_netcdf3(p, dims={"t": 2, "x": 3},
                  variables={"r": (("t", "x"), r, {})}, record_dim="t")
    _, _, v = read_netcdf3(p)
    np.testing.assert_array_equal(v["r"]["data"], r)
    # spec: slabs are NOT padded → records are 6 bytes apart, not 8
    raw = open(p, "rb").read()
    assert raw.index(b"\x00\x01\x00\x02\x00\x03\x00\x04") >= 0


@settings(max_examples=25, deadline=None)
@given(nt=st.integers(1, 4), nl=st.integers(1, 3),
       seed=st.integers(0, 2**31 - 1),
       dtype=st.sampled_from(["f8", "f4", "i4", "i2"]))
def test_round_trip_property(tmp_path_factory, nt, nl, seed, dtype):
    rng = np.random.default_rng(seed)
    arr = (rng.integers(-1000, 1000, size=(nt, nl)).astype(dtype)
           if dtype.startswith("i")
           else rng.normal(size=(nt, nl)).astype(dtype))
    p = str(tmp_path_factory.mktemp("nc") / "prop.nc")
    write_netcdf3(p, dims={"t": nt, "l": nl},
                  variables={"t_ax": (("t",), np.arange(nt, dtype="f8"), {}),
                             "v": (("t", "l"), arr, {})},
                  record_dim="t")
    _, _, v = read_netcdf3(p)
    np.testing.assert_array_equal(v["v"]["data"], arr)


def test_nc3_opener_cf_time_and_pruned_vars(tmp_path):
    p = str(tmp_path / "ocean_daily_19960105.nc")
    write_nc3_fixture(p, ["temp", "salt"])
    d = nc3_opener(p, ["temp"])           # salt pruned at decode
    assert "salt" not in d
    assert d["time"][0] == np.datetime64("1996-01-05T00:00:00", "us")
    assert d["temp"].shape == (2, 2, 3, 4)
    # value formula identical to the synthetic opener (SQL-replayable)
    base = float((np.datetime64("1996-01-05") -
                  np.datetime64("1970-01-01")) / np.timedelta64(1, "D")) % 100
    assert d["temp"][1, 1, 2, 3] == base + 100.0 + 10.0 + 4.0 + 1.5


def test_scan_netcdf_real_decode_matches_synthetic(spark, tmp_path):
    from access_mopper_spark.sources.netcdf_io import synthetic_opener
    paths = []
    for day in (3, 4):
        p = str(tmp_path / f"ocean_daily_199602{day:02d}.nc")
        write_nc3_fixture(p, ["temp"])
        paths.append(p)
    files = spark.createDataFrame([(p,) for p in paths], ["path"])
    real = scan_netcdf(files, ["temp"], opener=nc3_opener) \
        .orderBy("time", "lev", "j", "i").collect()
    synth = scan_netcdf(files, ["temp"], opener=synthetic_opener) \
        .orderBy("time", "lev", "j", "i").collect()
    assert real == synth and len(real) == 2 * 48


def test_netcdf3_sink_write_and_read_back(spark, tmp_path):
    from access_mopper_spark.sinks.writer import write_netcdf3_dataset
    src = str(tmp_path / "ocean_daily_19960110.nc")
    write_nc3_fixture(src, ["temp"])
    files = spark.createDataFrame([(src,)], ["path"])
    tall = scan_netcdf(files, ["temp"], opener=nc3_opener)
    manifest = write_netcdf3_dataset(
        tall.withColumn("__fk", F.date_format("time", "yyyyMMdd"))
            .select("__fk", "time", "lev", "j", "i", "temp"),
        out_dir=str(tmp_path / "out"), file_col="__fk", var_cols=["temp"],
        attrs={"source_id": "S", "source": "s", "experiment_id": "e",
               "frequency": "day", "realm": "ocean", "calendar": "gregorian",
               "table_id": "Oday", "variant_label": "r1i1p1f1"},
        cv=True)
    rows = manifest.collect()
    assert {r["file_key"] for r in rows} == {"19960110", "19960111"}
    assert all(r["n_rows"] == 24 for r in rows)
    back = scan_netcdf(manifest.select("path"), ["temp"], opener=nc3_opener)
    a = tall.orderBy("time", "lev", "j", "i").collect()
    b = back.orderBy("time", "lev", "j", "i").collect()
    assert a == b


def test_netcdf3_sink_cv_gate_blocks_bad_attrs(spark, tmp_path):
    from access_mopper_spark.sinks.writer import write_netcdf3_dataset
    df = spark.range(1).select(
        F.lit("k").alias("__fk"),
        F.lit("1996-01-01 00:00:00").cast("timestamp").alias("time"),
        F.lit(0).alias("lev"), F.lit(0).alias("j"), F.lit(0).alias("i"),
        F.lit(1.0).alias("v"))
    with pytest.raises(ValueError, match="CV validation failed"):
        write_netcdf3_dataset(df, out_dir=str(tmp_path), file_col="__fk",
                              var_cols=["v"],
                              attrs={"frequency": "fortnightly"}, cv=True)


def test_cdf2_round_trip_and_auto_upgrade(tmp_path):
    """64-bit-offset (CDF-2) writes round-trip through the same reader;
    explicit version=2 and the int32-overflow auto-upgrade both produce
    the 'CDF\\x02' magic."""
    p2 = str(tmp_path / "v2.nc")
    arr = np.arange(12, dtype="f8").reshape(3, 4)
    write_netcdf3(p2, dims={"t": 3, "x": 4},
                  variables={"t_ax": (("t",), np.arange(3, dtype="f8"), {}),
                             "v": (("t", "x"), arr, {})},
                  record_dim="t", version=2)
    assert open(p2, "rb").read(4) == b"CDF\x02"
    _, _, v = read_netcdf3(p2)
    np.testing.assert_array_equal(v["v"]["data"], arr)
