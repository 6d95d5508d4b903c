"""NetCDF ingest bridge — the reference's only input format, landed into
the engine's tall layout.

Reference parity:
- filename-timestamp pruning: ``check_timestamp`` (mop_utils.py:238-295)
  — heterogeneous stamps (yyyymm / yyyymmdd / yyyymmddThhmm) normalize to
  a timestamp; files outside [tstart, tend] are dropped BEFORE any file
  opens.
- column pruning at open: ``_preselect`` (mop_utils.py:116-122) — only
  the requested variables (plus their coordinates) are read from each
  file.
- multi-file lazy load: ``open_mfdataset`` (mop_utils.py:330-346) — here
  the file list is a DataFrame and each executor opens only its own
  files inside ``mapInPandas`` (Arrow-batched), so ingest parallelism is
  file-level and the driver never touches file contents.

Scale design: the pruned path list repartitions across the cluster
(one task ≈ a few files); each task converts its files to tall Arrow
batches independently — no shuffle, no driver collect, linear in file
count.  At 100 TB the only coordination is the (tiny) path-list
exchange.

The decode itself needs xarray+netCDF4, which this container does not
ship; ``xarray_opener`` is import-gated and raises a clear
NotImplementedError without them.  ``synthetic_opener`` is a
deterministic in-memory stand-in (values are a pure function of the
filename stamp and indices) exercising the identical Spark plumbing —
schema, pruning, batching, tall conversion — and enabling a DuckDB
oracle to recompute the ingested values exactly.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# synthetic grid shape: (time, lev, j, i)
SYN_DIMS = (2, 2, 3, 4)
_EPOCH = date(1970, 1, 1)


def filename_timestamp(fname: Column) -> Column:
    """Normalize a heterogeneous filename stamp to a timestamp
    (check_timestamp, mop_utils.py:253-291): extract the digit run
    (optionally T-separated hhmm), strip separators, pad yyyymm→01 and
    append hhmm/0000 to minute precision."""
    digits = F.regexp_replace(
        F.regexp_extract(fname, r"([0-9]{6,8}(T[0-9]{4})?)", 1), "[^0-9]", "")
    padded = (F.when(F.length(digits) == 6, F.concat(digits, F.lit("010000")))
              .when(F.length(digits) == 8, F.concat(digits, F.lit("0000")))
              .otherwise(digits))
    return F.to_timestamp(padded, "yyyyMMddHHmm")


def prune_files_by_timestamp(files: DataFrame, tstart, tend,
                             fname_col: str = "path") -> DataFrame:
    """Drop files whose filename stamp falls outside [tstart, tend] —
    partition pruning before any file opens (check_timestamp,
    mop_utils.py:238-295).  fx/time-invariant callers skip this (the
    reference keeps one file; here the caller just doesn't prune)."""
    stamp = filename_timestamp(F.col(fname_col))
    return files.where(stamp.between(F.lit(tstart), F.lit(tend)))


def _stamp_of(path: str) -> datetime:
    """Python twin of ``filename_timestamp`` for use inside openers."""
    import re

    m = re.search(r"([0-9]{6,8}(T[0-9]{4})?)", path)
    if not m:
        raise ValueError(f"no timestamp in {path!r}")
    digits = re.sub(r"[^0-9]", "", m.group(1))
    if len(digits) == 6:
        digits += "010000"
    elif len(digits) == 8:
        digits += "0000"
    return datetime.strptime(digits, "%Y%m%d%H%M")


def synthetic_opener(path: str, variables: list[str]):
    """Deterministic fake dataset: dims (time=2, lev=2, j=3, i=4) anchored
    at the filename stamp; value(v,t,lev,j,i) =
    (epoch_days % 100) + v·1000 + t·100 + lev·10 + j·2 + i·0.5.
    A pure function of (path, indices) — replayable in SQL, so the whole
    ingest path is value-hash checkable without a NetCDF library."""
    import numpy as np

    stamp = _stamp_of(path)
    base = float((stamp.date() - _EPOCH).days % 100)
    nt, nl, nj, ni = SYN_DIMS
    t, lev, j, i = np.meshgrid(np.arange(nt), np.arange(nl), np.arange(nj),
                               np.arange(ni), indexing="ij")
    data = {
        "time": np.array([stamp + timedelta(days=int(k)) for k in range(nt)],
                         dtype="datetime64[us]"),
        "lev": np.arange(nl, dtype="int32"),
        "j": np.arange(nj, dtype="int32"),
        "i": np.arange(ni, dtype="int32"),
    }
    for vi, v in enumerate(variables):
        data[v] = base + vi * 1000.0 + t * 100.0 + lev * 10.0 + j * 2.0 + i * 0.5
    return data


def nc3_opener(path: str, variables: list[str]):
    """REAL decode opener: parses classic NetCDF-3 bytes with the
    vendored pure-numpy codec (netcdf3.py) — no xarray/netCDF4 needed.
    Matches open_mfdataset + decode_times semantics (mop_utils.py:
    330-346) for the classic format: the CF time coordinate
    ('days since YYYY-MM-DD') converts to timestamps, only the
    requested variables are materialized (_preselect, mop_utils.py:
    116-122), and the returned dict has the same shape contract as the
    other openers, so the Spark plumbing is identical."""
    import re as _re

    import numpy as np

    from access_mopper_spark.sources.netcdf3 import read_netcdf3

    _, _, vars_ = read_netcdf3(path)
    tv = vars_["time"]
    units = tv["attrs"].get("units", "")
    m = _re.match(r"days since (\d{4}-\d{2}-\d{2})",
                  units if isinstance(units, str) else "")
    if not m:
        raise ValueError(f"unsupported time units {units!r} in {path!r}")
    base = np.datetime64(m.group(1), "us")
    time = base + np.round(np.asarray(tv["data"], dtype="f8")
                           * 86400e6).astype("timedelta64[us]")
    out = {
        "time": time,
        "lev": vars_["lev"]["data"].astype("int32"),
        "j": vars_["j"]["data"].astype("int32"),
        "i": vars_["i"]["data"].astype("int32"),
    }
    for v in variables:  # prune: only the requested variables decode
        out[v] = np.asarray(vars_[v]["data"], dtype="f8")
    return out


def write_nc3_fixture(path: str, variables: list[str]) -> str:
    """Materialize a REAL classic NetCDF-3 file whose contents equal
    ``synthetic_opener(path, variables)`` — the same SQL-replayable
    value formula, but the bytes a query reads genuinely travel through
    the binary format (header parse, big-endian record slabs, CF time
    decode).  Stands in for files that would already exist on shared
    storage in production; writing is idempotent and deterministic."""
    import numpy as np

    from access_mopper_spark.sources.netcdf3 import write_netcdf3

    d = synthetic_opener(path, variables)
    epoch = np.datetime64("1970-01-01", "us")
    days = (d["time"] - epoch) / np.timedelta64(1, "us") / 86400e6
    nt = len(d["time"])
    variables_nc = {
        "time": (("time",), np.asarray(days, dtype="f8"),
                 {"units": "days since 1970-01-01", "calendar": "proleptic_gregorian"}),
        "lev": (("lev",), d["lev"], {"units": "1"}),
        "j": (("j",), d["j"], {"units": "1"}),
        "i": (("i",), d["i"], {"units": "1"}),
    }
    for v in variables:
        variables_nc[v] = (("time", "lev", "j", "i"),
                           np.asarray(d[v], dtype="f8"), {"units": "1"})
    write_netcdf3(
        path,
        dims={"time": nt, "lev": len(d["lev"]), "j": len(d["j"]),
              "i": len(d["i"])},
        variables=variables_nc,
        gatts={"title": "access_mopper_spark nc3 fixture"},
        record_dim="time")
    return path


def xarray_opener(path: str, variables: list[str]):
    """Production opener: xarray + netCDF4, column-pruned at open
    (_preselect, mop_utils.py:116-122).  Import-gated — this container
    ships neither library."""
    try:
        import xarray as xr
    except ImportError as exc:
        raise NotImplementedError(
            "NetCDF decode needs xarray+netCDF4, not installed here; "
            "use synthetic_opener for plumbing tests") from exc

    ds = xr.open_dataset(path)[variables]  # prune BEFORE load
    out = {
        "time": ds["time"].values.astype("datetime64[us]"),
        "lev": ds["lev"].values.astype("int32"),
        "j": ds["j"].values.astype("int32"),
        "i": ds["i"].values.astype("int32"),
    }
    for v in variables:
        out[v] = ds[v].transpose("time", "lev", "j", "i").values
    ds.close()
    return out


def scan_netcdf(files: DataFrame, variables: list[str],
                tstart=None, tend=None,
                opener: Callable = xarray_opener,
                fname_col: str = "path") -> DataFrame:
    """Read NetCDF files into the tall layout: one row per
    (time, lev, j, i) with one column per requested variable.

    ``files`` is a DataFrame holding the path list (from a glob listing
    or a catalog).  Filename-stamp pruning runs first (cheap, no I/O);
    the survivors repartition so each task decodes a bounded number of
    files; decode + flatten happens inside ONE Arrow-batched
    ``mapInPandas`` — map-only, no shuffle beyond the path-list spread.
    """
    import numpy as np
    import pandas as pd

    if tstart is not None:
        files = prune_files_by_timestamp(files, tstart, tend, fname_col)
    paths = files.select(F.col(fname_col).alias("path"))
    # spread paths: hash-repartition on path → file-level parallelism
    parallelism = paths.sparkSession.sparkContext.defaultParallelism
    paths = paths.repartition(parallelism, "path")

    var_fields = ", ".join(f"`{v}` double" for v in variables)
    schema = f"time timestamp, lev int, j int, i int, {var_fields}"

    def read(batches):
        for pdf in batches:
            for path in pdf["path"]:
                d = opener(path, variables)
                nt, nl, nj, ni = (len(d["time"]), len(d["lev"]),
                                  len(d["j"]), len(d["i"]))
                tt, ll, jj, ii = np.meshgrid(
                    np.arange(nt), np.arange(nl), np.arange(nj),
                    np.arange(ni), indexing="ij")
                out = {
                    "time": d["time"][tt.ravel()],
                    "lev": d["lev"][ll.ravel()],
                    "j": d["j"][jj.ravel()],
                    "i": d["i"][ii.ravel()],
                }
                for v in variables:
                    out[v] = np.asarray(d[v], dtype="float64").ravel()
                yield pd.DataFrame(out)

    return paths.mapInPandas(read, schema)
