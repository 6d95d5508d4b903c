#!/usr/bin/env python3
"""One-shot NetCDF-4 parity gate runner (r8 verdict item 5).

The repo's NetCDF ingest has two openers: the vendored classic
CDF-1/CDF-2 codec (sources/netcdf3.py — always available, what every
driver-gated query uses) and the production ``xarray_opener``
(sources/netcdf_io.py — mirrors the reference's xarray/netCDF4 path,
mop_utils.py:330-346).  The parity test
``tests/test_netcdf_io.py::test_xarray_opener_matches_nc3_codec`` is
skip-marked wherever xarray is absent, so it had never produced an
execution record.  This tool makes the gate runnable anywhere:

1. If xarray (+ a NetCDF engine) is importable, run the parity test
   plus an additional NetCDF-4 round-trip (build a tiny NETCDF4 file
   with netCDF4/h5netcdf, decode through ``xarray_opener``, compare
   against the values the nc3 codec produced for the identical
   payload) and write the record to ``NC4_PARITY.json``.
2. If not, and ``--install`` was passed, attempt a guarded
   ``pip install xarray h5netcdf netCDF4`` first (requires network —
   the sandbox this repo is developed in has none and forbids
   installs, which is exactly the blocker this records).
3. Otherwise write the concrete blocker to ``NC4_PARITY.json`` and
   exit 0 (the record IS the deliverable: a future CI box with the
   libs reruns this and flips the status).

Usage: python tools/run_nc4_parity.py [--install] [out_json]
"""
from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def have(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


def try_install() -> str:
    cmd = [sys.executable, "-m", "pip", "install", "--quiet",
           "xarray", "h5netcdf", "netCDF4"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        return "ok" if r.returncode == 0 else f"pip failed: {r.stderr[-400:]}"
    except Exception as exc:  # no network / no pip
        return f"pip unavailable: {exc}"


def run_gate() -> dict:
    """xarray present: run the skip-marked parity test for real, plus a
    genuine NetCDF-4 (HDF5) round-trip through xarray_opener."""
    rec: dict = {}
    # 1. the existing parity test, un-skipped by construction
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         "tests/test_netcdf_io.py::test_xarray_opener_matches_nc3_codec"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rec["parity_test"] = "pass" if r.returncode == 0 else (
        "FAIL: " + r.stdout[-400:])

    # 2. NetCDF-4 fixture round-trip (the format the nc3 codec cannot
    #    touch — this is the part only a lib-equipped box can execute)
    import tempfile

    import numpy as np

    from access_mopper_spark.sources.netcdf_io import xarray_opener

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ocean_daily_19960101.nc")
        try:
            import xarray as xr
            nt, nl, nj, ni = 2, 3, 4, 5
            ds = xr.Dataset(
                {v: (("time", "lev", "j", "i"),
                     np.arange(nt * nl * nj * ni, dtype="f4")
                     .reshape(nt, nl, nj, ni) + k)
                 for k, v in enumerate(["temp", "salt"])},
                coords={
                    "time": np.array(["1996-01-01", "1996-01-02"],
                                     dtype="datetime64[us]"),
                    "lev": np.arange(nl, dtype="i4"),
                    "j": np.arange(nj, dtype="i4"),
                    "i": np.arange(ni, dtype="i4")})
            # deflate-4 + shuffle: the reference's output encoding
            # (setup_utils.py:156-158) — proves compressed HDF5 reads
            enc = {v: {"zlib": True, "complevel": 4, "shuffle": True}
                   for v in ["temp", "salt"]}
            ds.to_netcdf(path, format="NETCDF4", encoding=enc)
            got = xarray_opener(path, ["temp", "salt"])
            ok = (got["temp"].shape == (nt, nl, nj, ni)
                  and float(got["temp"][1, 2, 3, 4]) == float(
                      ds["temp"].values[1, 2, 3, 4])
                  and float(got["salt"][0, 0, 0, 0]) == 1.0)
            rec["nc4_roundtrip"] = "pass" if ok else "FAIL: value mismatch"
        except Exception as exc:
            rec["nc4_roundtrip"] = f"FAIL: {exc}"
    return rec


def main():
    args = [a for a in sys.argv[1:] if a != "--install"]
    out_path = args[0] if args else "NC4_PARITY.json"
    rec = {"ran_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "python": sys.version.split()[0]}

    if not have("xarray") and "--install" in sys.argv:
        rec["install_attempt"] = try_install()

    if have("xarray"):
        rec["status"] = "executed"
        rec.update(run_gate())
    else:
        rec["status"] = "blocked"
        rec["blocker"] = (
            "xarray/netCDF4/h5netcdf are not installed and this container "
            "forbids package installs (no network; environment contract: "
            "no pip/apt).  The vendored classic CDF-1/CDF-2 codec "
            "(sources/netcdf3.py) covers every driver-gated NetCDF query; "
            "the xarray production opener (sources/netcdf_io.py "
            "xarray_opener) is import-gated with a loud NotImplementedError. "
            "Re-run `python tools/run_nc4_parity.py --install` on any box "
            "with network/libs to execute the gate and flip this record.")
    json.dump(rec, open(out_path, "w"), indent=1)
    print(json.dumps(rec, indent=1))
    sys.exit(0 if rec["status"] == "blocked"
             or all("pass" == v for k, v in rec.items()
                    if k in ("parity_test", "nc4_roundtrip")) else 1)


if __name__ == "__main__":
    main()
