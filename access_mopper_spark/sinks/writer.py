"""Metadata-enforcing partitioned sink — the CMOR/NetCDF writer's role
(mopper/mopper.py:174-351) re-expressed for a distributed columnar store.

Three reference behaviors carried over:

- **Schema registry enforcement** (CMOR table JSONs fix the output schema,
  mop_setup.py:269-283): the outgoing DataFrame is cast/reordered to a
  registered ``StructType``; unexpected or missing columns fail fast.
- **DRS path/file templating** (``build_filename``, setup_utils.py:
  485-542): rendered from an attribute dict; path segments become
  ``partitionBy`` columns so downstream readers get partition pruning.
- **Size-targeted file splitting** (``compute_fsize``, setup_utils.py:
  428-482 and the >4 GB chunked write, mopper.py:335-341): expressed as
  ``maxRecordsPerFile`` computed from target bytes / est. row width —
  Spark streams each partition to disk, so the reference's memory-guard
  chunking is inherent.

Round-3 additions:

- **Global-attribute / CV validation** (``edit_json_cv`` + required
  attribute collection, setup_utils.py:250-300; CMOR exits on missing
  attrs): required keys = the CV's required_global_attributes plus every
  template placeholder; value sets (frequency/realm/calendar) validated
  against the controlled vocabulary.  Violations raise BEFORE any write.
- **Hybrid-height z-factors** (``hybrid_axis``, mop_utils.py:518-537):
  the hybrid vertical coordinate ships with its formula terms — the
  per-level ``b``/``b_half`` coefficient (with bounds) and the per-cell
  ``orog`` field.  In a columnar store these are companion columns
  attached by BROADCAST joins (per-level table ≤ O(100) rows, orography
  is a per-cell ancillary) — never a shuffle of the data table.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SchemaRegistry:
    """Name → StructType + attribute dict, the CMOR-table-JSON role."""

    def __init__(self):
        self._entries: dict[str, tuple[StructType, dict]] = {}

    def register(self, name: str, schema: StructType, attrs: dict | None = None):
        self._entries[name] = (schema, dict(attrs or {}))

    def get(self, name: str) -> tuple[StructType, dict]:
        if name not in self._entries:
            raise KeyError(f"no registered output schema {name!r}")
        return self._entries[name]


def conform(df: DataFrame, schema: StructType) -> DataFrame:
    """Cast/reorder ``df`` to the registered schema; extra columns are an
    error (the registry is a contract, not a hint), missing ones too."""
    have = set(df.columns)
    want = [f.name for f in schema.fields]
    missing = [c for c in want if c not in have]
    extra = sorted(have - set(want))
    if missing or extra:
        raise ValueError(f"schema mismatch: missing={missing} extra={extra}")
    return df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])


def render_template(template: str, attrs: dict) -> str:
    """Render ``{attr}`` placeholders (build_filename semantics,
    setup_utils.py:485-542); unknown placeholders fail fast."""
    def sub(m):
        key = m.group(1)
        if key not in attrs:
            raise KeyError(f"template attr {key!r} not provided")
        return str(attrs[key])

    return re.sub(r"\{(\w+)\}", sub, template)


# Controlled vocabulary (CMIP6_CV.json role, setup_utils.py:250-300).
# Value sets mirror the reference's tables; calendars match
# functions/calendars.py support.
DEFAULT_CV = {
    "required_global_attributes": [
        "source_id", "source", "experiment_id", "frequency", "realm",
        "calendar", "table_id", "variant_label",
    ],
    "frequency": {"subhr", "1hr", "3hr", "6hr", "day", "mon", "yr", "dec",
                  "fx", "monC", "monPt", "dayPt"},
    "realm": {"atmos", "ocean", "seaIce", "land", "landIce", "ocnBgchem",
              "atmosChem", "aerosol"},
    "calendar": {"gregorian", "standard", "proleptic_gregorian", "noleap",
                 "365_day", "360_day", "all_leap", "366_day", "julian"},
}


def validate_attrs(attrs: dict, path_template: str = "", cv: dict | None = None) -> dict:
    """Validate global attributes against the controlled vocabulary
    (setup_utils.py:250-300 + CMOR's required-attribute exit): required
    keys = CV required_global_attributes ∪ template placeholders; keys
    with a CV value set must use a listed value.  Raises ValueError
    listing EVERY violation (the reference exits on the first)."""
    cv = cv or DEFAULT_CV
    required = list(cv.get("required_global_attributes", []))
    required += re.findall(r"\{(\w+)\}", path_template or "")
    problems = []
    for k in dict.fromkeys(required):          # ordered de-dup
        if k not in attrs or attrs[k] in (None, ""):
            problems.append(f"missing required attribute {k!r}")
    for k, allowed in cv.items():
        if k == "required_global_attributes" or not isinstance(allowed, (set, frozenset)):
            continue
        if k in attrs and attrs[k] not in allowed:
            problems.append(f"attribute {k}={attrs[k]!r} not in CV {sorted(allowed)}")
    if problems:
        raise ValueError("CV validation failed: " + "; ".join(problems))
    return attrs


def edit_cv_document(cv: dict, attrs: dict) -> dict:
    """Register an experiment in a CMIP6 CV document (edit_json_cv,
    cmip_utils.py:149-202): ensure the activity_id is listed and write/
    overwrite the experiment_id entry from the experiment attributes,
    so a CMOR-style validator recognises custom experiments.  Pure
    function over the parsed document (the reference mutates the file
    in place; callers here json.dump the return value) — key order is
    preserved like the reference's OrderedDict round trip."""
    activity_id = attrs["activity_id"]
    experiment_id = attrs["experiment_id"]
    out = json.loads(json.dumps(cv))  # deep copy, order-preserving
    root = out.setdefault("CV", {})
    acts = root.setdefault("activity_id", {})
    if activity_id not in acts:
        acts[activity_id] = activity_id
    exps = root.setdefault("experiment_id", {})
    exps[experiment_id] = {
        "activity_id": [activity_id],
        "additional_allowed_model_components": ["AER", "CHEM", "BGC"],
        "experiment": experiment_id,
        "experiment_id": experiment_id,
        "parent_activity_id": [attrs["parent_activity_id"]],
        "parent_experiment_id": [attrs["parent_experiment_id"]],
        "required_model_components": [attrs["source_type"]],
        "sub_experiment_id": ["none"],
    }
    return out


# hybrid-height vertical coordinates and their formula-term names
# (hybrid_axis, mop_utils.py:518-537)
HYBRID_ZFACTORS = {
    "hybrid_height": "b",
    "hybrid_height_half": "b_half",
}


def attach_zfactors(df: DataFrame, axis_name: str,
                    b_table: DataFrame, orog: DataFrame,
                    lev_col: str = "lev",
                    cell_cols: tuple[str, str] = ("j", "i"),
                    expected_levels: list | None = None) -> DataFrame:
    """Attach the hybrid-height formula terms as companion columns
    (hybrid_axis, mop_utils.py:518-537): the per-level coefficient
    (named ``b`` or ``b_half`` by axis, with its bounds) joins on the
    level key; the per-cell orography joins on the cell key.  Both are
    small ancillaries → broadcast joins, no shuffle of ``df``.

    ``b_table`` columns: (lev_col, b, b_lo, b_hi);
    ``orog`` columns: (*cell_cols, orog).
    Unknown axis names raise (the reference's hybrid_dict KeyError).
    ``expected_levels`` (if given) is checked against the b_table
    driver-side — the b_table is an O(levels) ancillary, so this stays a
    bounded collect and the data table is never scanned for validation.
    """
    if axis_name not in HYBRID_ZFACTORS:
        raise KeyError(f"{axis_name!r} is not a hybrid axis; "
                       f"known: {sorted(HYBRID_ZFACTORS)}")
    zname = HYBRID_ZFACTORS[axis_name]
    if expected_levels is not None:
        have = {r[0] for r in b_table.select(lev_col).collect()}  # bounded: axis table
        missing = sorted(set(expected_levels) - have)
        if missing:
            raise ValueError(
                f"z-factor {zname!r} undefined for levels {missing}")
    b = b_table.select(
        F.col(lev_col),
        F.col("b").alias(zname),
        F.col("b_lo").alias(f"{zname}_bnds_lo"),
        F.col("b_hi").alias(f"{zname}_bnds_hi"),
    )
    out = df.join(F.broadcast(b), lev_col, "left")
    return out.join(F.broadcast(orog), list(cell_cols), "left")


def write_dataset(df: DataFrame, registry: SchemaRegistry, name: str,
                  base_dir: str, path_template: str,
                  partition_cols: list[str] | None = None,
                  target_file_mb: float = 256.0,
                  est_row_bytes: int = 64,
                  compression: str = "zstd",
                  cv: dict | bool | None = None) -> str:
    """Conform → validate attrs (optional CV) → template the output
    directory → write parquet with a per-file record cap derived from
    the byte target.  Returns the path.

    ``cv``: None skips CV validation (legacy behavior); True validates
    against DEFAULT_CV; a dict validates against that vocabulary.
    Validation failures raise BEFORE any file is written (CMOR's
    exit-on-missing-attribute discipline, mopper.py:174-196)."""
    schema, attrs = registry.get(name)
    if cv:
        validate_attrs(attrs, path_template, None if cv is True else cv)
    out = conform(df, schema)
    path = f"{base_dir.rstrip('/')}/{render_template(path_template, attrs)}"
    max_records = max(1, int(target_file_mb * 1024 * 1024 / est_row_bytes))
    writer = (
        out.write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
    return path


def write_netcdf3_dataset(df: DataFrame, out_dir: str, file_col: str,
                          var_cols: list[str],
                          time_col: str = "time",
                          dim_cols: tuple = ("lev", "j", "i"),
                          attrs: dict | None = None,
                          path_template: str = "",
                          cv: dict | bool | None = None) -> DataFrame:
    """NATIVE NetCDF output — the CMOR write itself (mopper/mopper.py:
    174-351), via the vendored pure-numpy classic codec (sources/
    netcdf3.py).  The tall (time, lev, j, i, vars…) frame groups by
    ``file_col`` (the DRS file key: one group = one output file, the
    reference's per-chunk cmor_write) and each EXECUTOR task pivots its
    group back to (t, lev, j, i) arrays and writes one classic
    NetCDF-3 file — file-level parallelism, no driver collect, the
    exact granularity of the reference's >4 GB chunked writes
    (mopper.py:335-341).

    CV/attribute validation runs BEFORE any write (CMOR's
    exit-on-missing-attribute discipline); global attrs and the file
    key are embedded as NetCDF global attributes.  Returns a manifest
    DataFrame (file_key, path, n_rows, md5) — the success ledger row.

    applyInPandas is correct here (few, large groups — one per output
    file), not the many-tiny-groups antipattern."""
    import hashlib
    import os

    import numpy as np
    import pandas as pd

    from access_mopper_spark.sources.netcdf3 import write_netcdf3

    if cv:
        validate_attrs(dict(attrs or {}), path_template,
                       None if cv is True else cv)
    gatts = {k: str(v) for k, v in (attrs or {}).items()}
    os.makedirs(out_dir, exist_ok=True)
    d0, d1, d2 = dim_cols

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf[file_col].iloc[0])
        t_vals = np.sort(pdf[time_col].unique())
        ax = {c: np.sort(pdf[c].unique()) for c in dim_cols}
        ti = np.searchsorted(t_vals, pdf[time_col].values)
        ix = tuple(np.searchsorted(ax[c], pdf[c].values) for c in dim_cols)
        epoch = np.datetime64("1970-01-01", "us")
        days = (t_vals.astype("datetime64[us]") - epoch) \
            / np.timedelta64(1, "us") / 86400e6
        variables = {
            "time": (("time",), np.asarray(days, dtype="f8"),
                     {"units": "days since 1970-01-01"}),
            d0: ((d0,), ax[d0].astype("i4"), {}),
            d1: ((d1,), ax[d1].astype("i4"), {}),
            d2: ((d2,), ax[d2].astype("i4"), {}),
        }
        shape = (len(t_vals), len(ax[d0]), len(ax[d1]), len(ax[d2]))
        for v in var_cols:
            arr = np.full(shape, np.nan)
            arr[(ti,) + ix] = pdf[v].values.astype("f8")
            variables[v] = (("time", d0, d1, d2), arr, {})
        path = os.path.join(out_dir, f"{key}.nc")
        write_netcdf3(path,
                      dims={"time": shape[0], d0: shape[1], d1: shape[2],
                            d2: shape[3]},
                      variables=variables,
                      gatts={**gatts, "file_key": key},
                      record_dim="time")
        md5 = hashlib.md5(open(path, "rb").read()).hexdigest()
        return pd.DataFrame({"file_key": [key], "path": [path],
                             "n_rows": [len(pdf)], "md5": [md5]})

    return df.groupBy(file_col).applyInPandas(
        write_one, "file_key string, path string, n_rows long, md5 string")
