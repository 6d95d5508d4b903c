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
"""

from __future__ import annotations

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


def write_dataset(df: DataFrame, registry: SchemaRegistry, name: str,
                  base_dir: str, path_template: str,
                  partition_cols: list[str] | None = None,
                  target_file_mb: float = 256.0,
                  est_row_bytes: int = 64,
                  compression: str = "zstd") -> str:
    """Conform → template the output directory → write parquet with a
    per-file record cap derived from the byte target.  Returns the path."""
    schema, attrs = registry.get(name)
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
