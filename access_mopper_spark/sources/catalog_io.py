"""Catalog file formats: ``;``-delimited varlist CSVs, comment-sectioned
map templates, and variable-definition JSON.

Reference formats (SURVEY.md §2.1 CSV/JSON source rows):

- varlist CSV: ``;``-separated, one header row (write_varlist,
  mopdb_utils.py:490-571; read back :598-626).
- map template CSV: same delimiter, with ``#``-prefixed section header
  comments separating match tiers (write_map_template,
  mopdb_utils.py:744-798).
- CMOR table JSON: ``{"Header": {...}, "variable_entry": {name: {...}}}``
  (create_var_map, mop_setup.py:269-283) — a schema registry, read into
  one row per variable.

Catalogs are small; these run through Spark's CSV/JSON readers so the
same code path works when a "varlist" is a billion-row inventory.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VARLIST_COLUMNS = [
    "name", "cmor_var", "units", "dimensions", "frequency", "realm",
    "cell_methods", "cmor_table", "vtype", "size", "nsteps",
    "filename", "long_name", "standard_name",
]


def write_varlist(df: DataFrame, path: str) -> None:
    """Write a varlist CSV: ``;``-delimited with header, single file per
    partition (varlists are catalog-sized)."""
    df.write.mode("overwrite").option("sep", ";").option("header", True).csv(path)


def read_varlist(spark: SparkSession, path: str) -> DataFrame:
    """Read a ``;``-delimited varlist CSV with header."""
    return (spark.read.option("sep", ";").option("header", True)
            .option("inferSchema", True).csv(path))


def read_map_template(spark: SparkSession, path: str) -> DataFrame:
    """Read a sectioned map-template CSV: ``#`` comment lines delimit
    match-tier sections; data rows are ``;``-delimited. Spark's ``comment``
    option drops the section markers; the tier survives as a data column
    (the reference re-derives it the same way when loading a template)."""
    return (spark.read.option("sep", ";").option("header", True)
            .option("comment", "#").csv(path))


def write_map_template(df: DataFrame, path: str, tier_col: str = "match_tier",
                       tier_order: list[str] | None = None) -> None:
    """Write a map template partitioned by match tier — each tier becomes
    a directory (the distributed analogue of the reference's in-file
    comment sections), readable back as one DataFrame with the tier as a
    partition column."""
    writer = df.write.mode("overwrite").option("sep", ";").option("header", True)
    writer.partitionBy(tier_col).csv(path)


def read_cmor_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a CMOR-table JSON (schema registry) into one row per variable
    entry with the table header attrs as columns.

    The file is a single small JSON object — parsed driver-side (it IS
    metadata), then parallelized; the returned DataFrame broadcasts into
    planning joins."""
    with open(path) as fh:
        doc = json.load(fh)
    header = doc.get("Header", {})
    entries = doc.get("variable_entry", {})
    rows = []
    for name, entry in entries.items():
        rows.append({
            "variable": name,
            "units": entry.get("units"),
            "dimensions": entry.get("dimensions"),
            "cell_methods": entry.get("cell_methods"),
            "frequency": entry.get("frequency"),
            "standard_name": entry.get("standard_name"),
            "long_name": entry.get("long_name"),
            "valid_min": str(entry.get("valid_min", "")),
            "valid_max": str(entry.get("valid_max", "")),
            "table_id": str(header.get("table_id", "")),
            "realm": str(header.get("realm", "")),
        })
    cols = ("variable units dimensions cell_methods frequency standard_name "
            "long_name valid_min valid_max table_id realm").split()
    schema = ", ".join(f"{c} string" for c in cols)
    return spark.createDataFrame([[r[c] for c in cols] for r in rows], schema)


def infer_varlist(spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
    """Schema-inference crawl (write_varlist semantics, mopdb_utils.py:
    490-571): walk the given datasets' schemas and emit one row per
    column with name/dtype/table — the ingest-side 'what variables exist'
    inventory, built from catalog metadata (no data scan)."""
    rows = []
    for tname, df in tables.items():
        for f in df.schema.fields:
            rows.append((f.name, tname, f.dataType.simpleString(), f.nullable))
    return spark.createDataFrame(rows, ["name", "table", "dtype", "nullable"])


# ---------------------------------------------------------------- dreq
# CMIP data-request workflow (cmip_utils.py:33-146): the dreq is a
# tab-delimited export whose col0 is the MIP table, col12 the CMOR name,
# col28 the requesting MIPs, col31 the requested years.  Spark-first:
# one csv scan, distinct/filter/split as Column ops — the dreq is small,
# but expressing it declaratively keeps it composable with the catalog
# joins (and broadcastable into them).

_DREQ_HEADER_SENTINELS = ("Notes", "MIP table", "0")


def read_dreq(spark: SparkSession, path: str) -> DataFrame:
    """Scan a tab-delimited dreq export positionally (_c0, _c1, ...) —
    the reference reads it with csv.reader(delimiter='\\t'), no header
    row (cmip_utils.py:40-44)."""
    return spark.read.csv(path, sep="\t", header=False, inferSchema=False)


def find_cmip_tables(dreq: DataFrame) -> DataFrame:
    """Distinct MIP tables in the dreq, prefixed CMIP6_
    (find_cmip_tables, cmip_utils.py:33-47); the Notes/header/0
    sentinel rows are dropped."""
    return (
        dreq.where(~F.col("_c0").isin(*_DREQ_HEADER_SENTINELS)
                   & F.col("_c0").isNotNull())
        .select(F.concat(F.lit("CMIP6_"), F.col("_c0")).alias("table"))
        .distinct()
    )


def reallocate_years(years: list[int], reference_date: str) -> list[int]:
    """Shift dreq years onto a pre-1850 reference calendar
    (reallocate_years, cmip_utils.py:50-59)."""
    ref = int(str(reference_date)[:4])
    if ref < 1850:
        return [y - 1850 + ref for y in years]
    return list(years)


def fix_years(years: list[str], tstart: str, tend: str):
    """Clamp the experiment window to the dreq years span (fix_years,
    cmip_utils.py:62-93): inside → unchanged; overlapping → clamped to
    year bounds; disjoint → (None, tend) meaning 'skip'."""
    if tstart >= years[0]:
        pass
    elif tstart < years[0] <= tend:
        tstart = years[0] + "0101T0000"
    else:
        tstart = None
    if tend <= years[-1]:
        pass
    elif tend > years[-1] and tstart is not None and tstart <= years[-1]:
        tend = years[-1] + "1231T2359"
    else:
        tstart = None
    return tstart, tend


def read_dreq_vars(dreq: DataFrame, table_id: str, activity_id: str) -> DataFrame:
    """Variables of one MIP table requested by one activity
    (read_dreq_vars, cmip_utils.py:97-146): filter col0 == table_id,
    drop blank/header CMOR names, keep rows whose comma-separated MIP
    list (col28) contains the activity; col31 carries the requested
    years ('All...' → 'all', else the literal list text).  Returns
    (cmor_name, dreq_years) — the reference's dict as a DataFrame, ready
    to broadcast into a catalog intersection join."""
    mips = F.split(F.col("_c28"), ",")
    years_raw = F.col("_c31")
    years = (F.when(years_raw.isNull() | (years_raw == "") | years_raw.contains("All"),
                    F.lit("all"))
             .otherwise(years_raw))
    return (
        dreq.where((F.col("_c0") == table_id)
                   & ~F.col("_c12").isin("", "CMOR Name")
                   & F.col("_c12").isNotNull()
                   & F.array_contains(mips, activity_id))
        .select(F.col("_c12").alias("cmor_name"), years.alias("dreq_years"))
        .dropDuplicates(["cmor_name"])
    )


def dreq_intersection(varlist: DataFrame, dreq_vars: DataFrame,
                      name_col: str = "cmor_name") -> DataFrame:
    """Restrict a catalog varlist to the dreq request — the workflow's
    point: a broadcast semi-join (the dreq side is tiny)."""
    return varlist.join(F.broadcast(dreq_vars.select(name_col)), name_col, "semi")
