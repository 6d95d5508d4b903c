"""Catalog file-format roundtrips (varlist CSV, map template, CMOR JSON)."""

import json

from access_mopper_spark.sources.catalog_io import (infer_varlist,
                                                    read_cmor_table,
                                                    read_map_template,
                                                    read_varlist,
                                                    write_map_template,
                                                    write_varlist)


def test_varlist_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("fld_s03i236", "tas", "K", "time lat lon", "1hr"),
         ("fld_s05i216", "pr", "kg m-2 s-1", "time lat lon", "1hr")],
        ["name", "cmor_var", "units", "dimensions", "frequency"])
    path = str(tmp_path / "varlist")
    write_varlist(df, path)
    back = read_varlist(spark, path)
    assert sorted(r["cmor_var"] for r in back.collect()) == ["pr", "tas"]
    assert back.columns == df.columns


def test_map_template_sections(spark, tmp_path):
    df = spark.createDataFrame(
        [("tas", "fld_s03i236", "full"), ("pr", "fld_s05i216", "no_frq"),
         ("zg", "fld_s30i297", "no_match")],
        ["cmor_var", "input_vars", "match_tier"])
    path = str(tmp_path / "template")
    write_map_template(df, path)
    back = read_map_template(spark, path)
    tiers = {r["cmor_var"]: r["match_tier"] for r in back.collect()}
    assert tiers == {"tas": "full", "pr": "no_frq", "zg": "no_match"}


def test_read_cmor_table(spark, tmp_path):
    doc = {
        "Header": {"table_id": "Table Amon", "realm": "atmos"},
        "variable_entry": {
            "tas": {"units": "K", "dimensions": "longitude latitude time",
                    "cell_methods": "area: time: mean", "frequency": "mon"},
            "pr": {"units": "kg m-2 s-1", "dimensions": "longitude latitude time",
                   "frequency": "mon"},
        },
    }
    p = tmp_path / "CMIP6_Amon.json"
    p.write_text(json.dumps(doc))
    df = read_cmor_table(spark, str(p))
    rows = {r["variable"]: r for r in df.collect()}
    assert rows["tas"]["units"] == "K"
    assert rows["pr"]["cell_methods"] is None
    assert rows["tas"]["table_id"] == "Table Amon"


def test_infer_varlist(spark, sf_dir):
    from access_mopper_spark.sources.readers import load_tables
    tables = load_tables(spark, sf_dir, ("region", "nation"))
    inv = infer_varlist(spark, tables)
    rows = inv.collect()
    names = {(r["table"], r["name"]) for r in rows}
    assert ("nation", "n_name") in names and ("region", "r_regionkey") in names
    dtypes = {r["name"]: r["dtype"] for r in rows}
    assert dtypes["n_nationkey"] == "int"


def test_tiered_join_brings_payload(spark):
    from access_mopper_spark.catalog.matching import tiered_join
    left = spark.createDataFrame(
        [("tas", "1hr", "CM2"), ("pr", "3hr", "CM2"), ("zg", "day", "OM2")],
        ["var", "freq", "model"])
    right = spark.createDataFrame(
        [("tas", "1hr", "CM2", "calcA"), ("pr", "3hr", "ESM", "calcB")],
        ["var", "freq", "model", "calculation"])
    out = tiered_join(left, right,
                      [("full", ["var", "freq", "model"]),
                       ("no_ver", ["var", "freq"])])
    rows = {r["var"]: r for r in out.collect()}
    assert rows["tas"]["match_tier"] == "full" and rows["tas"]["calculation"] == "calcA"
    # pr matches only once version is dropped; payload still carried
    assert rows["pr"]["match_tier"] == "no_ver" and rows["pr"]["calculation"] == "calcB"
    # left's own model value is preserved (not overwritten by the match)
    assert rows["pr"]["model"] == "CM2"
    assert rows["zg"]["match_tier"] == "no_match" and rows["zg"]["calculation"] is None


# ----------------------------- dreq workflow (cmip_utils.py:33-146) ----

def _dreq_fixture(spark, tmp_path):
    """Minimal tab-delimited dreq: 32 positional columns like the export."""
    def row(c0, cmor="", mips="", years=""):
        cells = [""] * 32
        cells[0], cells[12], cells[28], cells[31] = c0, cmor, mips, years
        return "\t".join(cells)

    lines = [
        row("Notes", "Notes on tables"),
        row("MIP table", "CMOR Name"),
        row("0"),
        row("Amon", "tas", "CMIP,ScenarioMIP", "All years"),
        row("Amon", "pr", "HighResMIP", "All years"),
        row("Amon", "psl", "CMIP", "[1850, 1900]"),
        row("Amon", ""),                       # blank cmor name → dropped
        row("Omon", "tos", "CMIP", "All years"),
    ]
    p = tmp_path / "dreq.tsv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_find_cmip_tables(spark, tmp_path):
    from access_mopper_spark.sources.catalog_io import find_cmip_tables, read_dreq
    dreq = read_dreq(spark, _dreq_fixture(spark, tmp_path))
    got = {r["table"] for r in find_cmip_tables(dreq).collect()}
    assert got == {"CMIP6_Amon", "CMIP6_Omon"}  # sentinels dropped


def test_read_dreq_vars_activity_filter(spark, tmp_path):
    from access_mopper_spark.sources.catalog_io import read_dreq, read_dreq_vars
    dreq = read_dreq(spark, _dreq_fixture(spark, tmp_path))
    got = {r["cmor_name"]: r["dreq_years"]
           for r in read_dreq_vars(dreq, "Amon", "CMIP").collect()}
    # pr is HighResMIP-only → excluded; years text passes through,
    # 'All years' normalizes to 'all'
    assert got == {"tas": "all", "psl": "[1850, 1900]"}


def test_dreq_intersection(spark, tmp_path):
    from access_mopper_spark.sources.catalog_io import (dreq_intersection,
                                                        read_dreq,
                                                        read_dreq_vars)
    dreq = read_dreq(spark, _dreq_fixture(spark, tmp_path))
    dv = read_dreq_vars(dreq, "Amon", "CMIP")
    varlist = spark.createDataFrame(
        [("tas", "K"), ("uas", "m s-1"), ("psl", "Pa")], ["cmor_name", "units"])
    got = {r["cmor_name"] for r in dreq_intersection(varlist, dv).collect()}
    assert got == {"tas", "psl"}


def test_fix_years_and_reallocate():
    from access_mopper_spark.sources.catalog_io import fix_years, reallocate_years
    ys = ["1850", "1900"]
    assert fix_years(ys, "1870", "1890") == ("1870", "1890")       # inside
    assert fix_years(ys, "1840", "1890") == ("18500101T0000", "1890")  # clamp lo
    assert fix_years(ys, "1870", "1950") == ("1870", "19001231T2359")  # clamp hi
    assert fix_years(ys, "1950", "1960")[0] is None                # disjoint
    assert reallocate_years([1850, 1851], "0950") == [950, 951]
    assert reallocate_years([1850, 1851], "1950") == [1850, 1851]
