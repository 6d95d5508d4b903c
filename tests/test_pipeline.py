"""End-to-end pipeline test: catalog → resolve → execute (calc-DSL +
resample) → templated sink → ledger, on synthetic gridded data."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from access_mopper_spark.plans.pipeline import (MappingRow, bind_inputs,
                                                execute_mapping, run_pipeline)
from access_mopper_spark.sinks.writer import SchemaRegistry

DIMS = ["time", "lat", "lon"]


@pytest.fixture(scope="module")
def grids(spark):
    """Two aligned 6-hourly variables on a 2x2 grid over 4 days."""
    times = pd.date_range("2000-01-01", periods=16, freq="6h")
    rows = []
    for t in times:
        for lat in (-10.0, 10.0):
            for lon in (0.0, 90.0):
                base = t.day * 10 + lat / 10 + lon / 90
                rows.append((t.to_pydatetime(), lat, lon, float(base)))
    a = spark.createDataFrame(rows, DIMS + ["value"])
    b = a.withColumn("value", F.col("value") * 2)
    return {"fld_a": a, "fld_b": b}


def test_bind_inputs_aligns_on_dims(grids):
    bound = bind_inputs(grids, ["fld_a", "fld_b"], DIMS)
    assert bound.columns == DIMS + ["var0", "var1"]
    r = bound.where("lat = 10 AND lon = 90").orderBy("time").first()
    assert r["var1"] == 2 * r["var0"]


def test_execute_calc_only(spark, grids):
    row = MappingRow("sum_ab", ["fld_a", "fld_b"], "var[0] + var[1]",
                     frequency="6hr")
    out = execute_mapping(spark, row, grids, DIMS)
    r = out.where("lat = -10 AND lon = 0").orderBy("time").first()
    assert r["value"] == pytest.approx(3 * (1 * 10 + -1 + 0))


def test_execute_with_resample_daily_mean(spark, grids):
    row = MappingRow("tas_day", ["fld_a"], None, frequency="day",
                     resample="1 day", reducer="mean")
    out = execute_mapping(spark, row, grids, DIMS)
    # 16 6-hourly steps -> closed-right daily bins; per (lat,lon) cell
    per_cell = out.where("lat = 10 AND lon = 0").count()
    assert per_cell == 5  # closed-right: midnight points close the previous day
    assert "value" in out.columns


def test_run_pipeline_writes_and_ledgers(spark, grids, tmp_path):
    registry = SchemaRegistry()
    rows = [
        MappingRow("sum_ab", ["fld_a", "fld_b"], "var[0] + var[1]",
                   attrs={"table": "Amon"}),
        MappingRow("broken", ["missing_var"], None),
    ]
    ledger = run_pipeline(spark, rows, grids, DIMS, registry,
                          str(tmp_path), "{table}/{cmor_var}")
    status = {r["task_id"]: r["status"] for r in ledger.df.collect()}
    assert status == {"sum_ab": "processed", "broken": "failed"}
    back = spark.read.parquet(str(tmp_path / "Amon" / "sum_ab"))
    assert back.count() == 64
    got = back.where("lat = 10 AND lon = 90").orderBy("time").first()
    src = grids["fld_a"].where("lat = 10 AND lon = 90").orderBy("time").first()
    assert got["value"] == pytest.approx(3 * src["value"])


def test_run_pipeline_resume_skips_processed(spark, grids, tmp_path):
    registry = SchemaRegistry()
    rows = [MappingRow("sum_ab", ["fld_a", "fld_b"], "var[0] + var[1]",
                       attrs={"table": "Amon"}),
            MappingRow("broken", ["missing_var"], None)]
    first = run_pipeline(spark, rows, grids, DIMS, registry,
                         str(tmp_path), "{table}/{cmor_var}")
    # fix the broken row, resume: only the failed task re-runs
    rows2 = [MappingRow("sum_ab", ["fld_a", "fld_b"], "var[0] * 999",
                        attrs={"table": "Amon"}),  # would change output if re-run
             MappingRow("broken", ["fld_a"], None, attrs={"table": "Amon"})]
    second = run_pipeline(spark, rows2, grids, DIMS, registry,
                          str(tmp_path), "{table}/{cmor_var}", resume=first)
    status = {r["task_id"]: r["status"] for r in second.df.collect()}
    assert status == {"sum_ab": "processed", "broken": "processed"}
    # sum_ab was NOT recomputed (still var0+var1, not var0*999)
    back = spark.read.parquet(str(tmp_path / "Amon" / "sum_ab"))
    got = back.where("lat = 10 AND lon = 90").orderBy("time").first()
    src = grids["fld_a"].where("lat = 10 AND lon = 90").orderBy("time").first()
    assert got["value"] == pytest.approx(3 * src["value"])


def test_curate_documents_filters_dedups_splits(spark):
    from pyspark.sql import functions as F
    from access_mopper_spark.plans.curation import curate_documents
    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 1
        (3, "too short"),                                                  # < 10 tokens
        # 13 tokens → 11 identical 3-grams → repetition 1 − 1/11 ≈ 0.909
        (4, "spam spam spam spam spam spam spam spam spam spam spam spam spam"),
        (5, "one two three four five six seven eight nine ten eleven"),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in curate_documents(docs).collect()}
    assert set(out) == {1, 5}            # 2 deduped into 1; 3, 4 filtered
    assert out[1].n_tokens == 10
    assert all(r.split in ("train", "val") for r in out.values())
    again = {r.doc_id: r.split for r in curate_documents(docs).collect()}
    assert again == {k: v.split for k, v in out.items()}   # reproducible
