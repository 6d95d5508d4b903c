"""Planner (frequency ladder, file split, task ledger), sink writer,
multimodal plumbing, streaming resample — unit tests at smoke scale."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from access_mopper_spark.plans.planner import (FREQ_LADDER, TaskLedger,
                                               nearest_frequency,
                                               plan_output_files)
from access_mopper_spark.sinks.writer import (SchemaRegistry, conform,
                                              render_template, write_dataset)


def test_nearest_frequency_tiers(spark):
    req = spark.createDataFrame(
        [("tas", "mon"), ("pr", "day"), ("zg", "10min"), ("uo", "yr")],
        ["var", "frequency"])
    avail = spark.createDataFrame(
        [("tas", "mon"), ("pr", "3hr"), ("pr", "1hr"), ("uo", "10yr")],
        ["var", "frequency"])
    out = {r["var"]: r for r in
           nearest_frequency(req, avail, ["var"]).collect()}
    # exact match: no resample
    assert out["tas"]["src_frequency"] == "mon" and out["tas"]["needs_resample"] is False
    # nearest finer: 3hr (closer to day on the ladder than 1hr)
    assert out["pr"]["src_frequency"] == "3hr" and out["pr"]["needs_resample"] is True
    # nothing finer-or-equal available -> no_match tier
    assert out["zg"]["src_frequency"] is None and out["zg"]["needs_resample"] is None
    # only coarser available -> also no_match (can't upsample implicitly)
    assert out["uo"]["src_frequency"] is None


def test_ladder_is_reference_order():
    assert FREQ_LADDER[0] == "10yr" and FREQ_LADDER[-1] == "10min"
    assert FREQ_LADDER.index("mon") < FREQ_LADDER.index("day")


def test_plan_output_files_bounds(spark):
    vars_df = spark.createDataFrame(
        [("v_small", 1.0, 10), ("v_big", 300.0, 5), ("v_exact", 50.0, 4)],
        ["var", "size_per_step", "nsteps"])
    rows = plan_output_files(vars_df, "size_per_step", "nsteps",
                             max_size=100.0, key_cols=["var"]).collect()
    by_var = {}
    for r in rows:
        by_var.setdefault(r["var"], []).append(r)
    # 1 MB/step, 100 MB cap -> all 10 steps in one file
    assert len(by_var["v_small"]) == 1
    assert by_var["v_small"][0]["step_end"] == 10
    # oversize steps still get one step per file (floor clamps to >=1)
    assert len(by_var["v_big"]) == 5
    assert all(r["step_end"] - r["step_start"] == 1 for r in by_var["v_big"])
    # 50 MB/step -> 2 steps per file, 2 files, contiguous non-overlapping
    segs = sorted((r["step_start"], r["step_end"]) for r in by_var["v_exact"])
    assert segs == [(0, 2), (2, 4)]


def test_adjust_plev_size_reference_semantics(spark):
    # reference adjust_size (setup_utils.py:405-424): plevinterp rescales
    # insize by target-levels/source-levels; anything else is untouched
    from access_mopper_spark.plans.planner import adjust_plev_size
    df = spark.createDataFrame(
        [("plevinterp(var, plev, 19)", 7000.0, 70),
         ("plevinterp(ta, plev8, 8)", 1000.0, 50),
         ("mask(var)", 1234.0, 70),
         ("", 999.0, 10),
         ("plevinterp(broken", 4200.0, 42)],   # no comma -> NULL-safe
        ["calculation", "insize", "levnum"])
    out = df.withColumn(
        "g", adjust_plev_size("insize", "calculation", "levnum")).collect()
    assert out[0]["g"] == pytest.approx(7000.0 / 70 * 19)
    assert out[1]["g"] == pytest.approx(1000.0 / 50 * 8)
    assert out[2]["g"] == 1234.0
    assert out[3]["g"] == 999.0
    assert out[4]["g"] is None   # malformed plev parses NULL, not error


def test_choose_file_interval_ladder(spark):
    # reference compute_fsize (setup_utils.py:428-482)
    from access_mopper_spark.plans.planner import choose_file_interval
    mb = 1048576.0
    df = spark.createDataFrame(
        [  # (grid bytes/step, freq, span days)
         ("whole_span", 1.0 * mb, "day", 30),     # 30 MB total -> one file
         ("monthly",    3.0 * mb, "day", 3000),   # day1=3MB: months=1 (90<=110)
         ("weekly",    15.0 * mb, "day", 3000),   # day1=15: days=7 (105<=110)
         ("fallthrough", 600.0 * mb, "1hr", 30),  # even 0.25d = 3600MB > cap
         ("fx_one_file", 500.0 * mb, "fx", 1000), # fx nstep tiny -> whole span
        ],
        ["var", "grid_size", "frequency", "span_days"])
    out = {r["var"]: r for r in
           choose_file_interval(df, "grid_size", "frequency", "span_days",
                                max_size=100.0).collect()}
    assert out["whole_span"]["interval"] == "days=30"
    assert out["whole_span"]["interval_size_mb"] == pytest.approx(30.0)
    assert out["monthly"]["interval"] == "months=1"
    assert out["monthly"]["interval_size_mb"] == pytest.approx(90.0)
    assert out["weekly"]["interval"] == "days=7"
    # reference loop exhausts still holding days=0.25
    assert out["fallthrough"]["interval"] == "days=0.25"
    assert out["fallthrough"]["interval_size_mb"] == pytest.approx(3600.0)
    # 'set small number for fx frequency so it always create only one file'
    # (fx nstep=1/5000 -> 500 MB/step x 1000 days = 100 MB <= 110 cap)
    assert out["fx_one_file"]["interval"] == "days=1000"


def test_task_ledger_idempotent(spark):
    plan = spark.createDataFrame([(1,), (2,), (3,)], ["task_id"])
    ledger = TaskLedger(plan)
    assert ledger.pending().count() == 3
    done = spark.createDataFrame([(1, "processed"), (3, "failed")],
                                 ["task_id", "status"])
    l2 = ledger.mark(done)
    assert l2.pending().count() == 1
    # re-applying the same outcomes changes nothing (idempotent restart)
    l3 = l2.mark(done)
    assert l3.pending().count() == 1
    assert {r["status"] for r in l3.df.collect()} == {"processed", "failed", "unprocessed"}


OUT_SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", DoubleType()),
])


def test_conform_rejects_and_casts(spark):
    df = spark.createDataFrame([(1, 2)], ["k", "v"])
    out = conform(df, OUT_SCHEMA)
    assert [f.dataType for f in out.schema.fields] == [LongType(), DoubleType()]
    with pytest.raises(ValueError, match="missing.*extra"):
        conform(df.withColumnRenamed("v", "w"), OUT_SCHEMA)


def test_render_template():
    attrs = {"activity": "CMIP", "var": "tas", "version": "v1"}
    assert render_template("{activity}/{var}/{version}", attrs) == "CMIP/tas/v1"
    with pytest.raises(KeyError):
        render_template("{missing}", attrs)


def test_write_dataset_roundtrip(spark, tmp_path):
    reg = SchemaRegistry()
    reg.register("out_tas", OUT_SCHEMA, {"var": "tas", "table": "Amon"})
    df = spark.range(100).select(F.col("id").alias("k"),
                                 (F.col("id") * 1.5).alias("v"))
    path = write_dataset(df, reg, "out_tas", str(tmp_path), "{table}/{var}")
    assert path.endswith("Amon/tas")
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.schema == OUT_SCHEMA


def test_multimodal_decode_stub_gates():
    from access_mopper_spark.operators.multimodal import decode_stub
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x00\x01", "image/png")
    assert decode_stub(b"\x00\x01", "image/png", fake=True) == (1, 2)


def test_frame_sample_shape(spark):
    from access_mopper_spark.operators.multimodal import frame_sample
    df = spark.createDataFrame([(1, bytearray(b"a" * 40))], ["doc_id", "payload"])
    rows = frame_sample(df, every=16, max_frames=4).collect()
    # 40 bytes / 16 -> frames at 0,16,32 (idx 0..2)
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert bytes(rows[1]["frame_bytes"]) == b"a" * 16
    assert bytes(rows[2]["frame_bytes"]) == b"a" * 8


def test_stream_resample_matches_batch(spark, sf_dir):
    from access_mopper_spark.queries import QUERIES
    from access_mopper_spark.sources.readers import load_table

    out = QUERIES["q_stream_resample"](spark, sf_dir)
    got = {(r["user_id"], r["ts"]): r["value_mean"] for r in out.collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {(r["user_id"], r["ts"]): r["m"] for r in
            ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts"))
              .agg(F.round(F.avg("value"), 6).alias("m")).collect()}
    assert got == want


def test_partitioned_sink_enables_pruning(spark, tmp_path):
    """DRS partition columns must come back as partition-pruned scans:
    reading one partition shows PartitionFilters, not a full scan."""
    import contextlib
    import io

    reg = SchemaRegistry()
    schema = StructType([
        StructField("table", StringType()),
        StructField("k", LongType()),
        StructField("v", DoubleType()),
    ])
    reg.register("out_part", schema, {"var": "tas"})
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, "Amon").otherwise("Omon").alias("table"),
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    path = write_dataset(df, reg, "out_part", str(tmp_path), "{var}",
                         partition_cols=["table"])
    back = spark.read.parquet(path).where(F.col("table") == "Amon")
    assert back.count() == 500
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the partition predicate must be IN the partition filters, pruning
    # the Omon directory without opening its files
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "table" in pf_line and "Amon" in pf_line


def test_add_axis_singleton_dim(spark):
    from access_mopper_spark.operators.aggregates import add_axis
    df = spark.range(3).select(F.col("id").alias("k"))
    out = add_axis(df, "height", 2.0)
    assert out.columns == ["k", "height"]
    assert {r["height"] for r in out.collect()} == {2.0}


# ------------------------- CMOR sink metadata (round 3) -------------------

def test_validate_attrs_cv(spark):
    from access_mopper_spark.sinks.writer import DEFAULT_CV, validate_attrs
    good = {"source_id": "ACCESS-CM2", "source": "ACCESS-CM2 model",
            "experiment_id": "historical", "frequency": "mon",
            "realm": "ocean", "calendar": "360_day",
            "table_id": "Omon", "variant_label": "r1i1p1f1"}
    assert validate_attrs(good) is good
    # bad CV value
    with pytest.raises(ValueError, match="frequency='fortnightly'"):
        validate_attrs({**good, "frequency": "fortnightly"})
    # missing required key
    bad = dict(good); del bad["realm"]
    with pytest.raises(ValueError, match="missing required attribute 'realm'"):
        validate_attrs(bad)
    # template placeholders become required too
    with pytest.raises(ValueError, match="missing required attribute 'version'"):
        validate_attrs(good, path_template="{experiment_id}/{version}")
    # every violation reported, not just the first
    try:
        validate_attrs({**bad, "calendar": "martian"})
    except ValueError as e:
        assert "realm" in str(e) and "martian" in str(e)


def test_edit_cv_document(spark):
    """edit_json_cv mirror (cmip_utils.py:149-202): new activity and
    experiment entries register; existing experiments are overwritten;
    the input document is never mutated."""
    from access_mopper_spark.sinks.writer import edit_cv_document
    cv = {"CV": {"activity_id": {"CMIP": "CMIP"},
                 "experiment_id": {"historical": {"experiment": "historical"}}}}
    attrs = {"activity_id": "FAFMIP", "experiment_id": "faf-passiveheat",
             "parent_activity_id": "CMIP", "parent_experiment_id":
             "piControl", "source_type": "AOGCM"}
    out = edit_cv_document(cv, attrs)
    assert out["CV"]["activity_id"]["FAFMIP"] == "FAFMIP"
    e = out["CV"]["experiment_id"]["faf-passiveheat"]
    assert e["parent_experiment_id"] == ["piControl"]
    assert e["required_model_components"] == ["AOGCM"]
    assert e["sub_experiment_id"] == ["none"]
    # existing experiment overwritten (reference's 'found, updating' path)
    again = edit_cv_document(out, {**attrs, "experiment_id": "historical"})
    assert again["CV"]["experiment_id"]["historical"]["activity_id"] == ["FAFMIP"]
    # input untouched
    assert "FAFMIP" not in cv["CV"]["activity_id"]
    assert list(out["CV"]) == ["activity_id", "experiment_id"]  # order kept


def test_write_dataset_cv_gate(spark, tmp_path):
    from access_mopper_spark.sinks.writer import SchemaRegistry, write_dataset
    reg = SchemaRegistry()
    schema = StructType([StructField("v", DoubleType())])
    reg.register("out", schema, {"experiment_id": "historical", "frequency": "bad-freq",
                                 "source_id": "x", "source": "y", "realm": "ocean",
                                 "calendar": "noleap", "table_id": "Omon",
                                 "variant_label": "r1i1p1f1"})
    df = spark.range(3).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="bad-freq"):
        write_dataset(df, reg, "out", str(tmp_path), "{experiment_id}", cv=True)
    # cv=None keeps legacy behavior (no validation)
    path = write_dataset(df, reg, "out", str(tmp_path), "{experiment_id}")
    assert spark.read.parquet(path).count() == 3


def test_attach_zfactors(spark):
    from access_mopper_spark.sinks.writer import attach_zfactors
    data = spark.createDataFrame(
        [(lev, j, i, float(lev * 10 + j + i)) for lev in (1, 2)
         for j in (0, 1) for i in (0, 1)],
        ["lev", "j", "i", "ta"])
    b = spark.createDataFrame(
        [(1, 0.99, 0.985, 0.995), (2, 0.95, 0.945, 0.955)],
        ["lev", "b", "b_lo", "b_hi"])
    orog = spark.createDataFrame(
        [(0, 0, 100.0), (0, 1, 120.0), (1, 0, 140.0), (1, 1, 160.0)],
        ["j", "i", "orog"])
    out = attach_zfactors(data, "hybrid_height", b, orog,
                          expected_levels=[1, 2])
    assert set(out.columns) >= {"b", "b_bnds_lo", "b_bnds_hi", "orog"}
    row = out.where((F.col("lev") == 2) & (F.col("j") == 1) & (F.col("i") == 0)).first()
    assert row["b"] == 0.95 and row["orog"] == 140.0
    # half-level axis renames the coefficient (hybrid_dict, mop_utils.py:521)
    out2 = attach_zfactors(data, "hybrid_height_half", b, orog)
    assert "b_half" in out2.columns
    # unknown axis and missing level both fail fast
    with pytest.raises(KeyError):
        attach_zfactors(data, "sigma", b, orog)
    with pytest.raises(ValueError, match=r"\[3\]"):
        attach_zfactors(data, "hybrid_height", b, orog, expected_levels=[1, 2, 3])
    # broadcast join shape: no shuffle of the data side
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
