"""Unit + plan tests for operators/profile.profile_table (round 8)."""

import contextlib
import io

from pyspark.sql import functions as F

from access_mopper_spark.operators.profile import profile_table

SF = "/root/testdata/sf0.001"


def _by_col(rows):
    return {r["column"]: r for r in rows}


def test_profile_matches_bruteforce(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    prof = _by_col(profile_table(df).collect())
    n = df.count()
    for c in df.columns:
        p = prof[c]
        assert p["n_rows"] == n
        assert p["n_null"] == df.where(F.col(c).isNull()).count()
        assert p["n_distinct"] == (
            df.where(F.col(c).isNotNull()).select(c).distinct().count())
    # numeric lane typed, string lane typed
    assert prof["doc_id"]["min_num"] == 0.0
    assert prof["doc_id"]["min_str"] is None
    assert prof["lang"]["min_num"] is None
    assert prof["lang"]["min_str"] is not None


def test_profile_timestamp_and_all_null(spark):
    df = spark.range(3).select(
        F.col("id"),
        F.lit("2024-01-02 03:04:05").cast("timestamp").alias("ts"),
        F.lit(None).cast("string").alias("gone"))
    prof = _by_col(profile_table(df).collect())
    assert prof["gone"]["n_null"] == 3
    assert prof["gone"]["n_distinct"] == 0
    assert prof["gone"]["min_str"] is None
    # timestamp min/max as epoch-micros doubles
    import datetime
    expect = datetime.datetime(2024, 1, 2, 3, 4, 5).timestamp() * 1e6
    assert prof["ts"]["min_num"] == expect == prof["ts"]["max_num"]


def test_profile_approx_mode_no_expand(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    exact = _by_col(profile_table(df).collect())
    approx = _by_col(profile_table(df, approx=True).collect())
    for c in exact:
        e, a = exact[c]["n_distinct"], approx[c]["n_distinct"]
        assert abs(a - e) <= max(3, 0.1 * e), (c, e, a)
    # scale mode: HLL sketches, no Expand in the plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_table(df, approx=True).explain()
    assert "Expand" not in buf.getvalue()


def test_profile_single_scan(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_table(df).explain()
    # one pass: exactly one scan of the parquet source
    assert buf.getvalue().count("Scan parquet") == 1
