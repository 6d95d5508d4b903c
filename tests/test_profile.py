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


def test_skew_profile_shapes_and_nulls(spark):
    from access_mopper_spark.operators.skew import skew_profile
    df = spark.read.parquet(f"{SF}/events.parquet")
    out = skew_profile(df, ["event_type", "props"], top_n=5).collect()
    by_col = {}
    for r in out:
        by_col.setdefault(r["col_name"], []).append(r)
    for c, rows in by_col.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        cnts = [r["cnt"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cnts == sorted(cnts, reverse=True)
        assert all(0 <= r["share_bp"] <= 10000 for r in rows)
    # NULL props are a real (often the heaviest) key
    n_null = df.where(F.col("props").isNull()).count()
    if n_null:
        top_props = {r["key_value"]: r["cnt"] for r in by_col["props"]}
        if "<NULL>" in top_props:
            assert top_props["<NULL>"] == n_null


def test_skew_profile_single_scan(spark):
    from access_mopper_spark.operators.skew import skew_profile
    df = spark.read.parquet(f"{SF}/events.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        skew_profile(df, ["user_id", "event_type"]).explain()
    assert buf.getvalue().count("Scan parquet") == 1


def test_lsh_calibration_tracks_theory(spark):
    """High-similarity deciles must show (near-)certain candidacy and
    low deciles near-zero — the S-curve separation the (b, r) choice
    exists to produce; plus the theory literals bracket [0, 1e6] and
    the sample is deterministic across runs."""
    from access_mopper_spark.operators.dedup import lsh_calibration
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = {r["s_decile"]: r for r in lsh_calibration(docs).collect()}
    assert rows, "sample produced no pairs"
    for d, r in rows.items():
        assert 0 <= r["theory_ppm"] <= 1_000_000
        assert 0 <= r["n_candidates"] <= r["n_pairs"]
        assert r["sum_collide_bands"] >= r["n_candidates"]
    if 0 in rows:
        assert rows[0]["n_candidates"] <= max(1, rows[0]["n_pairs"] // 20)
    hi = [d for d in rows if d >= 9]
    for d in hi:
        assert rows[d]["n_candidates"] == rows[d]["n_pairs"]
    again = {r["s_decile"]: (r["n_pairs"], r["n_candidates"])
             for r in lsh_calibration(docs).collect()}
    assert again == {d: (r["n_pairs"], r["n_candidates"])
                     for d, r in rows.items()}


def test_profile_quirky_column_names(spark):
    """Column names containing quotes/backticks survive the stack()
    interpolation (r8 ADVICE: injection-safe escaping)."""
    from access_mopper_spark.operators.profile import profile_table
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], ["it's", "back`tick"])
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"it's", "back`tick"}
    assert out["back`tick"]["n_null"] == 1
    assert out["it's"]["min_num"] == 1.0 and out["it's"]["max_num"] == 2.0


def test_skew_profile_precomputed_n_rows(spark):
    """Passing n_rows skips the eager count and yields identical
    shares (r8 ADVICE: derived frames shouldn't pay a second scan)."""
    from access_mopper_spark.operators.skew import skew_profile
    df = spark.createDataFrame([(i % 3,) for i in range(30)], ["k"])
    a = sorted(map(tuple, skew_profile(df, ["k"]).collect()))
    b = sorted(map(tuple, skew_profile(df, ["k"], n_rows=30).collect()))
    assert a == b
    assert a[0][3] == 3333  # 10/30 in basis points
