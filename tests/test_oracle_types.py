"""Oracle output-type portability gate (round 8).

The round-3..7 driver hash-fails (23 exposures, 23 fails, 0 passes —
perfectly correlated with the r07 bisection-probe vector) were all
DuckDB ``SUM(integer) -> HUGEINT`` landing in pandas as float64 and
rendering ``3.0`` against Spark's BIGINT ``3``.  The local gate
canonicalizes integral floats to int (tools/check_correctness.canon),
which is why no local instrument could reproduce the driver's strict
rendering.  queries._ORACLE_OUTPUT_CASTS wraps every affected oracle;
this test DESCRIBEs the WRAPPED registry against the real testdata views
and fails if any oracle output column is HUGEINT/UHUGEINT/DECIMAL — so a
new oracle with a bare integer SUM can't silently reintroduce the seam.
"""

import os

import duckdb
import pytest

from access_mopper_spark.queries import ORACLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

NON_PORTABLE = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * "
                  f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_no_hugeint_decimal_oracle_outputs(con):
    """DATE is deliberately NOT flagged: the r8 q_probe_date_render
    driver exposure PASSED on a raw DATE cell, adjudicating that the
    DuckDB-DATE->pandas rendering is hash-compatible with Spark's
    datetime.date — DATE outputs ship natively since r9."""
    offenders = {}
    for name, sql in ORACLES.items():
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(c[0], c[1]) for c in cols
               if c[1] in NON_PORTABLE or c[1].startswith("DECIMAL")]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle outputs with driver-divergent pandas rendering "
        f"(wrap via _ORACLE_OUTPUT_CASTS / tools/gen_oracle_casts.py): "
        f"{offenders}")


def test_spark_side_ships_native_date(con):
    """Since r9 DATE outputs ship as DATE on BOTH engines (the r8
    midnight-TIMESTAMP coercion is retired — the driver probe proved
    the rendering seam does not exist).  Both sides must agree."""
    from access_mopper_spark.queries import QUERIES, ORACLES
    from access_mopper_spark.session import get_spark
    spark = get_spark(app_name="oracle_types_test")
    df = QUERIES["q_max_concurrency"](spark, SF_DIR)
    assert dict(df.dtypes)["day"] == "date", df.dtypes
    desc = {c[0]: c[1] for c in
            con.execute(f"DESCRIBE {ORACLES['q_max_concurrency']}").fetchall()}
    assert desc["day"] == "DATE", desc


def test_strict_pandas_rendering_matches_bigint(con):
    """The driver-shaped check the local gate couldn't do: fetch an
    affected oracle via pandas and assert the cells are integer-typed
    (pre-fix they were float64 3.0-style values)."""
    sql = ORACLES["q_probe_src_counts"]
    df = con.execute(sql).fetchdf()
    assert str(df["en_docs"].dtype) == "int64", df.dtypes
    assert str(df["n_docs"].dtype) == "int64", df.dtypes
