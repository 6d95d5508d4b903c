"""Cross-engine guard for the portable rounding convention (round 4).

`functions/rounding.pround` and the oracle rewrite
(`queries._portable_round_sql`) must be the IDENTICAL IEEE double
sequence — any divergence reintroduces the per-round value-hash flaps
(r1 q_token_count; r3 q_ocnrmadvect / q_dup_ngrams / q_corpus_report)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from access_mopper_spark.functions.rounding import pround
from access_mopper_spark.queries import _portable_round_sql


def _duck_eval(vals, digits):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in vals])
    sql = _portable_round_sql(f"SELECT ROUND(v, {digits}) AS r FROM t")
    assert "ROUND" not in sql.upper().replace("FLOOR", "")  # rewrite fired
    return [r[0] for r in con.execute(sql).fetchall()]


@pytest.mark.parametrize("digits", [2, 6, 9])
def test_pround_bit_identical_to_rewritten_oracle(spark, digits):
    rng = np.random.default_rng(42)
    vals = list(rng.uniform(-1e6, 1e6, 200))
    # tie-adjacent values: the exact surfaces HALF_UP/HALF_EVEN disagree on
    grid = 10.0 ** -digits
    vals += [k * grid + grid / 2 for k in range(-5, 6)]
    vals += [123.4567895, -123.4567895, 43.4728125, 0.0, -0.0, 1e-12]

    df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
    got = [r["r"] for r in
           df.select(pround(F.col("v"), digits).alias("r"))
             .collect()]
    want = _duck_eval(vals, digits)
    for g, w, v in zip(got, want, vals):
        assert float(g) == float(w), (v, g, w)


def test_round_rewrite_handles_nesting_and_no_scale():
    sql = "SELECT ROUND(ROUND(x, 6) + ROUND(y), 2) FROM t"
    out = _portable_round_sql(sql)
    assert "ROUND" not in out
    assert out.count("FLOOR") == 3
    # non-literal scale left untouched
    keep = _portable_round_sql("SELECT ROUND(x, n) FROM t")
    assert "ROUND(x, n)" in keep


def test_round_rewrite_quote_aware():
    sql = "SELECT ROUND(len(replace(s, 'ROUND(', '')), 6) FROM t"
    out = _portable_round_sql(sql)
    assert "'ROUND('" in out          # literal untouched
    assert out.startswith("SELECT (FLOOR(")
