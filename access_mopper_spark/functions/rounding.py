"""Portable cross-engine rounding.

The driver's correctness gate value-hashes Spark results against DuckDB.
``F.round`` (BigDecimal HALF_UP on the exact decimal expansion) and
DuckDB ``ROUND`` (multiply-then-round, HALF_EVEN-ish) disagree on values
that land on a rounding tie at the target scale — three driver hash
flaps in round 3 (q_ocnrmadvect, q_dup_ngrams, q_corpus_report) and one
in round 1 all trace to this.

The portable recipe is the same IEEE-754 double sequence on BOTH sides::

    FLOOR(x * 10^n + 0.5) / 10^n

Given bit-identical inputs the output is bit-identical: multiply, add,
floor and divide are each correctly-rounded IEEE ops, so the engines
cannot disagree on ties — the only residual exposure is inputs that
already differ between engines (double summation order), which rounding
of any flavor cannot fix and which is handled by rounding large sums to
2 dp instead of 6 (see queries.py conventions).

Spark ``floor`` returns LONG while DuckDB ``FLOOR`` returns DOUBLE; the
gate canonicalizes integral floats and ints to the same token, and the
LONG→DOUBLE division result is the identical double for |x·10^n| < 2^53.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(c: Column, digits: int = 6) -> Column:
    """Half-up-toward-+inf rounding via the portable floor recipe.

    Matches the SQL rewrite applied to every oracle ``ROUND`` call
    (queries._portable_round_sql): identical double arithmetic on both
    engines, so ties cannot flip between Spark and DuckDB.
    """
    if isinstance(c, str):  # F.round accepts a column name; so do we
        c = F.col(c)
    if digits == 0:
        return F.floor(c + F.lit(0.5))
    scale = F.lit(float(10 ** digits))
    return F.floor(c * scale + F.lit(0.5)) / scale
