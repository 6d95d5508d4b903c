"""PII detection and redaction for training-data curation.

Pure Column regex — ``regexp_count`` to measure, chained
``regexp_replace`` to scrub — so the scan is map-only, shuffle-free, and
runs in the same pass as language ID / quality scoring at 100 TB.

Every pattern is written in the common subset of Java regex (Spark) and
RE2 (the DuckDB oracle): character classes spelled out, non-capturing
groups, ``\\b`` word boundaries, no backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: detection patterns, applied (and redacted) in this order — email
#: first so its digit-bearing local/domain parts can't be half-eaten by
#: the ip/phone patterns.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts (non-overlapping), one Column per pattern."""
    return {kind: F.regexp_count(text, F.lit(pat)).alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS.items()}


def redact_pii(text: Column, token: str = "<PII>") -> Column:
    """Replace every PII match with ``token``, applying the patterns in
    registry order (email → ipv4 → phone)."""
    out = text
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum over a digits-only string Column — the validation
    gate that separates real payment-card numbers from arbitrary digit
    runs, so a curation redactor can scrub true positives aggressively
    without eating order ids / timestamps (regex alone cannot tell).

    Pure integer Column math: per position i (1-based from the RIGHT),
    d = digit(i), doubled on even positions with the classic −9 fold,
    all inside one ``aggregate`` over ``sequence(1, length)`` — map-
    only, engine-portable (the oracle mirrors it with a bounded
    positions join; integer sums are order-free so the parity cannot
    drift).  NULL/empty/non-digit input → NULL: a validation gate that
    sits behind regex candidate extraction must degrade a malformed
    candidate to NULL, not error the whole job — under Spark 4's ANSI
    default a bare ``.cast('int')`` on a stray non-digit character
    would do exactly that (r7 ADVICE)."""
    n = F.length(digits)

    def step(acc, i):
        d = F.substring(digits, (n - i + 1).cast("int"), 1).try_cast("int")
        dbl = F.when(i % 2 == 0, d * 2).otherwise(d)
        return acc + F.when(dbl > 9, dbl - 9).otherwise(dbl)

    total = F.aggregate(F.sequence(F.lit(1), n), F.lit(0), step)
    return F.when(digits.rlike("^[0-9]+$"), total % 10 == 0)
