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
