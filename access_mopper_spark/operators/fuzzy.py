"""Fuzzy string matching (entity resolution against a dictionary).

The data-cleaning primitive for catalog and metadata tables: match
free-form strings against a reference list under a small edit-distance
budget.  Levenshtein is a JVM built-in in Spark and a native function in
DuckDB, so the whole match is oracle-checkable.

Scale shape: the dictionary side broadcasts (BroadcastNestedLoopJoin);
each corpus partition scans its rows once against the in-memory
dictionary.  A length-band predicate (|len(a) − len(b)| ≤ max_dist, a
necessary condition for edit distance ≤ max_dist) short-circuits most
candidate pairs before the O(len²) distance evaluation.  This is the
right plan when the dictionary is small (benchmarks, CV vocabularies,
gazetteer names); for corpus×corpus fuzzy joins use the MinHash-LSH
machinery in ``operators/dedup`` instead — never a full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from access_mopper_spark.functions.text import (portable_levenshtein,
                                                portable_lower)


def dictionary_fuzzy_match(corpus: DataFrame, dictionary: DataFrame,
                           corpus_col: str, dict_col: str,
                           max_dist: int = 1) -> DataFrame:
    """All (corpus row, dictionary row) pairs with
    levenshtein(corpus_col, dict_col) ≤ max_dist, plus the distance as
    ``edit_dist``.  The dictionary must be broadcast-small."""
    a, b = F.col(corpus_col), F.col(dict_col)
    # 3-arg levenshtein = banded DP with early exit (returns -1 above the
    # threshold): O(len·d) per pair instead of O(len²), and most
    # non-matching pairs abandon after a few diagonals — the dominant
    # cost of the scan on near-identical ID-like strings, where content
    # blocking (q-grams, segment signatures) degenerates because every
    # string shares the same hot prefix bucket
    banded = portable_levenshtein(a, b, max_dist)
    cond = ((F.abs(F.length(a) - F.length(b)) <= max_dist)
            & (banded >= 0) & (banded <= max_dist))
    # the per-pair DP is the cost: run the corpus side wide when the
    # source arrived as few splits (no-op on a many-file 100 TB scan)
    from access_mopper_spark.operators.partitioning import ensure_min_partitions
    return (ensure_min_partitions(corpus).join(F.broadcast(dictionary), cond)
            .withColumn("edit_dist", portable_levenshtein(a, b, max_dist)))


def blocked_entity_pairs(df: DataFrame, text_col: str, id_col: str,
                         block_prefix: int = 4, max_dist: int = 1) -> DataFrame:
    """Corpus×corpus entity resolution under an edit-distance budget via
    BLOCKING: rows sharing a blocking key (here the lowercased
    ``block_prefix``-char prefix) are candidate pairs; only candidates
    pay the levenshtein evaluation.  The blocking self-join is an
    equi-join — one shuffle on the block key, bucket sizes bounded by
    block selectivity — never a cross product, which is what makes
    entity resolution feasible when BOTH sides are large (the
    dictionary-broadcast path in :func:`dictionary_fuzzy_match` stops
    applying).

    Prefix blocking misses pairs whose edits touch the first
    ``block_prefix`` chars — standard practice is a union over 2-3
    complementary blocking keys (prefix, suffix, soundex); one key keeps
    the oracle replay simple here and the union is the same plan shape.

    Returns ``(id_a, id_b, edit_dist)`` with ``id_a < id_b``."""
    lowered = portable_lower(F.col(text_col))
    keyed = df.select(F.col(id_col), lowered.alias("__t"),
                      F.substring(lowered, 1, block_prefix).alias("__blk"))
    a = keyed.select(F.col(id_col).alias("id_a"), F.col("__t").alias("__ta"), "__blk")
    b = keyed.select(F.col(id_col).alias("id_b"), F.col("__t").alias("__tb"), "__blk")
    banded = portable_levenshtein(F.col("__ta"), F.col("__tb"), max_dist)
    return (a.join(b, "__blk")
            .where(F.col("id_a") < F.col("id_b"))
            .where(F.abs(F.length("__ta") - F.length("__tb")) <= max_dist)
            .where((banded >= 0) & (banded <= max_dist))
            .select("id_a", "id_b", banded.alias("edit_dist")))
