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


def dictionary_fuzzy_match(corpus: DataFrame, dictionary: DataFrame,
                           corpus_col: str, dict_col: str,
                           max_dist: int = 1) -> DataFrame:
    """All (corpus row, dictionary row) pairs with
    levenshtein(corpus_col, dict_col) ≤ max_dist, plus the distance as
    ``edit_dist``.  The dictionary must be broadcast-small."""
    a, b = F.col(corpus_col), F.col(dict_col)
    cond = ((F.abs(F.length(a) - F.length(b)) <= max_dist)
            & (F.levenshtein(a, b) <= max_dist))
    return (corpus.join(F.broadcast(dictionary), cond)
            .withColumn("edit_dist", F.levenshtein(a, b)))
