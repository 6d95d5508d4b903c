"""Adversarial-whitespace fixture for the shingle/tokenizer family.

The r4 judge reproduced cross-engine divergences (Java ``\\s`` vs RE2,
DuckDB Unicode-space trim vs Spark ASCII-space trim) on documents with
trailing tabs, embedded ``\\x0B``/``\\f``, NBSP and blanks — none of
which the shipped testdata contains.  This fixture commits those exact
corners and runs every shingle-family query differentially (Spark vs
DuckDB oracle) over them, so the dialect contract stays pinned.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_correctness import TABLES, compare_one, connect_oracle  # noqa: E402

#: every dialect corner the r4 judge (or the seed fuzzer) hit
ADVERSARIAL_TEXTS = [
    "the quick fox",                    # plain
    "the quick fox\t",                  # trailing tab (Java split drops field)
    "the quick fox\n",                  # trailing newline
    "\tthe quick fox",                  # leading tab
    "the quick\x0bfox",                 # \x0B: Java \s matches, RE2 doesn't
    "the\fquick fox",                   # \f: RE2 \s matches, Java doesn't
    "the  quick   fox",                 # multi-space runs
    "",                                 # blank
    " \t ",                             # whitespace-only
    "word",                             # shorter than shingle window
    "the quick fox",                    # exact duplicate of doc 0
    "the quick fox ",                   # trailing space
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox\r\njumps over the lazy dog",   # CRLF interior
    "the quick fox\xa0",                # trailing NBSP (DuckDB trim strips it)
    "a\xa0b c d",                       # NBSP interior
    None,                               # NULL text
    "the quick fox jumps " * 5,         # repetitive + trailing space
    "slow table scan merge batch",      # filler mass
    "fast row hash join key value",
]

SHINGLE_FAMILY = [
    "q_dup_ngrams", "q_repetition", "q_ngram_jaccard", "q_minhash_band",
    "q_near_dup_pairs", "q_cross_dedup", "q_dedup_clusters",
    "q_dedup_keep_list", "q_simhash", "q_token_count", "q_corpus_report",
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory, sf_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("adversarial_sf"))
    n = len(ADVERSARIAL_TEXTS)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(ADVERSARIAL_TEXTS, pa.string()),
        "lang": pa.array(["en", "fr"][i % 2] for i in range(n)),
        "source": pa.array(f"src{i % 3}" for i in range(n)),
        "n_chars": pa.array(
            [None if t is None else len(t) for t in ADVERSARIAL_TEXTS],
            pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))
    for t in TABLES:
        if t != "documents":
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"),
                       os.path.join(out, f"{t}.parquet"))
    return out


@pytest.fixture(scope="module")
def adversarial_duck(adversarial_dir):
    con = connect_oracle(adversarial_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", SHINGLE_FAMILY)
def test_shingle_family_survives_hostile_whitespace(
        spark, adversarial_dir, adversarial_duck, name):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    status, detail = compare_one(spark, adversarial_duck, name, qs[name],
                                 oracles.get(name), adversarial_dir)
    assert status == "pass", f"{name}: {detail}"
