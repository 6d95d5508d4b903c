"""The xxhash64 MinHash fast path (operators/dedup.minhash_signature
hash_kind='xxhash64') — Spark-native seeded 64-bit lanes, no DuckDB
replay exists, so the invariants the demoted registry probe
q_minhash_xxhash64 carried are pinned here instead (VERDICT r9 item 5):

1. exact-duplicate texts share the full signature;
2. NULL text -> NULL signature on every lane (the band-join NULL
   contract: never a candidate);
3. short non-NULL text (len < k) still gets a signature (one truncated
   shingle, matching char_shingles' greatest(len-k+1, 1) window);
4. on exact duplicates the xxhash64 class structure agrees with the
   oracle-checked md5 path's class structure.
"""

from __future__ import annotations

import pytest

from access_mopper_spark.operators.dedup import minhash_signature


@pytest.fixture(scope="module")
def sigs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "an entirely different document about spark minhash"),
        (4, None),            # NULL text
        (5, None),            # second NULL text
        (6, "abc"),           # shorter than shingle_k
        (7, ""),              # empty string (one '' shingle)
        (8, "an entirely different document about spark minhash"),  # dup of 3
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    xx = minhash_signature(df, "text", n_hashes=4, shingle_k=5,
                           hash_kind="xxhash64")
    md = minhash_signature(df, "text", n_hashes=4, shingle_k=5,
                           hash_kind="md5")
    cols = [f"minhash_{i}" for i in range(4)]
    return ({r["doc_id"]: tuple(r[c] for c in cols) for r in xx.collect()},
            {r["doc_id"]: tuple(r[c] for c in cols) for r in md.collect()})


def test_exact_dups_share_signature(sigs):
    xx, _ = sigs
    assert xx[1] == xx[2]
    assert xx[3] == xx[8]
    assert xx[1] != xx[3]


def test_null_text_all_lanes_null(sigs):
    xx, _ = sigs
    assert xx[4] == (None, None, None, None)
    assert xx[5] == (None, None, None, None)


def test_short_and_empty_text_have_signatures(sigs):
    xx, _ = sigs
    assert all(v is not None for v in xx[6])
    assert all(v is not None for v in xx[7])
    # 'abc' and '' are different single shingles -> different classes
    assert xx[6] != xx[7]


def test_lanes_are_longs(sigs):
    xx, _ = sigs
    for v in xx[1]:
        assert isinstance(v, int)


def test_class_structure_matches_md5_path(sigs):
    """Exact-dup equivalence classes agree between the xxhash64 path and
    the oracle-checked md5 path (near-dups may legitimately diverge —
    minhash is a similarity sketch — so only exact classes are pinned)."""
    xx, md = sigs
    for a, b in [(1, 2), (3, 8)]:
        assert xx[a] == xx[b]
        assert md[a] == md[b]
    for a, b in [(1, 3), (1, 6), (6, 7)]:
        assert (xx[a] == xx[b]) == (md[a] == md[b])
