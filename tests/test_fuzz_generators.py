"""The fuzz instrument itself is load-bearing (it gates driver
readiness), so its generators are pinned: deterministic per seed,
distinct across seeds, and actually containing the adversarial corners
they advertise."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from fuzz_correctness import (gen_documents, gen_events, gen_lineitem,
                              gen_orders, write_fuzz_dir)  # noqa: E402


def test_generators_deterministic_per_seed():
    assert gen_documents(3) == gen_documents(3)
    assert gen_events(3, 500) == gen_events(3, 500)
    assert gen_lineitem(3, 500) == gen_lineitem(3, 500)
    assert gen_orders(3, 500) == gen_orders(3, 500)
    assert gen_documents(3) != gen_documents(4)


def test_documents_cover_adversarial_corners():
    texts = [r[1] for r in gen_documents(0)]
    present = "".join(t for t in texts if t is not None)
    assert any(t is None for t in texts), "NULL text"
    assert any(t is not None and t.strip() == "" for t in texts), "blank"
    assert "\x0b" in present and "\f" in present, "vertical tab / form feed"
    assert "\t" in present and "\r\n" in present
    non_null = [t for t in texts if t]
    assert len(set(non_null)) < len(non_null), "duplicate families"


def test_events_cover_ties_and_nulls():
    rows = gen_events(0)
    ts = [r[1] for r in rows]
    assert len(set(ts)) < len(ts), "identical-microsecond ties"
    assert any(t.hour == 0 and t.minute == 0 and t.second == 0
               and t.microsecond == 0 for t in ts), "midnight-exact"
    assert any(r[4] is None for r in rows), "NULL value"
    vals = [r[4] for r in rows if r[4] is not None]
    assert vals.count(250.0) > len(vals) * 0.05, "repeated exact value"


def test_lineitem_duplicate_compound_keys():
    rows = gen_lineitem(0)
    keys = [(r[0], r[3]) for r in rows]
    assert len(set(keys)) < len(keys), "(orderkey, linenumber) must collide"
    prices = [r[5] for r in rows]
    assert prices.count(12345.67) > 100, "repeated exact price ties"


def test_write_fuzz_dir_materializes_all_tables(tmp_path):
    out = write_fuzz_dir(0, "/root/testdata/sf0.001", str(tmp_path / "fz"),
                         n_docs=40, n_events=200)
    from check_correctness import TABLES
    for t in TABLES:
        assert os.path.exists(os.path.join(out, f"{t}.parquet")), t
    regenerated = {"documents", "events", "lineitem", "orders",
                   "embeddings"}
    for t in TABLES:
        is_link = os.path.islink(os.path.join(out, f"{t}.parquet"))
        assert is_link == (t not in regenerated), t


def test_write_fuzz_dir_never_writes_through_stale_symlinks(tmp_path):
    """Round-8 incident regression: a stale fuzz dir held
    embeddings.parquet as a SYMLINK into base_sf (from an older layout
    where embeddings wasn't regenerated); pq.write_table then wrote
    THROUGH the link and overwrote the driver's read-only testdata.
    write_fuzz_dir must replace the link, never its target."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fuzz_correctness import write_fuzz_dir

    base = tmp_path / "base_sf"
    base.mkdir()
    # valid tiny parquet for the dims write_fuzz_dir READS for
    # cardinalities; byte sentinels for everything it must only link
    import pyarrow as pa
    import pyarrow.parquet as pq
    for t, col in (("customer", "c_custkey"), ("part", "p_partkey"),
                   ("supplier", "s_suppkey")):
        pq.write_table(pa.table({col: pa.array([1, 2, 3], pa.int64())}),
                       base / f"{t}.parquet")
    sentinel = b"ORIGINAL DRIVER BYTES - MUST SURVIVE"
    for t in ("region", "nation", "orders", "lineitem", "events",
              "documents", "embeddings"):
        (base / f"{t}.parquet").write_bytes(sentinel)

    out = tmp_path / "fuzz" / "seed0"
    out.mkdir(parents=True)
    # the stale-layout hazard: a regenerated-table name symlinked to base
    os.symlink(base / "embeddings.parquet", out / "embeddings.parquet")
    os.symlink(base / "documents.parquet", out / "documents.parquet")

    write_fuzz_dir(0, str(base), str(out), n_docs=5, n_events=5)

    # the driver's files are byte-identical
    assert (base / "embeddings.parquet").read_bytes() == sentinel
    assert (base / "documents.parquet").read_bytes() == sentinel
    # and the fuzz dir now holds REAL files, not links
    assert not os.path.islink(out / "embeddings.parquet")
    assert not os.path.islink(out / "documents.parquet")
    assert (out / "embeddings.parquet").stat().st_size > 100
