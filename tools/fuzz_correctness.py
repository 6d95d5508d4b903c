"""Seed-sweep adversarial differential fuzzer for the driver prefix.

The driver regenerates ``documents``/``events`` every round, so a flap
that never reproduces on the shipped testdata needs a local instrument
(r4 verdict item 3).  This tool regenerates those two tables under N
seeds with hostile properties —

* documents: trailing ``\\t``/``\\n``, leading whitespace, embedded
  ``\\x0B``/``\\f``/CRLF/NBSP, collapsed-run variants, blank and
  whitespace-only docs, single-word docs, exact/near duplicate
  families, NULL text/lang/source;
* events: identical-µs timestamp ties, midnight-exact and 5-minute-grid
  timestamps, repeated exact values (median/max ties), NULL value/props;
* lineitem/orders: duplicate (l_orderkey, l_linenumber) pairs, exact
  repeated prices/totals (argmax/median ties), heavy date ties —
  foreign keys drawn from the real dimension tables' cardinalities

— then runs the 50-query driver prefix differentially (Spark vs DuckDB,
full-precision compare from tools/check_correctness.py) on each seed.
Only prefix queries whose oracle references a regenerated table run (the
rest are invariant under the fuzz).  Exit 0 = zero diffs across all
seeds.

Usage::

    python tools/fuzz_correctness.py [n_seeds] [query ...]
"""

from __future__ import annotations

import os
import random
import re
import sys
import time
from datetime import datetime, timedelta

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

from check_correctness import TABLES, compare_one, connect_oracle  # noqa: E402

VOCAB = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "merge", "batch", "spark", "a", "the", "line",
         "sort", "window", "join", "filter", "group", "order", "query",
         "stream", "vector", "column", "data", "big", "small", "dup",
         "customer"]
LANGS = ["en", "en", "en", "en", "fr", "de", "es", "zh"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _embed(text: str, ch: str, rng: random.Random) -> str:
    """Replace one interior space with ``ch`` (or append if no space)."""
    spaces = [i for i, c in enumerate(text) if c == " "]
    if not spaces:
        return text + ch
    i = rng.choice(spaces)
    return text[:i] + ch + text[i + 1:]


#: unicode hostiles: NBSP / em space / zero-width space (NOT in the
#: [ \t\n\r] class -- must survive as token chars on both engines),
#: combining accent, Turkish dotted I, sharp ss, non-BMP emoji, CJK,
#: fullwidth latin, ligature -- the lower()/length()/split() dialect
#: corners a real crawl exercises (primitive differential verified
#: identical cross-engine in round 7; this keeps whole QUERIES honest).
#: U+E000/U+E047: private-use chars (icon-font text DOES occur in real
#: crawls) \u2014 before round 8 these were portable_lower's sentinels and
#: silently ALIASED into case-mapped letters on the Spark side only
#: (r7 ADVICE); sentinels now live in unassigned plane-14, so PUA text
#: must round-trip identically on both engines.
_UNICODE_HOSTILES = ["\u00a0", "\u2003", "\u200b", "e\u0301",
                     "\u0130", "\u00df", "\U0001f600", "\u4e2d\u6587",
                     "\uff21\uff22", "\ufb01", "\ue000", "\ue047"]


def _mutate_ws(text: str, rng: random.Random) -> str:
    muts = [
        lambda t: t + "\t",
        lambda t: t + "\n",
        lambda t: t + " \t ",
        lambda t: "\t" + t,
        lambda t: "  " + t,
        lambda t: t.replace(" ", "  ", 3),
        lambda t: _embed(t, "\x0b", rng),
        lambda t: _embed(t, "\f", rng),
        lambda t: _embed(t, "\r\n", rng),
        lambda t: _embed(t, " ", rng),
        lambda t: _embed(t, " \t ", rng),
        lambda t: _embed(t, rng.choice(_UNICODE_HOSTILES), rng),
        lambda t: t + rng.choice(_UNICODE_HOSTILES),
        lambda t: rng.choice(_UNICODE_HOSTILES) + " " + t,
    ]
    for m in rng.sample(muts, rng.randint(1, 3)):
        text = m(text)
    return text


def gen_documents(seed: int, n: int = 500):
    """Adversarial documents table as python column lists."""
    rng = random.Random(1000 + seed)
    rows = []
    texts_so_far = []
    for i in range(n):
        r = rng.random()
        if r < 0.02 and texts_so_far:
            text = None  # NULL text
        elif r < 0.05:
            text = rng.choice(["", " \t ", "\x0b", " ", "\n\n"])
        elif r < 0.08:
            text = " ".join(rng.choices(VOCAB, k=rng.randint(1, 3)))
        elif r < 0.20 and texts_so_far:
            text = rng.choice(texts_so_far)  # exact duplicate family
        elif r < 0.30 and texts_so_far:
            base = rng.choice(texts_so_far).split(" ")
            if base:
                base[rng.randrange(len(base))] = rng.choice(VOCAB)
            text = " ".join(base)  # near duplicate
        else:
            text = " ".join(rng.choices(VOCAB, k=rng.randint(8, 70)))
        if text is not None and text.strip() and rng.random() < 0.30:
            text = _mutate_ws(text, rng)
        if text is not None:
            texts_so_far.append(text)
        lang = None if rng.random() < 0.02 else rng.choice(LANGS)
        source = None if rng.random() < 0.02 else f"src{rng.randrange(20)}"
        rows.append((i, text, lang, source,
                     None if text is None else len(text)))
    return rows


def gen_events(seed: int, n: int = 10000):
    rng = random.Random(2000 + seed)
    base = datetime(2024, 1, 1)
    rows = []
    shared_ts = None
    for i in range(n):
        r = rng.random()
        if r < 0.03 and shared_ts is not None:
            ts = shared_ts  # identical-µs tie with an earlier event
        elif r < 0.05:
            ts = base + timedelta(days=rng.randrange(30))  # midnight exact
        elif r < 0.08:
            ts = base + timedelta(minutes=5 * rng.randrange(30 * 24 * 12))
        else:
            ts = base + timedelta(seconds=rng.uniform(0, 30 * 86400))
            ts = ts.replace(microsecond=rng.randrange(1_000_000))
        if rng.random() < 0.10:
            shared_ts = ts
        rv = rng.random()
        if rv < 0.01:
            value = None
        elif rv < 0.10:
            value = 250.0  # repeated exact value: median/max_by ties
        elif rv < 0.15:
            value = round(rng.uniform(0, 5), 2)  # near-zero cluster
        else:
            value = round(rng.uniform(0.01, 490.02), 2)
        props = None if rng.random() < 0.01 else '{"k": %d}' % rng.randrange(100)
        rows.append((i, ts, rng.randrange(150), rng.choice(EVENT_TYPES),
                     value, props))
    return rows


def gen_orders(seed: int, n: int = 15000, n_cust: int = 1500):
    """Adversarial orders: unique keys, heavy date/price ties."""
    rng = random.Random(3000 + seed)
    base = datetime(1995, 1, 1)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.10:
            price = 50000.00  # repeated exact total: argmax/median ties
        else:
            price = round(rng.uniform(900.0, 200000.0), 2)
        if rng.random() < 0.20:
            od = base + timedelta(days=365 * rng.randrange(6))  # heavy ties
        else:
            od = base + timedelta(days=rng.randrange(2192))
        rows.append((i, rng.randrange(n_cust),
                     rng.choice(["F", "P", "O"]), price, od,
                     rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                 "4-NOT SPECIFIED", "5-LOW"])))
    return rows


def gen_lineitem(seed: int, n: int = 60000, n_orders: int = 15000,
                 n_part: int = 2000, n_supp: int = 100):
    """Adversarial lineitem: duplicate (orderkey, linenumber) pairs,
    exact price/quantity ties, discount/tax on coarse grids."""
    rng = random.Random(4000 + seed)
    base = datetime(1995, 1, 1)
    rows = []
    for _ in range(n):
        ok = rng.randrange(n_orders)
        ln = rng.randrange(1, 8)  # NOT unique per order — the repo's
        # window tie-break contract must survive duplicate pairs
        qty = float(rng.randrange(1, 51))
        r = rng.random()
        if r < 0.08:
            price = 12345.67  # exact repeated price: min_by/median ties
        else:
            price = round(rng.uniform(901.0, 105000.0), 2)
        rows.append((ok, rng.randrange(n_part), rng.randrange(n_supp), ln,
                     qty, price,
                     rng.randrange(11) / 100.0, rng.randrange(9) / 100.0,
                     rng.choice(["A", "N", "R"]), rng.choice(["O", "F"]),
                     base + timedelta(days=rng.randrange(2192))))
    return rows




def gen_embeddings(seed: int, n: int = 4000, dim: int = 64):
    """Adversarial embeddings: exact duplicate vectors (top-k ties that
    must fall to the id tie-break), zero vectors (norm-0 division —
    NaN/inf contracts must agree cross-engine), tiny-norm vectors,
    near-duplicates differing in one coordinate, NULL labels."""
    rng = random.Random(5000 + seed)
    rows, pool = [], []
    for i in range(n):
        r = rng.random()
        if r < 0.01:
            v = [0.0] * dim
        elif r < 0.02:
            v = [round(rng.gauss(0, 1e-6), 9) for _ in range(dim)]
        elif r < 0.14 and pool:
            v = list(rng.choice(pool))
        elif r < 0.24 and pool:
            v = list(rng.choice(pool))
            v[rng.randrange(dim)] = round(v[rng.randrange(dim)] + 0.5, 3)
        else:
            v = [round(rng.gauss(0, 1), 3) for _ in range(dim)]
        pool.append(v)
        label = None if rng.random() < 0.02 else rng.randrange(5)
        rows.append((i, v, label))
    return rows

#: Bump when the regenerated-vs-symlinked table split changes: fuzz dirs
#: persist under /tmp and a STALE dir from an older layout can hold a
#: table as a symlink into base_sf that the new layout wants to WRITE —
#: pyarrow then writes THROUGH the symlink and overwrites the driver's
#: read-only testdata (this corrupted sf0.01/embeddings.parquet in
#: round 8).  A layout-versioned path can never meet a stale dir.
FUZZ_LAYOUT = "v2"


def _safe_write_table(pq, tbl, out_dir: str, name: str, base_sf: str) -> None:
    """Write a regenerated table without ANY possibility of the bytes
    landing outside ``out_dir``: drop a stale symlink first, refuse a
    destination that resolves into ``base_sf``, and write tmp+rename
    (rename replaces the link itself, never its target)."""
    dst = os.path.join(out_dir, name)
    if os.path.islink(dst):
        os.unlink(dst)
    real_base = os.path.realpath(base_sf)
    if os.path.realpath(dst).startswith(real_base + os.sep):
        raise RuntimeError(f"fuzz write would land in base_sf: {dst}")
    tmp = dst + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, dst)


def write_fuzz_dir(seed: int, base_sf: str, out_dir: str,
                   n_docs: int = 500, n_events: int = 10000) -> str:
    """Materialize a fuzz sf-dir: regenerated documents/events/lineitem/
    orders/embeddings parquet, symlinks to ``base_sf`` for every other
    table."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs = gen_documents(seed, n_docs)
    doc_tbl = pa.table({
        "doc_id": pa.array([r[0] for r in docs], pa.int64()),
        "text": pa.array([r[1] for r in docs], pa.string()),
        "lang": pa.array([r[2] for r in docs], pa.string()),
        "source": pa.array([r[3] for r in docs], pa.string()),
        "n_chars": pa.array([r[4] for r in docs], pa.int64()),
    })
    _safe_write_table(pq, doc_tbl, out_dir, "documents.parquet", base_sf)

    evs = gen_events(seed, n_events)
    ev_tbl = pa.table({
        "event_id": pa.array([r[0] for r in evs], pa.int64()),
        "ts": pa.array([r[1] for r in evs], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in evs], pa.int64()),
        "event_type": pa.array([r[3] for r in evs], pa.string()),
        "value": pa.array([r[4] for r in evs], pa.float64()),
        "props": pa.array([r[5] for r in evs], pa.string()),
    })
    _safe_write_table(pq, ev_tbl, out_dir, "events.parquet", base_sf)

    # dimension cardinalities derived from the REAL base tables so the
    # regenerated facts' foreign keys stay join-compatible
    con = duckdb.connect()
    card = {t: con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{base_sf}/{t}.parquet')"
    ).fetchone()[0] for t in ("customer", "part", "supplier")}
    con.close()

    orders = gen_orders(seed, n_cust=card["customer"])
    o_tbl = pa.table({
        "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
        "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
        "o_orderstatus": pa.array([r[2] for r in orders], pa.string()),
        "o_totalprice": pa.array([r[3] for r in orders], pa.float64()),
        "o_orderdate": pa.array([r[4] for r in orders], pa.timestamp("us")),
        "o_orderpriority": pa.array([r[5] for r in orders], pa.string()),
    })
    _safe_write_table(pq, o_tbl, out_dir, "orders.parquet", base_sf)

    li = gen_lineitem(seed, n_orders=len(orders),
                      n_part=card["part"], n_supp=card["supplier"])
    li_tbl = pa.table({
        "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
        "l_partkey": pa.array([r[1] for r in li], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in li], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in li], pa.int32()),
        "l_quantity": pa.array([r[4] for r in li], pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in li], pa.float64()),
        "l_discount": pa.array([r[6] for r in li], pa.float64()),
        "l_tax": pa.array([r[7] for r in li], pa.float64()),
        "l_returnflag": pa.array([r[8] for r in li], pa.string()),
        "l_linestatus": pa.array([r[9] for r in li], pa.string()),
        "l_shipdate": pa.array([r[10] for r in li], pa.timestamp("us")),
    })
    _safe_write_table(pq, li_tbl, out_dir, "lineitem.parquet", base_sf)

    emb = gen_embeddings(seed)
    emb_tbl = pa.table({
        "vec_id": pa.array([r[0] for r in emb], pa.int64()),
        "embedding": pa.array([r[1] for r in emb],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in emb], pa.int32()),
    })
    _safe_write_table(pq, emb_tbl, out_dir, "embeddings.parquet", base_sf)

    for t in TABLES:
        if t in ("documents", "events", "orders", "lineitem",
                 "embeddings"):
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(base_sf, f"{t}.parquet"), dst)
    return out_dir


def main():
    from access_mopper_spark.session import get_spark
    import __spark_entry__ as e

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    only = set(sys.argv[2:])
    base_sf = os.environ.get("SPARK_GRAFT_FUZZ_BASE", "/root/testdata/sf0.01")

    qs, oracles = e.queries(), e.oracle_sql()
    prefix = list(qs)[:50]
    if only:
        targets = [q for q in prefix if q in only] + \
                  [q for q in only if q not in prefix]
    else:
        targets = [q for q in prefix
                   if q in oracles
                   and re.search(r"\b(documents|events|lineitem|orders)\b",
                                 oracles[q])]
    print(f"fuzzing {len(targets)} queries × {n_seeds} seeds: {targets}")

    spark = get_spark(app_name="fuzz_correctness")
    failures = []
    for seed in range(n_seeds):
        out_dir = f"/tmp/fuzz_sf/{FUZZ_LAYOUT}/seed{seed}"
        write_fuzz_dir(seed, base_sf, out_dir)
        con = connect_oracle(out_dir)
        t0 = time.time()
        for name in targets:
            status, detail = compare_one(spark, con, name, qs[name],
                                         oracles.get(name), out_dir)
            if status == "fail":
                failures.append((seed, name, detail))
                print(f"FAIL  seed{seed} {name}: {detail}")
        con.close()
        print(f"seed{seed}: done in {time.time()-t0:.0f}s, "
              f"{sum(1 for s, _, _ in failures if s == seed)} failures")

    print(f"\n{len(failures)} total failures across {n_seeds} seeds")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
