"""Driver-facing query registry: every implemented operator family from
SURVEY.md §2 is exercised by at least one named query over the driver's
testdata tables, paired with a DuckDB oracle SQL string.

Conventions (driver contract, see ``__spark_entry__.py``):
- query fn: ``(spark, sf_dir) -> DataFrame``
- every computed column aliased identically in Spark and SQL
- aggregated doubles rounded to 6 dp on BOTH sides so value-hashes are
  robust to floating summation order (Spark and DuckDB both sum doubles in
  a nondeterministic/parallel order); rounding is the portable floor
  recipe ``FLOOR(x*1eN + 0.5)/1eN`` on BOTH sides — Spark ``pround``
  (functions/rounding.py) and an automatic oracle rewrite of ``ROUND``
  (``_portable_round_sql``) — because native ROUND tie semantics differ
  between the engines (HALF_UP vs HALF_EVEN) and flip value hashes
- sums of magnitude ≥1e6 (the big TPC-H money sums) round to 2 dp, not
  6 — at that magnitude double summation-order noise (~n·ulp) is larger
  than the 1e-6 grid, so 6 dp flaps no matter the tie rule
- no ``.collect()`` / driver-side loops anywhere — each query is a single
  declarative plan

Reference citations in each query docstring point at the capability being
re-expressed (SURVEY.md §2 inventory line).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

import re

from access_mopper_spark.sources.readers import load_table
from access_mopper_spark.functions.calc_dsl import CalcContext, compile_calc
from access_mopper_spark.functions.rounding import pround
from access_mopper_spark.functions.text import (portable_levenshtein,
                                                portable_lower)
from access_mopper_spark.operators.resample import time_resample

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_ROUND_CALL = re.compile(r"\bROUND\s*\(", re.IGNORECASE)


def _scan_parens(s: str, j: int) -> int:
    """Index just past the ')' matching the '(' at j-1 (quote-aware)."""
    depth = 1
    n = len(s)
    while j < n and depth:
        ch = s[j]
        if ch == "'":
            j += 1
            while j < n and s[j] != "'":
                j += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        j += 1
    return j


def _split_args(inner: str) -> list[str]:
    args, depth, last = [], 0, 0
    k = 0
    n = len(inner)
    while k < n:
        ch = inner[k]
        if ch == "'":
            k += 1
            while k < n and inner[k] != "'":
                k += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(inner[last:k])
            last = k + 1
        k += 1
    args.append(inner[last:])
    return [a.strip() for a in args]


def _portable_round_sql(sql: str) -> str:
    """Rewrite every ``ROUND(expr[, n])`` in an oracle to the portable
    floor recipe ``FLOOR((expr)*1eN + 0.5)/1eN`` so DuckDB performs the
    identical IEEE double sequence as the Spark side's ``pround``
    (functions/rounding.py) — ROUND tie semantics differ between the
    engines and flipped three driver hashes in round 3.  Non-literal
    scales are left untouched."""
    out, i = [], 0
    while True:
        m = _ROUND_CALL.search(sql, i)
        # skip matches inside '…' string literals: copy any quoted span
        # that starts before the match verbatim and rescan after it
        q = sql.find("'", i)
        while q != -1 and (m is None or q < m.start()):
            q_end = sql.find("'", q + 1)
            q_end = len(sql) - 1 if q_end == -1 else q_end
            out.append(sql[i : q_end + 1])
            i = q_end + 1
            m = _ROUND_CALL.search(sql, i)
            q = sql.find("'", i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i : m.start()])
        j = _scan_parens(sql, m.end())
        args = _split_args(sql[m.end() : j - 1])
        if len(args) == 2 and re.fullmatch(r"[0-9]+", args[1]):
            d = int(args[1])
            x = _portable_round_sql(args[0])
            if d == 0:
                out.append(f"FLOOR(({x}) + 0.5)")
            else:
                out.append(f"(FLOOR(({x}) * 1e{d} + 0.5) / 1e{d})")
        elif len(args) == 1:
            x = _portable_round_sql(args[0])
            out.append(f"FLOOR(({x}) + 0.5)")
        else:
            out.append(sql[m.start() : j])
        i = j
    return "".join(out)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = _portable_round_sql(oracle)
        return fn
    return deco


def R6(c):  # portable half-up round for fp-order robustness (rounding.py)
    return pround(c, 6)


def _wide(df):
    """Widen few-split corpus scans before CPU-bound Column math (text
    scoring, regex scrubbing, Arrow UDFs): a single parquet file arrives
    as 1-2 splits and would pin the whole map stage to as many cores.
    No-op whenever the source is already parallel (operators/
    partitioning.ensure_min_partitions)."""
    from access_mopper_spark.operators.partitioning import ensure_min_partitions
    return ensure_min_partitions(df)


def eager_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize a SMALL final result eagerly, then release the
    persisted intermediates backing it.

    Iterative queries persist() reused intermediates (edge lists,
    frontier ledgers); without cleanup those cache blocks outlive the
    query for the whole session, and across a 400-query gate run they
    accumulate into real executor memory pressure (r11 ADVICE).  The
    returned frame is an eager ``localCheckpoint`` — its blocks are
    owned by the RDD and reclaimed by the ContextCleaner once the frame
    is garbage-collected, unlike CacheManager entries which live until
    an explicit unpersist.  Bounded outputs only (top-k / histogram
    rows): the checkpoint copies the result, so never call this on a
    corpus-sized frame.

    ``SPARK_GRAFT_PLAN_LAZY=1`` turns this into the identity (no
    checkpoint, no release): the single indirection point plan-dump
    tooling and plan-shape tests use so ``df.explain`` shows the real
    computation instead of a post-checkpoint RDD scan (r12 ADVICE —
    the previous harness monkey-patched every module's reference, which
    missed aliased imports)."""
    import os

    if os.environ.get("SPARK_GRAFT_PLAN_LAZY") == "1":
        return result
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def copurchase_pairs(li: DataFrame, order_col: str = "l_orderkey",
                     item_col: str = "l_partkey") -> DataFrame:
    """Distinct unordered co-purchase pairs ``(a < b)`` per order off
    ONE scan + TWO shuffles: the basket aggregate (collect_set per
    order — dedup and grouping in the same exchange) feeds a MAP-SIDE
    pair expansion from the sorted array, then one distinct over the
    pair key.  The textbook orderkey self-join costs two scans and
    three full shuffles for the same set (q_cooccur_parts proved the
    basket shape at the ×10 sweep; this helper extends it to the graph
    edge builders).  Basket fan-out is bounded by the per-order item
    count, exactly the fan-out bound the self-join relies on."""
    baskets = (li.groupBy(order_col)
                 .agg(F.array_sort(F.collect_set(item_col)).alias("__ps")))
    pair_arr = F.flatten(F.transform(
        F.col("__ps"),
        lambda x, i: F.transform(
            F.slice(F.col("__ps"), i + 2, F.size(F.col("__ps"))),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    return (baskets.where(F.size(F.col("__ps")) >= 2)
                   .select(F.explode(pair_arr).alias("__p"))
                   .select(F.col("__p.a").alias("a"),
                           F.col("__p.b").alias("b"))
                   .distinct())


_SCRATCH_DIRS: set[str] = set()


def _pid_scratch(stem: str) -> str:
    """Process-private scratch dir path under the system tmpdir.

    pid-keyed so concurrent gate processes never clobber each other's
    fixtures/checkpoints (the r8 concurrency fix), and registered for
    atexit removal so long-lived sweep boxes don't accumulate one
    fixture tree per process run (r8 ADVICE).  Within a process the
    same stem returns the same path, so intentional same-process
    replays (q_stream_sink_replay) keep their semantics."""
    import atexit
    import os
    import shutil
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"{stem}_{os.getpid()}")
    if not _SCRATCH_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True)
                     for p in list(_SCRATCH_DIRS)])
    _SCRATCH_DIRS.add(path)
    return path



__all__ = ['QUERIES', 'ORACLES', 'query', 'R6', '_wide', '_pid_scratch', '_SCRATCH_DIRS', '_portable_round_sql', '_scan_parens', '_split_args', '_ROUND_CALL', 'F', 'W', 'DataFrame', 'SparkSession', 'Callable', 're', 'load_table', 'CalcContext', 'compile_calc', 'pround', 'portable_levenshtein', 'portable_lower', 'time_resample', 'eager_release', 'copurchase_pairs']
