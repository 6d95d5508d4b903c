"""Bloom-filter decontamination — membership pre-filter for benchmark /
held-out contamination checks when the reference set is too large to
broadcast as raw fingerprints.

``q_decontaminate`` broadcasts the exact fingerprint SET of the held-out
corpus; at a few billion reference entries that set no longer fits an
executor.  A Bloom filter keeps the broadcast CONSTANT-SIZE (m bits
chosen for the target false-positive rate — ~1.2 GiB for 1e9 entries at
1% FP with k=7), at the cost of false positives that drop a bounded
fraction of clean documents (never the reverse: a contaminated document
always hits all k bits, so recall is exact).

Everything is engine-portable Column math so the DuckDB oracle can build
the *identical* filter and the value-hash cannot diverge on FP behavior:
hashes are md5 of seeded fingerprints, bit positions are the first 8 hex
chars mod m, and the filter itself is an m/64-row ``(word_idx, bits)``
table reduced with ``bit_or`` — mergeable across partitions and across
corpus shards (the standard distributed-bloom build: partial word tables
union + re-``bit_or``).

Scale shape: build = one explode(k) + one ``bit_or`` shuffle on ≤ m/64
keys over the REFERENCE corpus only; probe = broadcast of the m/64-row
word table + map-only bit tests on the training corpus — the 100 TB side
never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from access_mopper_spark.functions.text import fingerprint


def _bit_positions(fp: Column, k: int, m_bits: int) -> Column:
    """k seeded bit positions in [0, m_bits) for one fingerprint:
    position_h = int(md5('b{h}:' || fp)[0:8], 16) % m_bits.  Pure
    Column md5 + conv — identical bytes on any engine."""
    return F.array(*[
        (F.conv(F.substring(F.md5(F.concat(F.lit(f"b{h}:"), fp)), 1, 8),
                16, 10).cast("long") % m_bits).alias(f"p{h}")
        for h in range(k)
    ])


def bloom_build(ref: DataFrame, text_col: str = "text",
                k: int = 3, m_bits: int = 1024) -> DataFrame:
    """Build the filter from a reference corpus: ``(word_idx, bits)``
    rows, one per touched 32-bit word (≤ m_bits/32 rows total; 32-bit
    words keep every shift < 32, inside both engines' checked-shift
    range, and every packed value positive)."""
    pos = (ref.select(fingerprint(F.col(text_col)).alias("__fp"))
              .select(F.explode(_bit_positions(F.col("__fp"), k, m_bits))
                      .alias("pos")))
    return (pos.groupBy((F.col("pos") / 32).cast("int").alias("word_idx"))
               .agg(F.expr("bit_or(shiftleft(1L, CAST(pos % 32 AS INT)))")
                    .alias("bits")))


def bloom_decontaminate(corpus: DataFrame, bloom: DataFrame,
                        id_col: str, text_col: str = "text",
                        k: int = 3, m_bits: int = 1024) -> DataFrame:
    """Keep corpus rows whose fingerprint is NOT (probably) in the
    filter.  The word table is packed into a single broadcast map row;
    each document tests its k bit positions with ``F.aggregate`` over
    the positions array — the corpus side is MAP-ONLY (no explode, no
    shuffle, no per-doc regroup).  A document is contaminated only if
    ALL k bits are set; returns ``(id_col, hits)`` rows with hits < k."""
    packed = bloom.groupBy().agg(
        F.map_from_arrays(F.collect_list("word_idx"),
                          F.collect_list("bits")).alias("__bloom"))
    probed = (corpus.select(id_col,
                            _bit_positions(fingerprint(F.col(text_col)),
                                           k, m_bits).alias("__pos"))
                    .crossJoin(F.broadcast(packed)))
    hits = F.aggregate(
        F.col("__pos"), F.lit(0),
        lambda acc, p: acc + F.coalesce(
            F.call_function(
                "shiftright",
                F.element_at(F.col("__bloom"), (p / 32).cast("int")),
                (p % 32).cast("int")).bitwiseAND(1),
            F.lit(0)).cast("int"))
    return (probed.select(id_col, hits.alias("hits"))
                  .where(F.col("hits") < k))
