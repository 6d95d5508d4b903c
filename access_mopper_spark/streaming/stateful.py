"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's one genuinely stateful computation is the running
time-integral accumulated across sequentially processed files
(``axm_t_integral``, mop_utils.py:790-812: each file adds ``Σ v·dt`` to a
carried total).  On a stream that is per-key state: the operator below
keeps (count, sum) per group and emits the updated running aggregate
every micro-batch — state lives in the state store, bounded by key
cardinality, checkpointed, and recovered on restart.

``applyInPandasWithState`` is the right tool precisely where windowed
aggregation is not: the state outlives any window and is updated by an
arbitrary Python reducer over Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def running_totals(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum, mean) across the whole stream.

    Output one row per key per micro-batch in which the key saw data
    (outputMode='update' downstream).
    """
    out_schema = StructType([
        StructField(key_col, LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mean", DoubleType()),
    ])

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += int(vals.count())
            total += float(vals.sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total],
                            "mean": [total / n if n else None]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(update, out_schema, STATE_SCHEMA,
                                "update", GroupStateTimeout.NoTimeout)
    )


def run_stateful_to_memory(result: DataFrame, name: str) -> None:
    """Drive with AvailableNow into a memory sink (update mode)."""
    q = (
        result.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()


def band_first_seen(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Streaming LSH decontamination state: per band key, remember the
    smallest id ever seen; every arriving (band, id) row is flagged
    ``is_dup`` when an earlier (smaller-id) document already occupied
    the band — the minhash collision test of a batch dedup, carried as
    keyed state across micro-batches so documents streaming in TODAY
    are deduped against everything ingested before.

    Input: long-format band rows (``bi`` int, ``bk`` string, id).
    State per (bi, bk): one long — bounded by the number of distinct
    band keys, checkpointed, restart-safe (same state-store story as
    ``running_totals``).  Within a batch the group's rows process in id
    order, so intra-batch earlier documents count too.  The flag equals
    the batch semantics "some smaller id shares this band" when ids
    arrive in nondecreasing batches — the ingest model (ids are
    assigned monotonically at ingest; today's documents dedup against
    all of history, never the reverse).  Out-of-order arrival degrades
    gracefully: a late small id is kept and becomes the band's new
    representative, but cannot retroactively drop already-emitted
    docs."""
    import pandas as pd
    from pyspark.sql.types import BooleanType, IntegerType, StringType

    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("bi", IntegerType()),
        StructField("is_dup", BooleanType()),
    ])
    state_schema = StructType([StructField("min_id", LongType())])

    def update(key, pdfs, state: GroupState):
        mn = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf[id_col].tolist(), pdf["bi"].tolist()))
        rows.sort()
        ids, bis, flags = [], [], []
        for did, bi in rows:
            ids.append(did)
            bis.append(int(bi))
            flags.append(mn is not None and did > mn)
            mn = did if mn is None else min(mn, did)
        state.update((mn,))
        yield pd.DataFrame({id_col: ids, "bi": bis, "is_dup": flags})

    return (bands.groupBy("bi", "bk")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))
