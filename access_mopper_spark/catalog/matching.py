"""Catalog matching: the reference's tiered fallback joins and
derivability closure, as DataFrame plans.

The reference matches scanned model variables against its mapping catalog
with progressively relaxed keys — exact (input_vars, frequency, version),
then dropping version, then frequency, flagging tiers
``no_ver``/``no_frq``/``no_match`` (mopdb_utils.py:648-672; same tiering in
get_cmorname :262-304).  Catalogs are small (102 mapping / 2,205 cmorvar
rows shipped) — always broadcast; the scanned-variable side may be huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tiered_match(left: DataFrame, right: DataFrame,
                 tiers: list[tuple[str, list[str]]],
                 no_match_label: str = "no_match") -> DataFrame:
    """Tag each left row with the first tier whose keys find a match in
    ``right``.

    Single pass over the big side: one broadcast LEFT join per tier adds
    a marker column (map-side, no shuffle, no rescan), then a CASE picks
    the first matching tier.  The semi/anti-chain formulation reads the
    left side once per tier; this reads it once, full stop — the
    difference between 1 and N scans of the fact table at 100 TB."""
    out = left
    markers = []
    for i, (name, keys) in enumerate(tiers):
        dim = F.broadcast(right.select(*keys).distinct()
                          .withColumn(f"__m{i}", F.lit(True)))
        out = out.join(dim, keys, "left")
        markers.append((name, f"__m{i}"))
    tier_col = None
    for name, m in markers:
        tier_col = (F.when(F.col(m), name) if tier_col is None
                    else tier_col.when(F.col(m), name))
    tier_col = tier_col.otherwise(no_match_label)
    return out.withColumn("match_tier", tier_col) \
              .drop(*[m for _, m in markers])


def tiered_join(left: DataFrame, right: DataFrame,
                tiers: list[tuple[str, list[str]]],
                no_match_label: str = "no_match") -> DataFrame:
    """Like :func:`tiered_match` but brings the matched right row along
    (the reference keeps the matched mapping row's calculation/resample).

    Same single-pass shape: per tier a broadcast LEFT join attaches the
    matched right row as a struct payload; the first non-null payload in
    tier order wins (coalesce), so the big side is scanned once.  If a
    tier's keys match several right rows, an arbitrary-but-deterministic
    one is kept (min struct) — mirroring the reference's fetchone."""
    payload_cols = [c for c in right.columns]
    out = left
    markers = []
    for i, (name, keys) in enumerate(tiers):
        # identical struct schema across tiers (all right columns) so the
        # tier-priority coalesce below type-checks
        pay = right.groupBy(*keys).agg(
            F.min(F.struct(*[F.col(c) for c in payload_cols])).alias(f"__p{i}"))
        out = out.join(F.broadcast(pay), keys, "left")
        markers.append((name, f"__p{i}"))
    tier_col = None
    for name, m in markers:
        tier_col = (F.when(F.col(m).isNotNull(), name) if tier_col is None
                    else tier_col.when(F.col(m).isNotNull(), name))
    out = out.withColumn("match_tier", tier_col.otherwise(no_match_label))
    best = F.coalesce(*[F.col(m) for _, m in markers])
    for c in payload_cols:
        if c not in out.columns:       # left/key columns keep the left value
            out = out.withColumn(c, best[c])
    return out.drop(*[m for _, m in markers])


# Nearest-frequency ladder fallback lives in plans/planner.py
# (``nearest_frequency`` — the planner owns resample injection).


def derivability_closure(available_vars: DataFrame, mapping: DataFrame,
                         var_col: str = "name",
                         input_vars_col: str = "input_vars") -> DataFrame:
    """potential_vars semantics (mopdb_utils.py:715-741): keep mapping rows
    ALL of whose (space-separated) input variables exist in the scanned
    output.  explode → semi-join → grouped bool_and."""
    m = mapping.withColumn("__inputs", F.split(F.col(input_vars_col), r"\s+"))
    exploded = m.select("*", F.explode("__inputs").alias("__iv"))
    avail = available_vars.select(F.col(var_col).alias("__iv")).distinct()
    flagged = exploded.join(F.broadcast(avail).withColumn("__have", F.lit(True)),
                            "__iv", "left")
    return (
        flagged.groupBy(*mapping.columns)
        .agg(F.bool_and(F.coalesce(F.col("__have"), F.lit(False))).alias("derivable"))
        .where(F.col("derivable"))
        .drop("derivable")
    )


def upsert_ignore(existing: DataFrame, incoming: DataFrame,
                  keys: list[str]) -> DataFrame:
    """``INSERT OR IGNORE`` catalog upsert (update_db/add_row,
    mopdb_utils.py:190-218, setup_utils.py:370-402): incoming rows are
    added only when their key is absent; on conflict the EXISTING row
    wins.  One anti-join (map-side when the catalog side broadcasts) +
    union — the merge shape any upsert-capable table format executes."""
    fresh = incoming.join(existing.select(*keys).distinct(), keys, "left_anti")
    return existing.unionByName(fresh)


def scd2_merge(current: DataFrame, incoming: DataFrame, keys: list[str],
               tracked: list[str], effective_ts: str,
               valid_from: str = "valid_from", valid_to: str = "valid_to") -> DataFrame:
    """Type-2 slowly-changing-dimension merge: apply an incoming snapshot
    to a dimension HISTORY table, closing out rows whose tracked
    attributes changed and opening new versions — the standard warehouse
    pattern for "what did this supplier look like when the order shipped".

    ``current`` carries open (``valid_to IS NULL``) and closed rows;
    ``incoming`` is the new snapshot of (keys + tracked).  Output:
    - closed rows pass through untouched;
    - open rows with NO incoming match, or an incoming match with equal
      tracked values, pass through;
    - open rows whose match differs get ``valid_to = effective_ts`` and a
      fresh open row with the new values;
    - incoming keys never seen before open as new rows.

    Shape: ONE equi-join of open rows against the snapshot on the
    dimension key plus a union of three branches over that single joined
    frame — co-partitioned on the key, no window, no collect; at any
    dimension size this is the same one-shuffle merge an ACID table
    format runs for MERGE INTO."""
    null_safe_eq = [F.col(f"cur.{c}").eqNullSafe(F.col(f"inc.{c}")) for c in tracked]
    unchanged_pred = null_safe_eq[0]
    for p in null_safe_eq[1:]:
        unchanged_pred = unchanged_pred & p

    closed = current.where(F.col(valid_to).isNotNull())
    open_rows = current.where(F.col(valid_to).isNull())
    j = open_rows.alias("cur").join(
        incoming.alias("inc"), [F.col(f"cur.{k}") == F.col(f"inc.{k}") for k in keys],
        "full_outer")

    cur_cols = current.columns
    keep_open = j.where(F.col(f"inc.{keys[0]}").isNull() | unchanged_pred) \
        .where(F.col(f"cur.{keys[0]}").isNotNull()) \
        .select([F.col(f"cur.{c}").alias(c) for c in cur_cols])
    to_close = j.where(F.col(f"cur.{keys[0]}").isNotNull()
                       & F.col(f"inc.{keys[0]}").isNotNull() & ~unchanged_pred)
    closed_out = to_close.select(
        *[F.col(f"cur.{c}").alias(c) for c in cur_cols if c != valid_to],
        F.lit(effective_ts).cast("timestamp").alias(valid_to))
    new_versions = to_close.select(
        *[F.col(f"inc.{c}").alias(c) if c in (keys + tracked)
          else (F.lit(effective_ts).cast("timestamp").alias(c) if c == valid_from
                else F.lit(None).cast("timestamp").alias(c) if c == valid_to
                else F.col(f"cur.{c}").alias(c))
          for c in cur_cols])
    cur_types = dict(current.dtypes)
    brand_new = j.where(F.col(f"cur.{keys[0]}").isNull()).select(
        *[F.col(f"inc.{c}").alias(c) if c in (keys + tracked)
          else (F.lit(effective_ts).cast("timestamp").alias(c) if c == valid_from
                else F.lit(None).cast("timestamp").alias(c) if c == valid_to
                else F.lit(None).cast(cur_types[c]).alias(c))
          for c in cur_cols])
    return closed.unionByName(keep_open).unionByName(closed_out) \
        .unionByName(new_versions).unionByName(brand_new)
