"""As-of (nearest/latest) joins and interval/range joins.

Reference analogues: nearest-frequency fallback along an ordered ladder
(``find_nearest``, mop_setup.py:108-153), nearest-neighbour coordinate
alignment (``reindex_like(method='nearest')``, calculations.py:901), and
the file/time-range interval-overlap predicate (mop_utils.py:320).

Scale design: the as-of join is the union+window formulation — both
sides tagged and unioned, one shuffle on (keys), one sort per partition,
``last(..., ignorenulls)`` carries the most recent right row forward.
No range self-join, no per-row subqueries; this is the formulation that
survives 100 TB (a billion left rows cost one sort-merge pass)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              right_values: list[str] | None = None,
              direction: str = "backward",
              tiebreak: list[str] | None = None,
              suffix: str = "_right") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (backward; forward = smallest >=).

    ``tiebreak``: right columns ordering rows that share right_ts (the
    LAST in this order wins), making the result deterministic when
    right_ts is not unique per key."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    right_values = right_values or [c for c in right.columns if c not in on and c != right_ts]
    tiebreak = tiebreak or []

    payload = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_values])
    r = right.select(*on, F.col(right_ts).alias("__ts"),
                     *[F.col(c) for c in tiebreak],
                     payload.alias("__payload"), F.lit(1).alias("__is_right"))
    l_cols = [c for c in left.columns]
    l = left.select(*l_cols, F.col(left_ts).alias("__ts"),
                    *[F.lit(None).alias(c) for c in tiebreak if c not in left.columns],
                    F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
                    F.lit(0).alias("__is_right"))
    both = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # at equal ts the right row sorts first → inclusive match
        order = [F.col("__ts").asc(), F.col("__is_right").desc()] + \
                [F.col(c).asc_nulls_first() for c in tiebreak]
    else:
        order = [F.col("__ts").desc(), F.col("__is_right").desc()] + \
                [F.col(c).desc_nulls_first() for c in tiebreak]
    w = W.partitionBy(*on).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    matched = F.last("__payload", ignorenulls=True).over(w)

    out = both.withColumn("__m", matched).where(F.col("__is_right") == 0)
    result = out.select(
        *l_cols,
        F.col("__m.__rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(c if c not in l_cols else f"{c}{suffix}")
          for c in right_values],
    )
    return result


def range_join_count(left: DataFrame, right: DataFrame, on: list[str],
                     left_point: Column, right_point: Column,
                     radius_expr: str, count_alias: str = "n_in_range",
                     left_keys: list[str] | None = None) -> DataFrame:
    """Interval-overlap join + count (mop_utils.py:320 overlap predicate):
    for each left row, the number of right rows sharing the ``on`` keys
    whose ``right_point`` lies within ``radius_expr`` of ``left_point``.
    Left rows with no key match OR only out-of-range matches both get 0
    (consistent left-join semantics).

    ``left_keys`` identify a left row (default: all left columns; rows
    identical on those columns collapse to one output row).

    Scale: the equi part carries the shuffle as a hash/sort-merge join —
    the range predicate is evaluated post-join, never a cartesian product;
    the count is one partial-aggregated groupBy on the same keys."""
    keys = list(left_keys or left.columns)
    r = right.select(*on, right_point.alias("__rp"))
    lo = left_point - F.expr(radius_expr)
    hi = left_point + F.expr(radius_expr)
    in_range = F.when(F.col("__rp").between(lo, hi), F.lit(1)).otherwise(F.lit(0))
    return (
        left.join(r, on, "left")
        .groupBy(*keys)
        .agg(F.sum(in_range).cast("long").alias(count_alias))
    )
