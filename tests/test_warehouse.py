"""Warehouse-layer operators: SCD2 merge, z-order clustering key."""

from pyspark.sql import functions as F

from access_mopper_spark.catalog.matching import scd2_merge
from access_mopper_spark.operators.partitioning import zorder_key
from access_mopper_spark.sources.readers import load_table


def _history(spark):
    cur = spark.createDataFrame(
        [(1, "a", "2023-01-01", "2024-01-01"),   # closed old version
         (1, "b", "2024-01-01", None),           # open
         (2, "x", "2024-01-01", None),
         (3, "y", "2024-01-01", None)],
        "k long, v string, valid_from string, valid_to string") \
        .withColumn("valid_from", F.col("valid_from").cast("timestamp")) \
        .withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    inc = spark.createDataFrame(
        [(1, "b"),      # unchanged
         (2, "x2"),     # changed
         (4, "new")],   # brand new (key 3 absent from snapshot: stays open)
        "k long, v string")
    return cur, inc


def test_scd2_invariants(spark):
    cur, inc = _history(spark)
    out = scd2_merge(cur, inc, ["k"], ["v"], "2024-06-01").collect()
    rows = {(r["k"], r["v"]): (r["valid_from"], r["valid_to"]) for r in out}
    assert len(out) == len(rows) == 6
    # at most one open row per key
    open_keys = [r["k"] for r in out if r["valid_to"] is None]
    assert sorted(open_keys) == [1, 2, 3, 4]
    # unchanged key 1 kept its open row; its closed history untouched
    assert rows[(1, "b")][1] is None and rows[(1, "a")][1] is not None
    # changed key 2: old version closed at effective ts, new one open
    assert str(rows[(2, "x")][1])[:10] == "2024-06-01"
    assert str(rows[(2, "x2")][0])[:10] == "2024-06-01"
    assert rows[(2, "x2")][1] is None
    # absent-from-snapshot key 3 stays open; brand-new key 4 opens
    assert rows[(3, "y")][1] is None
    assert str(rows[(4, "new")][0])[:10] == "2024-06-01" and rows[(4, "new")][1] is None


def test_scd2_idempotent_on_unchanged_snapshot(spark):
    cur, inc = _history(spark)
    once = scd2_merge(cur, inc, ["k"], ["v"], "2024-06-01")
    twice = scd2_merge(once, inc, ["k"], ["v"], "2024-07-01")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def _morton_ref(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    data = [(0, 0), (1, 0), (0, 1), (1, 1), (255, 255), (65535, 65535),
            (12345, 54321), (40000, 1)]
    df = spark.createDataFrame(data, "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")]).alias("z")).collect()}
    for x, y in data:
        assert got[(x, y)] == _morton_ref(x, y)


def test_zorder_sort_balances_minmax_spans(spark):
    """The data-skipping property: under a single-column (x) sort, file
    buckets have tight x stats but full-range y stats — a y-predicate can
    skip nothing.  Under a z-order sort both dimensions get sub-range
    spans, so predicates on EITHER column prune files."""
    n = 1 << 14
    df = spark.range(n).select((F.col("id") % 256).alias("x"),
                               ((F.col("id") * 7919) % 256).alias("y"))
    n_buckets = 16

    def spans(ordered):
        from pyspark.sql import Window as W
        rn = F.row_number().over(W.orderBy("__k", "x", "y"))
        per = (ordered.withColumn("__b", ((rn - 1) * n_buckets / n).cast("int"))
               .groupBy("__b")
               .agg((F.max("x") - F.min("x")).alias("sx"),
                    (F.max("y") - F.min("y")).alias("sy")))
        row = per.agg(F.avg("sx").alias("sx"), F.avg("sy").alias("sy")).collect()[0]
        return row["sx"], row["sy"]

    zx, zy = spans(df.withColumn("__k", zorder_key([F.col("x"), F.col("y")], bits=8)))
    lx, ly = spans(df.withColumn("__k", F.col("x")))
    # single-column sort: y stats near-useless (avg span ~239 of 255)
    assert ly > 200
    # z-order: BOTH dims well under full range -> either predicate skips
    assert zx < 128 and zy < 128 and zy < ly / 2


def test_fixed_width_histogram_degenerate_range(spark):
    """All values equal → hi == lo: the guard pins every row to bucket 0
    (ADVICE r3: Spark 0/0 and IEEE inf would otherwise diverge between
    engines on this input)."""
    from access_mopper_spark.operators.aggregates import fixed_width_histogram
    df = spark.createDataFrame([("a", 5.0)] * 7 + [("b", 5.0)] * 3,
                               "k string, v double")
    out = fixed_width_histogram(df, "v", 20, ["k"]).collect()
    assert {r["bucket"] for r in out} == {0}
    assert {(r["k"], r["n"]) for r in out} == {("a", 7), ("b", 3)}
    assert all(r["bucket_min"] == 5.0 and r["bucket_max"] == 5.0 for r in out)
