"""Scale smoke tests: the corpus-assembly operators over millions of
synthetic rows (spark.range — no I/O), catching driver-side collects,
per-row Python, and degenerate single-partition plans that small-fixture
tests can't see.  Runtime budget: a few seconds per op on local[32]."""

from pyspark.sql import functions as F


def _corpus(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37).cast("string").alias("source"),
        (F.col("id") % 997 + 1).alias("ntok"))


def test_pack_sequences_millions(spark):
    from access_mopper_spark.operators.sampling import pack_sequences
    n = 3_000_000
    packed = pack_sequences(_corpus(spark, n), "ntok", 8192, "source")
    agg = packed.agg(F.count("*").alias("n"), F.max("bin_id").alias("mx"),
                     F.max("bin_offset").alias("mo")).collect()[0]
    assert agg["n"] == n
    assert 0 < agg["mo"] < 8192
    # total tokens / budget bounds the max bin id per group
    toks_per_group = n / 37 * 499  # mean ntok ≈ 499
    assert agg["mx"] <= toks_per_group / 8192 + 1


def test_shard_assign_millions_balanced(spark):
    from access_mopper_spark.operators.sampling import shard_assign
    n = 3_000_000
    sh = shard_assign(spark.range(n).select(F.col("id").alias("doc_id")), 64)
    counts = sh.groupBy("shard").count()
    row = counts.agg(F.min("count").alias("lo"), F.max("count").alias("hi"),
                     F.count("*").alias("k")).collect()[0]
    assert row["k"] == 64
    # md5 uniformity: within ±5% of the mean at ~47k rows/shard
    mean = n / 64
    assert row["lo"] > 0.95 * mean and row["hi"] < 1.05 * mean


def test_cms_millions_fixed_size(spark):
    from access_mopper_spark.operators.sketch import cms_build, cms_estimate
    n = 2_000_000
    # zipf-ish: term t appears ~n/(t+1) times via modulo trick
    terms = spark.range(n).select(
        (F.col("id") % 1000).cast("string").alias("term"))
    sketch = cms_build(terms, "term", depth=4, width=2048)
    assert sketch.count() <= 4 * 2048
    est = cms_estimate(sketch, terms, "term", depth=4, width=2048)
    truth = terms.groupBy("term").agg(F.count("*").alias("t"))
    bad = truth.join(est, "term").where(F.col("est_count") < F.col("t")).count()
    assert bad == 0


def test_mixture_sample_millions(spark):
    from access_mopper_spark.operators.sampling import mixture_sample
    # 100:1 source skew; alpha=0.5 keeps the rare source whole and
    # downsamples the common one toward sqrt(c_common/c_rare) flattening
    n = 2_000_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 101 == 0, "rare").otherwise("common").alias("source"))
    n_rare = df.where(F.col("source") == "rare").count()
    n_common = n - n_rare
    kept = mixture_sample(df, "source", alpha=0.5)
    counts = {r["source"]: r["count"] for r in kept.groupBy("source").count().collect()}
    assert counts["rare"] == n_rare            # p_rare = 1 (never upsampled)
    p_common = (n_common / n_rare) ** -0.5
    assert abs(counts["common"] / n_common - p_common) < 0.01
    # alpha = 0 equalizes: common downsampled to ~the rare source's size
    eq = mixture_sample(df, "source", alpha=0.0)
    eq_counts = {r["source"]: r["count"] for r in eq.groupBy("source").count().collect()}
    assert eq_counts["rare"] == n_rare
    assert abs(eq_counts["common"] / n_common - n_rare / n_common) < 0.001
