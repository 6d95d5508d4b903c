"""Count-min sketch (operators/sketch.py)."""

from pyspark.sql import functions as F

from access_mopper_spark.operators.search import tokens
from access_mopper_spark.operators.sketch import (cms_build, cms_estimate,
                                                  cms_merge)
from access_mopper_spark.sources.readers import load_table


def _toks(docs):
    return docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("term"))


def test_cms_never_underestimates(spark, sf_dir):
    toks = _toks(load_table(spark, sf_dir, "documents"))
    sketch = cms_build(toks, "term", depth=4, width=256)
    est = cms_estimate(sketch, toks, "term", depth=4, width=256)
    truth = toks.groupBy("term").agg(F.count("*").alias("t"))
    bad = truth.join(est, "term").where(F.col("est_count") < F.col("t")).count()
    assert bad == 0
    # sketch total mass = depth × token count
    n = toks.count()
    mass = sketch.agg(F.sum("cnt")).collect()[0][0]
    assert mass == 4 * n


def test_cms_exact_when_wide(spark, sf_dir):
    """With width >> distinct terms, collisions are rare enough that the
    min over 4 rows is exact for every term."""
    toks = _toks(load_table(spark, sf_dir, "documents"))
    n_distinct = toks.distinct().count()
    width = 64 * n_distinct
    sketch = cms_build(toks, "term", depth=4, width=width)
    est = cms_estimate(sketch, toks, "term", depth=4, width=width)
    truth = toks.groupBy("term").agg(F.count("*").alias("t"))
    off = truth.join(est, "term").where(F.col("est_count") != F.col("t")).count()
    assert off == 0


def test_cms_merge_equals_whole(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _toks(docs.where(F.col("doc_id") % 2 == 0))
    b = _toks(docs.where(F.col("doc_id") % 2 == 1))
    whole = cms_build(_toks(docs), "term", depth=4, width=256)
    merged = cms_merge(cms_build(a, "term", depth=4, width=256),
                       cms_build(b, "term", depth=4, width=256))
    w = {(r["d"], r["bucket"]): r["cnt"] for r in whole.collect()}
    m = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert w == m


def test_cms_sketch_is_fixed_size(spark, sf_dir):
    toks = _toks(load_table(spark, sf_dir, "documents"))
    sketch = cms_build(toks, "term", depth=4, width=128)
    assert sketch.count() <= 4 * 128
