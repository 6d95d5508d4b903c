"""Invariants for the round-5 corpus-statistics batch: Heaps growth,
n-gram novelty, FIM splits."""

from pyspark.sql import functions as F

from access_mopper_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_vocab_growth_monotone_and_reconciles(spark):
    rows = sorted(QUERIES["q_vocab_growth"](spark, SF).collect(),
                  key=lambda r: r["bucket"])
    assert rows
    cum_ty, cum_tk = 0, 0
    for r in rows:
        cum_ty += r["new_types"]
        cum_tk += r["n_tokens"]
        assert r["cum_types"] == cum_ty
        assert r["cum_tokens"] == cum_tk
        # a bucket can't introduce more types than it has tokens
        assert r["new_types"] <= r["n_tokens"]
    # final cum_types equals the corpus distinct-token count
    from access_mopper_spark.operators.search import tokens
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_types = (docs.select(F.explode(tokens(F.col("text"))).alias("t"))
                   .where(F.col("t") != "").select("t").distinct().count())
    assert rows[-1]["cum_types"] == n_types


def test_ngram_novelty_bounds_and_first_doc_all_novel(spark):
    rows = QUERIES["q_ngram_novelty"](spark, SF).collect()
    assert rows
    by_id = {r["doc_id"]: r for r in rows}
    first = min(by_id)
    # the earliest doc's grams are all first occurrences
    assert by_id[first]["n_novel"] == by_id[first]["n_distinct"]
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_distinct"]
    # every gram is novel in exactly one doc: novelty sums to the
    # number of distinct grams corpus-wide
    from access_mopper_spark.operators.search import tokens
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = tokens(F.col("text"))
    sz = F.greatest(F.size(w) - 2, F.lit(0))
    tri = F.zip_with(
        F.slice(w, 1, sz),
        F.zip_with(F.slice(w, 2, sz), F.slice(w, 3, sz),
                   lambda b, c: F.concat(b, F.lit("\x1f"), c)),
        lambda a, bc: F.concat(a, F.lit("\x1f"), bc))
    n_grams = (docs.select(F.explode(tri).alias("g"))
                   .select("g").distinct().count())
    assert sum(r["n_novel"] for r in rows) == n_grams


def test_fim_split_partitions_every_doc(spark):
    rows = QUERIES["q_fim_split"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_prefix"] >= 1 and r["n_middle"] >= 1 \
            and r["n_suffix"] >= 1
        assert r["n_prefix"] + r["n_middle"] + r["n_suffix"] \
            == r["n_tokens"]
        assert len(r["middle_fp"]) == 32


def test_fim_split_deterministic(spark):
    a = {r["doc_id"]: r["middle_fp"]
         for r in QUERIES["q_fim_split"](spark, SF).collect()}
    b = {r["doc_id"]: r["middle_fp"]
         for r in QUERIES["q_fim_split"](spark, SF).collect()}
    assert a == b


def test_exact_ngram_decontam_flags_planted_contamination(spark):
    """Plant a benchmark quote inside an otherwise-unique train doc and
    check it is flagged with the right severity."""
    from access_mopper_spark.operators.search import tokens

    eval_txt = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(0, eval_txt),                       # doc 0 -> eval (0 % 97 == 0)
         (1, "noise one two " + eval_txt),    # partial contamination
         (2, "clean doc with its own words entirely")],
        ["doc_id", "text"])
    w = tokens(F.col("text"))
    sz = F.greatest(F.size(w) - 3, F.lit(0))
    sep = F.lit("\x1f")
    quad = F.zip_with(
        F.slice(w, 1, sz),
        F.zip_with(F.slice(w, 2, sz),
                   F.zip_with(F.slice(w, 3, sz), F.slice(w, 4, sz),
                              lambda c, d: F.concat(c, sep, d)),
                   lambda b, cd: F.concat(b, sep, cd)),
        lambda a, bcd: F.concat(a, sep, bcd))
    g = docs.select("doc_id", F.explode(quad).alias("gram")).distinct()
    ev = g.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    out = {r["doc_id"]: r["n"] for r in
           g.where(F.col("doc_id") % 97 != 0).join(ev, "gram")
            .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # doc 1 shares the eval doc's three 4-grams; doc 2 is clean
    assert out == {1: 3}


def test_doclen_log_histogram_reconciles(spark):
    rows = QUERIES["q_doclen_log_histogram"](spark, SF).collect()
    from access_mopper_spark.functions.text import token_count
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t = (docs.where(F.col("text").isNotNull())
             .select(token_count(F.col("text")).alias("n"))
             .where(F.col("n") > 0))
    total = t.agg(F.count("*").alias("c"), F.sum("n").alias("s")).collect()[0]
    assert sum(r["n_docs"] for r in rows) == total["c"]
    assert sum(r["total_tokens"] for r in rows) == total["s"]
    for r in rows:
        lo, hi = 2 ** (r["log2_bucket"] - 1), 2 ** r["log2_bucket"] - 1
        # bucket b holds counts with exactly b binary digits
        assert r["n_docs"] > 0 and lo <= hi


def test_audio_chunk_plan_covers_stream_exactly(spark):
    """Chunks tile each stream: first starts at 0, last ends at
    n_samples, consecutive chunks overlap by exactly window-hop."""
    from collections import defaultdict

    rows = QUERIES["q_audio_chunk_plan"](spark, SF).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    docs = {r["doc_id"]: r["n_chars"] * 100
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .where(F.col("n_chars") > 0).collect()}
    assert set(by_doc) == set(docs)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        assert rs[0]["start_sample"] == 0
        assert rs[-1]["end_sample"] == docs[d]
        for a, b in zip(rs, rs[1:]):
            assert b["start_sample"] - a["start_sample"] == 464000
            assert a["end_sample"] > b["start_sample"] or \
                a["end_sample"] == docs[d]
        for r in rs:
            assert r["end_sample"] - r["start_sample"] <= 480000


def test_top_p_vocab_is_smallest_cover(spark):
    """Brute-force check per source: the reported n_types_p90 equals
    the smallest prefix of the count-sorted vocabulary whose mass
    reaches 90%."""
    import math
    from collections import Counter

    from access_mopper_spark.operators.search import tokens

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = (docs.select("source",
                        F.explode(tokens(F.col("text"))).alias("t"))
                .where(F.col("t") != "").collect())
    per_src = {}
    for r in toks:
        per_src.setdefault(r["source"], Counter())[r["t"]] += 1
    rows = {r["source"]: r for r in
            QUERIES["q_top_p_vocab"](spark, SF).collect()}
    assert set(rows) == set(per_src)
    for src, cnt in per_src.items():
        total = sum(cnt.values())
        counts = sorted(cnt.values(), reverse=True)
        cum = 0
        for i, v in enumerate(counts, 1):
            cum += v
            if cum * 10 >= total * 9:
                break
        r = rows[src]
        assert r["total_tokens"] == total
        assert r["n_types_p90"] == i
        # reported pieces reconcile
        assert r["n_types_p90"] == r["types_above"] + r["k_ties"]


def test_psi_identical_sides_is_zero(spark):
    """Equal distributions -> every smoothed PSI term is exactly 0."""
    from access_mopper_spark.operators.drift import psi_buckets
    rows = [(v, s) for v in (10, 100, 300) for s in (0, 1) for _ in range(4)]
    df = spark.createDataFrame(rows, ["val", "side"])
    out = psi_buckets(df, "val", "side", bucket_width=64).collect()
    assert len(out) == 3
    assert all(r["psi_term"] == 0.0 for r in out)
    assert all(r["n_ref"] == 4 and r["n_cur"] == 4 for r in out)


def test_psi_shift_detected(spark):
    """Mass moving to a higher bucket yields positive PSI total."""
    from access_mopper_spark.operators.drift import psi_buckets
    ref = [(10, 0)] * 8 + [(300, 0)] * 2
    cur = [(10, 1)] * 2 + [(300, 1)] * 8
    df = spark.createDataFrame(ref + cur, ["val", "side"])
    out = psi_buckets(df, "val", "side", bucket_width=64).collect()
    total = sum(r["psi_term"] for r in out)
    assert total > 0.1  # textbook PSI for a 60-point mass shift


def test_unigram_kl_zero_and_positive(spark):
    from access_mopper_spark.operators.drift import unigram_kl
    same = [("a", s) for s in (0, 1) for _ in range(3)] + \
           [("b", s) for s in (0, 1) for _ in range(2)]
    df = spark.createDataFrame(same, ["tok", "side"])
    r = unigram_kl(df, "tok", "side").collect()[0]
    assert r["kl_nats"] == 0.0
    assert r["vocab"] == 2 and r["n_tokens_ref"] == 5 == r["n_tokens_cur"]
    skew = [("a", 0)] * 9 + [("b", 0)] + [("a", 1)] + [("b", 1)] * 9
    r2 = unigram_kl(spark.createDataFrame(skew, ["tok", "side"]),
                    "tok", "side").collect()[0]
    assert r2["kl_nats"] > 0.5  # strong vocabulary flip
