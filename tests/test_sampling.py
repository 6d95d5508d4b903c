"""Corpus assembly operators (operators/sampling.py): mixture sampling,
quantile/cap filtering, sequence packing, sharding."""

from pyspark.sql import functions as F

from access_mopper_spark.operators.sampling import (cap_per_group,
                                                    mixture_sample,
                                                    pack_sequences,
                                                    quality_quantile_filter,
                                                    shard_assign,
                                                    uniform_hash)
from access_mopper_spark.sources.readers import load_table


def test_uniform_hash_range_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(uniform_hash(F.col("doc_id"), "s").alias("u"))
    row = u.agg(F.min("u").alias("lo"), F.max("u").alias("hi"),
                F.avg("u").alias("mu")).collect()[0]
    assert 0.0 <= row["lo"] and row["hi"] < 1.0
    assert 0.4 < row["mu"] < 0.6  # uniform over 500 ids
    # pure function of (salt, id): re-evaluation is identical
    a = {r["doc_id"]: r["u"] for r in
         docs.select("doc_id", uniform_hash(F.col("doc_id"), "s").alias("u")).collect()}
    b = {r["doc_id"]: r["u"] for r in
         docs.select("doc_id", uniform_hash(F.col("doc_id"), "s").alias("u")).collect()}
    assert a == b


def test_mixture_sample_flattens_shares(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    before = {r["source"]: r["count"] for r in
              docs.groupBy("source").count().collect()}
    kept = mixture_sample(docs, "source", alpha=0.5)
    after = {r["source"]: r["count"] for r in
             kept.groupBy("source").count().collect()}
    cmin = min(before.values())
    smallest = min(before, key=before.get)
    # the smallest source keeps everything (p = 1, never upsampled)
    assert after[smallest] == before[smallest]
    # larger sources are actually downsampled (the no-op regression)
    largest = max(before, key=before.get)
    if before[largest] > 2 * cmin:
        assert after[largest] < before[largest]
    # smaller sources keep a HIGHER fraction than larger ones (monotone)
    fracs = sorted((before[s], after[s] / before[s]) for s in before)
    for (c1, f1), (c2, f2) in zip(fracs, fracs[1:]):
        if c1 < c2:
            assert f1 >= f2 - 0.15  # hash noise tolerance at small counts
    # expected keep fraction ≈ (c/cmin)^(alpha-1) within sampling noise
    for s, c in before.items():
        p = min(1.0, (c / cmin) ** (0.5 - 1.0))
        assert abs(after.get(s, 0) / c - p) < 0.15


def test_quality_quantile_filter_keeps_top_half(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "lang", F.col("n_chars").alias("score"))
    kept = quality_quantile_filter(docs, "score", "lang", keep_top=0.5)
    for lang_row in docs.groupBy("lang").count().collect():
        lang, n = lang_row["lang"], lang_row["count"]
        k = kept.where(F.col("lang") == lang)
        kn = k.count()
        assert kn <= n // 2 + 1
        # every kept score >= every dropped score
        min_kept = k.agg(F.min("score")).collect()[0][0]
        dropped = docs.where(F.col("lang") == lang) \
            .join(k.select("doc_id"), "doc_id", "left_anti")
        max_drop = dropped.agg(F.max("score")).collect()[0][0]
        if max_drop is not None:
            assert min_kept >= max_drop


def test_cap_per_group_bounds_and_picks_best(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(docs, "source", "n_chars", 10)
    per = {r["source"]: r["count"] for r in capped.groupBy("source").count().collect()}
    assert all(v <= 10 for v in per.values())
    # kept minimum >= best 10th value per group
    for s in per:
        top10 = [r["n_chars"] for r in
                 docs.where(F.col("source") == s)
                     .orderBy(F.col("n_chars").desc()).limit(10).collect()]
        kept = [r["n_chars"] for r in capped.where(F.col("source") == s).collect()]
        assert sorted(kept, reverse=True) == sorted(top10, reverse=True)


def test_pack_sequences_invariants(spark, sf_dir):
    budget = 512
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "source", (F.col("n_chars") % 200 + 1).alias("ntok"))
    packed = pack_sequences(docs, "ntok", budget, "source").collect()
    by_group = {}
    for r in packed:
        by_group.setdefault(r["source"], []).append(r)
    for rows in by_group.values():
        rows.sort(key=lambda r: r["doc_id"])
        running = 0
        for r in rows:
            assert r["bin_id"] == running // budget
            assert r["bin_offset"] == running % budget
            running += r["ntok"]
        # bins are contiguous 0..max
        bins = {r["bin_id"] for r in rows}
        assert bins == set(range(max(bins) + 1))


def test_shard_assign_uniform_and_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = shard_assign(docs, 8)
    counts = [r["count"] for r in sh.groupBy("shard").count().collect()]
    assert len(counts) == 8
    n = sum(counts)
    assert max(counts) < 2 * n / 8  # no shard degenerate at 500 docs
    # stable across evaluations
    a = {r["doc_id"]: r["shard"] for r in sh.select("doc_id", "shard").collect()}
    b = {r["doc_id"]: r["shard"] for r in
         shard_assign(docs, 8).select("doc_id", "shard").collect()}
    assert a == b


def test_mixture_sample_plan_is_broadcast_map_only(spark, sf_dir):
    """The data side must not shuffle: per-source probabilities arrive by
    broadcast; membership is a map-side filter."""
    docs = load_table(spark, sf_dir, "documents")
    plan = mixture_sample(docs, "source", alpha=0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the streamed (data) branch of the join — between the join node and
    # its BroadcastExchange build side — must be scan+filter only; the
    # shuffles further down belong to the tiny per-source stats aggregates
    streamed = plan.split("BroadcastHashJoin", 1)[1].split("BroadcastExchange", 1)[0]
    assert "Exchange" not in streamed
    assert "FileScan" in streamed


def test_chunk_documents_reconstructs_text(spark, sf_dir):
    """Chunks at stride = size - overlap must tile the document: dropping
    each chunk's first `overlap` chars (except chunk 0) and concatenating
    in order reproduces the original text."""
    from access_mopper_spark.operators.sampling import chunk_documents
    docs = load_table(spark, sf_dir, "documents")
    size, overlap = 200, 50
    got = chunk_documents(docs, size, overlap).select(
        "doc_id", "chunk_id", "chunk").collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk"]))
    orig = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert set(by_doc) == set(orig)
    for d, chunks in by_doc.items():
        chunks.sort()
        assert [c for c, _ in chunks] == list(range(len(chunks)))
        rebuilt = chunks[0][1] + "".join(t[overlap:] for _, t in chunks[1:])
        assert rebuilt == orig[d]
        assert all(len(t) <= size for _, t in chunks)
        # every chunk except the last is full-size
        assert all(len(t) == size for _, t in chunks[:-1])


def test_chunk_documents_is_map_only(spark, sf_dir):
    from access_mopper_spark.operators.sampling import chunk_documents
    docs = load_table(spark, sf_dir, "documents")
    plan = chunk_documents(docs, 200, 50) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cross_corpus_dedup_drops_known_duplicates(spark, sf_dir):
    """A doc present VERBATIM in the reference must be dropped from the
    incoming side; a doc with a vocabulary no reference doc shares must
    survive."""
    from access_mopper_spark.operators.dedup import cross_corpus_dedup
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.limit(20)
    # incoming = shifted ids, half verbatim copies of ref, half unique text
    copies = ref.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    unique = spark.createDataFrame(
        [(200000 + i,
          f"zq{i}x wvut{i} qqqm{i} zzb{i} yyc{i} xxd{i} wwe{i} vvf{i}")
         for i in range(10)], "doc_id long, text string")
    incoming = copies.union(unique)
    kept = cross_corpus_dedup(incoming, ref)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert all(i not in kept_ids for r in ref.collect()
               for i in [r["doc_id"] + 100000])  # verbatim copies dropped
    assert {200000 + i for i in range(10)} <= kept_ids  # unique survive


def test_quality_quantile_filter_approx_close_to_exact(spark, sf_dir):
    """The no-shuffle approx path keeps (nearly) the same membership as
    the exact window path, and its data side never exchanges."""
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "lang", F.col("n_chars").alias("score"))
    exact = {r["doc_id"] for r in
             quality_quantile_filter(docs, "score", "lang", 0.5).collect()}
    approx_df = quality_quantile_filter(docs, "score", "lang", 0.5, exact=False)
    approx = {r["doc_id"] for r in approx_df.collect()}
    # symmetric difference bounded by sketch error + score ties
    assert len(exact ^ approx) <= 0.1 * len(exact)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    streamed = plan.split("BroadcastHashJoin", 1)[1].split("BroadcastExchange", 1)[0]
    assert "Exchange" not in streamed


import pytest


@pytest.mark.parametrize("size,overlap", [(100, 0), (128, 64), (600, 10)])
def test_chunk_documents_parametrized(spark, sf_dir, size, overlap):
    from access_mopper_spark.operators.sampling import chunk_documents
    docs = load_table(spark, sf_dir, "documents").limit(50)
    got = chunk_documents(docs, size, overlap).select(
        "doc_id", "chunk_id", "chunk").collect()
    orig = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk"]))
    for d, chunks in by_doc.items():
        chunks.sort()
        rebuilt = chunks[0][1] + "".join(t[overlap:] for _, t in chunks[1:])
        assert rebuilt == orig[d]


def test_weighted_sample_invariants(spark, sf_dir):
    from access_mopper_spark.operators.sampling import weighted_sample_per_group
    docs = load_table(spark, sf_dir, "documents")
    out = weighted_sample_per_group(docs, "n_chars", 15, "source")
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert all(v <= 15 for v in per.values())
    # deterministic across evaluations
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               weighted_sample_per_group(docs, "n_chars", 15, "source").collect())
    assert a == b
    # a row with overwhelming weight is (effectively) always selected:
    # key = u^(1/w) -> 1 as w -> inf, beating every unit-weight key
    heavy = spark.createDataFrame(
        [(i, "g", 1.0) for i in range(200)] + [(999, "g", 1e6)],
        "doc_id long, source string, w double")
    kept = weighted_sample_per_group(heavy, "w", 1, "source")
    assert [r["doc_id"] for r in kept.collect()] == [999]


def test_chunk_documents_tokens_tiles_words(spark, sf_dir):
    """Dropping each token chunk's first `overlap` tokens (except chunk
    0) and concatenating reproduces the normalized token stream, and no
    chunk ever splits a word."""
    from access_mopper_spark.functions.text import ws_normalized
    from access_mopper_spark.operators.sampling import chunk_documents_tokens
    docs = load_table(spark, sf_dir, "documents").limit(100)
    size, overlap = 32, 8
    got = chunk_documents_tokens(docs, size, overlap).select(
        "doc_id", "chunk_id", "chunk").collect()
    norm = {r["doc_id"]: r["t"] for r in
            docs.select("doc_id", ws_normalized(F.col("text")).alias("t")).collect()}
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk"]))
    assert set(by_doc) == set(norm)
    vocab = {w for t in norm.values() for w in t.split(" ")}
    for d, chunks in by_doc.items():
        chunks.sort()
        toks = chunks[0][1].split(" ")
        for _, c in chunks[1:]:
            toks += c.split(" ")[overlap:]
        assert " ".join(toks) == norm[d]
        # every chunk token is a whole word from the document
        for _, c in chunks:
            assert all(w in vocab for w in c.split(" "))


def test_exact_stratified_split_counts(spark, sf_dir):
    """Per stratum the split sizes are EXACTLY floor(0.8n)/floor(0.9n)-
    floor(0.8n)/rest, every input row appears exactly once (including
    NULL strata), and membership is deterministic across invocations."""
    import math
    from access_mopper_spark.operators.sampling import exact_stratified_split
    docs = load_table(spark, sf_dir, "documents")
    out = exact_stratified_split(docs, "doc_id", "lang")
    rows = out.collect()
    assert len(rows) == docs.count()
    by = {}
    for r in rows:
        by.setdefault(r["stratum"], {}).setdefault(r["split"], 0)
        by[r["stratum"]][r["split"]] += 1
    for stratum, splits in by.items():
        n = sum(splits.values())
        k_train = math.floor(0.8 * n)
        k_val = math.floor((0.8 + 0.1) * n) - k_train
        assert splits.get("train", 0) == k_train, stratum
        assert splits.get("val", 0) == k_val, stratum
        assert splits.get("test", 0) == n - k_train - k_val, stratum
    again = {(r["doc_id"], r["split"]) for r in
             exact_stratified_split(docs, "doc_id", "lang").collect()}
    assert again == {(r["doc_id"], r["split"]) for r in rows}


def test_temperature_weights_known_values(spark):
    """alpha=0.5 over shares (0.8, 0.2): weights ∝ (√0.8, √0.2) —
    the tail group's boost exceeds 1, the head's is below 1, and the
    weights sum to 1."""
    import math
    from access_mopper_spark.operators.sampling import temperature_weights
    rows = [("en",)] * 80 + [("fr",)] * 20
    df = spark.createDataFrame(rows, ["lang"])
    out = {r["lang"]: r for r in
           temperature_weights(df, "lang", alpha=0.5).collect()}
    z = math.sqrt(0.8) + math.sqrt(0.2)
    assert abs(out["en"]["weight"] - math.sqrt(0.8) / z) < 1e-12
    assert abs(out["fr"]["weight"] - math.sqrt(0.2) / z) < 1e-12
    assert abs(out["en"]["weight"] + out["fr"]["weight"] - 1.0) < 1e-12
    assert out["fr"]["boost"] > 1.0 > out["en"]["boost"]


def test_temperature_alpha_one_is_proportional(spark):
    from access_mopper_spark.operators.sampling import temperature_weights
    rows = [("a",)] * 3 + [("b",)] * 7
    out = {r["lang"]: r for r in
           temperature_weights(
               spark.createDataFrame(rows, ["lang"]), "lang",
               alpha=1.0).collect()}
    assert abs(out["a"]["boost"] - 1.0) < 1e-12
    assert abs(out["b"]["boost"] - 1.0) < 1e-12
