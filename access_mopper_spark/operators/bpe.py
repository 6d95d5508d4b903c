"""Distributed BPE tokenizer-merge training (Sennrich et al. 2016,
arXiv:1508.07909) — learn byte-pair-encoding merge rules over a corpus,
the tokenizer-training step of an LLM data pipeline.

Scale design (100 TB):
- training never touches raw documents after the FIRST pass: classic
  BPE trains on the *word-frequency table* (word → count), whose size is
  the corpus vocabulary (tens of millions of rows at web scale), not the
  corpus itself.  One tokenize+count shuffle builds it; every merge
  iteration after that runs on this small table.
- each merge iteration is one map-side-combined aggregation over the
  word table (pair → weighted count) plus a 1-row ``limit(1).collect()``
  to pick the winning pair — bounded driver state per round, the same
  shape as ``dedup.dedup_clusters``'s per-round convergence check.
- the winning pair is applied map-only (a string ``replace`` on the
  delimited symbol sequence); no shuffle.
- production tokenizers run thousands of merges; there the word table is
  ``.cache()``-ed (it is vocabulary-sized) and merges are batched — pick
  the top-B pairs per round that share no symbol, apply all B in one
  map pass (``n_merges // B`` rounds).  The per-round top-1 here is the
  exact textbook algorithm so the DuckDB oracle can replay it
  step-by-step.

Merge application semantics (identical on Spark and DuckDB, by
construction): symbol sequences are stored as ``\\x1f``-delimited strings
with leading/trailing delimiters (``\\x1fa\\x1fb\\x1fc\\x1f``), and a merge
(a, b) is ``replace(seq, '\\x1fa\\x1fb\\x1f', '\\x1fab\\x1f')``.  Because a
match consumes its trailing delimiter, *delimiter-sharing* adjacent
occurrences ('a a a a' under merge (a,a) → 'aa a a') defer the second
merge to a later iteration — both engines scan left-to-right
non-overlapping, so the learned merge tables are bit-identical.  Symbols
never contain the delimiter, so no cross-symbol match is possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from access_mopper_spark.functions.text import portable_lower

DELIM = "\x1f"


def word_frequency_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lowercased alphabetic word frequencies — the classic BPE training
    input.  Pre-tokenization keeps ``[a-z]+`` runs only (the role of a
    GPT-2-style pretokenizer class split); one explode + one count
    shuffle over the corpus, output is vocabulary-sized."""
    from access_mopper_spark.operators.partitioning import ensure_min_partitions

    words = ensure_min_partitions(df).select(
        F.explode(
            F.split(F.trim(F.regexp_replace(portable_lower(F.col(text_col)),
                                            "[^a-z]+", " ")), " ")
        ).alias("word")
    ).where(F.length("word") > 0)
    return words.groupBy("word").agg(F.count("*").alias("wc"))


def _initial_sequences(wf: DataFrame) -> DataFrame:
    """Each word as a delimited character-symbol sequence:
    'abc' → '\\x1fa\\x1fb\\x1fc\\x1f' (regexp backref insertion — the
    same rewrite the oracle applies with DuckDB's ``\\1`` syntax)."""
    seq = F.concat(F.lit(DELIM),
                   F.regexp_replace(F.col("word"), "(.)", "$1" + DELIM))
    return wf.select("word", "wc", seq.alias("seq"))


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol-pair counts over the word table: split
    the delimited sequence, zip it against itself shifted by one, explode
    and sum word counts.  Map-side combine keeps the shuffle tiny (pair
    cardinality, not occurrence cardinality)."""
    arr = F.split(F.expr(f"trim(BOTH chr(31) FROM seq)"), DELIM)
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("sym_a"), b.alias("sym_b")),
    )
    return (seqs.where(n >= 2)
                .select("wc", F.explode(pairs).alias("p"))
                .groupBy(F.col("p.sym_a").alias("sym_a"),
                         F.col("p.sym_b").alias("sym_b"))
                .agg(F.sum("wc").alias("pair_count")))


def bpe_train(spark: SparkSession, df: DataFrame, text_col: str = "text",
              n_merges: int = 6) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns a driver-assembled
    merge table ``(step, sym_a, sym_b, merged, pair_count)`` — n_merges
    rows, the artifact a tokenizer ships.  Deterministic tie-break:
    highest count, then lexicographic (sym_a, sym_b)."""
    # the word table is vocabulary-sized (not corpus-sized) — persist it
    # so the per-round pair counts re-run only the cheap map-only replace
    # chain, never the corpus tokenize+count shuffle (on a cluster this
    # is the difference between n_merges corpus scans and one)
    base = _initial_sequences(word_frequency_table(df, text_col)).persist()
    seqs = base
    merges = []
    for step in range(1, n_merges + 1):
        best = (_pair_counts(seqs)
                .orderBy(F.desc("pair_count"), F.asc("sym_a"),
                         F.asc("sym_b"))
                .limit(1).collect())
        if not best:
            break
        a, b, c = best[0].sym_a, best[0].sym_b, int(best[0].pair_count)
        merges.append((step, a, b, a + b, c))
        seqs = seqs.withColumn(
            "seq",
            F.replace(F.col("seq"), F.lit(DELIM + a + DELIM + b + DELIM),
                      F.lit(DELIM + a + b + DELIM)))
    base.unpersist()
    return spark.createDataFrame(
        merges, "step INT, sym_a STRING, sym_b STRING, merged STRING, "
                "pair_count BIGINT")


def bpe_segment(wf_seqs: DataFrame) -> DataFrame:
    """Final segmentation after training: the word table with its symbol
    arrays — what an encoder would broadcast to tokenize the corpus."""
    arr = F.split(F.expr(f"trim(BOTH chr(31) FROM seq)"), DELIM)
    return wf_seqs.select("word", "wc", arr.alias("symbols"))


def bpe_apply(wf: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply an ordered merge list to the word table: the map-only
    replace chain an encoder runs (broadcast the tiny merge table in
    spirit — here it is baked into the plan as literals).  Returns the
    word table with ``n_symbols``, the per-word token count under the
    learned vocabulary."""
    seqs = _initial_sequences(wf)
    for a, b in merges:
        seqs = seqs.withColumn(
            "seq",
            F.replace(F.col("seq"), F.lit(DELIM + a + DELIM + b + DELIM),
                      F.lit(DELIM + a + b + DELIM)))
    arr = F.split(F.expr(f"trim(BOTH chr(31) FROM seq)"), DELIM)
    return seqs.select("word", "wc", F.size(arr).alias("n_symbols"))
