"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB of documents):
- exact dedup = hash-groupBy on a fingerprint — one shuffle on md5 keys
  (uniformly distributed, no skew).
- MinHash/LSH = per-doc signature (narrow, pure Column math) → band keys
  → shuffle ONLY on band keys → candidate pairs verified within buckets.
  The cross-product never materializes; bucket sizes are bounded by
  near-dup cluster sizes.
- signatures use min-of-md5-strings per seeded hash: engine-portable
  (md5 is byte-identical everywhere), no random state to ship.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from access_mopper_spark.functions.rounding import pround

from access_mopper_spark.functions.text import char_shingles, fingerprint
from access_mopper_spark.operators.partitioning import ensure_min_partitions


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by normalized-text fingerprint: keep the smallest id
    per group, count members.  One shuffle on the hash key."""
    return (
        ensure_min_partitions(df).withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def minhash_signature(df: DataFrame, text_col: str = "text", n_hashes: int = 4,
                      shingle_k: int = 5, shingle_kind: str = "char",
                      hash_kind: str = "md5") -> DataFrame:
    """Append minhash_0..n-1 columns: each hash is min over shingles of an
    8-hex-char (32-bit) slice of md5(seed_g || shingle) — FOUR independent
    hash functions per md5 evaluation (one digest, four disjoint 32-bit
    lanes), so n hashes cost ceil(n/4) md5s per shingle instead of n.
    Min of fixed-width hex strings ≡ min of the underlying 32-bit ints —
    portable across engines without bigint casts.

    ``shingle_kind``: 'char' (k-char sliding window) or 'word' (k-word
    n-grams).  Word shingles discriminate far better when the character
    vocabulary is small (min-of-hash over a shared shingle pool
    degenerates → band buckets collide quadratically).

    ``hash_kind``: 'md5' (default, engine-portable — the oracle replays
    the identical digests) or 'xxhash64' — Spark-native seeded 64-bit
    hashes (pure codegen, long columns, no hex work); signature columns
    are then longs instead of hex strings (band keys hash either).
    MEASURED (x10 sweep, n_hashes=4): the md5 path is ~25% FASTER
    end-to-end — one digest amortizes over four 32-bit lanes, while the
    xxhash path pays n separate hash calls and n shingle-array
    traversals.  Choose xxhash64 for long signatures downstream (no hex
    strings in later joins), not for signature-build CPU."""
    from access_mopper_spark.functions.text import word_shingles
    df = ensure_min_partitions(df)  # md5-per-shingle is CPU-bound: run wide
    sh = (char_shingles(F.col(text_col), shingle_k) if shingle_kind == "char"
          else word_shingles(F.col(text_col), shingle_k))

    # NULL text has no shingles → NULL signature (the oracle's MIN over
    # an empty set); without this the fold's init sentinel leaks out
    # because least()/array_min() skip the NULL hashes
    def _null_on_null_text(out_df, col, typ):
        return out_df.withColumn(
            col, F.when(F.col(text_col).isNull(),
                        F.lit(None).cast(typ)).otherwise(F.col(col)))

    if hash_kind == "xxhash64":
        def xx_fn(seed):  # factory: a default arg would read as the index param
            return lambda s: F.xxhash64(s, F.lit(seed))

        out = df
        for i in range(n_hashes):
            out = out.withColumn(
                f"minhash_{i}", F.array_min(F.transform(sh, xx_fn(i))))
            out = _null_on_null_text(out, f"minhash_{i}", "long")
        return out

    # PySpark infers lambda arity from the signature, so closures must be
    # built by factories (a default arg would masquerade as the index
    # parameter of transform/aggregate).
    def hash_fn(g):
        return lambda s: F.md5(F.concat(F.lit(f"seed{g}:"), s))

    def merge_fn(k):
        return lambda acc, h: F.struct(*[
            F.least(acc[f"m{j}"], F.substring(h, j * 8 + 1, 8)).alias(f"m{j}")
            for j in range(k)
        ])

    out = df
    n_groups = (n_hashes + 3) // 4
    for g in range(n_groups):
        k = min(4, n_hashes - 4 * g)
        # md5 once per (shingle, group) in a transform; the fold then takes
        # k lane-mins per element — one digest feeding up to 4 hash lanes.
        # 'g'*8 sentinel sorts after every hex string.
        hashes = F.transform(sh, hash_fn(g))
        init = F.struct(*[F.lit("g" * 8).alias(f"m{j}") for j in range(k)])
        out = out.withColumn(f"__mh{g}", F.aggregate(hashes, init, merge_fn(k)))
        for j in range(k):
            out = out.withColumn(f"minhash_{4 * g + j}", F.col(f"__mh{g}")[f"m{j}"])
            out = _null_on_null_text(out, f"minhash_{4 * g + j}", "string")
        out = out.drop(f"__mh{g}")
    return out


def lsh_band_keys(sig_df: DataFrame, n_hashes: int = 4, band_size: int = 2) -> DataFrame:
    """Concatenate signature rows into band keys (banding technique:
    docs agreeing on ANY band become candidates).

    A NULL signature (NULL text — no shingles) yields NULL band keys,
    so shingle-less docs never become candidates of each other: without
    this, concat_ws skips the NULLs and every NULL doc lands in the
    md5('') bucket (fuzz seed2: cross-corpus decontamination flagged
    NULL docs as contaminated by the holdout's NULL docs)."""
    out = sig_df
    for b in range(0, n_hashes, band_size):
        cols = [F.col(f"minhash_{i}") for i in range(b, min(b + band_size, n_hashes))]
        out = out.withColumn(
            f"band_{b // band_size}",
            F.when(cols[0].isNull(), F.lit(None).cast("string"))
             .otherwise(F.md5(F.concat_ws("|", *cols))))
    return out


def near_dup_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   n_hashes: int = 6, band_size: int = 2, shingle_k: int = 3,
                   jaccard_threshold: float = 0.5,
                   shingle_kind: str = "word",
                   hash_kind: str = "md5",
                   band_cap: int | None = None,
                   restrict_ids: DataFrame | None = None) -> DataFrame:
    """MinHash-LSH candidate pairs verified by exact Jaccard on distinct
    shingle sets.

    Scale structure: candidate generation carries ONLY (id, band_key) —
    the shingle arrays never enter the band self-join shuffle; after
    id-pair dedup, shingle sets are re-joined by id (two linear joins)
    for the exact-Jaccard verify.  Bucket sizes stay bounded because
    word-shingle minhashes are diverse (see minhash_signature note).

    ``band_cap``: optional per-band candidate cap.  Duplicate FAMILIES
    make bucket populations grow with corpus replication and the
    intra-bucket pair count grows quadratically (the r4 ×10 sweep
    measured 8.8× wall growth for 10× data from exactly this); capping
    each (band_idx, band_key) bucket to its ``band_cap`` smallest ids
    bounds every bucket's pair count at cap² with a documented recall
    tradeoff: a pair is missed only if, in EVERY band the two docs
    share, one of them falls outside the bucket's cap — family members
    beyond the cap still dedup transitively through the kept
    representatives.  The cap is deterministic (smallest ids), so an
    oracle replays it exactly; ``None`` = exact LSH semantics.

    ``restrict_ids``: optional 1-column DataFrame of ids; when given the
    output is EXACTLY the full-corpus result filtered to pairs whose
    BOTH members are in the set — but computed without materializing
    the full pair set.  Band keys and the band_cap ranks are still
    computed over the whole corpus (linear work — the cap rank depends
    on every bucket member), then the banded rows are semi-joined to
    the restricted ids BEFORE the bucket self-join, so pair
    materialization and the Jaccard verify are bounded by the sample.
    This is the index-quality-readout shape (q_lsh_recall): score the
    production index on a sample without paying the production pair
    materialization — the ×100 honest sweep measured the full-pairs
    path at 27× wall for 10× data on exactly this readout."""
    from access_mopper_spark.functions.text import word_shingles
    df = ensure_min_partitions(df)
    sig = lsh_band_keys(
        minhash_signature(df, text_col, n_hashes, shingle_k, shingle_kind,
                          hash_kind),
        n_hashes, band_size)
    n_bands = (n_hashes + band_size - 1) // band_size
    # one (band_idx, band_key) row per doc per band → a SINGLE self-join
    # on the composite key replaces n_bands joins + union: one signature
    # computation, one shuffle, same candidate set (pairs agreeing on any
    # band), and the band_idx in the key keeps different bands' buckets
    # from cross-matching
    ids = sig.select(id_col, F.explode(F.array(*[
        F.struct(F.lit(b).alias("bi"), F.col(f"band_{b}").alias("bk"))
        for b in range(n_bands)])).alias("__b")) \
        .select(id_col, F.col("__b.bi").alias("bi"), F.col("__b.bk").alias("bk"))
    if band_cap is not None:
        wb = Window.partitionBy("bi", "bk").orderBy(F.asc(id_col))
        ids = (ids.withColumn("__r", F.row_number().over(wb))
                  .where(F.col("__r") <= band_cap).drop("__r"))
    verify_src = df
    if restrict_ids is not None:
        # AFTER the cap (its ranks are a full-corpus property), BEFORE
        # the self-join: only sampled ids enter pair materialization.
        # The sample is small by construction — broadcast the semi-join.
        keep_ids = F.broadcast(
            restrict_ids.select(F.col(restrict_ids.columns[0])
                                .alias(id_col)).distinct())
        ids = ids.join(keep_ids, id_col, "semi")
        verify_src = df.join(keep_ids, id_col, "semi")
    a = ids.select(F.col(id_col).alias("id_a"), "bi", "bk")
    bdf = ids.select(F.col(id_col).alias("id_b"), "bi", "bk")
    cand = (a.join(bdf, ["bi", "bk"]).where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").dropDuplicates(["id_a", "id_b"]))

    shingles = F.array_distinct(
        char_shingles(F.col(text_col), shingle_k) if shingle_kind == "char"
        else word_shingles(F.col(text_col), shingle_k))
    docs_sh = verify_src.select(F.col(id_col), shingles.alias("sh"))
    verified = (
        cand.join(docs_sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(docs_sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        verified.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", pround("jaccard", 6).alias("jaccard"))
    )


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n_hashes: int = 6,
                      band_size: int = 2, shingle_k: int = 3,
                      containment_bp_threshold: int = 8000,
                      band_cap: int | None = None) -> DataFrame:
    """DIRECTED near-containment pairs: |A∩B| / |A| over word k-gram
    shingle sets — the asymmetric complement to ``near_dup_pairs``'s
    Jaccard.  Jaccard misses the quote/subset shape entirely (a short
    doc fully embedded in a long one has tiny Jaccard but containment
    ~1.0), which is the dominant residual dup mode after symmetric
    dedup of web corpora: boilerplate-wrapped article copies, quoted
    posts, excerpt pages (reference capability class: corpus-curation
    dedup, same family as ``dup_ngram_fraction``).

    Scale structure is identical to ``near_dup_pairs`` — MinHash-LSH
    banding generates candidates carrying ONLY (id, band_key); shingle
    sets re-join by id for the exact verify; the cross-product never
    materializes.  (LSH banding recalls high-Jaccard pairs; a
    containment-complete index would band over the subset side's
    shingles directly — at this threshold family the practical recall
    comes from near-dup families where both metrics fire.  The oracle
    replays banding bit-for-bit, so the gate checks the IMPLEMENTED
    semantics, candidates included.)

    Returns (id_sub, id_sup, containment_bp): one row per direction
    whose containment of ``id_sub``'s shingles in ``id_sup``'s meets
    the basis-point threshold.  Integer basis points ((ni*10000) DIV
    n_sub) keep the surface hash-stable across engines."""
    from access_mopper_spark.functions.text import word_shingles
    df = ensure_min_partitions(df)
    sig = lsh_band_keys(
        minhash_signature(df, text_col, n_hashes, shingle_k, "word"),
        n_hashes, band_size)
    n_bands = (n_hashes + band_size - 1) // band_size
    ids = sig.select(id_col, F.explode(F.array(*[
        F.struct(F.lit(b).alias("bi"), F.col(f"band_{b}").alias("bk"))
        for b in range(n_bands)])).alias("__b")) \
        .select(id_col, F.col("__b.bi").alias("bi"), F.col("__b.bk").alias("bk"))
    if band_cap is not None:
        wb = Window.partitionBy("bi", "bk").orderBy(F.asc(id_col))
        ids = (ids.withColumn("__r", F.row_number().over(wb))
                  .where(F.col("__r") <= band_cap).drop("__r"))
    a = ids.select(F.col(id_col).alias("id_a"), "bi", "bk")
    bdf = ids.select(F.col(id_col).alias("id_b"), "bi", "bk")
    cand = (a.join(bdf, ["bi", "bk"]).where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").dropDuplicates(["id_a", "id_b"]))

    shingles = F.array_distinct(word_shingles(F.col(text_col), shingle_k))
    docs_sh = df.select(F.col(id_col), shingles.alias("sh"))
    verified = (
        cand.join(docs_sh.select(F.col(id_col).alias("id_a"),
                                 F.col("sh").alias("sh_a")), "id_a")
        .join(docs_sh.select(F.col(id_col).alias("id_b"),
                             F.col("sh").alias("sh_b")), "id_b")
        .select("id_a", "id_b",
                F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
                 .alias("__ni"),
                F.size("sh_a").cast("long").alias("__na"),
                F.size("sh_b").cast("long").alias("__nb"))
    )
    # both directions from one verified row: explode(array(struct)) —
    # never two scans of the candidate join
    directed = verified.select(F.explode(F.array(
        F.struct(F.col("id_a").alias("id_sub"), F.col("id_b").alias("id_sup"),
                 F.col("__ni").alias("ni"), F.col("__na").alias("n_sub")),
        F.struct(F.col("id_b").alias("id_sub"), F.col("id_a").alias("id_sup"),
                 F.col("__ni").alias("ni"), F.col("__nb").alias("n_sub")),
    )).alias("__d")).select("__d.*")
    bp = F.expr("(ni * 10000) DIV n_sub")
    return (directed.where(F.col("n_sub") > 0)
            .withColumn("containment_bp", bp)
            .where(F.col("containment_bp") >= containment_bp_threshold)
            .select("id_sub", "id_sup", "containment_bp"))


def _flatten_rows(cells) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list column → (flat concatenation, per-row lengths): ONE
    concatenate for the whole batch, no per-row numpy arithmetic."""
    arrs = [np.asarray(a) for a in cells if a is not None and len(a)]
    lens = np.fromiter(
        (0 if a is None else len(a) for a in cells), dtype=np.int64,
        count=len(cells))
    flat = (np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64))
    return flat, lens


def _vote_pack64(flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Single-pass numpy bit-vote: per document, each 64-bit hash votes
    +1/-1 per bit position; bit set iff votes > 0.  Vectorized
    unpack → reduceat → sign-pack over a whole Arrow batch; documents
    arrive flattened (``flat`` hashes + per-row ``lens``) so every op is
    a global numpy call, never per-row."""
    shifts = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << shifts
    chunk_rows = 2048  # bounds the bits matrix (~chunk·shingles·64 bytes)
    flat = flat.astype(np.uint64, copy=False)
    out = np.zeros(len(lens), dtype=np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    for lo in range(0, len(lens), chunk_rows):
        hi = min(lo + chunk_rows, len(lens))
        l = lens[lo:hi]
        nz = l > 0
        if not nz.any():
            continue
        seg = flat[offs[lo]:offs[hi]]
        bits = ((seg[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        starts = offs[lo:hi][nz] - offs[lo]
        ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
        votes = 2 * ones - l[nz][:, None]
        packed = ((votes > 0).astype(np.uint64) * weights) \
            .sum(axis=1, dtype=np.uint64).view(np.int64)
        out[lo:hi][nz] = packed  # slice is a view into out
    return out


def simhash64(df: DataFrame, text_col: str = "text", shingle_k: int = 5,
              out_col: str = "simhash", hash_kind: str = "xxhash64") -> DataFrame:
    """64-bit SimHash over character shingles.

    Each distinct shingle hashes to 64 bits JVM-side; per bit position the
    +1/-1 votes are summed across shingles; the sign vector is the
    fingerprint.  The bit-vote runs as a SINGLE Arrow-batched pandas UDF
    over the hash array(s) (vectorized numpy unpack → reduceat →
    sign-pack) — one pass per document, map-only, no shuffle.

    ``hash_kind``:
    - ``'xxhash64'`` (default): Spark-native 64-bit hash, fastest (pure
      codegen, no hex decode) — the production lane.  Measured at the
      ×10 sweep point (cold protocol): 23.2 s vs the md5 lane's 56.1 s
      (the Arrow vote kernel dominates the remainder); nothing
      downstream (banding, hamming, clusters) depends on WHICH 64-bit
      hash seeds the votes.
    - ``'md5'``: the 64 bits are the top 16 hex chars of the md5 digest.
      Engine-portable — DuckDB computes the identical digest, so the
      fingerprint is oracle-checkable end-to-end; the oracle-paired
      registry rows (``q_simhash``, ``q_simhash_near_dup``,
      ``q_simhash_clusters``) pin this lane explicitly and accept its
      CPU cost as the price of a full value-hash oracle.
    """
    df = ensure_min_partitions(df)
    # NULL text fingerprints like the empty document: without the
    # coalesce the NULL shingle's NULL hash reaches the numpy vote
    # kernel as NaN and casts to garbage bits (fuzz seed0, doc 116)
    sh = F.array_distinct(
        char_shingles(F.coalesce(F.col(text_col), F.lit("")), shingle_k))

    if hash_kind == "xxhash64":
        hashed = df.withColumn("__h", F.transform(sh, lambda s: F.xxhash64(s)))

        @F.pandas_udf("long")
        def _vote1(harr: pd.Series) -> pd.Series:
            flat, lens = _flatten_rows(harr)
            return pd.Series(_vote_pack64(flat, lens))

        return hashed.withColumn(out_col, _vote1(F.col("__h"))).drop("__h")

    # md5 lane: one digest per shingle, the top 64 bits decoded JVM-side
    # in a SINGLE signed conv (base -10 = two's-complement long, verified
    # bit-identical to the old (hi<<32)|lo two-lane split).  The whole
    # shingle→digest→long chain runs in ONE transform pass (higher-order
    # lambdas are interpreted, so every extra array pass is a per-element
    # interpreter walk) and array_distinct then compares LONGS, not
    # 5-char strings — md5 is injective here for dedup purposes.
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.greatest(F.length(t) - (shingle_k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.conv(
            F.substring(F.md5(t.substr(i, F.lit(shingle_k))), 1, 16),
            16, -10).cast("long"))
    hashed = df.withColumn("__h", F.array_distinct(grams))

    @F.pandas_udf("long")
    def _vote2(h: pd.Series) -> pd.Series:
        flat, lens = _flatten_rows(h)
        return pd.Series(_vote_pack64(flat, lens))

    return hashed.withColumn(out_col, _vote2(F.col("__h"))).drop("__h")


def simhash_hamming(a, b):
    """Hamming distance between two simhash64 Columns (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", max_hamming: int = 3,
                     shingle_k: int = 5, hash_kind: str = "xxhash64",
                     band_cap: int | None = None) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance — the
    Manku-Jain-Sarma (WWW'07 web-crawl dedup) banded search, the
    bitwise complement to MinHash-LSH: one 64-bit fingerprint per doc
    instead of a signature vector, catching small-edit near-dups.

    Pigeonhole banding: the 64 bits split into ``max_hamming + 1``
    contiguous bands, so any pair within Hamming ``max_hamming`` agrees
    EXACTLY on at least one band (≤ max_hamming bits differ → they
    cannot touch every band).  Candidate generation therefore carries
    only (id, band_idx, band_value) through ONE composite-key self-join
    — never the text — and candidates verify with a constant-time
    ``bit_count(xor)`` on the fingerprints riding the candidate rows.
    Exact (recall 1.0) at any corpus size, unlike probabilistic
    MinHash banding.

    ``band_cap`` bounds degenerate buckets exactly like
    ``near_dup_pairs``: each (band_idx, band_value) bucket keeps its
    ``band_cap`` smallest ids (deterministic → oracle-replayable);
    identical-fingerprint families beyond the cap still dedup
    transitively through the kept representatives.

    Returns (id_a, id_b, hamming) with id_a < id_b, one row per pair.
    """
    b = max_hamming + 1
    if not 1 <= b <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    # NULL/empty documents all fingerprint to simhash64("") and would
    # pair quadratically with each other as hamming-0 "near-dups" —
    # content-less docs carry no similarity signal, so they never enter
    # the candidate search (the lsh_band_keys NULL-contract, applied
    # here as a filter because simhash64 itself coalesces)
    df = df.where(F.col(text_col).isNotNull()
                  & (F.length(text_col) > 0))
    sim = simhash64(df, text_col, shingle_k, hash_kind=hash_kind) \
        .select(id_col, "simhash")
    # band i covers bits [off_i, off_i + w_i): widths as equal as
    # possible (the wider bands go first — any fixed deterministic
    # split satisfies the pigeonhole argument)
    widths = [(64 // b) + (1 if i < (64 % b) else 0) for i in range(b)]
    offs = [sum(widths[:i]) for i in range(b)]
    def _band(i):
        # width-64 (max_hamming=0) degenerates to the full fingerprint:
        # the mask (1<<64)-1 overflows a signed long, and no mask is
        # needed when the band spans every bit
        shifted = F.shiftrightunsigned(F.col("simhash"), offs[i])
        if widths[i] < 64:
            shifted = shifted.bitwiseAND(F.lit((1 << widths[i]) - 1))
        return F.struct(F.lit(i).alias("bi"), shifted.alias("bk"))

    bands = F.array(*[_band(i) for i in range(b)])
    ids = (sim.select(id_col, "simhash", F.explode(bands).alias("__b"))
           .select(id_col, "simhash",
                   F.col("__b.bi").alias("bi"), F.col("__b.bk").alias("bk")))
    if band_cap is not None:
        wb = Window.partitionBy("bi", "bk").orderBy(F.asc(id_col))
        ids = (ids.withColumn("__r", F.row_number().over(wb))
                  .where(F.col("__r") <= band_cap).drop("__r"))
    a = ids.select(F.col(id_col).alias("id_a"),
                   F.col("simhash").alias("__sa"), "bi", "bk")
    c = ids.select(F.col(id_col).alias("id_b"),
                   F.col("simhash").alias("__sb"), "bi", "bk")
    cand = (a.join(c, ["bi", "bk"]).where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
                    .cast("int").alias("hamming"))
            .dropDuplicates(["id_a", "id_b"]))
    return cand.where(F.col("hamming") <= max_hamming)


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id", salt: str = "split0") -> DataFrame:
    """Deterministic hash-based sampling — the train-data split
    primitive: reproducible across runs, engines, and cluster sizes (no
    RNG state; membership is a pure function of the id).  Uniform per-id
    hashing samples every stratum at ≈fraction, so stratified splits need
    no grouping; disjoint splits come from distinct salts.

    ``md5(salt || id)`` is uniform in hex space, so comparing the digest
    against the fraction's hex threshold keeps ≈``fraction`` of each
    stratum.  Map-only: no shuffle, no sort, works identically at 100 TB.
    """
    if not (0.0 < fraction < 1.0):
        raise ValueError("fraction must be in (0, 1)")
    threshold = format(int(fraction * 16**8), "08x")
    digest = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return df.where(F.substring(digest, 1, 8) < threshold)


def dedup_clusters(pairs: DataFrame, nodes: DataFrame,
                   id_a: str = "id_a", id_b: str = "id_b",
                   id_col: str = "doc_id", max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate pairs: every document
    gets the MIN document id reachable through the pair graph as its
    ``cluster_id`` (singletons keep their own id).  This is the step
    after LSH pair generation in a real dedup pipeline — pairs only say
    "a~b"; keeping one doc per CLUSTER needs the transitive closure.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbours' labels.  Rounds needed = graph
    diameter — near-dup clusters are tiny and dense, so convergence is
    2-3 rounds in practice (``max_iter`` bounds pathological chains).
    Each round is one shuffle on the edge key; the driver-side action
    per round is a single count on the CHANGED rows (inherent to any
    iterative fixpoint — documented, bounded by max_iter).  At 100 TB
    scale the same loop is how GraphX/GraphFrames run CC; for massive
    diameters switch to the large-star/small-star variant (same
    primitive, fewer rounds).
    """
    # undirected: propagate along both edge directions
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"))).distinct()
    edges.persist()
    labels = nodes.select(F.col(id_col).alias("id"),
                          F.col(id_col).alias("cluster_id"))
    cached = labels
    cached.persist()
    for _ in range(max_iter):
        neigh = (edges.join(labels.withColumnRenamed("id", "dst")
                            .withColumnRenamed("cluster_id", "__nl"), "dst")
                 .groupBy("src").agg(F.min("__nl").alias("__nmin")))
        # carry the PREVIOUS label alongside the new one: the changed
        # probe is then a map-side filter over the frame this round's
        # action materializes anyway — the old formulation re-joined
        # new vs old labels (one extra node-keyed shuffle of two cached
        # node-sized tables per round, r13 guide §2.4)
        new_labels = (labels.join(neigh.withColumnRenamed("src", "id"), "id", "left")
                      .select("id", F.least("cluster_id", F.coalesce("__nmin", "cluster_id"))
                              .alias("cluster_id"),
                              F.col("cluster_id").alias("__old")))
        new_labels.persist()
        changed = (new_labels
                   .where(F.col("cluster_id") != F.col("__old"))
                   .limit(1).count())
        cached.unpersist()
        cached = new_labels
        labels = new_labels.select("id", "cluster_id")
        if changed == 0:
            break
    edges.unpersist()
    out = labels.select(F.col("id").alias(id_col), "cluster_id")
    # the final label table stays persisted for the caller's action,
    # then the ContextCleaner reclaims it once the frame is GC'd; an
    # explicit handle release here would recompute the caller's plan
    return out


def dup_ngram_fraction(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 5,
                       min_count: int = 2,
                       hot_threshold: int | None = None,
                       hot_top_n: int | None = None) -> DataFrame:
    """Per-document duplicated-n-gram fraction: the share of a document's
    word n-gram positions whose gram occurs ≥ ``min_count`` times in the
    WHOLE corpus — the distributed approximation of suffix-array exact-
    substring dedup (flag/trim documents whose text is largely made of
    corpus-repeated spans; cf. the "dedupe by duplicated n-grams" family
    of training-data filters).

    Returns (id, n_grams, n_dup, dup_fraction).  Documents shorter than
    the n-gram window score 0 over their single truncated gram (matching
    the shingle convention in ``functions/text.word_shingles``).

    Scale shape: one map-side-combined shuffle on the gram key for the
    global counts, one keyed join of the exploded grams back to those
    counts, one per-doc aggregation.  The gram table is huge at 100 TB
    but stays keyed end-to-end — no broadcast of unbounded sides, no
    driver state.

    Skew hardening (``hot_threshold``): ultra-common grams ("of the",
    boilerplate spans) would send every occurrence of one gram to one
    reducer in the count-join.  With a threshold set, grams whose corpus
    count ≥ threshold form a HOT set that is small by construction
    (|hot| ≤ total_occurrences / threshold) and is BROADCAST — hot
    occurrences never shuffle at all — while the cold remainder joins by
    gram with per-key cardinality < threshold, so no reducer can exceed
    threshold rows for any key: the hot partition cannot exist.  With
    ``None`` the single keyed join is kept and AQE skew-join splitting
    is the runtime backstop.

    ``hot_top_n`` is the scale-safe variant of the same split: the hot
    set is the N most frequent grams (TakeOrderedAndProject — a bounded
    partial top-k, never a global sort), so the BROADCAST SIZE is capped
    at N regardless of corpus size — an absolute ``hot_threshold`` lets
    |hot| grow linearly with the corpus (every gram with count ≥ t),
    which eventually overflows the broadcast.  Cold keys are then
    bounded by the N-th largest count — the tightest bound any capped
    broadcast can give.  Takes precedence over ``hot_threshold``."""
    from access_mopper_spark.functions.text import word_shingles

    df = ensure_min_partitions(df)  # shingle build is CPU-bound: run wide
    grams = df.select(F.col(id_col),
                      F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
    # aggregate to (doc, gram, n) FIRST: the groupBy inserts an Exchange
    # that every downstream branch (global counts, hot/cold joins) reuses
    # (ReusedExchange), so the expensive explode+shuffle runs ONCE — and
    # the join inputs shrink to distinct (doc, gram) pairs, which on a
    # duplication-heavy corpus is far smaller than raw occurrences
    dg = grams.groupBy(id_col, "gram").agg(F.count("*").alias("__n"))
    if hot_threshold is not None or hot_top_n is not None:
        # diamond DAG: the hardened path consumes dg three times (global
        # counts, hot join, cold join) and per-branch column pruning
        # defeats Catalyst exchange reuse — each branch would re-run the
        # explode.  Persist materializes the (doc, gram) aggregate once,
        # disk-backed and bounded by the input's distinct pairs (the
        # distributed analogue of the reference holding its counts dict).
        from pyspark import StorageLevel

        dg = dg.persist(StorageLevel.MEMORY_AND_DISK)
    counts = dg.groupBy("gram").agg(F.sum("__n").alias("__gc"))
    if hot_top_n is not None:
        hot = counts.orderBy(F.col("__gc").desc(), "gram").limit(hot_top_n)
        cold = counts.join(F.broadcast(hot.select("gram")),
                           "gram", "left_anti")
    elif hot_threshold is not None:
        hot = counts.where(F.col("__gc") >= hot_threshold)
        cold = counts.where(F.col("__gc") < hot_threshold)
    else:
        hot = None
    if hot is None:
        joined = dg.join(counts, "gram")
    else:
        hot_occ = dg.join(F.broadcast(hot), "gram")              # map-side
        cold_occ = (dg.join(F.broadcast(hot.select("gram")),
                            "gram", "left_anti")                 # map-side
                    .join(cold, "gram"))       # bounded per-key cardinality
        joined = hot_occ.unionByName(cold_occ)
    return (joined
            .groupBy(id_col)
            .agg(F.sum("__n").alias("n_grams"),
                 F.sum(F.when(F.col("__gc") >= min_count, F.col("__n"))
                       .otherwise(F.lit(0))).alias("n_dup"))
            .select(id_col, "n_grams", "n_dup",
                    pround(F.col("n_dup").cast("double") / F.col("n_grams"), 6)
                    .alias("dup_fraction")))


def cross_corpus_dedup(df_new: DataFrame, df_ref: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       n_hashes: int = 6, band_size: int = 2,
                       shingle_k: int = 3, shingle_kind: str = "word",
                       hash_kind: str = "md5") -> DataFrame:
    """Fuzzy cross-corpus decontamination: drop NEW documents that share
    any MinHash-LSH band with a REFERENCE corpus (held-out benchmarks, an
    already-trained snapshot, a licensed set) — the near-duplicate
    counterpart of the exact-fingerprint anti-join in
    ``q_decontaminate``; catches paraphrases and light edits, not just
    byte-identical copies.

    Scale structure mirrors ``near_dup_pairs``: both sides carry ONLY
    (id, band_idx, band_key) into the match — one shuffle on uniformly
    distributed band keys regardless of corpus size — then matched NEW
    ids (a small, near-dup-bounded set) anti-join back against the full
    rows."""
    n_bands = (n_hashes + band_size - 1) // band_size

    def bands_of(df):
        sig = lsh_band_keys(
            minhash_signature(df, text_col, n_hashes, shingle_k,
                              shingle_kind, hash_kind),
            n_hashes, band_size)
        return sig.select(id_col, F.explode(F.array(*[
            F.struct(F.lit(b).alias("bi"), F.col(f"band_{b}").alias("bk"))
            for b in range(n_bands)])).alias("__b")) \
            .select(id_col, F.col("__b.bi").alias("bi"), F.col("__b.bk").alias("bk"))

    contaminated = (bands_of(df_new)
                    .join(bands_of(df_ref).select("bi", "bk").distinct(),
                          ["bi", "bk"], "left_semi")
                    .select(id_col).distinct())
    return df_new.join(contaminated, id_col, "left_anti")


def prefix_filter_join(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       threshold: float = 0.6,
                       shingle_k: int = 1,
                       release: bool = True) -> DataFrame:
    """EXACT-threshold Jaccard set-similarity self-join via prefix
    filtering (the AllPairs/PPJoin family) — the deterministic
    complement to MinHash-LSH ``near_dup_pairs``: every pair with
    word-set Jaccard ≥ threshold is returned, guaranteed, no
    probabilistic recall gap.

    Prefix principle: order every document's distinct tokens by global
    rarity (ascending document frequency, token as tie-break).  Two
    sets X, Y with J(X,Y) ≥ t overlap in ≥ ceil(t/(1+t)·(|X|+|Y|))
    elements, so each set need only index its first
    |X| − ceil(t·|X|) + 1 tokens — if X and Y share NO prefix token
    they cannot pass the threshold.  Rare-first ordering makes those
    prefix postings the SHORTEST lists, so the candidate join fans out
    on the cold tail of the token distribution, never on stopwords —
    that is what keeps the bucket join bounded at 100 TB where a
    naive token join explodes on 'the'.

    Plan: doc-frequency agg (one shuffle) → per-doc rarity sort (keyed
    window) → prefix postings explode → self-join on prefix token with
    the PPJoin LENGTH filter inline (J ≥ t forces t·|larger| ≤
    |smaller|, so size-mismatched pairs drop before the distinct) →
    distinct candidate pairs → verify by joining each side's FULL
    TOKEN ARRAY (doc-sized dimension — broadcast when it fits) and
    counting the overlap per-row with ``array_intersect``, JVM-side.
    The verify explicitly does NOT re-explode candidates × tokens into
    a shuffle: on a templated corpus candidates grow quadratically
    within template families and the exploded verify carried 100M+
    rows at sf0.1 (measured 103 s; array-verify runs in seconds).
    Everything integer/count-based; the final ratio test is one double
    multiply per surviving row.

    Returns (id_a, id_b, inter, uni) with id_a < id_b, both BIGINT
    counts.  threshold is a plain fraction (e.g. 0.6).

    ``shingle_k > 1`` switches the set elements from single words to
    k-word shingles (repo ``word_shingles`` convention, truncated
    final shingle for short docs).  On low-vocabulary/templated
    corpora word SETS are degenerate — this testdata has 31 distinct
    words, so nearly every doc pair passes word-set Jaccard and the
    output itself is quadratic; shingles discriminate by word ORDER
    and restore selectivity.

    ``release`` (default True): materialize the pair output eagerly
    (``localCheckpoint``) and UNPERSIST the corpus-sized tokenized
    array cache before returning — without this the eager token cache
    outlives the query for the whole session (guide §5 cache
    accumulation; at an 87-query bench or 463-query gate the leaked
    blocks become real executor memory pressure — the r12 verdict's
    one flagged leak).  The checkpoint copies the RESULT, so pass
    ``release=False`` when the threshold/corpus make the verified pair
    set itself corpus-sized and a lazy plan must flow through."""
    from access_mopper_spark.functions.text import word_shingles, ws_normalized

    if shingle_k > 1:
        elems = word_shingles(F.col(text_col), shingle_k)
    else:
        elems = F.split(ws_normalized(F.col(text_col)), " ", -1)
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_sort(F.array_distinct(
            F.filter(elems, lambda t: t != ""))).alias("toks"))
    arrs = (base.where(F.size("toks") > 0)
                .withColumn("sz", F.size("toks"))
                .persist())
    # eager: the tokenized table feeds the postings explode AND both
    # verify legs as concurrent stages of one action — lazily persisted
    # it is re-tokenized by every racing stage before blocks land in
    # the cache (the 3x rep variance q_similarity_join_exact showed)
    arrs.count()
    toks = arrs.select("id", "sz", F.explode("toks").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    # rarity rank within each doc: one keyed window over doc id
    ranked = (toks.join(dfreq, "tok")
                  .withColumn("r", F.row_number().over(
                      Window.partitionBy("id").orderBy("df", "tok"))))
    pref = (ranked.where(F.col("r") <=
                         F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz"))
                         + F.lit(1))
                  .select("id", "sz", "tok"))
    cand = (pref.alias("x").join(pref.alias("y"), "tok")
                .where((F.col("x.id") < F.col("y.id"))
                       # length filter: t·max(|X|,|Y|) ≤ min(|X|,|Y|)
                       & (F.lit(threshold)
                          * F.greatest("x.sz", "y.sz").cast("double")
                          <= F.least("x.sz", "y.sz").cast("double")))
                .select(F.col("x.id").alias("id_a"),
                        F.col("y.id").alias("id_b"))
                .distinct())
    aa = arrs.select(F.col("id").alias("id_a"), F.col("toks").alias("ta"),
                     F.col("sz").alias("sza"))
    ab = arrs.select(F.col("id").alias("id_b"), F.col("toks").alias("tb"),
                     F.col("sz").alias("szb"))
    out = (cand.join(aa, "id_a").join(ab, "id_b")
               .withColumn("inter", F.size(F.array_intersect("ta", "tb")))
               .withColumn("uni", F.col("sza") + F.col("szb") - F.col("inter"))
               # J >= t  <=>  inter >= t * uni; evaluate as a product
               # comparison so both engines run one double multiply
               .where(F.col("inter").cast("double")
                      >= F.lit(threshold) * F.col("uni").cast("double"))
               .select("id_a", "id_b",
                       F.col("inter").cast("long").alias("inter"),
                       F.col("uni").cast("long").alias("uni")))
    if release:
        # eager checkpoint first (materializes while arrs is still
        # cached), THEN drop the token cache — blocks are owned by the
        # checkpoint RDD and reclaimed by the ContextCleaner when the
        # frame is garbage-collected, unlike CacheManager entries.
        # Routed through eager_release so the SPARK_GRAFT_PLAN_LAZY
        # plan-dump bypass applies here too (imported lazily: _core
        # imports operators.resample at module load).
        from access_mopper_spark.queries._core import eager_release
        out = eager_release(out, arrs)
    return out


def ngram_decontaminate(df_new: DataFrame, df_ref: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 8) -> DataFrame:
    """EXACT n-gram overlap decontamination (the GPT-3/PaLM method:
    drop training documents sharing any word n-gram with an evaluation
    benchmark) — the exact-match complement of the MinHash-band
    ``cross_corpus_dedup``: LSH catches paraphrases, this catches
    verbatim spans the banding can miss at low global similarity.

    Returns ``(id, n_grams, n_shared)`` for CONTAMINATED new documents
    only (n_shared ≥ 1), where n_shared counts the document's DISTINCT
    n-grams that occur anywhere in the reference corpus.  Documents
    shorter than the window contribute their single truncated shingle
    (the ``word_shingles`` convention) — a short doc that verbatim-
    matches benchmark text still flags.

    Scale shape: the reference side is a benchmark (thousands of docs,
    not TBs) — its distinct gram set BROADCASTS, so the corpus-side
    probe is map-only: explode → distinct (doc, gram) → broadcast-hash
    semi-join → per-doc count.  No corpus shuffle other than the
    per-doc rollup; at a reference too large to broadcast the same plan
    degrades to one keyed semi-join on the gram."""
    from access_mopper_spark.functions.text import word_shingles
    from access_mopper_spark.operators.partitioning import \
        ensure_min_partitions

    ref_grams = (df_ref.where(F.col(text_col).isNotNull())
                 .select(F.explode(word_shingles(F.col(text_col), n))
                         .alias("gram"))
                 .distinct())
    new_grams = (ensure_min_partitions(df_new)
                 .where(F.col(text_col).isNotNull())
                 .select(F.col(id_col),
                         F.explode(word_shingles(F.col(text_col), n))
                         .alias("gram"))
                 .distinct())
    hits = new_grams.join(F.broadcast(ref_grams), "gram", "left_semi")
    totals = new_grams.groupBy(id_col).agg(
        F.count("*").alias("n_grams"))
    shared = hits.groupBy(id_col).agg(F.count("*").alias("n_shared"))
    return (shared.join(totals, id_col)
                  .select(id_col, "n_grams", "n_shared"))


def lsh_calibration(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n_hashes: int = 6,
                    band_size: int = 2, shingle_k: int = 3) -> DataFrame:
    """MinHash-LSH parameter calibration: measured band-collision rates
    against exact Jaccard, per similarity decile — the report that
    picks (bands, rows) BEFORE a 100 TB dedup run commits to a
    configuration.  Theory says a pair at Jaccard s collides on ≥1 of
    b bands of r rows with p = 1−(1−s^r)^b; this measures how the
    deployed signature scheme actually tracks that S-curve on real
    corpus text.

    Output per decile d (= ⌊10·J⌋ of the exact word-shingle Jaccard):
    ``(s_decile, n_pairs, n_candidates, sum_collide_bands,
    theory_ppm)`` — n_candidates = pairs colliding on ≥1 band (what
    LSH would surface), sum_collide_bands the total matching bands,
    theory_ppm = ⌊10⁶·p(midpoint)⌋ evaluated once in the driver and
    shipped as a literal (no cross-engine pow in the hash surface).

    Scale shape: the quadratic all-pairs Jaccard is replaced by a
    DETERMINISTIC linear pair sample — docs bucket by the first band
    key's 2-hex prefix (256 buckets) and each pairs with its
    (band_0, md5(text), id)-order neighbour inside the bucket.
    Near-duplicates share band_0, so family members sort adjacent and
    populate the high-similarity deciles, while docs that merely share
    a band prefix give the low-similarity mass — the sample spans the
    S-curve's range at n−256 pairs and replays identically on any
    engine.  The 256-bucket neighbour sort runs over SLIM KEYS ONLY
    (id, band_i, md5(text)) — the shingle sets join back onto the ~n
    sampled pairs afterwards through two hash joins at full
    parallelism.  (r8 verdict: projecting the shingle arrays before
    the window dragged O(corpus tokens) through a 256-partition sort
    — 14.5× wall for 10× data at ×100; the fat sort was the only
    superlinear point in the sweep.)"""
    b = n_hashes // band_size
    from pyspark.sql import Window as W

    from access_mopper_spark.functions.text import word_shingles

    sig = lsh_band_keys(
        minhash_signature(df, text_col, n_hashes=n_hashes,
                          shingle_k=shingle_k, shingle_kind="word"),
        n_hashes, band_size)
    shingles = F.array_distinct(word_shingles(F.col(text_col), shingle_k))
    # slim sort payload: the shingle filter evaluates map-side and the
    # array is DISCARDED before the exchange — only ids, band keys and
    # one md5 ride the window shuffle
    slim = (sig.where(F.size(shingles) > 0)
               .select(id_col,
                       *[f"band_{i}" for i in range(b)],
                       F.md5(F.col(text_col)).alias("__h")))
    bucketed = slim.withColumn("__bk", F.substring("band_0", 1, 2))
    w = W.partitionBy("__bk").orderBy("band_0", "__h", id_col)
    rn = bucketed.withColumn("__rn", F.row_number().over(w))
    a, c = rn.alias("a"), rn.alias("c")
    collide = sum(
        (F.col(f"a.band_{i}") == F.col(f"c.band_{i}")).cast("int")
        for i in range(b))
    pair_keys = (a.join(
        c, (F.col("a.__bk") == F.col("c.__bk"))
        & (F.col("c.__rn") == F.col("a.__rn") + 1))
        .select(F.col(f"a.{id_col}").alias("__ida"),
                F.col(f"c.{id_col}").alias("__idc"),
                collide.alias("__nc")))
    # join the shingle sets back for the sampled pairs only: two slim
    # hash joins (arrays shuffle once per side, hashed across the full
    # shuffle parallelism) instead of a fat 256-partition sort
    sh = (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col), shingles.alias("__sh"))
            .where(F.size("__sh") > 0))
    paired = (pair_keys
              .join(sh.select(F.col(id_col).alias("__ida"),
                              F.col("__sh").alias("__sha")), "__ida")
              .join(sh.select(F.col(id_col).alias("__idc"),
                              F.col("__sh").alias("__shc")), "__idc"))
    scored = paired.select(
        F.expr("(10 * size(array_intersect(__sha, __shc))) div "
               "size(array_union(__sha, __shc))").alias("s_decile"),
        F.col("__nc"))
    import math
    theory = {d: math.floor(1e6 * (1.0 - (1.0 - (1.0 if d == 10 else
                                                 (d + 0.5) / 10.0)
                                          ** band_size) ** b))
              for d in range(11)}
    tmap = F.create_map(*[F.lit(x) for kv in theory.items() for x in kv])
    return (scored.groupBy(F.col("s_decile").cast("long").alias("s_decile"))
            .agg(F.count("*").alias("n_pairs"),
                 F.sum((F.col("__nc") >= 1).cast("long"))
                 .alias("n_candidates"),
                 F.sum("__nc").cast("long").alias("sum_collide_bands"))
            .withColumn("theory_ppm",
                        tmap[F.col("s_decile").cast("int")].cast("long")))


def dedup_keep_best(clusters: DataFrame, scored: DataFrame,
                    id_col: str = "doc_id", cluster_col: str = "cluster_id",
                    score_col: str = "score") -> DataFrame:
    """CCNet-style representative selection: keep the HIGHEST-quality
    document per near-dup cluster (score DESC, id tiebreak) instead of
    the arbitrary min-id — the policy real pipelines use (CCNet keeps
    the lowest-perplexity member; any quality score column works).

    ``clusters`` is dedup_clusters output (doc_id, cluster_id);
    ``scored`` carries (doc_id, score).  Returns one row per cluster
    with >=1 scored member: (cluster_id, keep_id, score, n_members).
    Plan: one join shuffle + a rank-pushed per-cluster top-1
    (partial_topk — no cluster ever sorts more than k rows per task)
    + a broadcast-size cluster-count join."""
    from access_mopper_spark.operators.similarity import partial_topk
    j = clusters.join(scored, id_col)
    sizes = clusters.groupBy(cluster_col).agg(
        F.count("*").alias("n_members"))
    best = partial_topk(j, [cluster_col],
                        [F.col(score_col).desc(), F.col(id_col)], 1)
    return (best.select(cluster_col, F.col(id_col).alias("keep_id"),
                        score_col)
            .join(sizes, cluster_col))


def winnowing_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 5,
                           w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every ``k``-gram, slide a window of ``w``
    consecutive gram hashes, keep each window's MINIMUM — the selected
    set is a position-robust fingerprint with the winnowing guarantee
    that any shared substring of length >= w + k - 1 yields at least
    one shared fingerprint.  The rolling-hash fingerprinting stage of
    plagiarism/near-dup detection, complementary to MinHash (which
    bounds SET resemblance, not substring matches).

    Hashes are 8-hex-char md5 lanes (min over fixed-width hex strings
    == min over the 32-bit ints — the repo's portable-minhash trick),
    so an oracle replays the identical selection.  Returns DISTINCT
    ``(id, fp)`` rows; docs shorter than k + w - 1 chars have no
    window and drop (both engines).

    Scale shape: fingerprint construction is MAP-ONLY (two higher-order
    transforms over in-row arrays, no explode until the output
    projection, no shuffle until the final distinct) — at 100 TB it
    rides any corpus scan for free; the distinct is one
    map-side-combined exchange on (id, fp).

    The gram-hash array is STAGED as its own projection and referenced
    TWICE downstream (window bound + window body): nesting the grams
    transform inside the window transform's lambda re-evaluates all G
    gram md5s per window — O(G²) digests, measured as a ~50× blowup at
    ×10 — and CollapseProject would inline a once-referenced staged
    column straight back into the lambda (the q_gopher_rules staging
    lesson: an expensive alias must be multiply-referenced to stay
    materialized)."""
    txt = F.col(text_col)
    n = F.length(txt)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.substring(F.md5(F.substr(txt, i, F.lit(k))), 1, 8))
    staged = (docs.where(txt.isNotNull() & (n >= k + w - 1))
              .select(F.col(id_col), grams.alias("__grams")))
    mins = F.transform(
        F.sequence(F.lit(1), F.size("__grams") - (w - 1)),
        lambda s: F.array_min(F.slice(F.col("__grams"), s, w)))
    return (staged.select(F.col(id_col),
                          F.explode(F.array_distinct(mins)).alias("fp"))
            .distinct())


def winnowing_similarity(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 5, w: int = 4,
                         min_shared: int = 2,
                         fp_cap: int | None = 50) -> DataFrame:
    """MOSS-style pair similarity from shared winnowing fingerprints:
    which document pairs share substrings, and how much?  The report
    stage of plagiarism/boilerplate detection on top of
    ``winnowing_fingerprints`` — a shared fingerprint witnesses a
    shared substring of length ≥ k (guaranteed found when ≥ w+k−1).

    ``fp_cap`` drops STOP fingerprints (selected minima appearing in
    more than ``fp_cap`` docs — ubiquitous substrings like common words
    carry no similarity signal and their buckets blow up the self-join
    quadratically; MOSS does exactly this).  Deterministic (a count
    threshold), so an oracle replays it.

    Plan: fingerprint table → one map-side-combined fp count (the stop
    filter rides the count join) → fp-key self-join carrying only ids
    → pair aggregate → two slim id-joins for the per-doc totals.
    Output: (id_a, id_b, n_shared, containment_bp) with containment =
    shared / min(|fp_a|, |fp_b|) over the FILTERED fingerprint sets,
    integer basis points."""
    fps = winnowing_fingerprints(docs, id_col, text_col, k, w)
    if fp_cap is not None:
        keep = (fps.groupBy("fp").agg(F.count("*").alias("__df"))
                .where(F.col("__df") <= fp_cap).select("fp"))
        fps = fps.join(keep, "fp")
    sizes = fps.groupBy(id_col).agg(F.count("*").alias("__sz"))
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    pairs = (a.join(b, "fp").where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("n_shared"))
             .where(F.col("n_shared") >= min_shared))
    sa = sizes.select(F.col(id_col).alias("id_a"),
                      F.col("__sz").alias("__sa"))
    sb = sizes.select(F.col(id_col).alias("id_b"),
                      F.col("__sz").alias("__sb"))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b", F.col("n_shared").cast("long")
                    .alias("n_shared"),
                    F.expr("CAST(n_shared * 10000 "
                           "DIV LEAST(__sa, __sb) AS BIGINT)")
                    .alias("containment_bp")))
