"""Synthetic ×K scale-up of the sf0.1 testdata for BENCH trend points.

The driver ships sf{0.001,0.01,0.1} only; the scale question ("does the
plan survive 10×?") needs a second bench point.  This replicates every
sf0.1 table K times with DISJOINT key ranges (each key column offset by
replica × (max+1) of its domain) so join fan-outs, group cardinalities
and key distributions scale linearly instead of collapsing onto the
same keys.  Dimension tables that are semantically fixed-size (region,
nation) copy through unchanged — a 10× corpus still has 25 nations.

Documents keep their text byte-identical across replicas: a web corpus
at 10× the crawl IS mostly duplicates, which is exactly the workload
the dedup operators must survive — near-dup growth here is signal, not
an artifact.

``--dedup-honest`` (r8 verdict item 4) flips that contract for the
PAIR-MATERIALIZING dedup/similarity family: key-disjoint replication
makes every duplicate family K members (K·(K−1)/2 pairs — output rows
grow quadratically by data SEMANTICS, which at ×100 measures the
workload artifact, not the plan).  In honest mode each replica r>0
scales the UNIQUE mass while capping family size at the sf0.1 level:

* documents: every word is SUBSTITUTED by a replica-keyed hash token
  (8 hex chars of xxhash64("r{r}:" || word)).  Identical words map
  identically within a replica, so word-level dup-family structure is
  exactly preserved (doc A and B share word shingles iff they did in
  the source — including unrelated docs sharing common words, the
  sf0.1 semantics); different words map to unrelated pseudo-random
  char sequences, so unrelated docs share CHAR shingles only through
  genuinely shared words.  Across replicas the same word maps
  differently — nothing collides.  (The r8–r9 version used word
  PREFIXES, which made the first k chars of every word in a replica
  identical and manufactured 2.77M artifact hamming≤3 simhash pairs
  at ×10 vs 175 at sf0.1 — r9 verdict item 4; substitution removes
  the artifact.)
* embeddings: a deterministic per-(replica, dim) ±1 sign-flip mask —
  intra-replica dot products are EXACTLY preserved ((s⊙a)·(s⊙b) =
  a·b), inter-replica cosines become pseudo-random near-zero, so
  semantic-dedup clusters stay sf0.1-sized while the vector count
  scales.

Output goes to /tmp (bench input only — NEVER an oracle input; the
correctness gate runs exclusively on the driver's read-only testdata).

Usage: python tools/make_scaleup.py [K] [src_dir] [dst_dir] [--dedup-honest]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# table -> {column: key domain} columns offset by replica * (domain max+1)
OFFSETS = {
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "customer": {"c_custkey": "c"},
    "supplier": {"s_suppkey": "s"},
    "part": {"p_partkey": "p"},
    "events": {"event_id": "e", "user_id": "u"},
    "documents": {"doc_id": "d"},
    "embeddings": {"vec_id": "v"},
}
COPY = ["region", "nation"]


def main():
    argv = [a for a in sys.argv[1:] if a != "--dedup-honest"]
    honest = "--dedup-honest" in sys.argv
    k = int(argv[0]) if len(argv) > 0 else 10
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    dst = argv[2] if len(argv) > 2 else "/tmp/sf1_scaleup"

    from pyspark.sql import functions as F

    from access_mopper_spark.session import get_spark
    from access_mopper_spark.sources.readers import load_table

    spark = get_spark(app_name="make_scaleup")

    # key-domain maxima (one tiny agg per domain)
    dom = {
        "o": load_table(spark, src, "orders").agg(F.max("o_orderkey")).first()[0],
        "p": load_table(spark, src, "part").agg(F.max("p_partkey")).first()[0],
        "s": load_table(spark, src, "supplier").agg(F.max("s_suppkey")).first()[0],
        "c": load_table(spark, src, "customer").agg(F.max("c_custkey")).first()[0],
        "e": load_table(spark, src, "events").agg(F.max("event_id")).first()[0],
        "u": load_table(spark, src, "events").agg(F.max("user_id")).first()[0],
        "d": load_table(spark, src, "documents").agg(F.max("doc_id")).first()[0],
        "v": load_table(spark, src, "embeddings").agg(F.max("vec_id")).first()[0],
    }
    os.makedirs(dst, exist_ok=True)

    def write_single_file(df, t):
        """Match the driver testdata layout: <dst>/<table>.parquet is a
        single FILE, not a directory — the streaming source selects it
        with pathGlobFilter on the leaf name, which a directory of
        part-files would silently miss (empty stream)."""
        import glob
        import shutil

        tmp = f"{dst}/__tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{dst}/{t}.parquet")
        shutil.rmtree(tmp)

    for t in COPY:
        write_single_file(load_table(spark, src, t), t)
        print(f"copied {t}")

    def uniquify(rep, t, r):
        """Honest-mode per-replica content transform (r > 0 only):
        scale unique mass, cap dup-family size at the source level."""
        if not honest or r == 0:
            return rep
        if t == "documents":
            salt = F.lit(f"r{r}:")
            words = F.split(F.col("text"), " ")
            # whole-word substitution, replica-keyed: empty tokens stay
            # empty (preserves the whitespace run structure the line/
            # token ops depend on); 8 hex chars keep docs near source
            # length (birthday collisions at ~1e5 words/replica: ~1 —
            # the same "two words happen to be synonyms" noise a real
            # corpus has)
            subbed = F.array_join(
                F.transform(words, lambda w: F.when(
                    w == "", w).otherwise(F.lower(F.substring(
                        F.hex(F.xxhash64(F.concat(salt, w))), 1, 8)))),
                " ")
            return rep.withColumn(
                "text", F.when(F.col("text").isNotNull(), subbed))
        if t == "embeddings":
            # ±1 mask keyed by (replica, dim): intra-replica dot
            # products exactly preserved, inter-replica cosines ~0
            def flip(x, i):
                sign = (F.pmod(F.xxhash64(F.concat_ws(
                    ":", F.lit(str(r)), i.cast("string"))), F.lit(2))
                    * 2 - 1).cast("float")
                return x * sign
            return rep.withColumn(
                "embedding", F.transform(F.col("embedding"), flip))
        return rep

    for t, keys in OFFSETS.items():
        base = load_table(spark, src, t)
        reps = []
        for r in range(k):
            rep = base
            for col, d in keys.items():
                rep = rep.withColumn(col, (F.col(col)
                                           + F.lit(r * (dom[d] + 1))
                                           ).cast("long"))
            reps.append(uniquify(rep, t, r))
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        write_single_file(out, t)
        print(f"scaled {t} x{k}" + (" (dedup-honest)" if honest else ""))


if __name__ == "__main__":
    main()
