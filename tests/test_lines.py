"""Line-level curation: boilerplate-line removal and C4 line filtering
(operators/lines.py)."""

from pyspark.sql import functions as F

from access_mopper_spark.operators.lines import (c4_line_filter,
                                                 remove_boilerplate_lines)


def test_remove_boilerplate_lines(spark):
    docs = spark.createDataFrame(
        [(i, f"BANNER\nbody text {i}\nFOOTER") for i in range(10)]
        + [(99, "BANNER\nBANNER\nonly unique line here")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(docs, min_docs=5).collect()}
    # banner+footer cross >=5 docs -> dropped everywhere; bodies survive
    assert out[0]["clean"] == "body text 0"
    assert out[0]["n_kept"] == 1 and out[0]["n_dropped"] == 2
    # duplicate line inside ONE doc is not boilerplate (distinct doc count)
    # but BANNER is (11 docs); doc 99 keeps its unique line only
    assert out[99]["clean"] == "only unique line here"
    assert out[99]["n_dropped"] == 2


def test_remove_boilerplate_drops_all_lines_doc(spark):
    docs = spark.createDataFrame(
        [(i, "SAME") for i in range(6)] + [(42, "SAME\nmine")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(docs, min_docs=5).collect()}
    # docs whose every line is boilerplate disappear from the output
    assert set(out) == {42}
    assert out[42]["clean"] == "mine"


def test_c4_line_filter_rules(spark):
    good = ("One proper sentence with enough words here.\n"
            "Another proper sentence with enough words too!\n"
            "And a third one rounds out the document?")
    docs = spark.createDataFrame(
        [(1, good),
         (2, good + "\nlorem IPSUM inside"),        # placeholder signal
         (3, good + "\nif (x) { y(); }"),           # code signal
         (4, "Too few surviving sentences here today.\nshort.\nnope"),
         (5, None)],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_line_filter(docs).collect()}
    assert set(out) == {1}
    assert out[1]["n_kept"] == 3
    assert out[1]["clean"] == good


def test_c4_line_keeps_terminal_quote(spark):
    docs = spark.createDataFrame(
        [(1, 'He said the words would carry plenty of weight."\n'
             "A second full sentence lands right here today.\n"
             "Third sentence closes out the entire document now.")],
        ["doc_id", "text"])
    out = c4_line_filter(docs).collect()
    assert len(out) == 1 and out[0]["n_kept"] == 3


# --- hard-negative mining (operators/ml.hard_negatives) ---------------

def test_hard_negatives_masks_same_label(spark):
    from access_mopper_spark.operators.ml import hard_negatives
    # 2 labels; anchor is label 0 -> only label-1 rows may be mined
    rows = [(i, [1.0, float(i % 3)], i % 2) for i in range(1, 9)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    anchors = spark.createDataFrame([(100, [1.0, 0.0], 0)],
                                    ["anchor_id", "embedding", "label"])
    got = hard_negatives(corpus, anchors, k=3).collect()
    assert len(got) == 3
    assert all(r["label"] == 1 for r in got)
    # exact top by cosine to [1,0]: label-1 rows with second dim 0 first
    assert got[0]["sim"] >= got[-1]["sim"]


def test_hard_negatives_empty_anchor_set(spark):
    from access_mopper_spark.operators.ml import hard_negatives
    corpus = spark.createDataFrame([(1, [1.0, 0.0], 0)],
                                   ["vec_id", "embedding", "label"])
    anchors = spark.createDataFrame(
        [(9, [0.0, 0.0], 0)],  # zero-norm -> filtered -> empty
        ["anchor_id", "embedding", "label"])
    assert hard_negatives(corpus, anchors, k=3).count() == 0


def test_hard_negatives_fewer_negatives_than_k(spark):
    from access_mopper_spark.operators.ml import hard_negatives
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.5, 0.5], 0), (3, [1.0, 0.1], 1)],
        ["vec_id", "embedding", "label"])
    anchors = spark.createDataFrame([(7, [1.0, 0.0], 0)],
                                    ["anchor_id", "embedding", "label"])
    got = hard_negatives(corpus, anchors, k=5).collect()
    # only one different-label row exists; sentinel rows must not leak
    assert len(got) == 1 and got[0]["vec_id"] == 3 and got[0]["sim"] > -1.5


# --- unicode script profiling (functions/text) -------------------------

def test_script_detection(spark):
    from access_mopper_spark.functions.text import (dominant_script,
                                                    script_count)
    from pyspark.sql import functions as SF
    cases = [("Привет мир", "cyrillic"), ("hello мир", "latin"),
             ("日本語のテキスト", "cjk"), ("안녕하세요", "hangul"),
             ("مرحبا بالعالم", "arabic"), ("Καλημέρα", "greek"),
             ("abcабв", "latin"),        # 3-3 tie -> fixed-order pick
             ("123 !!!", "none"), ("😀🎉", "none")]  # astral -> no script
    df = spark.createDataFrame([(c[0],) for c in cases], "t string")
    got = [r["d"] for r in
           df.select(dominant_script(SF.col("t")).alias("d")).collect()]
    assert got == [c[1] for c in cases]
    n = df.select(script_count(SF.col("t"), "cyrillic").alias("n")).collect()
    assert n[0]["n"] == 9  # 'Привет мир' minus the space


# --- xxhash64 minhash production path ----------------------------------

def test_minhash_xxhash64_exact_dups_collide(spark):
    # any hash function must give EXACT duplicates identical signatures;
    # and the NULL-text contract (NULL signature) must hold on the
    # production path exactly as on the md5 oracle path
    from access_mopper_spark.operators.dedup import minhash_signature
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the dog"),
         (2, "the quick brown fox jumps over the dog"),   # exact dup
         (3, "a completely different document body here"),
         (4, None)],
        ["doc_id", "text"])
    sig = {r["doc_id"]: r for r in
           minhash_signature(docs, "text", n_hashes=4, shingle_k=5,
                             hash_kind="xxhash64").collect()}
    for i in range(4):
        assert sig[1][f"minhash_{i}"] == sig[2][f"minhash_{i}"]
        assert sig[4][f"minhash_{i}"] is None
    assert any(sig[1][f"minhash_{i}"] != sig[3][f"minhash_{i}"]
               for i in range(4))
    # production path emits LONGs (codegen), not hex strings
    assert isinstance(sig[1]["minhash_0"], int)


# --- quality-ranked cluster representatives ----------------------------

def test_dedup_keep_best_policy(spark):
    from access_mopper_spark.operators.dedup import dedup_keep_best
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9), (10, 10)],
        ["doc_id", "cluster_id"])
    scored = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (9, 5)],     # doc 10 unscored (NULL text)
        ["doc_id", "score"])
    out = {r["cluster_id"]: r for r in
           dedup_keep_best(clusters, scored).collect()}
    # highest score wins; 99-99 tie breaks to the LOWER id
    assert out[1]["keep_id"] == 2 and out[1]["n_members"] == 3
    # singleton keeps itself
    assert out[9]["keep_id"] == 9 and out[9]["n_members"] == 1
    # clusters with no scored member produce no row
    assert 10 not in out


# --- readability scoring ------------------------------------------------

def test_flesch_reading_ease(spark):
    import pytest as _pt
    from pyspark.sql import functions as SF
    from access_mopper_spark.functions.text import (flesch_reading_ease,
                                                    sentence_count_proxy,
                                                    syllable_proxy)
    df = spark.createDataFrame(
        [("The cat sat on the mat.",),   # 6 words, 1 sent, 6 syllables
         ("",), ("no terminal punctuation here",)], "t string")
    rows = df.select(
        syllable_proxy(SF.col("t")).alias("sy"),
        sentence_count_proxy(SF.col("t")).alias("se"),
        flesch_reading_ease(SF.col("t")).alias("f")).collect()
    assert rows[0]["sy"] == 6 and rows[0]["se"] == 1
    assert rows[0]["f"] == _pt.approx(206.835 - 1.015 * 6 - 84.6 * 1.0)
    assert rows[1]["f"] is None          # wordless -> NULL
    assert rows[2]["se"] == 0            # proxy 0; formula clamps to 1


# --- Bradley-Terry preference rating ------------------------------------

def test_bt_rating_orders_by_strength(spark):
    from access_mopper_spark.operators.ml import bt_rating
    # item 0 beats everyone; item 2 loses to everyone; 1 is mixed
    comps = spark.createDataFrame(
        [(0, 1, 1.0)] * 8 + [(0, 2, 1.0)] * 8
        + [(1, 2, 1.0)] * 6 + [(1, 2, 0.0)] * 2,
        ["a", "b", "w"])
    r = {row["item"]: row["r"] for row in bt_rating(comps).collect()}
    assert r[0] > r[1] > r[2]


def test_bt_rating_symmetric_is_zero(spark):
    from access_mopper_spark.operators.ml import bt_rating
    comps = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 0.0), (1, 0, 1.0), (1, 0, 0.0)],
        ["a", "b", "w"])
    r = {row["item"]: row["r"] for row in bt_rating(comps).collect()}
    assert r[0] == 0.0 and r[1] == 0.0  # perfectly balanced evidence


# --- inter-annotator agreement ------------------------------------------

def test_cohens_kappa_known_values(spark):
    import pytest as _pt
    from access_mopper_spark.operators.aggregates import cohens_kappa
    # perfect agreement -> kappa 1; perfect disagreement -> negative;
    # one annotator constant -> pe has a 0 marginal, kappa defined
    perfect = spark.createDataFrame([(1, 1)] * 6 + [(0, 0)] * 4, ["a", "b"])
    assert cohens_kappa(perfect, "a", "b").collect()[0]["kappa"] == 1.0
    opposite = spark.createDataFrame([(1, 0)] * 5 + [(0, 1)] * 5, ["a", "b"])
    assert cohens_kappa(opposite, "a", "b").collect()[0]["kappa"] == -1.0
    # textbook 2x2: n=100, n11=40, n00=30, sa=50, sb=60
    rows = ([(1, 1)] * 40 + [(0, 0)] * 30 + [(1, 0)] * 10 + [(0, 1)] * 20)
    mixed = spark.createDataFrame(rows, ["a", "b"])
    got = cohens_kappa(mixed, "a", "b").collect()[0]
    po, pe = 0.70, 0.5 * 0.6 + 0.5 * 0.4
    assert got["kappa"] == _pt.approx((po - pe) / (1 - pe), abs=1e-6)
    # both annotators constant-and-equal: pe = 1 -> NULL (undefined)
    const = spark.createDataFrame([(1, 1)] * 5, ["a", "b"])
    assert cohens_kappa(const, "a", "b").collect()[0]["kappa"] is None


# --- instruction-template normalization ----------------------------------

def test_instruction_template_collapses_slots(spark):
    from pyspark.sql import functions as SF
    from access_mopper_spark.functions.text import instruction_template
    df = spark.createDataFrame(
        [('Write a story about "dogs" in 50 words',),
         ('Write a  story about "SPACE TRAVEL" in 1250 words',),
         ('write a story about "x" in 3.5 words',),
         ('List 5 facts about "cats"',)], "t string")
    got = [r["n"] for r in
           df.select(instruction_template(SF.col("t")).alias("n")).collect()]
    assert got[0] == got[1] == got[2] == \
        "write a story about <quote> in <num> words"
    assert got[3] == "list <num> facts about <quote>"


def test_c4_line_filter_crlf_docs_survive(spark):
    """CRLF documents pass the terminal-punctuation check (r8 ADVICE:
    an exact '\\n' split left '.\\r' line endings that silently failed
    every CRLF doc); output normalizes to LF."""
    lf = ("One proper sentence with enough words here.\n"
          "Another proper sentence with enough words too!\n"
          "And a third one rounds out the document?")
    crlf = lf.replace("\n", "\r\n")
    docs = spark.createDataFrame([(1, lf), (2, crlf)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_line_filter(docs).collect()}
    assert set(out) == {1, 2}
    assert out[2]["n_kept"] == 3
    assert out[2]["clean"] == lf  # reassembly normalizes CRLF -> LF


def test_boilerplate_matches_across_line_conventions(spark):
    """A banner line is the SAME boilerplate key whether the doc uses
    LF or CRLF (split on \\r?\\n keeps no trailing \\r in the key)."""
    docs = spark.createDataFrame(
        [(i, f"BANNER\r\nbody text {i}") for i in range(3)]
        + [(i, f"BANNER\nbody text {i}") for i in range(3, 6)],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(docs, min_docs=5).collect()}
    assert all(out[i]["clean"] == f"body text {i}" for i in range(6))
    assert all(out[i]["n_dropped"] == 1 for i in range(6))


def test_annotator_bias_known_values(spark):
    """3 items, 3 annotators; annotator 2 always votes 1 (positive
    bias), annotators 0/1 define the consensus."""
    from access_mopper_spark.operators.ml import annotator_bias
    rows = []
    for item, truth in [(0, 1), (1, 0), (2, 0)]:
        rows += [(item, 0, truth), (item, 1, truth), (item, 2, 1)]
    votes = spark.createDataFrame(rows, ["item", "annotator", "vote"])
    out = {r["annotator"]: r for r in
           annotator_bias(votes, "item", "annotator", "vote").collect()}
    # consensus = strict majority = truth (2 of 3 agree except item 0
    # where all three vote 1)
    assert out[0]["agree_bp"] == 10000 and out[0]["bias_bp"] == 0
    assert out[1]["agree_bp"] == 10000
    # annotator 2 agrees only on item 0 -> 1/3
    assert out[2]["n_votes"] == 3 and out[2]["n_agree"] == 1
    assert out[2]["agree_bp"] == 3333
    assert out[2]["pos_bp"] == 10000 and out[2]["consensus_pos_bp"] == 3333
    assert out[2]["bias_bp"] == 6667


def test_annotator_bias_tie_is_negative_consensus(spark):
    """Even vote splits -> consensus 0 (strict majority, deterministic)."""
    from access_mopper_spark.operators.ml import annotator_bias
    votes = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 0)], ["item", "annotator", "vote"])
    out = {r["annotator"]: r for r in annotator_bias(votes).collect()}
    assert out[1]["agree_bp"] == 10000  # the 0-voter matches consensus
    assert out[0]["agree_bp"] == 0


def test_position_bias_known_values(spark):
    from access_mopper_spark.operators.ml import position_bias
    # 4 pairs: first-shown wins 3 of 4
    comps = spark.createDataFrame(
        [("g", 1, 1), ("g", 0, 0), ("g", 1, 1), ("g", 1, 0)],
        ["grp", "a_shown_first", "a_wins"])
    out = position_bias(comps, group_cols=["grp"]).collect()[0]
    assert out["n_pairs"] == 4 and out["n_first_wins"] == 3
    assert out["first_win_bp"] == 7500
    # ungrouped variant returns one global row
    g = position_bias(comps).collect()
    assert len(g) == 1 and g[0]["first_win_bp"] == 7500


def test_dedup_paragraphs_keep_first(spark):
    from access_mopper_spark.operators.lines import dedup_paragraphs
    docs = spark.createDataFrame(
        [(1, "alpha\nbeta\nalpha\ngamma\nbeta"),
         (2, "only\r\nonly\r\nonly"),
         (3, None)],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}
    assert set(out) == {1, 2}  # NULL text drops
    assert out[1]["clean"] == "alpha\nbeta\ngamma"
    assert out[1]["n_paragraphs"] == 5 and out[1]["n_removed"] == 2
    assert out[2]["clean"] == "only"  # CRLF normalizes, repeats collapse
    assert out[2]["n_removed"] == 2
