"""Line-level corpus curation: boilerplate-line removal and C4-style
line filtering.

Web text carries per-LINE noise that document-level filters can't fix:
cookie banners, nav menus, copyright footers repeated across thousands
of pages (CCNet / RefinedWeb drop lines duplicated across documents),
and junk lines C4 removes (no terminal punctuation, too few words).
Both operators here split documents into lines, act per line, and
reassemble the surviving lines in order.

Scale shape:
- ``remove_boilerplate_lines``: the line table shuffles on the line
  key (distinct + count are partial-aggregated map-side, so a line
  repeated on every page costs one row per task, not per document),
  one anti-join back, one reassembly shuffle on the doc key.  No
  driver-side state; the boilerplate set stays distributed.
- ``c4_line_filter``: pure map-only Column math (per-line predicates
  inside a higher-order filter — no explode, no shuffle at all).

Reference scope note: the reference engine has no text stage; these
extend the training-data pipeline surface (build brief: curation ops
are first-class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, position, line).  Lines split on ``\\r?\\n``
    (CRLF-tolerant — crawled web text mixes line conventions; an exact
    ``\\n`` split left every CRLF line with a trailing ``\\r`` that
    defeated exact-match boilerplate detection, r8 ADVICE).  Reassembly
    joins with ``\\n``, so CRLF documents normalize to LF — the standard
    line-curation contract.  Deterministic on any engine."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("pos", "line"))


def remove_boilerplate_lines(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             min_docs: int = 50) -> DataFrame:
    """Drop every line that appears (exactly) in >= ``min_docs``
    DISTINCT documents — the cross-document boilerplate signal
    (cookie banners, footers, nav).  Returns one row per document that
    keeps at least one line: ``clean`` (surviving lines re-joined in
    order), ``n_kept``, ``n_dropped``.

    Two keyed aggregations and one join, all partial-combinable; the
    hot keys ARE the boilerplate lines, and they collapse map-side in
    the distinct/count stages, so a banner on a billion pages arrives
    at the reducer once per task.
    """
    lines = explode_lines(docs, id_col, text_col)
    boiler = (lines.select("line", id_col).distinct()
              .groupBy("line").count()
              .where(F.col("count") >= min_docs)
              .select("line"))
    kept = lines.join(boiler, "line", "left_anti")
    n_lines = (lines.groupBy(id_col)
               .agg(F.count("*").alias("__n_total")))
    return (kept.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct("pos", "line"))),
                         lambda s: s["line"]),
                     "\n").alias("clean"),
                 F.count("*").alias("n_kept"))
            .join(n_lines, id_col)
            .select(id_col, "clean", "n_kept",
                    (F.col("__n_total") - F.col("n_kept")).alias("n_dropped")))


#: C4's line rule: keep lines that end in terminal punctuation and have
#: at least this many whitespace words (Raffel et al. 2020 §2.2 use 5
#: words and a terminal-punctuation requirement).
C4_MIN_WORDS = 5
C4_TERMINALS = (".", "!", "?", '"')


def c4_line_filter(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = C4_MIN_WORDS,
                   min_lines: int = 3) -> DataFrame:
    """C4-style cleaning: keep only lines that end in terminal
    punctuation and have >= ``min_words`` whitespace words; drop the
    whole document when fewer than ``min_lines`` lines survive or when
    it contains a curly brace or 'lorem ipsum' (code/placeholder
    signals).  Lines split on ``\\r?\\n`` so a CRLF document's lines
    don't carry a trailing ``\\r`` into the terminal-punctuation check
    (an exact ``\\n`` split silently failed every CRLF doc's
    ``min_lines`` gate, r8 ADVICE); survivors re-join with ``\\n``.
    Map-only: the per-line predicate runs inside a higher-order
    ``filter`` over the split array — no explode, no shuffle, one
    corpus scan.
    """
    text = F.col(text_col)

    def line_ok(ln):
        t = F.trim(ln)
        ends = F.lit(False)
        for term in C4_TERMINALS:
            ends = ends | t.endswith(term)
        # whitespace-word count, arithmetic (dialect-portable): spaces
        # remaining after collapse, +1
        norm = F.regexp_replace(t, "[ \t\r]+", " ")
        words = F.when(F.length(norm) == 0, F.lit(0)).otherwise(
            F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1)
        return ends & (words >= min_words)

    kept = F.filter(F.split(text, r"\r?\n"), line_ok)
    doc_ok = ((F.size(kept) >= min_lines)
              & ~F.lower(text).contains("lorem ipsum")
              & ~text.contains("{") & ~text.contains("}"))
    return (docs.where(text.isNotNull() & doc_ok)
            .select(F.col(id_col),
                    F.array_join(kept, "\n").alias("clean"),
                    F.size(kept).cast("long").alias("n_kept")))


def dedup_paragraphs(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Intra-document repeated-paragraph removal (keep FIRST
    occurrence) — the within-doc cousin of cross-document boilerplate
    removal: crawled pages repeat nav blocks, disclaimers, and pasted
    content inside one document, and training on the repeats wastes
    tokens and skews n-gram statistics.

    Paragraphs split on ``\\r?\\n``; survivors re-join with ``\\n`` in
    first-occurrence order.  MAP-ONLY: Spark's ``array_distinct``
    preserves first-occurrence order, so the whole pass is one scan
    with zero shuffles — at 100 TB this is a free rider on any other
    corpus pass.  Returns (id, clean, n_paragraphs, n_removed)."""
    paras = F.split(F.col(text_col), r"\r?\n")
    kept = F.array_distinct(paras)
    return docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean"),
        F.size(paras).cast("long").alias("n_paragraphs"),
        (F.size(paras) - F.size(kept)).cast("long").alias("n_removed"))
