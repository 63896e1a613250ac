"""Line-level dedup / boilerplate removal — the CCNet-style cleaning pass.

Public LM-data pipelines (CCNet, RefinedWeb, Dolma) dedup at LINE
granularity before document-level passes: navigation bars, cookie banners,
and license footers repeat across millions of pages and survive
document-level dedup because the surrounding content differs. The
reference only roadmaps dedup (README.md:290-299, SURVEY.md §2.11 X4);
this module extends the engine's dedup family (operators/dedup.py) one
level down.

Two operators, two very different plan shapes:

* ``dedup_lines_in_doc_expr`` — WITHIN-document keep-first dedup as one
  pure Catalyst expression: zero shuffle, zero Python, runs inside the
  scan's projection. O(L^2) array_position probes per document, which is
  the right trade below a few thousand lines/doc (documents at 100 TB are
  wide, not deep); beyond that, explode + window is the fallback.

* ``drop_frequent_lines`` — CORPUS-level boilerplate removal: two-pass
  (count line frequencies, then anti-join the frequent set back and
  rebuild each document). The frequent set is small BY CONSTRUCTION
  (≤ corpus_lines / min_count entries), so the anti-join broadcasts and
  the only real shuffles are the map-side-combinable frequency count and
  the per-document rebuild aggregation, both keyed uniformly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dedup_lines_in_doc_expr(text_col: Column | str, sep: str = "\n") -> Column:
    """Rewrite a document keeping only the FIRST occurrence of each line.

    Pure expression: ``split`` -> ``filter((x, i) -> array_position(lines,
    x) == i + 1)`` -> ``array_join``. ``array_position`` returns the first
    index of the element, so a line survives iff it IS the first
    occurrence — keep-first semantics with no shuffle and no state.
    """
    lines = F.split(_c(text_col), F.lit(sep), -1)
    kept = F.filter(lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1))
    return F.array_join(kept, sep)


def line_frequencies(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text", sep: str = "\n"
) -> DataFrame:
    """(line, n_docs, n_occurrences) across the corpus. Grouped on the line
    STRING itself (not a hash): the count aggregation map-side combines, so
    the shuffle carries one record per distinct line per task — boilerplate
    lines (the targets) combine heavily — and downstream consumers need the
    text anyway to report/strip it."""
    lines = docs.select(
        F.col(doc_col).alias("_doc"),
        F.explode(F.split(_c(text_col), F.lit(sep), -1)).alias("line"),
    ).filter(F.trim("line") != "")
    return lines.groupBy("line").agg(
        F.countDistinct("_doc").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


def drop_frequent_lines(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_doc_count: int = 10,
    sep: str = "\n",
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove every line that appears in ``>= min_doc_count`` distinct
    documents and rebuild each document's text in original line order.

    Plan: explode to (doc, pos, line); count distinct-doc frequencies (one
    combined shuffle); the frequent set — bounded above by
    total_lines / min_doc_count — broadcasts into a left-anti join, so the
    exploded side never shuffles for the filter; the rebuild is one
    aggregation keyed on the document id with ``array_sort`` on (pos, line)
    structs restoring order executor-side. Documents that lose every line
    come back with an empty string (count them, don't lose them — the
    drop-or-keep policy belongs to the caller).
    """
    lines = docs.select(
        F.col(doc_col),
        F.posexplode(F.split(_c(text_col), F.lit(sep), -1)).alias("pos", "line"),
    )
    freq = (
        lines.filter(F.trim("line") != "")
        .groupBy("line")
        .agg(F.countDistinct(doc_col).alias("_nd"))
        .filter(F.col("_nd") >= min_doc_count)
        .select("line")
    )
    kept = lines.join(F.broadcast(freq), "line", "left_anti")
    rebuilt = kept.groupBy(doc_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    # left join back so fully-boilerplate documents are reported, not dropped
    base = docs.select(doc_col, F.size(F.split(_c(text_col), F.lit(sep), -1)).alias("n_lines"))
    return base.join(rebuilt, doc_col, "left").select(
        doc_col,
        F.coalesce(out_col, F.lit("")).alias(out_col),
        F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        (F.col("n_lines") - F.coalesce("n_lines_kept", F.lit(0))).cast("long").alias(
            "n_lines_dropped"
        ),
    )


# -- C4 cleaning (Raffel et al. 2020, the public C4 heuristics) -------------

C4_BADWORDS = ("porn", "xxx", "viagra", "sex cam")
"""Representative subset of the public C4 blocklist ("List of Dirty,
Naughty, Obscene..."); production callers inject the full list. Matching is
whole-word over the lowercased page, per the C4 implementation."""


def c4_keep_line_expr(line: Column | str) -> Column:
    """C4's line-retention rule as one boolean expression over a TRIMMED
    line: ends in a terminal punctuation mark (period / ! / ? / closing
    quote), carries >= 3 words, and does not mention javascript. Zero
    Python, zero shuffle — runs inside the scan projection."""
    l = _c(line)
    words = F.filter(F.split(l, F.lit(" "), -1), lambda w: w != "")
    return (
        l.rlike('[.!?"”]$')
        & (F.size(words) >= 3)
        & ~F.lower(l).contains("javascript")
    )


def c4_clean(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    badwords: tuple[str, ...] = C4_BADWORDS,
) -> DataFrame:
    """The C4 cleaning pass: per-line retention (c4_keep_line_expr over
    whitespace-trimmed lines), then the page-level discards — fewer than 5
    sentences after cleaning, any curly brace, "lorem ipsum", or a
    blocklist word. Emits (doc_id, clean_text, n_sentences, keep_page);
    the drop-or-keep action belongs to the caller (the funnel wants the
    counts). Entirely expression-level: at 100 TB this is a free rider on
    the scan, no shuffle, no UDF.

    Reference scope note: the reference pipeline roadmaps data curation
    only (README.md:290-299); this implements the public C4 heuristics as
    part of the engine's curation family.
    """
    import re as _re

    text = _c(text_col)
    trimmed = F.transform(F.split(text, F.lit("\n"), -1), lambda l: F.trim(l))
    kept = F.filter(trimmed, c4_keep_line_expr)
    clean = F.array_join(kept, "\n")
    # the real C4 blocklist carries regex metacharacters ("a$$", "s&m"):
    # escape every word so each matches literally, never as syntax
    bad_re = r"\b(" + "|".join(_re.escape(w) for w in badwords) + r")\b"
    # chained selects so the cleaning lambda and the sentence count are
    # each computed ONCE (CollapseProject keeps multi-referenced aliases
    # separate; a single select would inline the array pipeline three
    # times into clean_text / n_sentences / keep_page)
    staged = docs.select(
        F.col(doc_col),
        clean.alias("clean_text"),
        (
            ~text.contains("{")
            & ~F.lower(text).contains("lorem ipsum")
            & ~F.lower(text).rlike(bad_re)
        ).alias("_page_ok"),
    ).select(
        doc_col,
        "clean_text",
        F.regexp_count(F.col("clean_text"), F.lit(r"[.!?]")).cast("long").alias("n_sentences"),
        "_page_ok",
    )
    return staged.select(
        doc_col,
        "clean_text",
        "n_sentences",
        ((F.col("n_sentences") >= 5) & F.col("_page_ok")).alias("keep_page"),
    )
