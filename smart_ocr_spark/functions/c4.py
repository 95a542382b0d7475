"""C4-style line and page cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning…", §2.2 — the published cleaning recipe
behind the C4 corpus, re-derived from the paper's rules).

Line rules (a line survives iff ALL hold):

* ends in a terminal punctuation mark (``.``, ``!``, ``?``, ``"``);
* has at least ``min_words`` whitespace words (paper: 3);
* does not contain the word "javascript" (case-insensitive) — the
  paper's "Enable Javascript" banner rule.

Page rules (flags emitted; ``page_keep`` is their conjunction):

* at least ``min_sentences`` sentences after line cleaning (paper: 5),
  counted by terminal-punctuation splits;
* no "lorem ipsum" placeholder text (case-insensitive);
* no curly brace (the paper's drop-code heuristic).

The paper's remaining rules live elsewhere in this package: the
three-sentence-span corpus dedup is :func:`dedup.paragraph_dedup` at a
different grain, the bad-words page filter is a wordlist join the
caller supplies (no canonical public list ships here), and langid is
``text_analysis.lang_id``.

Scale shape: MAP-ONLY.  Every rule is per-row array/string algebra
(split → higher-order filter → rejoin) inside whole-stage codegen —
zero shuffles, zero Python, no state; the operator composes into any
scan for free and is trivially oracle-mirrorable (each rule is one SQL
expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TERMINAL_MARKS = (".", "!", "?", '"')


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """Apply the C4 line filters and page flags to ``text_col``.

    Output: (id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
    page_keep, cleaned_text).  ``cleaned_text`` is the surviving lines
    rejoined; callers gate on ``page_keep`` (kept separate so funnels
    can count page-rule losses independently of line-rule losses).
    """
    if min_words < 0 or min_sentences < 0:
        raise ValueError("min_words/min_sentences must be non-negative")
    # NULL text behaves as "" (zero kept lines, page_keep false) —
    # split(NULL) would otherwise propagate NULL through every output
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, "\n")

    def line_ok(x):
        t = F.trim(x)
        words = F.filter(
            F.split(t, "[ \t]+"), lambda w: w != F.lit("")
        )
        return (
            F.substring(t, -1, 1).isin(*TERMINAL_MARKS)
            & (F.size(words) >= F.lit(min_words))
            & ~F.lower(t).contains("javascript")
        )

    kept = F.filter(lines, line_ok)
    cleaned = F.array_join(kept, "\n")
    n_sentences = (F.size(F.split(cleaned, "[.!?]")) - 1).cast("bigint")
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (n_sentences >= F.lit(min_sentences)) & ~has_lorem & ~has_brace
        ).alias("page_keep"),
        cleaned.alias("cleaned_text"),
    )
