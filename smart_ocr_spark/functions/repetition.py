"""Repetition filters for training-data curation (Gopher-style quality
rules: Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
Insights from Training Gopher", Table A1; also used by C4/ccnet-family
pipelines).  Heavily repetitive documents (boilerplate loops, scraper
echo, template spam) are a classic LLM-training pathology that
per-token quality scores miss.

Per-document metrics, all expressed as distributed column algebra +
one (doc, unit) shuffle — no N^2 anything, no Python in the path:

  * ``dup_line_frac``       — fraction of non-blank lines that are
                              repeats of an earlier identical line
  * ``dup_line_char_frac``  — character share of those repeated lines
  * ``dup_para_frac``       — same, at blank-line paragraph grain
  * ``top_2gram_char_frac`` — share of non-space characters covered by
                              the single most frequent word 2-gram
                              (ties broken toward the lexicographically
                              smallest gram, so the metric is
                              deterministic on any engine)

``repetitive`` applies the published Gopher thresholds (dup lines >
0.30, dup paragraphs > 0.30, top 2-gram > 0.20).

At 100 TB: the explode is map-side, the aggregation is keyed by
(doc_id, unit) then doc_id — partial aggregation absorbs the skew of
repetitive docs (their many identical units combine map-side), and the
output is one row per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Gopher Table A1 thresholds
DUP_LINE_MAX = 0.30
DUP_PARA_MAX = 0.30
TOP_2GRAM_MAX = 0.20


def _dup_stats(
    df: DataFrame, id_col: str, unit_col, what: str
) -> DataFrame:
    """(id, {what}_frac, {what}_char_frac) for one unit grain.

    A unit occurring k times contributes k-1 repeats; char share
    counts the characters of those repeated occurrences."""
    units = df.select(
        F.col(id_col), F.explode(unit_col).alias("u")
    ).where(F.length(F.trim("u")) > 0)
    per_unit = units.groupBy(id_col, "u").agg(
        F.count(F.lit(1)).alias("k"), F.length(F.first("u")).alias("len")
    )
    return per_unit.groupBy(id_col).agg(
        (
            F.sum(F.col("k") - 1) / F.sum("k")
        ).alias(f"{what}_frac"),
        (
            F.sum((F.col("k") - 1) * F.col("len"))
            / F.sum(F.col("k") * F.col("len"))
        ).alias(f"{what}_char_frac"),
    )


def with_repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition metrics + the Gopher ``repetitive`` verdict.

    Docs with no qualifying units (empty, all-blank) score 0.0 —
    "nothing repeated", mirroring the reference rules' treatment of
    degenerate documents."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    paras = F.split(text, "\n\n")

    line_stats = _dup_stats(df, id_col, lines, "dup_line")
    para_stats = _dup_stats(df, id_col, paras, "dup_para")

    # word 2-grams: w[i] + ' ' + w[i+1] over the ASCII-whitespace
    # tokenization shared with the rest of the text battery
    toks = F.filter(
        F.split(F.lower(text), "[ \\t\\n\\x0B\\f\\r]+"),
        lambda t: t != F.lit(""),
    )
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = df.select(
        F.col(id_col),
        F.explode(grams).alias("gram"),
        F.length(F.regexp_replace(text, "[ \\t\\n\\x0B\\f\\r]", ""))
        .alias("nonspace"),
    )
    per_gram = g.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("k"), F.first("nonspace").alias("nonspace")
    )
    # deterministic top gram: min over (-count, gram) prefers the
    # highest count and, on ties, the lexicographically smallest gram —
    # a pick both engines reproduce exactly
    top = per_gram.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("k")).alias("nk"),
                F.col("gram"),
                F.col("nonspace"),
            )
        ).alias("t")
    ).select(
        id_col,
        F.when(
            F.col("t.nonspace") > 0,
            F.round(
                (-F.col("t.nk"))
                * F.length(F.regexp_replace("t.gram", " ", ""))
                / F.col("t.nonspace"),
                4,
            ),
        ).otherwise(F.lit(0.0)).alias("top_2gram_char_frac"),
    )

    out = (
        df.select(id_col)
        .join(line_stats, id_col, "left")
        .join(para_stats, id_col, "left")
        .join(top, id_col, "left")
        .select(
            id_col,
            *[
                F.round(F.coalesce(c, F.lit(0.0)), 4).alias(c)
                for c in (
                    "dup_line_frac", "dup_line_char_frac",
                    "dup_para_frac", "dup_para_char_frac",
                )
            ],
            F.coalesce("top_2gram_char_frac", F.lit(0.0)).alias(
                "top_2gram_char_frac"
            ),
        )
    )
    return out.withColumn(
        "repetitive",
        (F.col("dup_line_frac") > DUP_LINE_MAX)
        | (F.col("dup_para_frac") > DUP_PARA_MAX)
        | (F.col("top_2gram_char_frac") > TOP_2GRAM_MAX),
    )
