"""Corpus curation: the end-to-end "cleaning" keep-list a training-data
pipeline runs after extraction — quality floor + token floor + language
allowlist, composed from the quality/token column algebra.

All pure JVM column expressions (one scan, no shuffle beyond the final
projection); at 100 TB this is a map-only filter whose selectivity is
reported, never silent.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

from smart_ocr_spark.functions.text_analysis import (
    with_quality_score,
    with_token_stats,
)

_log = logging.getLogger(__name__)

DEFAULT_MIN_QUALITY = 0.45
DEFAULT_MIN_TOKENS = 20


def _quality_cond(min_quality, min_tokens, langs):
    """The shared quality-floor predicate (over a frame already carrying
    quality_score/token_count/lang): quality_keep_list and the funnel's
    quality_ok stage MUST agree, so there is exactly one definition."""
    cond = (F.col("quality_score") >= min_quality) & (
        F.col("token_count") >= min_tokens
    )
    if langs is not None:
        cond = cond & F.col("lang").isin(list(langs))
    return cond


def quality_keep_list(
    df: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    langs: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    log_drops: bool = False,
) -> DataFrame:
    """Rows surviving the curation filter, with the metrics that kept
    them (id, lang, token_count, quality_score).

    ``langs`` restricts to an allowlist (None keeps every language).
    ``log_drops=True`` runs one extra count and logs the drop rate —
    the no-silent-caps rule for a corpus-level filter; off by default so
    the lazy plan composes without a forced action.
    """
    scored = with_quality_score(with_token_stats(df, text_col), text_col)
    kept = scored.where(_quality_cond(min_quality, min_tokens, langs)).select(
        id_col, "lang", "token_count", "quality_score"
    )
    if log_drops:
        n_in = df.count()
        n_out = kept.count()
        _log.warning(
            "quality_keep_list: kept %d / %d rows (%.1f%% dropped; "
            "min_quality=%s min_tokens=%s langs=%s)",
            n_out, n_in, 100.0 * (n_in - n_out) / max(n_in, 1),
            min_quality, min_tokens, langs,
        )
    return kept


def curation_funnel(
    df: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    langs: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full curation funnel as per-doc stage booleans: quality floor
    → Gopher repetition filter → exact-content dedup (first-id-wins on
    md5(text)) → final keep (the AND of all stages).

    This is the end product a training-data pipeline actually ships —
    not one filter but the composed keep decision, with every stage's
    verdict kept so the drop REASONS are queryable (the funnel report is
    a groupBy away, never silent).  Stages run as: one map-only scoring
    scan + the repetition unit-shuffles + a two-stage min aggregation
    on md5(text) joined back (the skew-safe keeper shape from
    functions/dedup — a corpus-wide duplicated doc partial-aggs
    map-side and the flagging join stays AQE-skew-splittable; a window
    here would pin every copy onto one task) — no payload ever
    shuffles (text participates only via hashes and per-unit rows)."""
    from smart_ocr_spark.functions.repetition import with_repetition_metrics

    scored = with_quality_score(with_token_stats(df, text_col), text_col)
    quality_ok = _quality_cond(min_quality, min_tokens, langs)
    base = scored.select(
        id_col, "lang", "token_count", "quality_score",
        quality_ok.alias("quality_ok"),
        # NULL-safe content key: a plain md5 would be NULL for NULL
        # text and the keeper join below would silently drop the doc —
        # every doc must get a verdict row
        F.coalesce(
            F.md5(F.col(text_col)), F.lit("__null_text__")
        ).alias("__md5"),
    )
    rep = with_repetition_metrics(df, id_col=id_col, text_col=text_col).select(
        id_col, (~F.col("repetitive")).alias("repetition_ok")
    )
    mins = base.groupBy("__md5").agg(F.min(id_col).alias("__first_id"))
    return (
        base.join(rep, id_col)
        .join(mins, "__md5")
        .withColumn(
            "content_canonical", F.col(id_col) == F.col("__first_id")
        )
        .withColumn(
            "keep",
            F.col("quality_ok") & F.col("repetition_ok")
            & F.col("content_canonical"),
        )
        .drop("__md5", "__first_id")
    )


def funnel_report(funnel: DataFrame) -> DataFrame:
    """Stage-survival counts over a :func:`curation_funnel` frame —
    the no-silent-caps rollup for the composed filter."""
    return funnel.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("quality_ok").cast("long")).alias("n_quality_ok"),
        F.sum(F.col("repetition_ok").cast("long")).alias("n_repetition_ok"),
        F.sum(F.col("content_canonical").cast("long")).alias(
            "n_content_canonical"
        ),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
    )
