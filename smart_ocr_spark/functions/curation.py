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
    cond = (F.col("quality_score") >= min_quality) & (
        F.col("token_count") >= min_tokens
    )
    if langs is not None:
        cond = cond & F.col("lang").isin(list(langs))
    kept = scored.where(cond).select(
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
