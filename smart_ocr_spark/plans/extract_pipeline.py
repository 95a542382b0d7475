"""The full extraction pipeline: the reference's 5-phase lifecycle
(``src/socr/pipeline/orchestrator.py:74-142``) as a bounded DataFrame
transform.

Phases (reference mapping):
  0. size-bucketed repartition            (O4; chunker analog)
  1. single-parse extraction + assessment (Phase 1 Analyze; P1-P18)
  2. primary attempt + difficulty routing (Phase 2 Backbone; O1/O2)
  2b. enhancement attempt for complex born-digital docs (orchestrator
      needs_ocr_enhancement path)
  3. audit columns                        (Phase 3 Score; Q1-Q12)
  4. bounded repair loop, <= max_retries  (Phase 4; O5; config.py:107)
  4b/5. consensus selection + assembly    (Phase 4b/5; state.py:111-148)

The driver-side loop mirrors the reference's control flow
(SURVEY.md §3.3); each round materializes via persist so the expensive
parse stage never recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from smart_ocr_spark.operators import extract as ops

RESULT_COLUMNS = [
    "url",
    "warc_ts",
    "lang",
    "final_text",
    "status",
    "selected_variant",
    "selected_idx",
    "selection_rule",
    "agreement",
    "discrepancies",
    "attempts",
    "is_born_digital",
    "bd_confidence",
    "needs_ocr_enhancement",
    "difficulty",
    "engines_used",
    "cost_microusd",
    "is_pdf",
    "parse_ok",
    "parse_error",
    "payload_size",
    "n_pages",
    "n_tables",
    "n_headings",
    "n_images",
    "link_density",
    "total_chars",
]

MAX_RETRIES_DEFAULT = 2  # reference core/config.py:107


# Above this many failed rows the pruned payload frame stops being
# broadcast (payloads are ~MB-scale; 10k x 1MB already nears Spark's
# 8GB broadcast ceiling) and the second join falls back to a shuffle of
# the two O(failures) frames — still never the corpus.
BROADCAST_REPAIR_MAX_ROWS = 10_000


def join_payloads_for_repair(
    documents: DataFrame, failed: DataFrame, n_failed: int | None = None
) -> DataFrame:
    """Attach payload bytes to the failed set without ever shuffling the
    corpus: a broadcast LEFT SEMI prunes ``documents`` to the failed
    urls map-side, then the pruned payload frame joins ``failed`` —
    broadcast when the failed set is small, shuffle of the two pruned
    O(failures) frames otherwise (an unconditional broadcast would abort
    the job past the 8GB broadcast ceiling on payload-heavy failure
    storms; the old ``failed.join(documents, "url", "left")`` was worse
    still: a corpus-sized shuffle of payload bytes per round).  The
    key-set broadcast in the semi prune holds to tens of millions of
    urls (bytes-scale ~100B/url); past that the run is no longer a
    selective repair but a rerun of the corpus, which is the caller's
    call to make.  Pinned by a plan assertion in tests/test_plans.py."""
    payloads = documents.select("url", "html").join(
        F.broadcast(failed.select("url")), "url", "left_semi"
    )
    if n_failed is not None and n_failed > BROADCAST_REPAIR_MAX_ROWS:
        return failed.join(payloads, "url", "inner")
    return failed.join(F.broadcast(payloads), "url", "inner")


def run_extraction(
    spark: SparkSession,
    documents: DataFrame,
    max_retries: int = MAX_RETRIES_DEFAULT,
    repartition: bool = True,
    chain: list[str] | None = None,
    with_figures: bool = False,
    embed_figures: bool = False,
) -> DataFrame:
    """documents(url, warc_ts, html, lang[, text]) -> results frame.

    Returns one row per url with ``final_text`` (the byte-identical
    contract column), attempts lineage, and routing metadata.

    ``chain`` overrides the repair router's fallback chain — typically a
    per-category recommendation from calibration profiles
    (``plans.benchmark.recommended_chains``, the reference's
    calibrate-driven config rewrite, calibrate.py:295-320).

    ``with_figures`` emits a ``figures`` ARRAY<STRUCT> column from the
    same parse pass — figure metadata without a second payload scan.

    ``embed_figures`` (implies ``with_figures``) additionally appends
    the markdown figure blocks to ``final_text`` — the reference's
    ``config.save_figures`` path (orchestrator.py:1272-1276) with
    deterministic caption stubs; pure JVM column algebra after
    selection, so the extraction plan is unchanged.
    """
    with_figures = with_figures or embed_figures
    src = documents.select("url", "warc_ts", "html", "lang")
    if repartition:
        src = ops.size_bucketed(src)

    # Phases 1-2b fused into one Arrow pass (parse + assess + audited
    # primary attempt + conditional enhancement); difficulty stays a
    # JVM-side column expression.  The payload is NOT carried forward —
    # the persisted working set is metadata + attempt texts only, so the
    # cache stays small no matter the corpus size.
    df = ops.fused_first_pass(src, with_figures=with_figures)
    df = df.withColumn("difficulty", ops.difficulty_col())
    # repair_exhausted marks rows whose variant chain is spent: the
    # router returned no untried variant, so further rounds would
    # join+Arrow-scan them for a guaranteed no-op.
    df = df.withColumn("repair_exhausted", F.lit(False))

    # The parse stage is the expensive one; materialize before looping.
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    retriable = ops.needs_repair_col() & ~F.col("repair_exhausted")
    for _ in range(max_retries):
        # Selective repair (O5): only rows still failing AND with an
        # untried variant go through the Python kernel; the passing
        # majority is a cache-backed filter.
        failed = df.filter(retriable)
        # full count, not an emptiness probe: df is cached (metadata-only
        # rows) and the count doubles as the broadcast-vs-shuffle switch
        n_failed = failed.count()
        if n_failed == 0:
            break
        failed_with_payload = join_payloads_for_repair(
            documents, failed, n_failed=n_failed
        )
        # Persist ONLY the repaired subset — O(failures) rows — and keep
        # the parent cache live.  The previous shape re-persisted and
        # re-counted the ENTIRE frame each round (union → persist →
        # count → unpersist parent), i.e. two extra corpus-sized cache
        # materializations per repair round; at corpus scale that is a
        # full rewrite of the working set to recompute 1-5% of rows.
        # The union below is lazy: its passing side is the already-
        # cached parent filter, so no row is ever cached twice, and the
        # next round's ``failed.count()`` (or the caller's first
        # action) materializes the small repaired cache on demand.
        repaired = ops.fused_repair_round(failed_with_payload, chain=chain)
        repaired = repaired.persist(StorageLevel.MEMORY_AND_DISK)
        df = df.filter(~retriable).unionByName(repaired)

    df = ops.with_selection(df)
    if embed_figures:
        # reference order: figure blocks append AFTER assembly +
        # normalization (orchestrator.py:1244-1276)
        df = ops.with_figure_embed(df)
    out_cols = RESULT_COLUMNS + (["figures"] if with_figures else [])
    return df.select(*out_cols)


def results_for_write(df: DataFrame) -> DataFrame:
    """Projection written to the results table (drops lineage payloads)."""
    from pyspark.sql import functions as F

    return df.select(
        "url",
        "warc_ts",
        "lang",
        "final_text",
        "status",
        "selected_variant",
        F.size("attempts").alias("n_attempts"),
        "difficulty",
        "is_pdf",
        "payload_size",
    )
