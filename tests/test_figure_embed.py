"""Figure blocks embedded into final_text (VERDICT r3 #1): the
reference's ``_describe_and_embed_figures`` append step
(orchestrator.py:1272-1276, 1367-1371, 1425-1453) with SURVEY §2.12's
deterministic caption stub in place of the cloud vision description.

Two implementations must agree byte-for-byte:
  * the per-document kernel spec (kernel/figures.embed_figure_blocks)
  * the distributed JVM mirror (operators/extract.with_figure_embed)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.kernel import figures as FG


def _fig(n, p, kind, x0, y0, x1, y1):
    return {
        "figure_num": n, "page_num": p, "figure_type": kind,
        "x0": x0, "y0": y0, "x1": x1, "y1": y1,
    }


def test_block_format_matches_reference_shape():
    """orchestrator.py:1444-1450: ``**Figure N** (page P): caption`` then
    a blank line then ``![Figure N](figures/figure_N_pageP.png)``."""
    block = FG.figure_block(_fig(2, 3, "drawing", 100.0, 200.0, 330.0, 414.0))
    assert block == (
        "**Figure 2** (page 3): [stub] drawing region, 230x214 pt"
        "\n\n![Figure 2](figures/figure_2_page3.png)"
    )


def test_embed_append_rule():
    """orchestrator.py:1367-1371: ``text.rstrip() + "\\n\\n" + blocks``;
    no text or no figures -> unchanged."""
    figs = [_fig(1, 1, "image", 0.0, 0.0, 100.0, 100.0)]
    out = FG.embed_figure_blocks("Body text.\n\n", figs)
    assert out.startswith("Body text.\n\n**Figure 1** (page 1): ")
    assert out.count("![Figure 1]") == 1
    # whitespace-only text: has_text is False (orchestrator.py:1272)
    assert FG.embed_figure_blocks("  \n", figs) == "  \n"
    assert FG.embed_figure_blocks("Body", []) == "Body"


def test_jvm_mirror_matches_kernel(spark):
    """The pure-JVM with_figure_embed must equal the kernel spec
    byte-for-byte on assorted metadata (multiple figures, fractional
    extents, trailing whitespace, empty figures, empty text)."""
    from smart_ocr_spark.operators.extract import FIGURE_SCHEMA, with_figure_embed

    cases = [
        ("Doc one body.", [_fig(1, 1, "drawing", 10.0, 20.0, 250.5, 190.25)]),
        (
            "Doc two.\n\nSecond para.\t \n",
            [
                _fig(1, 1, "image", 0.0, 0.0, 612.0, 792.0),
                _fig(2, 3, "drawing", 72.0, 90.0, 400.0, 300.0),
            ],
        ),
        ("", [_fig(1, 1, "drawing", 0.0, 0.0, 100.0, 100.0)]),
        (" \n\t", [_fig(1, 1, "drawing", 0.0, 0.0, 100.0, 100.0)]),
        # NBSP is NOT ASCII whitespace: both engines must treat this as
        # has-text (the gate is pinned to the ASCII class)
        ("\u00a0", [_fig(1, 1, "drawing", 0.0, 0.0, 100.0, 100.0)]),
        ("No figures here.", []),
    ]
    rows = [
        (i, text, [tuple(f[k] for k in (
            "figure_num", "page_num", "figure_type", "x0", "y0", "x1", "y1"
        )) for f in figs])
        for i, (text, figs) in enumerate(cases)
    ]
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("i", IntegerType()),
        StructField("final_text", StringType()),
        StructField("figures", ArrayType(FIGURE_SCHEMA)),
    ])
    df = spark.createDataFrame(rows, schema)
    got = {r["i"]: r["final_text"] for r in with_figure_embed(df).collect()}
    for i, (text, figs) in enumerate(cases):
        assert got[i] == FG.embed_figure_blocks(text, figs), f"case {i}"


def test_pipeline_embeds_figures_end_to_end(spark):
    """run_extraction(embed_figures=True) on figure-bearing PDFs: the
    blocks land in final_text AFTER the extracted body, and non-figure
    docs are untouched."""
    import pandas as pd

    from smart_ocr_spark.plans.extract_pipeline import run_extraction
    from smart_ocr_spark.sources.corpus import build_pdf

    with_rect = build_pdf(
        [[(72.0, 720.0, "A chart follows.")]],
        raw_page_prefix=["150 300 200 220 re S"],
    )
    plain = build_pdf([[(72.0, 720.0, "Plain page.")]])
    df = spark.createDataFrame(
        [("pdf://fig", with_rect), ("pdf://plain", plain)], ["url", "html"]
    ).select(
        "url",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("en").alias("lang"),
    )
    res = {
        r["url"]: r
        for r in run_extraction(spark, df, embed_figures=True).collect()
    }
    fig_text = res["pdf://fig"]["final_text"]
    assert fig_text.startswith("A chart follows.")
    assert (
        "**Figure 1** (page 1): [stub] drawing region, 200x220 pt" in fig_text
    )
    assert "![Figure 1](figures/figure_1_page1.png)" in fig_text
    assert len(res["pdf://fig"]["figures"]) == 1
    assert res["pdf://plain"]["final_text"] == "Plain page."
    assert res["pdf://plain"]["figures"] == []


def test_orchestrate_assemble_embeds_when_save_figures(spark):
    """The per-document control-flow kernel mirrors the same append rule
    behind config.save_figures (orchestrator.py:1272-1276)."""
    from types import SimpleNamespace

    from smart_ocr_spark.kernel import orchestrate as orch

    doc = orch.new_document("/tmp/x.pdf", 1)
    doc["pages"][1]["best_output"] = {
        "page_num": 1, "text": "Page body.", "status": "success",
        "engine": "native", "audit_passed": True, "confidence": 1.0,
    }
    doc["pages"][1]["native_text"] = "Page body."
    doc["figures"] = [_fig(1, 1, "drawing", 100.0, 200.0, 300.0, 420.0)]

    def make_page(**kw):
        return dict(kw)

    def make_result(**kw):
        return kw

    cfg = SimpleNamespace(primary_engine="native", save_figures=True)
    result = orch.phase_assemble(doc, cfg, make_page, make_result)
    text = result["pages"][0]["text"]
    assert "**Figure 1** (page 1): [stub] drawing region, 200x220 pt" in text

    cfg_off = SimpleNamespace(primary_engine="native", save_figures=False)
    doc2 = orch.new_document("/tmp/x.pdf", 1)
    doc2["pages"][1]["best_output"] = dict(doc["pages"][1]["best_output"])
    doc2["pages"][1]["native_text"] = "Page body."
    doc2["figures"] = list(doc["figures"])
    result2 = orch.phase_assemble(doc2, cfg_off, make_page, make_result)
    assert "**Figure" not in result2["pages"][0]["text"]
