"""Raster-recovery tier (VERDICT r3 #6): rasterize-plan metadata, the
honestly-stubbed OCR seam, the `raster` repair variant, and the
end-to-end escalation of scanned docs through the distributed pipeline.
Reference analog: benchmark/rasterize.py:17-80 (scan construction) +
the OCR-engine routing for the `scanned` category.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.kernel import raster
from smart_ocr_spark.sources.corpus import build_pdf


def _recoverable_pdf(page_texts):
    return build_pdf(
        [[] for _ in page_texts],
        image_pages=[True] * len(page_texts),
        image_streams=[raster.encode_scan_text(t) for t in page_texts],
    )


def test_rasterize_plan_geometry():
    """Reference rasterize.py:38-44: zoom = dpi/72, page rect preserved.
    A 612x792pt page at 200 dpi renders 1700x2200 px."""
    pdf = build_pdf([[], []], image_pages=[True, True])
    plan = raster.rasterize_plan(pdf, dpi=200)
    assert [p["page_num"] for p in plan] == [1, 2]
    assert all(p["width_px"] == 1700 and p["height_px"] == 2200 for p in plan)
    assert all(p["n_images"] == 1 for p in plan)


def test_rasterize_plan_garbage_payloads():
    assert raster.rasterize_plan(b"<html>not a pdf</html>") == []
    assert raster.rasterize_plan(b"%PDF-1.4 truncated") == []


def test_ocr_stub_is_honest():
    """fake=True decodes only the synthetic-scan payload; real pixels
    yield "" (missing backend), and fake=False refuses loudly."""
    assert raster.ocr_image_stream(
        raster.RASTER_TEXT_MAGIC + b"hello scan"
    ) == "hello scan"
    assert raster.ocr_image_stream(bytes(range(0, 256, 4))) == ""
    with pytest.raises(NotImplementedError):
        raster.ocr_image_stream(b"anything", fake=False)


def test_extract_payload_raster_roundtrip():
    texts = ["first page of the scan", "second page of the scan"]
    pdf = _recoverable_pdf(texts)
    assert raster.extract_payload_raster(pdf) == "\n\n---\n\n".join(texts)
    # raw-pixel scan: honest empty, not separator debris
    plain = build_pdf([[], []], image_pages=[True, True])
    assert raster.extract_payload_raster(plain) == ""
    assert raster.extract_payload_raster(b"<html>x</html>") == ""


def test_variant_dispatch():
    from smart_ocr_spark.kernel.extract import extract_payload_variant

    pdf = _recoverable_pdf(["page text here"])
    assert extract_payload_variant(pdf, "raster") == "page text here"
    assert extract_payload_variant(b"<html>x</html>", "raster") == ""


def test_router_scanned_shortcut():
    """Scanned docs route straight to the raster tier and are exhausted
    once it has been tried — text-chain variants are never candidates
    (an image-only doc has no text layer for them to find)."""
    from smart_ocr_spark.kernel import audit, repair

    assert repair.select_repair_variant(
        audit.EMPTY_OUTPUT, set(), scanned=True
    ) == "raster"
    assert repair.select_repair_variant(
        audit.EMPTY_OUTPUT, {"basic"}, scanned=True
    ) == "raster"
    assert repair.select_repair_variant(
        audit.EMPTY_OUTPUT, {"basic", "raster"}, scanned=True
    ) is None
    # default routing untouched (the replayed reference matrix relies
    # on this default)
    assert repair.select_repair_variant(
        audit.EMPTY_OUTPUT, set()
    ) == repair.DEFAULT_CHAIN[0]


def test_pipeline_recovers_scanned_docs(spark):
    """End-to-end: recoverable scans gain a raster attempt and land in
    success with first_passing selection + escalation lineage; raw
    scans keep the distinct failed_scanned status (with their raster
    attempt recorded as an honest empty)."""
    from smart_ocr_spark.plans.extract_pipeline import run_extraction

    texts = [
        ("alpha beta gamma delta " * 15).strip(),  # 60 words: over floor
        ("epsilon zeta eta theta " * 15).strip(),
    ]
    rows = [
        ("scan://recoverable", _recoverable_pdf(texts)),
        ("scan://raw", build_pdf([[], []], image_pages=[True, True])),
    ]
    df = spark.createDataFrame(rows, ["url", "html"]).select(
        "url",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("en").alias("lang"),
    )
    res = {r["url"]: r for r in run_extraction(spark, df).collect()}

    rec = res["scan://recoverable"]
    assert rec["status"] == "success"
    assert rec["selected_variant"] == "raster"
    assert rec["selection_rule"] == "first_passing"
    assert rec["final_text"] == "\n\n---\n\n".join(texts)
    assert "raster" in rec["engines_used"]

    raw = res["scan://raw"]
    assert raw["status"] == "failed_scanned"
    assert raw["final_text"] == ""
    # the raster tier was attempted and recorded, honestly empty
    assert "raster" in raw["engines_used"]
    assert all(
        (a["text"] == "") for a in raw["attempts"] if a["variant"] == "raster"
    )
