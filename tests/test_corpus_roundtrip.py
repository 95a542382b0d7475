"""The byte-identical contract: for every corpus fixture the extraction
kernel must reproduce the generator's independently-constructed golden text
exactly.  This is the local analog of the reference's golden end-to-end
outputs under examples/ (SURVEY.md §5.1.3)."""

import pytest

from smart_ocr_spark.kernel.html_extract import extract_html
from smart_ocr_spark.kernel.normalize import normalize_generic, strip_phantom_images
from smart_ocr_spark.kernel.pdf_extract import extract_pdf, sniff_pdf
from smart_ocr_spark.sources.corpus import make_rows

N_DOCS = 300


def pipeline_extract(payload: bytes) -> str:
    """The per-row extraction the Spark pipeline performs: the primary
    pass, plus the raster-recovery tier the repair loop routes
    image-only scans through (kernel/raster.py, round 4)."""
    if sniff_pdf(payload):
        text, sig = extract_pdf(payload, "layout")
        if not text.strip() and sig.get("n_images", 0) > 0:
            from smart_ocr_spark.kernel.raster import extract_payload_raster

            text = extract_payload_raster(payload)
    else:
        text, _ = extract_html(payload.decode("utf-8", "replace"), "layout")
    return strip_phantom_images(normalize_generic(text))


@pytest.fixture(scope="module")
def rows():
    return make_rows(N_DOCS, seed=42)


def test_corpus_determinism():
    a = make_rows(20, seed=42)
    b = make_rows(20, seed=42)
    for ra, rb in zip(a, b):
        assert ra == rb
    c = make_rows(20, seed=7)
    assert any(ra["html"] != rc["html"] for ra, rc in zip(a, c))


def test_all_classes_present(rows):
    classes = {r["url"].split("/")[3] for r in rows}
    assert "prose" in classes
    assert "boiler" in classes
    assert "table" in classes
    assert any(c.startswith("pdf_") for c in classes)


def test_oversized_blob_tail(rows):
    assert any(len(r["html"]) >= 1 << 20 for r in rows)


def test_byte_identical_extraction(rows):
    failures = []
    for r in rows:
        got = pipeline_extract(r["html"])
        if got != r["text"]:
            failures.append((r["url"], r["text"][:120], got[:120]))
    assert not failures, f"{len(failures)} mismatches; first: {failures[0]}"


def test_extraction_independent_of_order(rows):
    """Pure per-row function: permuting input order changes nothing."""
    sample = rows[:50]
    fwd = [pipeline_extract(r["html"]) for r in sample]
    rev = [pipeline_extract(r["html"]) for r in reversed(sample)]
    assert fwd == rev[::-1]
