"""Pure-Python PDF parser tests against the deterministic PDF writer."""

import pytest

from smart_ocr_spark.kernel.pdf_extract import (
    PdfDocument,
    PdfError,
    extract_pdf,
    sniff_pdf,
)
from smart_ocr_spark.sources.corpus import build_pdf


def test_sniff():
    assert sniff_pdf(b"%PDF-1.4\nxxx") is True
    assert sniff_pdf(b"<html>") is False


def test_single_page_single_line():
    pdf = build_pdf([[(72.0, 720.0, "hello world")]])
    text, signals = extract_pdf(pdf)
    assert text == "hello world"
    assert signals["n_pages"] == 1
    assert signals["column_count"] == 1


def test_lines_top_to_bottom():
    lines = [(72.0, 720.0, "first line"), (72.0, 706.0, "second line"),
             (72.0, 692.0, "third line")]
    pdf = build_pdf([lines])
    text, _ = extract_pdf(pdf)
    assert text == "first line\nsecond line\nthird line"


def test_out_of_order_placement_sorted():
    lines = [(72.0, 692.0, "third"), (72.0, 720.0, "first"), (72.0, 706.0, "second")]
    pdf = build_pdf([lines])
    text, _ = extract_pdf(pdf)
    assert text == "first\nsecond\nthird"


def test_paragraph_gap():
    lines = [
        (72.0, 720.0, "para one line one"),
        (72.0, 706.0, "para one line two"),
        (72.0, 678.0, "para two line one"),  # 28pt gap = 2x leading
        (72.0, 664.0, "para two line two"),
    ]
    pdf = build_pdf([lines])
    text, _ = extract_pdf(pdf)
    assert text == "para one line one\npara one line two\n\npara two line one\npara two line two"


def test_multi_page_separator():
    pdf = build_pdf([[(72.0, 720.0, "page one")], [(72.0, 720.0, "page two")]])
    text, signals = extract_pdf(pdf)
    assert text == "page one\n\n---\n\npage two"
    assert signals["n_pages"] == 2


def test_two_columns():
    left = [(72.0, 720.0, "left top"), (72.0, 706.0, "left bottom")]
    right = [(340.0, 720.0, "right top"), (340.0, 706.0, "right bottom")]
    pdf = build_pdf([left + right])
    text, signals = extract_pdf(pdf)
    assert signals["column_count"] == 2
    # column-major reading order: left column first
    assert text.index("left bottom") < text.index("right top")


def test_math_font_signal():
    pdf = build_pdf([[(72.0, 720.0, "x equals y")]], fonts=["Helvetica", "ABCDEF+CMMI10"])
    _, signals = extract_pdf(pdf)
    assert signals["has_equations"] is True
    assert signals["font_count"] == 2


def test_no_math_font():
    pdf = build_pdf([[(72.0, 720.0, "plain text")]])
    _, signals = extract_pdf(pdf)
    assert signals["has_equations"] is False


def test_escaped_strings():
    pdf = build_pdf([[(72.0, 720.0, "parens (here) and \\ backslash")]])
    text, _ = extract_pdf(pdf)
    assert text == "parens (here) and \\ backslash"


def test_pages_and_fonts_api():
    pdf = build_pdf([[(72.0, 720.0, "x")], [(72.0, 720.0, "y")]], fonts=["Courier"])
    doc = PdfDocument(pdf)
    pages = doc.pages()
    assert len(pages) == 2
    assert doc.page_fonts(pages[0]) == ["Courier"]


def test_garbage_bytes_raise():
    with pytest.raises(PdfError):
        PdfDocument(b"%PDF-1.4 garbage without structure")


def test_truncated_pdf_raises_or_degrades():
    pdf = build_pdf([[(72.0, 720.0, "hello world")]])
    # Cut off the xref: scan fallback should still find objects
    cut = pdf[: pdf.rfind(b"xref")]
    try:
        text, _ = extract_pdf(cut)
        assert "hello world" in text
    except PdfError:
        pass  # acceptable: flagged as failure row upstream


def test_basic_text_not_corrupted_by_literal_separator_lines():
    """A page whose text legitimately contains a '---' horizontal-rule
    line must survive the basic join (previously derived by string-
    replacing the page separator out of the layout text)."""
    from smart_ocr_spark.kernel.extract import extract_payload_full
    from smart_ocr_spark.sources.corpus import build_pdf

    pdf = build_pdf(
        [
            [(72.0, 720.0, "first page body"), (72.0, 700.0, "---"),
             (72.0, 680.0, "after the rule")],
            [(72.0, 720.0, "second page body")],
        ]
    )
    r = extract_payload_full(pdf)
    assert "---" in r["basic_text"]
    # exactly one page separator in layout (2 pages), none invented
    assert r["layout_text"].count("\n\n---\n\n") >= 1
