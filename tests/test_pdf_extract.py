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


def test_split_columns_honors_mediabox_origin():
    """Two columns on a page whose MediaBox starts at x=200: bucketing
    by absolute centers collapsed both into one column before."""
    from smart_ocr_spark.kernel.pdf_extract import Line, render_page_text

    lines = []
    for i in range(5):
        lines.append(Line(x0=210.0, x1=400.0, y=700.0 - 14 * i, text=f"L{i}"))
        lines.append(Line(x0=620.0, x1=800.0, y=700.0 - 14 * i, text=f"R{i}"))
    out = render_page_text(lines, page_width=612.0, x_origin=200.0)
    li = [t for t in out.replace("\n\n", "\n").split("\n")]
    assert li.index("L4") < li.index("R0"), out  # column-major order


def test_basic_mode_is_single_column():
    """The 'basic' variant renders y-order single-column — a genuinely
    different reconstruction for the repair tier, not just a different
    page separator."""
    from smart_ocr_spark.sources.corpus import build_pdf
    from smart_ocr_spark.kernel.pdf_extract import extract_pdf

    pages = [[]]
    for i in range(6):
        pages[0].append((72.0, 700.0 - 16 * i, f"left{i} words here"))
        pages[0].append((400.0, 700.0 - 16 * i, f"right{i} words here"))
    pdf = build_pdf(pages)
    layout, sig = extract_pdf(pdf, "layout")
    basic, _ = extract_pdf(pdf, "basic")
    if sig["column_count"] > 1:
        assert layout != basic


def test_bad_name_token_degrades_not_asserts():
    """A malformed name token inside a content stream must be skipped
    (PdfError recovery), not escape as AssertionError."""
    from smart_ocr_spark.kernel.pdf_extract import interpret_content

    content = b"BT /F1 12 Tf 72 700 Td (Before) Tj << 3 >> BDC (After) Tj ET"
    runs = interpret_content(content)
    texts = [r.text for r in runs]
    assert "Before" in texts


def test_winansi_punctuation_decoded():
    """0x80-0x9F WinAnsi: em dash / curly quotes must decode to the
    real characters, not C1 controls."""
    from smart_ocr_spark.kernel.pdf_extract import _decode_pdf_string

    assert _decode_pdf_string(b"a\x97b") == "a—b"      # em dash
    assert _decode_pdf_string(b"\x93q\x94") == "“q”"  # curly quotes
    assert _decode_pdf_string(b"\x81") == "\x81"  # undefined byte passthrough
