"""Crash-robustness fuzzing: at web scale every malformed byte sequence
that can exist, will. The extraction entry points must NEVER raise —
they return parse_ok/parse_error (the reference converts engine crashes
to failure modes, not exceptions; O9 timeout-guard analog)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from smart_ocr_spark.kernel.extract import extract_payload_full, extract_payload_variant
from smart_ocr_spark.kernel.figures import doc_figures

_BYTES = st.binary(min_size=0, max_size=400)


@settings(max_examples=250, deadline=None)
@given(_BYTES)
def test_extract_full_never_raises(payload):
    r = extract_payload_full(payload)
    assert isinstance(r["parse_ok"], bool)
    assert isinstance(r["basic_text"], str)
    assert isinstance(r["layout_text"], str)


@settings(max_examples=100, deadline=None)
@given(_BYTES, st.sampled_from(["basic", "layout", "density"]))
def test_extract_variant_never_raises(payload, variant):
    out = extract_payload_variant(payload, variant)
    assert out is None or isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(_BYTES)
def test_figures_never_raise(payload):
    assert isinstance(doc_figures(b"%PDF-1.4\n" + payload), list)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=300))
def test_html_wrapped_unicode_never_raises(text):
    payload = f"<html><body><p>{text}</p></body></html>".encode("utf-8")
    r = extract_payload_full(payload)
    assert isinstance(r["layout_text"], str)


def test_truncated_pdf_prefixes():
    from smart_ocr_spark.sources.corpus import build_pdf

    pdf = build_pdf([[(72.0, 720.0, "hello world document text")]])
    for cut in range(0, len(pdf), max(len(pdf) // 40, 1)):
        r = extract_payload_full(pdf[:cut])
        assert isinstance(r["parse_ok"], bool), cut


def test_cyclic_indirect_reference_does_not_hang():
    # object 1 is a reference to itself; resolve() must classify, not spin
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n1 0 R\nendobj\n"
        b"2 0 obj\n<< /Type /Catalog /Pages 1 0 R >>\nendobj\n"
        b"xref\n0 3\n0000000000 65535 f \n0000000009 00000 n \n"
        b"0000000031 00000 n \n"
        b"trailer\n<< /Size 3 /Root 2 0 R >>\nstartxref\n80\n%%EOF\n"
    )
    r = extract_payload_full(pdf)
    assert isinstance(r["parse_ok"], bool)
