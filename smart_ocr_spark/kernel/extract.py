"""Unified per-payload extraction entry points for the batch UDF layer.

One parse, all variants: ``extract_payload_full`` parses the payload once
(HTML DOM build or PDF object walk) and renders both the ``basic`` (raw
text-layer read, the reference's ``page.get_text("text")`` analog) and
``layout`` (boilerplate-stripped structured markdown) variants from the same
block list — the hot path touches each byte once (SURVEY.md §4: the whole
pipeline is a single scan; repair re-parses only its small failed subset).

``extract_payload_variant`` re-extracts one named variant for the repair
loop (reference O5: selective repair re-runs only failed pages).
"""

from __future__ import annotations

from smart_ocr_spark.kernel.html_extract import (
    classify_blocks,
    page_signals,
    parse_html,
    render_blocks,
    segment_blocks,
)
from smart_ocr_spark.kernel.normalize import normalize_generic, strip_phantom_images
from smart_ocr_spark.kernel.pdf_extract import PdfError, extract_pdf, sniff_pdf

# Flat signal defaults shared by both payload kinds.
_EMPTY_SIGNALS = {
    "n_blocks": 0,
    "n_tables": 0,
    "n_headings": 0,
    "n_lists": 0,
    "total_chars": 0,
    "link_density": 0.0,
    "has_tables": False,
    "has_equations": False,
    "has_figures": False,
    "n_images": 0,
    "n_pages": 1,
    "font_count": 0,
    "column_count": 1,
}


def finalize_text(text: str) -> str:
    """The per-attempt output contract: generic normalization then phantom
    image strip (reference Phase 5, orchestrator.py:1210-1285)."""
    return strip_phantom_images(normalize_generic(text))


def extract_payload_full(payload: bytes) -> dict:
    """Parse once; emit basic text, layout text, and signals.

    Never raises: parse failures come back as ``parse_ok=False`` with the
    error class in ``parse_error`` (reference O9 timeout-guard semantics —
    a malformed row must not kill the task).
    """
    out = dict(_EMPTY_SIGNALS)
    out.update(
        {
            "is_pdf": False,
            "parse_ok": True,
            "parse_error": "",
            "basic_text": "",
            "layout_text": "",
        }
    )
    try:
        if sniff_pdf(payload):
            out["is_pdf"] = True
            # One parse; page separator differs per variant.
            layout_text, signals = extract_pdf(payload, "layout")
            page_texts = signals.pop("page_texts")
            # parsed-document handle for same-payload follow-up passes
            # (inline figures); never enters the flat signal columns
            out["_pdf_doc"] = signals.pop("_doc", None)
            out["layout_text"] = finalize_text(layout_text)
            # all-empty page set (scanned/image-only): joining would
            # fabricate separator-only text — mirror pdf_extract's rule
            out["basic_text"] = (
                "\n\n".join(page_texts)
                if any(pt.strip() for pt in page_texts)
                else ""
            )
            for k, v in signals.items():
                out[k] = v
            # the PDF signal set has no block-derived total_chars; the
            # repair loop's has-content gate needs a real value here
            out["total_chars"] = len(out["basic_text"])
            if not out["has_tables"]:
                # P10 columnar-numbers fallback (reference
                # born_digital.py:415-447: find_tables() OR the
                # single-token-line heuristic, applied PER PAGE — any
                # page tripping it marks the doc).  Running it on the
                # joined doc text would dilute a single table page's
                # single-token ratio below 0.5 with prose from other
                # pages and systematically under-detect.  PDF-only,
                # like the reference: an HTML page's basic text can
                # legitimately be single-token lines (nav menus, tag
                # clouds) and HTML tables are detected structurally.
                # (The structural half — ruled grids — comes from
                # pdf_extract.detect_ruled_table in the signals.)
                from smart_ocr_spark.kernel.assess import detect_columnar_numbers

                if any(detect_columnar_numbers(pt) for pt in page_texts):
                    out["has_tables"] = True
            if not out["has_equations"]:
                # P8 LaTeX-markup detection complements the math-FONT
                # signal P7 (reference born_digital.py:477-506): papers
                # carry equations as markup in plain text fonts too
                from smart_ocr_spark.kernel.assess import detect_latex_equations

                if detect_latex_equations(out["basic_text"]):
                    out["has_equations"] = True
        else:
            html = payload.decode("utf-8", "replace")
            root = parse_html(html)
            blocks = segment_blocks(root)
            keep_layout = classify_blocks(blocks, "layout")
            keep_basic = classify_blocks(blocks, "basic")
            out["layout_text"] = finalize_text(
                render_blocks(blocks, keep_layout, "layout")
            )
            out["basic_text"] = render_blocks(blocks, keep_basic, "basic")
            for k, v in page_signals(blocks, html).items():
                out[k] = v
    except PdfError as exc:
        out["parse_ok"] = False
        out["parse_error"] = f"PdfError: {exc}"
    except Exception as exc:  # malformed payloads must not kill the task
        out["parse_ok"] = False
        out["parse_error"] = f"{type(exc).__name__}: {exc}"
    return out


def extract_payload_variant(payload: bytes, variant: str) -> str | None:
    """Single-variant re-extraction for repair attempts.

    ``layout_alt`` is the different-family kernel: layout classification
    with neighborhood smoothing disabled (keeps only solid content blocks).
    Returns None on parse failure.
    """
    try:
        if variant == "raster":
            # the scanned-recovery tier (kernel/raster.py): rasterize
            # plan + per-image OCR; "" for anything without a
            # recoverable layer, None never (a scan that yields nothing
            # is an honest empty attempt, not a parse failure)
            from smart_ocr_spark.kernel.raster import extract_payload_raster

            return extract_payload_raster(payload) if sniff_pdf(payload) else ""
        if sniff_pdf(payload):
            # "density" must be a genuinely different kernel config for
            # PDFs too: basic mode renders single-column in y-order
            # (pdf_extract.render_page_text n_cols=1) — the escape hatch
            # when the layout pass's column split was itself the failure
            mode = "basic" if variant in ("basic", "raw", "density") else "layout"
            text, _ = extract_pdf(payload, mode)
            return text if variant in ("basic", "raw") else finalize_text(text)
        html = payload.decode("utf-8", "replace")
        root = parse_html(html)
        blocks = segment_blocks(root)
        if variant in ("basic", "raw"):
            return render_blocks(blocks, classify_blocks(blocks, "basic"), "basic")
        if variant == "layout_alt":
            keep = classify_blocks(blocks, "density")
            # alt family: render without markdown decoration but with the
            # density-classified block set
            return finalize_text(render_blocks(blocks, keep, "basic"))
        keep = classify_blocks(blocks, variant)
        return finalize_text(render_blocks(blocks, keep, variant))
    except Exception:
        return None
