"""Raster-recovery tier for scanned (image-only) documents.

The reference recovers scanned PDFs by rasterizing pages and sending
the pixmaps to OCR engines (``benchmark/rasterize.py:17-80`` builds the
scanned corpus; the cloud OCR engines in ``engines/`` read the pixels).
Neither a rasterizer (PyMuPDF) nor an OCR backend (tesseract/vision
API) exists in this environment, so — like the multimodal decode stubs
(``functions/multimodal.py``) — this tier keeps the PLUMBING real and
the pixel step honestly stubbed:

  * :func:`rasterize_plan` is REAL: per-page raster geometry (pixel
    dims at the requested DPI from the MediaBox) + image-stream
    inventory, computed by the same from-scratch PDF parser the
    extraction kernels use.  This is the metadata a distributed
    rasterize-and-OCR stage would partition and dispatch on.
  * :func:`ocr_image_stream` with ``fake=True`` (the default, mirroring
    ``multimodal.py``) decodes the deterministic synthetic-scan payload
    the corpus fixtures embed (``sources/corpus.py`` pdf_scanned class:
    a magic-prefixed zlib of the page text standing in for "pixels the
    OCR model would read"); ``fake=False`` raises — there is no OCR
    backend in the container, and pretending otherwise would be a
    silent wrong answer.

The recovery variant (``raster`` in the repair chain) is therefore
end-to-end testable: scanned docs gain a real attempt row, route
through the same escalation/audit/selection machinery as every other
variant, and byte-identity holds against the fixtures' golden text.
"""

from __future__ import annotations

import zlib

from smart_ocr_spark.kernel.pdf_extract import PdfDocument

# Magic prefix of the synthetic-scan payload: corpus fixtures store
# zlib(MAGIC + page_text) as the image stream, so the PDF's declared
# FlateDecode filter stays honest and the DECODED bytes ("the pixels")
# carry the deterministic text a real OCR model would read off the
# render.  Real scanner output never decodes to this prefix, so the
# fake OCR returns "" for it — exactly what a missing backend should do.
RASTER_TEXT_MAGIC = b"SCANTXT1"

DEFAULT_DPI = 200  # reference rasterize.py:17 default

# Reference state.py:148 page separator (same join the layout variant
# uses — a recovered scan assembles like any other multi-page doc).
PAGE_SEP = "\n\n---\n\n"


def rasterize_plan(payload: bytes, dpi: int = DEFAULT_DPI) -> list[dict]:
    """Per-page raster geometry + image inventory (REAL metadata).

    Mirrors the reference's ``PaperRasterizer.rasterize`` geometry
    (``rasterize.py:38-56``: zoom = dpi/72, page rect preserved) without
    touching pixels: one dict per page with the pixel dimensions a
    rasterizer would produce and the embedded image streams an OCR
    stage would consume.  Raises nothing — non-PDF/garbage payloads
    yield an empty plan (callers treat that as "nothing to recover").
    """
    try:
        doc = PdfDocument(payload)
        pages = doc.pages()
    except Exception:
        return []
    zoom = dpi / 72.0
    plan: list[dict] = []
    for page_idx, page in enumerate(pages, start=1):
        try:
            media = doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792]
            media = [float(doc.resolve(v)) for v in media]
            w_pt, h_pt = media[2] - media[0], media[3] - media[1]
            streams = _page_image_streams(doc, page)
        except Exception:
            continue
        plan.append(
            {
                "page_num": page_idx,
                "width_px": int(round(w_pt * zoom)),
                "height_px": int(round(h_pt * zoom)),
                "dpi": dpi,
                "n_images": len(streams),
                "image_streams": streams,
            }
        )
    return plan


def _page_image_streams(doc: PdfDocument, page) -> list[bytes]:
    """DECODED stream bytes (the raster "pixels") of every image
    XObject on the page; undecodable streams are skipped."""
    res = doc.resolve(page.get("Resources")) or {}
    xobjs = doc.resolve(res.get("XObject")) if isinstance(res, dict) else None
    out: list[bytes] = []
    if isinstance(xobjs, dict):
        for _name, xref in xobjs.items():
            x = doc.resolve(xref)
            hdr = getattr(x, "header", None)
            if isinstance(hdr, dict) and hdr.get("Subtype") == "Image":
                try:
                    out.append(x.decoded())
                except Exception:
                    continue
    return out


def ocr_image_stream(stream: bytes, fake: bool = True) -> str:
    """OCR one raster image.

    ``fake=True`` (default): decode the deterministic synthetic-scan
    payload (MAGIC + zlib(text)); any other bytes — i.e. real pixels —
    yield "" (the honest answer of a missing backend).  ``fake=False``
    raises: no OCR engine ships in this container, and the distributed
    plumbing around this seam must not pretend otherwise."""
    if not fake:
        raise NotImplementedError(
            "no raster OCR backend in this environment (tesseract/vision "
            "API absent); wire a real engine into ocr_image_stream(fake="
            "False) on a cluster that has one"
        )
    if stream.startswith(RASTER_TEXT_MAGIC):
        return stream[len(RASTER_TEXT_MAGIC):].decode("utf-8", "replace")
    return ""


def extract_payload_raster(payload: bytes, dpi: int = DEFAULT_DPI) -> str:
    """The ``raster`` repair variant: rasterize-plan + per-image OCR +
    page join (reference separator).  Pages whose images carry no
    recoverable text contribute "" — a doc with no recoverable layer
    returns "" overall, exactly like the native pass on a scan
    (``pdf_extract.extract_pdf``'s no-text-layer rule)."""
    page_texts: list[str] = []
    for page in rasterize_plan(payload, dpi=dpi):
        parts = [ocr_image_stream(s) for s in page["image_streams"]]
        page_texts.append("\n\n".join(p for p in parts if p))
    if not any(pt.strip() for pt in page_texts):
        return ""
    return PAGE_SEP.join(page_texts)


def rasterize_pdf(payload: bytes, dpi: int = DEFAULT_DPI) -> bytes:
    """Born-digital PDF -> synthetic image-only PDF (the reference's
    ``PaperRasterizer.rasterize``, rasterize.py:17-63): page count and
    page rect preserved, text layer REMOVED, one full-page image per
    page whose synthetic-scan payload carries what the rendered pixels
    would spell (so the raster-OCR fake can round-trip it — the
    benchmark's scanned category is constructed exactly this way from
    ground-truth papers).  ``dpi`` only affects the raster plan
    geometry, like the reference's zoom matrix."""
    from smart_ocr_spark.kernel.pdf_extract import PdfDocument, extract_pdf

    _, signals = extract_pdf(payload, "basic")
    page_texts = signals["page_texts"]
    doc = PdfDocument(payload)
    pages = doc.pages()
    media = doc.resolve(pages[0].get("MediaBox")) if pages else None
    if media:
        media = [float(doc.resolve(v)) for v in media]
        w, h = media[2] - media[0], media[3] - media[1]
    else:
        w, h = 612.0, 792.0
    from smart_ocr_spark.sources.corpus import build_pdf

    return build_pdf(
        [[] for _ in page_texts],
        page_width=w,
        page_height=h,
        image_pages=[True] * len(page_texts),
        image_streams=[encode_scan_text(t) for t in page_texts],
    )


def encode_scan_text(text: str) -> bytes:
    """Fixture-side encoder: the RAW image-stream bytes the corpus
    embeds (zlib because the XObject declares FlateDecode; the decoded
    payload — "the pixels" — is MAGIC + text).  Inverse of the
    ``fake=True`` OCR path through ``Stream.decoded()``."""
    return zlib.compress(RASTER_TEXT_MAGIC + text.encode("utf-8"))
