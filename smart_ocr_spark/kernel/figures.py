"""Figure-metadata extraction from PDF pages (SURVEY.md §2.13).

Re-derives the reference's three per-page strategies
(``src/socr/figures/extractor.py:138-291``) at METADATA level — at
10^12-document scale figure pixels are never materialized, only
``(figure_num, page_num, figure_type, bbox)`` rows (SURVEY.md §1.4):

  1. vector-drawing clustering: path-construction operators (re/m/l/c)
     grouped by union-find on bbox proximity (gap <= 30pt,
     ``extractor.py:351-413``);
  2. embedded image placements: ``cm`` matrix before an image-XObject
     ``Do`` gives the placed bbox (``extractor.py:222-289`` analog).

Candidate filters mirror ``extractor.py:58-66,107-112,174-186,236-239``:
min 80x80pt, aspect in [1/8, 8], header/footer margin exclusion,
page-area-ratio band [0.05, 0.85] (upper bound relaxed to 0.90 on
landscape pages). Caps: 3 figures/page, 25/doc
(``extractor.py:72-76``).
"""

from __future__ import annotations

import re

from smart_ocr_spark.kernel.pdf_extract import PdfDocument, PdfError, _Lexer

CLUSTER_GAP = 30.0
MIN_SIDE = 80.0
ASPECT_MIN, ASPECT_MAX = 1.0 / 8.0, 8.0
AREA_RATIO_MIN, AREA_RATIO_MAX = 0.05, 0.85
AREA_RATIO_MAX_LANDSCAPE = 0.90
MARGIN_FRAC = 0.08  # header/footer exclusion band
MAX_PER_PAGE = 3
MAX_TOTAL = 25

_PATH_PAINT = {b"S", b"s", b"f", b"F", b"B", b"b", b"n"}

# O9 timeout-guard analog (reference figures/extractor.py:108-125: a
# 30s SIGALRM per page, and a page that trips it is SKIPPED entirely).
# Signals don't work on executor worker threads, so the Spark-safe
# equivalent is a deterministic work bound.  A page that exceeds either
# bound yields NO figures — exactly the reference's timeout semantics —
# never a silently truncated subset.  The box cap approximates the 30s
# budget (a legitimate vector chart easily paints thousands of path
# boxes and clusters in well under a second with the sweep below); the
# pair-visit budget below bounds the clustering itself, so only
# genuinely pathological pages are skipped.
MAX_SCAN_BOXES_PER_PAGE = 20_000
# cluster_boxes inner-loop visit budget: ~4M cheap visits is 1-2s of
# Python — the deterministic stand-in for the reference's per-page 30s.
MAX_CLUSTER_PAIR_VISITS = 4_000_000


class ClusterBudgetExceeded(Exception):
    """Raised when bbox clustering exceeds its deterministic work bound;
    callers skip the page entirely (reference timeout semantics)."""

Box = tuple[float, float, float, float]


def _merge(a: Box, b: Box) -> Box:
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def _gap(a: Box, b: Box) -> float:
    dx = max(a[0] - b[2], b[0] - a[2], 0.0)
    dy = max(a[1] - b[3], b[1] - a[3], 0.0)
    return max(dx, dy)


def scan_page_boxes(
    content: bytes, image_names: set[str]
) -> tuple[list[Box], list[Box], bool]:
    """One pass over the content stream -> (drawing path bboxes,
    placed image bboxes, truncated).  Tracks current path points and the
    last ``cm`` translation+scale (axis-aligned subset — rotation is out
    of the supported corpus, like the text interpreter).  ``truncated``
    means the O9 work bound tripped and the page must be skipped."""
    drawings: list[Box] = []
    images: list[Box] = []
    truncated = False
    lx = _Lexer(content, 0)
    operands: list = []
    pts: list[tuple[float, float]] = []
    cm = (1.0, 1.0, 0.0, 0.0)  # (sx, sy, tx, ty)
    cm_stack: list[tuple[float, float, float, float]] = []
    n = len(content)

    def flush_path() -> None:
        nonlocal pts, truncated
        if len(pts) >= 2:
            if len(drawings) < MAX_SCAN_BOXES_PER_PAGE:
                xs = [p[0] for p in pts]
                ys = [p[1] for p in pts]
                drawings.append((min(xs), min(ys), max(xs), max(ys)))
            else:
                truncated = True
        pts = []

    while lx.pos < n:
        if truncated:
            break  # O9 work bound tripped: the page will be skipped
        lx.skip_ws()
        if lx.pos >= n:
            break
        c = content[lx.pos : lx.pos + 1]
        if c in b"/<([+-.0123456789":
            try:
                operands.append(lx.parse_object())
            except PdfError:
                lx.pos += 1
            continue
        m = re.match(rb"[A-Za-z'\"*]{1,3}", content[lx.pos : lx.pos + 3])
        if not m:
            lx.pos += 1
            operands = []
            continue
        op = m.group(0)
        lx.pos += len(op)
        try:
            if op == b"re" and len(operands) >= 4:
                x, y, w, h = (float(v) for v in operands[-4:])
                pts.extend([(x, y), (x + w, y + h)])
            elif op in (b"m", b"l") and len(operands) >= 2:
                pts.append((float(operands[-2]), float(operands[-1])))
            elif op == b"c" and len(operands) >= 6:
                vals = [float(v) for v in operands[-6:]]
                pts.extend([(vals[0], vals[1]), (vals[2], vals[3]), (vals[4], vals[5])])
            elif op in (b"v", b"y") and len(operands) >= 4:
                vals = [float(v) for v in operands[-4:]]
                pts.extend([(vals[0], vals[1]), (vals[2], vals[3])])
            elif op in _PATH_PAINT or op in (b"f*", b"B*", b"b*"):
                flush_path()
            elif op == b"q":
                cm_stack.append(cm)
            elif op == b"Q":
                cm = cm_stack.pop() if cm_stack else (1.0, 1.0, 0.0, 0.0)
            elif op == b"cm" and len(operands) >= 6:
                a, b_, c_, d, e, f = (float(v) for v in operands[-6:])
                # axis-aligned composition onto the current cm
                sx, sy, tx, ty = cm
                cm = (sx * a, sy * d, tx + e * sx, ty + f * sy)
            elif op == b"Do" and operands:
                name = operands[-1]
                if isinstance(name, str) and name in image_names:
                    sx, sy, tx, ty = cm
                    x0, x1 = sorted((tx, tx + sx))
                    y0, y1 = sorted((ty, ty + sy))
                    if len(images) < MAX_SCAN_BOXES_PER_PAGE:
                        images.append((x0, y0, x1, y1))
                    else:
                        truncated = True
        except (TypeError, ValueError):
            pass
        operands = []
    return drawings, images, truncated


def cluster_boxes(
    boxes: list[Box],
    gap: float = CLUSTER_GAP,
    max_pair_visits: int = MAX_CLUSTER_PAIR_VISITS,
) -> list[Box]:
    """Union-find on bbox proximity (extractor.py:351-413).

    Candidate pairs are pruned with an x-sweep: boxes sorted by x0, and
    for each box only successors whose x0 is within ``x1 + gap`` are
    visited — every pair farther apart in x has ``_gap > gap`` by
    construction, so connectivity (and output) is identical to the full
    O(n^2) scan while typical spread layouts cluster in ~O(n log n).
    Pathological layouts (everything mutually x-overlapping) degrade
    toward O(n^2); the visit budget bounds that deterministically and
    raises :class:`ClusterBudgetExceeded` so the caller can skip the
    page (O9 timeout semantics)."""
    n = len(boxes)
    parent = list(range(n))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    order = sorted(range(n), key=lambda i: boxes[i][0])
    visits = 0
    for a in range(n):
        i = order[a]
        bi = boxes[i]
        x_limit = bi[2] + gap
        for b in range(a + 1, n):
            j = order[b]
            bj = boxes[j]
            if bj[0] > x_limit:
                break  # sorted by x0: no later box can be within gap of i
            visits += 1
            if visits > max_pair_visits:
                raise ClusterBudgetExceeded(
                    f"{visits} pair visits over {n} boxes (budget {max_pair_visits})"
                )
            ri, rj = find(i), find(j)
            if ri == rj:
                continue
            if _gap(bi, bj) <= gap:
                parent[rj] = ri
    merged: dict[int, Box] = {}
    for i, b in enumerate(boxes):
        r = find(i)
        merged[r] = _merge(merged[r], b) if r in merged else b
    return sorted(merged.values(), key=lambda b: (-b[3], b[0]))  # y-desc, x-asc


MIN_IMAGE_AREA = 80.0 * 80.0  # reference MIN_AREA (extractor.py:61)


def passes_image_filters(box: Box) -> bool:
    """Embedded-image candidate filter — reference parity
    (``extractor.py:236-239`` IMAGE blocks): images are filtered by
    min AREA (80x80 pt^2) and aspect band only.  The margin bands and
    page-area-ratio band apply to VECTOR drawings only — a full-page
    scan image is a legitimate figure there, not clutter."""
    w, h = box[2] - box[0], box[3] - box[1]
    if w * h < MIN_IMAGE_AREA:
        return False
    aspect = w / max(h, 1.0)  # extractor.py:238 guards h with max(h, 1)
    return ASPECT_MIN <= aspect <= ASPECT_MAX


def passes_filters(
    box: Box, page_w: float, page_h: float, origin: tuple[float, float] = (0.0, 0.0)
) -> bool:
    """Vector-drawing candidate filter.  ``box`` is in absolute
    content-stream coordinates; ``origin`` is the MediaBox lower-left
    corner.  The margin bands and area ratios are defined in the page
    frame, so translate first — a nonzero MediaBox origin (cropped
    scans) would otherwise shift the header/footer exclusion bands onto
    valid figures."""
    x0, y0, x1, y1 = (
        box[0] - origin[0],
        box[1] - origin[1],
        box[2] - origin[0],
        box[3] - origin[1],
    )
    w, h = x1 - x0, y1 - y0
    if w < MIN_SIDE or h < MIN_SIDE:
        return False
    aspect = w / h if h else 0.0
    if not (ASPECT_MIN <= aspect <= ASPECT_MAX):
        return False
    # header/footer margin exclusion
    if y1 > page_h * (1 - MARGIN_FRAC) or y0 < page_h * MARGIN_FRAC:
        return False
    ratio = (w * h) / (page_w * page_h) if page_w and page_h else 0.0
    hi = AREA_RATIO_MAX_LANDSCAPE if page_w > page_h else AREA_RATIO_MAX
    return AREA_RATIO_MIN <= ratio <= hi


# ---------------------------------------------------------------------------
# Figure blocks in the output markdown (orchestrator.py:1425-1453
# ``_build_figure_blocks`` + the append rule at orchestrator.py:1367-1371).
# The reference's caption comes from a cloud vision call
# (``_describe_and_embed_figures``, orchestrator.py:1287-1371) — out of
# scope per SURVEY §2.12, which prescribes a DETERMINISTIC caption stub
# derived from the figure metadata instead.  The stub is clearly marked
# so downstream consumers can't mistake it for a real description.
# ---------------------------------------------------------------------------


def _round_half_up(v: float) -> int:
    """Spark's ``F.round`` rounds HALF_UP; Python's round() is banker's.
    Extents are non-negative, so floor(v + 0.5) is exactly HALF_UP."""
    import math

    return int(math.floor(v + 0.5))


def stub_caption(figure_type: str, x0: float, y0: float, x1: float, y1: float) -> str:
    """Deterministic stand-in for the vision description: figure kind +
    bbox extent (rounded HALF_UP for byte-parity with the JVM mirror)."""
    return (
        f"[stub] {figure_type} region, "
        f"{_round_half_up(x1 - x0)}x{_round_half_up(y1 - y0)} pt"
    )


def _block_text(
    figure_num: int, page_num: int, rel_path: str, description: str = ""
) -> str:
    """One markdown figure block (``_build_figure_blocks``,
    orchestrator.py:1444-1450): the header takes a ``: description``
    suffix only when a description exists."""
    header = f"**Figure {figure_num}** (page {page_num})"
    if description:
        header += f": {description}"
    return f"{header}\n\n![Figure {figure_num}]({rel_path})"


def build_figure_blocks(figures: list[dict], doc_dir=None) -> str:
    """Reference ``_build_figure_blocks`` (orchestrator.py:1425-1453):
    one block per figure WITH an image path (pathless figures are
    skipped), image refs relative to the per-doc output dir when they
    resolve under it, basename otherwise.  ``figures`` dicts carry
    figure_num / page_num / description / image_path."""
    from pathlib import PurePath

    blocks = []
    for fig in figures:
        path = fig.get("image_path")
        if not path:
            continue
        p = PurePath(path)
        rel = PurePath(p.name)
        if doc_dir is not None:
            try:
                rel = p.relative_to(doc_dir)
            except ValueError:
                rel = PurePath(p.name)
        blocks.append(
            _block_text(
                fig["figure_num"], fig["page_num"], rel.as_posix(),
                fig.get("description") or "",
            )
        )
    return "\n\n".join(blocks)


def append_figure_blocks(text: str, blocks: str) -> str:
    """The ``_describe_and_embed_figures`` append rule
    (orchestrator.py:1367-1371): ``text.rstrip() + "\\n\\n" + blocks``
    when blocks exist, text unchanged otherwise.  rstrip is pinned to
    the ASCII whitespace class for byte-parity with the JVM mirror
    (:func:`smart_ocr_spark.operators.extract.with_figure_embed`)."""
    if not blocks:
        return text
    return text.rstrip(" \t\n\x0b\f\r") + "\n\n" + blocks


def figure_block(fig: dict) -> str:
    """Production block for METADATA-level figures: the reference save
    convention path (``extractor.py:294``, pixels never materialized)
    with the deterministic stub caption standing in for the vision
    description."""
    n, p = fig["figure_num"], fig["page_num"]
    caption = stub_caption(
        fig["figure_type"], fig["x0"], fig["y0"], fig["x1"], fig["y1"]
    )
    return _block_text(n, p, f"figures/figure_{n}_page{p}.png", caption)


def embed_figure_blocks(text: str, figures: list[dict]) -> str:
    """Metadata-level embed: stub-captioned blocks appended per the
    reference rule, only when the doc has text (orchestrator.py:1272)
    and figures exist.  The has-text gate is pinned to the ASCII
    whitespace class like the rstrip — Python's Unicode-aware strip()
    would diverge from the JVM mirror on e.g. NBSP-only text."""
    if not figures or not text.strip(" \t\n\x0b\f\r"):
        return text
    return append_figure_blocks(
        text, "\n\n".join(figure_block(f) for f in figures)
    )


def doc_figures(payload: bytes, doc: "PdfDocument | None" = None) -> list[dict]:
    """Whole-document figure metadata rows (PDF payloads only).

    ``doc`` accepts an already-parsed :class:`PdfDocument` so fused
    callers that just parsed the same payload don't pay a second
    xref/Flate/object walk."""
    try:
        if doc is None:
            doc = PdfDocument(payload)
        pages = doc.pages()
    except Exception:
        return []
    out: list[dict] = []
    fig_num = 0
    for page_idx, page in enumerate(pages, start=1):
        if fig_num >= MAX_TOTAL:
            break
        try:
            media = doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792]
            media = [doc.resolve(v) for v in media]
            # MediaBox is [x0 y0 x1 y1]; nonzero origins (cropped scans)
            # must not inflate the page size the filters normalize by
            page_w = float(media[2]) - float(media[0])
            page_h = float(media[3]) - float(media[1])
            content = doc.page_content(page)
            res = doc.resolve(page.get("Resources")) or {}
            xobjs = (
                doc.resolve(res.get("XObject")) if isinstance(res, dict) else None
            )
            image_names = set()
            if isinstance(xobjs, dict):
                for name, xref_ in xobjs.items():
                    x = doc.resolve(xref_)
                    hdr = getattr(x, "header", x)
                    if isinstance(hdr, dict) and hdr.get("Subtype") == "Image":
                        image_names.add(name)
            drawings, images, truncated = scan_page_boxes(content, image_names)
        except Exception:
            continue
        if truncated:
            # reference timeout semantics: the page yields NO figures
            continue
        try:
            clustered = cluster_boxes(drawings)
        except ClusterBudgetExceeded:
            continue  # O9: clustering budget tripped — skip the page
        page_count = 0
        for kind, boxes in (("drawing", clustered), ("image", images)):
            for box in boxes:
                if page_count >= MAX_PER_PAGE or fig_num >= MAX_TOTAL:
                    break
                # reference filter split: margin/area bands are
                # vector-only (extractor.py:174-186); images take the
                # min-area + aspect gate (extractor.py:236-239)
                ok = (
                    passes_image_filters(box)
                    if kind == "image"
                    else passes_filters(
                        box, page_w, page_h,
                        origin=(float(media[0]), float(media[1])),
                    )
                )
                if not ok:
                    continue
                fig_num += 1
                page_count += 1
                out.append(
                    {
                        "figure_num": fig_num,
                        "page_num": page_idx,
                        "figure_type": kind,
                        "x0": box[0],
                        "y0": box[1],
                        "x1": box[2],
                        "y1": box[3],
                    }
                )
    return out
