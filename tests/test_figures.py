"""Figure-metadata kernel (§2.13): union-find clustering, candidate
filters, image placement, caps."""

from __future__ import annotations

from smart_ocr_spark.kernel import figures as FG
from smart_ocr_spark.sources.corpus import build_pdf


def _fig_pdf(prefix: str, n_pages: int = 1) -> bytes:
    return build_pdf(
        [[(72.0, 720.0, "some text")] for _ in range(n_pages)],
        raw_page_prefix=[prefix] * n_pages,
    )


def test_single_rect_detected():
    pdf = _fig_pdf("150 300 200 220 re S")
    figs = FG.doc_figures(pdf)
    assert len(figs) == 1
    f = figs[0]
    assert f["figure_type"] == "drawing" and f["page_num"] == 1
    assert (f["x0"], f["y0"], f["x1"], f["y1"]) == (150.0, 300.0, 350.0, 520.0)


def test_nearby_paths_cluster_into_one_figure():
    # two rects 20pt apart (< gap 30) -> one merged figure; each rect
    # alone is under the 5% page-area floor, the merged cluster is not
    pdf = _fig_pdf("150 300 100 200 re S 270 300 100 200 re S")
    figs = FG.doc_figures(pdf)
    assert len(figs) == 1
    assert figs[0]["x1"] - figs[0]["x0"] == 220.0


def test_distant_paths_stay_separate():
    # 150pt apart (> gap 30): two clusters, both pass filters
    pdf = _fig_pdf("80 300 150 170 re S 380 300 150 170 re S")
    figs = FG.doc_figures(pdf)
    assert len(figs) == 2


def test_filters_reject_small_margin_and_huge():
    small = FG.doc_figures(_fig_pdf("150 300 40 40 re S"))  # < 80x80
    assert small == []
    header = FG.doc_figures(_fig_pdf("150 740 200 200 re S"))  # top margin
    assert header == []
    huge = FG.doc_figures(_fig_pdf("10 80 590 650 re S"))  # > 85% page area
    assert huge == []
    sliver = FG.doc_figures(_fig_pdf("100 300 400 45 re S"))  # aspect > 8
    assert sliver == []


def test_per_page_cap():
    rects = " ".join(
        f"{40 + i * 145} 150 100 400 re S" for i in range(4)
    )  # 4 candidates, 45pt apart (> cluster gap 30), one page
    figs = FG.doc_figures(_fig_pdf(rects))
    assert len(figs) == FG.MAX_PER_PAGE


def test_multi_page_numbers():
    pdf = _fig_pdf("150 300 200 220 re S", n_pages=3)
    figs = FG.doc_figures(pdf)
    assert [f["page_num"] for f in figs] == [1, 2, 3]
    assert [f["figure_num"] for f in figs] == [1, 2, 3]


def test_non_pdf_and_garbage_payloads():
    assert FG.doc_figures(b"<html>x</html>") == []
    assert FG.doc_figures(b"%PDF-1.4 truncated garbage") == []


def test_passes_filters_mediabox_origin():
    """Nonzero MediaBox origin (cropped scans): the margin bands are
    defined in the page frame, so a figure must be judged after
    translating its absolute coordinates by the origin."""
    from smart_ocr_spark.kernel.figures import passes_filters

    page_w, page_h = 612.0, 792.0
    # a centered 200x200 box in PAGE coordinates
    page_box = (200.0, 300.0, 400.0, 500.0)
    assert passes_filters(page_box, page_w, page_h)

    # the same physical box on a page whose MediaBox starts at
    # (1000, 2000): absolute coords shift, origin passed through
    shifted = (1200.0, 2300.0, 1400.0, 2500.0)
    assert passes_filters(shifted, page_w, page_h, origin=(1000.0, 2000.0))
    # without the origin translation the same box lands far above the
    # header band and must be rejected — the round-1 bug
    assert not passes_filters(shifted, page_w, page_h)


def test_passes_filters_margin_band_respects_origin():
    from smart_ocr_spark.kernel.figures import passes_filters

    page_w, page_h = 612.0, 792.0
    # footer-band box in page frame: y0 below 8% of page height
    footer = (200.0, 10.0, 400.0, 200.0)
    assert not passes_filters(footer, page_w, page_h)
    # same footer box, shifted page: still rejected when origin given
    shifted = (1200.0, 2010.0, 1400.0, 2200.0)
    assert not passes_filters(shifted, page_w, page_h, origin=(1000.0, 2000.0))


def test_scan_boxes_bounded_on_adversarial_stream():
    """O9 analog: a content stream with tens of thousands of paint ops
    must not collect unbounded boxes (cluster_boxes is O(n^2) — this is
    the deterministic stand-in for the reference's 30s SIGALRM page
    guard)."""
    import time

    from smart_ocr_spark.kernel.figures import (
        MAX_SCAN_BOXES_PER_PAGE,
        cluster_boxes,
        scan_page_boxes,
    )

    from smart_ocr_spark.kernel.figures import ClusterBudgetExceeded

    ops = b" ".join(
        b"%d %d 100 100 re f" % (i % 500, (i * 7) % 700)
        for i in range(60_000)
    )
    t0 = time.perf_counter()
    drawings, images, truncated = scan_page_boxes(ops, set())
    try:
        cluster_boxes(drawings)
    except ClusterBudgetExceeded:
        pass  # the pair budget is allowed to trip first on a dense page
    elapsed = time.perf_counter() - t0
    assert truncated, "work bound must trip on the adversarial page"
    assert len(drawings) <= MAX_SCAN_BOXES_PER_PAGE
    assert elapsed < 10.0, f"adversarial page took {elapsed:.1f}s"


def test_dense_page_below_bound_keeps_all_boxes():
    from smart_ocr_spark.kernel.figures import scan_page_boxes

    ops = b" ".join(
        b"%d %d 100 100 re f" % (i % 500, (i * 7) % 700) for i in range(400)
    )
    drawings, images, truncated = scan_page_boxes(ops, set())
    assert not truncated
    assert len(drawings) == 400


def test_truncated_page_yields_no_figures():
    """Reference parity (extractor.py:121-125): a page that trips the
    per-page guard is skipped entirely — never a partial figure list."""
    from smart_ocr_spark.kernel.figures import doc_figures
    from smart_ocr_spark.sources.corpus import build_pdf

    raw = " ".join(
        "%d %d 120 120 re f" % ((i * 13) % 400 + 80, (i * 29) % 500 + 120)
        for i in range(30_000)
    )
    pdf = build_pdf(
        [[(72.0, 700.0, "text line")]], raw_page_prefix=[raw]
    )
    assert doc_figures(pdf) == []


def test_dense_vector_chart_still_yields_figures():
    """ADVICE r2: a legitimate vector chart paints thousands of path
    boxes; the old 512-box cap silently dropped its figures.  With the
    sweep-clustered kernel a 2k-box chart must produce figure rows."""
    from smart_ocr_spark.kernel.figures import doc_figures
    from smart_ocr_spark.sources.corpus import build_pdf

    raw = " ".join(
        "%d %d 60 60 re f" % ((i * 13) % 350 + 100, (i * 29) % 400 + 150)
        for i in range(2_000)
    )
    pdf = build_pdf([[(72.0, 760.0, "text line")]], raw_page_prefix=[raw])
    figs = [f for f in doc_figures(pdf) if f["figure_type"] == "drawing"]
    assert figs, "dense-but-legitimate chart must not be skipped"
