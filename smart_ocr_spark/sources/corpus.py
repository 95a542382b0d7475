"""Deterministic synthetic Common-Crawl-style corpus.

Generates the exact ``input_hint`` table shape
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
with one fixture class per reference signal (FIXTURES.md §3, mirroring the
reference's synthetic-PDF taxonomy in ``tests/test_born_digital.py:21-106``).

``text`` is the GOLDEN expected pipeline output per url, constructed
independently by the generator from the content it plants (never by running
the extraction kernel), so byte-identical assertions are real tests.
All fixture content is emitted pre-normalized (ASCII-ish, no trailing
whitespace, <=2 consecutive newlines) so the golden is stable under the
normalization contract.

Determinism: seeded ``random.Random`` per document; ``warc_ts`` increments
from a fixed epoch; host pool is Zipf-skewed (a few hot hosts) to exercise
salting; a minority of rows carry PDF payloads (magic ``%PDF-``); a small
tail of oversized blobs (>=1 MB) exercises size-bucketing.
"""

from __future__ import annotations

import datetime as dt
import random
import zlib

# Per-language vocabularies (deterministic word soup).
_VOCAB = {
    "en": (
        "the data stream table query spark shuffle partition filter scan "
        "join window batch vector column row group sort merge hash value "
        "engine document page text layout block content extract quality"
    ).split(),
    "es": (
        "los datos flujo tabla consulta particion filtro mesa enlace "
        "ventana lote vector columna fila grupo orden mezcla valor motor "
        "documento pagina texto bloque contenido calidad extraer sistema"
    ).split(),
    "de": (
        "die daten strom tabelle abfrage partition filter verbindung "
        "fenster stapel vektor spalte zeile gruppe sortierung wert motor "
        "dokument seite text block inhalt extrahieren system schnell"
    ).split(),
    "zh": (
        "数据 查询 分区 过滤 连接 窗口 批量 向量 列 行 分组 排序 合并 哈希 "
        "引擎 文档 页面 文本 布局 内容 提取 质量 系统 快速"
    ).split(),
}
_LANGS = ["en", "en", "en", "es", "de", "zh"]  # en-heavy mix

# Zipf-skewed host pool: host-0 is hot (exercises salting).
_HOSTS = (
    ["hot.example.com"] * 6
    + ["warm.example.org"] * 3
    + [f"site-{i}.example.net" for i in range(12)]
)

EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)

PAGE_SEP = "\n\n---\n\n"  # reference state.py:148

# Fixture-class weights (name, weight). Names land in the url path.
CLASSES = [
    ("prose", 22),
    ("boiler", 16),
    ("table", 10),
    ("headings", 10),
    ("sparse", 6),
    ("garbage", 5),
    ("spaced", 3),
    ("cid", 3),
    ("links", 5),
    # round 3: one weight unit carved out of images (4 -> 3) for the
    # scanned class keeps _TOTAL_W — and therefore every OTHER document's
    # class assignment — unchanged across rounds
    ("images", 3),
    ("pdf_scanned", 1),
    # round 4: one weight unit carved out of pdf_prose (8 -> 7) for the
    # ruled-table class, positioned right after it — _TOTAL_W and every
    # other class's range (and therefore assignment) stay unchanged
    ("pdf_prose", 7),
    ("pdf_table", 1),
    ("pdf_multicol", 4),
    ("pdf_math", 3),
    ("pdf_sparse", 2),
    ("pdf_long", 1),
    ("big_html", 2),
    ("empty", 2),
]
_TOTAL_W = sum(w for _, w in CLASSES)


def _pick_class(rng: random.Random) -> str:
    r = rng.randrange(_TOTAL_W)
    acc = 0
    for name, w in CLASSES:
        acc += w
        if r < acc:
            return name
    return "prose"


def _sentence(rng: random.Random, vocab: list[str], lo: int = 6, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    words = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, vocab: list[str], n_sent: int | None = None) -> str:
    n = n_sent if n_sent is not None else rng.randint(3, 6)
    return " ".join(_sentence(rng, vocab) for _ in range(n))


def _nav_links(rng: random.Random, vocab: list[str], n: int = 8) -> str:
    return "".join(
        f'<a href="/{vocab[rng.randrange(len(vocab))]}">'
        f"{vocab[rng.randrange(len(vocab))]}</a> "
        for _ in range(n)
    )


# ---------------------------------------------------------------------------
# HTML fixture builders: return (html_str, golden_text)
# ---------------------------------------------------------------------------


def _html_shell(body: str, title: str = "t") -> str:
    return (
        "<!DOCTYPE html><html><head><title>"
        + title
        + '</title><meta charset="utf-8"><style>.x{color:red}</style>'
        + "<script>var x=1;</script></head><body>"
        + body
        + "</body></html>"
    )


def _mk_prose(rng, vocab):
    title = _sentence(rng, vocab, 3, 6)[:-1]
    paras = [_paragraph(rng, vocab) for _ in range(rng.randint(3, 6))]
    body = f"<article><h1>{title}</h1>" + "".join(
        f"<p>{p}</p>" for p in paras
    ) + "</article>"
    golden = "# " + title + "\n\n" + "\n\n".join(paras)
    return _html_shell(body, title), golden


def _mk_boiler(rng, vocab):
    """Nav/footer/sidebar link farms around one article body — the
    boilerplate_heavy class; golden contains only the main content."""
    title = _sentence(rng, vocab, 3, 6)[:-1]
    paras = [_paragraph(rng, vocab) for _ in range(rng.randint(3, 5))]
    nav = f"<nav>{_nav_links(rng, vocab, 10)}</nav>"
    sidebar = f"<aside><ul>" + "".join(
        f'<li><a href="/x">{vocab[rng.randrange(len(vocab))]}</a></li>'
        for _ in range(6)
    ) + "</ul></aside>"
    footer = (
        f"<footer><p>{_nav_links(rng, vocab, 6)}copyright 2026</p></footer>"
    )
    header = f"<header>{_nav_links(rng, vocab, 5)}</header>"
    body = (
        header + nav
        + f"<div id=main><h1>{title}</h1>"
        + "".join(f"<p>{p}</p>" for p in paras)
        + "</div>" + sidebar + footer
    )
    golden = "# " + title + "\n\n" + "\n\n".join(paras)
    return _html_shell(body, title), golden


def _mk_table(rng, vocab):
    title = _sentence(rng, vocab, 3, 5)[:-1]
    intro = _paragraph(rng, vocab)
    ncols = rng.randint(2, 4)
    nrows = rng.randint(2, 5)
    header = [vocab[rng.randrange(len(vocab))] for _ in range(ncols)]
    rows = [
        [str(rng.randint(1, 999)) for _ in range(ncols)] for _ in range(nrows)
    ]
    outro = _paragraph(rng, vocab)
    tbl_html = (
        "<table><tr>" + "".join(f"<th>{h}</th>" for h in header) + "</tr>"
        + "".join(
            "<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in rows
        )
        + "</table>"
    )
    body = (
        f"<h1>{title}</h1><p>{intro}</p>" + tbl_html + f"<p>{outro}</p>"
    )
    md = ["| " + " | ".join(header) + " |",
          "| " + " | ".join("---" for _ in header) + " |"]
    md += ["| " + " | ".join(r) + " |" for r in rows]
    golden = "# " + title + "\n\n" + intro + "\n\n" + "\n".join(md) + "\n\n" + outro
    return _html_shell(body, title), golden


def _mk_headings(rng, vocab):
    title = _sentence(rng, vocab, 3, 5)[:-1]
    parts_html = [f"<h1>{title}</h1>"]
    parts_md = ["# " + title]
    for _ in range(rng.randint(2, 4)):
        h2 = _sentence(rng, vocab, 2, 4)[:-1]
        para = _paragraph(rng, vocab)
        items = [_sentence(rng, vocab, 4, 8) for _ in range(rng.randint(2, 4))]
        parts_html.append(
            f"<h2>{h2}</h2><p>{para}</p><ul>"
            + "".join(f"<li>{i}</li>" for i in items) + "</ul>"
        )
        parts_md.append("## " + h2)
        parts_md.append(para)
        parts_md.extend("- " + i for i in items)
    return _html_shell("".join(parts_html), title), "\n\n".join(parts_md)


def _mk_sparse(rng, vocab):
    """Title-only page (<15 words): NOT born-digital, golden empty-ish."""
    title = _sentence(rng, vocab, 2, 3)[:-1]
    body = f"<h1>{title}</h1>"
    # Layout kernel still extracts the heading; golden is that heading.
    return _html_shell(body, title), "# " + title


def _mk_garbage(rng, vocab):
    """Single-char 'words' (garbage_ocr analog)."""
    chars = " ".join(rng.choice("abcdefghij") for _ in range(120))
    body = f"<p>{chars}</p>"
    return _html_shell(body), chars


def _mk_spaced(rng, vocab):
    words = [vocab[rng.randrange(len(vocab))] for _ in range(30)]
    spaced = "   ".join(" ".join(w) for w in words)
    body = f"<p>{spaced}</p>"
    # collapse_ws collapses runs to single spaces in the kernel output
    collapsed = " ".join(" ".join(w) for w in words)
    return _html_shell(body), collapsed


def _mk_cid(rng, vocab):
    base = _paragraph(rng, vocab, 3)
    toks = base.split()
    for i in range(0, len(toks), 4):
        toks[i] = f"(cid:{rng.randint(1, 500)})"
    txt = " ".join(toks)
    body = f"<p>{txt}</p>"
    return _html_shell(body), txt


def _mk_links(rng, vocab):
    """Pure link farm: layout variant drops everything -> golden empty."""
    body = f"<div>{_nav_links(rng, vocab, 30)}</div>"
    return _html_shell(body), ""


def _mk_images(rng, vocab):
    title = _sentence(rng, vocab, 3, 5)[:-1]
    paras = [_paragraph(rng, vocab) for _ in range(2)]
    body = (
        f"<h1>{title}</h1><p>{paras[0]}</p>"
        '<img src="fig1.png" alt="figure one">'
        f"<p>{paras[1]}</p>"
        '<img src="https://cdn.example.com/logo.png" alt="logo">'
    )
    golden = "# " + title + "\n\n" + paras[0] + "\n\n" + paras[1]
    return _html_shell(body, title), golden


def _mk_big_html(rng, vocab):
    """Oversized blob (>=1 MB) for size-bucketing."""
    title = _sentence(rng, vocab, 3, 5)[:-1]
    paras = []
    size = 0
    while size < (1 << 20) + (1 << 17):  # ~1.1 MB of body text
        p = _paragraph(rng, vocab, 8)
        paras.append(p)
        size += len(p.encode("utf-8")) + 7
    body = f"<h1>{title}</h1>" + "".join(f"<p>{p}</p>" for p in paras)
    golden = "# " + title + "\n\n" + "\n\n".join(paras)
    return _html_shell(body, title), golden


def _mk_empty(rng, vocab):
    return _html_shell("<div></div>"), ""


# ---------------------------------------------------------------------------
# Minimal deterministic PDF writer (classic xref, Flate content streams)
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(
    pages: list[list[tuple[float, float, str]]],
    fonts: list[str] | None = None,
    page_width: float = 612,
    page_height: float = 792,
    raw_page_prefix: list[str] | None = None,
    image_pages: list[bool] | None = None,
    image_placements: list[str | None] | None = None,
    image_streams: list[bytes | None] | None = None,
) -> bytes:
    """Write a minimal PDF.  ``pages`` = per page a list of (x, y, text)
    line placements; ``fonts`` = BaseFont names (F1 is used for all text;
    extra fonts only land in /Resources for the math-font signal);
    ``raw_page_prefix`` = optional raw content-stream ops prepended per
    page (one string per page; used to plant drawing/figure operators);
    ``image_pages`` = per-page flag painting a full-page image XObject
    (scanned-page analog: a page can be image-only by passing [] for its
    text placements); ``image_placements`` = per-page override of the
    default image placement op (raw content-stream string painting
    ``/Im1``; only applies to pages flagged in ``image_pages``);
    ``image_streams`` = per-page raw image-stream bytes (pages with a
    custom stream get their OWN image XObject — the raster-recovery
    fixtures embed a deterministic scan payload per page; pages without
    one share the default 8x8 raster)."""
    fonts = fonts or ["Helvetica"]
    objects: list[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)  # 1-indexed object number

    font_ids = [
        add(
            f"<< /Type /Font /Subtype /Type1 /BaseFont /{name} >>".encode(
                "latin-1"
            )
        )
        for name in fonts
    ]
    font_res = " ".join(
        f"/F{i+1} {oid} 0 R" for i, oid in enumerate(font_ids)
    )

    def add_image(pix: bytes) -> int:
        return add(
            (
                "<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
                "/ColorSpace /DeviceGray /BitsPerComponent 8 "
                f"/Length {len(pix)} /Filter /FlateDecode >>"
            ).encode("latin-1")
            + b"\nstream\n" + pix + b"\nendstream"
        )

    image_id = None
    page_image_ids: dict[int, int] = {}
    if image_pages and any(image_pages):
        # tiny 8x8 grayscale "scan" raster — the parser only reads the
        # XObject header (Subtype /Image), never the pixels — shared by
        # pages without a custom stream
        image_id = add_image(zlib.compress(bytes(range(0, 256, 4))))
        if image_streams:
            for i, stream in enumerate(image_streams):
                if stream is not None and image_pages and i < len(image_pages) \
                        and image_pages[i]:
                    page_image_ids[i] = add_image(stream)

    page_ids = []
    content_ids = []
    for page_idx, lines in enumerate(pages):
        has_image = bool(image_pages and page_idx < len(image_pages)
                         and image_pages[page_idx])
        ops = []
        if raw_page_prefix and page_idx < len(raw_page_prefix):
            ops.append(raw_page_prefix[page_idx])
        if has_image:
            placement = (
                image_placements[page_idx]
                if image_placements and page_idx < len(image_placements)
                and image_placements[page_idx]
                else "q 468 0 0 648 72 72 cm /Im1 Do Q"
            )
            # paint the "scan" across the content area (or as placed)
            ops.append(placement)
        ops += ["BT", "/F1 12 Tf", "14 TL"]
        for x, y, text in lines:
            ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm")
            ops.append(f"({_pdf_escape(text)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        comp = zlib.compress(stream)
        cid = add(
            f"<< /Length {len(comp)} /Filter /FlateDecode >>".encode("latin-1")
            + b"\nstream\n" + comp + b"\nendstream"
        )
        content_ids.append(cid)
        page_ids.append(None)  # placeholder, filled after Pages object

    pages_id_placeholder = len(objects) + len(pages) + 1
    for i, cid in enumerate(content_ids):
        has_image = bool(image_pages and i < len(image_pages) and image_pages[i])
        img_oid = page_image_ids.get(i, image_id)
        xobj_res = (
            f"/XObject << /Im1 {img_oid} 0 R >> " if has_image and img_oid else ""
        )
        pid = add(
            (
                f"<< /Type /Page /Parent {pages_id_placeholder} 0 R "
                f"/MediaBox [0 0 {page_width:.0f} {page_height:.0f}] "
                f"/Resources << /Font << {font_res} >> {xobj_res}>> "
                f"/Contents {cid} 0 R >>"
            ).encode("latin-1")
        )
        page_ids[i] = pid

    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    pages_id = add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode(
            "latin-1"
        )
    )
    assert pages_id == pages_id_placeholder
    catalog_id = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode("latin-1"))

    # Serialize with a classic xref table.
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode("latin-1") + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects)+1}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode("latin-1")
    out += (
        f"trailer\n<< /Size {len(objects)+1} /Root {catalog_id} 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode("latin-1")
    return bytes(out)


def _pdf_page_lines(
    rng: random.Random,
    vocab: list[str],
    n_paras: int = 3,
    x: float = 72.0,
    top: float = 720.0,
    leading: float = 14.0,
    para_gap: float = 28.0,
    min_words_per_line: int = 5,
    max_words_per_line: int = 9,
) -> tuple[list[tuple[float, float, str]], str]:
    """Build one page's line placements + its golden text."""
    placements: list[tuple[float, float, str]] = []
    paras_text: list[str] = []
    y = top
    for _ in range(n_paras):
        para_lines = []
        for _ in range(rng.randint(2, 4)):
            line = " ".join(
                vocab[rng.randrange(len(vocab))]
                for _ in range(rng.randint(min_words_per_line, max_words_per_line))
            )
            para_lines.append(line)
            placements.append((x, y, line))
            y -= leading
        paras_text.append("\n".join(para_lines))
        y -= para_gap - leading
    return placements, "\n\n".join(paras_text)


def _mk_pdf_prose(rng, vocab):
    n_pages = rng.randint(1, 3)
    pages = []
    page_golden = []
    for _ in range(n_pages):
        placements, golden = _pdf_page_lines(rng, vocab, rng.randint(2, 4))
        pages.append(placements)
        page_golden.append(golden)
    return build_pdf(pages), PAGE_SEP.join(page_golden)


def _mk_pdf_multicol(rng, vocab):
    """Two-column page: golden is left column then right column.

    Narrow lines (2-3 words) keep each column inside its half of the page
    so the x-gap between columns stays above the segment-split threshold.
    """
    left, lg = _pdf_page_lines(
        rng, vocab, 2, x=72.0, min_words_per_line=2, max_words_per_line=3
    )
    right, rg = _pdf_page_lines(
        rng, vocab, 2, x=340.0, min_words_per_line=2, max_words_per_line=3
    )
    return build_pdf([left + right]), lg + "\n\n" + rg


def _mk_pdf_table(rng, vocab):
    """Ruled-grid table page (P9 structural detection + P14 structured
    extraction in the PRODUCTION path, round 4; reference
    born_digital.py:369-372 routes find_tables pages through
    extract_structured).  The golden is constructed independently from
    the known cell matrix: prose paragraph above the grid, then the P15
    markdown rendering of the cells (header row first)."""
    from smart_ocr_spark.kernel.html_extract import table_to_markdown

    def words(n):
        return " ".join(vocab[rng.randrange(len(vocab))] for _ in range(n))

    x_rules = [100.0, 220.0, 340.0, 460.0]
    y_rules = [500.0, 540.0, 580.0, 620.0]
    ops = []
    for y in y_rules:
        ops.append(f"{x_rules[0]:.0f} {y:.0f} m {x_rules[-1]:.0f} {y:.0f} l S")
    for x in x_rules:
        ops.append(f"{x:.0f} {y_rules[0]:.0f} m {x:.0f} {y_rules[-1]:.0f} l S")

    # 3x3 cells, filled-in words keep the whole doc over the 50-word
    # audit floor so the structured attempt passes first_passing
    cells = [[words(rng.randint(4, 6)) for _ in range(3)] for _ in range(3)]
    placements = [(72.0, 700.0, words(rng.randint(8, 12)))]
    prose = placements[0][2]
    # rows top-down: header at the top band (y between 580 and 620)
    for ri, y in enumerate((595.0, 555.0, 515.0)):
        for ci, x in enumerate((105.0, 225.0, 345.0)):
            placements.append((x, y, cells[ri][ci]))
    pdf = build_pdf([placements], raw_page_prefix=[" ".join(ops)])
    golden = prose + "\n\n" + table_to_markdown(cells)
    return pdf, golden


def _mk_pdf_math(rng, vocab):
    placements, golden = _pdf_page_lines(rng, vocab, 2)
    pdf = build_pdf([placements], fonts=["Helvetica", "CMMI10", "CMSY10"])
    return pdf, golden


def _mk_pdf_sparse(rng, vocab):
    line = " ".join(vocab[rng.randrange(len(vocab))] for _ in range(3))
    return build_pdf([[(72.0, 720.0, line)]]), line


def _mk_pdf_scanned(rng, vocab):
    """Rasterized-scan analog (reference benchmark/rasterize.py:17-80,
    category ``scanned``, dataset.py:20): image-only pages with NO text
    layer.  The pipeline must classify is_born_digital=false and route
    to the raster-recovery tier (``kernel/raster.py``).

    Half the scans are RECOVERABLE: their image streams carry the
    deterministic synthetic-scan payload (what the rendered pixels
    would spell to an OCR model), so the ``raster`` repair variant
    recovers the golden text and the doc lands in ``success`` with a
    raster attempt row.  The other half have raw pixels only — the
    honest no-backend answer is "" and they land in ``failed_scanned``
    (never an empty-text 'success')."""
    from smart_ocr_spark.kernel.raster import encode_scan_text

    recoverable = rng.random() < 0.5
    if recoverable:
        # >= the 50-word audit floor in total, whatever the page count
        n_pages = rng.randint(2, 3)
        page_texts = [
            " ".join(vocab[rng.randrange(len(vocab))] for _ in range(40))
            for _ in range(n_pages)
        ]
        pdf = build_pdf(
            [[] for _ in range(n_pages)],
            image_pages=[True] * n_pages,
            image_streams=[encode_scan_text(t) for t in page_texts],
        )
        # reference state.py:148 page separator — what the recovery
        # variant assembles (kernel/raster.extract_payload_raster)
        return pdf, "\n\n---\n\n".join(page_texts)
    n_pages = rng.randint(1, 3)
    pdf = build_pdf([[] for _ in range(n_pages)],
                    image_pages=[True] * n_pages)
    return pdf, ""


def _mk_pdf_long(rng, vocab):
    """>30 pages -> exercises the chunk fan-out path."""
    n_pages = rng.randint(32, 40)
    pages, page_golden = [], []
    for _ in range(n_pages):
        placements, golden = _pdf_page_lines(rng, vocab, 2)
        pages.append(placements)
        page_golden.append(golden)
    return build_pdf(pages), PAGE_SEP.join(page_golden)


_HTML_BUILDERS = {
    "prose": _mk_prose,
    "boiler": _mk_boiler,
    "table": _mk_table,
    "headings": _mk_headings,
    "sparse": _mk_sparse,
    "garbage": _mk_garbage,
    "spaced": _mk_spaced,
    "cid": _mk_cid,
    "links": _mk_links,
    "images": _mk_images,
    "big_html": _mk_big_html,
    "empty": _mk_empty,
}
_PDF_BUILDERS = {
    "pdf_prose": _mk_pdf_prose,
    "pdf_table": _mk_pdf_table,
    "pdf_multicol": _mk_pdf_multicol,
    "pdf_math": _mk_pdf_math,
    "pdf_sparse": _mk_pdf_sparse,
    "pdf_long": _mk_pdf_long,
    "pdf_scanned": _mk_pdf_scanned,
}


def make_rows(n_docs: int, seed: int = 42) -> list[dict]:
    """Generate ``n_docs`` corpus rows (deterministic for a given seed)."""
    rows = []
    for i in range(n_docs):
        rng = random.Random((seed << 20) ^ i)
        cls = _pick_class(rng)
        lang = _LANGS[rng.randrange(len(_LANGS))]
        vocab = _VOCAB[lang]
        host = _HOSTS[rng.randrange(len(_HOSTS))]
        url = f"https://{host}/{cls}/{i:07d}"
        if cls in _PDF_BUILDERS:
            # PDF literal strings are latin-1; CJK vocab falls back to en.
            payload, golden = _PDF_BUILDERS[cls](
                rng, vocab if lang != "zh" else _VOCAB["en"]
            )
        else:
            html_str, golden = _HTML_BUILDERS[cls](rng, vocab)
            payload = html_str.encode("utf-8")
        rows.append(
            {
                "url": url,
                "warc_ts": EPOCH + dt.timedelta(seconds=i * 17),
                "html": payload,
                "text": golden,
                "lang": lang,
            }
        )
    return rows


def corpus_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Synthetic corpus as a Spark DataFrame with the input_hint schema.

    Rows are generated ON THE EXECUTORS from (seed, index) via a range +
    mapInPandas, so a 10^5-row bench corpus never materializes on the
    driver — the same pattern scales to arbitrarily large synthetic inputs.
    """
    from pyspark.sql import functions as F  # noqa: N812
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )

    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            out = []
            for i in pdf["id"]:
                rng = random.Random((seed << 20) ^ int(i))
                cls = _pick_class(rng)
                lang = _LANGS[rng.randrange(len(_LANGS))]
                vocab = _VOCAB[lang]
                host = _HOSTS[rng.randrange(len(_HOSTS))]
                if cls in _PDF_BUILDERS:
                    payload, golden = _PDF_BUILDERS[cls](
                        rng, vocab if lang != "zh" else _VOCAB["en"]
                    )
                else:
                    html_str, golden = _HTML_BUILDERS[cls](rng, vocab)
                    payload = html_str.encode("utf-8")
                out.append(
                    (
                        f"https://{host}/{cls}/{int(i):07d}",
                        EPOCH + dt.timedelta(seconds=int(i) * 17),
                        payload,
                        golden,
                        lang,
                    )
                )
            yield pd.DataFrame(
                out, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    n_part = partitions or max(8, n_docs // 2000)
    return (
        spark.range(0, n_docs, numPartitions=n_part)
        .mapInPandas(gen, schema=schema)
    )
