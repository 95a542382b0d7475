"""From-scratch HTML main-content extraction.

Hand-rolled per the north rule: tokenizer -> DOM tree -> block segmentation
-> text-density / link-density boilerplate classification (Boilerpipe /
trafilatura-style heuristics re-derived from densitometric features, not
wrapped) -> markdown-ish text with tables rendered using the reference's
table->markdown rules (``src/socr/core/born_digital.py:593-642``: pad ragged
rows, header row, ``---`` separator, data rows) and prose/table interleaving
in document order (the analog of ``born_digital.py:512-591``).

Pure Python, deterministic, no external parsers.  Runs inside Arrow-batch
UDFs on executors; unit-tested standalone.

The extractor has two kernel variants (the Spark-side replacement for the
reference's multiple OCR "engines", ``src/socr/engines/*``):

  * ``layout``  — boilerplate-stripped main content with markdown structure
                  (headings, lists, tables).  The flagship variant.
  * ``basic``   — plain text of all non-script blocks, no boilerplate strip,
                  no markdown (the cheap tier for EASY pages; analog of the
                  reference's local engines / ``page.get_text("text")``).
  * ``density`` — like ``layout`` but with a stricter link-density threshold
                  (drops more aggressively; the repair-tier variant).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
RAW_TEXT_ELEMENTS = frozenset({"script", "style", "noscript", "textarea", "svg"})

# Elements that start a new block when encountered.
BLOCK_ELEMENTS = frozenset(
    "address article aside blockquote body details dialog dd div dl dt "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup "
    "hr li main nav ol p pre section table td th tr ul caption thead tbody "
    "tfoot title".split()
)

# Subtrees that are boilerplate by construction (structural signal).
BOILERPLATE_CONTAINERS = frozenset({"nav", "footer", "aside", "header", "form"})

_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
    "mdash": "—",
    "ndash": "–",
    "hellip": "…",
    "lsquo": "‘",
    "rsquo": "’",
    "ldquo": "“",
    "rdquo": "”",
    "copy": "©",
    "reg": "®",
    "trade": "™",
    "deg": "°",
    "middot": "·",
    "bull": "•",
    "laquo": "«",
    "raquo": "»",
    "times": "×",
    "divide": "÷",
    "plusmn": "±",
    "frac12": "½",
    "sup2": "²",
    "sup3": "³",
    "eacute": "é",
    "egrave": "è",
    "agrave": "à",
    "ccedil": "ç",
    "uuml": "ü",
    "ouml": "ö",
    "auml": "ä",
    "szlig": "ß",
    "ntilde": "ñ",
    "iacute": "í",
    "oacute": "ó",
    "uacute": "ú",
    "aacute": "á",
}

_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]{1,30});")


def decode_entities(text: str) -> str:
    """Decode numeric and the common named HTML entities."""
    if "&" not in text:  # the entity pattern cannot match without one
        return text

    def _sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#"):
            try:
                cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
            except ValueError:
                return m.group(0)
            if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
                return chr(cp)
            return "�"
        return _ENTITIES.get(body, _ENTITIES.get(body.lower(), m.group(0)))

    return _ENTITY_RE.sub(_sub, text)


@dataclass(slots=True)
class Node:
    """Minimal DOM node. ``tag`` is None for text nodes."""

    tag: str | None
    attrs: dict[str, str] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)
    text: str = ""
    parent: "Node | None" = None


_TAG_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:-]*")
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)

# Elements auto-closed by an opening tag of the same group (HTML5-ish).
_AUTOCLOSE = {
    "p": {"p"},
    "li": {"li"},
    # a new row (or section) implicitly closes the open cell AND the open
    # row — omitting </td>/</tr> is valid HTML5; without this, every
    # following row nests inside the previous cell and the grid collapses
    "tr": {"tr", "thead", "tbody", "tfoot"},
    "td": {"td", "th", "tr", "thead", "tbody", "tfoot"},
    "th": {"td", "th", "tr", "thead", "tbody", "tfoot"},
    "dd": {"dd", "dt"},
    "dt": {"dd", "dt"},
    "option": {"option"},
    "thead": {"tbody", "tfoot"},
    "tbody": {"tbody", "tfoot"},
}


def _find_tag_end(html: str, pos: int) -> int:
    """Index of the unquoted '>' closing the tag starting before ``pos``,
    or -1.  A '>' inside a quoted attribute value (alt="a > b") must not
    end the tag — taking the first raw '>' injects the attribute tail
    into extracted text as literal markup."""
    n = len(html)
    # Fast path: if no quote char occurs before the next '>', that '>'
    # cannot be inside a quoted value — skip the per-char scan (most
    # tags have unquoted or no attributes).
    gt = html.find(">", pos)
    if gt == -1:
        return -1
    seg = html[pos:gt]
    if '"' not in seg and "'" not in seg:
        return gt
    quote = ""
    prev = ""  # last non-whitespace char outside a quote
    while pos < n:
        c = html[pos]
        if quote:
            if c == quote:
                quote = ""
                prev = c
        elif c in "\"'":
            # HTML5: a quote only opens a quoted attribute VALUE when it
            # follows '=' (optionally after whitespace).  A quote char
            # inside an unquoted value (<a title=John's href=x>) is part
            # of the value — treating it as an opener would hunt for a
            # match past '>', return -1, and silently drop the rest of
            # the document's text.
            if prev == "=":
                quote = c
            prev = c
        elif c == ">":
            return pos
        elif not c.isspace():
            prev = c
        pos += 1
    return -1


def parse_html(html: str) -> Node:
    """Tokenize + build a DOM tree. Tolerant of malformed markup."""
    html_lower = html.lower()  # one pass; raw-text scans reuse it
    root = Node(tag="#root")
    stack = [root]
    i = 0
    n = len(html)

    def _open_tags() -> set[str]:
        return {nd.tag for nd in stack if nd.tag}

    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            _append_text(stack[-1], html[i:])
            break
        if lt > i:
            _append_text(stack[-1], html[i:lt])
        # One-char dispatch (startswith per candidate costs ~4 probes/tag)
        nxt = html[lt + 1] if lt + 1 < n else ""
        if nxt in "!?":
            # Comment
            if nxt == "!" and html.startswith("<!--", lt):
                end = html.find("-->", lt + 4)
                i = n if end == -1 else end + 3
                continue
            # Doctype / CDATA / other declarations
            end = html.find(">", lt)
            i = n if end == -1 else end + 1
            continue
        # Closing tag
        if nxt == "/":
            end = html.find(">", lt)
            if end == -1:
                break
            name = html[lt + 2 : end].strip().lower()
            # Pop to the matching open element if present.
            for depth in range(len(stack) - 1, 0, -1):
                if stack[depth].tag == name:
                    del stack[depth:]
                    break
            i = end + 1
            continue
        # Opening tag
        m = _TAG_NAME_RE.match(html, lt + 1)
        if not m:
            _append_text(stack[-1], "<")
            i = lt + 1
            continue
        name = m.group(0).lower()
        end = _find_tag_end(html, m.end())
        if end == -1:
            break
        attr_str = html[m.end() : end]
        stripped = attr_str.rstrip()
        # a trailing '/' is self-closing ONLY after whitespace, a quote,
        # or the bare tag name: in an unquoted attribute value
        # (href=http://x.com/) the solidus is part of the value (HTML5)
        self_closing = stripped.endswith("/") and (
            len(stripped) == 1 or stripped[-2] in " \t\n\r\f\"'"
        )
        if self_closing:
            attr_str = stripped[:-1]
        attrs = {}
        for am in _ATTR_RE.finditer(attr_str):
            k = am.group(1).lower()
            v = am.group(2) or ""
            if v[:1] in "\"'":
                v = v[1:-1]
            attrs[k] = decode_entities(v)
        i = end + 1

        # Raw-text elements: swallow until the explicit close tag.
        if name in RAW_TEXT_ELEMENTS:
            close = html_lower.find(f"</{name}", i)
            i = n if close == -1 else html.find(">", close) + 1
            if i == 0:
                i = n
            continue

        # Implicit closes (e.g. <p> closes an open <p>).
        while stack[-1].tag in _AUTOCLOSE and name in _AUTOCLOSE[stack[-1].tag]:
            stack.pop()

        node = Node(tag=name, attrs=attrs, parent=stack[-1])
        stack[-1].children.append(node)
        if name not in VOID_ELEMENTS and not self_closing:
            stack.append(node)

    _ = _open_tags  # (kept for debugging hooks)
    return root


def _append_text(parent: Node, raw: str) -> None:
    if raw:
        parent.children.append(Node(tag=None, text=raw, parent=parent))


# ---------------------------------------------------------------------------
# Block segmentation
# ---------------------------------------------------------------------------


@dataclass
class Block:
    """A contiguous run of inline content with densitometric features."""

    kind: str  # 'p', 'h1'..'h6', 'li', 'pre', 'table', 'caption', 'title'
    text: str
    link_chars: int = 0
    total_chars: int = 0
    in_boilerplate_container: bool = False
    depth: int = 0
    table_rows: list[list[str]] | None = None

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0

    @property
    def word_count(self) -> int:
        return len(self.text.split())


_WS_RE = re.compile(r"[ \t\r\n\f\v ]+")


def _collapse_ws(s: str) -> str:
    # Fast path: when none of the collapsible characters is present and
    # no run of two spaces exists, the sub is the identity — and since
    # plain spaces are then the only whitespace in s, strip() is exact.
    # Text nodes are the hottest call site (~180 calls/doc) and most are
    # already clean, so seven C-level membership probes beat one regex
    # sub; the fallback is byte-identical to the old path.
    if (
        "\t" not in s
        and "\n" not in s
        and "\r" not in s
        and "\f" not in s
        and "\v" not in s
        and "\xa0" not in s
        and "  " not in s
    ):
        return s.strip()
    return _WS_RE.sub(" ", s).strip()


_HEADING_TAGS = {"h1": "h1", "h2": "h2", "h3": "h3", "h4": "h4", "h5": "h5", "h6": "h6"}


def segment_blocks(root: Node) -> list[Block]:
    """Walk the DOM emitting Blocks in document order."""
    blocks: list[Block] = []

    def flush_partial(sink: list | None, in_boiler: bool, depth: int) -> None:
        """Emit the enclosing block's text accumulated SO FAR before a
        nested block element, preserving reading order ("intro <p>x</p>
        tail" must emit intro, x, tail — not x, intro+tail)."""
        if sink is None:
            return
        text = _collapse_ws("".join(sink[0]))
        if text:
            blocks.append(
                Block(
                    kind="p",
                    text=text,
                    link_chars=sink[1],
                    total_chars=sink[2],
                    in_boilerplate_container=in_boiler,
                    depth=depth,
                )
            )
        sink[0].clear()
        sink[1] = 0
        sink[2] = 0

    def walk(
        node: Node,
        in_boiler: bool,
        in_link: bool,
        depth: int,
        sink: list | None,
    ) -> None:
        """``sink`` is the [text_parts, link_chars, total_chars] accumulator
        of the enclosing block, or None between blocks."""
        for child in node.children:
            if child.tag is None:
                txt = decode_entities(child.text)
                collapsed = _collapse_ws(txt)
                if not collapsed:
                    continue
                if sink is None:
                    # Stray text outside any block container: own paragraph.
                    b = Block(
                        kind="p",
                        text=collapsed,
                        link_chars=len(collapsed) if in_link else 0,
                        total_chars=len(collapsed),
                        in_boilerplate_container=in_boiler,
                        depth=depth,
                    )
                    blocks.append(b)
                else:
                    sink[0].append(txt)
                    if in_link:
                        sink[1] += len(collapsed)
                    sink[2] += len(collapsed)
                continue

            tag = child.tag
            if tag == "title":
                # Document metadata, never main content.
                continue
            boiler = in_boiler or tag in BOILERPLATE_CONTAINERS
            link = in_link or tag == "a"

            if tag == "table":
                flush_partial(sink, in_boiler, depth)
                for sub in child.children:
                    if sub.tag == "caption":
                        cap = _collapse_ws(_inline_text(sub))
                        if cap:
                            blocks.append(
                                Block(
                                    kind="caption",
                                    text=cap,
                                    total_chars=len(cap),
                                    in_boilerplate_container=boiler,
                                    depth=depth,
                                )
                            )
                rows = _extract_table(child)
                if rows:
                    flat = " ".join(c for r in rows for c in r if c)
                    blocks.append(
                        Block(
                            kind="table",
                            text=flat,
                            total_chars=len(flat),
                            in_boilerplate_container=boiler,
                            depth=depth,
                            table_rows=rows,
                        )
                    )
                continue

            if tag == "br":
                if sink is not None:
                    sink[0].append("\n")
                continue

            if tag in BLOCK_ELEMENTS:
                flush_partial(sink, in_boiler, depth)
                kind = _HEADING_TAGS.get(tag) or (
                    tag if tag in ("li", "pre", "title", "caption") else "p"
                )
                inner: list = [[], 0, 0]
                walk(child, boiler, link, depth + 1, inner)
                # text nodes were entity-decoded when appended to the
                # sink; decoding again here corrupted escaped markup
                # ("&amp;lt;" must render as "&lt;", not "<")
                text = _collapse_ws("".join(inner[0]))
                if tag == "pre":
                    text = "".join(inner[0]).strip("\n")
                if text:
                    blocks.append(
                        Block(
                            kind=kind,
                            text=text,
                            link_chars=inner[1],
                            total_chars=inner[2],
                            in_boilerplate_container=boiler,
                            depth=depth,
                        )
                    )
                continue

            # Inline element: recurse into the same sink.
            walk(child, boiler, link, depth, sink)

    walk(root, False, False, 0, None)
    return blocks


def _extract_table(table_node: Node) -> list[list[str]]:
    """Collect a table's cell grid in document order."""
    rows: list[list[str]] = []

    def find_rows(node: Node) -> None:
        for child in node.children:
            if child.tag == "tr":
                cells: list[str] = []
                for cell in child.children:
                    if cell.tag in ("td", "th"):
                        cells.append(_collapse_ws(_inline_text(cell)))
                rows.append(cells)
            elif child.tag in ("thead", "tbody", "tfoot", "table"):
                find_rows(child)

    find_rows(table_node)
    return [r for r in rows if any(c for c in r)]


def _inline_text(node: Node) -> str:
    parts: list[str] = []

    def rec(nd: Node) -> None:
        for c in nd.children:
            if c.tag is None:
                parts.append(decode_entities(c.text))
            elif c.tag == "br":
                parts.append(" ")
            elif c.tag not in RAW_TEXT_ELEMENTS:
                rec(c)

    rec(node)
    return "".join(parts)


# ---------------------------------------------------------------------------
# Boilerplate classification (densitometric, re-derived)
# ---------------------------------------------------------------------------

# Thresholds re-derived from the densitometric-classification literature
# (text density / link density features a la Boilerpipe's NumWordsRules):
# short, link-heavy blocks are navigation; long low-link blocks are content.
LINK_DENSITY_MAX = {"layout": 0.333, "density": 0.20, "basic": 1.01}
SHORT_BLOCK_WORDS = 10  # blocks shorter than this need contentful neighbors
CONTENT_BLOCK_WORDS = 25  # blocks at/above this are content unless link-heavy


def classify_blocks(blocks: list[Block], variant: str = "layout") -> list[bool]:
    """Return keep/drop per block.

    Rules (in order):
      1. ``basic`` keeps everything except empty blocks.
      2. Blocks inside nav/footer/aside/header/form containers are dropped.
      3. Tables and headings/captions/titles are kept (structure carriers).
      4. link_density > threshold -> drop.
      5. Long blocks (>= CONTENT_BLOCK_WORDS words) -> keep.
      6. Short blocks are kept only when adjacent to a kept long block
         (Boilerpipe-style neighborhood smoothing).
    """
    if variant == "basic":
        return [True] * len(blocks)

    ld_max = LINK_DENSITY_MAX.get(variant, 0.333)
    provisional: list[int] = []  # 1 keep, 0 drop, -1 undecided-short
    for b in blocks:
        if b.in_boilerplate_container:
            provisional.append(0)
        elif b.kind == "table":
            provisional.append(1)
        elif b.kind in ("h1", "h2", "h3", "h4", "h5", "h6", "li", "caption",
                        "pre"):
            # Structure carriers: kept unless link-heavy (nav lists etc.).
            provisional.append(0 if b.link_density > ld_max else 1)
        elif b.link_density > ld_max:
            provisional.append(0)
        elif b.word_count >= CONTENT_BLOCK_WORDS:
            provisional.append(1)
        else:
            # every sub-threshold block (tiny or medium) is smoothing-
            # undecided: kept next to solid content, or outright when the
            # page has no solid content at all (lone-block safeguard)
            provisional.append(-1)

    # Neighborhood smoothing: undecided shorts survive next to solid content.
    # When the page has no solid content at all, undecided blocks survive
    # outright — a lone medium block (e.g. a broken-OCR paragraph) must reach
    # the audit stage rather than vanish at extraction.
    any_solid = any(p == 1 for p in provisional)
    keep: list[bool] = []
    n = len(blocks)
    for idx, p in enumerate(provisional):
        if p == 1:
            keep.append(True)
        elif p == 0:
            keep.append(False)
        elif not any_solid:
            keep.append(True)
        else:
            prev_solid = idx > 0 and provisional[idx - 1] == 1
            next_solid = idx + 1 < n and provisional[idx + 1] == 1
            keep.append(prev_solid or next_solid)
    return keep


# ---------------------------------------------------------------------------
# Rendering (markdown-ish assembly)
# ---------------------------------------------------------------------------


def table_to_markdown(rows: list[list[str]]) -> str:
    """Reference table->markdown rules (born_digital.py:593-642):
    pad ragged rows to the max column count; first row is the header;
    ``---`` separator; remaining rows are data."""
    if not rows:
        return ""
    cleaned = [[(c.strip() if isinstance(c, str) else "") for c in r] for r in rows]
    col_count = max(len(r) for r in cleaned)
    for r in cleaned:
        while len(r) < col_count:
            r.append("")
    lines = ["| " + " | ".join(cleaned[0]) + " |"]
    lines.append("| " + " | ".join("---" for _ in cleaned[0]) + " |")
    for r in cleaned[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


_HEADING_PREFIX = {
    "h1": "# ",
    "h2": "## ",
    "h3": "### ",
    "h4": "#### ",
    "h5": "##### ",
    "h6": "###### ",
}


def render_blocks(blocks: list[Block], keep: list[bool], variant: str) -> str:
    """Assemble kept blocks into markdown-ish text, in document order.

    Tables are interleaved at their positions (the analog of the reference's
    prose/table interleave, born_digital.py:540-591).
    """
    parts: list[str] = []
    for b, k in zip(blocks, keep):
        if not k:
            continue
        if b.kind == "table" and variant != "basic":
            md = table_to_markdown(b.table_rows or [])
            if md:
                parts.append(md)
        elif b.kind in _HEADING_PREFIX and variant != "basic":
            parts.append(_HEADING_PREFIX[b.kind] + b.text)
        elif b.kind == "li" and variant != "basic":
            parts.append("- " + b.text)
        elif b.kind == "pre" and variant != "basic":
            parts.append(b.text)
        else:
            parts.append(b.text)
    return "\n\n".join(parts)


# ---------------------------------------------------------------------------
# Signals (the born-digital/difficulty analog for HTML payloads)
# ---------------------------------------------------------------------------


def page_signals(blocks: list[Block], html: str) -> dict:
    """Structural signals used by routing (SURVEY.md §2.2 P7-P12 analogs)."""
    n_tables = sum(1 for b in blocks if b.kind == "table")
    n_headings = sum(1 for b in blocks if b.kind in _HEADING_PREFIX)
    n_lists = sum(1 for b in blocks if b.kind == "li")
    total_chars = sum(b.total_chars for b in blocks)
    link_chars = sum(b.link_chars for b in blocks)
    from smart_ocr_spark.kernel.assess import detect_latex_equations

    has_equations = detect_latex_equations(html)
    n_images = len(re.findall(r"<img\b", html, re.IGNORECASE))
    return {
        "n_blocks": len(blocks),
        "n_tables": n_tables,
        "n_headings": n_headings,
        "n_lists": n_lists,
        "total_chars": total_chars,
        "link_density": (link_chars / total_chars) if total_chars else 0.0,
        "has_tables": n_tables > 0,
        "has_equations": has_equations,
        "has_figures": n_images > 0,
        "n_images": n_images,
    }


def extract_html(html: str, variant: str = "layout") -> tuple[str, dict]:
    """Full kernel: parse -> segment -> classify -> render.

    Returns (text, signals).  Deterministic; exceptions must be caught by
    the caller (the Arrow-batch wrapper maps them to failure_mode rows).
    """
    root = parse_html(html)
    blocks = segment_blocks(root)
    keep = classify_blocks(blocks, variant)
    text = render_blocks(blocks, keep, variant)
    signals = page_signals(blocks, html)
    return text, signals
