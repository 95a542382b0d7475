"""From-scratch pure-Python PDF text extraction.

Replaces the reference's PyMuPDF + cloud-OCR path with an in-process parser
(north rule: no external CLIs, no per-row Python at the Spark layer):

  * xref table + trailer walk (classic cross-reference tables),
  * object parser (dicts, arrays, names, strings, numbers, references),
  * stream decode (FlateDecode via stdlib zlib; identity),
  * per-page content-stream tokenizer covering the text operators
    BT/ET, Tf, Td, TD, Tm, T*, TL, Tj, TJ, ' and ",
  * font table walk for the math-font signal
    (reference ``src/socr/core/born_digital.py:31-36,449-475``),
  * layout-aware line/paragraph reconstruction: text runs are grouped into
    lines by baseline y, lines sorted top-to-bottom, runs left-to-right;
    column split re-derives ``src/socr/core/difficulty.py:200-231``
    (sorted x-centers, gap > 15% of page width => new column, cap 4).

Supported subset (documented per SURVEY.md §7.3): classic xref tables
(including incremental updates via /Prev), direct & referenced page content
streams, Flate/identity filters, literal (with escapes) and hex strings,
WinAnsi/ASCII text.  Encrypted PDFs, xref streams, and CMap/ToUnicode
subtleties beyond the synthetic corpus raise ``PdfError`` — the Arrow-batch
wrapper maps that to a ``cli_error``-class failure row instead of killing
the task (reference timeout-guard semantics, ``figures/extractor.py:20-45``).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field


class PdfError(ValueError):
    """Unparseable or out-of-subset PDF."""


# ---------------------------------------------------------------------------
# Lexer for PDF objects
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
# name token: run of bytes that are neither PDF whitespace nor delimiters
# (exactly _WS + _DELIM — keep in sync)
_NAME_TOK_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")


def _skip_ws_pos(d: bytes, i: int, n: int) -> int:
    """Position-based whitespace/comment skip shared by the lexer and its
    lookaheads — int indexing, no per-char slice allocation."""
    while i < n:
        c = d[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # '%' comment to EOL
            j = d.find(b"\n", i)
            i = n if j == -1 else j + 1
        else:
            break
    return i


class _Lexer:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        self.pos = _skip_ws_pos(self.data, self.pos, len(self.data))

    def peek(self, k: int = 1) -> bytes:
        return self.data[self.pos : self.pos + k]

    def parse_object(self):
        self.skip_ws()
        d, i = self.data, self.pos
        if i >= len(d):
            raise PdfError("unexpected EOF")
        c = d[i]
        if c == 0x3C:  # '<'
            if d[i + 1 : i + 2] == b"<":
                return self._parse_dict()
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x5B:  # '['
            return self._parse_array()
        if 0x30 <= c <= 0x39 or c in b"+-.":
            return self._parse_number_or_ref()
        if d.startswith(b"true", i):
            self.pos = i + 4
            return True
        if d.startswith(b"false", i):
            self.pos = i + 5
            return False
        if d.startswith(b"null", i):
            self.pos = i + 4
            return None
        raise PdfError(f"unexpected token at {i}: {d[i:i+20]!r}")

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self.skip_ws()
            if self.peek(2) == b">>":
                self.pos += 2
                return out
            key = self._parse_name()
            out[key] = self.parse_object()

    def _parse_array(self) -> list:
        self.pos += 1
        out: list = []
        while True:
            self.skip_ws()
            if self.peek() == b"]":
                self.pos += 1
                return out
            out.append(self.parse_object())

    def _parse_name(self) -> str:
        if self.peek() != b"/":
            raise PdfError("expected name token")
        m = _NAME_TOK_RE.match(self.data, self.pos + 1)
        raw = m.group(0)
        self.pos = m.end()
        # #xx hex escapes in names
        if b"#" in raw:
            raw = re.sub(
                rb"#([0-9a-fA-F]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
            )
        return raw.decode("latin-1")

    def _parse_hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos + 1)
        if end == -1:
            raise PdfError("unterminated hex string")
        hexstr = re.sub(rb"\s", b"", self.data[self.pos + 1 : end])
        if len(hexstr) % 2:
            hexstr += b"0"
        self.pos = end + 1
        return bytes.fromhex(hexstr.decode("ascii"))

    def _parse_literal_string(self) -> bytes:
        d = self.data
        i = self.pos + 1
        depth = 1
        out = bytearray()
        n = len(d)
        while i < n:
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                if i >= n:
                    break
                e = d[i]
                if e == 0x6E:
                    out += b"\n"
                elif e == 0x72:
                    out += b"\r"
                elif e == 0x74:
                    out += b"\t"
                elif e == 0x62:
                    out += b"\b"
                elif e == 0x66:
                    out += b"\f"
                elif e in (0x28, 0x29, 0x5C):
                    out.append(e)
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = [e]
                    for _ in range(2):
                        if i + 1 < n and 0x30 <= d[i + 1] <= 0x37:
                            i += 1
                            oct_digits.append(d[i])
                        else:
                            break
                    out.append(int(bytes(oct_digits), 8) & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    if e == 0x0D and i + 1 < n and d[i + 1] == 0x0A:
                        i += 1
                else:
                    out.append(e)
                i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise PdfError("unterminated literal string")

    def _parse_number_or_ref(self):
        d = self.data
        n = len(d)
        m = _NUM_RE.match(d, self.pos)
        if not m:
            raise PdfError(f"bad number at {self.pos}")
        tok = m.group(0)
        # Lookahead for "gen R" => indirect reference
        j = _skip_ws_pos(d, m.end(), n)
        m2 = _NUM_RE.match(d, j)
        if m2 and b"." not in tok:
            k = _skip_ws_pos(d, m2.end(), n)
            if d[k : k + 1] == b"R":
                self.pos = k + 1
                return Ref(int(tok), int(m2.group(0)))
        self.pos = m.end()
        if b"." in tok:
            return float(tok)
        return int(tok)


@dataclass(frozen=True)
class Ref:
    num: int
    gen: int


# ---------------------------------------------------------------------------
# Document model
# ---------------------------------------------------------------------------


class PdfDocument:
    """Parsed PDF: object store + page tree walk."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self._cache: dict[int, object] = {}
        self._offsets: dict[int, int] = {}
        self.trailer: dict = {}
        self._load_xref()

    # -- xref / trailer --

    def _load_xref(self) -> None:
        data = self.data
        tail = data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            # Fall back to scanning every "N 0 obj" header.
            self._scan_all_objects()
            self._find_trailer_by_scan()
            return
        offset = int(m.group(1))
        seen = set()
        while offset and offset not in seen:
            seen.add(offset)
            offset = self._parse_xref_section(offset)
        if not self._offsets:
            self._scan_all_objects()
        if not self.trailer:
            self._find_trailer_by_scan()

    def _parse_xref_section(self, offset: int) -> int:
        data = self.data
        if not data.startswith(b"xref", offset):
            # xref streams unsupported -> degrade to a full scan.
            self._scan_all_objects()
            self._find_trailer_by_scan()
            return 0
        lx = _Lexer(data, offset + 4)
        lx.skip_ws()
        while not data.startswith(b"trailer", lx.pos):
            m = re.match(rb"(\d+)\s+(\d+)", data[lx.pos : lx.pos + 40])
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            lx.pos += m.end()
            lx.skip_ws()
            for k in range(count):
                entry = data[lx.pos : lx.pos + 20]
                em = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", entry)
                if not em:
                    raise PdfError("malformed xref entry")
                if em.group(3) == b"n":
                    objnum = start + k
                    if objnum not in self._offsets:
                        self._offsets[objnum] = int(em.group(1))
                lx.pos += em.end()
                lx.skip_ws()
        if data.startswith(b"trailer", lx.pos):
            lx.pos += 7
            tdict = lx.parse_object()
            if isinstance(tdict, dict):
                for k, v in tdict.items():
                    self.trailer.setdefault(k, v)
                prev = tdict.get("Prev")
                return int(prev) if isinstance(prev, (int, float)) else 0
        return 0

    def _scan_all_objects(self) -> None:
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            self._offsets.setdefault(int(m.group(1)), m.start())

    def _find_trailer_by_scan(self) -> None:
        idx = self.data.rfind(b"trailer")
        if idx != -1:
            lx = _Lexer(self.data, idx + 7)
            t = lx.parse_object()
            if isinstance(t, dict):
                self.trailer = t
                return
        # Last resort: any object with /Type /Catalog becomes the root.
        for num in self._offsets:
            obj = self.get_object(num)
            if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                self.trailer = {"Root": Ref(num, 0)}
                return
        raise PdfError("no trailer / catalog found")

    # -- object access --

    def resolve(self, obj):
        hops = 0
        while isinstance(obj, Ref):
            hops += 1
            if hops > 32:
                # a self/cyclic indirect reference would spin forever;
                # malformed input must classify, not hang the task
                raise PdfError("indirect reference cycle")
            obj = self.get_object(obj.num)
        return obj

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self._offsets.get(num)
        if off is None:
            return None
        data = self.data
        m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", data[off : off + 40])
        if not m:
            raise PdfError(f"object {num} not at offset {off}")
        lx = _Lexer(data, off + m.end())
        obj = lx.parse_object()
        lx.skip_ws()
        if data.startswith(b"stream", lx.pos):
            p = lx.pos + 6
            if data[p : p + 2] == b"\r\n":
                p += 2
            elif data[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(obj.get("Length")) if isinstance(obj, dict) else None
            if isinstance(length, (int, float)):
                raw = data[p : p + int(length)]
            else:
                endidx = data.find(b"endstream", p)
                if endidx == -1:
                    raise PdfError("unterminated stream")
                raw = data[p:endidx].rstrip(b"\r\n")
            obj = Stream(dict(obj), raw)
        self._cache[num] = obj
        return obj

    # -- page tree --

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("bad /Root")
        tree = self.resolve(root.get("Pages"))
        out: list[dict] = []

        def walk(node, inherited: dict) -> None:
            node = self.resolve(node)
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for key in ("Resources", "MediaBox"):
                if key in node:
                    inh[key] = node[key]
            if node.get("Type") == "Pages" or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, inh)
            else:
                page = dict(node)
                for key, val in inh.items():
                    page.setdefault(key, val)
                out.append(page)

        walk(tree, {})
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, Stream):
            return contents.decoded()
        if isinstance(contents, list):
            return b"\n".join(
                s.decoded()
                for s in (self.resolve(c) for c in contents)
                if isinstance(s, Stream)
            )
        return b""

    def page_fonts(self, page: dict) -> list[str]:
        """BaseFont names on the page (for the math-font signal)."""
        res = self.resolve(page.get("Resources")) or {}
        fonts = self.resolve(res.get("Font")) if isinstance(res, dict) else None
        out = []
        if isinstance(fonts, dict):
            for _, fref in sorted(fonts.items()):
                fdict = self.resolve(fref)
                if isinstance(fdict, dict):
                    bf = fdict.get("BaseFont")
                    if isinstance(bf, str):
                        out.append(bf)
        return out

    def page_image_count(self, page: dict) -> int:
        res = self.resolve(page.get("Resources")) or {}
        xobjs = self.resolve(res.get("XObject")) if isinstance(res, dict) else None
        count = 0
        if isinstance(xobjs, dict):
            for _, xref_ in xobjs.items():
                x = self.resolve(xref_)
                hdr = x.header if isinstance(x, Stream) else x
                if isinstance(hdr, dict) and hdr.get("Subtype") == "Image":
                    count += 1
        return count


class Stream:
    __slots__ = ("header", "raw")

    def __init__(self, header: dict, raw: bytes) -> None:
        self.header = header
        self.raw = raw

    def decoded(self) -> bytes:
        filt = self.header.get("Filter")
        if filt is None:
            return self.raw
        filters = [filt] if not isinstance(filt, list) else filt
        data = self.raw
        for f in filters:
            if f == "FlateDecode":
                data = zlib.decompress(data)
            elif f in ("ASCIIHexDecode",):
                data = bytes.fromhex(
                    re.sub(rb"[\s>]", b"", data).decode("ascii")
                )
            else:
                raise PdfError(f"unsupported filter {f}")
        return data


# ---------------------------------------------------------------------------
# Content-stream interpretation -> positioned text runs
# ---------------------------------------------------------------------------


@dataclass
class TextRun:
    x: float
    y: float
    text: str
    font: str = ""
    size: float = 0.0


# WinAnsiEncoding is cp1252: curly quotes, dashes and bullets live in
# 0x80-0x9F where latin-1 has C1 controls.  cp1252 leaves five bytes
# undefined; those pass through at their latin-1 value.
_WINANSI_UNDEFINED = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def _decode_pdf_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        try:
            return raw[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            return raw[2:].decode("utf-16-be", "replace")
    try:
        return raw.decode("cp1252")
    except UnicodeDecodeError:
        return "".join(
            chr(b) if b in _WINANSI_UNDEFINED else bytes([b]).decode("cp1252")
            for b in raw
        )


_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


def interpret_content(content: bytes, font_map: dict[str, str] | None = None) -> list[TextRun]:
    """Execute the text operators of one page's content stream.

    Tracks the text matrix translation (Tm/Td/TD/T*) well enough for layout
    reconstruction at the granularity the corpus needs (axis-aligned text,
    no rotation/skew).
    """
    runs: list[TextRun] = []
    lx = _Lexer(content, 0)
    operands: list = []
    # Text state
    tm_x = tm_y = 0.0
    line_x = line_y = 0.0
    leading = 0.0
    font_name = ""
    font_size = 0.0
    in_text = False
    n = len(content)

    def emit(raw) -> None:
        nonlocal tm_x
        if isinstance(raw, bytes):
            s = _decode_pdf_string(raw)
            if s:
                runs.append(
                    TextRun(x=tm_x, y=tm_y, text=s, font=font_name, size=font_size)
                )
                # crude advance: average glyph width ~ 0.5 em
                tm_x += 0.5 * font_size * len(s)

    while lx.pos < n:
        lx.skip_ws()
        if lx.pos >= n:
            break
        c = content[lx.pos]
        if c in b"/<([+-.0123456789":
            try:
                operands.append(lx.parse_object())
            except PdfError:
                lx.pos += 1
            continue
        # Operator token
        m = _OP_RE.match(content, lx.pos)
        if not m:
            lx.pos += 1
            operands = []
            continue
        op = m.group(0)
        lx.pos += len(op)
        try:
            if op == b"BT":
                in_text = True
                tm_x = tm_y = line_x = line_y = 0.0
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and len(operands) >= 2:
                fname = operands[-2]
                font_size = float(operands[-1])
                font_name = (
                    (font_map or {}).get(fname, fname) if isinstance(fname, str) else ""
                )
            elif op == b"TL" and operands:
                leading = float(operands[-1])
            elif op == b"Td" and len(operands) >= 2:
                line_x += float(operands[-2])
                line_y += float(operands[-1])
                tm_x, tm_y = line_x, line_y
            elif op == b"TD" and len(operands) >= 2:
                leading = -float(operands[-1])
                line_x += float(operands[-2])
                line_y += float(operands[-1])
                tm_x, tm_y = line_x, line_y
            elif op == b"Tm" and len(operands) >= 6:
                line_x = float(operands[-2])
                line_y = float(operands[-1])
                tm_x, tm_y = line_x, line_y
            elif op == b"T*":
                line_y -= leading
                tm_x, tm_y = line_x, line_y
            elif op == b"Tj" and operands:
                if in_text:
                    emit(operands[-1])
            elif op == b"'" and operands:
                line_y -= leading
                tm_x, tm_y = line_x, line_y
                if in_text:
                    emit(operands[-1])
            elif op == b'"' and len(operands) >= 3:
                line_y -= leading
                tm_x, tm_y = line_x, line_y
                if in_text:
                    emit(operands[-1])
            elif op == b"TJ" and operands:
                arr = operands[-1]
                if isinstance(arr, list) and in_text:
                    for el in arr:
                        if isinstance(el, bytes):
                            emit(el)
                        elif isinstance(el, (int, float)):
                            # negative adjustment moves right visually
                            tm_x -= el / 1000.0 * font_size
        except (TypeError, ValueError):
            pass
        operands = []
    return runs


# ---------------------------------------------------------------------------
# Layout reconstruction
# ---------------------------------------------------------------------------

_LINE_Y_TOL = 2.0  # same-line baseline tolerance (pt)
_PARA_GAP_FACTOR = 1.8  # y-gap > factor*median leading => paragraph break
_WORD_GAP_FACTOR = 0.35  # x-gap > factor*font-size => insert space
_SEGMENT_GAP = 40.0  # x-gap (pt) that splits a baseline into separate
# segments — keeps multi-column text from fusing into one wide line so the
# column estimator sees per-column x-centers (difficulty.py:200-231 analog)


@dataclass
class Line:
    y: float
    x0: float
    x1: float
    text: str


def reconstruct_lines(runs: list[TextRun]) -> list[Line]:
    """Group runs into baseline lines; left-to-right within a line."""
    if not runs:
        return []
    ordered = sorted(runs, key=lambda r: (-r.y, r.x))
    lines: list[list[TextRun]] = []
    for run in ordered:
        if lines and abs(lines[-1][0].y - run.y) <= _LINE_Y_TOL:
            lines[-1].append(run)
        else:
            lines.append([run])
    out: list[Line] = []
    for group in lines:
        group.sort(key=lambda r: r.x)
        # Split the baseline into segments at column-scale x-gaps.
        segments: list[list[TextRun]] = [[group[0]]]
        prev_end = group[0].x + 0.5 * group[0].size * len(group[0].text)
        for r in group[1:]:
            if r.x - prev_end > _SEGMENT_GAP:
                segments.append([r])
            else:
                segments[-1].append(r)
            prev_end = r.x + 0.5 * r.size * len(r.text)
        for seg in segments:
            parts: list[str] = []
            seg_end = None
            for r in seg:
                if seg_end is not None:
                    gap = r.x - seg_end
                    if (
                        gap > _WORD_GAP_FACTOR * max(r.size, 1.0)
                        and parts
                        and not parts[-1].endswith(" ")
                    ):
                        parts.append(" ")
                parts.append(r.text)
                seg_end = r.x + 0.5 * r.size * len(r.text)
            out.append(
                Line(
                    y=seg[0].y,
                    x0=seg[0].x,
                    x1=seg_end if seg_end is not None else seg[0].x,
                    text="".join(parts),
                )
            )
    return out


def estimate_columns(lines: list[Line], page_width: float) -> int:
    """Column estimate re-derived from difficulty.py:200-231: sort the line
    x-centers, count gaps > 15% of page width, cap at 4."""
    if len(lines) < 2:
        return 1
    centers = sorted((ln.x0 + ln.x1) / 2.0 for ln in lines)
    gap_threshold = page_width * 0.15
    columns = 1
    for i in range(1, len(centers)):
        if centers[i] - centers[i - 1] > gap_threshold:
            columns += 1
    return min(columns, 4)


def _split_columns(
    lines: list[Line], page_width: float, n_cols: int, x_origin: float = 0.0
) -> list[list[Line]]:
    """Assign lines to columns by x-center against even column bounds.

    ``x_origin`` is the MediaBox lower-left x: on cropped scans the
    content coordinates start there, and bucketing by the absolute
    center would collapse every column into the last bucket."""
    if n_cols <= 1:
        return [lines]
    width = page_width / n_cols
    cols: list[list[Line]] = [[] for _ in range(n_cols)]
    for ln in lines:
        center = (ln.x0 + ln.x1) / 2.0 - x_origin
        idx = min(max(int(center / width), 0), n_cols - 1)
        cols[idx].append(ln)
    return [c for c in cols if c]


def render_page_text(
    lines: list[Line],
    page_width: float = 612.0,
    x_origin: float = 0.0,
    n_cols: int | None = None,
) -> str:
    """Lines -> paragraphs: reading order = column-major, top-to-bottom.

    Paragraph break when the y-gap between consecutive lines exceeds
    ``_PARA_GAP_FACTOR`` x the median line pitch.  ``n_cols`` overrides
    the estimate (callers that already computed it, or the single-column
    ``basic`` kernel mode).
    """
    if not lines:
        return ""
    if n_cols is None:
        n_cols = estimate_columns(lines, page_width)
    paragraphs: list[str] = []
    for col in _split_columns(lines, page_width, n_cols, x_origin):
        col = sorted(col, key=lambda ln: -ln.y)
        gaps = [col[i].y - col[i + 1].y for i in range(len(col) - 1)]
        positive = sorted(g for g in gaps if g > 0)
        pitch = positive[len(positive) // 2] if positive else 14.0
        para: list[str] = []
        for i, ln in enumerate(col):
            if i > 0 and (col[i - 1].y - ln.y) > _PARA_GAP_FACTOR * pitch and para:
                paragraphs.append("\n".join(para))
                para = []
            para.append(ln.text)
        if para:
            paragraphs.append("\n".join(para))
    return "\n\n".join(paragraphs)


# ---------------------------------------------------------------------------
# Top-level kernel
# ---------------------------------------------------------------------------

# Math-font families (reference born_digital.py:31-36); re.search handles
# subset prefixes like "ABCDEF+CMMI10".
MATH_FONT_RE = re.compile(
    r"(?i)(CMMI|CMSY|CMEX|MSAM|MSBM|"
    r"STIXMath|XITSMath|LatinModernMath|LMMath|"
    r"AsanaMath|LibertinusMath|CambriaMath|NewCMMath|"
    r"Euler|rsfs)"
)


_RULED_MIN_H = 3       # >= 3 distinct horizontal rules
_RULED_MIN_V = 3       # x >= 3 distinct vertical rules
_RULED_Y_TOL = 1.5     # rule-coordinate clustering tolerance (pt)
_RULED_MIN_SPAN = 20.0  # segment length floor (pt) — ticks aren't rules
_RULED_MAX_SEGS = 5_000  # work bound on pathological streams


def _scan_rule_segments(content: bytes):
    """Axis-aligned stroked line segments from the path operators:
    returns (horizontals [(y, x0, x1)], verticals [(x, y0, y1)])."""
    lx = _Lexer(content, 0)
    operands: list = []
    cur: tuple[float, float] | None = None
    hs: list[tuple[float, float, float]] = []
    vs: list[tuple[float, float, float]] = []
    n = len(content)
    n_segs = 0
    while lx.pos < n and n_segs < _RULED_MAX_SEGS:
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
            if op == b"m" and len(operands) >= 2:
                cur = (float(operands[-2]), float(operands[-1]))
            elif op == b"l" and len(operands) >= 2 and cur is not None:
                x2, y2 = float(operands[-2]), float(operands[-1])
                x1, y1 = cur
                dx, dy = abs(x2 - x1), abs(y2 - y1)
                n_segs += 1
                if dy <= _RULED_Y_TOL and dx >= _RULED_MIN_SPAN:
                    hs.append((y1, min(x1, x2), max(x1, x2)))
                elif dx <= _RULED_Y_TOL and dy >= _RULED_MIN_SPAN:
                    vs.append((x1, min(y1, y2), max(y1, y2)))
                cur = (x2, y2)
        except (TypeError, ValueError):
            pass
        operands = []
    return hs, vs


def _grid_rules(hs, vs):
    """(x_rules, y_rules) when the segments form a grid, else None."""
    if len(hs) < _RULED_MIN_H or len(vs) < _RULED_MIN_V:
        return None
    hy = _cluster([h[0] for h in hs], _RULED_Y_TOL)
    vx = _cluster([v[0] for v in vs], _RULED_Y_TOL)
    if len(hy) < _RULED_MIN_H or len(vx) < _RULED_MIN_V:
        return None
    # span intersection: the vertical rules' x positions must fall on
    # the horizontal rules' extent and vice versa
    h_x0 = min(h[1] for h in hs)
    h_x1 = max(h[2] for h in hs)
    v_y0 = min(v[1] for v in vs)
    v_y1 = max(v[2] for v in vs)
    n_v = sum(1 for x in vx if h_x0 - _RULED_Y_TOL <= x <= h_x1 + _RULED_Y_TOL)
    n_h = sum(1 for y in hy if v_y0 - _RULED_Y_TOL <= y <= v_y1 + _RULED_Y_TOL)
    if n_v < _RULED_MIN_V or n_h < _RULED_MIN_H:
        return None
    return (vx, hy)


def detect_ruled_table(content: bytes) -> bool:
    """Ruled/bordered table detector (reference born_digital.py:410-426:
    PyMuPDF ``find_tables()`` catches grid-line tables — the structural
    half of P9 that the columnar-numbers heuristic P10 cannot see).

    Scans the content stream's path operators for stroked line segments
    (``m``/``l``); a page with >= 3 distinct horizontal rule y's AND
    >= 3 distinct vertical rule x's whose spans overlap is a grid.
    Prose pages carry no path ops, so the byte probe exits immediately.
    """
    return find_ruled_grid(content) is not None


def find_ruled_grid(content: bytes):
    """(x_rules, y_rules) of the page's ruled grid, or None."""
    if content.count(b" l") < (_RULED_MIN_H + _RULED_MIN_V - 1):
        return None  # fast gate: a grid needs at least that many 'l' ops
    return _grid_rules(*_scan_rule_segments(content))


def extract_structured_page(
    content: bytes,
    fmap: dict[str, str] | None = None,
    page_width: float = 612.0,
    x_origin: float = 0.0,
    runs: "list | None" = None,
) -> str | None:
    """Structured (table-aware) page rendering, P14 for ruled PDF pages
    (reference born_digital.py:512-591 ``extract_structured``): text
    runs inside the grid become a markdown table (cells assigned by rule
    intervals, first row = header, P15 renderer); prose above/below the
    grid renders normally; the pieces interleave in reading order.
    Returns None when the page has no ruled grid.  ``runs`` lets a
    caller that already interpreted the content stream skip the second
    pass (extract_pdf's per-page loop)."""
    import bisect

    grid = find_ruled_grid(content)
    if grid is None:
        return None
    from smart_ocr_spark.kernel.html_extract import table_to_markdown

    x_rules, y_rules = grid
    if runs is None:
        runs = interpret_content(content, fmap)
    x0, x1 = x_rules[0] - 2.0, x_rules[-1] + 2.0
    y0, y1 = y_rules[0] - 2.0, y_rules[-1] + 2.0
    above, in_table, below = [], [], []
    for r in runs:
        if x0 <= r.x <= x1 and y0 <= r.y <= y1:
            in_table.append(r)
        elif r.y > y1:
            above.append(r)
        else:
            below.append(r)
    n_rows, n_cols = len(y_rules) - 1, len(x_rules) - 1
    cells = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for r in sorted(in_table, key=lambda t: (-t.y, t.x)):
        ci = min(max(bisect.bisect_right(x_rules, r.x) - 1, 0), n_cols - 1)
        ri_asc = min(max(bisect.bisect_right(y_rules, r.y) - 1, 0), n_rows - 1)
        ri = n_rows - 1 - ri_asc  # grid y ascends; rows read top-down
        cells[ri][ci] = (cells[ri][ci] + " " + r.text).strip()
    parts = []
    for seg in (above,):
        if seg:
            parts.append(
                render_page_text(
                    reconstruct_lines(seg), page_width, x_origin=x_origin
                )
            )
    parts.append(table_to_markdown(cells))
    if below:
        parts.append(
            render_page_text(
                reconstruct_lines(below), page_width, x_origin=x_origin
            )
        )
    return "\n\n".join(p for p in parts if p)


def _cluster(vals: list[float], tol: float) -> list[float]:
    """Distinct values after tolerance clustering (sorted reps)."""
    out: list[float] = []
    for v in sorted(vals):
        if not out or v - out[-1] > tol:
            out.append(v)
    return out


def extract_pdf(data: bytes, variant: str = "layout") -> tuple[str, dict]:
    """Extract text + signals from PDF bytes.

    Returns (page texts joined with the reference's page separator
    ``\\n\\n---\\n\\n`` — ``src/socr/core/state.py:148`` — and a signals
    dict).  Raises PdfError for out-of-subset files.
    """
    doc = PdfDocument(data)
    pages = doc.pages()
    page_texts: list[str] = []
    plain_page_texts: list[str] = []
    n_fonts = set()
    math_font = False
    ruled_table = False
    images = 0
    max_cols = 1
    for page in pages:
        # ONE Resources/Font walk serves both the math-font signal and
        # the Tf resolution map (page_fonts duplicated this resolve)
        res = doc.resolve(page.get("Resources")) or {}
        fdict = doc.resolve(res.get("Font")) if isinstance(res, dict) else None
        fmap = {}
        if isinstance(fdict, dict):
            for rname, fref in fdict.items():
                f = doc.resolve(fref)
                if isinstance(f, dict) and isinstance(f.get("BaseFont"), str):
                    fmap[rname] = f["BaseFont"]
        n_fonts.update(fmap.values())
        if any(MATH_FONT_RE.search(f) for f in fmap.values()):
            math_font = True
        images += doc.page_image_count(page)
        media = doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792]
        x_origin = float(doc.resolve(media[0]))
        page_width = float(doc.resolve(media[2])) - x_origin
        content = doc.page_content(page)
        runs = interpret_content(content, fmap)
        lines = reconstruct_lines(runs)
        n_cols = estimate_columns(lines, page_width)
        max_cols = max(max_cols, n_cols)
        # P14 in the production path (ADVICE r3): ruled pages render
        # through the structured (table-aware) extractor on the layout
        # variant — the reference's native path does exactly this when
        # find_tables fires (born_digital.py:369-372).  The basic
        # variant stays the grid-free escape hatch (reference get_text
        # analog), so a repair to basic/density/raw can recover pages
        # where the grid interpretation itself was the failure.
        structured = None
        if variant != "basic":
            structured = extract_structured_page(
                content, fmap, page_width, x_origin=x_origin, runs=runs
            )
        if structured is not None:
            ruled_table = True
        elif not ruled_table:
            # P9 structural half: grid-line tables (byte probe exits
            # immediately on the op-free prose majority)
            ruled_table = detect_ruled_table(content)
        # "basic" is a genuinely different reconstruction, not just a
        # different page separator: single-column y-order rendering —
        # the repair-tier escape hatch for pages where the column
        # split itself was the failure
        plain = render_page_text(
            lines,
            page_width,
            x_origin=x_origin,
            n_cols=1 if variant == "basic" else n_cols,
        )
        # signals page_texts stay PLAIN even on ruled pages: the
        # reference computes the born-digital signal battery from raw
        # get_text and only swaps the NATIVE OUTPUT to the structured
        # rendering (born_digital.py:330-372) — markdown pipes in the
        # signal text would inflate the garbage ratio and flip
        # borderline pages to scanned
        plain_page_texts.append(plain)
        page_texts.append(structured if structured is not None else plain)

    if any(pt.strip() for pt in page_texts):
        text = (
            "\n\n---\n\n".join(page_texts)
            if variant != "basic"
            else "\n\n".join(page_texts)
        )
    else:
        # no text layer anywhere (scanned/image-only doc): joining empty
        # pages would fabricate separator-only text ('---') that reads
        # as content downstream (reference: get_text on a scan is "")
        text = ""
    signals = {
        # raw per-page texts so callers can build other joins without a
        # lossy string replace on the separator (a page legitimately
        # containing a '---' line must not be corrupted).  PLAIN
        # renderings (see above): structured output lives only in the
        # joined text
        "page_texts": plain_page_texts,
        # the parsed document, for callers that run further passes over
        # the same payload (inline figure extraction) — POPPED by
        # extract_payload_full before the dict reaches any Arrow schema
        "_doc": doc,
        "n_pages": len(pages),
        "font_count": len(n_fonts),
        "has_equations": math_font,
        "has_tables": ruled_table,
        "has_figures": images > 0,
        "n_images": images,
        "column_count": max_cols,
    }
    return text, signals


def sniff_pdf(data: bytes) -> bool:
    """Content sniff: PDF payloads start with %PDF- (FIXTURES.md §1)."""
    return data[:8].lstrip(b"\xef\xbb\xbf \r\n").startswith(b"%PDF-")
