"""Output normalization — the byte-identical output contract.

Re-implements the semantics of the reference's ``OutputNormalizer``
(``src/socr/core/normalizer.py:16-240``) and ``BaseEngine._clean_output``
(``src/socr/engines/base.py:329-360``): variant-specific artifact strips run
first, then one generic normalization pass.  The exact pass ordering defines
byte-identical output, so it is pinned by golden tests
(tests/test_normalize.py, mirroring reference tests/test_normalizer.py).

Unlike the reference, ``strip_phantom_images`` never touches the filesystem:
at web scale every relative/local image reference is a phantom by definition
(reference ``normalizer.py:153-205`` with ``output_dir=None`` — the same
default branch).

All functions are pure ``str -> str`` and deterministic; batch entry points
(`normalize_series`) apply them over a pandas Series inside Arrow batches.
"""

from __future__ import annotations

import re
import unicodedata

# --- variant-specific patterns (reference normalizer.py:29-54) ---

_RE_REF_TAG = re.compile(r"<\|ref\|>.*?<\|/ref\|>")
_RE_DET_TAG = re.compile(r"<\|det\|>\[\[.*?\]\]<\|/det\|>")
_RE_SPECIAL_TOKEN = re.compile(r"<\|[^|]+\|>")
_RE_BBOX = re.compile(r"\[\[\d+,\s*\d+,\s*\d+,\s*\d+\]\]")

_RE_LATEX_PREAMBLE = re.compile(
    r"^\\documentclass(?:\[.*?\])?\{.*?\}(?:.*?\\begin\{document\})?",
    re.DOTALL,
)
_RE_LATEX_END = re.compile(r"\\end\{document\}\s*$")

_RE_MISSING_PAGE = re.compile(r"\[MISSING_PAGE_POST(?::[\w]+)?\]")
_RE_MISSING_PAGE_EMPTY = re.compile(r"\[MISSING_PAGE_EMPTY(?::[\w]+)?\]")

_RE_META_HEADER = re.compile(r"^#\s*OCR Results\s*\n+")
_RE_META_LINES = re.compile(
    r"^\*\*(?:Original File|Full Path|Processed|Processing Time):\*\*[^\n]*\n?",
    re.MULTILINE,
)

# --- generic patterns (reference normalizer.py:57-73) ---

_RE_TRAILING_WS = re.compile(r"[ \t]+$", re.MULTILINE)
_RE_EXCESS_BLANK = re.compile(r"\n{3,}")
_RE_HTML_BR = re.compile(r"<br\s*/?>", re.IGNORECASE)
_RE_HTML_TAG = re.compile(r"<[^>]+>")
_RE_MD_IMAGE = re.compile(r"!\[[^\]]*\]\([^)]+\)")
_RE_MD_FENCE = re.compile(r"^```(?:markdown|md|text|ocr)?\s*\n(.*?)```\s*$", re.DOTALL)
_RE_LINE_REPEAT = re.compile(r"^(.{20,})\n(?:\1\n){4,}", re.MULTILINE)

# Smart quotes / dashes / ellipsis / ligatures (reference normalizer.py:76-89).
# Applied AFTER NFKC; NFKC already expands the ligatures, the map is kept for
# parity with the reference's explicit ordering.
_UNICODE_MAP = (
    ("\u2018", "'"),
    ("\u2019", "'"),
    ("\u201c", '"'),
    ("\u201d", '"'),
    ("\u2013", "-"),
    ("\u2014", "--"),
    ("\u2026", "..."),
    ("\ufb01", "fi"),
    ("\ufb02", "fl"),
    ("\ufb03", "ffi"),
    ("\ufb04", "ffl"),
    ("\ufb00", "ff"),
)

# Kernel-variant names -> which artifact strip applies.  The reference keys
# these off engine names (normalizer.py:106-115); we keep those names as
# aliases so the golden-parity tests read identically, and add our own
# extraction-kernel variant names.
_GROUNDING_VARIANTS = frozenset({"deepseek", "deepseek-vllm", "glm", "grounded"})
_META_VARIANTS = frozenset({"mistral", "meta_header"})
_LATEX_VARIANTS = frozenset({"nougat", "latex"})
_MARKER_VARIANTS = frozenset({"marker", "paged"})


def _strip_grounding(text: str) -> str:
    """Grounding tags / bboxes / HTML (reference normalizer.py:123-131)."""
    text = _RE_REF_TAG.sub("", text)
    text = _RE_DET_TAG.sub("", text)
    text = _RE_SPECIAL_TOKEN.sub("", text)
    text = _RE_BBOX.sub("", text)
    text = _RE_HTML_BR.sub("\n", text)
    text = _RE_HTML_TAG.sub("", text)
    return text


def _strip_meta_header(text: str) -> str:
    """`# OCR Results` header + `**Original File:**`-style meta lines."""
    text = _RE_META_HEADER.sub("", text)
    text = _RE_META_LINES.sub("", text)
    return text


def _strip_latex_doc(text: str) -> str:
    """LaTeX preamble/postamble (reference normalizer.py:139-143)."""
    text = _RE_LATEX_PREAMBLE.sub("", text)
    text = _RE_LATEX_END.sub("", text)
    return text


def _strip_missing_pages(text: str) -> str:
    """`[MISSING_PAGE_*]` markers (reference normalizer.py:145-148)."""
    text = _RE_MISSING_PAGE.sub("", text)
    text = _RE_MISSING_PAGE_EMPTY.sub("", text)
    return text


def _may_have_line_repeat(text: str) -> bool:
    """Conservative gate for ``_RE_LINE_REPEAT``: any match implies five
    consecutive identical lines of >= 20 chars, so two adjacent identical
    long lines are a necessary condition.  One C-speed split + compare
    pass beats the backreference regex scanning the whole text (~10x on
    typical documents); false positives just fall through to the regex."""
    prev = None
    for ln in text.split("\n"):
        if prev is not None and len(ln) >= 20 and ln == prev:
            return True
        prev = ln
    return False


def normalize_generic(text: str) -> str:
    """Generic normalization pass (reference normalizer.py:209-240).

    Order is load-bearing: CRLF -> whole-output fence unwrap -> repetition
    collapse -> NFKC -> char map -> trailing-ws strip -> blank collapse ->
    outer strip.

    Each regex sub is gated by an exact cheap necessary condition (plain
    substring probes / ``isascii``): the subs are full-text scans that
    usually match nothing, and the gates skip them byte-identically —
    pinned by the golden tests plus an equivalence fuzz
    (tests/test_normalize.py).
    """
    text = text.replace("\r\n", "\n").replace("\r", "\n")

    fence_match = _RE_MD_FENCE.match(text.strip())
    if fence_match:
        text = fence_match.group(1)

    if _may_have_line_repeat(text):
        text = _RE_LINE_REPEAT.sub(r"\1\n", text)
    if not text.isascii():
        # NFKC and the char map are both identity on pure ASCII
        text = unicodedata.normalize("NFKC", text)
        for src, dst in _UNICODE_MAP:
            text = text.replace(src, dst)
    # [ \t]+$ (MULTILINE) matches iff a space/tab sits right before a
    # newline or at end-of-string
    if " \n" in text or "\t\n" in text or text[-1:] in (" ", "\t"):
        text = _RE_TRAILING_WS.sub("", text)
    if "\n\n\n" in text:
        text = _RE_EXCESS_BLANK.sub("\n\n", text)
    return text.strip()


def normalize(text: str, variant: str = "") -> str:
    """Variant-specific strips, then generic pass (normalizer.py:91-119)."""
    if not text:
        return text
    v = variant.lower() if variant else ""
    if v in _GROUNDING_VARIANTS:
        text = _strip_grounding(text)
    elif v in _META_VARIANTS:
        text = _strip_meta_header(text)
    elif v in _LATEX_VARIANTS:
        text = _strip_latex_doc(text)
    elif v in _MARKER_VARIANTS:
        text = _strip_missing_pages(text)
    return normalize_generic(text)


_RE_FRONTMATTER_META_BLOCK = re.compile(
    r"^#\s*OCR Results\s*\n+"
    r"(?:\*\*(?:Original File|Full Path|Processed|Processing Time):\*\*[^\n]*\n)+"
    r"\s*(?:---\s*\n)?"
)


def clean_output(text: str, variant: str = "") -> str:
    """Frontmatter + meta-block strip, then :func:`normalize`.

    Mirrors ``BaseEngine._clean_output`` (reference engines/base.py:329-360).
    """
    if text.startswith("---"):
        parts = text.split("---", 2)
        if len(parts) >= 3:
            text = parts[2].strip()
    text = _RE_FRONTMATTER_META_BLOCK.sub("", text).strip()
    return normalize(text, variant)


def strip_phantom_images(text: str) -> str:
    """Remove markdown image refs whose target cannot exist.

    Reference ``normalizer.py:153-205`` with ``output_dir=None``: keep only
    ``http(s)://`` and ``data:`` targets; every local path (relative or
    absolute) is a phantom at web scale — no filesystem probe, fully
    deterministic across executors.
    """
    if "![" not in text:
        return text

    def _replace(match: re.Match) -> str:
        full = match.group(0)
        path_str = full[full.rfind("(") + 1 : -1].strip()
        if path_str.startswith(("http://", "https://", "data:")):
            return full
        return ""

    text = _RE_MD_IMAGE.sub(_replace, text)
    return _RE_EXCESS_BLANK.sub("\n\n", text)


# --- batch entry points (used inside Arrow-batch UDFs) ---


def normalize_series(texts, variants=None):
    """Normalize a pandas Series of strings; ``variants`` may be a Series
    of per-row variant names or a single str."""
    import pandas as pd

    if variants is None:
        return pd.Series([normalize(t or "") for t in texts], index=texts.index)
    if isinstance(variants, str):
        return pd.Series(
            [normalize(t or "", variants) for t in texts], index=texts.index
        )
    # per-row variants arrive from Arrow with missing values as NaN
    # (floats), which are truthy — only a real string may pass through
    return pd.Series(
        [
            normalize(t or "", v if isinstance(v, str) else "")
            for t, v in zip(texts, variants)
        ],
        index=texts.index,
    )


def strip_phantom_images_series(texts):
    import pandas as pd

    return pd.Series([strip_phantom_images(t or "") for t in texts], index=texts.index)


def sanitize_filename(name: str) -> str:
    """Filesystem-safe name (reference engines/base.py:30-32, N13):
    alnum, dot, underscore, dash and space survive; everything else
    becomes '_'; the result is stripped.  Used when a sink keys output
    paths by url/doc name instead of a parquet partition value."""
    return "".join(
        c if c.isalnum() or c in "._- " else "_" for c in name
    ).strip()
