"""Source-quality assessment + difficulty routing.

Re-implements the reference's born-digital page assessment cascade
(``src/socr/core/born_digital.py:188-404``) over extracted text + structural
signals, and the EASY/HARD difficulty classifier
(``src/socr/core/difficulty.py:50-165``).

For the web corpus, "born-digital" maps to "the payload has a clean native
text layer we can trust without the expensive layout kernel": HTML pages
whose basic-variant text passes the quality cascade, and PDFs whose
content-stream text does.  The decision ladder, thresholds, confidences and
note strings follow the reference exactly so the routing semantics (and
tests) are comparable line-by-line.
"""

from __future__ import annotations

import re

# Reference born_digital.py:107-131
MIN_CHARS_FOR_TEXT_LAYER = 50
MIN_WORDS_PER_PAGE = 15
MAX_GARBAGE_RATIO = 0.05
MAX_SPACE_RATIO = 0.60
MIN_AVG_WORD_LENGTH = 2.5
MAX_AVG_WORD_LENGTH = 20.0

_CID_RE = re.compile(r"\(cid:\d+\)")

# Difficulty thresholds (reference difficulty.py:50-55)
MAX_DRAWINGS_EASY = 20
MAX_IMAGES_EASY = 2
MAX_TABLES_EASY = 0
MAX_COLUMNS_EASY = 1
MIN_TEXT_BLOCKS_EASY = 1
MAX_TEXT_BLOCKS_EASY = 30

EASY = "easy"
HARD = "hard"


# control chars minus \t\n\r, U+FFFD, PUA, surrogates — one class, one
# C-speed scan (the per-char Python loop was the assess hotspot)
_SOURCE_GARBAGE_RE = re.compile(
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\ufffd\\ue000-\\uf8ff\\ud800-\\udfff]"
)


# Columnar-numbers table heuristic (reference born_digital.py:428-447)
COLUMNAR_MIN_SINGLE_TOKEN_LINES = 15
COLUMNAR_SINGLE_TOKEN_FRAC = 0.50

# LaTeX-markup equation detection (reference born_digital.py:477-506, P8)
_LATEX_CMD_RE = re.compile(
    r"\\(?:frac|sum|int|prod|lim|infty|partial|nabla|alpha|beta|gamma"
    r"|delta|epsilon|theta|lambda|sigma|omega|begin\{(?:equation|align"
    r"|gather|math|displaymath)\})"
)
_LATEX_DISPLAY_RE = re.compile(r"\$\$.+?\$\$", re.DOTALL)
_LATEX_BRACKET_RE = re.compile(r"\\\[.+?\\\]", re.DOTALL)


def detect_latex_equations(text: str) -> bool:
    """LaTeX equation markup in extracted text (reference
    born_digital.py:477-506): common commands / environments, $$...$$
    display math, or \\[...\\] brackets.  Complements the math-FONT
    signal (pdf_extract.MATH_FONT_RE, P7) — a paper can carry equations
    as markup in a plain text font."""
    if "\\" not in text and "$$" not in text:
        return False  # fast gate: both signal families need these chars
    return bool(
        _LATEX_CMD_RE.search(text)
        or _LATEX_DISPLAY_RE.search(text)
        or _LATEX_BRACKET_RE.search(text)
    )


def detect_columnar_numbers(text: str) -> bool:
    """Borderless-table detector via single-token line ratio (reference
    born_digital.py:428-447, P10).

    A whitespace-aligned table with no drawn borders extracts as one
    cell per line — a single token each.  Prose never does this: a
    justified paragraph produces multi-word lines.  Tabular iff >50% of
    non-empty lines are single-token AND there are at least 15 such
    lines (the floor avoids false positives on short pages with headers
    or bullet lists).
    """
    if not text:
        return False
    nonempty = [ln.strip() for ln in text.splitlines() if ln.strip()]
    if not nonempty:
        return False
    single_token = sum(1 for ln in nonempty if len(ln.split()) == 1)
    return (
        single_token >= COLUMNAR_MIN_SINGLE_TOKEN_LINES
        and single_token / len(nonempty) > COLUMNAR_SINGLE_TOKEN_FRAC
    )


def source_garbage_ratio(text: str) -> float:
    """Source-side garbage ratio (reference born_digital.py:668-693):
    control chars (minus \\t\\n\\r), U+FFFD, PUA, surrogates."""
    if not text:
        return 0.0
    return len(_SOURCE_GARBAGE_RE.findall(text)) / len(text)


def confidence_score(
    word_count: int,
    garbage_ratio: float,
    avg_word_len: float,
    font_count: int,
) -> float:
    """Born-digital confidence (reference born_digital.py:695-732)."""
    confidence = 0.80
    if word_count > 100:
        confidence += 0.05
    if word_count > 300:
        confidence += 0.05
    if garbage_ratio < 0.01:
        confidence += 0.03
    if font_count >= 2:
        confidence += 0.03
    if font_count >= 4:
        confidence += 0.02
    if 3.5 <= avg_word_len <= 7.0:
        confidence += 0.02
    return min(confidence, 1.0)


def assess_page(
    raw_text: str,
    font_count: int = 0,
    has_images: bool = False,
    has_tables: bool = False,
    has_equations: bool = False,
    structured_text: str | None = None,
    min_chars: int | None = None,
    min_words: int | None = None,
    max_garbage_ratio: float | None = None,
) -> dict:
    """Born-digital decision cascade (reference born_digital.py:188-404).

    ``raw_text`` is the cheap native text (basic-variant extraction);
    ``structured_text`` is the table-aware rendering used when tables are
    present (reference ``extract_structured``).  Returns a flat dict with
    is_born_digital, native_text, confidence, raw metrics, the
    needs_ocr_enhancement flag and the reference's note strings.
    ``min_chars``/``min_words``/``max_garbage_ratio`` override the module
    thresholds per call (reference BornDigitalDetector.__init__ kwargs).
    """
    min_chars = MIN_CHARS_FOR_TEXT_LAYER if min_chars is None else min_chars
    min_words = MIN_WORDS_PER_PAGE if min_words is None else min_words
    max_garbage = (
        MAX_GARBAGE_RATIO if max_garbage_ratio is None else max_garbage_ratio
    )
    char_count = len(raw_text)
    words = raw_text.split()
    word_count = len(words)
    has_figures = has_images

    def scanned(confidence: float, note: str) -> dict:
        return _mk(
            False, "", confidence, char_count, word_count, font_count,
            has_images, has_tables, has_figures, has_equations, False, [note],
        )

    if char_count < min_chars:
        return scanned(
            0.95,
            f"insufficient text layer ({char_count} chars < {min_chars})",
        )
    if word_count < min_words:
        return scanned(0.85, f"too few words ({word_count} < {min_words})")

    garbage = source_garbage_ratio(raw_text)
    space_ratio = raw_text.count(" ") / max(len(raw_text), 1)
    avg_word_len = sum(len(w) for w in words) / max(len(words), 1)

    if _CID_RE.search(raw_text):
        return scanned(0.95, "CID font mapping artifacts detected")
    if garbage > max_garbage:
        return scanned(0.80, f"high garbage ratio ({garbage:.1%})")
    if space_ratio > MAX_SPACE_RATIO:
        return scanned(0.75, f"excessive spacing ({space_ratio:.1%})")
    if avg_word_len < MIN_AVG_WORD_LENGTH:
        return scanned(0.70, f"avg word length too short ({avg_word_len:.1f})")
    if avg_word_len > MAX_AVG_WORD_LENGTH:
        return scanned(0.70, f"avg word length too long ({avg_word_len:.1f})")

    confidence = confidence_score(word_count, garbage, avg_word_len, font_count)
    has_complex = has_tables or has_figures or has_equations
    notes = []
    if has_tables:
        native_text = (structured_text if structured_text is not None else raw_text).strip()
        notes.append("born-digital: structured extraction (tables detected)")
    else:
        native_text = raw_text.strip()
        notes.append("born-digital: clean text layer detected")
    if has_complex:
        content_types = []
        if has_tables:
            content_types.append("tables")
        if has_figures:
            content_types.append("figures")
        if has_equations:
            content_types.append("equations")
        notes.append(
            f"complex content detected ({', '.join(content_types)}); "
            f"OCR enhancement preferred"
        )
    return _mk(
        True, native_text, confidence, char_count, word_count, font_count,
        has_images, has_tables, has_figures, has_equations, has_complex, notes,
    )


def _mk(
    is_bd, native_text, confidence, char_count, word_count, font_count,
    has_images, has_tables, has_figures, has_equations, needs_enh, notes,
) -> dict:
    return {
        "is_born_digital": is_bd,
        "native_text": native_text,
        "confidence": confidence,
        "char_count": char_count,
        "word_count": word_count,
        "font_count": font_count,
        "has_images": has_images,
        "has_tables": has_tables,
        "has_figures": has_figures,
        "has_equations": has_equations,
        "needs_ocr_enhancement": needs_enh,
        "notes": notes,
    }


def classify_difficulty(
    table_count: int = 0,
    column_count: int = 1,
    drawing_count: int = 0,
    image_count: int = 0,
    text_block_count: int = 1,
    has_tables_hint: bool = False,
    has_equations_hint: bool = False,
) -> tuple[str, list[str]]:
    """EASY/HARD routing (reference difficulty.py:58-165).

    Hints from assessment force HARD before structural analysis.
    """
    if has_tables_hint:
        return HARD, ["tables detected (born-digital hint)"]
    if has_equations_hint:
        return HARD, ["equations detected (born-digital hint)"]

    reasons: list[str] = []
    difficulty = EASY
    if table_count > MAX_TABLES_EASY:
        difficulty = HARD
        reasons.append(f"{table_count} table(s) detected")
    if column_count > MAX_COLUMNS_EASY:
        difficulty = HARD
        reasons.append(f"{column_count}-column layout")
    if drawing_count > MAX_DRAWINGS_EASY:
        difficulty = HARD
        reasons.append(f"{drawing_count} drawings (likely charts/figures)")
    if image_count > MAX_IMAGES_EASY:
        difficulty = HARD
        reasons.append(f"{image_count} embedded images")
    if text_block_count > MAX_TEXT_BLOCKS_EASY:
        difficulty = HARD
        reasons.append(f"{text_block_count} text blocks (dense layout)")
    if text_block_count < MIN_TEXT_BLOCKS_EASY and image_count > 0:
        difficulty = HARD
        reasons.append("image-dominated page (few text blocks)")
    if not reasons:
        reasons.append("simple layout, clean content")
    return difficulty, reasons
