"""LaTeX block reconciliation (J5).

Re-implements the reference's ``OutputReconciler`` block-merge path
(``src/socr/pipeline/reconciler.py:137-302``): a primary extraction is
improved by grafting better-formatted LaTeX from a math-specialist
source.  Blocks are matched by normalized content (containment, else
token-Jaccard > 0.6) and replaced in place; when the primary has no
LaTeX at all, display blocks are inserted at an equation-reference
phrase or the first paragraph break.

Everything is a pure function over two strings, so the Spark operator
is a single Arrow map pass (``operators/reconcile.py``) — reconciliation
never needs a shuffle: both texts are already columns of the same row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# reference reconciler.py:150,160,171
_DISPLAY_RE = re.compile(r"\$\$([^$]+)\$\$", re.DOTALL)
_ENV_RE = re.compile(
    r"\\begin\{(equation|align|gather|multline)\*?\}(.+?)\\end\{\1\*?\}",
    re.DOTALL,
)
_INLINE_RE = re.compile(r"(?<!\$)\$(?!\$)([^$]+)\$(?!\$)")

_TOKEN_RE = re.compile(r"\\?\w+")

# reference reconciler.py:281-289 — searched in this order
_INSERTION_PATTERNS = [
    r"equation\s*\(\d+\)",
    r"formula\s*\(\d+\)",
    r"as follows:",
    r"given by:",
    r"defined as:",
    r"where:",
]

JACCARD_MATCH_THRESHOLD = 0.6  # reference reconciler.py:272


@dataclass
class LatexBlock:
    content: str
    is_display: bool
    start_pos: int
    end_pos: int
    normalized: str


def normalize_latex(latex: str) -> str:
    """Whitespace/format-insensitive form (reconciler.py:186-192)."""
    normalized = re.sub(r"\s+", " ", latex.strip())
    normalized = normalized.replace(r"\ ", " ")
    normalized = normalized.replace(r"\,", " ")
    return normalized


def extract_latex_blocks(text: str) -> list[LatexBlock]:
    """All $$..$$, \\begin{env}..\\end{env} and $..$ blocks, sorted by
    position (reconciler.py:137-184)."""
    blocks: list[LatexBlock] = []
    for m in _DISPLAY_RE.finditer(text):
        blocks.append(
            LatexBlock(m.group(0), True, m.start(), m.end(),
                       normalize_latex(m.group(1)))
        )
    for m in _ENV_RE.finditer(text):
        blocks.append(
            LatexBlock(m.group(0), True, m.start(), m.end(),
                       normalize_latex(m.group(2)))
        )
    for m in _INLINE_RE.finditer(text):
        blocks.append(
            LatexBlock(m.group(0), False, m.start(), m.end(),
                       normalize_latex(m.group(1)))
        )
    blocks.sort(key=lambda b: b.start_pos)
    return blocks


def latex_blocks_match(block1: LatexBlock, block2: LatexBlock) -> bool:
    """Same equation? (reconciler.py:252-274): same display mode, then
    normalized containment, then token-Jaccard > 0.6."""
    if block1.is_display != block2.is_display:
        return False
    norm1 = block1.normalized.lower()
    norm2 = block2.normalized.lower()
    if norm1 in norm2 or norm2 in norm1:
        return True
    t1 = set(_TOKEN_RE.findall(norm1))
    t2 = set(_TOKEN_RE.findall(norm2))
    common = t1 & t2
    total = t1 | t2
    return bool(total) and len(common) / len(total) > JACCARD_MATCH_THRESHOLD


def find_insertion_point(text: str, latex_block: LatexBlock) -> int:
    """Where to insert an orphan display block (reconciler.py:276-301):
    after the first equation-reference phrase (pattern-priority order,
    not position order), else the first paragraph break, else -1."""
    for pattern in _INSERTION_PATTERNS:
        m = re.search(pattern, text, re.IGNORECASE)
        if m:
            return m.end()
    para_break = text.find("\n\n")
    if para_break > 0:
        return para_break
    return -1


def merge_latex_into_text(
    base_text: str, latex_source_text: str
) -> tuple[str, int]:
    """Graft LaTeX from ``latex_source_text`` into ``base_text``
    (reconciler.py:194-250).  Returns (merged_text, n_blocks_merged).

    * source has no LaTeX -> base unchanged.
    * base has no LaTeX  -> insert each display block at an insertion
      point (re-searched on the progressively merged text).
    * both have LaTeX    -> each source block replaces the first base
      block it matches (all occurrences of that block's text, matching
      the reference's str.replace semantics).
    """
    base_blocks = extract_latex_blocks(base_text)
    source_blocks = extract_latex_blocks(latex_source_text)

    if not source_blocks:
        return base_text, 0

    if not base_blocks:
        merged = base_text
        merged_count = 0
        for block in source_blocks:
            if block.is_display:
                insertion_point = find_insertion_point(merged, block)
                if insertion_point >= 0:
                    merged = (
                        merged[:insertion_point]
                        + "\n\n" + block.content + "\n\n"
                        + merged[insertion_point:]
                    )
                    merged_count += 1
        return merged, merged_count

    merged = base_text
    replacements = 0
    for source_block in source_blocks:
        for base_block in base_blocks:
            if latex_blocks_match(base_block, source_block):
                merged = merged.replace(base_block.content, source_block.content)
                replacements += 1
                break
    return merged, replacements
