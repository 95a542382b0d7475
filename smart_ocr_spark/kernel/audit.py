"""Audit heuristics + failure-mode classification.

Re-implements the reference's quality battery and failure scorer:
  - ``HeuristicsChecker.check`` (``src/socr/audit/heuristics.py:85-221``):
    Q1 empty, Q2 refusal (early exit), Q3 CID, Q4 hallucination loops,
    Q5 formatting-instruction hallucination, Q6 word-count floor,
    Q7 truncation, Q8 avg word length band (warning), Q9 garbage ratio with
    math-dense waiver, Q10 unicode issues (warning), Q11 repeated patterns
    (warning), structure info.
  - ``FailureModeScorer`` (``src/socr/audit/scorer.py:19-151``): metric ->
    FailureMode mapping, priority-based primary selection, confidence from
    error/warning counts.

Returns plain dicts (Arrow-friendly); no Spark imports.  Thresholds default
to the reference's config values (``src/socr/core/config.py:122``).
"""

from __future__ import annotations

import re

# Failure modes (reference core/result.py:33-50). Strings, not enums, so the
# values land directly in DataFrame columns.
NONE = "none"
TIMEOUT = "timeout"
CLI_ERROR = "cli_error"
EMPTY_OUTPUT = "empty_output"
API_ERROR = "api_error"
MODEL_UNAVAILABLE = "model_unavailable"
AUDIT_FAILED = "audit_failed"
HALLUCINATION = "hallucination"
REFUSAL = "refusal"
GARBAGE = "garbage"
LOW_WORD_COUNT = "low_word_count"
TRUNCATED = "truncated"

# Priority for primary-failure selection (reference audit/scorer.py:19-26).
FAILURE_PRIORITY = {
    LOW_WORD_COUNT: 1,
    GARBAGE: 2,
    TRUNCATED: 3,
    EMPTY_OUTPUT: 4,
    REFUSAL: 5,
    HALLUCINATION: 6,
}

# LLM refusal patterns (reference heuristics.py:42-53), case-insensitive.
REFUSAL_PATTERNS = [
    r"I cannot read",
    r"I am sorry",
    r"I'm sorry",
    r"As an AI",
    r"I'm unable to",
    r"cannot process this image",
    r"I cannot assist",
    r"I can't read",
    r"unable to extract",
    r"cannot extract text",
]
_REFUSAL_RES = [re.compile(p, re.IGNORECASE) for p in REFUSAL_PATTERNS]
# single-alternation fast path: one scan decides "any refusal at all"
_REFUSAL_ANY_RE = re.compile(
    "|".join(f"(?:{p})" for p in REFUSAL_PATTERNS), re.IGNORECASE
)
# Every refusal pattern is a literal, so on ASCII text the IGNORECASE
# regex is exactly `lowered-literal in lowered-text` (ASCII case folding
# is trivial; only exotic Unicode foldings like U+017F 'ſ'→'s' differ,
# and those texts take the regex path).  C-speed `in` beats the
# 10-branch backtracking alternation ~10x on the clean-text majority.
_REFUSAL_LITERALS = [p.lower() for p in REFUSAL_PATTERNS]

# Formatting-instruction hallucination patterns (heuristics.py:56-71).
HALLUCINATION_PATTERNS = [
    r"Use a standard font",
    r"print on \d+\.?\d*\s*[x×]\s*\d+",
    r"Include (?:all )?(?:figures|tables|links|references)",
    r"Include links to other resources",
    r"Include page numbers",
    r"Include captions",
    r"Proofread your work",
    r"double[- ]spaced",
    r"single[- ]spaced",
    r"Times New Roman",
    r"formatting guidelines",
    r"submission guidelines",
    r"page margins",
]
_HALLUC_RES = [re.compile(p, re.IGNORECASE) for p in HALLUCINATION_PATTERNS]
_HALLUC_ANY_RE = re.compile(
    "|".join(f"(?:{p})" for p in HALLUCINATION_PATTERNS), re.IGNORECASE
)
# ASCII fast gate for the any-hallucination scan: a text can only match
# some pattern if it contains one of these case-folded literal stems
# (each regex pattern's longest mandatory literal; e.g. any match of
# `print on \d+...` must contain "print on ").  Literal `in` scans are
# C-speed; only texts passing the gate (or non-ASCII texts) pay the
# 13-branch regex.  Gate-positive does NOT imply a match — the regexes
# still decide — so semantics are exactly the old any().
_HALLUC_LITERAL_STEMS = [
    "use a standard font",
    "print on ",
    "include ",          # covers all three Include patterns
    "page numbers",
    "captions",
    "proofread your work",
    "spaced",            # covers double/single[- ]spaced
    "times new roman",
    "formatting guidelines",
    "submission guidelines",
    "page margins",
]

_CID_RE = re.compile(r"\(cid:\d+\)")
_SENTENCE_SPLIT_RE = re.compile(r"[.!?]\s+")
_GARBAGE_CHAR_RE = re.compile(r"[^\w\s.,!?;:\'\"()\[\]{}<>@#$%&*+=/\\-]")
_EXCESS_WS_RE = re.compile(r"\s{4,}")
_PUA_RE = re.compile("[\ue000-\uf8ff]")
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
_REPEAT_CHAR_RE = re.compile(r"(.)\1{4,}")
_REPEAT_WORD_RE = re.compile(r"\b(\w+)\s+\1\s+\1\b", re.IGNORECASE)
_ALTERNATING_RE = re.compile(r"(..)\1{3,}")
_MD_HEADER_RE = re.compile(r"^#+\s+\w", re.MULTILINE)
_NUM_LIST_RE = re.compile(r"^\d+\.\s+\w", re.MULTILINE)
_BULLET_RE = re.compile(r"^[-*•]\s+\w", re.MULTILINE)
_LATEX_CHARS = frozenset("\\{}^_$")
# Combined any-of scans for the boolean consumers in ``check`` — one
# pass over the text instead of three (identical truthiness: an
# alternation matches iff some branch matches).  Group numbers are
# per-branch so the backreferences stay correct; the word-repeat branch
# keeps its IGNORECASE via a scoped inline flag.
_REPEAT_ANY_RE = re.compile(
    r"(.)\1{4,}|(?i:\b(\w+)\s+\2\s+\2\b)|(..)\3{3,}"
)
_UNICODE_ANY_RE = re.compile("[\ue000-\uf8ff\x00-\x08\x0b\x0c\x0e-\x1f]")
_STRUCTURE_ANY_RE = re.compile(
    r"^(?:#+\s+\w|\d+\.\s+\w|[-*•]\s+\w)", re.MULTILINE
)

DEFAULT_MIN_WORD_COUNT = 50
DEFAULT_MAX_GARBAGE_RATIO = 0.15
DEFAULT_MIN_AVG_WORD_LENGTH = 2.0
DEFAULT_MAX_AVG_WORD_LENGTH = 15.0


def check_refusal(text: str) -> bool:
    """Refusal near the top of short output (heuristics.py:236-252).

    maxsplit bounds the tokenization cost on huge docs.  ASCII text
    takes the literal-scan fast path (provably identical to the
    IGNORECASE regex for literal patterns); anything else keeps the
    combined alternation (identical any() semantics either way).
    """
    is_short = len(text.split(None, 200)) < 200
    search_text = text if is_short else text[:500]
    if search_text.isascii():
        low = search_text.lower()
        return any(lit in low for lit in _REFUSAL_LITERALS)
    return bool(_REFUSAL_ANY_RE.search(search_text))


def check_cid_artifacts(text: str) -> bool:
    return bool(_CID_RE.search(text))


def check_hallucination_loops(text: str) -> bool:
    """Same >=20-char sentence 3x consecutively (heuristics.py:270-288)."""
    sentences = _SENTENCE_SPLIT_RE.split(text)
    if len(sentences) < 6:
        return False
    for i in range(len(sentences) - 2):
        s = sentences[i].strip()
        if len(s) < 20:
            continue
        if s == sentences[i + 1].strip() == sentences[i + 2].strip():
            return True
    return False


def count_formatting_hallucination(text: str) -> int:
    # the clean-case gate rejects the overwhelmingly common no-match
    # text cheaply; only gate-positive texts pay the per-pattern count.
    # ASCII texts gate on C-speed literal stems (a regex match implies
    # its stem is present, so the gate never drops a real match);
    # non-ASCII texts gate on the combined alternation as before.
    if text.isascii():
        low = text.lower()
        if not any(stem in low for stem in _HALLUC_LITERAL_STEMS):
            return 0
    elif not _HALLUC_ANY_RE.search(text):
        return 0
    return sum(1 for r in _HALLUC_RES if r.search(text))


def is_math_dense(text: str) -> bool:
    """>30% of chars in \\{}^_$ waives garbage (heuristics.py:259-268)."""
    if not text:
        return False
    latex_chars = sum(text.count(c) for c in _LATEX_CHARS)  # C-speed scans
    return latex_chars / len(text) > 0.30


def garbage_ratio(text: str) -> float:
    """Output-side garbage ratio (heuristics.py:290-303)."""
    if not text:
        return 0.0
    garbage_chars = len(_GARBAGE_CHAR_RE.findall(text))
    excessive_ws = len(_EXCESS_WS_RE.findall(text))
    return (garbage_chars + excessive_ws) / len(text)


def unicode_issues(text: str) -> list[str]:
    """Warning-level unicode problems (heuristics.py:305-332)."""
    issues = []
    if "�" in text:
        issues.append("replacement chars")
    if _PUA_RE.search(text):
        issues.append("private use chars")
    if _CTRL_RE.search(text):
        issues.append("control chars")
    return issues


def repeated_patterns(text: str) -> list[str]:
    """Warning-level OCR repetition artifacts (heuristics.py:334-350)."""
    issues = []
    if _REPEAT_CHAR_RE.search(text):
        issues.append("repeated chars")
    if _REPEAT_WORD_RE.search(text):
        issues.append("repeated words")
    if _ALTERNATING_RE.search(text):
        issues.append("alternating patterns")
    return issues


def has_structure(text: str) -> bool:
    """Recognizable markdown structure (heuristics.py:352-371); the
    combined alternation is one scan over the text instead of three
    (identical boolean)."""
    if _STRUCTURE_ANY_RE.search(text):
        return True
    return text.count("\n\n") > 1


def check(
    text: str,
    expected_pages: int = 0,
    min_word_count: int = DEFAULT_MIN_WORD_COUNT,
    max_garbage_ratio: float = DEFAULT_MAX_GARBAGE_RATIO,
    min_avg_word_length: float = DEFAULT_MIN_AVG_WORD_LENGTH,
    max_avg_word_length: float = DEFAULT_MAX_AVG_WORD_LENGTH,
) -> dict:
    """Run the full audit battery; mirrors heuristics.py:85-221.

    Returns a flat dict:
      passed BOOL, errors/warnings (metric-name lists), failure_modes
      (ordered, reference metric order), primary_failure STR, confidence
      DOUBLE, plus raw metrics (word_count, avg_word_len, garbage_ratio,
      words_per_page, has_structure, math_dense).
    """
    errors: list[str] = []
    warnings: list[str] = []
    # (metric_name, failure_mode) in check order — the reference appends
    # modes as metrics fail, so order here reproduces its modes list.
    failed_modes: list[str] = []

    def _fail(metric: str, mode: str | None, severity: str) -> None:
        if severity == "error":
            errors.append(metric)
        else:
            warnings.append(metric)
        if mode is not None and mode not in failed_modes:
            failed_modes.append(mode)

    base = {
        "word_count": 0,
        "avg_word_len": 0.0,
        "garbage_ratio": 0.0,
        "words_per_page": 0.0,
        "has_structure": False,
        "math_dense": False,
    }

    if not text or not text.strip():
        return _result(
            errors=["Empty output"], warnings=[], failed_modes=[EMPTY_OUTPUT], **base
        )

    # Q2: refusal — early exit (heuristics.py:104-111)
    if check_refusal(text):
        return _result(
            errors=["LLM refusal"], warnings=[], failed_modes=[REFUSAL], **base
        )

    # Q3: CID artifacts -> GARBAGE (audit/scorer.py:47)
    if check_cid_artifacts(text):
        _fail("CID artifacts", GARBAGE, "error")

    # Q4: hallucination loops
    if check_hallucination_loops(text):
        _fail("Hallucination loops", HALLUCINATION, "error")

    # Q5: formatting-instruction hallucination (>=2 patterns)
    if count_formatting_hallucination(text) >= 2:
        _fail("Formatting hallucination", HALLUCINATION, "error")

    # Q6: word-count floor
    words = text.split()
    word_count = len(words)
    if word_count < min_word_count:
        _fail("Word count", LOW_WORD_COUNT, "error")

    # Q7: truncation (>5 pages, <100 words/page)
    words_per_page = 0.0
    if expected_pages > 5 and word_count > 0:
        words_per_page = word_count / expected_pages
        if words_per_page < 100:
            _fail("Truncation check", TRUNCATED, "error")

    # Q8: avg word length band (warning only)
    avg_word_len = sum(len(w) for w in words) / len(words) if words else 0.0
    if words and not (min_avg_word_length <= avg_word_len <= max_avg_word_length):
        # Warning severity; maps to no failure mode in scorer._METRIC_MAP?
        # It does map ("Avg word length" is NOT in the reference map) — so
        # it affects confidence only.
        _fail("Avg word length", None, "warning")

    # Q9: garbage ratio with math-dense waiver
    math_dense = is_math_dense(text)
    g_ratio = garbage_ratio(text)
    if g_ratio > max_garbage_ratio and not math_dense:
        _fail("Garbage ratio", GARBAGE, "error")

    # Q10: unicode issues (warning) — combined single-scan truthiness
    # (the issue LABELS are only needed by the public unicode_issues)
    if "�" in text or _UNICODE_ANY_RE.search(text):
        _fail("Unicode issues", None, "warning")

    # Q11: repeated patterns (warning) — combined single-scan truthiness
    if _REPEAT_ANY_RE.search(text):
        _fail("Repeated patterns", None, "warning")

    return _result(
        errors=errors,
        warnings=warnings,
        failed_modes=failed_modes,
        word_count=word_count,
        avg_word_len=avg_word_len,
        garbage_ratio=g_ratio,
        words_per_page=words_per_page,
        has_structure=has_structure(text),
        math_dense=math_dense,
    )


def _select_primary(modes: list[str]) -> str:
    """Highest-priority mode wins (reference scorer.py:126-129)."""
    if not modes:
        return NONE
    return max(modes, key=lambda m: FAILURE_PRIORITY.get(m, 0))


def _confidence(error_count: int, warning_count: int) -> float:
    """Diagnosis confidence (reference scorer.py:131-151)."""
    if error_count >= 2:
        return 0.95
    if error_count == 1 and warning_count >= 1:
        return 0.85
    if error_count == 1:
        return 0.75
    return 0.5


def _result(
    errors: list[str],
    warnings: list[str],
    failed_modes: list[str],
    word_count: int,
    avg_word_len: float,
    garbage_ratio: float,
    words_per_page: float,
    has_structure: bool,
    math_dense: bool,
) -> dict:
    passed = not errors
    return {
        "audit_passed": passed,
        "errors": errors,
        "warnings": warnings,
        "failure_modes": [] if passed else failed_modes,
        "primary_failure": NONE if passed else _select_primary(failed_modes),
        "failure_confidence": 1.0
        if passed
        else _confidence(len(errors), len(warnings)),
        "word_count": word_count,
        "avg_word_len": avg_word_len,
        "garbage_ratio": garbage_ratio,
        "words_per_page": words_per_page,
        "has_structure": has_structure,
        "math_dense": math_dense,
    }
