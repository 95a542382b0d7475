"""Edit-distance metrics and consensus attempt scoring.

Re-implements the reference's scoring semantics:
  - Levenshtein / WER / CER / NES: ``src/socr/benchmark/scorer.py:42-145``
    and ``src/socr/pipeline/consensus.py:56-100`` (the two are duplicated in
    the reference; here there is one copy).
  - Structure counting + grounded/ungrounded attempt scores + agreement:
    ``src/socr/pipeline/consensus.py:108-221``.

Pure Python, deterministic, O(min(m,n)) space DP — runs inside Arrow-batch
UDFs.  The char-level distance is also available JVM-side as
``F.levenshtein``; the word-level distance needs this kernel.
"""

from __future__ import annotations

import math
import re
from collections.abc import Sequence


def levenshtein(seq_a: Sequence, seq_b: Sequence) -> int:
    """Edit distance (reference scorer.py:42-76) — identical integers,
    faster constants:

      * common prefix/suffix stripped first (a standard edit-distance
        invariant: matching ends never contribute) — near-identical
        inputs, the overwhelmingly common case in attempt scoring,
        collapse to a DP over just the differing middle;
      * the inner DP row is vectorized with numpy past a small size
        (the sequential ``curr[j-1]+1`` chain becomes an exact
        min-plus prefix via ``minimum.accumulate``); the scalar DP
        remains for short remainders where numpy overhead loses.
    """
    m, n = len(seq_a), len(seq_b)
    # strip the common prefix, then the common suffix of the remainder
    start = 0
    stop = min(m, n)
    while start < stop and seq_a[start] == seq_b[start]:
        start += 1
    end_a, end_b = m, n
    while end_a > start and end_b > start and seq_a[end_a - 1] == seq_b[end_b - 1]:
        end_a -= 1
        end_b -= 1
    seq_a, seq_b = seq_a[start:end_a], seq_b[start:end_b]
    m, n = len(seq_a), len(seq_b)
    if m < n:
        seq_a, seq_b = seq_b, seq_a
        m, n = n, m
    if n == 0:
        return m
    if n >= 24:
        try:
            return _levenshtein_np(seq_a, seq_b, n)
        except TypeError:
            # unhashable elements can't be dictionary-encoded; the
            # public contract is any Sequence — fall through to the
            # scalar DP, which only needs equality
            pass
    prev = list(range(n + 1))
    curr = [0] * (n + 1)
    for i in range(1, m + 1):
        curr[0] = i
        ai = seq_a[i - 1]
        for j in range(1, n + 1):
            cost = 0 if ai == seq_b[j - 1] else 1
            curr[j] = min(curr[j - 1] + 1, prev[j] + 1, prev[j - 1] + cost)
        prev, curr = curr, prev
    return prev[n]


def _levenshtein_np(seq_a: Sequence, seq_b: Sequence, n: int) -> int:
    """Row-vectorized DP, exact: ``cand[j] = min(prev[j]+1,
    prev[j-1]+cost)`` is elementwise; the remaining left-to-right
    recurrence ``curr[j] = min(cand[j], curr[j-1]+1)`` equals
    ``min over i<=j of cand'[i] + (j-i)`` (cand'[0] = row index), an
    exact min-plus prefix computed as ``minimum.accumulate(cand[j]-j)
    + j``.  Elements are dictionary-encoded to int64 so the equality
    scan is a C-level compare."""
    import numpy as np

    code: dict = {}
    b_enc = np.fromiter(
        (code.setdefault(x, len(code)) for x in seq_b), dtype=np.int64, count=n
    )
    a_enc = [code.setdefault(x, len(code)) for x in seq_a]
    idx = np.arange(n + 1, dtype=np.int64)
    prev = idx.copy()
    buf = np.empty(n + 1, dtype=np.int64)
    for i, ai in enumerate(a_enc, 1):
        cost = (b_enc != ai).astype(np.int64)
        cand = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        buf[0] = i
        np.subtract(cand, idx[1:], out=buf[1:])
        prev = np.minimum.accumulate(buf) + idx
    return int(prev[n])


def wer(hypothesis: str, reference: str) -> float:
    """Word Error Rate = dist(ref_words, hyp_words)/len(ref_words).

    Lowercased word tokens (reference consensus.py:85-100).  0.0 when both
    empty, 1.0 when only the reference is empty; may exceed 1.0.
    """
    if hypothesis == reference:
        # identical strings ⇒ identical word lists ⇒ distance 0 — and
        # the both-empty branch below also returns 0.0, so this fast
        # path is exact.  Agreement between byte-identical attempts is
        # the common case in the selection pass.
        return 0.0
    ref_words = reference.lower().split()
    hyp_words = hypothesis.lower().split()
    if not ref_words:
        return 0.0 if not hyp_words else 1.0
    return levenshtein(ref_words, hyp_words) / len(ref_words)


def wer_cased(predicted: str, ground_truth: str) -> float:
    """Benchmark-harness WER: case-sensitive split (scorer.py:87-107)."""
    ref_words = ground_truth.split()
    hyp_words = predicted.split()
    if not ref_words:
        return 0.0 if not hyp_words else 1.0
    return levenshtein(ref_words, hyp_words) / len(ref_words)


def cer(predicted: str, ground_truth: str) -> float:
    """Character Error Rate (reference scorer.py:109-125)."""
    if not ground_truth:
        return 0.0 if not predicted else 1.0
    return levenshtein(list(ground_truth), list(predicted)) / len(ground_truth)


def nes(predicted: str, ground_truth: str) -> float:
    """Normalized Edit Similarity = 1 - dist/max(len) (scorer.py:127-145)."""
    if not ground_truth and not predicted:
        return 1.0
    if not ground_truth or not predicted:
        return 0.0
    dist = levenshtein(list(predicted), list(ground_truth))
    return 1.0 - dist / max(len(predicted), len(ground_truth))


_STRUCT_LIST_RE = re.compile(r"^[-*+]\s")
_STRUCT_NUM_RE = re.compile(r"^\d+\.\s")


def count_structure(text: str) -> int:
    """Count markdown headers / table rows / list items (consensus.py:108-119)."""
    count = 0
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("#"):
            count += 1
        elif s.startswith("|") and s.endswith("|"):
            count += 1
        elif _STRUCT_LIST_RE.match(s) or _STRUCT_NUM_RE.match(s):
            count += 1
    return count


def score_attempt_grounded(
    text: str, audit_passed: bool, word_count: int, reference_text: str
) -> float:
    """Grounded consensus score (reference consensus.py:137-169).

    (1 - min(WER,2))*70 + 15*audit - 20*hallucination + 5*min(struct_ratio,1).
    """
    wer_clamped = min(wer(text, reference_text), 2.0)
    fidelity = (1.0 - wer_clamped) * 70.0
    audit_bonus = 15.0 if audit_passed else 0.0
    ref_wc = len(reference_text.split())
    hallucination_penalty = -20.0 if ref_wc > 0 and word_count > ref_wc * 1.5 else 0.0
    ref_struct = max(count_structure(reference_text), 1)
    struct_bonus = 5.0 * min(count_structure(text) / ref_struct, 1.0)
    return fidelity + audit_bonus + hallucination_penalty + struct_bonus


def score_attempt_ungrounded(
    text: str, audit_passed: bool, word_count: int, confidence: float
) -> float:
    """Ungrounded consensus score (reference consensus.py:172-191).

    log1p(wc) + 5*log1p(struct) + 10*audit + 5*confidence.
    """
    return (
        math.log1p(word_count)
        + math.log1p(count_structure(text)) * 5.0
        + (10.0 if audit_passed else 0.0)
        + confidence * 5.0
    )


def score_attempt(
    text: str,
    audit_passed: bool,
    word_count: int,
    confidence: float,
    reference_text: str = "",
) -> float:
    """Grounded when a reference exists, else ungrounded (consensus.py:122-134)."""
    if reference_text.strip():
        return score_attempt_grounded(text, audit_passed, word_count, reference_text)
    return score_attempt_ungrounded(text, audit_passed, word_count, confidence)


def agreement(text_a: str, text_b: str) -> float:
    """Sequence-aware agreement = max(0, 1 - WER) (consensus.py:199-207)."""
    return max(0.0, 1.0 - wer(text_a, text_b))


def pairwise_agreement(texts: Sequence[str]) -> float:
    """Average pairwise agreement over all pairs (consensus.py:210-221)."""
    n = len(texts)
    if n < 2:
        return 1.0
    total = 0.0
    count = 0
    for i in range(n):
        for j in range(i + 1, n):
            total += agreement(texts[i], texts[j])
            count += 1
    return total / count if count else 1.0
