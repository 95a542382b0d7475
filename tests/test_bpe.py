"""Distributed BPE training (functions/bpe.py): merge table must equal
a pure-python reference BPE (same tie-break: count desc, pair lex asc)
on the same corpus; segmentation compresses; dict-only Python pinned
by the plan."""

from __future__ import annotations

import contextlib
import io
import re
from collections import Counter

import pytest

from smart_ocr_spark.functions import bpe


def _reference_bpe(texts, n_merges, min_pair_count=2):
    """Sennrich-style BPE on the word-freq dict, python edition."""
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    freq = Counter()
    for t in texts:
        for w in ws.split((t or "").lower()):
            if w:
                freq[w] += 1
    seg = {w: list(w) + [bpe.END_OF_WORD] for w in freq}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, syms in seg.items():
            f = freq[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # count desc, then pair lexicographic asc
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        merges.append((rank, a, b, a + b, c))
        for w, syms in seg.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            seg[w] = res
    return merges


_TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "that cat is the fattest cat",
    "mats and cats and rats",
    "the rat sat with the cat on a mat",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame(
        list(enumerate(_TEXTS)), "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe.bpe_train(df, n_merges=12).orderBy("rank").collect()
    ]
    want = _reference_bpe(_TEXTS, 12)
    assert got == want
    assert len(got) >= 5  # the toy corpus supports a real merge chain


def test_bpe_train_early_stop(spark):
    """A corpus of unique characters has no pair ≥ 2: zero merges."""
    df = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    assert bpe.bpe_train(df, n_merges=5).count() == 0


def test_bpe_segment_compresses(spark):
    df = spark.createDataFrame(
        list(enumerate(_TEXTS)), "doc_id long, text string"
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe.bpe_train(df, n_merges=12).orderBy("rank").collect()
    ]
    out = {r.doc_id: r for r in bpe.bpe_segment(df, merges).collect()}
    for i, t in enumerate(_TEXTS):
        n_chars = sum(len(w) + 1 for w in t.split())
        assert out[i].n_tokens == len(t.split())
        # merged subwords are strictly fewer than raw characters
        assert out[i].n_subwords < n_chars
        assert out[i].n_subwords >= out[i].n_tokens


def test_bpe_corpus_pass_is_single_scan(spark):
    """The corpus is touched exactly once (word_freq); everything else
    runs on the dict — the plan of the pair-count step reads the dict
    relation, not the documents scan."""
    df = spark.createDataFrame(
        list(enumerate(_TEXTS)), "doc_id long, text string"
    )
    seg = bpe._initial_segmentation(bpe.word_freq(df))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bpe._pair_counts(seg).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan  # pair counting is pure JVM
