"""Levenshtein / WER / CER / NES / consensus scoring unit vectors
(reference tests/test_benchmark.py:183-259, tests/test_consensus.py:77-108)."""

import math

from smart_ocr_spark.kernel import score


def test_levenshtein_identical():
    assert score.levenshtein(list("abc"), list("abc")) == 0


def test_levenshtein_substitution():
    assert score.levenshtein(list("abc"), list("axc")) == 1


def test_levenshtein_insertion_deletion():
    assert score.levenshtein(list("abc"), list("abxc")) == 1
    assert score.levenshtein(list("abxc"), list("abc")) == 1


def test_levenshtein_empty():
    assert score.levenshtein([], list("abc")) == 3
    assert score.levenshtein(list("abc"), []) == 3
    assert score.levenshtein([], []) == 0


def test_levenshtein_words():
    assert score.levenshtein("the cat sat".split(), "the dog sat".split()) == 1


def test_wer_basics():
    assert score.wer("the cat sat", "the cat sat") == 0.0
    assert score.wer("the dog sat", "the cat sat") == 1 / 3
    assert score.wer("", "") == 0.0
    assert score.wer("something", "") == 1.0
    assert score.wer("", "ref words here") == 1.0


def test_wer_case_insensitive():
    assert score.wer("The Cat", "the cat") == 0.0


def test_wer_cased_differs():
    assert score.wer_cased("The Cat", "the cat") == 1.0


def test_wer_above_one():
    assert score.wer("a b c d e f", "a") == 5.0


def test_cer():
    assert score.cer("abc", "abc") == 0.0
    assert score.cer("axc", "abc") == 1 / 3
    assert score.cer("", "") == 0.0
    assert score.cer("x", "") == 1.0


def test_nes():
    assert score.nes("abc", "abc") == 1.0
    assert score.nes("", "") == 1.0
    assert score.nes("", "abc") == 0.0
    assert score.nes("abcd", "abc") == 1.0 - 1 / 4


def test_count_structure():
    text = "# H1\n\n| a | b |\n| --- | --- |\n- item\n1. numbered\nplain"
    # header, 2 table rows, bullet, numbered = 5
    assert score.count_structure(text) == 5


def test_ungrounded_score_components():
    s = score.score_attempt_ungrounded("plain text", True, 100, 0.8)
    expected = math.log1p(100) + 0.0 + 10.0 + 4.0
    assert abs(s - expected) < 1e-9


def test_grounded_prefers_low_wer():
    ref = "the quick brown fox jumps over the lazy dog " * 5
    good = ref
    bad = "completely different words here " * 6
    s_good = score.score_attempt_grounded(good, True, len(good.split()), ref)
    s_bad = score.score_attempt_grounded(bad, True, len(bad.split()), ref)
    assert s_good > s_bad


def test_grounded_hallucination_penalty():
    ref = "short reference text here now"
    hyp = ref + " padded" * 20
    wc = len(hyp.split())
    s = score.score_attempt_grounded(hyp, False, wc, ref)
    s_no_pad = score.score_attempt_grounded(ref, False, len(ref.split()), ref)
    assert s < s_no_pad


def test_score_attempt_dispatch():
    assert score.score_attempt("x", True, 1, 1.0, "") == score.score_attempt_ungrounded(
        "x", True, 1, 1.0
    )
    ref = "a b c"
    assert score.score_attempt("a b c", True, 3, 1.0, ref) == score.score_attempt_grounded(
        "a b c", True, 3, ref
    )


def test_agreement():
    assert score.agreement("a b c", "a b c") == 1.0
    assert score.agreement("x y z", "a b c") == 0.0


def test_pairwise_agreement():
    assert score.pairwise_agreement(["same text"]) == 1.0
    assert score.pairwise_agreement(["a b", "a b", "a b"]) == 1.0
    v = score.pairwise_agreement(["a b c d", "a b c d", "x y z w"])
    assert 0.0 < v < 1.0
