"""Audit battery + failure-mode classification tests (reference
tests/test_audit_heuristics.py + tests/test_failure_scorer.py analogs)."""

from smart_ocr_spark.kernel import audit

GOOD_TEXT = (
    "This is a reasonably long passage of clean prose that should pass "
    "every audit heuristic without trouble. It has normal words, normal "
    "punctuation, and a sensible average word length. " * 3
)


def test_good_text_passes():
    r = audit.check(GOOD_TEXT)
    assert r["audit_passed"] is True
    assert r["primary_failure"] == audit.NONE
    assert r["failure_modes"] == []
    assert r["word_count"] >= 50


def test_empty_output():
    r = audit.check("")
    assert r["audit_passed"] is False
    assert r["primary_failure"] == audit.EMPTY_OUTPUT
    assert r["failure_confidence"] == 0.75


def test_whitespace_only():
    assert audit.check("   \n\t ")["primary_failure"] == audit.EMPTY_OUTPUT


def test_refusal_early_exit():
    r = audit.check("I'm sorry, I cannot process this image.")
    assert r["primary_failure"] == audit.REFUSAL
    # early exit: no other metrics recorded
    assert r["errors"] == ["LLM refusal"]


def test_refusal_buried_in_long_text_ok():
    # "I am sorry" after the first 500 chars of >=200-word text is fine
    text = GOOD_TEXT * 3 + " He said I am sorry about that."
    assert len(text.split()) >= 200
    r = audit.check(text)
    assert r["primary_failure"] != audit.REFUSAL


def test_cid_artifacts_map_to_garbage():
    text = GOOD_TEXT + " (cid:123) "
    r = audit.check(text)
    assert audit.GARBAGE in r["failure_modes"]


def test_hallucination_loop():
    sentence = "The same sentence repeated again and again here. "
    text = GOOD_TEXT + sentence * 5
    r = audit.check(text)
    assert audit.HALLUCINATION in r["failure_modes"]
    assert r["primary_failure"] == audit.HALLUCINATION  # highest priority


def test_formatting_hallucination_needs_two():
    one = GOOD_TEXT + " Use a standard font."
    assert audit.HALLUCINATION not in audit.check(one)["failure_modes"]
    two = GOOD_TEXT + " Use a standard font. Times New Roman."
    assert audit.HALLUCINATION in audit.check(two)["failure_modes"]


def test_low_word_count():
    r = audit.check("short text only")
    assert audit.LOW_WORD_COUNT in r["failure_modes"]
    assert r["primary_failure"] == audit.LOW_WORD_COUNT


def test_truncation_multipage():
    text = "word " * 120  # 120 words over 6 pages = 20 wpp < 100
    r = audit.check(text, expected_pages=6)
    assert audit.TRUNCATED in r["failure_modes"]
    # truncated (3) > low_word_count (1)? word count is 120 >= 50 so only truncated
    assert r["primary_failure"] == audit.TRUNCATED


def test_truncation_skipped_few_pages():
    text = "word " * 120
    r = audit.check(text, expected_pages=5)
    assert audit.TRUNCATED not in r["failure_modes"]


def test_garbage_ratio():
    text = ("ok " * 60) + "☃" * 60  # snowmen are garbage chars
    r = audit.check(text)
    assert audit.GARBAGE in r["failure_modes"]


def test_math_dense_waiver():
    # >30% latex chars waive garbage
    text = ("x " * 60) + "\\{}^_$" * 200
    r = audit.check(text)
    assert r["math_dense"] is True
    assert audit.GARBAGE not in r["failure_modes"]


def test_avg_word_len_warning_only():
    text = "supercalifragilisticexpialidocious " * 60  # avg len 34 > 15
    r = audit.check(text)
    assert "Avg word length" in r["warnings"]
    assert r["audit_passed"] is True  # warning doesn't fail the audit


def test_priority_selection():
    # refusal (5) beats garbage (2): but refusal early-exits, so test
    # hallucination (6) vs truncated (3) vs low_wc (1)
    sentence = "Repeated sentence for the hallucination loop check. "
    text = "tiny " + sentence * 5  # low wc AND hallucination
    r = audit.check(text)
    assert audit.HALLUCINATION in r["failure_modes"]
    assert audit.LOW_WORD_COUNT in r["failure_modes"]
    assert r["primary_failure"] == audit.HALLUCINATION


def test_confidence_tiers():
    # two errors -> 0.95
    sentence = "Repeated sentence for the hallucination loop check. "
    r = audit.check("tiny " + sentence * 5)
    assert r["failure_confidence"] == 0.95
    # one error no warnings -> 0.75
    r = audit.check("just a few short words here")
    assert r["failure_confidence"] == 0.75


def test_repeated_patterns_warning():
    text = GOOD_TEXT + " aaaaaaa"
    r = audit.check(text)
    assert "Repeated patterns" in r["warnings"]
    assert r["audit_passed"] is True


def test_unicode_issues_warning():
    r = audit.check(GOOD_TEXT + " �")
    assert "Unicode issues" in r["warnings"]


def test_structure_detection():
    assert audit.has_structure("# Header\n\nbody") is True
    assert audit.has_structure("1. item\n2. item") is True
    assert audit.has_structure("- bullet") is True
    assert audit.has_structure("p1\n\np2\n\np3") is True
    assert audit.has_structure("plain single line") is False
