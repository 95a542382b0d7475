"""Golden-parity tests for the normalization contract.

Mirrors the reference's tests/test_normalizer.py byte-level assertions
(engine-specific strips, generic pass, idempotency, phantom images).
"""

from smart_ocr_spark.kernel.normalize import (
    clean_output,
    normalize,
    strip_phantom_images,
)


def _n(text: str, variant: str = "") -> str:
    return normalize(text, variant)


class TestGroundingVariant:
    def test_ref_tags_removed(self):
        assert _n("Hello <|ref|>some ref<|/ref|> world", "deepseek") == "Hello  world"

    def test_det_tags_removed(self):
        assert _n("Token <|det|>[[10,20,30,40]]<|/det|> rest", "deepseek") == "Token  rest"

    def test_bare_special_tokens_removed(self):
        assert _n("<|im_start|>system\nContent<|im_end|>", "deepseek") == "system\nContent"

    def test_bare_bounding_boxes_removed(self):
        assert _n("Text [[100, 200, 300, 400]] more", "deepseek") == "Text  more"

    def test_html_br_converted(self):
        assert (
            _n("Line one<br/>Line two<BR>Line three", "deepseek")
            == "Line one\nLine two\nLine three"
        )

    def test_html_tags_stripped(self):
        assert _n("<div>Some <b>bold</b> text</div>", "deepseek") == "Some bold text"

    def test_variant_aliases(self):
        for v in ("glm", "deepseek-vllm", "grounded", "DEEPSEEK", "DeepSeek"):
            assert _n("Hello <|ref|>x<|/ref|> world", v) == "Hello  world"


class TestMetaHeaderVariant:
    def test_standalone_header(self):
        assert _n("# OCR Results\n\nActual content here.", "mistral") == "Actual content here."

    def test_metadata_lines_stripped(self):
        text = "**Original File:** paper.pdf\n**Processed:** 2025-01-01\n\nReal content."
        assert _n(text, "mistral") == "Real content."

    def test_mixed(self):
        text = (
            "# OCR Results\n\n**Original File:** test.pdf\n"
            "**Processing Time:** 5s\n\nBody text."
        )
        assert _n(text, "mistral") == "Body text."


class TestLatexVariant:
    def test_preamble_stripped(self):
        text = (
            "\\documentclass{article}\n\\usepackage{amsmath}\n"
            "\\begin{document}\nReal content here."
        )
        assert _n(text, "nougat") == "Real content here."

    def test_end_stripped(self):
        assert _n("Some content.\n\\end{document}\n", "nougat") == "Some content."

    def test_preamble_with_options(self):
        text = "\\documentclass[12pt]{article}\n\\begin{document}\nBody."
        assert _n(text, "nougat") == "Body."


class TestPagedVariant:
    def test_missing_page_post(self):
        r = _n("Page 1 content\n\n[MISSING_PAGE_POST]\n\nPage 3 content", "marker")
        assert "[MISSING_PAGE_POST]" not in r
        assert "Page 1 content" in r and "Page 3 content" in r

    def test_missing_page_post_numbered(self):
        assert "[MISSING_PAGE_POST:5]" not in _n("Content [MISSING_PAGE_POST:5] more", "marker")

    def test_missing_page_empty(self):
        r = _n("Before [MISSING_PAGE_EMPTY:2] after", "marker")
        assert "[MISSING_PAGE_EMPTY:2]" not in r
        assert "Before" in r and "after" in r


class TestGeneric:
    def test_crlf(self):
        assert "\r" not in _n("Line one\r\nLine two\r\nLine three")

    def test_bare_cr(self):
        assert _n("Line one\rLine two") == "Line one\nLine two"

    def test_collapse_blank(self):
        assert _n("Para 1\n\n\n\n\nPara 2") == "Para 1\n\nPara 2"

    def test_two_blank_preserved(self):
        assert _n("Para 1\n\nPara 2") == "Para 1\n\nPara 2"

    def test_trailing_ws(self):
        for line in _n("Line one   \nLine two\t\nLine three").split("\n"):
            assert line == line.rstrip()

    def test_smart_quotes(self):
        assert _n("\u201cHello\u201d and \u2018world\u2019") == "\"Hello\" and 'world'"

    def test_dashes_ellipsis(self):
        assert _n("word\u2014word") == "word--word"
        assert _n("pages 1\u20135") == "pages 1-5"
        assert _n("and so on\u2026") == "and so on..."

    def test_ligatures(self):
        assert _n("the \ufb01rst finding") == "the first finding"
        assert _n("\ufb02ow of data") == "flow of data"
        assert _n("e\ufb00ect") == "effect"
        assert _n("e\ufb03cient") == "efficient"
        assert _n("ba\ufb04e") == "baffle"

    def test_nfkc(self):
        r = _n("x\u00b2 + y\u00b2")
        assert "\u00b2" not in r and "2" in r

    def test_fence_unwrap(self):
        assert _n("```markdown\n# Title\n\nBody.\n```") == "# Title\n\nBody."

    def test_partial_fence_kept(self):
        r = _n("before\n```python\ncode\n```\nafter")
        assert "```" in r

    def test_line_repeat_collapse(self):
        line = "This line is long enough to count."
        text = "\n".join([line] * 6) + "\nEnd."
        r = _n(text)
        assert r.count(line) == 1

    def test_empty(self):
        assert _n("") == ""

    def test_whitespace_only(self):
        assert _n("   \n\n  ") == ""


class TestIdempotency:
    CASES = [
        ("A normal paragraph.\n\nAnother paragraph.", ""),
        ("Hello <|ref|>ref<|/ref|> world <|det|>[[1,2,3,4]]<|/det|>", "deepseek"),
        ("# OCR Results\n\n**Original File:** foo.pdf\n\nBody.", "mistral"),
        ("\\documentclass{article}\n\\begin{document}\nContent.\n\\end{document}", "nougat"),
        ("Before [MISSING_PAGE_POST] after", "marker"),
        ("\u201cquoted\u201d \u2014 em \u2013 en \ufb01 ligature", ""),
    ]

    def test_idempotent(self):
        for text, variant in self.CASES:
            first = _n(text, variant)
            assert _n(first, variant) == first


class TestCleanOutput:
    def test_frontmatter_and_normalize(self):
        raw = "---\ntitle: Test\n---\n\nContent with trailing ws   \n\n\n\n\nMore."
        assert clean_output(raw, "gemini") == "Content with trailing ws\n\nMore."

    def test_meta_block_and_normalize(self):
        raw = (
            "# OCR Results\n\n**Original File:** paper.pdf\n"
            "**Processed:** 2025-01-01\n\n---\n"
            "Body text with \u201csmart quotes\u201d."
        )
        assert clean_output(raw, "mistral") == 'Body text with "smart quotes".'

    def test_no_variant(self):
        assert clean_output("Simple text\r\nwith CRLF") == "Simple text\nwith CRLF"


class TestPhantomImages:
    def test_strips_relative(self):
        r = strip_phantom_images("Before\n\n![img](img-0.jpeg)\n\nAfter")
        assert "![img]" not in r and "Before" in r and "After" in r

    def test_strips_dotted_path(self):
        r = strip_phantom_images("Content\n\n![Page 1](./extracted_images/p1.png)\n\nMore")
        assert "![Page 1]" not in r

    def test_preserves_http(self):
        t = "See ![logo](https://example.com/logo.png) here"
        assert "![logo](https://example.com/logo.png)" in strip_phantom_images(t)

    def test_preserves_data_uri(self):
        t = "Inline ![x](data:image/png;base64,abc) end"
        assert "![x](data:image/png;base64,abc)" in strip_phantom_images(t)

    def test_noop_without_images(self):
        t = "Plain text without any images."
        assert strip_phantom_images(t) == t

    def test_blank_lines_collapsed(self):
        r = strip_phantom_images("A\n\n![x](phantom.png)\n\n\n\nB")
        assert "\n\n\n" not in r


class TestGateEquivalence:
    """The fast-path gates in normalize_generic must be byte-identical to
    the ungated regex chain (kernel/normalize.py docstring contract)."""

    @staticmethod
    def _ungated(text: str) -> str:
        import re
        import unicodedata

        from smart_ocr_spark.kernel import normalize as N

        text = text.replace("\r\n", "\n").replace("\r", "\n")
        m = N._RE_MD_FENCE.match(text.strip())
        if m:
            text = m.group(1)
        text = N._RE_LINE_REPEAT.sub(r"\1\n", text)
        text = unicodedata.normalize("NFKC", text)
        for s, d in N._UNICODE_MAP:
            text = text.replace(s, d)
        text = N._RE_TRAILING_WS.sub("", text)
        text = N._RE_EXCESS_BLANK.sub("\n\n", text)
        return text.strip()

    def test_fuzz_against_ungated_chain(self):
        import random

        from smart_ocr_spark.kernel.normalize import normalize_generic

        rng = random.Random(20260816)
        atoms = [
            "a", "b", " ", "\t", "\n", "\r", "\r\n", "‘", "“",
            "—", "ﬁ", "\xa0", "x" * 25 + "\n", ("y" * 22 + "\n") * 6,
            ("z" * 19 + "\n") * 6, "\n\n\n\n", " \n", "\t\n", "```\n",
            "```markdown\n", "q \n", "  ", "word ",
        ]
        for _ in range(20000):
            s = "".join(
                rng.choice(atoms) for _ in range(rng.randrange(0, 12))
            )
            assert normalize_generic(s) == self._ungated(s), repr(s)
