"""J5 LaTeX reconciliation kernel — behaviors mirror reference
``reconciler.py:137-302`` (block extraction, normalization, matching,
positional insertion, replacement merge)."""

from __future__ import annotations

from smart_ocr_spark.kernel import reconcile as R


class TestExtract:
    def test_display_math(self):
        blocks = R.extract_latex_blocks("before $$a+b$$ after")
        assert len(blocks) == 1
        assert blocks[0].is_display
        assert blocks[0].content == "$$a+b$$"
        assert blocks[0].normalized == "a+b"

    def test_inline_math(self):
        blocks = R.extract_latex_blocks("value $x_i$ here")
        assert len(blocks) == 1
        assert not blocks[0].is_display
        assert blocks[0].content == "$x_i$"

    def test_environment(self):
        text = "\\begin{equation}E = mc^2\\end{equation}"
        blocks = R.extract_latex_blocks(text)
        assert len(blocks) == 1
        assert blocks[0].is_display
        assert blocks[0].normalized == "E = mc^2"

    def test_starred_environment(self):
        text = "\\begin{align*}x &= 1\\end{align*}"
        blocks = R.extract_latex_blocks(text)
        assert len(blocks) == 1

    def test_inline_does_not_match_display(self):
        blocks = R.extract_latex_blocks("$$d$$ and $i$")
        kinds = sorted((b.is_display, b.content) for b in blocks)
        assert kinds == [(False, "$i$"), (True, "$$d$$")]

    def test_sorted_by_position(self):
        blocks = R.extract_latex_blocks("$b$ then $$a$$")
        assert [b.content for b in blocks] == ["$b$", "$$a$$"]


class TestNormalizeAndMatch:
    def test_normalize_whitespace(self):
        assert R.normalize_latex("  a  +\n b ") == "a + b"
        assert R.normalize_latex(r"a\ b") == "a b"
        assert R.normalize_latex(r"a\,b") == "a b"

    def _blk(self, content, display=True):
        return R.LatexBlock(content, display, 0, len(content),
                            R.normalize_latex(content.strip("$")))

    def test_containment_match(self):
        assert R.latex_blocks_match(self._blk("$$a + b = c$$"),
                                    self._blk("$$a + b$$"))

    def test_jaccard_match(self):
        # tokens {x,y,7} identical though spacing differs entirely
        assert R.latex_blocks_match(self._blk("$$ x + y = 7 $$"),
                                    self._blk("$$x+y=7$$"))

    def test_display_mode_mismatch(self):
        assert not R.latex_blocks_match(self._blk("$$a$$", True),
                                        self._blk("$a$", False))

    def test_disjoint_no_match(self):
        assert not R.latex_blocks_match(self._blk("$$alpha + beta$$"),
                                        self._blk("$$gamma - delta$$"))


class TestMerge:
    def test_no_source_latex_unchanged(self):
        merged, n = R.merge_latex_into_text("plain text", "also plain")
        assert merged == "plain text" and n == 0

    def test_replacement_merge(self):
        base = "Intro. $$ x + y = 7 $$ End."
        src = "Better: $$x+y=7$$"
        merged, n = R.merge_latex_into_text(base, src)
        assert merged == "Intro. $$x+y=7$$ End."
        assert n == 1

    def test_insertion_after_reference_phrase(self):
        base = "The answer is given by: the following."
        src = "$$E = mc^2$$"
        merged, n = R.merge_latex_into_text(base, src)
        assert n == 1
        assert merged == (
            "The answer is given by:\n\n$$E = mc^2$$\n\n the following."
        )

    def test_insertion_at_paragraph_break(self):
        base = "First paragraph.\n\nSecond paragraph."
        src = "$$a = b$$"
        merged, n = R.merge_latex_into_text(base, src)
        assert n == 1
        assert merged.startswith("First paragraph.\n\n$$a = b$$")

    def test_inline_source_not_inserted(self):
        # only display blocks are inserted into latex-free bases
        merged, n = R.merge_latex_into_text("Given by: text.", "$x$")
        assert n == 0 and merged == "Given by: text."

    def test_no_insertion_point(self):
        merged, n = R.merge_latex_into_text("oneline", "$$a$$")
        assert n == 0 and merged == "oneline"

    def test_unmatched_blocks_left_alone(self):
        base = "Has $$alpha + beta$$ already."
        src = "$$gamma - delta$$"
        merged, n = R.merge_latex_into_text(base, src)
        assert merged == base and n == 0
