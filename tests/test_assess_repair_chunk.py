"""Assessment cascade, repair routing policy matrix, chunk arithmetic
(reference tests/test_born_digital.py, tests/test_repair_router.py:154-247,
tests/test_chunker.py:30-205 analogs)."""

from smart_ocr_spark.kernel import assess, audit, chunk, repair

PROSE = (
    "This page has plenty of clean prose content with a perfectly normal "
    "word length distribution and no strange characters at all. " * 4
)


class TestAssess:
    def test_prose_is_born_digital(self):
        r = assess.assess_page(PROSE, font_count=2)
        assert r["is_born_digital"] is True
        assert r["native_text"] == PROSE.strip()
        assert r["confidence"] >= 0.8
        assert "born-digital: clean text layer detected" in r["notes"]

    def test_empty_page(self):
        r = assess.assess_page("")
        assert r["is_born_digital"] is False
        assert r["confidence"] == 0.95
        assert "insufficient text layer" in r["notes"][0]

    def test_sparse_page(self):
        r = assess.assess_page("Short Title Page Only Here Now Words Fill Pad More")
        assert r["is_born_digital"] is False
        assert r["confidence"] == 0.85

    def test_cid_page(self):
        text = ("word " * 20) + "(cid:42) " + ("word " * 10)
        r = assess.assess_page(text)
        assert r["is_born_digital"] is False
        assert r["confidence"] == 0.95

    def test_garbage_page(self):
        text = ("word " * 20) + ("�" * 30)
        r = assess.assess_page(text)
        assert r["is_born_digital"] is False
        assert r["confidence"] == 0.80

    def test_spaced_out_page(self):
        text = " ".join("a b c d e f g h i j" for _ in range(10)) + ("   " * 100)
        r = assess.assess_page(text)
        assert r["is_born_digital"] is False

    def test_short_words_page(self):
        text = " ".join("ab" for _ in range(60))
        r = assess.assess_page(text)
        assert r["is_born_digital"] is False
        assert r["confidence"] == 0.70

    def test_complex_content_needs_enhancement(self):
        r = assess.assess_page(PROSE, has_tables=True, structured_text="| a |")
        assert r["is_born_digital"] is True
        assert r["needs_ocr_enhancement"] is True
        assert r["native_text"] == "| a |"

    def test_confidence_bonuses(self):
        long_text = "clean words here again " * 80  # >300 words
        r = assess.assess_page(long_text, font_count=4)
        # 0.80 + .05 + .05 + .03 (clean) + .03 + .02 (fonts) + .02 (word len)
        assert r["confidence"] == 1.0


class TestDifficulty:
    def test_hints_force_hard(self):
        d, reasons = assess.classify_difficulty(has_tables_hint=True)
        assert d == assess.HARD
        assert reasons == ["tables detected (born-digital hint)"]
        d, _ = assess.classify_difficulty(has_equations_hint=True)
        assert d == assess.HARD

    def test_easy_default(self):
        d, reasons = assess.classify_difficulty(text_block_count=5)
        assert d == assess.EASY
        assert reasons == ["simple layout, clean content"]

    def test_hard_triggers(self):
        assert assess.classify_difficulty(table_count=1)[0] == assess.HARD
        assert assess.classify_difficulty(column_count=2)[0] == assess.HARD
        assert assess.classify_difficulty(drawing_count=21)[0] == assess.HARD
        assert assess.classify_difficulty(image_count=3)[0] == assess.HARD
        assert assess.classify_difficulty(text_block_count=31)[0] == assess.HARD
        assert (
            assess.classify_difficulty(text_block_count=0, image_count=1)[0]
            == assess.HARD
        )


class TestRepairRouter:
    def test_hallucination_different_family(self):
        # tried layout (struct family) -> pick first non-struct candidate
        v = repair.select_repair_variant(audit.HALLUCINATION, {"layout"})
        assert repair.FAMILIES[v] != "struct"

    def test_refusal_cloud(self):
        v = repair.select_repair_variant(audit.REFUSAL, {"basic"})
        assert v in repair.CLOUD_VARIANTS

    def test_garbage_capable(self):
        v = repair.select_repair_variant(audit.GARBAGE, {"basic"})
        assert v in repair.CAPABLE_VARIANTS

    def test_low_wc_capable(self):
        v = repair.select_repair_variant(audit.LOW_WORD_COUNT, {"raw"})
        assert v in repair.CAPABLE_VARIANTS

    def test_truncated_capable(self):
        v = repair.select_repair_variant(audit.TRUNCATED, set())
        assert v in repair.CAPABLE_VARIANTS

    def test_timeout_light(self):
        v = repair.select_repair_variant(audit.TIMEOUT, {"layout"})
        assert v in repair.LIGHT_VARIANTS

    def test_default_first_untried(self):
        assert repair.select_repair_variant(audit.EMPTY_OUTPUT, set()) == "layout"
        assert (
            repair.select_repair_variant(audit.EMPTY_OUTPUT, {"layout"}) == "density"
        )

    def test_exhausted_returns_none(self):
        assert (
            repair.select_repair_variant(audit.GARBAGE, set(repair.DEFAULT_CHAIN))
            is None
        )

    def test_all_families_tried_falls_back(self):
        tried = {"layout", "basic", "layout_alt"}
        v = repair.select_repair_variant(audit.HALLUCINATION, tried)
        assert v in repair.candidates(tried)

    def test_dominant_failure(self):
        assert repair.dominant_failure([]) == audit.EMPTY_OUTPUT
        assert repair.dominant_failure([audit.NONE]) == audit.EMPTY_OUTPUT
        assert (
            repair.dominant_failure([audit.GARBAGE, audit.NONE, audit.TIMEOUT])
            == audit.TIMEOUT
        )

    def test_build_reason(self):
        r = repair.build_reason(audit.GARBAGE, {"layout", "basic"}, "density")
        assert r == "failure=garbage, tried=[basic, layout], selected=density"


class TestChunk:
    def test_no_chunking_below_threshold(self):
        assert chunk.needs_chunking(30, threshold=30) is False
        assert chunk.needs_chunking(31, threshold=30) is True
        assert chunk.needs_chunking(20) is False
        assert chunk.needs_chunking(21) is True

    def test_single_chunk(self):
        assert chunk.chunk_ranges(15) == [(1, 1, 15)]

    def test_exact_multiple(self):
        assert chunk.chunk_ranges(40) == [(1, 1, 20), (2, 21, 40)]

    def test_remainder(self):
        assert chunk.chunk_ranges(45) == [(1, 1, 20), (2, 21, 40), (3, 41, 45)]

    def test_zero_pages(self):
        assert chunk.chunk_ranges(0) == []

    def test_custom_size(self):
        assert chunk.chunk_ranges(7, max_pages_per_chunk=3) == [
            (1, 1, 3),
            (2, 4, 6),
            (3, 7, 7),
        ]

    def test_invalid_size(self):
        import pytest

        with pytest.raises(ValueError):
            chunk.chunk_ranges(5, max_pages_per_chunk=0)

    def test_byte_buckets(self):
        assert chunk.byte_buckets(10) == 0
        assert chunk.byte_buckets(1 << 20) == 1
        assert chunk.byte_buckets(5 << 20) == 5


class TestScannedFixture:
    """Reference `scanned` benchmark category analog (rasterize.py:17-80,
    dataset.py:20): a rasterized, text-free, image-only PDF slice must
    classify as NOT born-digital, carry its image signals, extract no
    text at any variant, and route nowhere (graceful failure — there is
    no raster ladder in-kernel, S3 partial-by-design)."""

    def _scanned_pdf(self, n_pages=2):
        from smart_ocr_spark.sources.corpus import build_pdf

        return build_pdf([[] for _ in range(n_pages)],
                         image_pages=[True] * n_pages)

    def test_classify_not_born_digital(self):
        from smart_ocr_spark.kernel.extract import extract_payload_full

        out = extract_payload_full(self._scanned_pdf())
        assert out["parse_ok"] and out["is_pdf"]
        assert out["n_images"] == 2 and out["has_figures"]
        assert out["basic_text"] == "" and out["layout_text"] == ""
        assert out["total_chars"] == 0
        r = assess.assess_page(out["basic_text"], has_images=True)
        assert r["is_born_digital"] is False
        assert "insufficient text layer" in r["notes"][0]

    def test_no_variant_fabricates_text(self):
        from smart_ocr_spark.kernel.extract import extract_payload_variant

        pdf = self._scanned_pdf()
        for variant in ("basic", "raw", "layout", "density", "layout_alt"):
            got = extract_payload_variant(pdf, variant)
            assert got in ("", None), (variant, got)

    def test_audit_flags_empty_output(self):
        out = audit.check("")
        assert not out["audit_passed"]
        assert out["primary_failure"] == audit.EMPTY_OUTPUT
