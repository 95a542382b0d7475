"""Round-2 parity closers: consensus discrepancies (A8/A9), truncation
retry routing (O6), columnar-numbers table heuristic (P10), dry-run (F4)
and filename sanitize (N13).  Cases mirror the reference tests named in
each docstring.
"""

from __future__ import annotations

import pytest

from smart_ocr_spark.kernel import assess, audit, consensus, normalize, repair


def _att(variant: str, word_count: int, passed: bool) -> dict:
    return {"variant": variant, "word_count": word_count, "audit_passed": passed}


class TestDiscrepancies:
    """Reference consensus.py:225-253 + tests/test_consensus.py:382-397."""

    def test_single_attempt_no_discrepancies(self):
        assert consensus.find_discrepancies([_att("layout", 100, True)]) == []

    def test_word_count_spread(self):
        # spread/avg = (40-1)/20.5 > 0.3 -> reported, sorted desc by wc
        discs = consensus.find_discrepancies(
            [_att("layout", 1, True), _att("density", 40, True)]
        )
        assert any("Word count" in d for d in discs)
        spread = next(d for d in discs if d.startswith("Word count spread"))
        assert spread == "Word count spread: density=40, layout=1"

    def test_no_spread_when_close(self):
        discs = consensus.find_discrepancies(
            [_att("layout", 100, True), _att("density", 95, True)]
        )
        assert not any("Word count" in d for d in discs)

    def test_audit_divergence(self):
        discs = consensus.find_discrepancies(
            [_att("layout", 100, True), _att("density", 100, False)]
        )
        assert discs == ["Audit divergence: passed=[layout], failed=[density]"]

    def test_no_divergence_when_all_pass(self):
        assert (
            consensus.find_discrepancies(
                [_att("layout", 100, True), _att("density", 100, True)]
            )
            == []
        )

    def test_duplicate_variant_last_status_wins(self):
        # dict semantics: a retried variant contributes its LAST status
        discs = consensus.find_discrepancies(
            [
                _att("layout", 100, False),
                _att("layout", 100, True),
                _att("density", 100, False),
            ]
        )
        assert discs == ["Audit divergence: passed=[layout], failed=[density]"]


class TestTruncationRetry:
    """Reference orchestrator.py:928-998 + config truncation_retries=1."""

    def test_truncated_retries_same_variant_first(self):
        v = repair.select_repair_variant(
            audit.TRUNCATED, {"layout"}, last_variant="layout",
            last_variant_runs=1,
        )
        assert v == "layout"

    def test_truncated_falls_back_after_retry_budget(self):
        v = repair.select_repair_variant(
            audit.TRUNCATED, {"layout"}, last_variant="layout",
            last_variant_runs=2,
        )
        # capable tier, excluding tried
        assert v == "density"

    def test_zero_budget_skips_retry(self):
        v = repair.select_repair_variant(
            audit.TRUNCATED, {"layout"}, last_variant="layout",
            last_variant_runs=1, truncation_retries=0,
        )
        assert v == "density"

    def test_other_failures_unaffected(self):
        v = repair.select_repair_variant(
            audit.GARBAGE, {"layout"}, last_variant="layout",
            last_variant_runs=1,
        )
        assert v == "density"

    def test_no_last_variant_falls_through(self):
        v = repair.select_repair_variant(audit.TRUNCATED, set())
        assert v == "layout"  # first capable in chain


class TestColumnarNumbers:
    """Reference born_digital.py:428-447 (P10)."""

    def test_columnar_dump_detected(self):
        text = "\n".join(str(i * 1.5) for i in range(20))
        assert assess.detect_columnar_numbers(text)

    def test_prose_not_detected(self):
        text = "\n".join(
            "a justified paragraph produces multi word lines" for _ in range(30)
        )
        assert not assess.detect_columnar_numbers(text)

    def test_count_floor(self):
        # 10 single-token lines: ratio passes but the >=15 floor does not
        text = "\n".join(str(i) for i in range(10))
        assert not assess.detect_columnar_numbers(text)

    def test_mixed_below_ratio(self):
        lines = [str(i) for i in range(16)] + [
            "some longer prose line here" for _ in range(20)
        ]
        assert not assess.detect_columnar_numbers("\n".join(lines))

    def test_empty(self):
        assert not assess.detect_columnar_numbers("")
        assert not assess.detect_columnar_numbers("\n\n  \n")

    def test_extract_pdf_columnar_table_flagged(self):
        # a borderless PDF table: 30 single-token cells, one per line
        from smart_ocr_spark.kernel.extract import extract_payload_full
        from smart_ocr_spark.sources.corpus import build_pdf

        lines = [
            (72.0, 700.0 - 14 * i, str(i * 3.25)) for i in range(30)
        ]
        r = extract_payload_full(build_pdf([lines]))
        assert r["parse_ok"] and r["is_pdf"]
        assert r["has_tables"], "borderless PDF table must be flagged (P10)"

    def test_extract_html_single_token_lines_not_flagged(self):
        # PDF-only heuristic (reference born_digital.py:415-447): an HTML
        # page of single-token lines (nav menu / tag cloud shape) must
        # NOT be misclassified as tabular
        from smart_ocr_spark.kernel.extract import extract_payload_full

        cells = "\n".join(str(i * 3.25) for i in range(30))
        html = f"<html><body><pre>{cells}</pre></body></html>".encode()
        r = extract_payload_full(html)
        assert r["parse_ok"] and not r["is_pdf"]
        assert not r["has_tables"]


class TestSanitize:
    """Reference engines/base.py:30-32 (N13)."""

    def test_passthrough(self):
        assert normalize.sanitize_filename("paper_2024.v1 final-draft") == (
            "paper_2024.v1 final-draft"
        )

    def test_replaces_specials(self):
        assert normalize.sanitize_filename("a/b\\c:d*e?f") == "a_b_c_d_e_f"

    def test_strips(self):
        assert normalize.sanitize_filename("  name  ") == "name"


class TestDryRun:
    """Reference orchestrator.py:171-178 (F4)."""

    def test_dry_run_reports_without_writing(self, spark, tmp_path):
        import os

        from smart_ocr_spark.plans.checkpoint import run_with_checkpoint
        from smart_ocr_spark.sources.corpus import corpus_df

        docs = corpus_df(spark, 40, seed=11).drop("text")
        out = str(tmp_path / "dryrun_out")
        stats = run_with_checkpoint(spark, docs, out, n_buckets=4, dry_run=True)
        assert stats["dry_run"] is True
        assert sorted(stats["would_process_buckets"]) == [0, 1, 2, 3]
        assert stats["would_process_rows"] == 40
        assert not os.path.exists(out)

        # a real run afterwards processes exactly what dry-run promised
        stats2 = run_with_checkpoint(spark, docs, out, n_buckets=4)
        assert stats2["processed_buckets"] == 4


class TestCalibrationChains:
    """Reference calibrate.py:295-320 (O11)."""

    def test_recommended_chains_rank_by_category_wer(self, spark):
        rows = [
            ("layout", "prose", 0.2), ("density", "prose", 0.1),
            ("basic", "prose", 0.3),
            ("layout", "tables", 0.05),
        ]
        cal = spark.createDataFrame(
            rows, "variant string, category string, avg_wer double"
        )
        from smart_ocr_spark.plans.benchmark import recommended_chains

        chains = recommended_chains(cal)
        # prose: ranked by in-category wer, then no-data variants by
        # overall avg wer (layout_alt/raw have none -> wer 1.0, name tiebreak)
        assert chains["prose"][:3] == ["density", "layout", "basic"]
        assert set(chains["prose"][3:]) == {"layout_alt", "raw"}
        # tables: only layout has data; rest by overall avg
        assert chains["tables"][0] == "layout"
        assert chains["tables"][1] == "density"  # overall 0.1 beats basic 0.3

    def test_run_extraction_accepts_chain(self, spark):
        from smart_ocr_spark.plans.extract_pipeline import run_extraction
        from smart_ocr_spark.sources.corpus import corpus_df

        docs = corpus_df(spark, 30, seed=5)
        out = run_extraction(spark, docs, chain=["layout", "basic"])
        got = {r["url"]: r["final_text"] for r in out.collect()}
        want = {r["url"]: r["text"] for r in docs.select("url", "text").collect()}
        assert got == want

    def test_router_honors_custom_chain(self):
        # garbage failure, capable tier preferred — but the custom chain
        # has no capable variants left, so the first untried chain entry wins
        v = repair.select_repair_variant(
            audit.GARBAGE, {"layout"}, chain=["layout", "raw"]
        )
        assert v == "raw"


class TestInlineFigures:
    """Figure metadata folded into the fused parse (ROADMAP gap 6) —
    the inline column must agree with the standalone fan-out operator."""

    def test_inline_matches_standalone(self, spark):
        from pyspark.sql import functions as F

        from smart_ocr_spark.operators.extract import figure_metadata
        from smart_ocr_spark.plans.extract_pipeline import run_extraction
        from smart_ocr_spark.sources.corpus import corpus_df

        docs = corpus_df(spark, 60, seed=3)
        res = run_extraction(spark, docs, with_figures=True)
        inline = {
            (r["url"], f["figure_num"], f["page_num"], f["figure_type"],
             f["x0"], f["y0"], f["x1"], f["y1"])
            for r in res.select("url", "figures").collect()
            for f in (r["figures"] or [])
        }
        standalone = {
            tuple(r) for r in figure_metadata(docs).collect()
        }
        assert inline == standalone

    def test_html_rows_have_empty_figures(self, spark):
        from pyspark.sql import functions as F

        from smart_ocr_spark.plans.extract_pipeline import run_extraction
        from smart_ocr_spark.sources.corpus import corpus_df

        docs = corpus_df(spark, 40, seed=9)
        res = run_extraction(spark, docs, with_figures=True)
        bad = res.filter(
            (~F.col("is_pdf")) & (F.size("figures") > 0)
        ).count()
        assert bad == 0

    def test_default_omits_column(self, spark):
        from smart_ocr_spark.plans.extract_pipeline import run_extraction
        from smart_ocr_spark.sources.corpus import corpus_df

        docs = corpus_df(spark, 10, seed=4)
        assert "figures" not in run_extraction(spark, docs).columns


class TestBpeTokenCount:
    """GPT-2-style pre-tokenizer count (training-data token budgeting)."""

    def test_counts(self, spark):
        from pyspark.sql import functions as F

        from smart_ocr_spark.functions.text_analysis import with_token_stats

        rows = [
            (1, "hello world"),            # 2 word tokens
            (2, "don't stop"),             # don + 't + stop = 3
            (3, "a1b2"),                   # a 1 b 2 = 4 (letter/digit runs)
            (4, "wait... what?!"),         # wait + ... + what + ?! = 4
            (5, "café über"),              # unicode letters: 2
            (6, ""),                       # 0
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {
            r["doc_id"]: r["bpe_token_count"]
            for r in with_token_stats(df).collect()
        }
        assert got == {1: 2, 2: 3, 3: 4, 4: 4, 5: 2, 6: 0}

    def test_whitespace_never_tokenized(self, spark):
        from smart_ocr_spark.functions.text_analysis import with_token_stats

        df = spark.createDataFrame(
            [(1, "  \t\n  a  \x0b ")], "doc_id int, text string"
        )
        [r] = with_token_stats(df).collect()
        assert r["bpe_token_count"] == 1


class TestCostColumns:
    """A4 cost/engines-used analog (reference state.py:164-172)."""

    def test_cost_and_engines(self, spark):
        from smart_ocr_spark.plans.extract_pipeline import run_extraction
        from smart_ocr_spark.sources.corpus import corpus_df

        docs = corpus_df(spark, 40, seed=21)
        res = run_extraction(spark, docs).select(
            "url", "attempts", "engines_used", "cost_microusd", "n_pages"
        )
        for r in res.collect():
            variants = [a["variant"] for a in r["attempts"]]
            # ordered unique, like dict.fromkeys
            assert r["engines_used"] == list(dict.fromkeys(variants))
            unit = {"layout": 200, "layout_alt": 1000}
            expected = sum(
                unit.get(v, 0) * max(r["n_pages"], 1) for v in variants
            )
            assert r["cost_microusd"] == expected
            # every doc ran the layout primary at least once
            assert r["cost_microusd"] >= 200


class TestSelectionConsensus:
    """Consensus selection behaviors mirroring reference
    tests/test_consensus.py:340-400 over the Spark with_selection op."""

    @staticmethod
    def _frame(spark, attempts, native_text="", is_bd=False, parse_ok=True):
        from smart_ocr_spark.operators.extract import ATTEMPT_SCHEMA

        from pyspark.sql.types import (
            ArrayType, BooleanType, IntegerType, StringType, StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("url", StringType()),
                StructField("attempts", ArrayType(ATTEMPT_SCHEMA)),
                StructField("native_text", StringType()),
                StructField("is_born_digital", BooleanType()),
                StructField("parse_ok", BooleanType()),
                StructField("n_pages", IntegerType()),
            ]
        )
        return spark.createDataFrame(
            [("u1", attempts, native_text, is_bd, parse_ok, 1)], schema
        )

    @staticmethod
    def _att(idx, variant, text, passed, wc=None, conf=0.0):
        return {
            "attempt_idx": idx, "variant": variant, "text": text,
            "escalated_from": "",
            "audit_passed": passed, "primary_failure": "none",
            "failure_modes": [], "failure_confidence": conf,
            "word_count": wc if wc is not None else len(text.split()),
            "avg_word_len": 4.0, "garbage_ratio": 0.0,
            "has_structure": False,
        }

    def _select(self, spark, **kw):
        from smart_ocr_spark.operators.extract import with_selection

        [row] = with_selection(self._frame(spark, **kw)).collect()
        return row

    def test_audit_passed_wins_over_failed(self, spark):
        text = "word " * 50
        r = self._select(spark, attempts=[
            self._att(0, "layout", text, False),
            self._att(1, "density", text, True),
        ])
        assert r["selected_variant"] == "density"
        assert r["selection_rule"] == "first_passing"
        assert r["status"] == "success"

    def test_first_passing_by_attempt_idx(self, spark):
        r = self._select(spark, attempts=[
            self._att(0, "layout", "a " * 60, True),
            self._att(1, "density", "b " * 60, True),
        ])
        assert r["selected_variant"] == "layout"
        assert r["selected_idx"] == 0

    def test_native_text_when_no_attempt_passes(self, spark):
        r = self._select(
            spark,
            attempts=[self._att(0, "layout", "short", False)],
            native_text="the born digital text layer",
            is_bd=True,
        )
        assert r["selection_rule"] == "native_text"
        assert r["final_text"] == "the born digital text layer"
        assert r["status"] == "success_native"

    def test_all_failed_longer_ungrounded_wins(self, spark):
        # ungrounded score grows with log1p(word_count): the much longer
        # attempt wins (reference: longer-text preference when all fail)
        r = self._select(spark, attempts=[
            self._att(0, "layout", "tiny", False),
            self._att(1, "density", "a much longer text " * 30, False),
        ])
        assert r["selection_rule"] == "consensus"
        assert r["selected_variant"] == "density"
        assert r["status"] == "partial"

    def test_all_failed_tie_falls_back_to_first(self, spark):
        text = "same text " * 20
        r = self._select(spark, attempts=[
            self._att(0, "layout", text, False),
            self._att(1, "density", text, False),
        ])
        assert r["selected_idx"] == 0  # tie -> lowest attempt_idx

    def test_agreement_score_between_0_and_1(self, spark):
        r = self._select(spark, attempts=[
            self._att(0, "layout", "hello world foo bar", True),
            self._att(1, "density", "hello world baz qux", True),
        ])
        assert 0.0 < r["agreement"] < 1.0

    def test_single_attempt_agreement_is_1(self, spark):
        r = self._select(spark, attempts=[
            self._att(0, "layout", "hello world", True),
        ])
        assert r["agreement"] == 1.0

    def test_empty_text_filtered_from_agreement(self, spark):
        # the empty attempt must not drag agreement to 0 (reference
        # filters empty texts before pairwise agreement)
        r = self._select(spark, attempts=[
            self._att(0, "layout", "hello world one two", True),
            self._att(1, "density", "", False),
        ])
        assert r["agreement"] == 1.0

    def test_failed_parse_status(self, spark):
        r = self._select(
            spark,
            attempts=[self._att(0, "layout", "", False)],
            parse_ok=False,
        )
        assert r["status"] == "failed_parse"


class TestNeedsRepairMirror:
    """needs_repair_col (JVM filter) and fused_repair_round's Python
    mirror must agree row-for-row — a divergence would join rows for
    repair that the kernel then silently skips (or vice versa)."""

    def test_equivalence_over_combination_grid(self, spark):
        import itertools

        from pyspark.sql.types import (
            ArrayType, BooleanType, DoubleType, IntegerType, LongType,
            StringType, StructField, StructType,
        )

        from smart_ocr_spark.operators import extract as ops

        def att(passed):
            return {
                "attempt_idx": 0, "variant": "layout", "text": "t",
                "escalated_from": "", "audit_passed": passed,
                "primary_failure": "none", "failure_modes": [],
                "failure_confidence": 0.0, "word_count": 1,
                "avg_word_len": 1.0, "garbage_ratio": 0.0,
                "has_structure": False,
            }

        rows = []
        rid = 0
        for (
            parse_ok, passed, is_bd, native, chars, ld, is_pdf, n_img
        ) in itertools.product(
            [True, False], [True, False], [True, False],
            ["", "native", None], [0, 10], [0.5, 0.9],
            # scanned dimensions (round 4): image-only PDFs are
            # retriable through the raster tier despite total_chars==0
            [True, False], [0, 2],
        ):
            rows.append(
                (str(rid), [att(passed)], native, is_bd, parse_ok,
                 chars, ld, is_pdf, n_img)
            )
            rid += 1
        schema = StructType([
            StructField("url", StringType()),
            StructField("attempts", ArrayType(ops.ATTEMPT_SCHEMA)),
            StructField("native_text", StringType()),
            StructField("is_born_digital", BooleanType()),
            StructField("parse_ok", BooleanType()),
            StructField("total_chars", LongType()),
            StructField("link_density", DoubleType()),
            StructField("is_pdf", BooleanType()),
            StructField("n_images", IntegerType()),
        ])
        df = spark.createDataFrame(rows, schema)
        jvm_true = {
            r["url"] for r in df.filter(ops.needs_repair_col()).collect()
        }

        py_true = {
            r["url"]
            for r in df.collect()
            if ops.needs_repair_py(r.asDict())
        }
        assert jvm_true == py_true


class TestRouterEdgeCases:
    """Fourth-review fixes: empty chain, exhaustion vs truncation retry,
    NaN variant plumbing."""

    def test_empty_chain_disables_repair(self):
        assert repair.candidates(set(), chain=[]) == []
        assert repair.select_repair_variant(audit.GARBAGE, set(), chain=[]) is None

    def test_truncation_retry_respects_exhaustion(self):
        v = repair.select_repair_variant(
            audit.TRUNCATED,
            set(repair.DEFAULT_CHAIN),
            last_variant="raw",
            last_variant_runs=1,
            truncation_retries=1,
        )
        assert v is None, "spent chain must return None, not another retry"

    def test_normalize_series_nan_variant(self):
        import pandas as pd

        out = normalize.normalize_series(
            pd.Series(["a  b", "c  d"]),
            pd.Series(["nougat", float("nan")]),
        )
        assert list(out) == [normalize.normalize("a  b", "nougat"),
                             normalize.normalize("c  d", "")]
