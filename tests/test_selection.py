"""Data-selection ops (functions/selection.py): DSIR importance
weights, the NB log-odds classifier, and deterministic top-fraction
selection — semantics, determinism, and the scale-shape plan pins
(pure JVM feature extraction, broadcast-sized models)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.functions import selection as S


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", True),
        (2, "stock market news report on the economy", True),
        (3, "buy cheap pills now click here casino jackpot", False),
        (4, "the economy news report on market finance", True),
        (5, "click click casino cheap cheap pills", False),
        (6, "", False),
        (7, "one-token", True),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, label boolean"
    )


def test_hashed_features_counts_instances(toy):
    # n unigrams + (n-1) bigrams per doc; instances, not distinct
    feats = S.hashed_features(toy, n_buckets=64)
    got = {
        r["id"]: r["n"]
        for r in feats.groupBy("id").agg(F.count("*").alias("n")).collect()
    }
    # doc 5: 6 tokens -> 6 + 5 = 11 (repeated tokens each counted)
    assert got[5] == 11
    # doc 7: single token -> 1 unigram, 0 bigrams
    assert got[7] == 1
    # doc 6: empty -> no rows
    assert 6 not in got


def test_dsir_separates_target_from_spam(toy):
    scored = S.dsir_importance(toy, toy.filter("label"), n_buckets=64)
    by_id = {r["doc_id"]: r for r in scored.collect()}
    assert all(by_id[i]["log_weight"] > 0 for i in (1, 2, 4))
    assert all(by_id[i]["log_weight"] < 0 for i in (3, 5))
    # featureless doc scores exactly 0 and is still present
    assert by_id[6]["n_features"] == 0 and by_id[6]["log_weight"] == 0.0


def test_dsir_select_top_fraction_deterministic(toy):
    scored = S.dsir_importance(toy, toy.filter("label"), n_buckets=64)
    kept = sorted(
        r["doc_id"] for r in S.dsir_select(scored, 3 / 7).collect()
    )
    # ceil(3/7 * 7) = 3 docs, the three most target-like
    assert len(kept) == 3
    again = sorted(
        r["doc_id"] for r in S.dsir_select(scored, 3 / 7).collect()
    )
    assert kept == again


def test_dsir_select_rejects_bad_fraction(toy):
    scored = S.dsir_importance(toy, toy.filter("label"), n_buckets=64)
    with pytest.raises(ValueError, match="fraction"):
        S.dsir_select(scored, 0.0)
    with pytest.raises(ValueError, match="fraction"):
        S.dsir_select(scored, 1.5)


def test_nb_classifier_recovers_labels(toy):
    scored = S.nb_classifier_scores(toy, toy, label_col="label",
                                    n_buckets=64)
    by_id = {r["doc_id"]: r for r in scored.collect()}
    for r in toy.collect():
        if r["doc_id"] == 6:  # featureless: score 0, pred False
            assert by_id[6]["pred"] is False
        else:
            assert by_id[r["doc_id"]]["pred"] == r["label"]


def test_selection_plan_is_jvm_only_with_broadcast_model(toy):
    """The 100 TB pins: no Python eval anywhere (feature extraction is
    split/zip_with/md5 column algebra) and the ≤n_buckets weight table
    joins the corpus via BroadcastHashJoin — the corpus never
    shuffles against itself."""
    plan = _plan(
        S.dsir_importance(toy, toy.filter("label"), n_buckets=64),
        "simple",
    )
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dsir_select_uses_take_ordered(toy):
    """Top-k must be distributed TakeOrdered, never a single-partition
    global sort/window."""
    scored = S.dsir_importance(toy, toy.filter("label"), n_buckets=64)
    plan = _plan(S.dsir_select(scored, 0.5), "simple")
    assert "TakeOrdered" in plan, plan
    assert "Window" not in plan, plan


def test_dsir_select_threshold_path_matches_takeordered(toy):
    """Forcing the large-k threshold path (takeordered_max_k=0) must
    select EXACTLY the same docs as the TakeOrdered+broadcast path —
    including the boundary-weight tie resolved by id asc."""
    scored = S.dsir_importance(toy, toy.filter("label"), n_buckets=64)
    for frac in (2 / 7, 3 / 7, 1.0):
        small = sorted(
            r["doc_id"] for r in S.dsir_select(scored, frac).collect()
        )
        large = sorted(
            r["doc_id"]
            for r in S.dsir_select(
                scored, frac, takeordered_max_k=0
            ).collect()
        )
        assert small == large, frac


def test_unseen_bucket_features_get_smoothed_weight(spark, toy):
    """A doc whose features hash to buckets absent from BOTH models
    must score the smoothed constant, not 0 (the docstring's add-one
    smoothing over the full bucket space)."""
    novel = spark.createDataFrame(
        [(99, "zzqx wvvk pplm qqrs ttuv", None)],
        "doc_id long, text string, label boolean",
    )
    out = S.nb_classifier_scores(
        novel, toy, label_col="label", n_buckets=4096
    ).collect()[0]
    # with 3 positive vs 2 negative labeled docs the unseen-bucket
    # weight is log10((n_den+B)/(n_num+B)) != 0
    assert out["n_features"] == 9
    assert out["score"] != 0.0
    assert out["avg_weight"] != 0.0
