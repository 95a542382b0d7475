"""Kill-and-resume semantics for the checkpointed extraction run
(SURVEY.md §7.1 step 6): a partial run commits some buckets; the resume
processes ONLY the rest; changed input invalidates exactly its bucket."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.plans import checkpoint as cp
from smart_ocr_spark.sources.corpus import corpus_df

N_DOCS = 60
N_BUCKETS = 8


@pytest.fixture(scope="module")
def docs(spark):
    return corpus_df(spark, N_DOCS, seed=7).cache()


def test_partial_then_resume(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt"))

    # "killed" first run: only 3 buckets get committed
    r1 = cp.run_with_checkpoint(spark, docs, out, N_BUCKETS, max_buckets_this_run=3)
    assert r1["processed_buckets"] == 3
    n_after_1 = cp.read_results(spark, out).count()
    assert 0 < n_after_1 < N_DOCS

    # resume: processes exactly the remaining buckets, not the done ones
    r2 = cp.run_with_checkpoint(spark, docs, out, N_BUCKETS)
    assert r2["processed_buckets"] > 0
    assert r2["processed_rows"] == N_DOCS - n_after_1

    res = cp.read_results(spark, out)
    assert res.count() == N_DOCS
    # byte-identical invariant survives the split run
    joined = res.join(docs.select("url", F.col("text").alias("expected")), "url")
    assert joined.filter(F.col("final_text") != F.col("expected")).count() == 0

    # idempotent no-op third run
    r3 = cp.run_with_checkpoint(spark, docs, out, N_BUCKETS)
    assert r3 == {"processed_buckets": 0, "processed_rows": 0, "skipped": True}
    assert cp.read_results(spark, out).count() == N_DOCS


def test_changed_input_invalidates_bucket(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt2"))
    cp.run_with_checkpoint(spark, docs, out, N_BUCKETS)

    # mutate ONE document's payload -> only its bucket reprocesses
    target_url = docs.select("url").orderBy("url").first().url
    mutated = docs.withColumn(
        "html",
        F.when(
            F.col("url") == target_url,
            F.encode(F.lit("<html><body><p>changed payload</p></body></html>"), "UTF-8"),
        ).otherwise(F.col("html")),
    ).withColumn(
        "text",
        F.when(F.col("url") == target_url, F.lit("changed payload")).otherwise(
            F.col("text")
        ),
    )
    r = cp.run_with_checkpoint(spark, mutated, out, N_BUCKETS)
    assert r["processed_buckets"] == 1
    res = cp.read_results(spark, out)
    assert res.count() == N_DOCS
    got = res.where(F.col("url") == target_url).first().final_text
    assert got == "changed payload"


def test_bucket_assignment_is_content_derived(spark, docs):
    # same urls, different row order / partitioning -> same buckets
    a = cp.with_bucket(docs, N_BUCKETS).select("url", cp.BUCKET_COL)
    b = cp.with_bucket(docs.orderBy(F.desc("url")).repartition(13), N_BUCKETS).select(
        "url", cp.BUCKET_COL
    )
    assert a.exceptAll(b).count() == 0


def test_duplicated_row_invalidates_bucket(spark, docs, tmp_path_factory):
    """XOR fingerprints cancel on duplicated rows (x^x=0); the row-count
    comparison must catch what the fingerprint cannot."""
    out = str(tmp_path_factory.mktemp("ckpt3"))
    cp.run_with_checkpoint(spark, docs, out, N_BUCKETS)

    dup_url = docs.select("url").orderBy("url").first().url
    dup_row = docs.where(F.col("url") == dup_url)
    with_dup = docs.unionByName(dup_row)
    r = cp.run_with_checkpoint(spark, with_dup, out, N_BUCKETS)
    assert r["processed_buckets"] == 1
    res = cp.read_results(spark, out)
    assert res.count() == N_DOCS + 1
    assert res.where(F.col("url") == dup_url).count() == 2


def test_lang_change_invalidates_bucket(spark, docs, tmp_path_factory):
    """lang is a pipeline input carried to results; the fingerprint must
    cover it, not just (url, html)."""
    out = str(tmp_path_factory.mktemp("ckpt4"))
    cp.run_with_checkpoint(spark, docs, out, N_BUCKETS)
    target = docs.select("url").orderBy("url").first().url
    mutated = docs.withColumn(
        "lang",
        F.when(F.col("url") == target, F.lit("xx")).otherwise(F.col("lang")),
    )
    r = cp.run_with_checkpoint(spark, mutated, out, N_BUCKETS)
    assert r["processed_buckets"] == 1
    got = cp.read_results(spark, out).where(F.col("url") == target).first().lang
    assert got == "xx"
