"""Streaming ingestion: new corpus files are discovered incrementally,
each micro-batch runs the bounded extraction, the sink is idempotent
per batch id, and restarts never reprocess consumed files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.plans import streaming
from smart_ocr_spark.sources.corpus import corpus_df

N1, N2 = 40, 24


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    inp = str(tmp_path_factory.mktemp("stream_in"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    return inp, out


def _batch_df(spark, n: int, seed: int, tag: str):
    # namespace urls per dump: different seeds can emit the same doc
    # index -> same url, which would look like a cross-batch dup
    return corpus_df(spark, n, seed=seed).withColumn(
        "url", F.concat(F.lit(tag + "/"), F.col("url"))
    )


def _drop_batch(spark, inp: str, n: int, seed: int, tag: str):
    _batch_df(spark, n, seed, tag).write.mode("overwrite").parquet(
        os.path.join(inp, tag)
    )


def test_incremental_stream_extraction(spark, dirs):
    inp, out = dirs

    # batch 1 lands and drains
    _drop_batch(spark, inp, N1, seed=31, tag="dump1")
    q = streaming.stream_extraction(spark, inp + "/*", out)
    q.awaitTermination(300)
    res1 = streaming.read_stream_results(spark, out)
    assert res1.count() == N1
    batches1 = {r.stream_batch for r in res1.select("stream_batch").distinct().collect()}

    # batch 2 lands; a NEW invocation processes only the new files
    _drop_batch(spark, inp, N2, seed=32, tag="dump2")
    q2 = streaming.stream_extraction(spark, inp + "/*", out)
    q2.awaitTermination(300)
    res2 = streaming.read_stream_results(spark, out)
    assert res2.count() == N1 + N2
    assert res2.select("url").distinct().count() == N1 + N2  # no reprocessing dups
    batches2 = {r.stream_batch for r in res2.select("stream_batch").distinct().collect()}
    assert batches1 < batches2  # old batch partitions untouched, new ones added

    # byte-identity holds through the streaming path for both batches
    golden = (
        _batch_df(spark, N1, 31, "dump1")
        .select("url", F.col("text").alias("golden"))
        .unionByName(
            _batch_df(spark, N2, 32, "dump2").select(
                "url", F.col("text").alias("golden")
            )
        )
    )
    joined = res2.join(golden, "url")
    assert joined.count() == N1 + N2
    assert joined.filter(F.col("final_text") != F.col("golden")).count() == 0

    # drained re-run with nothing new: a no-op, counts unchanged
    q3 = streaming.stream_extraction(spark, inp + "/*", out)
    q3.awaitTermination(300)
    assert streaming.read_stream_results(spark, out).count() == N1 + N2
