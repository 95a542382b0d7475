"""Bucketed sink (sources/bucketed.py): the written tables must join
WITHOUT an exchange — the co-location contract — and round-trip their
rows exactly."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.sources import bucketed as B


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def tables(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id")).alias("text"),
    )
    scores = spark.range(0, 2000, 2).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("double").alias("score"),
    )
    B.write_bucketed(docs, "bt_docs", "doc_id", n_buckets=8)
    B.write_bucketed(scores, "bt_scores", "doc_id", n_buckets=8)
    yield "bt_docs", "bt_scores"
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_scores")


def test_cojoin_is_exchange_free(spark, tables):
    """With broadcast disabled (both sides 'fat'), the join must plan
    as SortMergeJoin with no SHUFFLE exchange on either side — the
    bucket co-location at work."""
    lt, rt = tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(B.cojoin(spark, lt, rt, "doc_id"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    # BroadcastExchange would be fine; a shuffle Exchange is the bug
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-: ")
        assert not stripped.startswith("Exchange"), plan


def test_cojoin_rows_exact(spark, tables):
    lt, rt = tables
    got = B.cojoin(spark, lt, rt, "doc_id").count()
    assert got == 1000  # every even doc_id matches


def test_mismatched_bucketing_would_shuffle(spark, tables):
    """Joining a bucketed table against an UNBUCKETED frame shuffles —
    the counterexample proving the exchange-free plan above is the
    bucketing at work, not AQE luck."""
    lt, _ = tables
    plain = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(B.read_bucketed(spark, lt).join(plain, "doc_id"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert any(
        l.strip().lstrip("+-: ").startswith("Exchange")
        for l in plan.splitlines()
    ), plan
