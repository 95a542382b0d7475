"""Skew handling: hot-key salting spreads only the hot keys, results
stay exactly equal to the unsalted aggregation, and the size-bucketed
repartition balances a skewed single-partition source."""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_ocr_spark.functions import skew


def _skewed_df(spark):
    # host-0 has 2000 rows, 20 cold hosts have 10 each
    hot = spark.range(2000).select(
        F.lit("hot.example.com").alias("host"), F.col("id").alias("v")
    )
    cold = spark.range(200).select(
        F.concat(F.lit("cold-"), (F.col("id") % 20).cast("string")).alias("host"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


def test_salting_spreads_only_hot_keys(spark):
    df = _skewed_df(spark)
    salted = skew.with_salted_key(df, "host", n_salts=8, hot_threshold=100)
    per = (
        salted.groupBy("host")
        .agg(F.countDistinct("salt").alias("n_salts"))
        .collect()
    )
    by_host = {r.host: r.n_salts for r in per}
    assert by_host["hot.example.com"] == 8
    assert all(v == 1 for h, v in by_host.items() if h != "hot.example.com")
    # largest single shuffle group shrinks ~n_salts-fold
    biggest = (
        salted.groupBy("salted_key").count().agg(F.max("count")).collect()[0][0]
    )
    assert biggest <= 2000 / 8 * 1.5


def test_two_stage_agg_equals_direct(spark):
    df = _skewed_df(spark)
    direct = {
        r.host: (r.n, r.s)
        for r in df.groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    staged = {
        r.host: (r.n, r.sum_v)
        for r in skew.two_stage_agg(
            df, "host", "v", n_salts=8, hot_threshold=100
        ).collect()
    }
    assert staged == direct


def test_salting_is_deterministic(spark):
    df = _skewed_df(spark)
    a = skew.with_salted_key(df, "host", n_salts=8, hot_threshold=100)
    b = skew.with_salted_key(df.repartition(7), "host", n_salts=8, hot_threshold=100)
    assert (
        a.select("host", "v", "salt").exceptAll(b.select("host", "v", "salt")).count()
        == 0
    )


def test_host_extraction(spark):
    df = spark.createDataFrame(
        [("https://hot.example.com/prose/0000001",), ("http://x.org/a/b",)],
        ["url"],
    )
    hosts = [r[0] for r in df.select(skew.host_of(F.col("url"))).collect()]
    assert hosts == ["hot.example.com", "x.org"]


def test_size_bucketed_balances_skewed_source(spark):
    from smart_ocr_spark.operators import extract as ops

    # single-partition source with one giant blob + many small ones
    rows = [(f"u{i}", b"x" * (1_500_000 if i == 0 else 500)) for i in range(64)]
    df = spark.createDataFrame(rows, ["url", "html"]).coalesce(1)
    out = ops.size_bucketed(df, partitions=8)
    sizes = (
        out.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    )
    assert len(sizes) > 1  # actually spread
    assert max(r["count"] for r in sizes) <= 64  # no single-partition funnel
