"""Bucketed-table sink: co-located joins without a shuffle.

At 100 TB the dominant cost of every doc-keyed join (attempts ⋈ docs,
keep-list ⋈ corpus, signature ⋈ dump) is the exchange of the fat side.
Hive-style bucketing pays that shuffle ONCE at write time: both tables
are written ``bucketBy(n, key)`` + ``sortBy(key)``, and every later
equi-join on the key plans as a zip of corresponding buckets —
`.explain` shows SortMergeJoin with NO Exchange under either side.

Spark specifics this module pins down (the part that silently breaks):
  * bucketed writes REQUIRE ``saveAsTable`` (a metastore entry carries
    the bucket spec; plain ``.parquet(path)`` writes silently drop it);
  * both sides must be bucketed INTO THE SAME NUMBER of buckets on the
    join key, or Spark shuffles the mismatched side anyway;
  * ``spark.sql.sources.bucketing.enabled`` (default true) and reading
    via ``spark.table`` — reading the files by path loses the spec;
  * AQE leaves bucket joins alone (no runtime re-plan needed — the
    co-location is static).

`jobs/` usage shape: the extraction results and checkpoint state both
key on ``url``; writing them bucketed by ``xxhash64(url)`` makes the
incremental anti-join and the repair-loop join exchange-free across
every epoch of a rolling crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 64


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted managed table on ``key``.
    One shuffle now; every future equi-join on ``key`` against a table
    bucketed with the SAME ``n_buckets`` is exchange-free."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back WITH the bucket spec (``spark.table`` — a path read
    would lose it and joins would shuffle again)."""
    return spark.table(table)


def cojoin(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two same-bucketed tables on ``key`` — plans with no
    Exchange under either side (asserted in tests/test_bucketed.py)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key
    )
