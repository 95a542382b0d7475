"""Scan-parallelism guard for Python-heavy map passes (guide §2/§6).

The fixture tables (and any small or badly-laid-out source: one gzip,
one parquet row group, a single-file dump) scan as a SINGLE task, so a
map-heavy pass over them — shingling, MinHash, SimHash, PDF synthesis,
BLAS re-ranks — runs serially on one core no matter how many the
executor has.  Parquet cannot split a row group, so no
``maxPartitionBytes`` setting fixes this; the only remedy is an
explicit round-robin repartition after the scan.

``spread_scan`` applies that remedy ONLY when the source provides less
parallelism than the cluster (the same guard
``operators.extract.size_bucketed`` uses for payload scans): for a
well-laid-out table (scan splits >= cores) it is the identity and no
bytes move.  At 100 TB scans carry thousands of splits, so this never
fires there; locally it moves a few MB once to unlock every core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to ``defaultParallelism`` when (and only
    when) the frame currently has fewer partitions than that.  Purely a
    physical-plan change: row content is untouched and downstream
    consumers here are order-independent (aggregations, joins,
    per-row map output)."""
    sc = df.sparkSession.sparkContext
    n = partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        current = 0
    if current >= n:
        return df
    return df.repartition(n)
