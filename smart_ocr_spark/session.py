"""SparkSession helpers: tuned builder + package shipping.

``build_session`` applies the physical-execution defaults the pipeline
assumes (AQE on, Arrow batches capped so one oversized blob cannot OOM a
Python worker — SURVEY.md §4 O4/O9).

``ensure_package_shipped`` zips this package and registers it via
``sc.addPyFile`` so executor Python workers can import ``smart_ocr_spark``
even when the driver didn't launch through ``spark-submit --py-files``.
On a real cluster the packaged zip goes through ``--py-files`` (see
``make_pyfiles_zip``); this helper makes local drivers equivalent.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def make_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the package for ``spark-submit --py-files``. Deterministic walk."""
    if out_path is None:
        out_path = os.path.join(
            tempfile.gettempdir(), f"smart_ocr_spark-{os.getpid()}.zip"
        )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(_PKG_DIR):
            dirs.sort()
            if "__pycache__" in root:
                continue
            for fname in sorted(files):
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.join(
                    "smart_ocr_spark", os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    return out_path


def ensure_package_shipped(spark) -> None:
    """Make ``smart_ocr_spark`` importable on executor Python workers."""
    sc = spark.sparkContext
    if getattr(sc, "_socr_pyfiles_shipped", False):
        return
    sc.addPyFile(make_pyfiles_zip())
    sc._socr_pyfiles_shipped = True


def build_session(
    app_name: str = "smart_ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 1024,
    arrow_max_bytes: int = 16 << 20,
):
    """Tuned local/cluster session.

    Arrow batching is bounded on BOTH axes (O4: size-bucketed safety):
    ``arrow_max_bytes`` caps the bytes of one batch reaching a Python
    worker (Spark 4's ``maxBytesPerBatch``, verified to govern
    mapInPandas input slicing), so a run of ~1 MB+ payloads can never
    assemble an oversized batch no matter the row cap; that lets
    ``arrow_max_records`` sit at 1024 (was 256) so small-row map passes
    amortize per-batch overhead 4x better.  The old row-only cap
    actually admitted 256 x blob-size bytes — the byte cap is the
    stricter guard.
    """
    from pyspark import SparkConf
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if not str(cpus).isdigit():
        cpus = "32"
    builder = SparkSession.builder.appName(app_name)
    # Respect a master set by spark-submit (--master yarn/k8s/...):
    # unconditionally calling .master() here would silently turn a
    # cluster submission into a local run.  SparkConf() alone cannot
    # detect this in a fresh driver — before the JVM gateway is up it is
    # an empty Python-side dict and never sees spark-submit's --master
    # system property — so also check the env markers PythonRunner
    # exports when spark-submit launches the Python driver.
    spark_submit_driver = (
        "PYSPARK_GATEWAY_PORT" in os.environ
        or "PYSPARK_GATEWAY_SECRET" in os.environ
    )
    if master is not None:
        builder = builder.master(master)
    elif not spark_submit_driver and not SparkConf().contains("spark.master"):
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records)
        )
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch", str(arrow_max_bytes)
        )
        # Shuffled-hash joins (no sorts) are enabled ONLY through AQE's
        # runtime rewrite, which sees the REAL post-shuffle sizes
        # (guide §3.1).  The static planner knob
        # (preferSortMergeJoin=false) is deliberately left at its
        # default: planner-side SHJ selection trusts size ESTIMATES,
        # and frames downstream of Python UDFs carry bogus-small ones
        # in this library — a tokens-scale build side would pass the
        # static gate and OOM where sort-merge spills.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 << 20),
        )
        # zstd beats snappy on size at similar read speed for anything
        # this library writes (checkpoints, shards — guide §6)
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", str(128 << 20))
        # InferFiltersFromGenerate turns explode(udf_array) into a
        # size(udf)>0 pre-filter that re-evaluates the Python UDF — every
        # shingle/fan-out query paid the Arrow pass twice (visible as
        # paired ArrowEvalPython nodes in PLANS.md). The inferred filter
        # only prunes empty arrays, which explode drops anyway.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    ensure_package_shipped(spark)
    return spark
