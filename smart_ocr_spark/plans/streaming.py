"""Streaming ingestion: run the extraction pipeline over batches of
newly-arriving corpus files (Structured Streaming, file source).

The reference is strictly bounded batch (SURVEY.md §1.4 — no streams),
but the production shape of a Common-Crawl-style pipeline is "new WARC
dumps keep landing in a directory": this wrapper is that shape without
changing any extraction semantics.

Design (exactly-once without Iceberg):
  * ``readStream`` file source discovers new parquet files; the
    STREAMING checkpoint (offsets/commits) remembers which files each
    micro-batch consumed, so a restart never re-reads processed input.
  * ``foreachBatch`` runs the ordinary bounded ``run_extraction`` on
    the micro-batch and writes results partitioned by ``stream_batch``
    (the micro-batch id) with dynamic partition overwrite.  foreachBatch
    can replay a batch id after a crash — the replay overwrites exactly
    its own partition, making the sink idempotent (the classic
    batch-id-keyed exactly-once pattern; real Iceberg MERGE would
    subsume this, SURVEY.md §7.2).
  * no watermarks: ingestion is append-only corpus files, not
    event-time aggregation — there is no late-data semantics to handle.

At scale the trigger is ``availableNow`` on a schedule (process the
backlog, stop), which keeps the job a bounded run with streaming
bookkeeping — resumable discovery without a long-lived driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from smart_ocr_spark.plans import extract_pipeline

INPUT_SCHEMA = "url string, warc_ts timestamp, html binary, lang string"

RESULTS_SUBDIR = "results"
STREAM_CKPT_SUBDIR = "_stream_checkpoint"


def stream_extraction(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    max_files_per_batch: int | None = None,
):
    """Start (and for availableNow, run to drain) the streaming
    extraction over ``input_dir``; returns the StreamingQuery.

    Call again after new files land: the streaming checkpoint ensures
    only unseen files are processed.  Results accumulate under
    ``out_dir/results`` partitioned by ``stream_batch``.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    reader = spark.readStream.schema(INPUT_SCHEMA)
    if max_files_per_batch is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    stream = reader.parquet(input_dir)

    results_path = os.path.join(out_dir, RESULTS_SUBDIR)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        res = extract_pipeline.run_extraction(spark, batch_df)
        out = extract_pipeline.results_for_write(res).withColumn(
            "stream_batch", F.lit(int(batch_id))
        )
        (
            out.write.mode("overwrite")
            .partitionBy("stream_batch")
            .parquet(results_path)
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation", os.path.join(out_dir, STREAM_CKPT_SUBDIR)
        )
        .trigger(availableNow=True)
        .start()
    )


def read_stream_results(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, RESULTS_SUBDIR))
