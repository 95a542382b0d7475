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


# ---------------------------------------------------------------------------
# Event-time windowed ingestion stats (watermark + late data, §2.11)
# ---------------------------------------------------------------------------

STATS_SUBDIR = "ingest_stats"
STATS_CKPT_SUBDIR = "_stats_checkpoint"


def stream_ingestion_stats(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """Crawl-time ingestion monitoring: per (event-time window, lang)
    doc counts and payload bytes over the landing stream.

    This is the classic Structured Streaming stateful shape the bounded
    reference has no analog for: ``warc_ts`` is EVENT time (when the
    page was crawled), not arrival time — dumps land out of order, so
    the aggregation carries a watermark.  Append mode emits each window
    exactly once, when the watermark passes its end: rows later than
    ``watermark`` are DROPPED (never a silent double-count), and state
    is bounded by the watermark horizon instead of growing with the
    corpus — the property that matters at 100 TB of backlog.
    """
    stream = spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir)
    agg = _ingestion_rollup(stream.withWatermark("warc_ts", watermark), window)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, STATS_SUBDIR))
        .option(
            "checkpointLocation", os.path.join(out_dir, STATS_CKPT_SUBDIR)
        )
        .trigger(availableNow=True)
        .start()
    )


def read_ingestion_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, STATS_SUBDIR))


def _ingestion_rollup(df: DataFrame, window: str) -> DataFrame:
    """The one rollup definition both paths share: streamed append-mode
    output and the bounded replay oracle aggregate THE SAME expression
    tree, so any stream/batch divergence is a runtime-semantics bug
    (watermark, state, replay), never a drifted query."""
    return (
        df.groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("html")).alias("payload_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang", "n_docs", "payload_bytes",
        )
    )


def bounded_ingestion_stats(
    df: DataFrame, window: str = "10 minutes"
) -> DataFrame:
    """Bounded-batch analog of :func:`stream_ingestion_stats` — the
    equivalence ORACLE for the streaming path (VERDICT r4 #6): on any
    dump sequence with no late arrivals, the streamed append-mode
    output must equal this bounded rollup restricted to the windows
    the final watermark closed.  Pinned by
    tests/test_streaming.py::test_stream_batch_equivalence_stats with
    the driver-style sorted-rows compare."""
    return _ingestion_rollup(df, window)


# ---------------------------------------------------------------------------
# Streaming exact dedup across micro-batches (applyInPandasWithState)
# ---------------------------------------------------------------------------

DEDUP_SUBDIR = "deduped"
DEDUP_CKPT_SUBDIR = "_dedup_checkpoint"


def stream_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    n_buckets: int = 64,
):
    """First-seen-wins exact dedup ACROSS micro-batches: a custom
    stateful operator (``applyInPandasWithState``) keyed by a
    content-hash bucket.

    Each group's state is the set of content sha256s seen so far in
    that bucket; a row whose hash is already in state is dropped, new
    hashes pass through and extend the state.  Bucketing by
    ``pmod(xxhash64(sha256), n_buckets)`` spreads state across tasks
    (no single-key hot state) and makes the state size per group
    O(distinct_hashes / n_buckets).  The bounded-batch analog is
    ``functions/dedup.exact_dedup``; this is the shape that survives a
    landing stream where duplicates arrive days apart — state lives in
    the streaming checkpoint and a restart resumes with the seen-set
    intact.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .parquet(input_dir)
        .withColumn("content_sha", F.sha2("html", 256))
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("content_sha"), F.lit(n_buckets)).cast("int"),
        )
    )

    out_schema = (
        "url string, warc_ts timestamp, lang string, content_sha string"
    )
    state_schema = "seen array<string>"

    def dedup_group(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in pdfs:
            for url, ts, lang, sha in zip(
                pdf["url"], pdf["warc_ts"], pdf["lang"], pdf["content_sha"]
            ):
                if sha in seen:
                    continue
                seen.add(sha)
                out.append((url, ts, lang, sha))
        state.update((list(seen),))
        yield pd.DataFrame(
            out, columns=["url", "warc_ts", "lang", "content_sha"]
        )

    deduped = stream.groupBy("bucket").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, DEDUP_SUBDIR))
        .option(
            "checkpointLocation", os.path.join(out_dir, DEDUP_CKPT_SUBDIR)
        )
        .trigger(availableNow=True)
        .start()
    )


def read_deduped(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, DEDUP_SUBDIR))


# ---------------------------------------------------------------------------
# Streaming NEAR-dup dedup across micro-batches (MinHash-LSH state)
# ---------------------------------------------------------------------------

NEARDUP_SUBDIR = "neardup"
NEARDUP_CKPT_SUBDIR = "_neardup_checkpoint"

TEXT_INPUT_SCHEMA = "url string, text string"


STATE_SIG_CAP = 4096  # distinct signatures kept per band bucket


def stream_neardup_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    threshold: float = 0.8,
    state_sig_cap: int = STATE_SIG_CAP,
):
    """Streaming MinHash-LSH near-dup detection across micro-batches —
    the stateful analog of ``dedup.minhash_incremental_new_docs``: as
    text dumps land, each doc is checked against everything that
    arrived in any earlier micro-batch (state lives in the streaming
    checkpoint, so restarts resume with history intact).

    Shape:
      * the stateless MinHash pass (``dedup.minhash_signatures`` —
        map-local hashlib inside Arrow batches) runs on the stream
        unchanged; one row per (url, band bucket) feeds the stateful
        operator, so state is spread across ``n_bands × 16^32`` keys,
        never one hot group;
      * per band-bucket group state = the signatures seen in that
        bucket; an arriving doc matches if a stored signature agrees
        on ≥ ``threshold`` of its MinHash components (the standard
        unbiased Jaccard estimator).  This is the documented streaming
        trade-off vs the batch tier: exact shingle verification needs
        the history TEXT, which state deliberately does not hold —
        candidates flagged here can be exactly verified by the bounded
        batch tier downstream;
      * rows are processed in url order inside each micro-batch, so
        first-seen-wins is deterministic regardless of partitioning;
      * state is SKEW-SAFE by construction: each DISTINCT signature
        vector is stored once, with the first url that carried it
        (band buckets only collide for near-identical docs, so the
        degenerate case — one boilerplate page duplicated millions of
        times — folds to ONE state entry instead of millions, and every
        later copy still matches that entry at estimate 1.0).  Distinct
        near-variants are additionally bounded by ``state_sig_cap``
        (first-seen kept; saturation surfaced as ``state_saturated`` on
        every row decided by a full bucket, never silent).

    Output: one row per (url, bucket) with the matched history url (or
    null), the estimated Jaccard, and the saturation flag;
    ``read_neardup_verdicts`` folds bands into a per-doc verdict.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    from smart_ocr_spark.functions import dedup as dedup_fn

    stream = spark.readStream.schema(TEXT_INPUT_SCHEMA).parquet(input_dir)
    sig = dedup_fn.minhash_signatures(
        stream, id_col="url", text_col="text", id_type="string"
    )
    n_hashes = dedup_fn.N_MINHASH
    sig_cols = [f"sig_{s}" for s in range(n_hashes)]
    bands = None
    for b in range(dedup_fn.N_BANDS):
        part = sig.select(
            "url",
            *sig_cols,
            F.concat(F.lit(f"{b}:"), F.col(f"band_{b}")).alias("bucket"),
        )
        bands = part if bands is None else bands.unionByName(part)

    out_schema = (
        "url string, bucket string, matched_url string, est_jaccard double, "
        "state_saturated boolean"
    )
    state_schema = "urls array<string>, sigs array<string>"

    def neardup_group(key, pdfs, state: GroupState):
        if state.exists:
            urls, packed = list(state.get[0]), list(state.get[1])
        else:
            urls, packed = [], []
        hist = [p.split("|") for p in packed]
        seen_sigs = set(packed)
        rows = []
        arrivals = []
        for pdf in pdfs:
            for tup in pdf.itertuples(index=False):
                s = [getattr(tup, c) for c in sig_cols]
                # state packs signatures as '|'.join(s); minhash sigs
                # are md5 hex today, but a future signature encoding
                # containing '|' would silently corrupt restored state
                # across restarts — enforce the delimiter assumption
                # loudly instead of leaving it implicit
                if any(c is None or "|" in c for c in s):
                    # None-check first: a None component must produce
                    # this diagnostic too, not a confusing TypeError
                    # from the `in` test (ADVICE r6)
                    raise ValueError(
                        "signature component is None or contains the "
                        "state delimiter '|' — state packing would "
                        f"corrupt across restarts (url={tup.url!r})"
                    )
                arrivals.append((tup.url, s))
        arrivals.sort(key=lambda a: a[0])  # deterministic in-batch order
        for url, s in arrivals:
            best, best_est = None, 0.0
            for hurl, hs in zip(urls, hist):
                est = sum(x == y for x, y in zip(s, hs)) / n_hashes
                if est >= threshold and (
                    best is None or est > best_est
                    or (est == best_est and hurl < best)
                ):
                    best, best_est = hurl, est
            full = len(urls) >= state_sig_cap
            rows.append(
                (url, key[0], best, best_est if best else None, full)
            )
            pk = "|".join(s)
            # one state entry per DISTINCT signature, first url wins;
            # hard cap bounds distinct variants (saturation flagged)
            if pk not in seen_sigs and not full:
                seen_sigs.add(pk)
                urls.append(url)
                hist.append(s)
                packed.append(pk)
        state.update((urls, packed))
        yield pd.DataFrame(
            rows,
            columns=[
                "url", "bucket", "matched_url", "est_jaccard",
                "state_saturated",
            ],
        )

    flagged = bands.groupBy("bucket").applyInPandasWithState(
        neardup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        flagged.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, NEARDUP_SUBDIR))
        .option(
            "checkpointLocation", os.path.join(out_dir, NEARDUP_CKPT_SUBDIR)
        )
        .trigger(availableNow=True)
        .start()
    )


def read_neardup_verdicts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-doc verdict from the per-band stream output: a doc is a
    near-dup if ANY band matched; the reported match is the best
    (highest estimate, ties to the lexicographically largest url —
    max of the (est, url) struct, deterministic)."""
    rows = spark.read.parquet(os.path.join(out_dir, NEARDUP_SUBDIR))
    best = (
        rows.where(F.col("matched_url").isNotNull())
        .groupBy("url")
        .agg(F.max(F.struct("est_jaccard", "matched_url")).alias("m"))
    )
    sat = rows.groupBy("url").agg(
        F.max(F.col("state_saturated").cast("int")).alias("sat_i")
    )
    return (
        rows.select("url").distinct()
        .join(best, "url", "left")
        .join(sat, "url")
        .select(
            "url",
            F.col("m").isNotNull().alias("is_neardup"),
            F.col("m.matched_url").alias("matched_url"),
            F.col("m.est_jaccard").alias("est_jaccard"),
            (F.col("sat_i") == 1).alias("state_saturated"),
        )
    )
