#!/usr/bin/env python
"""One scaling-evidence run: the extraction job at a given parallelism.

The north rule requires throughput scaling efficiency >= 0.8 between N
and 4N executors, evidenced in this sandbox as local[8] vs local[32] on
identical input (driver instruction; no real cluster available). This
script is one data point: it builds the replicated corpus (identical
for every run: deterministic replication of sf0.1 documents), runs the
full 5-phase extraction, and prints one JSON line with wall seconds and
docs/sec measured over the job alone (session startup excluded — a real
cluster amortizes it; a warm-up job forces executor/python-worker
spin-up first).

Usage: python scripts/scaling_run.py --master local[8] [--replicas 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, sf_dir: str, replicas: int, failure_rate: float = 0.0):
    """Replicated corpus; ``failure_rate`` plants a deterministic
    fraction of auditable-failing docs (CID-artifact payloads, the
    corpus generator's `cid` class marker) so the timed job exercises
    the repair loop — at the default 0 the 500k-doc run's failure count
    is tiny and the repair broadcast path never gets load-tested
    (VERDICT r2 #7).  Failing rows are selected by url hash, so the
    same rate yields the same rows at every parallelism level."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = spark.range(replicas).withColumnRenamed("id", "rep")
    url = F.concat(F.col("doc_id").cast("string"), F.lit("-"), F.col("rep"))
    body = F.concat(
        F.lit("<html><body><p>"),
        F.col("text"),
        F.lit(" rep "),
        F.col("rep").cast("string"),
        F.lit("</p></body></html>"),
    )
    if failure_rate > 0:
        fail_body = F.concat(
            F.lit("<html><body><p>(cid:7) "),
            F.col("text"),
            F.lit(" rep "),
            F.col("rep").cast("string"),
            F.lit("</p></body></html>"),
        )
        body = F.when(
            F.pmod(F.xxhash64(url), F.lit(10_000))
            < F.lit(int(failure_rate * 10_000)),
            fail_body,
        ).otherwise(body)
    return docs.crossJoin(rep).select(
        url.alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(body, "UTF-8").alias("html"),
        F.col("lang"),
    )


def hw_probe(seconds: float = 0.5, core: int = 0) -> float:
    """Single-core pinned CPU probe: MD5 rounds/sec on ``core``.

    The SAME-RUN hardware control (VERDICT r3 #7): sampled immediately
    before and after the timed Spark job, it records the box's
    effective per-core speed at that run's boundaries.  A drop between
    the two samples means sustained-load throttling engaged DURING the
    run — the 8→32 shortfall is then attributable to the host inside
    the same JSON line, not to a separate anecdote.  The probe pins
    itself to one core (the JVM is a separate process and is not
    affected) and restores affinity after."""
    import hashlib

    try:
        old = os.sched_getaffinity(0)
        os.sched_setaffinity(0, {core})
    except (AttributeError, OSError):
        old = None
    h = hashlib.md5()
    block = b"x" * 4096
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        for _ in range(100):
            h.update(block)
        n += 100
    rate = n / (time.perf_counter() - t0)
    if old is not None:
        try:
            os.sched_setaffinity(0, old)
        except OSError:
            pass
    return rate


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--failure-rate", type=float, default=0.0,
        help="fraction of docs planted as auditable failures (repair load)",
    )
    ap.add_argument(
        "--hw-control", action="store_true",
        help="sample a pinned single-core CPU probe before/after the "
             "timed run (same-run throttle attribution)",
    )
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from smart_ocr_spark.plans.extract_pipeline import run_extraction
    from smart_ocr_spark.session import build_session

    spark = build_session("scaling", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    # Materialize the replicated corpus to parquet FIRST: the timed job
    # must read a real table (parallel scan), not recompute a
    # single-task crossJoin inside the measurement.
    import tempfile

    sf_tag = os.path.basename(args.sf_dir.rstrip("/"))
    fr_tag = f"_f{int(args.failure_rate * 10_000)}" if args.failure_rate else ""
    corpus_path = os.path.join(
        tempfile.gettempdir(), f"scaling_corpus_{sf_tag}_r{args.replicas}{fr_tag}"
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        build_corpus(
            spark, args.sf_dir, args.replicas, args.failure_rate
        ).repartition(64).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()
    # real warm-up: run the pipeline on a slice so executor Python
    # workers fork + import BEFORE the timed region (a bare count()
    # never starts Python workers and would bias high-N runs)
    run_extraction(spark, corpus.limit(512)).count()

    from pyspark.sql import functions as F

    hw_before = hw_probe() if args.hw_control else None
    t0 = time.perf_counter()
    res = run_extraction(spark, corpus)
    # Force FULL computation (a bare count() lets Catalyst prune the
    # selection UDF) and capture an order-independent corpus checksum:
    # it must be identical at every parallelism level (byte-identical
    # output independent of partitioning, SURVEY.md §7.3.1).
    agg = res.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(url, final_text))").alias("checksum"),
        F.sum(F.length("final_text")).alias("total_text_bytes"),
        F.sum((F.size("attempts") > 1).cast("long")).alias("n_multi_attempt"),
        # repair (not enhancement) rounds: extra attempts on docs whose
        # PRIMARY attempt failed audit — enhancement also escalates but
        # only on docs whose first attempt passed
        F.sum(
            F.expr(
                "cast(exists(attempts, a -> a.escalated_from != '')"
                " and not attempts[0].audit_passed as long)"
            )
        ).alias("n_repaired_docs"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    hw_after = hw_probe() if args.hw_control else None

    assert agg["n"] == n_docs, (agg["n"], n_docs)
    out = {
        "master": args.master,
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 2),
        "corpus_checksum": int(agg["checksum"]),
        "total_text_bytes": int(agg["total_text_bytes"]),
        "n_multi_attempt": int(agg["n_multi_attempt"]),
        "n_repaired_docs": int(agg["n_repaired_docs"]),
        "failure_rate": args.failure_rate,
        "sf_dir": args.sf_dir,
        "replicas": args.replicas,
    }
    if args.hw_control:
        out["hw_core_rate_before"] = round(hw_before, 0)
        out["hw_core_rate_after"] = round(hw_after, 0)
        # < 1.0 means the box slowed down over this run's duration
        out["hw_throttle_ratio"] = round(hw_after / hw_before, 3)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
