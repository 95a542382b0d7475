#!/usr/bin/env python
"""Headline benchmark: runs the flagship extraction pipeline plus one
query per major operator family at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], printing ONE JSON
line with per-query wall seconds.

Trust protocol (round 3): each query runs WARMED_REPS times and the
recorded number is the MEDIAN, with the [min, max] spread recorded per
query in `queries_spread` — a regression claim against this file is
only meaningful outside the recorded band.  `docs_per_sec` (the
throughput headline) is measured on the 500k-doc replicated scaling
corpus, where kernel work dominates, NOT on the 5k-row sf0.1 table
whose per-query numbers are Spark-fixed-overhead-bound (~1.6 kernel
core-seconds inside a ~5s query); that job also reports its
order-independent corpus checksum so the throughput number is tied to
byte-identical output.  Set SPARK_GRAFT_BENCH_REPLICAS=0 to skip the
scaling phase (docs_per_sec then falls back to the sf0.1 extract).

Usage:  python bench.py [--master local[N]] [--sf-dir DIR]
                        [--queries a,b] [--reps N] [--replicas N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


HEADLINE = [
    # name -> most load-bearing queries per family (see __spark_entry__)
    "extract_roundtrip",        # the engine itself
    "extract_pdf_roundtrip",    # the PDF kernel end-to-end
    "figures_fanout",           # figure metadata (union-find clustering)
    "rollup_pricing",           # shuffle agg
    "join_broadcast_rollup",    # multi-join + broadcast dims
    "window_first_passing",     # window
    "ordered_assembly",         # order-sensitive agg
    "selfjoin_pairwise",        # self-join
    "dedup_exact",              # hash dedup
    "dedup_minhash",            # minhash signatures (map-heavy)
    "dedup_ngram_jaccard",      # inverted-index pairwise dedup
    "dedup_simhash64_pairs",    # bit-algebra dedup (the SCALE path:
                                # map-only sig + pigeonhole blocking;
                                # simhash16's 16x-token explode is the
                                # oracle variant, not the headline)
    "ann_cosine_topk",          # brute-force similarity
    "ann_lsh_topk",             # bucketed similarity (scale path)
    "kmeans_clusters",          # iterative clustering (broadcast Lloyd)
    "text_quality",             # scalar battery
    "merge_latest_state",       # checkpoint upsert analog
]

WARMED_REPS = 3
DEFAULT_REPLICAS = 100  # x 5k sf0.1 docs = 500k-doc scaling corpus


def _run_scaling(spark, sf_dir: str, replicas: int) -> dict:
    """The kernel-dominated throughput measurement (same protocol as
    scripts/scaling_run.py: materialized corpus, pipeline warm-up,
    timed full run forced through an order-independent checksum)."""
    import tempfile

    from pyspark.sql import functions as F

    from scripts.scaling_run import build_corpus
    from smart_ocr_spark.plans.extract_pipeline import run_extraction

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    corpus_path = os.path.join(
        tempfile.gettempdir(), f"scaling_corpus_{sf_tag}_r{replicas}"
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        build_corpus(spark, sf_dir, replicas).repartition(64).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()
    run_extraction(spark, corpus.limit(512)).count()  # python-worker warm-up
    t0 = time.perf_counter()
    agg = (
        run_extraction(spark, corpus)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(url, final_text))").alias("checksum"),
        )
        .collect()[0]
    )
    wall = time.perf_counter() - t0
    assert agg["n"] == n_docs, (agg["n"], n_docs)
    return {
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 2),
        "corpus_checksum": int(agg["checksum"]),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--reps", type=int, default=WARMED_REPS)
    ap.add_argument(
        "--replicas",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", DEFAULT_REPLICAS)),
        help="scaling-corpus replicas for docs_per_sec (0 disables)",
    )
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from smart_ocr_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = args.master or f"local[{cpus}]"
    spark = build_session("bench", master=master)
    spark.sparkContext.setLogLevel("ERROR")

    names = (
        [n.strip() for n in args.queries.split(",")] if args.queries else HEADLINE
    )
    # resolve from BOTH pools so registry rotations can never break a
    # HEADLINE name (and --queries can measure overflow ops too)
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; valid: {sorted(qs)}")

    # Warm-up (uncounted): spin up executor Python workers + JIT so the
    # first timed query doesn't absorb one-time process costs.
    try:
        qs["extract_roundtrip"](spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass  # warm-up is best-effort (path may not exist off-sandbox)

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        reps = []
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            rows = df.count()  # force full execution
            reps.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(reps), 3)
        spreads[name] = [round(min(reps), 3), round(max(reps), 3)]
        print(
            f"# {name}: median {timings[name]:.2f}s "
            f"[{spreads[name][0]:.2f}, {spreads[name][1]:.2f}] ({rows} rows)",
            file=sys.stderr,
        )

    scaling = None
    if args.replicas > 0 and not args.queries:
        scaling = _run_scaling(spark, args.sf_dir, args.replicas)
        print(f"# scaling: {scaling}", file=sys.stderr)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_spread": spreads,
        "reps": max(args.reps, 1),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "master": master,
        # throughput headline: kernel-dominated 500k-doc run when
        # available, else the overhead-bound sf0.1 extract as fallback
        "docs_per_sec": (
            scaling["docs_per_sec"] if scaling else None
        ),
        "scaling": scaling,
    }
    if result["docs_per_sec"] is None and "extract_roundtrip" in timings:
        n = qs["extract_roundtrip"](spark, args.sf_dir).count()
        result["docs_per_sec"] = round(n / timings["extract_roundtrip"], 2)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
