#!/usr/bin/env python
"""Headline benchmark: runs the flagship extraction pipeline plus one
query per major operator family at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], printing ONE JSON
line with per-query wall seconds.

Usage:  python bench.py [--master local[N]] [--sf-dir DIR] [--json-only]
Extra keys beyond the driver contract: docs_per_sec (extraction
throughput over the documents corpus) and master (parallelism used),
which feed the N-vs-4N scaling evidence in BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


HEADLINE = [
    # name -> most load-bearing queries per family (see __spark_entry__)
    "extract_roundtrip",        # the engine itself (docs/sec comes from this)
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
    "dedup_simhash16",          # bit-algebra dedup
    "ann_cosine_topk",          # brute-force similarity
    "ann_lsh_topk",             # bucketed similarity (scale path)
    "kmeans_clusters",          # iterative clustering (broadcast Lloyd)
    "text_quality",             # scalar battery
    "merge_latest_state",       # checkpoint upsert analog
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--queries", default=None, help="comma-separated subset")
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
    qs = entrymod.queries()
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
    n_docs = 0
    extract_sec = None
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        rows = df.count()  # force full execution
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        if name == "extract_roundtrip":
            n_docs, extract_sec = rows, dt
        print(f"# {name}: {dt:.2f}s ({rows} rows)", file=sys.stderr)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "master": master,
        "docs_per_sec": round(n_docs / extract_sec, 2) if extract_sec else None,
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
