#!/usr/bin/env python
"""N vs 4N scaling evidence for the CURATION core (the extraction
pipeline's evidence lives in scaling_run.py): quality funnel + Gopher
repetition + exact dedup + MinHash-LSH near-dup pairs + component
keep-list over a replicated documents corpus.

The corpus: /root/testdata/sf0.1 documents replicated --replicas
times; every doc gets a replica-salted suffix EXCEPT each 10th doc,
which is byte-identical across each replica PAIR (r and r^1) — a
deterministic planted dup population whose GROUP SIZE stays 2 no
matter how many replicas, so per-doc dedup work is constant and the
docs/sec comparison across parallelism levels measures the engine,
not a replica-quadratic pair explosion.

Prints ONE JSON line: wall seconds, docs/sec, kept counts (a
correctness echo: identical across parallelism levels or the run is
invalid), and the same-run hw-control probe from scaling_run.

Usage:
    python scripts/curation_scaling.py --master local[8]  --replicas 8
    python scripts/curation_scaling.py --master local[32] --replicas 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scaling_run import hw_probe  # noqa: E402


def build_docs(spark, sf_dir: str, replicas: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    reps = None
    for r in range(replicas):
        # every token gets a replica prefix, so replicas are textually
        # DISJOINT at shingle grain (a trailing salt would leave long
        # docs mutually near-dup across all replicas and bring back
        # the quadratic pair explosion); planted dups share the prefix
        # within their replica pair only
        pair_pfx = F.regexp_replace("text", r"(\S+)", f"p{r // 2}$1")
        solo_pfx = F.regexp_replace("text", r"(\S+)", f"r{r}$1")
        part = base.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            F.when(F.col("doc_id") % 10 == 0, pair_pfx)
            .otherwise(solo_pfx)
            .alias("text"),
            "lang",
        )
        reps = part if reps is None else reps.unionByName(part)
    return reps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--replicas", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    if args.replicas % 2 != 0:
        ap.error("--replicas must be even: planted dup groups pair "
                 "replicas (r, r^1); an odd count leaves singletons and "
                 "breaks the constant-work invariant")

    from smart_ocr_spark.functions import curation, dedup
    from smart_ocr_spark.functions.cache import cache_scope, pin
    from smart_ocr_spark.functions.components import canonical_docs
    from smart_ocr_spark.session import build_session

    spark = build_session("curation-scaling", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    # the replicated corpus is the INPUT, not the work under test — a
    # real job reads it from parquet once; pin + materialize it before
    # the timer so the measured stages don't replay the synthetic
    # 24-branch regexp build every time they touch the input
    docs = pin(build_docs(spark, args.sf_dir, args.replicas))
    n_docs = docs.count()

    probe_before = hw_probe()
    stage_sec = {}
    t0 = time.perf_counter()
    with cache_scope():
        ts = time.perf_counter()
        funnel = curation.curation_funnel(docs)
        n_keep = funnel.where("keep").count()
        stage_sec["funnel"] = round(time.perf_counter() - ts, 2)
        ts = time.perf_counter()
        # pinned: the components stage consumes the pair frame again —
        # unpinned, the whole signature+verify pipeline would re-run
        # (the curate job gets the same effect by writing pairs to
        # parquet and re-reading)
        pairs = pin(dedup.minhash_dedup_pairs(docs, threshold=0.8))
        n_pairs = pairs.count()
        stage_sec["neardup_pairs"] = round(time.perf_counter() - ts, 2)
        ts = time.perf_counter()
        keep = canonical_docs(docs.select("doc_id"), pairs)
        n_canon = keep.count()
        stage_sec["components"] = round(time.perf_counter() - ts, 2)
    wall = time.perf_counter() - t0
    probe_after = hw_probe()

    print(json.dumps({
        "metric": "curation_docs_per_sec",
        "value": round(n_docs / wall, 1),
        "unit": "docs/sec",
        "master": args.master,
        "replicas": args.replicas,
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "stage_sec": stage_sec,
        "funnel_keep": n_keep,
        "neardup_pairs": n_pairs,
        "neardup_canonical": n_canon,
        "hw_probe_before": round(probe_before, 1),
        "hw_probe_after": round(probe_after, 1),
        "hw_throttle_ratio": round(probe_after / probe_before, 3)
        if probe_before else None,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
