#!/usr/bin/env python
"""Cluster job: checkpointed extraction over a documents table.

Submit (cluster):
    python -c "from smart_ocr_spark.session import make_pyfiles_zip as z; print(z())"
    spark-submit --py-files /tmp/smart_ocr_spark-*.zip jobs/extract.py \
        --input  s3://bucket/documents/   \
        --output s3://bucket/extracted/   \
        --buckets 16384

Local smoke:
    python jobs/extract.py --input /tmp/corpus --output /tmp/out --buckets 32

The input table must have the corpus shape
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING?, lang STRING).
Re-running after a kill resumes from the per-bucket lineage state —
completed buckets are skipped, half-written buckets are overwritten
idempotently (see smart_ocr_spark/plans/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet/table path")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "warc"],
                    help="'warc' ingests Common-Crawl shard files "
                         "(.warc/.warc.gz) via sources/warc.py")
    ap.add_argument("--output", required=True, help="output root (results + state)")
    ap.add_argument("--buckets", type=int, default=1024)
    ap.add_argument("--max-buckets", type=int, default=None,
                    help="cap buckets this run (bounded blast radius)")
    ap.add_argument("--dry-run", action="store_true",
                    help="report pending buckets/rows without processing")
    ap.add_argument("--embed-figures", action="store_true",
                    help="append figure blocks (metadata + deterministic "
                         "stub captions) to final_text, reference "
                         "save_figures analog")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from smart_ocr_spark.plans.checkpoint import run_with_checkpoint
    from smart_ocr_spark.session import build_session

    spark = build_session("socr-extract", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    if args.input_format == "warc":
        from smart_ocr_spark.sources.warc import warc_to_corpus

        documents = warc_to_corpus(spark, args.input)
    else:
        documents = spark.read.parquet(args.input)

    stats = run_with_checkpoint(
        spark,
        documents,
        args.output,
        n_buckets=args.buckets,
        max_buckets_this_run=args.max_buckets,
        dry_run=args.dry_run,
        embed_figures=args.embed_figures,
    )
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
