#!/usr/bin/env python
"""Cluster job: WER/CER/NES benchmark + calibration over a golden corpus
(the ``socr benchmark run|score|calibrate`` analog,
reference src/socr/cli.py:298-570).

Submit (cluster):
    spark-submit --py-files /tmp/smart_ocr_spark-*.zip jobs/benchmark.py \
        --input s3://bucket/golden_corpus/ --output s3://bucket/bench/

Local smoke:
    python jobs/benchmark.py --input /tmp/corpus --output /tmp/bench \
        --master 'local[8]'

The input table must have the corpus shape WITH the golden ``text``
column.  Writes scores / variant_summary / calibration as JSON datasets
and prints the per-category recommended fallback chains (O11) as one
JSON line — feed them back via ``run_extraction(chain=...)``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="golden corpus parquet path")
    ap.add_argument("--output", required=True, help="results root")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from smart_ocr_spark.plans import benchmark
    from smart_ocr_spark.session import build_session

    spark = build_session("socr-benchmark", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    documents = spark.read.parquet(args.input)

    results = benchmark.run_benchmark(spark, documents)
    benchmark.save_results(results, args.output)
    chains = benchmark.recommended_chains(results["calibration"])
    print(json.dumps({"recommended_chains": chains}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
