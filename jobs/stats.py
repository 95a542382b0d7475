#!/usr/bin/env python
"""One-pass corpus profile: the first job a curation team runs on a
new dump — language mix, length/quality distributions, duplication
rates — before deciding thresholds for the real curation run.

Submit (cluster):
    spark-submit --py-files /tmp/smart_ocr_spark-*.zip jobs/stats.py \
        --input s3://bucket/dump/ --output s3://bucket/profile/

Scale shape: ONE scan feeds every profile metric (token/quality
scoring is the same map-only column algebra the funnel uses; the
cached scored frame is reused by each rollup inside one
``cache_scope``); duplication adds the single md5 hash-groupBy of the
exact tier.  Percentiles use ``percentile_approx`` (the documented
t-digest approximation — exact percentiles would need a full sort;
the report labels them approx_*).  Output: one JSON line (the report)
plus per-language parquet under --output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from smart_ocr_spark.functions import dedup
    from smart_ocr_spark.functions.cache import cache_scope, pin
    from smart_ocr_spark.functions.text_analysis import (
        with_quality_score, with_token_stats,
    )
    from smart_ocr_spark.session import build_session

    spark = build_session("socr-stats", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.monotonic()
    docs = spark.read.parquet(args.input)
    has_lang = "lang" in docs.columns

    with cache_scope():
        scored = pin(with_quality_score(with_token_stats(docs)))
        totals = scored.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").alias("n_tokens"),
            F.sum(F.length("text")).alias("n_chars"),
            F.percentile_approx(
                "token_count", [0.1, 0.5, 0.9, 0.99]
            ).alias("tok_pcts"),
            F.percentile_approx(
                "quality_score", [0.1, 0.5, 0.9]
            ).alias("q_pcts"),
        ).first()
        if has_lang:
            by_lang = scored.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("token_count").alias("n_tokens"),
                (F.round(F.avg("quality_score"), 4) + F.lit(0.0)).alias(
                    "avg_quality"
                ),
            )
            by_lang.write.mode("overwrite").parquet(
                os.path.join(args.output, "by_lang")
            )
            langs = {
                r["lang"]: r["n_docs"]
                for r in spark.read.parquet(
                    os.path.join(args.output, "by_lang")
                ).collect()
            }
        else:
            langs = {}
        groups = dedup.exact_dedup_groups(docs)
        dup = groups.agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("dup_count") - 1).alias("n_dup_rows"),
            F.max("dup_count").alias("max_group"),
        ).first()

    n_docs = int(totals["n_docs"])
    report = {
        "input": args.input,
        "n_docs": n_docs,
        "n_tokens": int(totals["n_tokens"] or 0),
        "n_chars": int(totals["n_chars"] or 0),
        "approx_token_pcts": {
            "p10": totals["tok_pcts"][0], "p50": totals["tok_pcts"][1],
            "p90": totals["tok_pcts"][2], "p99": totals["tok_pcts"][3],
        },
        "approx_quality_pcts": {
            "p10": totals["q_pcts"][0], "p50": totals["q_pcts"][1],
            "p90": totals["q_pcts"][2],
        },
        "langs": langs,
        "exact_dup": {
            "n_distinct_texts": int(dup["n_distinct"]),
            "n_duplicate_rows": int(dup["n_dup_rows"] or 0),
            "dup_rate": round(
                (dup["n_dup_rows"] or 0) / n_docs, 4
            ) if n_docs else 0.0,
            "largest_group": int(dup["max_group"] or 0),
        },
        "sec": round(time.monotonic() - t0, 2),
        "cache_empty": bool(
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        ),
    }
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
