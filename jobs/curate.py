#!/usr/bin/env python
"""Cluster job: multi-sweep corpus curation over a documents table.

Submit (cluster):
    python -c "from smart_ocr_spark.session import make_pyfiles_zip as z; print(z())"
    spark-submit --py-files /tmp/smart_ocr_spark-*.zip jobs/curate.py \
        --input  s3://bucket/documents/    \
        --output s3://bucket/curated/      \
        --sweeps funnel,url,paragraph,neardup

Local smoke:
    python jobs/curate.py --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/curated --master 'local[4]'

Runs the training-data curation sweeps in sequence, each as its own
bounded Spark job wrapped in ``functions.cache.cache_scope()`` — the
multi-sweep seam (VERDICT r4 #4): every sweep's pinned intermediates
(MinHash signatures, SimHash chunk unions, k-means assignments) are
released when the sweep's outputs are materialized, so a 5-sweep run
over a 100 TB corpus holds at most ONE sweep's cache at a time instead
of accreting all of them.  The final JSON line reports per-sweep
row counts, durations, and ``cache_empty`` — the runtime evidence the
seam worked, mirroring the pytest pin.

Sweeps (each skippable; each writes parquet under --output):
  funnel     — quality floor + Gopher repetition + exact-content dedup
               per-doc verdicts (functions/curation.curation_funnel)
               plus the stage-survival report.
  url        — canonical-URL keep-list + per-host stats (needs a `url`
               column; skipped with a warning otherwise).
  paragraph  — ccnet paragraph-grain dedup with doc reassembly.
  neardup    — MinHash-LSH near-dup pairs + component keep-list
               (functions/dedup.minhash_dedup_pairs + canonical_docs).
  semantic   — SemDeDup over --embeddings (skipped unless given);
               k derived from corpus size (k=None).

The input table must carry (doc_id, text) and optionally (lang, url).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SWEEPS = "funnel,url,paragraph,neardup"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--sweeps", default=DEFAULT_SWEEPS,
                    help=f"comma list (default: {DEFAULT_SWEEPS}); "
                         "'semantic' needs --embeddings")
    ap.add_argument("--embeddings", default=None,
                    help="embeddings parquet (vec_id, embedding) for the "
                         "semantic sweep")
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--min-tokens", type=int, default=None)
    ap.add_argument("--langs", default=None, help="comma allowlist")
    ap.add_argument("--jaccard", type=float, default=0.8,
                    help="near-dup verification threshold")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from smart_ocr_spark.functions import curation, dedup, urls
    from smart_ocr_spark.functions.cache import cache_scope
    from smart_ocr_spark.functions.components import canonical_docs
    from smart_ocr_spark.session import build_session

    spark = build_session("socr-curate", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)
    sweeps = [s.strip() for s in args.sweeps.split(",") if s.strip()]
    langs = args.langs.split(",") if args.langs else None
    funnel_kwargs = {}
    if args.min_quality is not None:
        funnel_kwargs["min_quality"] = args.min_quality
    if args.min_tokens is not None:
        funnel_kwargs["min_tokens"] = args.min_tokens

    report: dict[str, object] = {"input": args.input, "sweeps": {}}

    def run_sweep(name, fn):
        t0 = time.monotonic()
        with cache_scope():
            stats = fn()  # must materialize (write) inside the scope
        stats["sec"] = round(time.monotonic() - t0, 3)
        report["sweeps"][name] = stats

    def out(sub):
        return os.path.join(args.output, sub)

    def write(df, sub):
        df.write.mode("overwrite").parquet(out(sub))
        return spark.read.parquet(out(sub)).count()

    if "funnel" in sweeps:
        def funnel_sweep():
            fun = curation.curation_funnel(docs, langs=langs, **funnel_kwargs)
            n = write(fun, "funnel")
            rep = curation.funnel_report(
                spark.read.parquet(out("funnel"))
            ).first().asDict()
            return {"rows": n, **rep}
        run_sweep("funnel", funnel_sweep)

    if "url" in sweeps:
        if "url" in docs.columns:
            def url_sweep():
                keep = urls.url_dedup_keep_list(docs)
                n = write(keep, "url_keep")
                nh = write(urls.host_stats(docs), "host_stats")
                return {"rows": n, "hosts": nh}
            run_sweep("url", url_sweep)
        else:
            report["sweeps"]["url"] = {"skipped": "no url column"}

    if "paragraph" in sweeps:
        def paragraph_sweep():
            para = dedup.paragraph_dedup(docs)
            n = write(para, "paragraph")
            kept = spark.read.parquet(out("paragraph")).agg(
                F.sum("n_paras").alias("p"), F.sum("n_kept").alias("k")
            ).first()
            return {"rows": n, "paras": kept["p"], "paras_kept": kept["k"]}
        run_sweep("paragraph", paragraph_sweep)

    if "neardup" in sweeps:
        def neardup_sweep():
            pairs = dedup.minhash_dedup_pairs(docs, threshold=args.jaccard)
            np_ = write(pairs, "neardup_pairs")
            nk = write(
                canonical_docs(docs.select("doc_id"),
                               spark.read.parquet(out("neardup_pairs"))),
                "neardup_keep",
            )
            return {"pairs": np_, "kept": nk}
        run_sweep("neardup", neardup_sweep)

    if "semantic" in sweeps:
        if args.embeddings:
            def semantic_sweep():
                from smart_ocr_spark.functions import similarity

                vecs = spark.read.parquet(args.embeddings)
                sem = similarity.semantic_dedup(vecs, k=None)
                n = write(sem, "semantic")
                agg = spark.read.parquet(out("semantic")).agg(
                    F.sum(F.col("kept").cast("long")).alias("kept"),
                    F.max("n_nbr_dropped").alias("nbr_dropped"),
                ).first()
                return {"rows": n, "kept": agg["kept"],
                        "nbr_dropped": agg["nbr_dropped"]}
            run_sweep("semantic", semantic_sweep)
        else:
            report["sweeps"]["semantic"] = {"skipped": "no --embeddings"}

    # the seam's runtime evidence: nothing pinned survives its sweep
    report["cache_empty"] = bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    )
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
