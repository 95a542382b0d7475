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
  ingest     — dump-vs-history ingestion pair (needs --history, the
               accepted-corpus parquet): the Bloom EXACT tier drops
               rows whose text already exists in history
               (functions/bloom.incremental_new_keys — output exactly
               the anti-join), then the MinHash NEAR-dup tier drops
               rows with a verified near-duplicate in history
               (functions/dedup.minhash_incremental_new_docs —
               history never self-joins; dump-side signatures only).
               Survivors become the working set for every later sweep,
               so a rolling crawl re-curates only genuinely-new docs.
               Writes the NEXT epoch's signature artifact
               (history_sig_next = history ∪ accepted-dump signatures);
               pass it back as --history-sig next run so the history
               is never re-signed.
  funnel     — quality floor + Gopher repetition + exact-content dedup
               per-doc verdicts (functions/curation.curation_funnel)
               plus the stage-survival report.
  url        — canonical-URL keep-list + per-host stats (needs a `url`
               column; skipped with a warning otherwise).
  compliance — UT1-style domain-blocklist filter (--blocklist parquet
               with a `domain` column; suffix-chain equi-join) and/or
               RFC 9309 robots.txt evaluation (--robots parquet with
               (host, robots_txt); --robots-agent selects the group).
               Writes per-doc verdicts + keep; skipped with a warning
               unless a url column and at least one input exist.
  paragraph  — ccnet paragraph-grain dedup with doc reassembly.
  neardup    — MinHash-LSH near-dup pairs + component keep-list
               (functions/dedup.minhash_dedup_pairs + canonical_docs).
  semantic   — SemDeDup over --embeddings (skipped unless given);
               k derived from corpus size (k=None).
  c4         — C4 cleaning verdicts (Raffel et al. 2020 line rules +
               page flags) per doc (functions/c4.c4_clean).  Opt-in:
               its page rules assume sentence-structured web prose and
               honestly reject corpora without terminal punctuation
               (e.g. the synthetic test tables).
  spans      — exact-substring removal (Lee et al. 2022 grain):
               corpus-recurring --span-window token blocks survive
               only at their global first occurrence; writes per-doc
               cleaned_text + removal counts.
  shards     — final training-shard assembly: docs surviving every
               gate present under --output (funnel keep, neardup
               keep-list, c4 page_keep, compliance keep — each applied iff its sweep
               output exists, so earlier runs' gates compose; a spans
               output swaps in its span-deduped cleaned_text) are
               shuffled into --shards hash-uniform shards and packed
               onto --seq-len token tapes in shuffled order
               (functions/packing.pack_shuffled), plus a per-shard
               manifest (docs, tokens, bins).

The input table must carry (doc_id, text) and optionally (lang, url).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SWEEPS = "funnel,url,compliance,paragraph,neardup,shards"


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
    ap.add_argument("--history", default=None,
                    help="accepted-corpus parquet (doc_id, text) for the "
                         "ingest sweep (dump-vs-history dedup tiers)")
    ap.add_argument("--history-sig", default=None,
                    help="stored MinHash signature parquet for --history "
                         "(the history_sig_next artifact of the previous "
                         "epoch); skips re-signing the whole history")
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--min-tokens", type=int, default=None)
    ap.add_argument("--langs", default=None, help="comma allowlist")
    ap.add_argument("--jaccard", type=float, default=0.8,
                    help="near-dup verification threshold")
    ap.add_argument("--shards", type=int, default=8,
                    help="training shard count for the shards sweep")
    ap.add_argument("--seq-len", type=int, default=512,
                    help="token budget per packed training sequence")
    ap.add_argument("--span-window", type=int, default=8,
                    help="token-block size for the spans sweep")
    ap.add_argument("--blocklist", default=None,
                    help="parquet with a `domain` column (UT1-style "
                         "registered-domain blocklist) for the "
                         "compliance sweep")
    ap.add_argument("--robots", default=None,
                    help="parquet with (host, robots_txt) for the "
                         "compliance sweep")
    ap.add_argument("--robots-agent", default="*",
                    help="user-agent token evaluated against robots "
                         "groups (default '*')")
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

    def out_exists(sub):
        # Hadoop FS, not os.path: --output may be s3://... or hdfs://...
        # where os.path.isdir is always False and the shards sweep would
        # silently skip every gate
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(out(sub))
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(p))

    def write(df, sub):
        df.write.mode("overwrite").parquet(out(sub))
        return spark.read.parquet(out(sub)).count()

    if "ingest" in sweeps:
        if args.history:
            def ingest_sweep():
                from smart_ocr_spark.functions import bloom
                from smart_ocr_spark.functions.cache import pin

                hist = spark.read.parquet(args.history).select(
                    "doc_id", "text"
                )
                n_in = docs.count()
                # pin: the near-dup tier consumes this lineage three
                # more times (signature pass, semi-join, final
                # left-anti) — unpinned, the Bloom build+probe over the
                # whole history would re-run for each
                exact_new = pin(bloom.incremental_new_keys(
                    docs, hist, "text"
                ))
                n_exact = exact_new.count()
                # sign (or load) the history ONCE — the same frame
                # feeds the near-dup tier and the next-epoch artifact;
                # an unshared second minhash_signatures(hist) would
                # re-run the dominant full-history kernel
                hist_sig = (
                    spark.read.parquet(args.history_sig)
                    if args.history_sig
                    else pin(dedup.minhash_signatures(hist))
                )
                kept = dedup.minhash_incremental_new_docs(
                    exact_new.drop("bloom_candidate"), hist,
                    threshold=args.jaccard, seen_sig=hist_sig,
                )
                n = write(kept, "ingest")
                # per-epoch signature artifact: next run's history is
                # (history ∪ accepted dump), so persist exactly those
                # signatures — the next invocation passes
                # --history-sig and never re-signs its history.
                # Staged write: --history-sig may BE this run's
                # history_sig_next path (same --output across epochs),
                # and Spark cannot overwrite a path it is reading —
                # materialize to a staging dir, then swap atomically.
                kept_docs = spark.read.parquet(out("ingest")).select(
                    "doc_id", "text"
                )
                next_sig = hist_sig.unionByName(
                    dedup.minhash_signatures(kept_docs)
                )
                next_sig.write.mode("overwrite").parquet(
                    out("history_sig_staging")
                )
                jvm = spark._jvm
                hpath = jvm.org.apache.hadoop.fs.Path
                fs = hpath(args.output).getFileSystem(
                    spark._jsc.hadoopConfiguration()
                )
                dst = hpath(out("history_sig_next"))
                prev = hpath(out("history_sig_prev"))
                # recoverable swap (rename failures on Hadoop FS report
                # via a FALSE return, not an exception — check both):
                # old -> _prev, staging -> dst, then drop _prev.  A
                # crash mid-swap leaves _prev and/or staging on disk,
                # never zero copies.
                fs.delete(prev, True)
                if fs.exists(dst) and not fs.rename(dst, prev):
                    raise RuntimeError(
                        f"could not stage aside {dst} -> {prev}"
                    )
                if not fs.rename(hpath(out("history_sig_staging")), dst):
                    raise RuntimeError(
                        f"rename of staged signature artifact to {dst} "
                        "failed; previous epoch preserved at "
                        f"{prev}"
                    )
                fs.delete(prev, True)
                n_sig = spark.read.parquet(
                    out("history_sig_next")
                ).count()
                return {
                    "rows_in": n_in,
                    "exact_new": n_exact,
                    "rows": n,
                    "dropped_exact": n_in - n_exact,
                    "dropped_neardup": n_exact - n,
                    "sig_rows_next": n_sig,
                    "sig_reused": args.history_sig is not None,
                }
            run_sweep("ingest", ingest_sweep)
            # every later sweep curates only the genuinely-new docs
            docs = spark.read.parquet(out("ingest"))
        else:
            report["sweeps"]["ingest"] = {"skipped": "no --history"}

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

    if "compliance" in sweeps:
        if "url" not in docs.columns:
            report["sweeps"]["compliance"] = {"skipped": "no url column"}
        elif not (args.blocklist or args.robots):
            report["sweeps"]["compliance"] = {
                "skipped": "no --blocklist/--robots"
            }
        else:
            def compliance_sweep():
                from smart_ocr_spark.functions import robots as robots_mod

                # both filters emit exactly one row per input doc, so
                # the single-source case needs NO join — the second
                # source (when given) joins onto the first
                verdict = None
                if args.blocklist:
                    bl = spark.read.parquet(args.blocklist)
                    verdict = urls.url_blocklist_filter(docs, bl)
                if args.robots:
                    rb = spark.read.parquet(args.robots)
                    rf = robots_mod.robots_filter(
                        docs, rb, agent=args.robots_agent
                    )
                    if verdict is None:
                        verdict = rf.select(
                            "doc_id", "host",
                            F.lit(False).alias("blocked"),
                            F.lit(None).cast("string").alias(
                                "matched_domain"
                            ),
                            "robots_blocked", "matched_rule",
                        )
                    else:
                        verdict = verdict.join(
                            rf.select(
                                "doc_id", "robots_blocked", "matched_rule"
                            ),
                            "doc_id",
                        )
                else:
                    verdict = verdict.withColumns(
                        {
                            "robots_blocked": F.lit(False),
                            "matched_rule": F.lit(None).cast("string"),
                        }
                    )
                verdict = verdict.withColumn(
                    "keep",
                    ~F.col("blocked") & ~F.col("robots_blocked"),
                )
                n = write(verdict, "compliance")
                agg = spark.read.parquet(out("compliance")).agg(
                    F.sum(F.col("blocked").cast("long")).alias("bl"),
                    F.sum(F.col("robots_blocked").cast("long")).alias("rb"),
                    F.sum(F.col("keep").cast("long")).alias("k"),
                ).first()
                return {"rows": n, "blocklist_blocked": agg["bl"],
                        "robots_blocked": agg["rb"], "kept": agg["k"]}
            run_sweep("compliance", compliance_sweep)

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

    if "c4" in sweeps:
        def c4_sweep():
            from smart_ocr_spark.functions import c4 as c4f

            n = write(c4f.c4_clean(docs), "c4")
            agg = spark.read.parquet(out("c4")).agg(
                F.sum(F.col("page_keep").cast("long")).alias("pages_kept"),
                F.sum("n_lines").alias("lines"),
                F.sum("n_kept").alias("lines_kept"),
            ).first()
            return {"rows": n, "pages_kept": agg["pages_kept"],
                    "lines": agg["lines"], "lines_kept": agg["lines_kept"]}
        run_sweep("c4", c4_sweep)

    if "spans" in sweeps:
        def spans_sweep():
            cleaned = dedup.remove_dup_spans(docs, window=args.span_window)
            n = write(cleaned, "spans")
            agg = spark.read.parquet(out("spans")).agg(
                F.sum("n_blocks").alias("b"),
                F.sum("n_removed_blocks").alias("r"),
            ).first()
            return {"rows": n, "blocks": agg["b"],
                    "blocks_removed": agg["r"]}
        run_sweep("spans", spans_sweep)

    if "shards" in sweeps:
        def shards_sweep():
            from smart_ocr_spark.functions import packing

            survivors = docs.select("doc_id", "text")
            gates = []
            n_spans_swapped = n_emptied = 0
            if out_exists("spans"):
                # spans is a TEXT TRANSFORM, not a keep/drop gate:
                # left-join + coalesce so docs absent from a stale
                # spans output (e.g. a newer dump) keep their raw text
                # instead of silently vanishing from the shards
                gates.append("spans")
                sp = spark.read.parquet(out("spans")).select(
                    "doc_id", F.col("cleaned_text").alias("__ct")
                )
                from smart_ocr_spark.functions.cache import pin as _pin

                # pinned: three actions consume this join (swap count,
                # emptied count, packing) — the sweep's cache_scope
                # releases it
                survivors = _pin(
                    survivors.join(sp, "doc_id", "left").select(
                        "doc_id",
                        F.coalesce("__ct", "text").alias("text"),
                        F.col("__ct").isNotNull().alias("__swapped"),
                    )
                )
                n_spans_swapped = survivors.where("__swapped").count()
                survivors = survivors.drop("__swapped")
                # a fully-duplicated doc dedups to '' — drop it from
                # the tapes, counted, never silent
                tlen = F.coalesce(F.length(F.trim("text")), F.lit(0))
                n_emptied = survivors.where(tlen == 0).count()
                survivors = survivors.where(tlen > 0)
            # keep/drop gates share one shape; a doc ABSENT from a
            # gate's verdict table (a stale output from an earlier
            # epoch under the same --output) is dropped like a
            # keep=false doc, but COUNTED per gate — cross-epoch
            # staleness must never be silent
            gate_absent: dict[str, int] = {}

            def apply_gate(name: str, sub: str, keep_col: str | None):
                nonlocal survivors
                verdicts = spark.read.parquet(out(sub))
                n_absent = survivors.join(
                    verdicts.select("doc_id"), "doc_id", "left_anti"
                ).count()
                if keep_col is not None:
                    verdicts = verdicts.where(F.col(keep_col))
                survivors = survivors.join(
                    verdicts.select("doc_id"), "doc_id"
                )
                gates.append(name)
                if n_absent:
                    gate_absent[name] = n_absent

            if out_exists("funnel"):
                apply_gate("funnel", "funnel", "keep")
            if out_exists("neardup_keep"):
                apply_gate("neardup", "neardup_keep", None)
            if out_exists("c4"):
                apply_gate("c4", "c4", "page_keep")
            if out_exists("compliance"):
                apply_gate("compliance", "compliance", "keep")
            packed = packing.pack_shuffled(
                survivors, budget=args.seq_len, n_shards=args.shards
            )
            n = write(packed, "shards")
            manifest = (
                spark.read.parquet(out("shards"))
                .groupBy("shard_id")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tokens").alias("n_tokens"),
                    (F.max("bin_id") + 1).alias("n_bins"),
                )
            )
            nm = write(manifest, "shard_manifest")
            return {"rows": n, "gates": gates, "shards": nm,
                    "seq_len": args.seq_len,
                    "spans_swapped": n_spans_swapped,
                    "emptied_dropped": n_emptied,
                    "gate_absent_dropped": gate_absent}
        run_sweep("shards", shards_sweep)

    # the seam's runtime evidence: nothing pinned survives its sweep
    report["cache_empty"] = bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    )
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
