"""WER/CER/NES benchmark job — the ``socr benchmark run|score|calibrate``
analog (reference ``src/socr/benchmark/runner.py:124-148``,
``scorer.py:87-145``, ``calibrate.py:155-287``) as DataFrame transforms.

Given a corpus WITH golden text (the synthetic generator's ``text``
column is the ground truth), run the extraction pipeline keeping every
attempt, score each (variant, text) against the golden, and roll up:

  * per-variant summary (A5, ``cli.py:573-606``): avg WER/CER/NES, n;
  * per-(variant, category) calibration profile (A6) with a WER rank —
    the data behind the reference's recommended fallback chains
    (``calibrate.py:295-320``). Category comes from the corpus url
    (``https://host/<fixture_class>/NNNNNNN``), mirroring the
    reference's 7-category paper taxonomy (``dataset.py:93-167``).

Scoring is one Arrow batch pass (word/char Levenshtein in Python — the
reference's exact DP, ``scorer.py:42-81``); rollups are plain
aggregations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from smart_ocr_spark.plans.extract_pipeline import run_extraction

SCORE_SCHEMA = "wer double, cer double, nes double, truncated_score boolean"

# Levenshtein is O(len_a * len_b): unbounded it hangs on MB-scale docs
# (the big-blob fixtures). Scores above these caps are computed on the
# prefix and FLAGGED via truncated_score — never silently (the
# reference sidesteps this by scoring per page, scorer.py:179-234).
MAX_SCORE_CHARS = 5_000
MAX_SCORE_WORDS = 1_000


def attempt_scores(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """One row per (url, variant-attempt) with WER/CER/NES vs golden."""
    golden = documents.select("url", F.col("text").alias("golden"))
    res = run_extraction(spark, documents)
    attempts = res.select(
        "url",
        "lang",
        F.element_at(F.split("url", "/"), 4).alias("category"),
        F.explode("attempts").alias("a"),
    ).select(
        "url",
        "lang",
        "category",
        F.col("a.variant").alias("variant"),
        F.col("a.attempt_idx").alias("attempt_idx"),
        F.col("a.audit_passed").alias("audit_passed"),
        F.col("a.text").alias("predicted"),
    )
    joined = attempts.join(golden, "url")

    @F.pandas_udf(SCORE_SCHEMA)
    def score_udf(predicted: pd.Series, golden: pd.Series) -> pd.DataFrame:
        from smart_ocr_spark.kernel import score as S

        rows = []
        for p, g in zip(predicted, golden):
            p, g = p or "", g or ""
            truncated = False
            if len(p) > MAX_SCORE_CHARS or len(g) > MAX_SCORE_CHARS:
                # exact-equality fast path: identical texts need no DP
                if p == g:
                    rows.append((0.0, 0.0, 1.0, False))
                    continue
                p, g, truncated = p[:MAX_SCORE_CHARS], g[:MAX_SCORE_CHARS], True
            pw, gw = p.split(), g.split()
            if len(pw) > MAX_SCORE_WORDS or len(gw) > MAX_SCORE_WORDS:
                pw, gw, truncated = (
                    pw[:MAX_SCORE_WORDS],
                    gw[:MAX_SCORE_WORDS],
                    True,
                )
                p, g = " ".join(pw), " ".join(gw)
            # one char-level DP serves both CER and NES
            # (cer = dist/len(ref); nes = 1 - dist/max(len))
            cdist = S.levenshtein(p, g)
            cer = cdist / len(g) if g else (0.0 if not p else 1.0)
            mx = max(len(p), len(g))
            nes = 1.0 - (cdist / mx) if mx else 1.0
            rows.append((S.wer_cased(p, g), cer, nes, truncated))
        return pd.DataFrame(rows, columns=["wer", "cer", "nes", "truncated_score"])

    return (
        joined.withColumn("s", score_udf("predicted", "golden"))
        .select("url", "lang", "category", "variant", "attempt_idx",
                "audit_passed", "s.wer", "s.cer", "s.nes", "s.truncated_score")
    )


def variant_summary(scores: DataFrame) -> DataFrame:
    """A5: per-variant quality rollup."""
    return scores.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("wer"), 4).alias("avg_wer"),
        F.round(F.avg("cer"), 4).alias("avg_cer"),
        F.round(F.avg("nes"), 4).alias("avg_nes"),
        F.sum(F.col("audit_passed").cast("int")).alias("n_audit_pass"),
    )


def calibration_profiles(scores: DataFrame) -> DataFrame:
    """A6: per-(variant, category) profile + WER rank within category —
    rank 1 is the recommended primary engine for that category."""
    prof = scores.groupBy("variant", "category").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("wer"), 4).alias("avg_wer"),
        F.round(F.avg("nes"), 4).alias("avg_nes"),
    )
    w = Window.partitionBy("category").orderBy(F.asc("avg_wer"), F.asc("variant"))
    return prof.withColumn("wer_rank", F.row_number().over(w))


def recommended_chains(calibration: DataFrame) -> dict[str, list[str]]:
    """O11: per-category recommended fallback chains from calibration
    profiles (reference ``calibrate.py:295-320`` `_rank_engines_for_
    category`): variants with data for the category rank by that
    category's WER; variants without data go last, ranked by their
    average WER across all categories.  The calibration frame is tiny
    (variants x categories), so this is a driver-side fold; the result
    feeds ``run_extraction(chain=...)``."""
    from smart_ocr_spark.kernel import calibrate as calibrate_kernel
    from smart_ocr_spark.kernel.repair import DEFAULT_CHAIN

    rows = calibration.select("variant", "category", "avg_wer").collect()
    profiles: dict[str, dict] = {}
    cats: set[str] = set()
    for r in rows:
        prof = profiles.setdefault(
            r["variant"], {"engine": r["variant"], "category_wer": {}}
        )
        prof["category_wer"][r["category"]] = float(r["avg_wer"])
        cats.add(r["category"])
    # default-chain variants with no calibration data still belong in the
    # chain tail (ranked by the no-data rule)
    for v in DEFAULT_CHAIN:
        profiles.setdefault(v, {"engine": v, "category_wer": {}})
    plist = [profiles[v] for v in sorted(profiles)]
    return {
        cat: calibrate_kernel.rank_engines_for_category(cat, plist)
        for cat in cats
    }


def save_results(results: dict[str, DataFrame], out_dir: str) -> None:
    """JSON round-trip sinks (reference results.json / calibration.json,
    ``benchmark/runner.py:60-114``, ``calibrate.py:39-72``): one JSON
    dataset per rollup."""
    for name in ("scores", "variant_summary", "calibration"):
        results[name].write.mode("overwrite").json(f"{out_dir}/{name}.json")


def load_results(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.json(f"{out_dir}/{name}.json")
        for name in ("scores", "variant_summary", "calibration")
    }


def run_benchmark(spark: SparkSession, documents: DataFrame) -> dict[str, DataFrame]:
    scores = attempt_scores(spark, documents)
    scores = scores.persist()
    return {
        "scores": scores,
        "variant_summary": variant_summary(scores),
        "calibration": calibration_profiles(scores),
    }
