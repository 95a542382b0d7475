"""Train/eval contamination detection (training-data op).

Before trusting an eval score, a training pipeline checks whether eval
documents leak into the training corpus — the standard test is shared
word n-grams (GPT-3 used 13-grams; k is a knob).  Per eval document:
how many of its distinct k-grams appear ANYWHERE in the training
corpus, and the contamination rate.

Scale design: both sides explode to distinct (doc, shingle) rows; the
train side reduces to DISTINCT shingles (map-side partial distinct),
and the overlap is one shuffle keyed by shingle — the classic
hash-partitioned set-membership join.  No driver-side state, no N^2:
at 100 TB the train-shingle set shards across the cluster like any
other keyed table (a Bloom-filter pre-pass can cut the shuffle further;
the exact join IS the oracle-checkable ground truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from smart_ocr_spark.functions.dedup import exploded_shingles

CONTAMINATION_K = 8  # word n-gram length


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = CONTAMINATION_K,
) -> DataFrame:
    """Per eval doc: (id, n_shingles, n_contaminated, contamination).

    A doc with fewer than ``k`` tokens has no shingles and reports
    zero contamination over zero shingles (rate 0.0) — absent, not
    NULL, mirroring the dedup shingle convention.

    Single pass over the eval shingles: one LEFT join against the
    distinct train-shingle set with a hit marker, one aggregation
    counting total and hit shingles together — the expensive eval-side
    shingling UDF runs exactly once (a semi-join + separate per-doc
    count would evaluate it twice)."""
    ev = exploded_shingles(eval_df, id_col, text_col, k)
    train_shingles = (
        exploded_shingles(train, id_col, text_col, k)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    marked = ev.join(train_shingles, "shingle", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("__hit", F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 4),
        )
    )
