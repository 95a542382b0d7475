"""Data selection for LM training: DSIR importance weights and a
hashed-feature NB log-odds quality classifier.

Two published selection methods over the same Spark-shaped core:

* **DSIR** (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): estimate hashed-n-gram bag-of-words models
  on a small in-domain TARGET corpus and on the RAW pool, weight each
  raw doc by its log likelihood-ratio, keep the top slice.  The
  published feature map is exactly what :func:`hashed_features`
  computes — unigrams + bigrams hashed into ``n_buckets``.
* **NB log-odds classifier** (the fastText-style quality gate of
  GPT-3/LLaMA data work, in its deterministic Naive-Bayes form — Wang
  & Manning 2012's NB feature weights): train per-bucket log-odds
  from a labeled slice, score every doc by its mean feature weight.

Scale shape (both ops, the unigram-LM pattern from
``text_analysis.unigram_lm_scores``):

* feature extraction is pure JVM column algebra (split / zip_with /
  md5-bucket) — no Python in the hot path, whole-stage codegen;
* each model is ONE aggregation whose result has at most ``n_buckets``
  rows — broadcast-sized BY CONSTRUCTION (1e4 buckets ≈ 300 KB),
  independent of corpus size;
* scoring is a broadcast join + doc-keyed aggregation with map-side
  partials; the corpus never joins itself and nothing wider than
  (id, bucket) rides a shuffle;
* top-fraction selection uses Spark's distributed TakeOrdered
  (per-partition top-k, then merge) over (weight, id) pairs — never a
  single-partition global Window.

Engine parity (oracle contract): tokens via
``text_analysis.tokens_col`` (the pinned whitespace class), buckets
via the first 8 hex chars of md5 (the ``functions.sampling`` idiom —
identical in Spark and any SQL engine), probabilities in log10 with
add-one smoothing, outputs rounded to 4 decimals so float association
order cannot flip a comparison.
"""

from __future__ import annotations

import logging
import math

from pyspark.sql import Column, DataFrame, functions as F

from smart_ocr_spark.functions.text_analysis import tokens_col

_log = logging.getLogger(__name__)

DEFAULT_BUCKETS = 10_000
_SALT = "sel"


def bucket_col(tok: Column, n_buckets: int) -> Column:
    """Engine-independent feature hash: first 8 md5 hex chars of
    ``sel:<token>`` as uint32, mod ``n_buckets``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_SALT), F.lit(":"), tok)), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % n_buckets
    )


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, bucket) — one row per feature INSTANCE (unigrams + space-
    joined bigrams; counts matter for the bag-of-words models)."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    )
    feats = toks.select(
        "id",
        F.concat(
            F.col("t"),
            F.expr(
                "CASE WHEN size(t) < 2 THEN array() "
                "ELSE zip_with(slice(t, 1, size(t) - 1), "
                "slice(t, 2, size(t) - 1), (a, b) -> a || ' ' || b) END"
            ),
        ).alias("f"),
    )
    return feats.select("id", F.explode("f").alias("tok")).select(
        "id", bucket_col(F.col("tok"), n_buckets).alias("bucket")
    )


def _bucket_model(feats: DataFrame) -> DataFrame:
    """(bucket, c) counts — at most ``n_buckets`` rows."""
    return feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))


def logratio_weights(
    num_feats: DataFrame, den_feats: DataFrame, n_buckets: int
) -> DataFrame:
    """Per-bucket weight ``log10 p_num(b) - log10 p_den(b)`` with
    add-one smoothing over the full bucket space.  Output (bucket, w)
    has ≤ ``n_buckets + 1`` rows — always broadcast-sized.

    Buckets unseen in BOTH models still have a well-defined smoothed
    weight — ``log10(1/(n_num+B)) − log10(1/(n_den+B))``, a constant —
    carried as one sentinel row (``bucket = -1``, unreachable: real
    buckets are ``pmod ≥ 0``) so scoring applies genuine add-one
    smoothing instead of silently treating unseen features as 0."""
    num = _bucket_model(num_feats).withColumnRenamed("c", "cn")
    den = _bucket_model(den_feats).withColumnRenamed("c", "cd")
    totals = (
        num.agg(F.sum("cn").alias("n_num"))
        .crossJoin(den.agg(F.sum("cd").alias("n_den")))
        .select(
            F.coalesce("n_num", F.lit(0)).alias("n_num"),
            F.coalesce("n_den", F.lit(0)).alias("n_den"),
        )
    )

    def smoothed(cn, cd):
        return (
            F.log10(
                (cn + 1) / (F.col("n_num") + F.lit(n_buckets)).cast("double")
            )
            - F.log10(
                (cd + 1) / (F.col("n_den") + F.lit(n_buckets)).cast("double")
            )
        ).alias("w")

    joined = num.join(den, "bucket", "full").crossJoin(F.broadcast(totals))
    seen = joined.select(
        "bucket",
        smoothed(F.coalesce("cn", F.lit(0)), F.coalesce("cd", F.lit(0))),
    )
    unseen = totals.select(
        F.lit(-1).alias("bucket"), smoothed(F.lit(0), F.lit(0))
    )
    return seen.unionByName(unseen)


def _score_by_weights(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    score_alias: str,
) -> DataFrame:
    """Per-doc (n_features, sum-of-weights, mean weight); docs with no
    features score 0.0.  Broadcast join + doc-keyed agg only.

    Features hashing to a bucket unseen by either model take the
    smoothed unseen-bucket weight from the ``bucket = -1`` sentinel row
    (falling back to 0.0 only when ``weights`` carries no sentinel)."""
    feats = hashed_features(df, id_col, text_col, n_buckets)
    default = weights.where(F.col("bucket") == -1).agg(
        F.coalesce(F.min("w"), F.lit(0.0)).alias("w0")
    )
    scored = (
        feats.join(
            F.broadcast(weights.where(F.col("bucket") != -1)), "bucket", "left"
        )
        .crossJoin(F.broadcast(default))
    )
    # + 0.0 normalizes a rounded -0.0 to +0.0 (engine-parity: the two
    # stringify differently)
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_features"),
        (F.round(F.sum(F.coalesce("w", F.col("w0"))), 4) + F.lit(0.0)).alias(
            score_alias
        ),
        (F.round(F.avg(F.coalesce("w", F.col("w0"))), 4) + F.lit(0.0)).alias(
            "avg_weight"
        ),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.coalesce(score_alias, F.lit(0.0)).alias(score_alias),
            F.coalesce("avg_weight", F.lit(0.0)).alias("avg_weight"),
        )
    )


def dsir_importance(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-raw-doc DSIR importance: log10 likelihood ratio of the
    target vs raw hashed-n-gram models over the doc's features.

    Output: (id, n_features, log_weight, avg_weight) — higher
    ``log_weight`` = more target-like.  Deterministic end to end."""
    weights = logratio_weights(
        hashed_features(target_df, id_col, text_col, n_buckets),
        hashed_features(raw_df, id_col, text_col, n_buckets),
        n_buckets,
    )
    return _score_by_weights(
        raw_df, weights, id_col, text_col, n_buckets, "log_weight"
    )


def dsir_select(
    scored: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    takeordered_max_k: int = 5_000_000,
) -> DataFrame:
    """Deterministic top-``fraction`` selection (the resampling step,
    in its deterministic top-k form): rank by (rounded weight desc,
    id asc) and keep ``ceil(fraction * n)`` docs.

    Two scale tiers, identical output:
      * ``k ≤ takeordered_max_k``: ``orderBy().limit(k)`` — Spark's
        TakeOrdered (per-partition top-k + merge) — then a broadcast
        semi-join of the k ids.
      * larger k (the 10^9-doc regime, where collecting/broadcasting k
        ids would blow the driver and the 8 GB broadcast cap): find the
        exact BOUNDARY weight from the per-weight histogram (weights
        are rounded to 4 decimals, so the histogram is tiny), keep all
        rows strictly above it with a plain filter (no id list at
        all), and resolve only the boundary-weight class by
        TakeOrdered of the remaining ``r`` smallest ids.  ``r`` is
        bounded by the boundary class size — logged when it is large
        (a near-constant weight distribution is the degenerate case).
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    k = math.ceil(fraction * scored.count())
    if k <= takeordered_max_k:
        top = (
            scored.select(id_col, weight_col)
            .orderBy(F.desc(weight_col), F.asc(id_col))
            .limit(k)
            .select(id_col)
        )
        return scored.join(F.broadcast(top), id_col, "semi")

    hist = (
        scored.groupBy(weight_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc(weight_col))
        .collect()  # ≤ distinct rounded weights — tiny
    )
    cum = 0
    boundary, above = None, 0
    for r_ in hist:
        if cum + r_["c"] >= k:
            boundary, above = r_[weight_col], cum
            break
        cum += r_["c"]
    if boundary is None:  # k >= n: keep everything
        return scored
    r = k - above
    _log.info(
        "dsir_select threshold path: boundary weight %s, %d boundary "
        "rows to resolve by id", boundary, r,
    )
    kept_above = scored.where(F.col(weight_col) > boundary)
    boundary_ids = (
        scored.where(F.col(weight_col) == boundary)
        .select(id_col)
        .orderBy(F.asc(id_col))
        .limit(r)
    )
    kept_boundary = scored.where(F.col(weight_col) == boundary).join(
        boundary_ids, id_col, "semi"
    )
    return kept_above.unionByName(kept_boundary)


def nb_classifier_scores(
    df: DataFrame,
    labeled_df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Train per-bucket NB log-odds on ``labeled_df`` (boolean
    ``label_col``: true = positive class) and score every row of
    ``df``: (id, n_features, score, avg_weight, pred) with
    ``score`` = sum of feature log-odds and ``pred`` = score > 0.

    The labeled slice is typically small (human labels / a proxy
    rule); the model it produces is ≤ ``n_buckets`` rows regardless,
    so scoring the full corpus is one broadcast join."""
    pos = labeled_df.filter(F.col(label_col))
    neg = labeled_df.filter(~F.col(label_col))
    weights = logratio_weights(
        hashed_features(pos, id_col, text_col, n_buckets),
        hashed_features(neg, id_col, text_col, n_buckets),
        n_buckets,
    )
    scored = _score_by_weights(
        df, weights, id_col, text_col, n_buckets, "score"
    )
    return scored.withColumn("pred", F.col("score") > 0)
