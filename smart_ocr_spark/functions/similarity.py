"""Similarity search over an embedding column (array<float>).

Two tiers:
  * brute-force cosine top-k — the exactness baseline; all-JVM column
    algebra (zip_with/aggregate dot products), broadcast of the (small)
    query side, one window for the top-k cut. Correct at any scale where
    |queries| x |corpus| pairs is materializable.
  * LSH-bucketed top-k — the scale path: deterministic random-hyperplane
    signs from md5 (no RNG, resume-safe), candidates restricted to
    matching buckets (multi-probe via multiple tables), exact re-rank on
    candidates only. Shuffle keyed by bucket; no N^2 blowup.

Embedding-cosine near-dup dedup is `cosine_near_dup_pairs` (same kernel,
threshold filter instead of top-k).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StringType


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def norm_col(vec):
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def dot_col(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("__v", v).withColumn("__norm", norm_col(F.col("__v")))


def cosine_topk(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    queries defaults to the corpus itself (self-join, self-pairs
    excluded). The query side is broadcast — at 100 TB the corpus stays
    partitioned and only the probe set ships. Rank ties broken by
    neighbor id for total determinism.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("nbr_id"),
        F.col("__v").alias("nv"),
        F.col("__norm").alias("nn"),
    )
    q = with_norm(queries if queries is not None else corpus, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("__v").alias("qv"),
        F.col("__norm").alias("qn"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("nbr_id"))
        .where((F.col("qn") > 0) & (F.col("nn") > 0))
        .withColumn("cos", dot_col(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "nbr_id",
            F.round(F.col("cos"), 4).alias("cosine"),
        )
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) above threshold."""
    n = with_norm(corpus, vec_col).select(
        F.col(id_col), F.col("__v"), F.col("__norm")
    )
    a, b = n.alias("a"), n.alias("b")
    return (
        a.crossJoin(b)
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .where((F.col("a.__norm") > 0) & (F.col("b.__norm") > 0))
        .withColumn(
            "cosine",
            dot_col(F.col("a.__v"), F.col("b.__v"))
            / (F.col("a.__norm") * F.col("b.__norm")),
        )
        .where(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round("cosine", 4).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------


def _planes(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: each weight is a +/-1
    sign derived from md5(table:plane:dim). No RNG state → identical
    across executors, runs, and resume."""
    w = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d0 in range(0, dim, 16):
            h = hashlib.md5(f"{table}:{p}:{d0}".encode()).digest()
            for j in range(min(16, dim - d0)):
                w[p, d0 + j] = 1.0 if h[j] & 1 else -1.0
    return w


def make_bucket_udf(dim: int, n_planes: int = 12, table: int = 0):
    planes = _planes(dim, n_planes, table)

    @F.pandas_udf(StringType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (mat @ planes.T) >= 0  # (batch, n_planes)
        weights = 1 << np.arange(n_planes)
        codes = (signs * weights).sum(axis=1)
        return pd.Series([f"{table}:{c}" for c in codes])

    return bucket


def lsh_topk(
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets (n_tables probe
    tables), exact cosine re-rank within each bucket, best-k per query
    across tables. Recall grows with n_tables; cost stays ~bucket-local."""
    base = with_norm(corpus, vec_col).select(
        F.col(id_col), F.col("__v"), F.col("__norm")
    )
    bucketed = None
    for t in range(n_tables):
        udf = make_bucket_udf(dim, n_planes, t)
        part = base.withColumn("bucket", udf(F.col("__v")))
        bucketed = part if bucketed is None else bucketed.unionByName(part)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (
        a.join(b, "bucket")
        .where(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .where((F.col("a.__norm") > 0) & (F.col("b.__norm") > 0))
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias("nbr_id"),
            (
                dot_col(F.col("a.__v"), F.col("b.__v"))
                / (F.col("a.__norm") * F.col("b.__norm"))
            ).alias("cos"),
        )
        .groupBy("query_id", "nbr_id")
        .agg(F.max("cos").alias("cos"))  # dedup across tables
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", F.round("cos", 4).alias("cosine"))
    )
