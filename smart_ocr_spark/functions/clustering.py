"""Distributed k-means over an embedding column (training-data op:
corpus clustering for dedup bucketing, stratified sampling, and as the
coarse quantizer ``ivf_topk`` plugs in).

Scale design: the classic Spark k-means loop — centroids live on the
driver (k x dim doubles, tiny), each iteration is ONE map-only pass to
assign (broadcast centroids, numpy matmul per Arrow batch) plus ONE
aggregation keyed by (cluster, idx) to update.  No N^2 anything; the
corpus is scanned ``iters + 1`` times from a persisted normed frame.

Determinism (the whole point — resumable + oracle-checkable):
  * seeds = the k rows with the smallest md5(vec_id) (no RNG);
  * centroid updates use the exact-sum convention (floor(x*1e9) into
    BIGINT, divide, round to 4) so every engine computes bit-identical
    centroids regardless of partitioning or summation order;
  * assignment ties break toward the lower cluster id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from smart_ocr_spark.functions.cache import pin
from pyspark.sql import DataFrame, functions as F

from smart_ocr_spark.functions.similarity import with_norm

EXACT_SUM_SCALE = 1e9


def _seed_centroids(base: DataFrame, id_col: str, k: int) -> np.ndarray:
    rows = (
        base.withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    if not rows:
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack([np.asarray(r["__v"], dtype=np.float64) for r in rows])


def _assign(base: DataFrame, cmat: np.ndarray, id_col: str) -> DataFrame:
    """Map-only cosine argmax against the broadcast centroid matrix.

    Zero-norm (empty-cluster) centroids are EXCLUDED from the candidate
    set, not compared at cos=0 — an empty cluster must never win an
    assignment (and the SQL oracle, which has no rows for an empty
    cluster, agrees by construction)."""
    sc = base.sparkSession.sparkContext
    cnorm = np.linalg.norm(cmat, axis=1)
    valid = np.flatnonzero(cnorm > 0)
    b = sc.broadcast((cmat[valid], cnorm[valid], valid))

    def run(batches):
        cm, cn, vidx = b.value
        # pre-normalized centroid matrix (see similarity.cosine_topk):
        # one BLAS matmul per batch, no (batch x k) divisor allocation
        cm_n_t = (cm / cn[:, None]).T
        for pdf in batches:
            ids, cls, coss, vs, nrms = [], [], [], [], []
            if len(pdf):
                # base is pre-filtered to __norm > 0 by the caller
                vmat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
                )
                nrm_arr = pdf["__norm"].to_numpy(dtype=np.float64)
                cos_all = (vmat / nrm_arr[:, None]) @ cm_n_t
                for row_i, (vid, nrm) in enumerate(zip(pdf[id_col], nrm_arr)):
                    cos = cos_all[row_i]
                    # argmax with ties toward the lower cluster id: argmax
                    # returns the FIRST maximal index, vidx is ascending
                    best = int(np.argmax(cos))
                    ids.append(int(vid))
                    cls.append(int(vidx[best]))
                    coss.append(float(cos[best]))
                    vs.append(list(vmat[row_i]))
                    nrms.append(float(nrm))
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="int64"),
                    "cluster": pd.array(cls, dtype="int32"),
                    "cos": pd.array(coss, dtype="float64"),
                    "__v": vs,
                    "__norm": nrms,
                }
            )

    return base.mapInPandas(
        run,
        f"{id_col} bigint, cluster int, cos double, "
        "__v array<double>, __norm double",
    )


def _update_centroids(assigned: DataFrame, k: int, dim: int) -> np.ndarray:
    """Exact-sum centroid update, distributed: the floor(x*1e9) BIGINT
    convention makes the mean independent of partitioning and engine."""
    rows = (
        assigned.select("cluster", F.posexplode("__v"))
        .groupBy("cluster", "pos")
        .agg(
            (
                F.round(
                    F.sum(
                        F.floor(F.col("col") * EXACT_SUM_SCALE).cast("bigint")
                    )
                    / EXACT_SUM_SCALE
                    / F.count(F.lit(1)),
                    4,
                )
                + F.lit(0.0)
            ).alias("cv")
        )
        .collect()
    )
    cmat = np.zeros((k, dim), dtype=np.float64)
    for r in rows:
        cmat[r["cluster"], r["pos"]] = r["cv"]
    return cmat


def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, cosine) after ``iters`` Lloyd rounds from
    deterministic md5-order seeds.  ``cosine`` is the similarity to the
    assigned centroid (rounded; +0.0 clears negative zero)."""
    if iters < 1:
        raise ValueError(f"kmeans_assign needs iters >= 1, got {iters}")
    base = (
        with_norm(corpus, vec_col)
        .select(F.col(id_col), "__v", "__norm")
        .where(F.col("__norm") > 0)
    )
    base = pin(base)
    cmat = _seed_centroids(base, id_col, k)
    if cmat.size == 0:
        raise ValueError(
            "kmeans_assign: corpus has no nonzero-norm vectors to seed from"
        )
    dim = cmat.shape[1]
    assigned = None
    for it in range(iters):
        assigned = _assign(base, cmat, id_col)
        if it < iters - 1:
            cmat = _update_centroids(assigned, k, dim)
    return assigned.select(
        id_col,
        "cluster",
        (F.round("cos", 4) + F.lit(0.0)).alias("cosine"),
    )
