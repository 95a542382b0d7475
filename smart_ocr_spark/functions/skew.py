"""Explicit skew handling for hot keys (north-rule requirement; O4).

Zipf-distributed corpora put a large fraction of documents on a few
hosts. Anything that shuffles keyed by host (host-level rollups,
per-host dedup, grouped repair batching) then funnels those rows into
single reducers. AQE's skew-join splitting only helps sort-merge joins;
aggregations and window functions need the classic fix: salt the hot
keys, aggregate partially per salt, then merge.

``with_salted_key`` detects hot keys with one cheap count pass
(broadcast of the small hot-key list) and gives ONLY those keys a salt
in [0, n_salts); cold keys keep salt 0 so their single-group cost is
unchanged. ``two_stage_agg`` demonstrates the merge pattern for counts
and sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOST_RE = r"^[a-z]+://([^/]+)/.*$"


def host_of(url_col) -> F.Column:
    return F.regexp_extract(url_col, HOST_RE, 1)


def hot_keys(df: DataFrame, key_col: str, hot_threshold: int) -> DataFrame:
    """Keys whose row count exceeds the threshold (small result)."""
    return (
        df.groupBy(key_col)
        .count()
        .where(F.col("count") > hot_threshold)
        .select(key_col)
    )


def with_salted_key(
    df: DataFrame,
    key_col: str,
    n_salts: int = 16,
    hot_threshold: int = 10_000,
    hot: DataFrame | None = None,
    row_key: str | None = None,
) -> DataFrame:
    """Adds ``salt`` (0 for cold keys, hash-spread 0..n_salts-1 for hot
    ones) and ``salted_key`` = key || '#' || salt. Deterministic: the
    salt is a hash of a stable row attribute, not a random number, so
    re-runs and resumes place every row in the same salt group.

    ``row_key`` names a per-row-unique column (url, doc_id) to salt by;
    pass it whenever one exists.  The all-columns fallback hashes the
    row CONTENT, so byte-identical duplicate rows of a hot key — the
    common case in a dedup corpus (one document mirrored many times on
    one host) — all land in a single salt group and the skew is not
    spread.  That limitation is inherent to content hashing: fully
    duplicate rows carry no deterministic discriminator."""
    hot = hot if hot is not None else hot_keys(df, key_col, hot_threshold)
    hot_flagged = F.broadcast(
        hot.select(F.col(key_col).alias("__hot_key"), F.lit(True).alias("__hot"))
    )
    out = df.join(
        hot_flagged, df[key_col] == F.col("__hot_key"), "left"
    ).drop("__hot_key")
    salt_cols = [F.col(row_key)] if row_key else [F.col(c) for c in df.columns]
    salt = F.when(
        F.col("__hot").isNotNull(),
        F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)),
    ).otherwise(F.lit(0))
    return (
        out.withColumn("salt", salt.cast("int"))
        .withColumn(
            "salted_key",
            F.concat_ws("#", F.col(key_col), F.col("salt").cast("string")),
        )
        .drop("__hot")
    )


def two_stage_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 16,
    hot_threshold: int = 10_000,
    row_key: str | None = None,
) -> DataFrame:
    """Skew-safe count+sum per key: partial agg on (key, salt), then
    merge per key. The first shuffle spreads hot keys over n_salts
    reducers; the second handles only |keys| x n_salts rows."""
    salted = with_salted_key(df, key_col, n_salts, hot_threshold, row_key=row_key)
    partial = salted.groupBy(key_col, "salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_s")
    )
    return partial.groupBy(key_col).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias(f"sum_{value_col}")
    )
