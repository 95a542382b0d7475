"""Bloom-filter incremental dedup tier (Dolma-style).

The web-pipeline problem this solves: a new crawl dump lands and must
be deduped against EVERYTHING already accepted (10^12 keys of history).
Anti-joining every new dump against the full history re-shuffles the
history per dump — the cost that kills incremental ingestion at scale.
The standard fix (Soldaini et al. 2024, "Dolma", uses exactly this
shape for URL/paragraph dedup) is a Bloom filter over the history:

  * build once per epoch: one pass over the seen keys → a fixed-width
    bitmap per hash BUCKET (the state is ``n_buckets`` rows of
    ``m_bits/8`` bytes — bounded, storable, OR-mergeable);
  * probe per dump: rows whose bits are not all set are DEFINITELY new
    (no join at all — the common case for genuinely fresh content);
    rows whose bits are all set are merely *candidates* and take the
    exact anti-join — whose probe side has shrunk from |dump| to
    |true dups| + fpp x |dump|.

The final output is EXACT (identical to the plain anti-join — false
positives are caught by the confirm join), so the op is oracle-checkable
against plain ANSI anti-join SQL; the Bloom tier changes the plan
shape, never the result.

Scale design:
  * the state table is (bucket, bitmap, n_keys): n_buckets x m_bits/8
    bytes total — 256 x 1 MiB = 256 MiB covers ~10^9 keys/epoch at
    ~10 bits/key; epochs shard by time for bigger histories, and two
    epochs' states MERGE by OR-ing bitmaps (``merge_bloom_states``).
  * build is ``applyInPandas`` per bucket: map-side xxhash64 only, one
    shuffle keyed by the 8-byte bucket id, numpy bit-set inside the
    Arrow batch (no per-row Python).
  * probe is a COGROUP per bucket (probe rows meet their bucket's one
    bitmap row without replicating the bitmap per row), then the
    candidate-only anti-join.
  * k hash positions derive from TWO xxhash64 values via
    Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m) — no k-pass
    hashing of the key payload.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_log = logging.getLogger(__name__)

DEFAULT_BUCKETS = 64
DEFAULT_M_BITS = 1 << 20  # 128 KiB bitmap per bucket
DEFAULT_N_HASHES = 7  # ~optimal for ~10 bits/key


def _positions(h1: np.ndarray, h2: np.ndarray, n_hashes: int, m_bits: int):
    """Kirsch-Mitzenmacher: position_i = (h1 + i*h2) mod m, i=0..k-1.
    Returns an (n_rows, k) int64 array of bit positions."""
    i = np.arange(n_hashes, dtype=np.uint64)
    pos = (h1.astype(np.uint64)[:, None] + i[None, :] * h2.astype(np.uint64)[:, None])
    return (pos % np.uint64(m_bits)).astype(np.int64)


def _with_bucket_hashes(
    df: DataFrame, key_col: str, n_buckets: int
) -> DataFrame:
    k = F.col(key_col)
    return df.withColumn("__h1", F.xxhash64(k)).withColumn(
        "__h2",
        # seed variation via a salt concat — independent second hash
        F.xxhash64(F.concat(k.cast("string"), F.lit("#bloom2"))),
    ).withColumn("__bucket", F.pmod(F.col("__h1"), F.lit(n_buckets)).cast("int"))


def build_bloom_state(
    seen: DataFrame,
    key_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """One pass over the seen keys → (bucket, bitmap binary, n_keys).

    Every bucket row is emitted (empty buckets carry an all-zero
    bitmap) so the probe cogroup never misses state."""
    if m_bits % 8:
        raise ValueError(f"m_bits must be byte-aligned, got {m_bits}")
    keyed = _with_bucket_hashes(seen, key_col, n_buckets).select(
        "__bucket", "__h1", "__h2"
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        if len(pdf):
            pos = _positions(
                pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(),
                n_hashes, m_bits,
            ).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        bucket = int(pdf["__bucket"].iloc[0]) if len(pdf) else -1
        return pd.DataFrame(
            {"bucket": [bucket], "bitmap": [bits.tobytes()],
             "n_keys": [len(pdf)]}
        )

    built = keyed.groupBy("__bucket").applyInPandas(
        build, "bucket int, bitmap binary, n_keys long"
    )
    # union in empty buckets so the state always has n_buckets rows
    spark = seen.sparkSession
    all_buckets = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    zero = bytes(m_bits // 8)
    empties = (
        all_buckets.join(built.select("bucket"), "bucket", "left_anti")
        .select(
            "bucket",
            F.lit(zero).alias("bitmap"),
            F.lit(0).cast("long").alias("n_keys"),
        )
    )
    return built.where(F.col("bucket") >= 0).unionByName(empties)


def merge_bloom_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two same-shape states (same n_buckets/m_bits — the caller's
    contract): epochs compose without touching raw history."""

    def orr(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = [np.frombuffer(x, dtype=np.uint8) for x in pdf["bitmap"]]
        out = arrs[0].copy()
        for arr in arrs[1:]:
            out |= arr
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])],
             "bitmap": [out.tobytes()],
             "n_keys": [int(pdf["n_keys"].sum())]}
        )

    return (
        a.unionByName(b)
        .groupBy("bucket")
        .applyInPandas(orr, "bucket int, bitmap binary, n_keys long")
    )


def bloom_maybe_seen(
    new: DataFrame,
    state: DataFrame,
    key_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """``new`` plus a ``maybe_seen`` boolean: False is a Bloom
    GUARANTEE the key is unseen; True means "check exactly".  Cogrouped
    per bucket so each task reads its bucket's bitmap once."""
    cols = new.columns
    keyed = _with_bucket_hashes(new, key_col, n_buckets)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keyed.schema.fields
    ) + ", maybe_seen boolean"

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return left.assign(maybe_seen=pd.Series([], dtype=bool))
        if len(right):
            # a bucket may carry SEVERAL state rows (multi-epoch union
            # passed without merge_bloom_states) — bitmaps are
            # OR-mergeable by construction, so fold them all in rather
            # than silently probing only the first (which would flag
            # genuinely-seen keys definitely-new and leak duplicates
            # past the exact confirm)
            bits = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8)
            for extra in right["bitmap"].iloc[1:]:
                bits = bits | np.frombuffer(extra, dtype=np.uint8)
            pos = _positions(
                left["__h1"].to_numpy(), left["__h2"].to_numpy(),
                n_hashes, m_bits,
            )
            hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
            maybe = hit.all(axis=1)
        else:  # no state row for the bucket: definitely unseen
            maybe = np.zeros(len(left), dtype=bool)
        return left.assign(maybe_seen=maybe)

    probed = (
        keyed.groupBy("__bucket")
        .cogroup(state.groupBy(F.col("bucket").alias("__bucket")))
        .applyInPandas(probe, out_schema)
    )
    return probed.select(*cols, "maybe_seen")


def incremental_new_keys(
    new: DataFrame,
    seen: DataFrame,
    key_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    state: DataFrame | None = None,
) -> DataFrame:
    """Rows of ``new`` whose key does not appear in ``seen`` — EXACTLY
    the anti-join result, via the Bloom fast path: definite-new rows
    skip the join entirely; only Bloom candidates take the exact
    anti-join against the history.  Adds ``bloom_candidate`` (True =
    the row needed the exact check) so the fast-path rate is
    observable, never silent.  Pass a prebuilt ``state`` to amortize
    the build across dumps."""
    if state is None:
        state = build_bloom_state(seen, key_col, n_buckets, m_bits, n_hashes)
    flagged = bloom_maybe_seen(new, state, key_col, n_buckets, m_bits, n_hashes)
    definite_new = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    candidates = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = candidates.join(
        seen.select(F.col(key_col)).distinct(), key_col, "left_anti"
    )
    return definite_new.withColumn(
        "bloom_candidate", F.lit(False)
    ).unionByName(confirmed_new.withColumn("bloom_candidate", F.lit(True)))
