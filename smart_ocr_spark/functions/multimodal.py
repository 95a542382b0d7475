"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features behind `fake=True`, `NotImplementedError`
otherwise) — but the Spark-side plumbing is real and tested: schemas,
Arrow batch shape, mapInPandas signatures, partitioning. Swapping the
stub for PIL/ffmpeg changes one pure function, not the plan.

Scale notes: payloads never shuffle (all ops are map-only over the scan);
metadata extraction is magic-byte sniffing on the first bytes so column
pruning still pays (payload column read only by these operators);
frame-sample emits multiple rows per input via mapInPandas (UDTF-style
fan-out) keeping batch memory bounded by `rows_per_batch`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("media_type", StringType()),
        StructField("byte_size", LongType()),
        StructField("sha256", StringType()),
        StructField("format", StringType()),  # sniffed container format
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha256", StringType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized", BinaryType()),
        StructField("resized_sha256", StringType()),
    ]
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),  # wav/webp/avi share RIFF
    (b"ID3", "mp3"),
    (b"\x00\x00\x00", "mp4ish"),
]


def sniff_format(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            return name
    return "unknown"


def extract_media_meta(df: DataFrame) -> DataFrame:
    """payload binary -> typed metadata row. Map-only, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf["media_type"],
                    "byte_size": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "format": payloads.map(sniff_format),
                }
            )

    return df.mapInPandas(run, META_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real image/audio encoder: expand the
    sha256 digest into `dim` floats in [-1, 1]."""
    out = np.empty(dim, dtype=np.float32)
    h = payload or b""
    i = 0
    counter = 0
    while i < dim:
        d = hashlib.sha256(h + counter.to_bytes(4, "big")).digest()
        for b in d:
            if i >= dim:
                break
            out[i] = (b / 127.5) - 1.0
            i += 1
        counter += 1
    return out


def media_features(df: DataFrame, dim: int = 64, fake: bool = True) -> DataFrame:
    """Decode + feature-extract. Real decode is NOT available in this
    container (no PIL/ffmpeg): fake=True produces deterministic
    sha-derived vectors with the exact schema/batching the real encoder
    would use; fake=False raises to mark the integration point."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in this container"
                )
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "feature": pdf["payload"].map(
                        lambda b: _fake_feature(b, dim).tolist()
                    ),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def image_resize(
    df: DataFrame, width: int = 224, height: int = 224, fake: bool = True
) -> DataFrame:
    """Resize-to-model-input (the preprocessing step every vision
    training pipeline runs before the encoder).  Real decode+resample
    is NOT available here (no PIL); fake=True emits a deterministic
    width*height-byte pseudo-raster derived from the payload digest —
    the exact schema, batch shape, and payload-size profile (output
    rows carry W×H bytes, NOT the source size) the real kernel would
    produce, so partitioning/memory behavior downstream is faithfully
    exercised.  fake=False raises to mark the integration point."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_bytes = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL; not in this container"
                )
            out_payloads, hashes = [], []
            for payload in pdf["payload"]:
                seed = hashlib.sha256(payload or b"").digest()
                # deterministic pseudo-raster: digest-seeded byte tile
                reps = (n_bytes + len(seed) - 1) // len(seed)
                raster = (seed * reps)[:n_bytes]
                out_payloads.append(raster)
                hashes.append(hashlib.sha256(raster).hexdigest())
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "width": pd.array([width] * len(pdf), dtype="int32"),
                    "height": pd.array([height] * len(pdf), dtype="int32"),
                    "resized": out_payloads,
                    "resized_sha256": hashes,
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, fake: bool = True) -> DataFrame:
    """Video frame sampling (UDTF-style fan-out: one row per sampled
    frame). The fake samples fixed-stride byte windows standing in for
    decoded frames; the real version would stride-decode with ffmpeg."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame decode requires ffmpeg; not in this container"
                )
            urls, idxs, hashes = [], [], []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                payload = payload or b""
                n_frames = max(len(payload) // every_n_bytes, 1)
                for i in range(n_frames):
                    chunk = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    urls.append(url)
                    idxs.append(i)
                    hashes.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"url": urls, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_sha256": hashes}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image hashing (average hash) + near-dup pairs
# ---------------------------------------------------------------------------

AHASH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("ahash64", LongType()),
    ]
)


def decode_raw_gray(payload: bytes | None, grid: int = 8) -> np.ndarray:
    """REAL decoder for raw 8-bit grayscale bitmaps: the payload bytes
    ARE the pixels (zero-padded / truncated to ``grid²``).  Needs no
    codec, so unlike the png/jpeg seam this path is genuinely live in
    this container — sensor dumps, thumbnails-as-raw, and the synthetic
    corpora all ride it."""
    buf = np.frombuffer((payload or b"")[: grid * grid], dtype=np.uint8)
    if len(buf) < grid * grid:
        buf = np.pad(buf, (0, grid * grid - len(buf)))
    return buf.reshape(grid, grid)


def _fake_gray(payload: bytes | None, grid: int = 8) -> np.ndarray:
    """Deterministic stand-in for codec decode (png/jpeg → pixels):
    sha256-expanded bytes as the grayscale grid.  Exercises the exact
    schema/batch path the real decoder would; locality of the SOURCE
    bytes is not preserved (a hash can't), which is precisely why it is
    a stub and not a decoder."""
    n = grid * grid
    out = bytearray()
    counter = 0
    h = payload or b""
    while len(out) < n:
        out += hashlib.sha256(h + counter.to_bytes(4, "big")).digest()
        counter += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8).reshape(grid, grid)


def _ahash64(gray: np.ndarray) -> int:
    """Average hash of an 8×8 grayscale grid: bit i set iff pixel i ≥
    the grid mean.  The mean of 64 uint8s is exact in float64 (sum ≤
    64·255, /64 is a power-of-two division), so the threshold — and
    therefore every bit — is deterministic across platforms."""
    flat = gray.reshape(-1).astype(np.float64)
    bits = flat >= flat.mean()
    v = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return int(v.view(np.int64) if hasattr(v, "view") else v)


def image_ahash64(
    df: DataFrame,
    grid: int = 8,
    decoder="raw",
    url_col: str = "url",
    payload_col: str = "payload",
) -> DataFrame:
    """(url, ahash64) via mapInPandas — map-only, payloads never
    shuffle; only the hash rides downstream.  ``decoder``: ``"raw"``
    (real raw-grayscale path), ``"fake"`` (codec seam stand-in), or a
    callable ``bytes -> np.ndarray`` to plug a real PIL decode in."""
    if decoder == "raw":
        dec = lambda b: decode_raw_gray(b, grid)  # noqa: E731
    elif decoder == "fake":
        dec = lambda b: _fake_gray(b, grid)  # noqa: E731
    elif callable(decoder):
        dec = decoder
    else:
        raise ValueError(f"decoder must be 'raw', 'fake', or callable: {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "ahash64": pd.array(
                        [_ahash64(dec(b)) for b in pdf[payload_col]],
                        dtype="int64",
                    ),
                }
            )

    return df.select(url_col, payload_col).mapInPandas(run, AHASH_SCHEMA)


def image_ahash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    grid: int = 8,
    decoder="raw",
    url_col: str = "url",
    payload_col: str = "payload",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs by aHash Hamming distance — the
    image-grain member of the near-dup family, sharing the SimHash
    pigeonhole chunk-blocking core (4×16-bit chunk join + bit_count
    verify + capped fan-in) instead of an N² self-join."""
    from smart_ocr_spark.functions.cache import pin
    from smart_ocr_spark.functions.dedup import hash64_near_pairs
    from smart_ocr_spark.functions.similarity import BUCKET_FANIN_CAP

    if bucket_cap is None:
        bucket_cap = BUCKET_FANIN_CAP
    hashed = pin(
        image_ahash64(df, grid, decoder, url_col, payload_col)
    )
    return hash64_near_pairs(
        hashed, "ahash64", "url", max_hamming, bucket_cap,
        "image_ahash_near_pairs",
    )


FRAME_AHASH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ahash64", LongType()),
    ]
)


def frame_ahash64(
    df: DataFrame,
    frame_bytes: int = 64,
    grid: int = 8,
    url_col: str = "url",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-frame average hash over a raw grayscale tape: the payload is
    cut into fixed-stride ``frame_bytes`` windows (one frame each —
    REAL for raw-gray video/sensor tapes, no codec needed; a real
    ffmpeg decode plugs in at the same seam as
    :func:`image_ahash64`'s ``decoder``), each hashed with the same
    mean-threshold kernel.  Map-only; payload bytes never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, hashes = [], [], []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                payload = bytes(payload or b"")
                n_frames = max(len(payload) // frame_bytes, 1)
                for i in range(n_frames):
                    chunk = payload[i * frame_bytes : (i + 1) * frame_bytes]
                    urls.append(url)
                    idxs.append(i)
                    hashes.append(_ahash64(decode_raw_gray(chunk, grid)))
            yield pd.DataFrame(
                {
                    "url": urls,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "ahash64": pd.array(hashes, dtype="int64"),
                }
            )

    return df.select(url_col, payload_col).mapInPandas(
        run, FRAME_AHASH_SCHEMA
    )


def frame_ahash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    frame_bytes: int = 64,
    grid: int = 8,
    url_col: str = "url",
    payload_col: str = "payload",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate FRAME pairs across the whole corpus (the shot /
    still-frame dedup a video training pipeline runs): frame identity
    is ``url#idx``; pairs via the shared SimHash pigeonhole
    chunk-blocking core.  Intra-tape AND cross-tape near-dups both
    surface; a consumer keeping one frame per near-dup class follows
    with :func:`smart_ocr_spark.functions.components.canonical_docs`
    on the string keys."""
    from pyspark.sql import functions as F

    from smart_ocr_spark.functions.cache import pin
    from smart_ocr_spark.functions.dedup import hash64_near_pairs
    from smart_ocr_spark.functions.similarity import BUCKET_FANIN_CAP

    if bucket_cap is None:
        bucket_cap = BUCKET_FANIN_CAP
    hashed = pin(
        frame_ahash64(df, frame_bytes, grid, url_col, payload_col).select(
            F.concat_ws("#", "url", F.col("frame_idx").cast("string")).alias(
                "frame_id"
            ),
            "ahash64",
        )
    )
    return hash64_near_pairs(
        hashed, "ahash64", "frame_id", max_hamming, bucket_cap,
        "frame_ahash_near_pairs",
    )
