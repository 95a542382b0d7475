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
