"""Chunk-boundary arithmetic for long documents.

Re-implements the reference's ``PDFChunker`` boundary math
(``src/socr/core/chunker.py:57-108``): 1-indexed inclusive [start, end]
ranges of at most ``max_pages_per_chunk`` pages.  In Spark this drives the
size-bucketed fan-out of oversized payloads (SURVEY.md §2.10 W1): one row
per chunk via ``F.sequence`` + ``explode``, or this kernel inside the
extraction batch for in-UDF page-range splitting.
"""

from __future__ import annotations

DEFAULT_CHUNK_SIZE = 20     # reference config.py:110 chunk_size
DEFAULT_CHUNK_THRESHOLD = 30  # reference config.py:109 chunk_threshold


def needs_chunking(total_pages: int, threshold: int | None = None,
                   max_pages_per_chunk: int = DEFAULT_CHUNK_SIZE) -> bool:
    """True when the document exceeds ``threshold`` pages
    (reference chunker.py:37-55; threshold defaults to the chunk size)."""
    if threshold is None:
        threshold = max_pages_per_chunk
    return total_pages > threshold


def chunk_ranges(total_pages: int,
                 max_pages_per_chunk: int = DEFAULT_CHUNK_SIZE) -> list[tuple[int, int, int]]:
    """(chunk_num, start_page, end_page) 1-indexed inclusive
    (reference chunker.py:76-101)."""
    if max_pages_per_chunk < 1:
        raise ValueError("max_pages_per_chunk must be >= 1")
    if total_pages <= 0:
        return []
    out = []
    chunk_num = 0
    for start0 in range(0, total_pages, max_pages_per_chunk):
        chunk_num += 1
        end0 = min(start0 + max_pages_per_chunk - 1, total_pages - 1)
        out.append((chunk_num, start0 + 1, end0 + 1))
    return out


def byte_buckets(size: int, bucket_bytes: int = 1 << 20) -> int:
    """Size bucket for repartitionByRange on payload length (O4 analog):
    bucket index of a blob of ``size`` bytes."""
    return size // bucket_bytes
