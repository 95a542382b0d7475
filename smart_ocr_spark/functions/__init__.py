"""Training-data pipeline functions: dedup, similarity, text analysis,
multimodal plumbing.

These are the large-scale corpus operations a 100 TB training-data
pipeline needs on top of the extraction engine (SURVEY.md §2 covers the
reference's operators; this package covers the scale-path additions the
graft brief mandates). Everything is DataFrame-first: JVM column algebra
wherever expressible, Arrow-batched pandas UDFs only for the kernels that
genuinely need Python (64-bit simhash, winnowing, LSH plane projection).
"""

from smart_ocr_spark.functions import (
    curation,
    dedup,
    multimodal,
    repetition,
    similarity,
    text_analysis,
    urls,
)

__all__ = [
    "curation", "dedup", "multimodal", "repetition", "similarity",
    "text_analysis", "urls",
]
