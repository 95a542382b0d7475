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
``binaryFile`` rows and fully STREAMING: for local/mounted paths only
the file path rides the Spark row (binaryFile column pruning — the
shard bytes never enter the JVM) and the task reads the file through
a bounded buffered reader; records are emitted in ``batch_records``-
sized Arrow batches, so peak task memory is one record + one batch
regardless of shard size (a 1 GiB gz shard does NOT inflate to 4 GiB
in memory).  Oversized payloads are dropped-with-count via
``max_payload_bytes`` (no-silent-caps: the per-shard drop count is
logged) — the downstream size-bucketed repartition in the extraction
plan handles legitimate big blobs.

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
# Record-level parse (streaming; shared by batch + tests)
# ---------------------------------------------------------------------------

_READ_CHUNK = 1 << 20  # 1 MiB fill granularity
_MAX_HEADER_BYTES = 1 << 20  # a WARC header block beyond 1 MiB is garbage


class _StreamReader:
    """Minimal buffered reader over a binary file-like with absolute
    offset tracking (for error messages).  Peak buffer residency is
    one header block or one fill chunk — never the shard."""

    def __init__(self, fobj) -> None:
        self._f = fobj
        self._buf = bytearray()
        self._eof = False
        self.pos = 0  # absolute offset of _buf[0] in the stream

    def _fill(self) -> bool:
        if self._eof:
            return False
        chunk = self._f.read(_READ_CHUNK)
        if not chunk:
            self._eof = True
            return False
        self._buf += chunk
        return True

    def skip_crlf_padding(self) -> None:
        while True:
            while len(self._buf) < 2 and self._fill():
                pass
            if self._buf[:2] == b"\r\n":
                del self._buf[:2]
                self.pos += 2
            else:
                return

    def at_eof(self) -> bool:
        if self._buf:
            return False
        return not self._fill()

    def read_until_blank(self) -> bytes:
        """Consume up to and incl. the first CRLFCRLF; return the bytes
        BEFORE it.  Raises on EOF or an over-long header block."""
        start_pos = self.pos
        scan_from = 0
        while True:
            idx = self._buf.find(b"\r\n\r\n", max(scan_from - 3, 0))
            if idx >= 0:
                out = bytes(self._buf[:idx])
                del self._buf[:idx + 4]
                self.pos += idx + 4
                return out
            if len(self._buf) > _MAX_HEADER_BYTES:
                raise ValueError(
                    f"unterminated WARC header at offset {start_pos}"
                )
            scan_from = len(self._buf)
            if not self._fill():
                raise ValueError(
                    f"unterminated WARC header at offset {start_pos}"
                )

    def read_exact(self, n: int, record_pos: int) -> bytes:
        while len(self._buf) < n:
            if not self._fill():
                raise ValueError(
                    f"record at offset {record_pos} claims "
                    f"{n} bytes past EOF"
                )
        out = bytes(self._buf[:n])
        del self._buf[:n]
        self.pos += n
        return out


def iter_warc_stream(fobj) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, block) per record from a binary file-like.
    Content-Length-driven — malformed trailing garbage raises rather
    than silently truncating.  Memory: ONE record at a time (the 100 TB
    shape — a 1 GiB shard never resides in task memory; Common Crawl
    truncates individual records at ~1 MiB, which is the actual bound)."""
    rdr = _StreamReader(fobj)
    while True:
        rdr.skip_crlf_padding()
        if rdr.at_eof():
            return
        record_pos = rdr.pos
        header_block = rdr.read_until_blank()
        header_lines = header_block.decode("utf-8", "replace").split("\r\n")
        if not header_lines[0].startswith("WARC/"):
            raise ValueError(
                f"expected WARC version line at offset {record_pos}, "
                f"got {header_lines[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for line in header_lines[1:]:
            key, _, val = line.partition(":")
            headers[key.strip().lower()] = val.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(
                f"bad Content-Length at offset {record_pos}"
            ) from exc
        yield headers, rdr.read_exact(length, record_pos)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Bytes-level convenience wrapper over :func:`iter_warc_stream`
    (tests / small fixtures)."""
    yield from iter_warc_stream(io.BytesIO(data))


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


def _wrap_gunzip(fobj, path: str):
    """Streaming multi-member gunzip (CC gzips each record as its own
    member; GzipFile reads concatenated members and streams — it never
    inflates the whole shard at once).  Non-gz streams pass through."""
    if path.endswith(".gz"):
        return gzip.GzipFile(fileobj=fobj)
    head = fobj.peek(2)[:2] if hasattr(fobj, "peek") else fobj.read(2)
    if not hasattr(fobj, "peek"):
        fobj.seek(0)
    return gzip.GzipFile(fileobj=fobj) if head == b"\x1f\x8b" else fobj


def _local_path(uri: str) -> str:
    """binaryFile emits ``file:`` URIs; map back to an OS path."""
    from urllib.parse import unquote, urlparse

    if "://" not in uri and not uri.startswith("file:"):
        return uri
    parsed = urlparse(uri)
    return unquote(parsed.path)


def _parse_shard(
    fobj,
    shard_name: str,
    wanted: tuple[str, ...],
    max_payload_bytes: int | None,
    batch_records: int,
) -> Iterator[pd.DataFrame]:
    """One shard (already-open binary stream) → bounded pandas batches.
    Peak memory: ``batch_records`` payloads + one in-flight record,
    INDEPENDENT of shard size."""
    urls: list = []
    tss: list = []
    htmls: list = []
    n_oversized = 0

    def flush() -> pd.DataFrame:
        nonlocal urls, tss, htmls
        out = pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "warc_ts": pd.Series(tss, dtype="datetime64[ns]"),
                "html": pd.Series(htmls, dtype="object"),
                "lang": pd.Series([None] * len(urls), dtype="object"),
            }
        )
        urls, tss, htmls = [], [], []
        return out

    for headers, block in iter_warc_stream(_wrap_gunzip(fobj, shard_name)):
        if headers.get("warc-type", "").lower() not in wanted:
            continue
        payload = strip_http_envelope(block)
        if max_payload_bytes is not None and len(payload) > max_payload_bytes:
            n_oversized += 1
            continue
        urls.append(headers.get("warc-target-uri", ""))
        tss.append(_parse_warc_date(headers.get("warc-date", "")))
        htmls.append(payload)
        if len(urls) >= batch_records:
            yield flush()
    if n_oversized:
        _log.warning(
            "warc_to_corpus: dropped %d record(s) over "
            "max_payload_bytes=%d in %s",
            n_oversized, max_payload_bytes, shard_name,
        )
    yield flush()


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------


def warc_to_corpus(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = DEFAULT_RECORD_TYPES,
    max_payload_bytes: int | None = None,
    batch_records: int = 1024,
) -> DataFrame:
    """Read WARC shard files under ``path`` (glob ok; ``.warc`` and
    ``.warc.gz``) into the pipeline input schema
    (url, warc_ts, html, lang) — one parse task per shard.

    Scale shape: for local/posix paths (incl. cluster-mounted storage)
    only the file PATH rides the Spark row — binaryFile's column
    pruning means the shard bytes never enter the JVM; the Python task
    opens the file and streams it, so a 1 GiB gz shard costs one
    record + one emitted batch of memory, not 4 GiB of inflated bytes.
    For object-store URIs (s3://, hdfs://...) Python can't open the
    path directly, so the shard's compressed bytes ride the row
    (binaryFile's grain — bounded by the shard size CC itself picks)
    and the SAME streaming parser consumes them from a BytesIO; batches
    stay bounded either way."""
    wanted = tuple(t.lower() for t in record_types)
    stream_local = "://" not in path or path.startswith("file:")
    files = spark.read.format("binaryFile").load(path)
    files = files.select("path") if stream_local else files.select(
        "path", "content"
    )

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(len(pdf)):
                shard = str(pdf["path"].iloc[i])
                if stream_local:
                    with open(_local_path(shard), "rb") as f:
                        yield from _parse_shard(
                            f, shard, wanted, max_payload_bytes,
                            batch_records,
                        )
                else:
                    yield from _parse_shard(
                        io.BytesIO(bytes(pdf["content"].iloc[i])), shard,
                        wanted, max_payload_bytes, batch_records,
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


# ---------------------------------------------------------------------------
# Distributed writer (WET-style output shards)
# ---------------------------------------------------------------------------

_MANIFEST_SCHEMA = "shard string, n_records long, n_bytes long"


def corpus_to_warc(
    df: DataFrame,
    out_dir: str,
    text_col: str = "text",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    n_shards: int | None = None,
    compress: bool = True,
    warc_type: str = "conversion",
) -> DataFrame:
    """Write the corpus back OUT as WARC shards — the WET-shaped hop a
    Common-Crawl-style pipeline takes after extraction (CC's own WET
    files are ``conversion`` records holding the extracted text; ISO
    28500 §6.8).  The output of :func:`warc_to_corpus` ∘ this is the
    input corpus, and the round-trip is oracle-pinned.

    Scale shape: one shard file per task, written with
    ``mapInPandas`` — the record bytes never ride a Spark row or a
    shuffle; each task streams its partition straight to its own
    ``part-{pid:05d}.warc[.gz]``.  Rows are range-partitioned and
    sorted by ``url_col`` first, so the CONCATENATED byte stream
    across shards is deterministic end-to-end (gzip mtime pinned to 0,
    one member per record like CC so ranges stay seekable).  Note
    ``repartitionByRange`` derives its bounds by SAMPLING the input
    partitioning, so which shard a given record lands in can shift
    under a different upstream layout — per-shard file contents are
    NOT layout-independent, only the global order is (ADVICE r6; use
    explicit hash-assigned shards if per-shard stability matters).
    Task retries are safe: shards are written to a
    ``.inprogress.<uuid>`` name and atomically renamed into place, so
    a re-executed (or speculative) task replaces, never interleaves.

    Returns the shard MANIFEST as a DataFrame (shard, n_records,
    n_bytes) — metadata rows only; collect it for lineage or join it
    into a checkpoint table.  NULL text writes as "" (a zero-length
    conversion record keeps the url present in the archive, matching
    the NULL-text handling of the curation ops)."""
    import os
    import uuid

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    parts = df.select(
        F.col(url_col).alias("url"),
        F.date_format(ts_col, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.coalesce(F.col(text_col), F.lit("")).alias("payload"),
    )
    if n_shards is not None:
        parts = parts.repartitionByRange(n_shards, "url")
    else:
        parts = parts.repartitionByRange("url")
    parts = parts.sortWithinPartitions("url")
    ext = "warc.gz" if compress else "warc"

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}.{ext}")
        tmp = f"{final}.inprogress.{uuid.uuid4().hex}"
        n = 0
        with open(tmp, "wb") as f:
            for pdf in batches:
                for url, ts, payload in zip(
                    pdf["url"], pdf["ts"], pdf["payload"]
                ):
                    rec = warc_record_bytes(
                        str(url),
                        str(ts),
                        str(payload).encode("utf-8"),
                        warc_type=warc_type,
                        http_envelope=False,
                    )
                    f.write(gzip.compress(rec, mtime=0) if compress else rec)
                    n += 1
        if n == 0:
            # empty range partitions write no shard at all
            os.unlink(tmp)
            return
        os.replace(tmp, final)  # atomic: retries replace, never mix
        yield pd.DataFrame(
            {
                "shard": [final],
                "n_records": [n],
                "n_bytes": [os.path.getsize(final)],
            }
        )

    return parts.mapInPandas(write, _MANIFEST_SCHEMA)
