"""WARC ingestion source: byte-faithful record parsing (Content-Length
delimited, multi-member gzip, HTTP envelope strip), honest drops, and
the flagship hop — a WARC shard fed straight into the extraction
pipeline produces byte-identical text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.sources import warc


def _records():
    return [
        ("http://a.example/page1", "2026-01-01T10:00:00Z", b"<p>alpha</p>"),
        # payload containing the record separator AND a fake version
        # line: Content-Length framing must not be fooled
        ("http://b.example/page2", "2026-01-02T11:30:00Z",
         b"<p>tricky\r\n\r\nWARC/1.0\r\nbody</p>"),
        ("http://c.example/page3", "2026-01-03T12:00:00Z",
         "<p>unicode é中</p>".encode("utf-8")),
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip(spark, tmp_path, compress):
    ext = "warc.gz" if compress else "warc"
    path = str(tmp_path / f"shard-00000.{ext}")
    warc.write_warc_file(path, _records(), compress=compress)
    out = warc.warc_to_corpus(spark, path).orderBy("url").collect()
    assert [r["url"] for r in out] == [u for u, _, _ in _records()]
    assert [bytes(r["html"]) for r in out] == [p for _, _, p in _records()]
    assert str(out[0]["warc_ts"]) == "2026-01-01 10:00:00"
    assert all(r["lang"] is None for r in out)


def test_warc_skips_non_response_records(spark, tmp_path):
    path = str(tmp_path / "mixed.warc")
    with open(path, "wb") as f:
        f.write(warc.warc_record_bytes(
            "meta:info", "2026-01-01T00:00:00Z", b"crawler=test",
            warc_type="warcinfo", http_envelope=False))
        f.write(warc.warc_record_bytes(
            "http://x.example/", "2026-01-01T00:00:01Z",
            b"GET / HTTP/1.1", warc_type="request", http_envelope=False))
        f.write(warc.warc_record_bytes(
            "http://x.example/", "2026-01-01T00:00:02Z", b"<p>real</p>"))
    out = warc.warc_to_corpus(spark, path).collect()
    assert len(out) == 1
    assert bytes(out[0]["html"]) == b"<p>real</p>"


def test_warc_oversized_drop_is_logged(spark, tmp_path):
    path = str(tmp_path / "big.warc")
    warc.write_warc_file(path, [
        ("http://small.example/", "2026-01-01T00:00:00Z", b"<p>ok</p>"),
        ("http://big.example/", "2026-01-01T00:00:01Z", b"x" * 10_000),
    ])
    out = warc.warc_to_corpus(
        spark, path, max_payload_bytes=1_000
    ).collect()
    # exactly the oversized record dropped, nothing else
    assert [r["url"] for r in out] == ["http://small.example/"]
    # the warning fires inside the Python worker (not driver-visible to
    # caplog); the record-count contract above is the observable pin,
    # and the kernel view confirms the drop is size-driven, not a
    # parse failure
    blocks = [
        warc.strip_http_envelope(b)
        for _, b in warc.iter_warc_records(open(path, "rb").read())
    ]
    assert len(blocks) == 2 and sum(len(b) > 1_000 for b in blocks) == 1


def test_warc_malformed_raises():
    with pytest.raises(ValueError, match="version line"):
        list(warc.iter_warc_records(b"NOT-A-WARC\r\n\r\nbody"))
    bad_len = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: 999\r\n\r\nshort")
    with pytest.raises(ValueError, match="past EOF"):
        list(warc.iter_warc_records(bad_len))


def test_warc_stream_matches_bytes_parser(tmp_path):
    """iter_warc_stream over an open file == iter_warc_records over the
    slurped bytes, record for record (incl. the separator-in-payload
    trap)."""
    path = str(tmp_path / "parity.warc")
    warc.write_warc_file(path, _records())
    with open(path, "rb") as f:
        streamed = [(h, b) for h, b in warc.iter_warc_stream(f)]
    slurped = list(warc.iter_warc_records(open(path, "rb").read()))
    assert streamed == slurped


def test_warc_stream_parses_gz_members_incrementally(tmp_path):
    """The gz path goes through the SAME streaming reader (GzipFile
    over the raw stream — concatenated CC members, no full inflate)."""
    path = str(tmp_path / "parity.warc.gz")
    warc.write_warc_file(path, _records(), compress=True)
    with open(path, "rb") as f:
        out = list(warc.iter_warc_stream(warc._wrap_gunzip(f, path)))
    assert [h["warc-target-uri"] for h, _ in out] == [
        u for u, _, _ in _records()
    ]


def test_warc_parse_shard_batches_are_bounded(tmp_path):
    """A shard with many records yields ceil(n/batch_records) pandas
    batches — the memory contract: no shard-sized Arrow batch ever."""
    recs = [
        (f"http://x.example/{i}", "2026-01-01T00:00:00Z",
         f"<p>doc {i}</p>".encode())
        for i in range(7)
    ]
    path = str(tmp_path / "many.warc")
    warc.write_warc_file(path, recs)
    with open(path, "rb") as f:
        batches = list(warc._parse_shard(
            f, path, ("response",), None, batch_records=3))
    assert [len(b) for b in batches] == [3, 3, 1]
    assert [u for b in batches for u in b["url"]] == [u for u, _, _ in recs]


def test_warc_to_corpus_small_batches_identical(spark, tmp_path):
    """batch_records doesn't change results, only batch shape."""
    path = str(tmp_path / "sb.warc")
    warc.write_warc_file(path, _records())
    out = warc.warc_to_corpus(spark, path, batch_records=1).orderBy(
        "url").collect()
    assert [bytes(r["html"]) for r in out] == [p for _, _, p in _records()]


def test_warc_header_bomb_raises(tmp_path):
    """A 'header' that never terminates must error (bounded scan), not
    buffer the whole stream."""
    import io as _io

    bomb = b"WARC/1.0\r\nWARC-Type: response\r\n" + b"x" * (2 << 20)
    with pytest.raises(ValueError, match="unterminated WARC header"):
        list(warc.iter_warc_stream(_io.BytesIO(bomb)))


def test_warc_feeds_extraction_byte_identically(spark, tmp_path):
    """The flagship hop: synthetic corpus docs written as a CC-style
    gzipped WARC shard, ingested via warc_to_corpus, run through the
    full extraction pipeline — final_text matches the corpus golden
    byte-for-byte, same as the direct-parquet path."""
    from smart_ocr_spark.plans.extract_pipeline import run_extraction
    from smart_ocr_spark.sources.corpus import corpus_df

    docs = corpus_df(spark, 24, seed=7)
    rows = docs.select("url", "warc_ts", "html", "text").collect()
    shard = str(tmp_path / "corpus-00000.warc.gz")
    warc.write_warc_file(
        shard,
        [(r["url"], r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
          bytes(r["html"])) for r in rows],
        compress=True,
    )
    ingested = warc.warc_to_corpus(spark, shard)
    assert ingested.count() == 24
    out = run_extraction(spark, ingested)
    golden = docs.select("url", F.col("text").alias("golden"))
    joined = out.join(golden, "url")
    assert joined.count() == 24
    assert joined.filter(F.col("final_text") != F.col("golden")).count() == 0


def test_corpus_to_warc_roundtrip(spark, tmp_path):
    """Distributed WET-style writer: corpus -> conversion-record shards
    -> warc_to_corpus gives back exactly the corpus (url, ts, text),
    NULL text included; the manifest accounts for every record."""
    import datetime as dt

    rows = [
        (f"http://w{i}.example/p", dt.datetime(2026, 2, 1, 0, 0, i),
         f"body {i} é中" if i % 3 else ("" if i % 2 else None))
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    out = str(tmp_path / "wet")
    manifest = warc.corpus_to_warc(df, out, n_shards=3).collect()
    assert sum(m["n_records"] for m in manifest) == 20
    assert all(m["n_bytes"] > 0 for m in manifest)

    back = warc.warc_to_corpus(
        spark, out + "/*.warc.gz", record_types=("conversion",)
    )
    got = {
        r["url"]: (str(r["warc_ts"]), bytes(r["html"]).decode("utf-8"))
        for r in back.collect()
    }
    assert len(got) == 20
    for url, ts, text in rows:
        assert got[url] == (str(ts), text or "")


def test_corpus_to_warc_deterministic_bytes(spark, tmp_path):
    """Same data -> byte-identical shards, independent of input
    partitioning (range-partition + sort by url; gzip mtime pinned)."""
    rows = [
        (f"http://d{i}.example/", f"2026-02-01T00:00:{i:02d}Z", f"t{i}")
        for i in range(30)
    ]
    df1 = spark.createDataFrame(
        [(u, t) for u, ts, t in rows], "url string, text string"
    ).withColumn("warc_ts", __import__("pyspark").sql.functions.to_timestamp(
        __import__("pyspark").sql.functions.lit("2026-02-01 00:00:00")))
    df2 = df1.repartition(7)  # different input layout, same data

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    warc.corpus_to_warc(df1, a, n_shards=2).collect()
    warc.corpus_to_warc(df2, b, n_shards=2).collect()

    import os

    def cat(d):
        return b"".join(
            open(os.path.join(d, f), "rb").read() for f in sorted(os.listdir(d))
        )

    blob_a, blob_b = cat(a), cat(b)
    assert blob_a and blob_a == blob_b
    assert not any(".inprogress." in f for f in os.listdir(a))
