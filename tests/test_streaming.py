"""Streaming ingestion: new corpus files are discovered incrementally,
each micro-batch runs the bounded extraction, the sink is idempotent
per batch id, and restarts never reprocess consumed files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.plans import streaming
from smart_ocr_spark.sources.corpus import corpus_df

N1, N2 = 40, 24


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    inp = str(tmp_path_factory.mktemp("stream_in"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    return inp, out


def _batch_df(spark, n: int, seed: int, tag: str):
    # namespace urls per dump: different seeds can emit the same doc
    # index -> same url, which would look like a cross-batch dup
    return corpus_df(spark, n, seed=seed).withColumn(
        "url", F.concat(F.lit(tag + "/"), F.col("url"))
    )


def _drop_batch(spark, inp: str, n: int, seed: int, tag: str):
    _batch_df(spark, n, seed, tag).write.mode("overwrite").parquet(
        os.path.join(inp, tag)
    )


def test_incremental_stream_extraction(spark, dirs):
    inp, out = dirs

    # batch 1 lands and drains
    _drop_batch(spark, inp, N1, seed=31, tag="dump1")
    q = streaming.stream_extraction(spark, inp + "/*", out)
    q.awaitTermination(300)
    res1 = streaming.read_stream_results(spark, out)
    assert res1.count() == N1
    batches1 = {r.stream_batch for r in res1.select("stream_batch").distinct().collect()}

    # batch 2 lands; a NEW invocation processes only the new files
    _drop_batch(spark, inp, N2, seed=32, tag="dump2")
    q2 = streaming.stream_extraction(spark, inp + "/*", out)
    q2.awaitTermination(300)
    res2 = streaming.read_stream_results(spark, out)
    assert res2.count() == N1 + N2
    assert res2.select("url").distinct().count() == N1 + N2  # no reprocessing dups
    batches2 = {r.stream_batch for r in res2.select("stream_batch").distinct().collect()}
    assert batches1 < batches2  # old batch partitions untouched, new ones added

    # byte-identity holds through the streaming path for both batches
    golden = (
        _batch_df(spark, N1, 31, "dump1")
        .select("url", F.col("text").alias("golden"))
        .unionByName(
            _batch_df(spark, N2, 32, "dump2").select(
                "url", F.col("text").alias("golden")
            )
        )
    )
    joined = res2.join(golden, "url")
    assert joined.count() == N1 + N2
    assert joined.filter(F.col("final_text") != F.col("golden")).count() == 0

    # drained re-run with nothing new: a no-op, counts unchanged
    q3 = streaming.stream_extraction(spark, inp + "/*", out)
    q3.awaitTermination(300)
    assert streaming.read_stream_results(spark, out).count() == N1 + N2


def _event_rows(spark, rows):
    """rows = [(url, ts_string, html_bytes, lang)]"""
    df = spark.createDataFrame(
        rows, ["url", "ts", "html", "lang"]
    ).select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"), "html", "lang"
    )
    return df


def test_watermarked_ingestion_stats(spark, tmp_path_factory):
    """Event-time windowed rollup with a watermark (§2.11): windows emit
    exactly once after the watermark passes, and a row later than the
    watermark is DROPPED — never double-counted."""
    inp = str(tmp_path_factory.mktemp("wm_in"))
    out = str(tmp_path_factory.mktemp("wm_out"))

    # dump 1: three docs in the 10:00 window, one 12:00 doc that pushes
    # the watermark (12:00 - 30min = 11:30) past the 10:00 window's end
    _event_rows(spark, [
        ("u1", "2026-01-01 10:01:00", b"<p>a</p>", "en"),
        ("u2", "2026-01-01 10:04:00", b"<p>bb</p>", "en"),
        ("u3", "2026-01-01 10:07:00", b"<p>c</p>", "de"),
        ("u4", "2026-01-01 12:00:00", b"<p>d</p>", "en"),
    ]).write.mode("overwrite").parquet(os.path.join(inp, "dump1"))
    q = streaming.stream_ingestion_stats(spark, inp + "/*", out)
    q.awaitTermination(300)

    stats = streaming.read_ingestion_stats(spark, out)
    rows = {
        (str(r["window_start"]), r["lang"]): r for r in stats.collect()
    }
    assert rows[("2026-01-01 10:00:00", "en")]["n_docs"] == 2
    assert rows[("2026-01-01 10:00:00", "en")]["payload_bytes"] == 8 + 9
    assert rows[("2026-01-01 10:00:00", "de")]["n_docs"] == 1
    # the 12:00 window is NOT final yet (watermark 11:30)
    assert not any(k[0].startswith("2026-01-01 12:") for k in rows)

    # dump 2: a LATE 10:05 row (behind the 11:30 watermark -> dropped)
    # plus a 14:00 row that finalizes the 12:00 window
    _event_rows(spark, [
        ("u5", "2026-01-01 10:05:00", b"<p>late</p>", "en"),
        ("u6", "2026-01-01 14:00:00", b"<p>e</p>", "en"),
    ]).write.mode("overwrite").parquet(os.path.join(inp, "dump2"))
    q2 = streaming.stream_ingestion_stats(spark, inp + "/*", out)
    q2.awaitTermination(300)

    stats2 = streaming.read_ingestion_stats(spark, out)
    rows2 = {
        (str(r["window_start"]), r["lang"]): r for r in stats2.collect()
    }
    # the late row changed nothing: the 10:00/en window still counts 2,
    # emitted exactly once
    en_10 = stats2.filter(
        (F.col("window_start") == "2026-01-01 10:00:00")
        & (F.col("lang") == "en")
    ).collect()
    assert len(en_10) == 1 and en_10[0]["n_docs"] == 2
    # the 12:00 window finalized with exactly the one on-time doc
    assert rows2[("2026-01-01 12:00:00", "en")]["n_docs"] == 1


def test_streaming_exact_dedup_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState custom stateful operator: first-seen-wins
    content dedup whose seen-set SURVIVES across micro-batches through
    the streaming checkpoint."""
    inp = str(tmp_path_factory.mktemp("dd_in"))
    out = str(tmp_path_factory.mktemp("dd_out"))

    _event_rows(spark, [
        ("a1", "2026-01-01 10:00:00", b"<p>same body</p>", "en"),
        ("a2", "2026-01-01 10:01:00", b"<p>same body</p>", "en"),  # dup of a1
        ("a3", "2026-01-01 10:02:00", b"<p>other body</p>", "en"),
    ]).write.mode("overwrite").parquet(os.path.join(inp, "dump1"))
    q = streaming.stream_exact_dedup(spark, inp + "/*", out)
    q.awaitTermination(300)
    got1 = {r["url"] for r in streaming.read_deduped(spark, out).collect()}
    assert "a3" in got1 and len(got1) == 2  # one of a1/a2 + a3

    # a CROSS-batch duplicate arrives days later: the state remembers
    _event_rows(spark, [
        ("b1", "2026-01-03 09:00:00", b"<p>same body</p>", "en"),  # dup again
        ("b2", "2026-01-03 09:01:00", b"<p>brand new</p>", "en"),
    ]).write.mode("overwrite").parquet(os.path.join(inp, "dump2"))
    q2 = streaming.stream_exact_dedup(spark, inp + "/*", out)
    q2.awaitTermination(300)
    got2 = {r["url"] for r in streaming.read_deduped(spark, out).collect()}
    assert "b2" in got2 and "b1" not in got2
    assert len(got2) == 3


def test_stream_batch_equivalence_stats(spark, tmp_path_factory):
    """VERDICT r4 #6 (oracle-grade pin): the streamed watermarked
    rollup over a multi-dump sequence equals the BOUNDED batch rollup
    over the union of the dumps, restricted to watermark-closed
    windows — compared row-for-row, the driver-compare way (sorted
    rows, exact values)."""
    import datetime

    inp = str(tmp_path_factory.mktemp("eq_in"))
    out = str(tmp_path_factory.mktemp("eq_out"))

    # 60 docs spread over 10-min windows x 3 langs; dump2's event hour
    # (11:xx) sits entirely AFTER dump1's closing watermark (~10:2x),
    # so no row is late — the regime where stream must equal batch.  A
    # final 23:00 sentinel drives the watermark to 22:30, closing every
    # content window.
    def rows_for(lo, hi, hour):
        out_rows = []
        for i in range(lo, hi):
            ts = f"2026-02-01 {hour}:{(i * 7) % 60:02d}:{(i * 13) % 60:02d}"
            out_rows.append(
                (f"u{i}", ts, f"<p>body {i}</p>".encode(),
                 ["en", "de", "fr"][i % 3])
            )
        return out_rows

    _event_rows(spark, rows_for(0, 30, "10")).write.mode("overwrite").parquet(
        os.path.join(inp, "dump1")
    )
    q = streaming.stream_ingestion_stats(spark, inp + "/*", out)
    q.awaitTermination(300)
    _event_rows(
        spark,
        rows_for(30, 60, "11")
        + [("sentinel", "2026-02-01 23:00:00", b"<p>z</p>", "en")],
    ).write.mode("overwrite").parquet(os.path.join(inp, "dump2"))
    q2 = streaming.stream_ingestion_stats(spark, inp + "/*", out)
    q2.awaitTermination(300)

    streamed = streaming.read_ingestion_stats(spark, out)
    bounded = streaming.bounded_ingestion_stats(
        spark.read.parquet(inp + "/*")
    )
    horizon = datetime.datetime(2026, 2, 1, 22, 30)  # max_ts - 30min wm
    closed = bounded.filter(F.col("window_end") < F.lit(horizon))

    cols = ["window_start", "window_end", "lang", "n_docs", "payload_bytes"]
    s_rows = sorted(map(tuple, streamed.select(*cols).collect()))
    b_rows = sorted(map(tuple, closed.select(*cols).collect()))
    assert len(b_rows) >= 6  # the compare is not vacuous
    assert s_rows == b_rows


def test_stream_batch_equivalence_dedup(spark, tmp_path_factory):
    """VERDICT r4 #6: the cross-batch stateful dedup keeps exactly one
    row per distinct content hash — the same keep-set the bounded
    exact dedup derives from the unioned dumps — with the dup planted
    ACROSS micro-batch (and restart) boundaries."""
    inp = str(tmp_path_factory.mktemp("eqd_in"))
    out = str(tmp_path_factory.mktemp("eqd_out"))

    def payload(i):
        # 12 distinct bodies across 40 rows: in-dump AND cross-dump dups
        return f"<p>shared body {i % 12}</p>".encode()

    _event_rows(spark, [
        (f"a{i}", "2026-03-01 10:00:00", payload(i), "en")
        for i in range(20)
    ]).write.mode("overwrite").parquet(os.path.join(inp, "dump1"))
    q = streaming.stream_exact_dedup(spark, inp + "/*", out)
    q.awaitTermination(300)
    _event_rows(spark, [
        (f"b{i}", "2026-03-01 11:00:00", payload(i), "en")
        for i in range(20)
    ]).write.mode("overwrite").parquet(os.path.join(inp, "dump2"))
    q2 = streaming.stream_exact_dedup(spark, inp + "/*", out)  # restart
    q2.awaitTermination(300)

    kept = streaming.read_deduped(spark, out)
    bounded = (
        spark.read.parquet(inp + "/*")
        .select(F.sha2("html", 256).alias("content_sha"))
        .distinct()
    )
    kept_shas = sorted(r["content_sha"] for r in kept.collect())
    bounded_shas = sorted(r["content_sha"] for r in bounded.collect())
    assert len(bounded_shas) == 12
    assert kept_shas == bounded_shas  # one survivor per distinct content
    # first-seen-wins across the batch boundary: every survivor of a
    # body present in dump1 is a dump1 row
    assert all(r["url"].startswith("a") for r in kept.collect())


# ---------------------------------------------------------------------------
# Streaming MinHash-LSH near-dup across micro-batches
# ---------------------------------------------------------------------------


def _nd_texts():
    long1 = " ".join(f"alpha{i} beta{i}" for i in range(20))
    long2 = " ".join(f"gamma{i} delta{i}" for i in range(20))
    return {
        "d1/a": long1,
        "d1/b": long2,
        "d1/c": "tiny text here",
        "d2/a2": long1 + " trailing tail",   # near-dup of d1/a
        "d2/e": long2,                        # exact text of d1/b
        "d2/f": " ".join(f"fresh{i} new{i}" for i in range(20)),
        "d2/g": long2,                        # third identical copy:
        # must match d1/b (the FIRST holder of that signature — state
        # stores each distinct signature once), never d2/e
    }


def _nd_reference(threshold=0.8):
    """Pure-python replay of the streaming operator's algorithm —
    same MinHash kernel (hashlib md5, same seeds), same bucket keys,
    same in-batch url ordering and optimistic insert — giving the
    ground-truth per-doc verdicts the stream must reproduce."""
    import hashlib

    from smart_ocr_spark.functions.dedup import (
        N_BANDS, N_MINHASH, _shingle_set,
    )

    texts = _nd_texts()
    rows_per_band = N_MINHASH // N_BANDS

    def sigs_of(text):
        sh = [s.encode() for s in _shingle_set(text)]
        if not sh:
            return None
        sigs = [
            min(hashlib.md5(f"{p}:".encode() + s).hexdigest() for s in sh)
            for p in range(N_MINHASH)
        ]
        bands = [
            hashlib.md5("".join(
                sigs[b * rows_per_band:(b + 1) * rows_per_band]
            ).encode()).hexdigest()
            for b in range(N_BANDS)
        ]
        return sigs, bands

    state: dict[str, list] = {}
    per_row = {}
    for dump in ("d1/", "d2/"):
        batch = sorted(u for u in texts if u.startswith(dump))
        for url in batch:
            got = sigs_of(texts[url])
            if got is None:
                continue
            sigs, bands = got
            for b, bv in enumerate(bands):
                bucket = f"{b}:{bv}"
                hist = state.setdefault(bucket, [])
                best, best_est = None, 0.0
                for hurl, hs in hist:
                    est = sum(x == y for x, y in zip(sigs, hs)) / N_MINHASH
                    if est >= threshold and (
                        best is None or est > best_est
                        or (est == best_est and hurl < best)
                    ):
                        best, best_est = hurl, est
                per_row[(url, bucket)] = (best, best_est if best else None)
                # one entry per distinct signature, first url wins
                if not any(hs == sigs for _, hs in hist):
                    hist.append((url, sigs))
    verdicts = {}
    for (url, _), (m, est) in per_row.items():
        cur = verdicts.get(url)
        if m is not None and (cur is None or cur[0] is None
                              or (est, m) > (cur[1], cur[0])):
            verdicts[url] = (m, est)
        elif cur is None:
            verdicts[url] = (None, None)
    return verdicts


def test_stream_neardup_matches_reference_across_restart(spark, tmp_path):
    """The stateful near-dup stream must (a) carry history across a
    QUERY RESTART via the checkpoint, and (b) agree row-for-row with
    the pure-python replay of its own declared algorithm."""
    inp = str(tmp_path / "nd_in")
    out = str(tmp_path / "nd_out")
    texts = _nd_texts()

    def drop(tag):
        rows = [(u, t) for u, t in texts.items() if u.startswith(tag)]
        spark.createDataFrame(rows, "url string, text string").write.mode(
            "overwrite"
        ).parquet(os.path.join(inp, tag.rstrip("/")))

    drop("d1/")
    q = streaming.stream_neardup_dedup(spark, inp + "/*", out)
    q.awaitTermination(300)
    drop("d2/")
    q2 = streaming.stream_neardup_dedup(spark, inp + "/*", out)  # restart
    q2.awaitTermination(300)

    got = {
        r.url: (r.matched_url, r.est_jaccard)
        for r in streaming.read_neardup_verdicts(spark, out).collect()
    }
    want = _nd_reference()
    assert got == want, (got, want)
    # the planted cross-batch dups were caught with history intact
    assert got["d2/e"] == ("d1/b", 1.0)           # exact text, est 1.0
    assert got["d2/a2"][0] == "d1/a"              # near-dup via suffix
    assert got["d2/f"] == (None, None)            # fresh doc survives
    assert got["d1/a"] == (None, None)            # history never flags
    # distinct-signature state: the third identical copy matches the
    # FIRST holder, proving duplicates fold to one state entry
    assert got["d2/g"] == ("d1/b", 1.0)
    sat = {r.url: r.state_saturated for r in
           streaming.read_neardup_verdicts(spark, out).collect()}
    assert not any(sat.values())                  # cap never engaged


def test_stream_neardup_saturation_flagged(spark, tmp_path):
    """A full bucket never silently degrades: with the cap forced to 0
    nothing is stored, nothing matches, and EVERY verdict carries
    state_saturated=True."""
    inp = str(tmp_path / "sat_in")
    out = str(tmp_path / "sat_out")
    texts = {u: t for u, t in _nd_texts().items() if u.startswith("d1/")}
    spark.createDataFrame(
        list(texts.items()), "url string, text string"
    ).write.parquet(os.path.join(inp, "d1"))
    q = streaming.stream_neardup_dedup(
        spark, inp + "/*", out, state_sig_cap=0
    )
    q.awaitTermination(300)
    rows = streaming.read_neardup_verdicts(spark, out).collect()
    assert rows and all(r.state_saturated for r in rows)
    assert not any(r.is_neardup for r in rows)


def test_stream_neardup_batch_equivalence(spark, tmp_path):
    """VERDICT r5 #7 (the r4 #6 pattern for the third streaming op):
    the stateful near-dup stream's verdicts must equal the BOUNDED
    Spark compare built from the shared batch kernel — minhash
    signatures + banded LSH candidate pairs over the unioned dumps,
    restricted to earlier→later pairs in processing order (dump order
    then url sort ≡ global url order for this fixture), with the same
    signature-agreement estimate.  Pure-Python replay equivalence is
    pinned separately; this pins stream ≡ batch DataFrame path."""
    from smart_ocr_spark.functions.dedup import (
        N_MINHASH,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    inp = str(tmp_path / "eq_in")
    out = str(tmp_path / "eq_out")
    texts = _nd_texts()

    def drop(tag):
        rows = [(u, t) for u, t in texts.items() if u.startswith(tag)]
        spark.createDataFrame(rows, "url string, text string").write.mode(
            "overwrite"
        ).parquet(os.path.join(inp, tag.rstrip("/")))

    drop("d1/")
    q = streaming.stream_neardup_dedup(spark, inp + "/*", out)
    q.awaitTermination(300)
    drop("d2/")
    q2 = streaming.stream_neardup_dedup(spark, inp + "/*", out)
    q2.awaitTermination(300)
    got = {
        r.url: (r.is_neardup, r.est_jaccard)
        for r in streaming.read_neardup_verdicts(spark, out).collect()
    }

    # bounded batch path over the union of both dumps
    docs = spark.createDataFrame(
        list(texts.items()), "url string, text string"
    )
    sig = minhash_signatures(docs, id_col="url", id_type="string")
    pairs = lsh_candidate_pairs(sig, id_col="url")  # doc_a < doc_b
    a = sig.select(
        F.col("url").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    b = sig.select(
        F.col("url").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    est = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        for i in range(N_MINHASH)
    ) / float(N_MINHASH)
    qualified = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b", est.alias("est"))
        .where(F.col("est") >= 0.8)
    )
    batch_best = {
        r["doc_b"]: r["best"]
        for r in qualified.groupBy("doc_b")
        .agg(F.max("est").alias("best"))
        .collect()
    }
    # verdict-set equivalence: a doc is stream-flagged iff the batch
    # path finds a qualifying earlier partner for it
    assert {u for u, (nd, _) in got.items() if nd} == set(batch_best)
    # and the reported estimate is the batch max over earlier partners
    for u, best in batch_best.items():
        assert got[u][1] == pytest.approx(best)
