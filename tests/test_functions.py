"""Tests for the training-data pipeline functions (dedup / similarity /
text analysis / multimodal) on planted fixtures where the right answer
is known by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_ocr_spark.functions import dedup, multimodal, similarity, text_analysis as ta


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base, "en"),
        (1, base, "en"),  # exact dup of 0
        (2, base + " again", "en"),  # near dup of 0
        (3, "completely different words about spark shuffle partitions and joins", "en"),
        (4, "los datos de la tabla y los datos de una consulta", "es"),
        (5, "一 二 三 四 五 六 七 八 九 十 中文 文本", "zh"),
        (6, "x", "en"),  # degenerate: one token
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup(docs):
    groups = dedup.exact_dedup_groups(docs).collect()
    by_canon = {r.canonical_id: r.dup_count for r in groups}
    assert by_canon[0] == 2  # docs 0 and 1
    assert len(groups) == 6  # 7 rows, one pair collapsed
    kept = dedup.exact_dedup(docs).select("doc_id").toPandas().doc_id.tolist()
    assert 0 in kept and 1 not in kept and len(kept) == 6


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 1) in got  # exact dup -> jaccard 1.0
    assert (0, 2) in got and (1, 2) in got  # near dup
    assert all(r.jaccard >= 0.5 for r in pairs)
    exact = [r for r in pairs if (r.doc_a, r.doc_b) == (0, 1)][0]
    assert exact.jaccard == 1.0


def test_minhash_lsh_pipeline(docs):
    sig = dedup.minhash_signatures(docs)
    rows = {r["doc_id"]: r for r in sig.collect()}
    # exact dups share the full signature; near-dups share some mins
    assert all(rows[0][f"sig_{i}"] == rows[1][f"sig_{i}"] for i in range(8))
    assert rows[0]["band_0"] == rows[1]["band_0"]
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.5)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (0, 1) in got


def test_simhash_variants(docs):
    h16 = {r.doc_id: r.simhash16 for r in dedup.simhash16(docs).collect()}
    assert h16[0] == h16[1]  # identical text -> identical hash
    assert 0 <= h16[0] < (1 << 16)
    h64 = {
        r.doc_id: r.simhash64
        for r in dedup.with_simhash64(docs).select("doc_id", "simhash64").collect()
    }
    assert h64[0] == h64[1]
    assert h64[0] != h64[3]
    pairs = dedup.simhash_near_pairs(docs, max_hamming=10)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert got[(0, 1)] == 0


def test_token_stats_and_fingerprint(docs):
    out = ta.with_token_stats(docs).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[6].token_count == 1
    assert by_id[0].token_count == 14
    fp = {r.doc_id: r.bag_fingerprint for r in ta.with_bag_fingerprint(docs).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    wf = {r.doc_id: r.winnow_fp for r in ta.with_winnow_fingerprint(docs).collect()}
    assert wf[0] == wf[1]
    assert isinstance(wf[0], int)


def test_lang_id(docs):
    out = {r.doc_id: r.predicted_lang for r in ta.with_lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[4] == "es"
    assert out[5] == "zh"
    assert out[6] == "und"  # no markers


def test_quality_score_bounds(docs):
    out = ta.with_quality_score(docs).collect()
    for r in out:
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.garbage_ratio <= 1.0
    by_id = {r.doc_id: r for r in out}
    # prose beats the one-char degenerate doc
    assert by_id[0].quality_score > by_id[6].quality_score


@pytest.fixture(scope="module")
def embeddings(spark):
    # 3 tight clusters of 4 + 2 loners, 8-dim
    import math

    rows = []
    vid = 0
    for c in range(3):
        base = [math.sin(c * 7 + d) for d in range(8)]
        for j in range(4):
            vec = [v + 0.01 * j * ((d % 2) * 2 - 1) for d, v in enumerate(base)]
            rows.append((vid, [float(x) for x in vec], c))
            vid += 1
    rows.append((vid, [float(d == 0) for d in range(8)], 99))
    rows.append((vid + 1, [float(d == 7) for d in range(8)], 98))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_cosine_topk_finds_cluster(embeddings):
    out = similarity.cosine_topk(embeddings, k=3).collect()
    labels = {r.vec_id: r.label for r in embeddings.collect()}
    # for clustered vectors, all top-3 neighbors are from the same cluster
    for r in out:
        if labels[r.query_id] in (0, 1, 2):
            assert labels[r.nbr_id] == labels[r.query_id], r
    ranks = [r.rank for r in out if r.query_id == 0]
    assert sorted(ranks) == [1, 2, 3]


def test_lsh_topk_recall(embeddings):
    exact = {
        (r.query_id, r.nbr_id)
        for r in similarity.cosine_topk(embeddings, k=2).collect()
    }
    approx = {
        (r.query_id, r.nbr_id)
        for r in similarity.lsh_topk(
            embeddings, k=2, dim=8, n_planes=4, n_tables=3
        ).collect()
    }
    # tight clusters land in the same bucket: high recall expected
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, (recall, exact - approx)


def test_cosine_near_dup_pairs(embeddings):
    pairs = similarity.cosine_near_dup_pairs(embeddings, threshold=0.999).collect()
    labels = {r.vec_id: r.label for r in embeddings.collect()}
    assert pairs, "tight clusters must produce near-dup pairs"
    for r in pairs:
        assert labels[r.vec_a] == labels[r.vec_b]


def test_degenerate_bucket_guard(spark, caplog):
    """VERDICT r2 #2: an all-identical embedding corpus lands every row
    in ONE hyperplane bucket per table.  The neighbor-side fan-in cap
    must bound the join (no quadratic pair blowup), keep semantics
    (every query still finds neighbors; every row still deduped), and
    LOG the drop (no-silent-caps rule)."""
    import logging

    n = 10_000
    cap = 64
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(8)

    with caplog.at_level(logging.WARNING, logger="smart_ocr_spark.functions.similarity"):
        topk = similarity.lsh_topk(
            df, k=3, dim=4, n_planes=4, n_tables=2, bucket_cap=cap
        )
        topk_rows = topk.collect()
    assert any("fan-in cap" in r.message for r in caplog.records)
    # bounded: at most k rows per query, and every query answered
    assert len(topk_rows) == n * 3
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in topk_rows[:50])

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="smart_ocr_spark.functions.similarity"):
        pairs = similarity.cosine_near_dup_pairs(
            df, threshold=0.99, dim=4, n_planes=4, n_tables=2, bucket_cap=cap
        )
        pair_count = pairs.count()
        # dedup semantics survive the cap: every non-kept row pairs
        # upward into the kept (largest-id) set, so no row escapes
        covered = (
            pairs.select(F.col("vec_a").alias("vec_id"))
            .union(pairs.select(F.col("vec_b").alias("vec_id")))
            .distinct()
            .count()
        )
    assert any("fan-in cap" in r.message for r in caplog.records)
    assert pair_count <= n * cap  # bounded, not ~n^2/2
    assert covered == n


def test_simhash_degenerate_corpus_guard(spark, caplog):
    """VERDICT r3 #2: a corpus of identical texts collapses every row
    into ONE 16-bit chunk value per chunk position, so the pigeonhole
    join would go quadratic.  The reused neighbor-side fan-in cap must
    bound the join, keep dedup semantics (every row appears in some
    pair — largest ids kept because the filter is a < b), and LOG the
    drop (no-silent-caps rule)."""
    import logging

    n = 10_000
    cap = 64
    rows = [(i, "the exact same boilerplate text in every row") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)

    with caplog.at_level(
        logging.WARNING, logger="smart_ocr_spark.functions.similarity"
    ):
        pairs = dedup.simhash_near_pairs(df, max_hamming=3, bucket_cap=cap)
        pair_count = pairs.count()
        covered = (
            pairs.select(F.col("doc_a").alias("doc_id"))
            .union(pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
            .count()
        )
    assert any("fan-in cap" in r.message for r in caplog.records)
    assert pair_count <= n * cap  # bounded, not ~n^2/2 (= 50M)
    assert covered == n  # no row escapes dedup


def test_pii_redaction(spark):
    from smart_ocr_spark.functions import text_analysis as ta

    rows = [
        (0, "Mail me at alice.smith+x@sub.example.org today"),
        (1, "Call (555) 123-4567 or +1 555.987.6543 now"),
        (2, "Server at 10.0.0.1 and 192.168.100.200 responded"),
        (3, "No pii here, just the number 12345 and v1.2 notation"),
        (4, "combo: bob@x.io, 555-111-2222, 8.8.8.8"),
        (5, "build tag 999.999.999.999 is not an address"),
        (6, "reach 10.20.30.40@example.com for help"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in ta.with_pii_redaction(df).collect()}
    assert "<EMAIL>" in out[0].redacted and out[0].n_email == 1
    assert "alice" not in out[0].redacted
    assert out[1].redacted.count("<PHONE>") == 2 and out[1].n_phone == 2
    assert out[2].redacted.count("<IP>") == 2 and out[2].n_ipv4 == 2
    # precision: plain numbers / version strings must be untouched
    assert out[3].redacted == rows[3][1]
    assert out[3].n_email == out[3].n_phone == out[3].n_ipv4 == 0
    assert all(t in out[4].redacted for t in ("<EMAIL>", "<PHONE>", "<IP>"))
    # octet validation (ADVICE r3): 999.* is a version-ish string
    assert out[5].redacted == rows[5][1] and out[5].n_ipv4 == 0
    # stage-wise counts (ADVICE r3): the dotted quad inside the email
    # local part is consumed by the email replacement — neither counted
    # nor redacted as an IP
    assert out[6].redacted == "reach <EMAIL> for help"
    assert out[6].n_email == 1 and out[6].n_ipv4 == 0


def test_quality_keep_list(spark, caplog):
    import logging

    from smart_ocr_spark.functions import curation

    good = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "to read the news of the town in the morning paper with coffee"
    )
    rows = [
        (0, good, "en"),
        (1, "x y z", "en"),                      # token floor
        (2, good, "fr"),                         # lang allowlist
        (3, "\u2593\u2593 \u25c9\u25c9 \u2637\u2637 " * 30, "en"),  # garbage-heavy
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    with caplog.at_level(logging.WARNING, logger="smart_ocr_spark.functions.curation"):
        kept = curation.quality_keep_list(
            df, min_quality=0.5, min_tokens=10, langs=["en"], log_drops=True
        ).collect()
    assert [r.doc_id for r in kept] == [0]
    assert kept[0].token_count >= 10 and kept[0].quality_score >= 0.5
    assert any("kept 1 / 4" in r.message for r in caplog.records)


def test_multimodal_meta_and_features(spark):
    rows = [
        ("u1", "image", b"\x89PNG\r\n" + b"x" * 100),
        ("u2", "image", b"\xff\xd8\xff\xe0" + b"y" * 50),
        ("u3", "video", b"\x00\x00\x00\x18ftyp" + b"z" * 3000),
        ("u4", "audio", None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    meta = {r.url: r for r in multimodal.extract_media_meta(media).collect()}
    assert meta["u1"].format == "png"
    assert meta["u2"].format == "jpeg"
    assert meta["u3"].format == "mp4ish"
    assert meta["u4"].format == "empty" and meta["u4"].byte_size == 0
    feats = {r.url: r.feature for r in multimodal.media_features(media, dim=16).collect()}
    assert len(feats["u1"]) == 16
    assert all(-1.0 <= x <= 1.0 for x in feats["u1"])
    # deterministic: same payload -> same feature
    feats2 = {r.url: r.feature for r in multimodal.media_features(media, dim=16).collect()}
    assert feats == feats2
    frames = multimodal.frame_sample(media, every_n_bytes=1024).collect()
    per_url = {}
    for r in frames:
        per_url.setdefault(r.url, []).append(r.frame_idx)
    assert len(per_url["u3"]) == 2  # 3008 bytes // 1024
    assert per_url["u4"] == [0]  # empty payload -> 1 stub frame


def test_media_features_real_decode_raises(spark):
    media = spark.createDataFrame(
        [("u1", "image", b"\x89PNG")], schema=multimodal.MEDIA_SCHEMA
    )
    with pytest.raises(Exception):  # NotImplementedError inside the UDF
        multimodal.media_features(media, fake=False).collect()


def test_image_resize_plumbing(spark):
    """Resize-to-model-input: output rows carry exactly W*H bytes (the
    real kernel's payload-size profile), deterministically derived, and
    the real-decode path refuses honestly."""
    rows = [
        ("u1", "image", b"\x89PNG\r\n" + b"x" * 5000),
        ("u2", "image", b"\xff\xd8\xff\xe0" + b"y" * 50),
        ("u3", "image", None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.url: r for r in multimodal.image_resize(media, 32, 24).collect()}
    assert all(r.width == 32 and r.height == 24 for r in out.values())
    assert all(len(r.resized) == 32 * 24 for r in out.values())
    assert out["u1"].resized != out["u2"].resized  # payload-derived
    out2 = {r.url: r for r in multimodal.image_resize(media, 32, 24).collect()}
    assert out["u1"].resized_sha256 == out2["u1"].resized_sha256
    with pytest.raises(Exception):
        multimodal.image_resize(media, fake=False).collect()


def test_ivf_topk_recall(embeddings):
    from smart_ocr_spark.functions import similarity

    exact = {
        (r.query_id, r.nbr_id)
        for r in similarity.cosine_topk(embeddings, k=2).collect()
    }
    ivf = {
        (r.query_id, r.nbr_id)
        for r in similarity.ivf_topk(embeddings, k=2, n_probe=1).collect()
    }
    # clustered vectors: probing their own cell finds the true neighbors
    clustered_exact = {p for p in exact if p[0] < 12}
    recall = len(clustered_exact & ivf) / len(clustered_exact)
    assert recall >= 0.9, (recall, clustered_exact - ivf)


def test_label_centroids_shape(spark, embeddings):
    from smart_ocr_spark.functions import similarity

    cents = similarity.label_centroids(embeddings).collect()
    labels = {r.label for r in cents}
    assert labels == {0, 1, 2, 98, 99}
    per_label = {}
    for r in cents:
        per_label.setdefault(r.label, []).append(r.idx)
    for lbl, idxs in per_label.items():
        assert sorted(idxs) == list(range(1, 9)), lbl


def test_kmeans_deterministic_and_clusters_labels(spark, embeddings):
    """k-means over the labeled fixture: same input -> identical
    assignment across runs and partitionings; members of the same tight
    label cluster land in the same k-means cluster."""
    from smart_ocr_spark.functions import clustering

    a = clustering.kmeans_assign(embeddings, k=3, iters=2).collect()
    b = clustering.kmeans_assign(embeddings.repartition(7), k=3, iters=2).collect()
    amap = {r.vec_id: (r.cluster, r.cosine) for r in a}
    bmap = {r.vec_id: (r.cluster, r.cosine) for r in b}
    assert amap == bmap

    labels = {r.vec_id: r.label for r in embeddings.collect()}
    by_label = {}
    for r in a:
        by_label.setdefault(labels[r.vec_id], set()).add(r.cluster)
    # every tight synthetic label cluster maps into ONE k-means cluster
    for lab, cls in by_label.items():
        assert len(cls) == 1, (lab, cls)


def test_ivf_over_kmeans_cells(spark, embeddings):
    """The advertised composition: k-means output plugs in as ivf_topk's
    coarse quantizer (replacing the given labels) and the per-cell exact
    re-rank still finds the tight in-cluster neighbors."""
    from pyspark.sql import functions as F

    from smart_ocr_spark.functions import clustering, similarity

    cells = clustering.kmeans_assign(embeddings, k=3, iters=2).select(
        "vec_id", F.col("cluster").alias("label")
    )
    corpus = embeddings.drop("label").join(cells, "vec_id")
    out = similarity.ivf_topk(corpus, k=2, n_probe=1)
    top1 = {r.query_id: r.nbr_id for r in out.collect() if r.rank == 1}
    labels = {r.vec_id: r.label for r in corpus.collect()}
    # rank-1 neighbor shares the k-means cell by construction, and for
    # the tight synthetic clusters that is also the true nearest cluster
    for q, n in top1.items():
        assert labels[q] == labels[n]


def test_deterministic_sample_properties(spark):
    """Reproducible, partition-independent, nested (raising the
    fraction only adds rows) — the properties df.sample lacks."""
    from smart_ocr_spark.functions import sampling

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in sampling.deterministic_sample(df, 0.3).collect()}
    b = {
        r.doc_id
        for r in sampling.deterministic_sample(df.repartition(13), 0.3).collect()
    }
    assert a == b, "sample must be partition-independent"
    # roughly the right size (hash-uniform: generous tolerance)
    assert 0.2 < len(a) / 2000 < 0.4
    bigger = {
        r.doc_id for r in sampling.deterministic_sample(df, 0.6).collect()
    }
    assert a <= bigger, "samples must be nested as fraction grows"
    other_salt = {
        r.doc_id
        for r in sampling.deterministic_sample(df, 0.3, salt="z9").collect()
    }
    assert other_salt != a, "different salts give different samples"


def test_stratified_sample_quotas(spark):
    from smart_ocr_spark.functions import sampling

    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_sample(
        df, "lang", {"en": 0.8, "zh": 0.1}, default_fraction=0.0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    assert 0.7 < by_lang["en"] / 1000 < 0.9
    assert 0.05 < by_lang["zh"] / 1000 < 0.16

    with pytest.raises(ValueError):
        sampling.deterministic_sample(df, 1.5)
    with pytest.raises(ValueError):
        sampling.stratified_sample(df, "lang", {"en": 1.5})


def test_deterministic_split_is_exact_partition(spark):
    from smart_ocr_spark.functions import sampling

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    kept, rest = sampling.deterministic_split(df, 0.3, salt="sp")
    a = {r.doc_id for r in kept.collect()}
    b = {r.doc_id for r in rest.collect()}
    assert a.isdisjoint(b)
    assert len(a) + len(b) == 1000
    sample = {
        r.doc_id
        for r in sampling.deterministic_sample(df, 0.3, salt="sp").collect()
    }
    assert a == sample


def test_null_ids_excluded_from_samples(spark):
    """NULL ids hash to NULL and land in neither side — the same
    semantics as the SQL oracle's 'salt:' || NULL."""
    from smart_ocr_spark.functions import sampling

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id long"
    )
    kept, rest = sampling.deterministic_split(df, 0.99, salt="nn")
    ids = {r.doc_id for r in kept.collect()} | {
        r.doc_id for r in rest.collect()
    }
    assert None not in ids


def test_contamination_detects_planted_leak(spark):
    """A training doc copied verbatim into eval must report full
    contamination; a disjoint eval doc reports zero."""
    from smart_ocr_spark.functions import contamination

    leak = " ".join(f"tok{i}" for i in range(30))
    clean = " ".join(f"other{i}" for i in range(30))
    train = spark.createDataFrame(
        [(1, leak), (2, "unrelated training words " * 10)],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, leak), (101, clean)], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination)
        for r in contamination.contamination_report(train, eval_df).collect()
    }
    assert out[100][2] == 1.0, "verbatim copy must be fully contaminated"
    assert out[101][1] == 0 and out[101][2] == 0.0

    # partial overlap: eval doc shares its first half with train
    mixed = " ".join(f"tok{i}" for i in range(15)) + " " + clean
    eval2 = spark.createDataFrame([(200, mixed)], "doc_id long, text string")
    [r] = contamination.contamination_report(train, eval2).collect()
    assert 0.0 < r.contamination < 1.0


def test_connected_components_shapes(spark):
    from smart_ocr_spark.functions import components

    # two chains + a triangle + an isolated pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22), (30, 31)],
        "doc_a long, doc_b long",
    )
    comps = {
        r.id: r.component_id
        for r in components.connected_components(pairs).collect()
    }
    assert comps == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_canonical_docs_keep_list(spark):
    from smart_ocr_spark.functions import components

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    kept = {
        r.doc_id
        for r in components.canonical_docs(docs, pairs).collect()
    }
    # 2 and 5 are non-canonical members; everything else survives
    assert kept == {0, 1, 3, 4}


def test_connected_components_long_chain_converges(spark):
    from smart_ocr_spark.functions import components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    comps = components.connected_components(pairs)
    assert {r.component_id for r in comps.collect()} == {0}


def test_repetition_filters(spark):
    """Gopher repetition rules (Rae et al. 2021 Table A1): planted
    repetitive pathologies must trip the right metric; clean prose must
    not."""
    from smart_ocr_spark.functions import repetition as rep

    loop_line = "click here to subscribe now\n" * 10 + "one real sentence"
    loop_para = ("an identical paragraph of boilerplate text\n\n" * 6
                 + "closing remark")
    gram_spam = "buy now " * 40 + "unrelated tail words here"
    clean = ("the first line has unique words\n"
             "and the second line differs entirely\n"
             "a third line closes the clean document")
    rows = [
        (0, loop_line), (1, loop_para), (2, gram_spam), (3, clean),
        (4, ""), (5, "solo"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in rep.with_repetition_metrics(df).collect()}

    assert out[0]["dup_line_frac"] > rep.DUP_LINE_MAX and out[0]["repetitive"]
    assert out[1]["dup_para_frac"] > rep.DUP_PARA_MAX and out[1]["repetitive"]
    assert out[2]["top_2gram_char_frac"] > rep.TOP_2GRAM_MAX
    assert out[2]["repetitive"]
    assert not out[3]["repetitive"]
    assert out[3]["dup_line_frac"] == 0.0
    # degenerate docs: nothing repeated, never flagged
    for d in (4, 5):
        assert not out[d]["repetitive"]
        assert out[d]["top_2gram_char_frac"] == 0.0


def test_url_canonicalization(spark):
    """Web-pipeline URL dedup tier: the canonical form collapses case,
    default ports, trailing slashes, tracking params, param order, and
    fragments — and nothing else."""
    from smart_ocr_spark.functions import urls

    rows = [
        (0, "https://WWW.Example.COM:443/a/b/?utm_source=x&z=1&a=2#frag"),
        (1, "https://www.example.com/a/b?a=2&z=1"),          # same as 0
        (2, "http://www.example.com:8080/a/b?a=2&z=1"),      # real port kept
        (3, "http://host.net:80/only/utm?utm_campaign=c"),   # q drops away
        (4, "not a url at all"),                             # fallback
        (5, "HTTPS://other.ORG"),                            # bare host
        (6, "http://a.com/page#/route?x=1"),  # '?' inside the fragment
        (7, "http://a.com/page"),             # same after fragment drop
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = {r["doc_id"]: r for r in urls.with_canonical_url(df).collect()}
    assert out[0]["canonical_url"] == "https://www.example.com/a/b?a=2&z=1"
    assert out[0]["canonical_url"] == out[1]["canonical_url"]
    assert out[2]["canonical_url"] == "http://www.example.com:8080/a/b?a=2&z=1"
    assert out[3]["canonical_url"] == "http://host.net/only/utm"
    assert out[4]["canonical_url"] == "not a url at all"
    assert out[4]["host"] == ""
    assert out[5]["canonical_url"] == "https://other.org"
    assert out[0]["host"] == "www.example.com"
    # a '?' inside a fragment is NOT a query: both collapse
    assert out[6]["canonical_url"] == "http://a.com/page"
    assert out[6]["canonical_url"] == out[7]["canonical_url"]

    keep = {r["doc_id"]: r for r in urls.url_dedup_keep_list(df).collect()}
    assert keep[0]["kept"] and not keep[1]["kept"]  # min id wins
    assert keep[2]["kept"]

    stats = {r["host"]: r for r in urls.host_stats(df).collect()}
    assert stats["www.example.com"]["n_docs"] == 3
    assert stats["www.example.com"]["n_canonical"] == 2
    assert stats["www.example.com"]["n_kept"] == 2


def test_url_canonicalization_idempotent(spark):
    """canonical(canonical(u)) == canonical(u): the canonical form must
    be a fixed point, over adversarial URL-ish strings and seeded random
    junk — a drift here means dedup keys depend on how many times a
    pipeline stage normalized them."""
    import random

    from smart_ocr_spark.functions import urls

    adversarial = [
        "https://A.B:443/",
        "http://a.b:80",
        "https://x.y:8443/p//",
        "http://h/p?utm_source=a&utm_medium=b",
        "http://h/p?z=1&a=2&m=3#frag?fake=q",
        "http://h/#frag",
        "http://h/?",
        "http://h/??double=q",
        "ftp://files.example.com:21/a",
        "HTTP://UPPER.HOST/MiXeD/CaSe",
        "scheme+x.y://host/",
        "//protocol-relative.example/x",
        "http://h:00080/x",  # weird port form: kept verbatim (not 80)
        "",
        "?just=a&query",
        "#just-fragment",
        "http://h/p?a=1&a=1&a=0",  # duplicate params survive, sorted
    ]
    rng = random.Random(7)
    alphabet = "abXY09:/?#&=._-%~ "
    fuzz = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(adversarial + fuzz)], ["doc_id", "url"]
    )
    from pyspark.sql import functions as F

    once = df.select(
        "doc_id", urls.canonical_url_col(F.col("url")).alias("c1")
    )
    twice = once.select(
        "doc_id", "c1", urls.canonical_url_col(F.col("c1")).alias("c2")
    )
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad[:5]


def test_curation_funnel_composition(spark):
    """The funnel keeps exactly the docs passing EVERY stage, and the
    per-stage booleans expose the drop reason."""
    from smart_ocr_spark.functions import curation

    good = ("the quick brown fox jumps over the lazy dog and it runs to "
            "the river bank where it is seen again by the watcher today "
            "with a calm and steady view of the whole scene in the sun")
    rows = [
        (0, good, "en"),                          # passes everything
        (1, good, "en"),                          # exact dup of 0
        (2, "tiny", "en"),                        # fails quality floor
        (3, "the line repeats\n" * 12 + good, "en"),  # repetitive
        (4, good + " but different tail words", "fr"),  # lang filtered
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    fun = {
        r["doc_id"]: r
        for r in curation.curation_funnel(df, langs=["en", "de", "es"])
        .collect()
    }
    assert fun[0]["keep"]
    assert not fun[1]["keep"] and not fun[1]["content_canonical"]
    assert fun[1]["quality_ok"]  # dropped ONLY for duplication
    assert not fun[2]["quality_ok"]
    assert not fun[3]["repetition_ok"]
    assert not fun[4]["quality_ok"]  # lang allowlist folds into quality

    rep = curation.funnel_report(
        curation.curation_funnel(df, langs=["en", "de", "es"])
    ).first()
    assert rep["n_total"] == 5
    assert rep["n_keep"] == 1
    assert rep["n_content_canonical"] == 4  # one dup collapsed


def test_paragraph_dedup_ccnet_semantics(spark):
    """Corpus-wide paragraph dedup: first (doc, pos) occurrence wins,
    blanks never dedup, docs reassemble in order, exact doc dups
    collapse to empty for free."""
    boiler = "subscribe to our newsletter"
    rows = [
        (0, f"alpha unique text\n\n{boiler}\n\nomega tail"),
        (1, f"{boiler}\n\nbravo other text"),      # loses the boiler
        (2, "charlie standalone paragraph"),
        (3, f"alpha unique text\n\n{boiler}\n\nomega tail"),  # exact dup of 0
        (4, "delta\n\n\n\necho"),                  # blank fragment kept
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup.paragraph_dedup(df).collect()}

    assert out[0]["cleaned_text"] == rows[0][1]    # first owner keeps all
    assert out[0]["n_kept"] == 3
    assert out[1]["cleaned_text"] == "bravo other text"
    assert out[1]["n_kept"] == 1
    assert out[2]["cleaned_text"] == rows[2][1]
    assert out[3]["n_kept"] == 0                   # exact dup fully removed
    assert out[3]["cleaned_text"] == ""
    assert out[4]["cleaned_text"] == rows[4][1]    # blanks reassemble lossless
    assert out[4]["n_paras"] == 3 and out[4]["n_kept"] == 2


def test_paragraph_dedup_corpuswide_boilerplate(spark):
    """VERDICT r4 #1 adversarial case at paragraph grain (the
    test_simhash_degenerate_corpus_guard pattern): a boilerplate
    paragraph present in EVERY doc of a 10k-doc corpus — the literal
    "All rights reserved." hot key.  The agg-based keeper must (a)
    stay correct: exactly doc 0 keeps the boilerplate, every doc keeps
    its unique paragraph; (b) never route the hot key through a
    Window or a probe-side join of the exploded occurrences — pinned
    by plan shape (no Window; the only joins are doc-id-keyed)."""
    n = 10_000
    boiler = "All rights reserved. Subscribe to our newsletter today."
    rows = [(i, f"{boiler}\n\nunique paragraph body number {i}")
            for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    out_df = dedup.paragraph_dedup(df)

    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan  # map-side combine absorbs the hot key

    out = out_df.collect()
    assert len(out) == n
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["cleaned_text"] == rows[0][1]
    assert by_id[0]["n_kept"] == 2
    for i in (1, 4_999, n - 1):
        assert by_id[i]["cleaned_text"] == f"unique paragraph body number {i}"
        assert by_id[i]["n_paras"] == 2 and by_id[i]["n_kept"] == 1


def test_url_dedup_hot_mirror(spark):
    """VERDICT r4 #2 adversarial case: one spam-mirror canonical URL
    carrying half a 10k-row corpus.  Agg-keyed keeper (no Window in
    the plan, partial_min present); exactly the min id survives the
    hot URL and every cold URL keeps its own row."""
    from smart_ocr_spark.functions import urls

    n = 10_000
    rows = [
        (i,
         "http://mirror.spam/page?utm_source=x" if i % 2
         else f"http://ok.example/{i}")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"]).repartition(8)
    out_df = urls.url_dedup_keep_list(df)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan

    out = out_df.collect()
    assert len(out) == n
    hot = [r for r in out if r["canonical_url"] == "http://mirror.spam/page"]
    assert len(hot) == n // 2
    assert sorted(r["doc_id"] for r in hot if r["kept"]) == [1]
    cold_kept = sum(1 for r in out if r["kept"])
    assert cold_kept == n // 2 + 1


def test_url_blocklist_filter(spark):
    """Domain-blocklist semantics: exact-host block, subdomain-suffix
    block, longest-match specificity, and clean pass-through for
    unlisted hosts and non-URLs."""
    from smart_ocr_spark.functions import urls

    rows = [
        (0, "https://bad.example.org/x"),        # exact host entry
        (1, "https://a.b.bad.example.org/y"),    # deep subdomain of it
        (2, "https://www.bad.example.org/z"),    # matches TWO entries
        (3, "https://good.example.org/ok"),      # unlisted
        (4, "not a url"),                        # host '' — unlisted
        (5, "https://org/"),                     # bare TLD host
    ]
    bl = spark.createDataFrame(
        [("bad.example.org",), ("www.bad.example.org",), ("nope.net",)],
        "domain string",
    )
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = {r["doc_id"]: r for r in urls.url_blocklist_filter(df, bl).collect()}
    assert len(out) == len(rows)
    assert out[0]["blocked"] and out[0]["matched_domain"] == "bad.example.org"
    assert out[1]["blocked"] and out[1]["matched_domain"] == "bad.example.org"
    # longest (most specific) entry wins when several match
    assert out[2]["matched_domain"] == "www.bad.example.org"
    for i in (3, 4, 5):
        assert not out[i]["blocked"] and out[i]["matched_domain"] is None


def test_url_blocklist_hot_domain_plan(spark):
    """Scale shape: one blocked domain carrying half a 10k-doc corpus.
    The subdomain match must be an equi-join (no BroadcastNestedLoop —
    the endswith theta-join trap) and the longest-match reduction a
    two-stage agg (partial_max, no Window)."""
    from smart_ocr_spark.functions import urls

    n = 10_000
    rows = [
        (i,
         f"http://m{i % 3}.spam.example.net/p" if i % 2
         else f"http://ok{i}.example.org/p")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"]).repartition(8)
    bl = spark.createDataFrame([("spam.example.net",)], "domain string")
    out_df = urls.url_blocklist_filter(df, bl)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "partial_max" in plan

    out = out_df.collect()
    assert len(out) == n
    assert sum(1 for r in out if r["blocked"]) == n // 2
    assert all(
        r["matched_domain"] == "spam.example.net"
        for r in out if r["blocked"]
    )


def test_perplexity_buckets(spark):
    """ccnet head/middle/tail: per-lang terciles, higher score = head;
    langs absent from a (sampled) cutoffs table fall to tail; shipped
    cutoffs are honored verbatim."""
    from smart_ocr_spark.functions import text_analysis as ta

    rows = [(i, "en", float(-i)) for i in range(9)]          # 0..-8
    rows += [(100 + i, "de", -10.0 * i) for i in range(9)]   # own scale
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, avg_logprob double"
    )
    out = {r["doc_id"]: r["bucket"]
           for r in ta.perplexity_buckets(scored).collect()}
    # en: scores 0..-8 -> head is the top third (>= tercile cutoffs)
    assert out[0] == out[1] == out[2] == "head"
    assert out[4] == "middle"
    assert out[7] == out[8] == "tail"
    # de buckets on ITS terciles, not en's
    assert out[100] == "head" and out[108] == "tail"

    # shipped-artifact path: explicit cutoffs honored; unknown lang -> tail
    cuts = spark.createDataFrame(
        [("en", -6.0, -2.0)], "lang string, cut_lo double, cut_hi double"
    )
    out2 = {r["doc_id"]: r["bucket"]
            for r in ta.perplexity_buckets(scored, cutoffs=cuts).collect()}
    assert out2[0] == "head" and out2[4] == "middle" and out2[8] == "tail"
    assert all(out2[100 + i] == "tail" for i in range(9))  # no de cutoffs

    # sampled-cutoff path runs and emits one row per input doc
    sampled = ta.perplexity_buckets(scored, sample_fraction=0.5)
    assert sampled.count() == len(rows)
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan

    # kwargs alongside explicit cutoffs are a caller bug, not a no-op
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sample_fraction"):
        ta.perplexity_buckets(scored, cutoffs=cuts, sample_fraction=0.5)


def test_perplexity_buckets_sentinel_scores(spark):
    """The full pipeline must drop unscoreable docs before bucketing:
    unigram_lm_scores coalesces empty docs to 0.0 — the MAXIMUM score
    (real log10 probs are negative) — which would otherwise inflate
    the cutoffs and bucket garbage as head."""
    from smart_ocr_spark.functions import text_analysis as ta

    # i junk hapax tokens per doc -> strictly decreasing avg logprob
    rows = [(i, "en",
             "the data table joins the data rows "
             + " ".join(f"zzqx{i}x{j}" for j in range(i)))
            for i in range(6)]
    rows += [(100 + i, "en", "   ") for i in range(6)]  # whitespace-only
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    scored = (
        ta.unigram_lm_scores(docs)
        .where("n_tokens > 0")
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    out = {r["doc_id"]: r["bucket"]
           for r in ta.perplexity_buckets(scored).collect()}
    # empty docs excluded entirely; real docs still split into terciles
    assert all(100 + i not in out for i in range(6))
    assert len(out) == 6 and set(out.values()) == {"head", "middle", "tail"}


def test_url_latest_revision(spark):
    """Freshness keeper: newest capture per canonical URL wins; ts
    ties break to the larger id; NULL ts loses to any non-NULL (and
    an all-NULL group falls back to max id); plan is the skew-safe
    agg+join shape (no Window, partial_max)."""
    from smart_ocr_spark.functions import urls

    rows = [
        (0, "http://a.example/p", 100),
        (1, "http://a.example/p/", 300),    # canonical-same, newest
        (2, "http://a.example/p#f", 200),
        (3, "http://b.example/q", 50),
        (4, "http://b.example/q", 50),      # ts tie -> larger id
        (5, "http://c.example/r", None),    # NULL loses...
        (6, "http://c.example/r", 10),      # ...to any non-NULL
        (7, "http://d.example/s", None),    # all-NULL group:
        (8, "http://d.example/s", None),    # max id wins
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts long")
    out_df = urls.url_latest_revision(df)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "partial_max" in plan

    out = {r["doc_id"]: r["kept"] for r in out_df.collect()}
    assert len(out) == len(rows)
    assert [i for i in (0, 1, 2) if out[i]] == [1]
    assert [i for i in (3, 4) if out[i]] == [4]
    assert [i for i in (5, 6) if out[i]] == [6]
    assert [i for i in (7, 8) if out[i]] == [8]


def test_pmi_collocations(spark):
    """PMI semantics: an exclusive pair ('zip codes' only ever
    co-occurring) outranks a frequent-but-promiscuous pair ('of the'
    where both words also appear elsewhere); the min_count floor drops
    rare pairs; plan is agg + TakeOrdered, no Window, no Python."""
    from smart_ocr_spark.functions import text_analysis as ta

    rows = [(i, "zip codes of the city of the state of the region")
            for i in range(6)]
    rows += [(100 + i, "of it and the") for i in range(6)]
    rows += [(200, "rare pair")]  # below min_count
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out_df = ta.pmi_collocations(df, min_count=5, top_k=50)
    out = out_df.collect()
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    assert ("rare", "pair") not in by_pair
    assert ("zip", "codes") in by_pair and ("of", "the") in by_pair
    assert by_pair[("zip", "codes")]["pmi"] > by_pair[("of", "the")]["pmi"]
    assert by_pair[("of", "the")]["c_bi"] == 18
    # top-k ordering is pmi desc then lexicographic
    pmis = [r["pmi"] for r in out]
    assert pmis == sorted(pmis, reverse=True)

    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_unigram_lm_scores(spark):
    """LM quality signal: common-word prose scores higher (less
    negative) than rare-token noise; OOV rate reflects vocabulary
    membership; empty docs score 0."""
    common = "the data the data the data the data"
    rows = [
        (0, common),
        (1, common),
        (2, "zzqx qqzv xvqz wqxz"),  # tokens occurring once each
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ta.unigram_lm_scores(df).collect()}
    assert out[0]["avg_logprob"] == out[1]["avg_logprob"]
    assert out[0]["avg_logprob"] > out[2]["avg_logprob"]
    assert out[0]["oov_rate"] == 0.0  # vocab covers everything here
    assert out[3]["n_tokens"] == 0 and out[3]["avg_logprob"] == 0.0

    # vocabulary truncation: with vocab_size=1 only the most frequent
    # token ('data' and 'the' tie at 8 each -> 'data' wins the asc
    # tie-break) stays in-vocab
    out1 = {r["doc_id"]: r for r in ta.unigram_lm_scores(
        df, vocab_size=1).collect()}
    assert out1[0]["oov_rate"] == 0.5  # 'the' is now OOV


def test_semantic_dedup_auto_k(spark, caplog):
    """VERDICT r4 #3: k=None derives k = ceil(n / (bucket_cap//2)) so
    the average cluster targets half the fan-in cap; the derivation is
    logged and the result covers every nonzero-norm vector."""
    import logging

    n = 300
    rows = [(i, [float((i * 37 + d * 11) % 97) for d in range(8)])
            for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with caplog.at_level(
        logging.INFO, logger="smart_ocr_spark.functions.similarity"
    ):
        out = similarity.semantic_dedup(
            df, k=None, iters=2, threshold=0.999, bucket_cap=200
        ).collect()
    assert any("derived k=3" in r.message for r in caplog.records)
    assert len(out) == n
    # cap headroom is the derivation's point: average cluster targets
    # cap/2, so a well-spread corpus engages no cap at all
    assert all(r["n_nbr_dropped"] == 0 for r in out)
    assert len({r["cluster"] for r in out}) <= 3


def test_semantic_dedup_skewed_cluster_drop_surfacing(spark, caplog):
    """VERDICT r4 #3: when one cluster exceeds bucket_cap (every
    vector identical — the degenerate embedding corpus), the fan-in
    cap engages, the recall cost is SURFACED in the n_nbr_dropped
    output column (not just logged), and dedup semantics survive:
    every row is covered, exactly the min id is kept."""
    import logging

    n, cap = 120, 32
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with caplog.at_level(
        logging.WARNING, logger="smart_ocr_spark.functions.similarity"
    ):
        out = similarity.semantic_dedup(
            df, k=1, iters=1, threshold=0.99, bucket_cap=cap
        ).collect()
    assert any("fan-in cap" in r.message for r in caplog.records)
    assert len(out) == n
    assert all(r["n_nbr_dropped"] == n - cap for r in out)
    kept = sorted(r["vec_id"] for r in out if r["kept"])
    assert kept == [0]  # min id canonical; nobody escapes dedup


def test_cache_scope_releases_executor_cache(spark):
    """VERDICT r4 #4: the bucketed-join operators pin() their shared
    intermediates; a multi-sweep curation job wrapping its sweeps in
    cache_scope() must leave the executor cache exactly as found —
    while WITHOUT a scope the session-lifetime fallback still holds."""
    from smart_ocr_spark.functions.cache import cache_scope

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()

    rows = [(i, f"document body number {i % 9} with shared text")
            for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    vecs = spark.createDataFrame(
        [(i, [float((i * 3 + d) % 5) for d in range(4)]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    with cache_scope():
        dedup.simhash_near_pairs(docs, max_hamming=3).count()
        similarity.semantic_dedup(vecs, k=4, iters=1).count()
        assert not cm.isEmpty()  # pins live while the sweep runs
    assert cm.isEmpty()  # everything pinned in-scope released

    # no active scope -> documented session-lifetime fallback
    dedup.simhash_near_pairs(docs, max_hamming=3).count()
    assert not cm.isEmpty()
    spark.catalog.clearCache()


def test_semantic_dedup_semdedup_semantics(spark, embeddings):
    """SemDeDup composition: within each k-means cluster, near-identical
    vectors collapse to the minimum id; distinct clusters never compare;
    loners survive untouched."""
    out = {r["vec_id"]: r for r in similarity.semantic_dedup(
        embeddings, k=5, iters=2, threshold=0.999).collect()}
    labels = {r.vec_id: r.label for r in embeddings.collect()}

    assert len(out) == 14  # every nonzero-norm vector is covered
    # dedup happened: the tight label-clusters lose members
    assert sum(1 for r in out.values() if not r["kept"]) >= 6
    # the min-per-component invariant: every dropped vector has a KEPT
    # smaller-id vector in the SAME k-means cluster (its canonical)
    for v, r in out.items():
        if not r["kept"]:
            assert any(
                o["kept"] and o["cluster"] == r["cluster"] and w < v
                for w, o in out.items()
            ), (v, r)
    # the two loners are nobody's near-dup
    for v, l in labels.items():
        if l in (98, 99):
            assert out[v]["kept"]


# ---------------------------------------------------------------------------
# Bloom-filter incremental dedup tier
# ---------------------------------------------------------------------------


def _bloom_corpus(spark, n=400, dup_every=4):
    # every dup_every-th doc reuses an earlier body -> cross-slice dups
    rows = [
        (i, f"body {i - dup_every if i % dup_every == 0 and i >= dup_every else i} text")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bloom_incremental_matches_antijoin(spark):
    """The Bloom tier is plan-shape only: incremental_new_keys must
    return EXACTLY the anti-join rows (false positives confirmed away),
    on a corpus with planted cross-slice duplicates."""
    from smart_ocr_spark.functions import bloom

    docs = _bloom_corpus(spark)
    seen = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 3 == 0)
    got = bloom.incremental_new_keys(new, seen, "text", n_buckets=8)
    want = new.join(seen.select("text").distinct(), "text", "left_anti")
    g = sorted((r["doc_id"], r["text"]) for r in got.collect())
    w = sorted((r["doc_id"], r["text"]) for r in want.collect())
    assert g == w and len(g) > 0
    # the exact check ran only for Bloom candidates; with 1 MiB/bucket
    # over a few hundred keys the fpp is ~0, so candidates == true-dup
    # keys only -> every returned NEW row took the fast path
    assert not any(r["bloom_candidate"] for r in got.collect())


def test_bloom_fast_path_and_guarantee(spark):
    """maybe_seen=False is a GUARANTEE: no seen key may ever flag
    False; fresh keys overwhelmingly take the fast path."""
    from smart_ocr_spark.functions import bloom

    seen = spark.createDataFrame(
        [(i, f"seen body {i}") for i in range(500)], ["doc_id", "text"]
    )
    state = bloom.build_bloom_state(seen, "text", n_buckets=8)
    # probing the seen keys themselves: every row MUST flag maybe_seen
    replay = bloom.bloom_maybe_seen(seen, state, "text", n_buckets=8)
    assert replay.where(~F.col("maybe_seen")).count() == 0
    fresh = spark.createDataFrame(
        [(i, f"fresh body {i}") for i in range(500)], ["doc_id", "text"]
    )
    probed = bloom.bloom_maybe_seen(fresh, state, "text", n_buckets=8)
    # fpp at ~10 bits/key is well under 1%; allow slack for tiny-n noise
    assert probed.where(F.col("maybe_seen")).count() <= 10


def test_bloom_state_merge_equals_full_build(spark):
    """Epoch composition: OR-merging two half-history states equals
    building over the full history, bitmap-for-bitmap."""
    from smart_ocr_spark.functions import bloom

    docs = spark.createDataFrame(
        [(i, f"epoch body {i}") for i in range(300)], ["doc_id", "text"]
    )
    a = bloom.build_bloom_state(docs.where("doc_id < 150"), "text", n_buckets=4)
    b = bloom.build_bloom_state(docs.where("doc_id >= 150"), "text", n_buckets=4)
    merged = {r["bucket"]: r for r in bloom.merge_bloom_states(a, b).collect()}
    full = {r["bucket"]: r for r in bloom.build_bloom_state(docs, "text", n_buckets=4).collect()}
    assert set(merged) == set(full) == set(range(4))
    for bk in full:
        assert bytes(merged[bk]["bitmap"]) == bytes(full[bk]["bitmap"])
        assert merged[bk]["n_keys"] == full[bk]["n_keys"]


def test_bloom_empty_history(spark):
    """No history: everything is definitely new, nothing joins."""
    from smart_ocr_spark.functions import bloom

    new = spark.createDataFrame(
        [(i, f"first ever {i}") for i in range(50)], ["doc_id", "text"]
    )
    seen = new.where(F.lit(False))
    got = bloom.incremental_new_keys(new, seen, "text", n_buckets=4)
    rows = got.collect()
    assert len(rows) == 50
    assert not any(r["bloom_candidate"] for r in rows)


def test_pack_offsets_semantics(spark):
    """Sequence packing: within a group the tape is a cumulative sum
    over doc-id order, bin = start_offset // budget, and the layout is
    partition-independent (pure function of ids and token counts)."""
    from smart_ocr_spark.functions import packing

    rows = [(i, " ".join(f"w{j}" for j in range(3 + (i % 5)))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = packing.pack_offsets(df, budget=16, n_groups=4)
    got = {r.doc_id: r for r in packed.collect()}
    assert len(got) == 200

    # replay each group's tape by hand
    by_group: dict[int, list] = {}
    for r in sorted(got.values(), key=lambda r: r.doc_id):
        by_group.setdefault(r.group_id, []).append(r)
    assert set(by_group) <= set(range(4)) and len(by_group) == 4
    for rows_g in by_group.values():
        offset = 0
        for r in rows_g:  # already doc_id-ordered
            assert r.start_offset == offset
            assert r.bin_id == offset // 16
            offset += r.n_tokens

    # partition-independence: repartitioning must not move any doc
    again = {
        r.doc_id: r
        for r in packing.pack_offsets(
            df.repartition(13), budget=16, n_groups=4
        ).collect()
    }
    for i in got:
        assert (got[i].group_id, got[i].start_offset, got[i].bin_id) == (
            again[i].group_id,
            again[i].start_offset,
            again[i].bin_id,
        )

    with pytest.raises(ValueError):
        packing.pack_offsets(df, budget=0, n_groups=4)
    with pytest.raises(ValueError):
        packing.pack_offsets(df, budget=16, n_groups=0)


def test_pack_offsets_zero_token_docs_keep_position(spark):
    from smart_ocr_spark.functions import packing

    df = spark.createDataFrame(
        [(0, "a b c"), (1, ""), (2, "   "), (3, "d e")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in packing.pack_offsets(df, budget=4, n_groups=1).collect()}
    assert got[1].n_tokens == 0 and got[2].n_tokens == 0
    # zero-width docs occupy a tape position without advancing it
    order = sorted(got.values(), key=lambda r: r.doc_id)
    offset = 0
    for r in order:
        assert r.start_offset == offset
        offset += r.n_tokens


def test_packing_stats_overflow_bound(spark):
    """A bin overflows by AT MOST one document tail: bin_tokens minus
    the last doc's tail never exceeds the budget."""
    from smart_ocr_spark.functions import packing

    rows = [(i, " ".join(["w"] * (1 + (i * 7) % 23))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = packing.pack_offsets(df, budget=32, n_groups=2)
    stats = {(r.group_id, r.bin_id): r for r in packing.packing_stats(packed, 32).collect()}
    per_doc = sorted(packed.collect(), key=lambda r: (r.group_id, r.doc_id))
    last_in_bin: dict[tuple, int] = {}
    for r in per_doc:
        last_in_bin[(r.group_id, r.bin_id)] = r.n_tokens
    for key, st in stats.items():
        assert st.overflows == (st.bin_tokens > 32)
        # strip the single spill-over tail -> must fit the budget
        assert st.bin_tokens - (last_in_bin[key] if st.overflows else 0) <= 32
        assert float(st.fill_ratio) == pytest.approx(st.bin_tokens / 32.0, abs=1e-4)


def test_resample_to_mix_semantics(spark):
    """Mixture resampling: the binding class keeps everything, the mix
    approximates the recipe, unlisted classes are dropped, and the
    decision is deterministic under repartitioning."""
    from smart_ocr_spark.functions import sampling

    rows = (
        [(i, "web") for i in range(2000)]
        + [(10_000 + i, "code") for i in range(1000)]
        + [(20_000 + i, "papers") for i in range(100)]
        + [(30_000 + i, "junk") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.resample_to_mix(df, "source", {"web": 0.5, "code": 0.3, "papers": 0.2})
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "junk" not in counts
    # T = min(2000/.5, 1000/.3, 100/.2) = 500 -> papers binds, keeps all 100
    assert counts["papers"] == 100
    assert 0.5 * 500 * 0.7 < counts["web"] < 0.5 * 500 * 1.3
    assert 0.3 * 500 * 0.7 < counts["code"] < 0.3 * 500 * 1.3

    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in sampling.resample_to_mix(
            df.repartition(17), "source", {"web": 0.5, "code": 0.3, "papers": 0.2}
        ).collect()
    }
    assert a == b

    with pytest.raises(ValueError):
        sampling.resample_to_mix(df, "source", {})
    with pytest.raises(ValueError):
        sampling.resample_to_mix(df, "source", {"web": 0.4})  # sums to 0.4
    with pytest.raises(ValueError):
        sampling.resample_to_mix(df, "source", {"web": 1.5, "code": -0.5})


def test_line_dedup_within_doc(spark):
    """Within-doc line scrub: repeats drop, first occurrence stays in
    place, blank lines are structure and always survive."""
    from smart_ocr_spark.functions import dedup

    text = "\n".join(
        ["Cookie banner", "real content one", "", "Cookie banner",
         "real content two", "", "Cookie banner", "real content one"]
    )
    df = spark.createDataFrame([(1, text), (2, "only\nlines\nhere")], "doc_id long, text string")
    got = {r.doc_id: r for r in dedup.line_dedup_within_doc(df).collect()}
    assert got[1].n_lines == 8 and got[1].n_kept == 5
    assert got[1].cleaned_text == "\n".join(
        ["Cookie banner", "real content one", "", "real content two", ""]
    )
    assert got[2].n_kept == 3 and got[2].cleaned_text == "only\nlines\nhere"


def test_c4_clean_line_and_page_rules(spark):
    """Every published C4 rule on a hand-built page: terminal punct,
    min words, javascript lines; sentence floor, lorem ipsum, brace."""
    from smart_ocr_spark.functions import c4

    good = [
        "The first real sentence of the page is here.",
        "Another perfectly ordinary sentence follows it!",
        "Is this a question with enough words?",
        'He said "yes" and walked away saying "fine."',
        "A fifth sentence keeps the page above the floor.",
    ]
    page = good + [
        "no terminal punctuation on this line",
        "Tiny.",                                      # < 3 words
        "Please enable JavaScript to continue.",      # javascript rule
    ]
    rows = [
        (1, "\n".join(page)),
        (2, "\n".join(good) + "\nLorem Ipsum dolor sit amet."),
        (3, "\n".join(good) + "\nconst f = () => { return 1; };"),
        (4, "Too few sentences here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in c4.c4_clean(df).collect()}

    assert got[1].n_lines == 8 and got[1].n_kept == 5
    assert got[1].cleaned_text == "\n".join(good)
    # sentence count: 4 one-mark lines + the quoted line's '.' inside
    # quotes -> split on [.!?] counts every mark
    assert got[1].n_sentences >= 5 and got[1].page_keep

    assert got[2].has_lorem and not got[2].page_keep
    assert got[3].has_brace and not got[3].page_keep
    # the brace LINE also dies (no terminal mark after ';')
    assert got[3].n_kept == 5

    assert got[4].n_kept == 1 and got[4].n_sentences == 1
    assert not got[4].page_keep  # under the 5-sentence floor

    with pytest.raises(ValueError):
        c4.c4_clean(df, min_words=-1)


def test_shuffle_shards_is_reproducible_permutation(spark):
    """Global shuffle: every doc appears exactly once, shard positions
    are contiguous 1..n, assignment survives repartitioning, and the
    within-shard order is NOT the id order (it's a real shuffle)."""
    from smart_ocr_spark.functions import packing

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = packing.shuffle_shards(df, n_shards=8)
    rows = out.collect()
    assert len(rows) == 2000
    assert {r.doc_id for r in rows} == set(range(2000))

    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r)
    assert set(by_shard) == set(range(8))
    for shard_rows in by_shard.values():
        poss = sorted(r.pos for r in shard_rows)
        assert poss == list(range(1, len(shard_rows) + 1))
        # hash-uniform: no shard dominates
        assert len(shard_rows) < 2 * 2000 / 8
        ordered_ids = [r.doc_id for r in sorted(shard_rows, key=lambda r: r.pos)]
        assert ordered_ids != sorted(ordered_ids), "order must be shuffled"

    again = {
        (r.doc_id, r.shard_id, r.pos)
        for r in packing.shuffle_shards(df.repartition(13), n_shards=8).collect()
    }
    assert again == {(r.doc_id, r.shard_id, r.pos) for r in rows}

    with pytest.raises(ValueError):
        packing.shuffle_shards(df, n_shards=0)


def test_pack_shuffled_composes_shuffle_and_packing(spark):
    """pack_shuffled == shuffle_shards for (shard_id, pos), with the
    token tape accumulated in that shuffled order."""
    from smart_ocr_spark.functions import packing

    rows = [(i, " ".join(["w"] * (1 + i % 9))) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = {r.doc_id: r for r in packing.pack_shuffled(df, budget=32, n_shards=4).collect()}
    shuffled = {r.doc_id: r for r in packing.shuffle_shards(df, n_shards=4).collect()}
    assert len(packed) == 500
    for i in packed:
        assert (packed[i].shard_id, packed[i].pos) == (
            shuffled[i].shard_id,
            shuffled[i].pos,
        )
    # replay each shard's tape in pos order
    by_shard: dict[int, list] = {}
    for r in packed.values():
        by_shard.setdefault(r.shard_id, []).append(r)
    for shard_rows in by_shard.values():
        offset = 0
        for r in sorted(shard_rows, key=lambda r: r.pos):
            assert r.start_offset == offset
            assert r.bin_id == offset // 32
            offset += r.n_tokens

    with pytest.raises(ValueError):
        packing.pack_shuffled(df, budget=0, n_shards=4)
    with pytest.raises(ValueError):
        packing.pack_shuffled(df, budget=32, n_shards=0)


def test_dup_span_report_counts(spark):
    """Hand-built corpus: docs 1 and 2 share an 8-token sentence
    (every window of it is duplicated), doc 3 is unique, doc 4 is
    shorter than the window and must report zeros."""
    from smart_ocr_spark.functions import dedup

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, shared + " one two three"),          # 4 windows, 1 dup
        (2, "x y " + shared),                    # 3 windows, 1 dup
        (3, "a b c d e f g h i j"),              # 3 windows, 0 dup
        (4, "too short"),                        # no window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.dup_span_report(df, window=8).collect()}
    assert len(out) == 4
    assert (out[1].n_spans, out[1].n_dup_spans) == (4, 1)
    assert (out[2].n_spans, out[2].n_dup_spans) == (3, 1)
    assert (out[3].n_spans, out[3].n_dup_spans) == (3, 0)
    assert (out[4].n_spans, out[4].n_dup_spans, out[4].dup_span_frac) == (
        0, 0, 0.0,
    )
    assert out[1].dup_span_frac == 0.25

    with pytest.raises(ValueError):
        dedup.dup_span_report(df, window=0)
    with pytest.raises(ValueError):
        dedup.dup_span_report(df, window=8, stride=0)


def test_dup_span_report_corpus_wide_boilerplate(spark):
    """Adversarial hot key: the SAME 8-token span in every one of 2000
    docs (the worst case for any keeper/verdict shuffle). The report
    must still be exact — every doc's single window is duplicated —
    and within-doc repetition must count every occurrence."""
    from smart_ocr_spark.functions import dedup

    span = "all rights reserved by the site owner today"  # 8 tokens
    rows = [(i, span) for i in range(2000)]
    rows.append((9999, span + " " + span))  # 9 extra windows, all dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.dup_span_report(df, window=8)
    agg = out.groupBy().sum("n_spans", "n_dup_spans").first()
    assert agg["sum(n_spans)"] == 2000 + 9
    # the doubled doc's cross-boundary windows each appear only in it,
    # but the boundary windows recur WITHIN the doc pair-wise? No —
    # each boundary window is unique, yet occurs once in one doc only,
    # so exactly the pure spans are duplicated: 2000 + 2 occurrences
    doubled = {r.doc_id: r for r in out.collect()}[9999]
    assert doubled.n_spans == 9
    assert doubled.n_dup_spans == 2  # windows 1 and 9 == the span
    assert all(
        r.n_dup_spans == 1 for r in out.collect() if r.doc_id != 9999
    )


def test_dup_span_report_stride(spark):
    """stride=4 keeps only starts 1,5,9,...: span counts shrink but
    the duplicated verdict stays exact on the sampled windows."""
    from smart_ocr_spark.functions import dedup

    text = " ".join(f"w{i}" for i in range(16))  # 16 tokens
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in
           dedup.dup_span_report(df, window=8, stride=4).collect()}
    # starts 1, 5, 9 -> 3 windows per doc, all shared
    for i in (1, 2):
        assert (out[i].n_spans, out[i].n_dup_spans) == (3, 3)
        assert out[i].dup_span_frac == 1.0


# ---------------------------------------------------------------------------
# MinHash/LSH incremental near-dup tier
# ---------------------------------------------------------------------------


def _incr_corpus(spark):
    """History of long distinct docs; a new dump with (a) a near-dup of
    a history doc (long shared body + tiny suffix -> Jaccard >= 0.8),
    (b) an exact copy, (c) a SHORT doc sharing a short body (falls
    below the 0.8 floor -> must survive), (d) fresh docs."""
    body = lambda i: " ".join(f"tok{i}w{j}" for j in range(30))
    hist = [(i, body(i)) for i in range(20)]
    hist.append((20, "tiny shared body here"))
    new = [
        (100, body(3) + " small suffix"),          # near-dup -> drop
        (101, body(7)),                            # exact -> drop
        (102, "tiny shared body here and extra trailing words beyond"),
        (103, " ".join(f"fresh{j}" for j in range(25))),  # fresh -> keep
        (104, " ".join(f"novel{j}" for j in range(25))),  # fresh -> keep
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(new), mk(hist)


def test_minhash_incremental_semantics(spark):
    """Verified near-dups of history are dropped; short sub-threshold
    overlaps and fresh docs survive."""
    new, hist = _incr_corpus(spark)
    kept = {
        r.doc_id
        for r in dedup.minhash_incremental_new_docs(new, hist).collect()
    }
    assert 100 not in kept and 101 not in kept
    assert {102, 103, 104} <= kept
    spark.catalog.clearCache()


def test_minhash_incremental_stored_signatures(spark):
    """Passing the per-epoch stored history signature table must give
    byte-identical survivors to signing history inline — the artifact
    reuse path a rolling crawl ingestion depends on."""
    new, hist = _incr_corpus(spark)
    inline = sorted(
        r.doc_id
        for r in dedup.minhash_incremental_new_docs(new, hist).collect()
    )
    stored = dedup.minhash_signatures(hist)
    reused = sorted(
        r.doc_id
        for r in dedup.minhash_incremental_new_docs(
            new, hist, seen_sig=stored
        ).collect()
    )
    assert inline == reused
    spark.catalog.clearCache()


def test_minhash_incremental_empty_history(spark):
    """No history -> every new doc survives with columns intact."""
    new, hist = _incr_corpus(spark)
    out = dedup.minhash_incremental_new_docs(
        new, hist.where(F.lit(False))
    )
    assert sorted(r.doc_id for r in out.collect()) == [100, 101, 102, 103, 104]
    assert out.columns == new.columns
    spark.catalog.clearCache()


def test_cap_bucket_fanin_two_stage_byte_identical(spark):
    """The skew-safe salted cut must keep EXACTLY the cap smallest
    (resp. largest) ids of a degenerate bucket — byte-identical to the
    single-window semantics — while small buckets pass untouched."""
    from smart_ocr_spark.functions.similarity import _cap_bucket_fanin

    rows = [(i, "hot") for i in range(5000)] + [
        (10_000 + i, "cold") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, bucket string")
    for desc in (False, True):
        capped, dropped = _cap_bucket_fanin(df, "vec_id", 50, "t", desc=desc)
        got = sorted(
            r.vec_id for r in capped.where("bucket = 'hot'").collect()
        )
        want = sorted(range(4950, 5000) if desc else range(50))
        assert got == want, (desc, got[:5], got[-5:])
        assert dropped == 4950
        # the cold bucket is under the cap: every row survives
        assert capped.where("bucket = 'cold'").count() == 10


def test_cap_bucket_fanin_fast_path_untouched(spark):
    """No oversized bucket -> the input frame is returned as-is (the
    join plan must stay identical to the unguarded one)."""
    from smart_ocr_spark.functions.similarity import _cap_bucket_fanin

    df = spark.createDataFrame(
        [(i, f"b{i % 7}") for i in range(100)], "vec_id long, bucket string"
    )
    capped, dropped = _cap_bucket_fanin(df, "vec_id", 50, "t")
    assert dropped == 0 and capped is df


# ---------------------------------------------------------------------------
# Perceptual image hashing (aHash) near-dup
# ---------------------------------------------------------------------------


def _raw_media(spark):
    """Raw 8-bit grayscale bitmaps: a base gradient image, a 1-pixel
    perturbation of it (near-dup), an unrelated noise image, and a
    short payload exercising the zero-pad path."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = bytes(range(64))
    near = bytes([40]) + base[1:]
    noise = bytes(rng.randint(0, 256, 64, dtype=np.uint8).tolist())
    rows = [
        ("img://base", "image", base),
        ("img://near", "image", near),
        ("img://noise", "image", noise),
        ("img://short", "image", b"\x01\x02"),
    ]
    return spark.createDataFrame(
        rows, "url string, media_type string, payload binary"
    )


def test_image_ahash64_real_raw_path(spark):
    """The raw-grayscale decoder is REAL: hashes must equal the numpy
    reference computed outside Spark, byte for byte."""
    import numpy as np

    df = _raw_media(spark)
    got = {r.url: r.ahash64 for r in multimodal.image_ahash64(df).collect()}
    for r in df.collect():
        grid = multimodal.decode_raw_gray(bytes(r.payload))
        assert got[r.url] == multimodal._ahash64(grid), r.url
    # 1-pixel perturbation: small hamming vs base, noise is far
    h = lambda a, b: bin((got[a] ^ got[b]) & (2**64 - 1)).count("1")
    assert h("img://base", "img://near") <= 3
    assert h("img://base", "img://noise") > 8


def test_image_ahash_near_pairs_blocking(spark):
    """Near-dup pairs surface through the chunk-blocked join; the
    unrelated image pairs with nothing."""
    pairs = multimodal.image_ahash_near_pairs(
        _raw_media(spark), max_hamming=3
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert ("img://base", "img://near") in got
    assert not any("noise" in a or "noise" in b for a, b in got)
    spark.catalog.clearCache()


def test_image_ahash_decoder_seam(spark):
    """decoder='fake' runs the codec-seam stand-in (real plumbing,
    deterministic output); a callable plugs in a custom decode; a bad
    decoder raises."""
    import numpy as np

    df = _raw_media(spark)
    fake = {r.url: r.ahash64 for r in
            multimodal.image_ahash64(df, decoder="fake").collect()}
    fake2 = {r.url: r.ahash64 for r in
             multimodal.image_ahash64(df, decoder="fake").collect()}
    assert fake == fake2 and len(fake) == 4  # deterministic
    flip = lambda b: 255 - multimodal.decode_raw_gray(b)
    inv = {r.url: r.ahash64 for r in
           multimodal.image_ahash64(df, decoder=flip).collect()}
    assert set(inv) == set(fake)
    with pytest.raises(ValueError):
        multimodal.image_ahash64(df, decoder="png")


def test_exact_dedup_keeps_null_text_rows(spark):
    """NULL-text docs must form one dedup group and keep the min-id
    row — a null-unsafe join would silently drop them all."""
    df = spark.createDataFrame(
        [(1, "body a"), (2, None), (3, "body a"), (4, None)],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dedup.exact_dedup(df).collect())
    assert kept == [1, 2]


def test_curation_funnel_null_text_gets_verdict(spark):
    """Every doc gets a verdict row, including NULL text (dropped by
    quality, never silently missing)."""
    from smart_ocr_spark.functions import curation

    df = spark.createDataFrame(
        [(1, "a genuinely fine sentence with several words here.", "en"),
         (2, None, "en")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in curation.curation_funnel(df).collect()}
    assert set(out) == {1, 2}
    assert not out[2].keep


def test_resample_to_mix_missing_class_raises(spark):
    from smart_ocr_spark.functions import sampling

    df = spark.createDataFrame(
        [(i, "web") for i in range(10)], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="absent"):
        sampling.resample_to_mix(
            df, "source", {"web": 0.5, "code": 0.5}
        )


def test_remove_dup_spans_semantics(spark):
    """Disjoint-block removal: a block recurring corpus-wide survives
    only at its global first (id, pos); tails never dedup; docs
    reconstruct in order."""
    blk = " ".join(f"b{j}" for j in range(8))          # one full block
    uniq = lambda d, i: " ".join(f"u{d}x{i}y{j}" for j in range(8))
    rows = [
        (1, blk + " " + uniq(1, 1) + " tail1 one"),
        (2, uniq(2, 1) + " " + blk + " tail2"),        # dup at pos 9
        (3, blk),                                      # whole doc dup
        (4, "short doc"),                              # tail only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.remove_dup_spans(df, window=8).collect()}
    # doc 1 holds the first occurrence: nothing removed
    assert out[1].n_removed_blocks == 0
    assert out[1].cleaned_text == rows[0][1]
    # doc 2 loses the dup block but keeps its unique block + tail
    assert out[2].n_removed_blocks == 1
    assert out[2].cleaned_text == uniq(2, 1) + " tail2"
    # doc 3 loses its only block -> empty
    assert out[3] .n_removed_blocks == 1 and out[3].cleaned_text == ""
    # doc 4: sub-window doc is all tail, untouched
    assert out[4].n_blocks == 0 and out[4].cleaned_text == "short doc"


def test_remove_dup_spans_no_dups_identity(spark):
    """A dup-free corpus reconstructs byte-identically (modulo the
    documented single-space token join)."""
    rows = [(i, " ".join(f"w{i}t{j}" for j in range(20))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.cleaned_text
           for r in dedup.remove_dup_spans(df, window=8).collect()}
    assert out == dict(rows)


def test_minhash_incremental_degenerate_history(spark):
    """10k identical history docs collapse into one band bucket; the
    capped history side must still catch an arriving exact copy (ONE
    surviving verified match suffices) and pass genuinely-new docs."""
    body = " ".join(f"boiler{j} plate{j}" for j in range(15))
    hist = spark.createDataFrame(
        [(i, body) for i in range(10_000)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100_000, body),
         (100_001, " ".join(f"novel{j} fresh{j}" for j in range(15)))],
        "doc_id long, text string",
    )
    kept = {
        r.doc_id
        for r in dedup.minhash_incremental_new_docs(
            new, hist, bucket_cap=64
        ).collect()
    }
    assert kept == {100_001}
    spark.catalog.clearCache()


def test_connected_components_paths_agree(spark):
    """The driver union-find fast path and the distributed propagation
    must produce identical (id, component_id) tables; chains exercise
    multi-hop merging."""
    from smart_ocr_spark.functions import components as C

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 4)],
        "doc_a long, doc_b long",
    )
    fast = sorted(
        (r.id, r.component_id)
        for r in C.connected_components(pairs).collect()
    )
    dist = sorted(
        (r.id, r.component_id)
        for r in C.connected_components(
            pairs, small_graph_edges=0
        ).collect()
    )
    assert fast == dist
    comp = dict(fast)
    assert comp[5] == comp[1] == 1          # chain 1-2-3-4-5 merged
    assert comp[22] == comp[20] == 20
    # string-keyed graphs keep their id type on the fast path too
    spairs = spark.createDataFrame(
        [("u/a", "u/b"), ("u/b", "u/c"), ("u/x", "u/y")],
        "doc_a string, doc_b string",
    )
    srows = C.connected_components(spairs)
    assert dict(srows.dtypes)["id"] == "string"
    got = {r.id: r.component_id for r in srows.collect()}
    assert got["u/c"] == "u/a" and got["u/y"] == "u/x"


def test_bigram_lm_stupid_backoff(spark):
    """In-model bigrams score the exact MLE; unseen bigrams take
    0.4 x the smoothed unigram probability; short docs score 0."""
    import math

    rows = [
        (1, "the cat sat"), (2, "the cat ran"), (3, "the cat sat"),
        (4, "dog"), (5, "zebra quokka"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in ta.bigram_lm_scores(
        df, bigram_size=2, vocab_size=100).collect()}
    # top-2 bigrams: ('the','cat') c=3 and ('cat','sat') c=2
    # doc 1: both bigrams in model: log10(3/3) + log10(2/3)
    want1 = round((math.log10(3 / 3) + math.log10(2 / 3)) / 2, 4)
    assert out[1].avg_logprob == want1
    assert out[1].bigram_hit_rate == 1.0
    # doc 5: bigram unseen -> backoff to 0.4 * smoothed unigram of
    # 'quokka' (c=1, N=12 tokens, V=7 distinct)
    want5 = round(math.log10(0.4) + math.log10((1 + 1) / (12 + 7)), 4)
    assert out[5].avg_logprob == want5
    assert out[5].bigram_hit_rate == 0.0
    # single-token doc: no bigrams
    assert out[4].n_bigrams == 0 and out[4].avg_logprob == 0.0


def test_frame_ahash_near_pairs(spark):
    """Raw grayscale tapes: repeated frames within a tape and shared
    frames across tapes surface as near-dup pairs; distinct frames
    don't."""
    import numpy as np

    rng = np.random.RandomState(3)
    still = bytes(range(64))                       # a repeated "shot"
    noise = lambda: bytes(rng.randint(0, 256, 64, dtype=np.uint8).tolist())
    tape_a = still + noise() + still               # frames 0,1,2
    tape_b = noise() + still                       # frames 0,1
    rows = [("v://a", "video", tape_a), ("v://b", "video", tape_b)]
    df = spark.createDataFrame(
        rows, "url string, media_type string, payload binary"
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in multimodal.frame_ahash_near_pairs(df).collect()
    }
    assert ("v://a#0", "v://a#2") in pairs          # intra-tape repeat
    assert ("v://a#0", "v://b#1") in pairs          # cross-tape match
    assert not any("a#1" in a or "a#1" in b for a, b in pairs)
    spark.catalog.clearCache()


def test_bloom_maybe_seen_multi_epoch_state_union(spark):
    """ADVICE r5: a multi-epoch state UNION passed without
    merge_bloom_states must still probe EVERY epoch's bitmap — a seen
    key flagging maybe_seen=False would leak duplicates past the exact
    confirm while advertising an exact result."""
    from smart_ocr_spark.functions import bloom

    docs = spark.createDataFrame(
        [(i, f"epoch body {i}") for i in range(300)], ["doc_id", "text"]
    )
    a = bloom.build_bloom_state(docs.where("doc_id < 150"), "text", n_buckets=4)
    b = bloom.build_bloom_state(docs.where("doc_id >= 150"), "text", n_buckets=4)
    stacked = a.unionByName(b)  # two state rows per bucket, NOT merged
    replay = bloom.bloom_maybe_seen(docs, stacked, "text", n_buckets=4)
    # the Bloom guarantee must hold across BOTH epochs' rows
    assert replay.where(~F.col("maybe_seen")).count() == 0
    # and incremental_new_keys stays exact with the stacked state:
    # every doc is in history, so none may come back as new (before
    # the fix, keys whose bitmap lived in the SECOND state row skipped
    # the exact confirm and leaked through as definitely-new)
    got = bloom.incremental_new_keys(
        docs, docs, "text", n_buckets=4, state=stacked
    )
    assert got.count() == 0


def test_paragraph_dedup_null_text_docs_survive(spark):
    """ADVICE r5: NULL-text docs must appear in the output (the 'every
    input doc must appear' contract) — posexplode(split(NULL)) emits
    zero rows and used to silently drop the doc."""
    rows = [(1, "real body\n\nmore body"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup.paragraph_dedup(df).collect()}
    assert set(got) == {1, 2, 3}
    # NULL behaves as "": one blank (non-content) paragraph
    assert got[2].n_paras == 1 and got[2].n_kept == 0
    assert got[2].cleaned_text == ""
    assert got[3].n_paras == 1 and got[3].n_kept == 0
    assert got[1].n_kept == 2


def test_line_dedup_null_text(spark):
    """ADVICE r5: NULL text behaves as '' instead of propagating NULL
    through n_lines/n_kept/cleaned_text."""
    from smart_ocr_spark.functions import dedup as dd

    df = spark.createDataFrame(
        [(1, None), (2, "a\na")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in dd.line_dedup_within_doc(df).collect()}
    assert got[1].n_lines == 1 and got[1].n_kept == 1
    assert got[1].cleaned_text == ""
    assert got[2].n_kept == 1


def test_c4_clean_null_text(spark):
    """ADVICE r5 (same NULL-propagation family): NULL text yields the
    empty-page verdict, not NULL flags."""
    from smart_ocr_spark.functions import c4

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = c4.c4_clean(df).collect()[0]
    assert r.n_lines == 1 and r.n_kept == 0
    assert r.page_keep is False and r.has_lorem is False
    assert r.cleaned_text == ""


def test_lm_bucket_cutoffs_default_is_sketch(spark):
    """VERDICT r5 weak #1: the DEFAULT cutoff path must never buffer a
    whole language on one reducer.  Pin: default aggregates with
    percentile_approx (bounded GK sketch, map-side partials); the
    exact interpolated percentile only appears under explicit
    exact=True (the fixture/oracle mode)."""
    import re

    from smart_ocr_spark.functions import text_analysis as ta

    n = 3000
    rows = [(i, "en", -float(i) / 100.0) for i in range(n)]
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, avg_logprob double"
    )

    dflt = ta.lm_bucket_cutoffs(scored)
    plan = dflt._jdf.queryExecution().executedPlan().toString()
    assert "percentile_approx" in plan
    assert "partial_percentile_approx" in plan  # map-side sketch merge
    assert not re.search(r"\bpercentile\(", plan)  # no unbounded gather

    exact = ta.lm_bucket_cutoffs(scored, exact=True)
    plan_x = exact._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"\bpercentile\(", plan_x)
    assert "percentile_approx" not in plan_x

    # behavior: at accuracy 10k over 3k rows the sketch is rank-exact;
    # its member-value cutoffs sit within one step of the interpolated
    # ones and the default path buckets ~n/3 per tercile
    (d,) = dflt.collect()
    (x,) = exact.collect()
    assert abs(d["cut_lo"] - x["cut_lo"]) <= 0.01 + 1e-9
    assert abs(d["cut_hi"] - x["cut_hi"]) <= 0.01 + 1e-9
    counts = {
        r["bucket"]: r["n"]
        for r in ta.perplexity_buckets(scored)
        .groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"head", "middle", "tail"}
    for b in counts:
        assert abs(counts[b] - n / 3) <= 2


def test_trigram_lm_backoff_chain(spark):
    """All three stupid-backoff paths value-pinned on a hand corpus:
    in-model trigram MLE, backoff x bigram MLE, backoff^2 x add-one
    unigram; Brants count pruning drops singleton trigrams even when
    the cap has room; <3-token docs take the 0.0 sentinel."""
    import math

    from smart_ocr_spark.functions import text_analysis as ta

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y z"), (3, "q r")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in ta.trigram_lm_scores(
            docs, min_count=2, bigram_size=1
        ).collect()
    }
    # corpus: N=11 tokens, V=8 distinct; kept trigram: (a,b,c) c=2 over
    # ctx c(a,b)=2; kept bigram model = top-1 = (a,b) with ctx c(a)=2
    lg = math.log10
    # doc1 trigrams: (a,b,c)x2 -> 0.0; (b,c,a) -> unigram path on 'a';
    # (c,a,b) -> bigram path on (a,b)
    exp1 = (
        0.0 + 0.0
        + (2 * lg(0.4) + lg((2 + 1) / 19.0))
        + (lg(0.4) + lg(2 / 2.0))
    ) / 4.0
    assert out[1].n_trigrams == 4
    assert out[1].trigram_hit_rate == 0.5
    assert out[1].bigram_hit_rate == 0.25
    assert out[1].avg_logprob == round(exp1, 4)
    # doc2: single trigram (x,y,z), pruned singleton, bigram (y,z) not
    # in the size-1 model -> backoff^2 unigram on 'z' (c_uni=1)
    exp2 = 2 * lg(0.4) + lg((1 + 1) / 19.0)
    assert out[2].n_trigrams == 1
    assert out[2].trigram_hit_rate == 0.0 and out[2].bigram_hit_rate == 0.0
    assert out[2].avg_logprob == round(exp2, 4)
    # doc3: <3 tokens -> sentinel
    assert out[3].n_trigrams == 0 and out[3].avg_logprob == 0.0


def test_perplexity_buckets_accept_trigram_scorer(spark):
    """VERDICT r5 #3 done-criterion: the bucketing op is scorer-
    agnostic — trigram stupid-backoff scores flow through the same
    head/middle/tail split (sentinel filter + per-lang cutoffs) as the
    unigram scores it was built against."""
    from smart_ocr_spark.functions import text_analysis as ta

    rows = [
        (i, "en", " ".join(f"w{j} w{j+1} common tail" for j in range(i + 3)))
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    scored = (
        ta.trigram_lm_scores(docs, min_count=1, trigram_size=500)
        .where(F.col("n_trigrams") > 0)  # sentinel filter, as with unigram
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    out = ta.perplexity_buckets(scored)
    rows_out = out.collect()
    assert len(rows_out) == 12
    buckets = {r["bucket"] for r in rows_out}
    assert buckets == {"head", "middle", "tail"}
    # exact mode flows through the same kwargs seam
    out_x = ta.perplexity_buckets(scored, exact=True)
    assert out_x.count() == 12
