"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one named DataFrame program per implemented
operator family from SURVEY.md §2 plus the training-data additions
(dedup / similarity / text analysis / multimodal); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible one.

Parity conventions (pinned so Spark and DuckDB value-hash identically):
  * money sums: per-row ``floor(x*100)`` → BIGINT cents, summed exactly
    (double summation order is engine-dependent; bigint sums are not).
  * doubles that must appear: derived from exact sums, rounded to 4.
  * windows: total-order sort keys covering every output column.
  * timestamps: emitted as ``unix_micros`` BIGINT, never raw timestamps.
  * tokens: ``filter(split(lower(text), '\\s+'), x -> x <> '')`` on both
    sides; 1-based indexing (element_at / DuckDB lists) for shingles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from smart_ocr_spark.functions.spread import spread_scan


# Lazy-DataFrame memo for the fixture tables: `spark.read.parquet`
# costs ~100ms of schema/file-index resolution per call, and the bench
# protocol rebuilds every query per rep — so each rep paid that
# planning cost again for an IDENTICAL immutable table.  The memo
# returns the same lazy frame (no data is cached — every action still
# scans the parquet); keyed by session identity, and the session
# object itself is held so a stopped session's id can never be reused
# by a live one.  Scale note: this is plan-construction caching only,
# valid for any immutable table.
_TABLE_MEMO: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}


def _is_stopped(session: SparkSession) -> bool:
    try:
        return session.sparkContext._jsc is None
    except Exception:
        return True


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), path)
    hit = _TABLE_MEMO.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    # miss: evict entries for stopped sessions so a test run that
    # builds and stops many sessions doesn't accumulate dead plans
    for k in [k for k, (s, _) in _TABLE_MEMO.items() if _is_stopped(s)]:
        _TABLE_MEMO.pop(k, None)
    df = spark.read.parquet(path)
    _TABLE_MEMO[key] = (spark, df)
    return df


def _ship(spark: SparkSession) -> None:
    from smart_ocr_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)


def _cents(col) -> F.Column:
    return F.floor(col * 100).cast("bigint")


def _wrapped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → the input_hint corpus shape (url, warc_ts,
    html BINARY, lang): deterministic HTML wrapping of the text column."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
            ),
            "UTF-8",
        ).alias("html"),
        F.col("lang"),
    )


# ---------------------------------------------------------------------------
# entry — flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full 5-phase extraction pipeline on sf0.001, rolled up
    per language (SURVEY.md §7.1 step 3)."""
    _ship(spark)
    from smart_ocr_spark.plans.extract_pipeline import run_extraction

    wrapped = _wrapped_docs(spark, "/root/testdata/sf0.001")
    res = run_extraction(spark, wrapped)
    return (
        res.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("status").startswith("success"), 1).otherwise(0)).alias(
                "n_success"
            ),
            F.sum(
                F.expr("cast(exists(attempts, a -> a.audit_passed) as int)")
            ).alias("n_audit_pass"),
            F.round(F.avg("total_chars"), 2).alias("avg_chars"),
            F.round(F.avg("agreement"), 4).alias("avg_agreement"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Relational operator queries (SURVEY.md §2 families on the TPC-H-ish tables)
# ---------------------------------------------------------------------------


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1/A5 aggregation rollup (audit/benchmark summary analog).
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_cents"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_anti_join_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1/O3 incremental-skip: left anti-join against the "completed" set
    # ('P' orders play the completed-checkpoint rows; customers without
    # one are the still-to-process set — non-degenerate at every sf).
    cust = _t(spark, sf_dir, "customer")
    done = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return cust.join(
        done, cust.c_custkey == done.o_custkey, "left_anti"
    ).select(
        "c_custkey", "c_name", _cents(F.col("c_acctbal")).alias("acctbal_cents")
    )


def q_window_first_passing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W2/J1 first-passing-attempt window (state.py:92-94 analog).
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 25)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    )


def q_argmax_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T1 consensus argmax (consensus.py:402-405 analog).
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), "l_linenumber", "l_partkey", "l_suppkey"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_partkey").alias("best_partkey"),
            _cents(F.col("l_extendedprice")).alias("best_price_cents"),
        )
    )


def q_topk_attempts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T2 top-3-by-score (consensus.py:444-445 analog).
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "l_returnflag",
            "rk",
            "l_orderkey",
            _cents(F.col("l_extendedprice")).alias("price_cents"),
        )
    )


def q_union_escalation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J7 escalation union with tier tagging (orchestrator.py:500-511).
    orders = _t(spark, sf_dir, "orders")
    hard = orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("hard").alias("tier"), _cents(F.col("o_totalprice")).alias("price_cents")
    )
    esc = orders.where(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000)
    ).select(
        "o_orderkey", F.lit("escalated").alias("tier"), _cents(F.col("o_totalprice")).alias("price_cents")
    )
    return hard.unionByName(esc)


def q_selfjoin_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J3 all-pairs agreement self-join keyed by document (url ↔ orderkey).
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(b, "l_orderkey").where(
        F.col("a.l_linenumber") < F.col("b.l_linenumber")
    )
    return pairs.groupBy(F.col("a.l_returnflag").alias("l_returnflag")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.avg(
                F.abs(
                    _cents(F.col("a.l_extendedprice"))
                    - _cents(F.col("b.l_extendedprice"))
                )
            ),
            4,
        ).alias("avg_absdiff_cents"),
    )


def q_ordered_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2 order-sensitive assembly concat (state.py:111-148 analog).
    li = _t(spark, sf_dir, "lineitem")
    sortable = F.expr(
        """
        named_struct(
          'ln', l_linenumber, 'pk', l_partkey, 'sk', l_suppkey,
          'pc', cast(floor(l_extendedprice*100) as bigint), 'qt', l_quantity)
        """
    )
    return (
        li.withColumn("s", sortable)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["pk"].cast("string")
                ),
                "|",
            ).alias("parts_concat"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_fanout_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1 chunk fan-out (core/chunker.py:29-108 analog; chunk size 10).
    part = _t(spark, sf_dir, "part")
    return (
        part.withColumn("n_chunks", F.ceil(F.col("p_size") / F.lit(10.0)).cast("int"))
        .select(
            "p_partkey",
            "p_size",
            # Spark sequence(1, 0) is DESCENDING [1, 0]; guard so empty
            # sizes drop the row like DuckDB's empty generate_series.
            F.explode(
                F.when(
                    F.col("n_chunks") >= 1,
                    F.sequence(F.lit(1), F.col("n_chunks")),
                ).otherwise(F.array())
            ).alias("chunk_id"),
        )
        .withColumn("chunk_start", (F.col("chunk_id") - 1) * 10 + 1)
        .withColumn("chunk_end", F.least(F.col("chunk_id") * 10, F.col("p_size")))
        .select("p_partkey", "chunk_id", "chunk_start", "chunk_end")
    )


def q_join_broadcast_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2/J6 small-dimension equi-joins — dims broadcast explicitly.
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_PRIORITY = {"error": 6, "purchase": 5, "signup": 4, "click": 3, "view": 2}


def _priority_col(c) -> F.Column:
    expr = F.lit(1)
    for k, v in sorted(_PRIORITY.items()):
        expr = F.when(c == k, F.lit(v)).otherwise(expr)
    return expr


def q_skew_twostage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 skew handling, oracle-verified: the salted two-stage
    aggregation (partial per (key, salt), merge per key) must equal the
    plain GROUP BY exactly. l_returnflag has 3 hot keys — every one
    crosses the hot threshold and gets spread over 16 salts."""
    from smart_ocr_spark.functions import skew

    _ship(spark)
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "cents", _cents(F.col("l_extendedprice"))
    )
    li = li.withColumn(
        "row_key",
        F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber")),
    )
    # row_key: per-row-unique salt discriminator — content hashing alone
    # cannot spread byte-identical duplicate rows of a hot key
    return skew.two_stage_agg(
        li, "l_returnflag", "cents", n_salts=16, hot_threshold=100,
        row_key="row_key",
    ).select("l_returnflag", "n", F.col("sum_cents"))


def q_classify_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q12 failure-mode priority classification (audit/scorer.py:82-151).
    ev = _t(spark, sf_dir, "events").withColumn(
        "priority", _priority_col(F.col("event_type"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("priority"), "event_type")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.max("priority").alias("max_priority"),
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("primary_mode"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_json_extract_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S7 JSON source parsing analog: extract a field from the JSON props
    # column and roll up per event type.
    ev = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("bigint")
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.min("k").alias("min_k"),
    )


def q_merge_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S6/O12 checkpoint upsert: latest state row per key wins.
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            _cents(F.col("value")).alias("last_value_cents"),
            # parquet timestamps surface as TIMESTAMP_NTZ; derive epoch
            # micros from NTZ fields directly (unix_date/hour/minute/
            # second/date_format involve no timezone for NTZ inputs) so
            # the result matches DuckDB's naive epoch_us on ANY host tz.
            (
                (
                    F.unix_date(F.col("ts").cast("date")).cast("bigint") * 86400
                    + F.hour("ts").cast("bigint") * 3600
                    + F.minute("ts").cast("bigint") * 60
                    + F.second("ts").cast("bigint")
                )
                * 1000000
                + F.date_format("ts", "SSSSSS").cast("bigint")
            ).alias("last_ts_us"),
        )
    )


def q_setop_untried(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U1/U2 untried-candidate set difference (repair.py:178-208).
    ev = _t(spark, sf_dir, "events")
    all_types = ev.select(
        F.array_sort(F.collect_set("event_type")).alias("all_types")
    )
    used = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("used")
    )
    return used.crossJoin(F.broadcast(all_types)).select(
        "user_id",
        F.array_join(F.array_except(F.col("all_types"), F.col("used")), ",").alias(
            "untried_csv"
        ),
        F.size("used").alias("n_used"),
    )


def q_score_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    # N14/N15 Levenshtein + NES scoring (benchmark/scorer.py:87-145).
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.alias("a")
    b = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("text_b")
    ).alias("b")
    return (
        a.join(b, "doc_id")
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1).alias("doc_b"),
            F.levenshtein(F.col("text"), F.col("text_b")).cast("bigint").alias("lev"),
            F.round(
                1
                - F.levenshtein(F.col("text"), F.col("text_b"))
                / F.greatest(F.length("text"), F.length("text_b")).cast("double"),
                4,
            ).alias("nes"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data queries (documents / embeddings)
# ---------------------------------------------------------------------------


def q_normalize_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-series normalization chain (normalizer.py:211-240 analogs) over
    deterministically-messed input: CRLF->LF, per-line trailing-space
    strip, 3+ blank-line collapse, smart-quote/dash mapping, outer trim.
    JVM regexp_replace chain — whole-stage codegen, no Python."""
    docs = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("“quoted” — dash’s\r\n\r\n\r\n\r\n  "),
        F.col("text"),
        F.lit("   \r\ntail   "),
    )
    c = messy
    c = F.regexp_replace(c, "\r\n", "\n")                      # N6 CRLF
    c = F.regexp_replace(c, "\r", "\n")                        # N6 CR
    c = F.regexp_replace(c, "[ \\t]+\\n", "\n")                # N11 trailing ws
    c = F.regexp_replace(c, "\\n{3,}", "\n\n")                 # N11 collapse
    c = F.translate(c, "‘’“”", "''\"\"")   # N10 quotes
    c = F.regexp_replace(c, "—", "--")                    # N10 em-dash
    c = F.trim(c)
    return docs.select("doc_id", c.alias("normalized"))


def q_audit_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-series audit battery (audit/heuristics.py:85-221) as pure column
    algebra over documents.text: word-count floor (Q6), avg-word-length
    band (Q8), garbage ceiling (Q9), refusal regex (Q2), verdict."""
    docs = _t(spark, sf_dir, "documents")
    text = F.col("text")
    from smart_ocr_spark.functions.text_analysis import tokens_col

    words = tokens_col(text)
    wc = F.size(words).cast("bigint")
    nonspace = F.length(F.regexp_replace(text, "[ \\t\\n\\x0B\\f\\r]", ""))
    awl = F.round(
        F.when(wc > 0, nonspace / wc.cast("double")).otherwise(F.lit(0.0)), 4
    )
    garbage = F.round(
        F.when(
            F.length(text) > 0,
            F.length(
                F.regexp_replace(
                    text, "[a-zA-Z0-9 \\t\\n\\x0B\\f\\r.,;:!?'\"()-]", ""
                )
            )
            / F.length(text).cast("double"),
        ).otherwise(F.lit(1.0)),
        4,
    )
    refusal = F.lower(text).rlike("i cannot|i can't|unable to process|as an ai")
    passed = (
        (wc >= 50)
        & (awl >= 2.0)
        & (awl <= 15.0)
        & (garbage <= 0.15)
        & ~refusal
    )
    return docs.select(
        "doc_id",
        wc.alias("word_count"),
        awl.alias("avg_word_len"),
        garbage.alias("garbage_ratio"),
        refusal.cast("boolean").alias("refusal_hit"),
        passed.cast("boolean").alias("audit_passed"),
    )


def q_calibration_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 calibration profiles (benchmark/calibrate.py:155-287): two-level
    rollup per (lang, source) with exact-sum-derived averages."""
    docs = _t(spark, sf_dir, "documents")
    from smart_ocr_spark.functions.text_analysis import tokens_col

    toks = tokens_col(F.col("text"))
    return (
        docs.withColumn("wc", F.size(toks).cast("bigint"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("wc").alias("total_words"),
            F.round(F.sum("wc") / F.count(F.lit(1)).cast("double"), 4).alias(
                "avg_words"
            ),
            F.sum(F.when(F.col("wc") >= 50, 1).otherwise(0)).alias("n_pass_floor"),
        )
    )


def q_latex_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N19 LaTeX block extraction (reconciler.py:137-192 analog):
    regexp_extract_all over display-math spans planted deterministically
    around each document's first token."""
    docs = _t(spark, sf_dir, "documents")
    latexy = F.concat(
        F.lit("intro $$x_"),
        F.col("doc_id").cast("string"),
        F.lit(" + y$$ middle text $$\\frac{a}{"),
        F.col("doc_id").cast("string"),
        F.lit("}$$ tail"),
    )
    blocks = F.expr(r"regexp_extract_all(latexy, '\\$\\$(.*?)\\$\\$', 1)")
    return docs.select(
        "doc_id", latexy.alias("latexy")
    ).select(
        "doc_id",
        F.size(blocks).alias("n_blocks"),
        F.array_join(blocks, "|").alias("blocks_csv"),
    )


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    return ta.with_token_stats(_t(spark, sf_dir, "documents")).select(
        "doc_id", "token_count", "bpe_token_count", "char_count",
        "avg_token_len"
    )


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    return ta.with_lang_id(_t(spark, sf_dir, "documents")).select(
        "doc_id", "score_zh", "score_en", "score_es", "score_de", "score_fr",
        "predicted_lang",
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    return ta.with_quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "garbage_ratio", "punct_ratio", "stopword_ratio", "quality_score"
    )


def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (training-data curation): the synthetic corpus has
    no natural PII, so each doc gets a deterministic planted suffix
    (doc-keyed email, a phone, an IP) — the scrub must redact exactly
    those and report per-kind match counts.  All JVM regexp_replace."""
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call (555) 123-4567; host 192.168.0."),
            F.pmod(F.col("doc_id"), F.lit(250)).cast("string"),
            F.lit(" ."),
        ),
    )
    return ta.with_pii_redaction(docs).select(
        "doc_id", "redacted", "n_email", "n_ipv4", "n_phone"
    )


def q_quality_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation end product: docs surviving the quality floor +
    token floor + language allowlist, with the metrics that kept them."""
    from smart_ocr_spark.functions import curation

    _ship(spark)
    return curation.quality_keep_list(
        _t(spark, sf_dir, "documents"),
        min_quality=0.45,
        min_tokens=20,
        langs=["en", "de", "es"],
    )


# Demoted from the 50-entry driver registry in round 4 (the driver
# verifies at most 50 queries/round — VERDICT r3 #3): bag fingerprint,
# simhash16, and label centroids stay pytest-pinned
# (tests/test_functions.py) and their oracle SQL lives in git history
# (green in CORRECTNESS_r03); the freed slots carry figures_embed_text
# and keep multimodal_meta / text_winnow_fingerprint inside the cap.


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, Table A1):
    duplicate-line / duplicate-paragraph fractions (count + char share)
    and the top word-2-gram character share, with the published
    thresholds as the ``repetitive`` verdict.  One (doc, unit) shuffle;
    partial aggregation absorbs repetitive-doc skew map-side."""
    from smart_ocr_spark.functions import repetition

    _ship(spark)
    return repetition.with_repetition_metrics(_t(spark, sf_dir, "documents"))


def _planted_url_col():
    """Deterministic messy URL per doc (the synthetic corpus has no
    real URLs): pairs (2k, 2k+1) differ only in case, default port,
    trailing slash, tracking params, param order, and fragment — the
    exact junk canonicalization must collapse."""
    k = (F.col("doc_id") / 2).cast("bigint")
    return F.concat(
        F.lit("https://Site"), (k % 50).cast("string"),
        F.lit(".Example.ORG"),
        F.when(F.col("doc_id") % 4 == 1, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Articles/item"), k.cast("string"),
        F.when(F.col("doc_id") % 2 == 1, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 1,
            F.concat(F.lit("?utm_source=feed&id="), k.cast("string"),
                     F.lit("&b=2")),
        ).otherwise(F.concat(F.lit("?b=2&id="), k.cast("string"))),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("#sec"), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
    )


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation end product: quality floor → Gopher
    repetition filter → exact-content dedup, reported as stage-survival
    counts (the no-silent-caps rollup for the funnel a training-data
    pipeline actually ships)."""
    from smart_ocr_spark.functions import curation

    _ship(spark)
    fun = curation.curation_funnel(
        _t(spark, sf_dir, "documents"), langs=["en", "de", "es"]
    )
    return curation.funnel_report(fun)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: the k-means assignment the
    kmeans oracle already derives, within-cluster exact cosine pairs,
    recursive components, min-id keep — the oracle composes the SAME
    Lloyd CTEs with an N^2-within-cluster pair graph and a recursive
    reachability fixpoint."""
    from smart_ocr_spark.functions import similarity

    _ship(spark)
    return similarity.semantic_dedup(
        _t(spark, sf_dir, "embeddings"), k=8, iters=2, threshold=0.95
    )


def q_text_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ccnet-analog LM quality signal: corpus-trained unigram model
    (top-500 vocabulary so the truncation tie-break is exercised),
    add-one smoothing, per-doc average log10 probability + OOV rate."""
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    return ta.unigram_lm_scores(
        _t(spark, sf_dir, "documents"), vocab_size=500
    )


def q_lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ccnet head/middle/tail split: per-lang exact tercile cutoffs
    over the unigram-LM scores, higher log-prob = head.  The oracle
    re-derives the scores, the per-lang quantile_cont cutoffs, and
    the CASE bucketing — interpolated percentiles are pure IEEE
    arithmetic over the round(…,4)-ed scores, so the compare is
    exact."""
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    # n_tokens > 0: empty docs carry the 0.0 sentinel score (the max —
    # real log10 probs are negative) and would inflate the cutoffs and
    # bucket as head; ccnet drops unscoreable docs before bucketing
    scored = (
        ta.unigram_lm_scores(docs, vocab_size=500)
        .where(F.col("n_tokens") > 0)
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    # exact=True is the explicit fixture/oracle mode (interpolated
    # percentile, bit-identical to DuckDB quantile_cont); the library
    # DEFAULT is the approx_percentile sketch, which never buffers a
    # whole language on one reducer
    return ta.perplexity_buckets(scored, exact=True)


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    bag models on target (lang='en') vs the raw pool; per-doc log10
    likelihood ratio.  512 buckets so hash collisions are exercised at
    fixture scale."""
    from smart_ocr_spark.functions import selection

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    return selection.dsir_importance(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=512
    )


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed NB log-odds quality classifier (fastText-style gate in
    its deterministic Naive-Bayes form): train on a 30% md5-sampled
    labeled slice (proxy label lang='en'), score the WHOLE corpus —
    the train/apply split is visible in the plan (model ≤512 rows,
    broadcast)."""
    from smart_ocr_spark.functions import sampling, selection

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    labeled = docs.where(
        sampling.sample_hash_col(F.col("doc_id").cast("string"), "lbl")
        < F.lit(int(0.3 * sampling.HASH_SPACE))
    ).withColumn("label", F.col("lang") == F.lit("en"))
    return selection.nb_classifier_scores(docs, labeled, n_buckets=512)


def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard sequence packing: docs land on a per-group
    virtual token tape (8 hash-uniform groups), bin = start_offset //
    512-token budget.  Window key is the UNIFORM group hash — balanced
    partitions by construction."""
    from smart_ocr_spark.functions import packing

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    return packing.pack_offsets(docs, budget=512, n_groups=8)


def q_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture resampling: downsample to a
    50/30/20 mix over three sources at the largest feasible total;
    hash-threshold per class, classes outside the recipe dropped."""
    from smart_ocr_spark.functions import sampling

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    out = sampling.resample_to_mix(
        docs, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    )
    return out.select("doc_id", "source", "n_chars")


def q_dedup_doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc line dedup (map-only boilerplate scrub): a cookie-
    banner line is planted twice in every doc; dedup keeps the first
    occurrence in place and the counts expose the removal."""
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nWe use cookies on this site\nContact us"
                  "\nWe use cookies on this site"),
        ).alias("text"),
    )
    return dedup.line_dedup_within_doc(docs)


def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning recipe (Raffel et al. 2020): planted suffix lines
    exercise every line rule (terminal punct, min words, javascript)
    and hash-free doc_id moduli vary the page flags (lorem on 1/7 of
    docs, curly brace on 1/11)."""
    from smart_ocr_spark.functions import c4

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nThis line ends with a terminal mark and enough words."
                  "\nno terminal punctuation here"
                  "\nEnable Javascript to view this content."
                  "\nTiny."),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("\nLorem ipsum dolor sit amet, consectetur."),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit("\nfunction f() { return 1; }"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return c4.c4_clean(docs)


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: 16 hash-uniform shards,
    within-shard order by an independent hash — a reproducible full
    permutation of the corpus."""
    from smart_ocr_spark.functions import packing

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    return packing.shuffle_shards(docs, n_shards=16)


def q_shard_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final shard assembly: shuffle + token-tape packing in ONE
    window pass (row_number and the running token sum share a window
    spec — single exchange on the hash-uniform shard id)."""
    from smart_ocr_spark.functions import packing

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    return packing.pack_shuffled(docs, budget=512, n_shards=16)


def q_dup_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate-span report (Lee et al. 2022 grain):
    a shared 10-token sentence is planted on every 5th doc, so those
    docs must report its 8-token windows as cross-doc duplicated;
    naturally-recurring spans in the synthetic text count too."""
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit(" the quick brown fox jumps over"
                      " the lazy sleeping dog"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return dedup.dup_span_report(docs, window=8)


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ccnet-style corpus-wide paragraph dedup: every doc gets a planted
    shared boilerplate paragraph appended — after dedup exactly ONE doc
    (the corpus-first occurrence) keeps it, every other doc reassembles
    without it, and the per-doc counts expose the removal."""
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\n\nSubscribe to our newsletter for updates today"),
        ).alias("text"),
    )
    return dedup.paragraph_dedup(docs)


def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + first-id-wins dedup (the cheapest
    web-corpus dedup tier, run before any content pass): each doc gets
    a deterministically-messy planted URL; the oracle re-derives the
    same canonicalization with its own regexp chain, so any drift in
    scheme/host casing, port, slash, tracking-param, ordering, or
    fragment handling breaks the match."""
    from smart_ocr_spark.functions import urls

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _planted_url_col().alias("url")
    )
    return urls.url_dedup_keep_list(docs)


def q_dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter incremental dedup tier (Dolma-style): docs with
    doc_id %% 3 == 0 are the arriving dump, the rest are history; the
    op returns exactly the rows whose TEXT never appeared in history —
    the Bloom filter only reshapes the plan (definite-new rows skip
    the exact anti-join), never the result, so the plain anti-join is
    the oracle.  bloom_candidate is plan metadata (which rows needed
    the exact check) and is excluded from the compare."""
    from smart_ocr_spark.functions import bloom

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    seen = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 3 == 0)
    out = bloom.incremental_new_keys(new, seen, "text", n_buckets=16)
    return out.select("doc_id", "lang", "n_chars")


def q_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH incremental near-dup tier (the near-dup analog of
    the Bloom exact tier): docs with doc_id % 3 == 0 are the arriving
    dump, the rest are history.  Every 6th doc's text is replaced by
    its successor doc's text plus a short suffix — a planted NEAR-dup
    of a history doc that LSH must catch and verification must confirm
    (short donors fall below the 0.8 Jaccard floor and survive, so
    both branches of the verify step are exercised)."""
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    donors = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("text").alias("donor_text"),
    )
    new = (
        docs.where(F.col("doc_id") % 3 == 0)
        .join(donors, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 6 == 0) & F.col("donor_text").isNotNull(),
                F.concat(
                    F.col("donor_text"), F.lit(" incremental dump suffix")
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    hist = docs.where(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    kept = dedup.minhash_incremental_new_docs(new, hist, threshold=0.8)
    return kept.select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars")
    )


def q_media_frame_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-grain aHash near-dup over raw grayscale tapes: each doc's
    printable-ASCII text IS the tape (64 bytes per frame), so repeated
    documents/prefixes surface as cross-tape frame matches.  Same
    banding-recall semantics as media_ahash_neardup; the oracle mirrors
    pixels, mean, packing, and the chunk join at frame grain."""
    from smart_ocr_spark.functions import multimodal

    _ship(spark)
    media = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("tape://"), F.col("doc_id")).alias("url"),
        F.encode(
            F.regexp_replace(F.col("text"), "[^ -~]", ""), "UTF-8"
        ).alias("payload"),
    )
    pairs = multimodal.frame_ahash_near_pairs(media, max_hamming=2)
    return pairs.select(
        F.col("doc_a").alias("frame_a"),
        F.col("doc_b").alias("frame_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM scoring with stupid backoff, trained on the corpus
    itself; bigram_size=2000 keeps a real backoff population at oracle
    scale so BOTH scoring paths (in-model MLE and backoff×unigram) are
    value-checked."""
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    return ta.bigram_lm_scores(
        _t(spark, sf_dir, "documents"), bigram_size=2000
    )


_WARC_FIXTURE_DIR: list[str] = []


def _warc_fixture_dir() -> str:
    """One fixture dir per process, removed at interpreter exit."""
    import atexit
    import shutil
    import tempfile

    if not _WARC_FIXTURE_DIR:
        d = tempfile.mkdtemp(prefix="smart_ocr_spark_warc_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _WARC_FIXTURE_DIR.append(d)
    return _WARC_FIXTURE_DIR[0]


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion, driver-visible (VERDICT r5 #6): a deterministic
    synthetic Common-Crawl-style WARC fixture — one gzip-member
    response record per document, mtime pinned — is written from the
    documents table, parsed back through the streaming WARC source
    (sources/warc.py), and reduced to a SQL-comparable shape.  The
    oracle re-derives the identical rows from the documents table
    directly, so the compare checks header parse (URI, date), HTTP
    envelope strip, multi-member gunzip, and UTF-8 payload fidelity.

    The collect here is FIXTURE GENERATION (bounded: the sf table),
    not the operator — the parse itself is the distributed path, one
    task per shard."""
    import datetime as _dt
    import os
    import tempfile

    from smart_ocr_spark.sources import warc as warcmod

    _ship(spark)
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    epoch = _dt.datetime(2026, 1, 1)
    # per-PROCESS fixture dir, created once and removed at exit: unique
    # per process so a concurrently-running second session (bench +
    # driver overlap) never reads a half-written fixture, reused within
    # the process so repeated invocations (driver's 50-query sweep,
    # pytest parametrization) don't accumulate corpus-sized /tmp
    # litter; one subdir per sf so frames over different scale factors
    # never overwrite each other's shards — keyed by a hash of the FULL
    # normalized path (ADVICE r6: two sf dirs sharing a basename under
    # different parents must not share a fixture dir, or the lazily-
    # read glob of the first frame could silently serve the second
    # sf's overwritten shards)
    import hashlib as _hashlib

    fix_dir = os.path.join(
        _warc_fixture_dir(),
        _hashlib.md5(
            os.path.abspath(os.path.normpath(sf_dir)).encode()
        ).hexdigest()[:16],
    )
    os.makedirs(fix_dir, exist_ok=True)
    n_shards = 4
    shards: list[list[tuple[str, str, bytes]]] = [[] for _ in range(n_shards)]
    for r in docs:
        did = int(r["doc_id"])
        ts = (epoch + _dt.timedelta(seconds=did)).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
        shards[did % n_shards].append(
            (
                f"http://doc{did}.example/item",
                ts,
                (r["text"] or "").encode("utf-8"),
            )
        )
    for i, recs in enumerate(shards):
        warcmod.write_warc_file(
            os.path.join(fix_dir, f"shard-{i:05d}.warc.gz"),
            recs,
            compress=True,
        )
    parsed = warcmod.warc_to_corpus(spark, os.path.join(fix_dir, "*.warc.gz"))
    return parsed.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.decode("html", "UTF-8").alias("text"),
        F.length("html").cast("bigint").alias("n_bytes"),
    )


def q_warc_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed WET-style WARC WRITER, driver-visible: the corpus
    (url/ts/text derived deterministically from documents) is written
    as conversion-record gzip shards by the range-partitioned
    one-shard-per-task writer (`sources/warc.py:corpus_to_warc`) and
    parsed back through the streaming reader; the oracle re-derives
    the rows from documents directly, so the compare pins the full
    write→read loop (record assembly, per-member gzip, atomic shard
    rename, multi-shard parse) at the value grain."""
    import datetime as _dt
    import os

    from smart_ocr_spark.sources import warc as warcmod

    _ship(spark)
    epoch = _dt.datetime(2026, 1, 1)
    corpus = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("http://doc"), F.col("doc_id"),
                 F.lit(".example/item")).alias("url"),
        (F.lit(epoch.isoformat()).cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))
         ).alias("warc_ts"),
        F.col("text"),
    )
    # full-path hash key, same rationale as q_warc_roundtrip (ADVICE r6)
    import hashlib as _hashlib

    out_dir = os.path.join(
        _warc_fixture_dir(),
        "wet-"
        + _hashlib.md5(
            os.path.abspath(os.path.normpath(sf_dir)).encode()
        ).hexdigest()[:16],
    )
    warcmod.corpus_to_warc(corpus, out_dir, n_shards=4).collect()
    parsed = warcmod.warc_to_corpus(
        spark, os.path.join(out_dir, "*.warc.gz"),
        record_types=("conversion",),
    )
    return parsed.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.decode("html", "UTF-8").alias("text"),
        F.length("html").cast("bigint").alias("n_bytes"),
    )


def q_text_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram LM with the full stupid-backoff chain
    trigram→bigram→unigram (Brants 2007 count-pruned model), trained
    on the corpus itself; trigram_size=1500 / bigram_size=2000 keep
    real populations on ALL THREE scoring paths at oracle scale so
    each branch of the backoff CASE is value-checked, and min_count=2
    exercises the Brants pruning (singleton trigrams must fall to
    backoff even when the cap has room)."""
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    return ta.trigram_lm_scores(
        _t(spark, sf_dir, "documents"),
        trigram_size=1500,
        bigram_size=2000,
        min_count=2,
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016) over
    the documents word-frequency dict: the first 12 learned merges
    with deterministic tie-breaks.  Iterative (one tiny agg + argmax
    per merge) — non-SQL-expressible, so no oracle_sql entry: the
    driver records the rows-only check and the merge table is pinned
    against a pure-python reference BPE in tests/test_bpe.py."""
    from smart_ocr_spark.functions import bpe

    _ship(spark)
    return bpe.bpe_train(
        _t(spark, sf_dir, "documents"), n_merges=12
    )


def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION (the other half of the BPE story): train
    12 merges on the corpus word dict, then encode every doc and
    report (doc_id, n_tokens, n_subwords) — the compression-ratio
    table a tokenizer build ends with and the real token counter the
    shard packer would use.  Greedy rank-order merge application is
    iterative per word — non-SQL-expressible, so rows-only at the
    driver; the encoder is pinned against a pure-python reference in
    tests/test_bpe.py."""
    from smart_ocr_spark.functions import bpe

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    # rank order IS merge priority in the greedy encoder — sort
    # explicitly instead of trusting collect() row order
    merges = [
        (r["left"], r["right"])
        for r in sorted(
            bpe.bpe_train(docs, n_merges=12).collect(),
            key=lambda r: r["rank"],
        )
    ]
    return bpe.bpe_segment(docs, merges)


def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. 2022 exact-substring REMOVAL at disjoint 8-token
    block grain: corpus-recurring blocks survive only at their global
    first (doc_id, pos); docs reconstruct from survivors + tail.  The
    corpus's planted exact-duplicate docs exercise whole-doc removal;
    the oracle mirrors at block-STRING grain (collision-free twin of
    the xxhash64 key)."""
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    return dedup.remove_dup_spans(
        _t(spark, sf_dir, "documents"), window=8
    )


def q_media_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (average-hash) image near-dup over the REAL
    raw-grayscale decode path: each doc's payload is its first 64
    printable-ASCII chars as an 8×8 pixel grid; every 4th doc instead
    carries its successor doc's grid with the last pixel replaced — a
    planted 1-pixel perturbation the aHash Hamming join must surface.
    Pairs via the shared SimHash pigeonhole chunk-blocking core (no N²
    self-join); payloads never shuffle, only the 64-bit hash does.
    max_hamming=8 exceeds the 4-chunk pigeonhole guarantee (≤3), so
    pairs are banding-recall above radius 3 — the oracle mirrors the
    same chunk join, making the semantics (not just the values) the
    contract; the kernel logs the bound."""
    from smart_ocr_spark.functions import multimodal

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.rpad(
            F.substring(
                F.regexp_replace(F.col("text"), "[^ -~]", ""), 1, 64
            ),
            64,
            "x",
        ).alias("img"),
    )
    donors = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("img").alias("donor_img")
    )
    media = (
        docs.join(donors, "doc_id", "left")
        .select(
            F.concat(F.lit("img://"), F.col("doc_id")).alias("url"),
            F.encode(
                F.when(
                    (F.col("doc_id") % 4 == 0) & F.col("donor_img").isNotNull(),
                    F.concat(F.substring(F.col("donor_img"), 1, 63), F.lit("|")),
                ).otherwise(F.col("img")),
                "UTF-8",
            ).alias("payload"),
        )
    )
    pairs = multimodal.image_ahash_near_pairs(
        media, max_hamming=8, decoder="raw"
    )
    return pairs.select(
        F.col("doc_a").alias("url_a"),
        F.col("doc_b").alias("url_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


def q_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host curation rollup over the planted URLs: raw docs vs
    distinct canonical URLs vs dedup survivors (the host-grain
    spam/mirror signal)."""
    from smart_ocr_spark.functions import urls

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _planted_url_col().alias("url")
    )
    return urls.host_stats(docs)


def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist filter (RefinedWeb/UT1-style first curation
    stage): hosts get deterministic www./m. subdomain variants so the
    oracle value-checks all three behaviors — exact-host block,
    subdomain-suffix block, and longest-match specificity (a doc whose
    host matches two entries must report the longer one)."""
    from smart_ocr_spark.functions import urls

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("www."))
            .when(F.col("doc_id") % 7 == 0, F.lit("m."))
            .otherwise(F.lit("")),
            F.lit("site"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    bl = spark.createDataFrame(
        [
            ("site7.example.org",),
            ("www.site10.example.org",),
            ("site10.example.org",),
            ("m.site14.example.org",),
            ("example.net",),
        ],
        "domain string",
    )
    return urls.url_blocklist_filter(docs, bl)


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 bigram collocations by PMI over the corpus (phrase
    mining for vocab/tokenizer work).  Counts are exact integers and
    the score is a single log10 — no float accumulation — so the
    DuckDB mirror is bit-exact including the top-k cutoff."""
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    return ta.pmi_collocations(
        _t(spark, sf_dir, "documents"), min_count=5, top_k=100
    )


def q_url_latest_revision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dump freshness dedup over the planted messy URLs: each
    doc gets a deterministic epoch capture time; per canonical URL the
    newest capture survives.  Within a canonical pair the planted ts
    always differ (multiplier coprime to the modulus), so this oracle
    value-checks the newest-wins rule; the id tie-break and the NULL
    lattice are pinned by pytest (test_url_latest_revision), not
    driver-exercised."""
    from smart_ocr_spark.functions import urls

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        _planted_url_col().alias("url"),
        (F.lit(1600000000) + (F.col("doc_id") * 7919) % 100000).alias(
            "warc_ts"
        ),
    )
    return urls.url_latest_revision(docs)


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt compliance filter: hosts below the K<25 cut carry a
    planted robots body (a '*' group with Disallow/Allow/char-grain
    prefix rules plus a DECOY group for another agent — if group
    selection leaked, every doc would block and the oracle would
    catch it); the oracle re-derives the rule table, the startswith
    candidate join, and the longest-match/allow-wins pick in SQL."""
    from smart_ocr_spark.functions import robots, urls

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    k = F.col("doc_id") % 50
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://site"), k.cast("string"), F.lit(".example.org"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("/private/doc"))
            .when(F.col("doc_id") % 4 == 1, F.lit("/private/ok/doc"))
            .when(F.col("doc_id") % 4 == 2, F.lit("/public/doc"))
            .otherwise(F.lit("/tmpstuff/doc")),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Disallow: /tmp\n"
        "\n"
        "User-agent: evilbot\n"
        "Disallow: /\n"
    )
    robots_df = (
        pages.where(k < 25)
        .select(urls.host_col(F.col("url")).alias("host"))
        .distinct()
        .withColumn("robots_txt", F.lit(body))
    )
    return robots.robots_filter(pages, robots_df)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    return dedup.exact_dedup_groups(_t(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    return dedup.minhash_signatures(_t(spark, sf_dir, "documents"))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import similarity

    _ship(spark)
    return similarity.cosine_topk(_t(spark, sf_dir, "embeddings"), k=5)


def q_figures_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 figure extraction, oracle-checked end-to-end: build a PDF
    per document with ONE planted rectangle at doc_id-derived
    coordinates, run the real content-stream scanner + union-find
    clusterer + candidate filters, and emit the metadata rows. The
    oracle recomputes the planted geometry arithmetically — any parser,
    clustering, or filter deviation breaks the match."""
    _ship(spark)
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def mk(batches):
        from smart_ocr_spark.sources.corpus import build_pdf

        for pdf in batches:
            urls, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                x0 = 100 + (d % 50) * 2
                y0 = 200 + (d % 30) * 3
                w = 200 + d % 80
                h = 200 + d % 60
                rect = f"{x0} {y0} {w} {h} re S"
                payloads.append(
                    build_pdf(
                        [[(72.0, 720.0, (text or "")[:60])]],
                        raw_page_prefix=[rect],
                    )
                )
                urls.append(str(d))
            yield pd.DataFrame({"url": urls, "html": payloads})

    pdfs = spread_scan(docs).mapInPandas(mk, "url string, html binary")
    from smart_ocr_spark.operators.extract import figure_metadata

    return figure_metadata(pdfs).select(
        F.col("url").cast("bigint").alias("doc_id"),
        "figure_num", "page_num", "figure_type", "x0", "y0", "x1", "y1",
    )


def q_figures_embed_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Figure blocks embedded into the final markdown (VERDICT r3 #1;
    reference ``_describe_and_embed_figures`` append rule,
    orchestrator.py:1272-1276/1367-1371, with SURVEY §2.12's
    deterministic caption stub): each doc becomes a one-page PDF with
    its text and ONE planted rectangle at doc_id-derived coordinates;
    the full pipeline runs with ``embed_figures=True`` and the oracle
    reconstructs the interleaved assembly — body text (byte-identical
    roundtrip), the ``**Figure 1**`` header with the stub caption from
    the planted geometry, and the image reference — in pure SQL."""
    _ship(spark)
    import pandas as pd

    from smart_ocr_spark.plans.extract_pipeline import run_extraction

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def mk(batches):
        from smart_ocr_spark.sources.corpus import build_pdf

        for pdf in batches:
            urls, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                x0 = 100 + (d % 50) * 2
                y0 = 200 + (d % 30) * 3
                w = 200 + d % 80
                h = 200 + d % 60
                rect = f"{x0} {y0} {w} {h} re S"
                payloads.append(
                    build_pdf(
                        [[(72.0, 720.0, (text or "")[:60])]],
                        raw_page_prefix=[rect],
                    )
                )
                urls.append(str(d))
            yield pd.DataFrame({"url": urls, "html": payloads})

    pdfs = spread_scan(docs).mapInPandas(mk, "url string, html binary").select(
        "url",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("en").alias("lang"),
    )
    res = run_extraction(spark, pdfs, embed_figures=True)
    return res.select(
        F.col("url").cast("bigint").alias("doc_id"), F.col("final_text")
    )


def q_extract_pdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The byte-identical contract through the PDF kernel: each document
    becomes a single-line one-page PDF; the xref walk, Flate decode,
    content-stream interpretation, layout reconstruction, audit, and
    selection must reproduce the text exactly (identity oracle)."""
    _ship(spark)
    import pandas as pd

    from smart_ocr_spark.plans.extract_pipeline import run_extraction

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def mk(batches):
        from smart_ocr_spark.sources.corpus import build_pdf

        for pdf in batches:
            rows = [
                (str(int(d)), build_pdf([[(72.0, 720.0, t or "")]]))
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(rows, columns=["url", "html"])

    pdfs = spread_scan(docs).mapInPandas(mk, "url string, html binary").select(
        "url",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("en").alias("lang"),
    )
    res = run_extraction(spark, pdfs)
    return res.select(
        F.col("url").cast("bigint").alias("doc_id"), F.col("final_text")
    )


def q_extract_multipage_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 ordered assembly end-to-end: each document's tokens split into
    three page chunks of a 3-page PDF; the pipeline must reassemble the
    pages in order with the exact '\n\n---\n\n' separator
    (state.py:148 contract). The oracle recomputes the chunking and
    join in SQL."""
    _ship(spark)
    import pandas as pd

    from smart_ocr_spark.plans.extract_pipeline import run_extraction

    from smart_ocr_spark.functions.text_analysis import tokens_col

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.size(tokens_col(F.col("text"))) >= 3
    )

    def mk(batches):
        from smart_ocr_spark.sources.corpus import build_pdf

        for pdf in batches:
            rows = []
            from smart_ocr_spark.functions.dedup import _tokenize as _ascii_tok
            import re as _re

            for d, t in zip(pdf["doc_id"], pdf["text"]):
                # pinned ASCII whitespace split (str.split() is Unicode-
                # aware and diverges from the oracle on NBSP etc.); case
                # is preserved, unlike _tokenize, so split directly
                toks = [
                    w
                    for w in _re.split(r"[ \t\n\x0b\f\r]+", t or "")
                    if w
                ]
                k = (len(toks) + 2) // 3
                pages = [
                    [(72.0, 720.0, " ".join(chunk))]
                    for chunk in (toks[:k], toks[k : 2 * k], toks[2 * k :])
                ]
                rows.append((str(int(d)), build_pdf(pages)))
            yield pd.DataFrame(rows, columns=["url", "html"])

    pdfs = spread_scan(docs).mapInPandas(mk, "url string, html binary").select(
        "url",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("en").alias("lang"),
    )
    res = run_extraction(spark, pdfs)
    return res.select(
        F.col("url").cast("bigint").alias("doc_id"),
        F.col("final_text").alias("assembled"),
        F.col("n_pages"),
    )


def q_extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The byte-identical-text contract: the REAL 5-phase pipeline over
    the HTML-wrapped corpus must reproduce every document's text exactly
    (north rule invariant; verified against the identity oracle)."""
    _ship(spark)
    from smart_ocr_spark.plans.extract_pipeline import run_extraction

    res = run_extraction(spark, _wrapped_docs(spark, sf_dir))
    return res.select(
        F.col("url").cast("bigint").alias("doc_id"), F.col("final_text")
    )


# --- rows-only queries (no SQL-expressible oracle; driver records weaker
# rows-only checks — each is pinned by its own pytest instead) ---


def q_extract_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ship(spark)
    from smart_ocr_spark.plans.extract_pipeline import run_extraction

    res = run_extraction(spark, _wrapped_docs(spark, sf_dir))
    return (
        res.groupBy("lang", "status", "selected_variant")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.expr("cast(exists(attempts, a -> a.audit_passed) as int)")
            ).alias("n_audit_pass"),
        )
        .orderBy("lang", "status", "selected_variant")
    )


def q_extract_scanned_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scanned-category status rollup + raster recovery (reference
    benchmark category `scanned`, rasterize.py:17-80; VERDICT r3 #6):
    every doc_id % 37 == 5 row's payload is replaced by a deterministic
    image-only PDF.  Half of those (doc_id % 74 == 5) carry the
    synthetic-scan payload the raster tier can OCR — the pipeline must
    recover them end-to-end (raster attempt row, first_passing
    selection, ``success``, counted in ``n_raster_recovered``); the
    rest have raw pixels only and must land in the distinct
    ``failed_scanned`` bucket — never an empty-text success."""
    _ship(spark)
    from smart_ocr_spark.kernel.raster import encode_scan_text
    from smart_ocr_spark.plans.extract_pipeline import run_extraction
    from smart_ocr_spark.sources.corpus import build_pdf

    scanned_pdf = build_pdf([[], []], image_pages=[True, True])
    rec_pages = [
        "the quick survey of coastal weather stations reported steady "
        "barometric readings through the morning while several inland "
        "observers noted gradual clearing and a modest rise in "
        "temperature across the valley floor by early afternoon hours",
        "later measurements confirmed the pattern as wind speeds eased "
        "near the ridge and humidity settled toward seasonal values "
        "leaving the field crews time to calibrate instruments and log "
        "the remaining observations before the evening shift arrived",
    ]
    recoverable_pdf = build_pdf(
        [[], []],
        image_pages=[True, True],
        image_streams=[encode_scan_text(t) for t in rec_pages],
    )
    docs = _t(spark, sf_dir, "documents")
    wrapped = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.when(F.col("doc_id") % 74 == 5, F.lit(recoverable_pdf))
        .when(F.col("doc_id") % 37 == 5, F.lit(scanned_pdf))
        .otherwise(
            F.encode(
                F.concat(
                    F.lit("<html><body><p>"),
                    F.col("text"),
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            )
        )
        .alias("html"),
        F.col("lang"),
    )
    res = run_extraction(spark, wrapped)
    return (
        res.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_images").alias("n_images"),
            F.sum(
                F.when(F.col("selected_variant") == "raster", 1).otherwise(0)
            ).alias("n_raster_recovered"),
        )
        .orderBy("status")
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import similarity

    _ship(spark)
    return similarity.ivf_topk(_t(spark, sf_dir, "embeddings"), k=5, n_probe=1)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import similarity

    _ship(spark)
    return similarity.lsh_topk(_t(spark, sf_dir, "embeddings"), k=5, n_planes=8)


def q_dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup, oracle-checked exactly: the
    synthetic embeddings have no natural near-dups (max pairwise cosine
    ~0.5), so every vec_id % 10 == 0 vector gets a deterministic mirror
    (id + 1,000,000, vector scaled x2).  Cosine is scale-invariant, so
    each mirror pair has cosine exactly 1.0 AND identical LSH buckets in
    every table (hyperplane signs are scale-invariant too) — the
    LSH-gated path provably finds exactly the >= 0.99 pairs, which is
    what lets a plain N^2 SQL join serve as an EXACT oracle for the
    bucketed plan."""
    from smart_ocr_spark.functions import similarity

    _ship(spark)
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    mirrors = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    return similarity.cosine_near_dup_pairs(
        e.unionByName(mirrors), threshold=0.99, n_planes=8, n_tables=2
    )


def q_dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    return dedup.simhash_near_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=8
    )


def q_dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import dedup

    _ship(spark)
    return dedup.minhash_dedup_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import multimodal

    _ship(spark)
    media = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("media://"), F.col("doc_id")).alias("url"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return multimodal.extract_media_meta(media)


def q_text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_ocr_spark.functions import text_analysis as ta

    _ship(spark)
    return ta.with_winnow_fingerprint(_t(spark, sf_dir, "documents")).select(
        "doc_id", "winnow_fp"
    )


def q_reconcile_latex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 LaTeX reconciliation, oracle-checked end-to-end: per document
    build a deterministic (base, source) pair exercising BOTH merge
    paths of kernel/reconcile.py — even doc_ids have a matching display
    block replaced (normalized-content / token-Jaccard match), odd
    doc_ids have no base LaTeX so the source block is positionally
    inserted after the 'given by:' reference phrase.  The oracle
    reproduces the expected merged text arithmetically, so any regex,
    matching, or insertion deviation breaks the hash."""
    from smart_ocr_spark.operators.reconcile import reconcile_latex

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sid = F.col("doc_id").cast("string")
    even = F.col("doc_id") % 2 == 0
    base = F.when(
        even,
        F.concat(
            F.col("text"), F.lit("\n\nEq: $$ x + y = "), sid,
            F.lit(" $$\n\nEnd."),
        ),
    ).otherwise(
        F.concat(
            F.lit("The result for doc "), sid,
            F.lit(" is given by: the following."),
        )
    )
    source = F.when(
        even, F.concat(F.lit("$$x+y="), sid, F.lit("$$"))
    ).otherwise(F.concat(F.lit("$$E_"), sid, F.lit(" = m c^2$$")))
    df = docs.select(
        "doc_id", base.alias("base_text"), source.alias("source_text")
    )
    return reconcile_latex(df).select("doc_id", "merged_text", "n_latex_merged")


def q_consensus_discrepancies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A9 discrepancy detectors, oracle-checked: synthesize a
    two-attempt matrix per document (word-count spread iff doc_id%3==0,
    audit divergence iff doc_id%2==1) and run the REAL kernel
    (kernel/consensus.py find_discrepancies); the oracle reproduces the
    reference's exact note strings."""
    import pandas as pd  # noqa: F401

    _ship(spark)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[ \\t\\n\\x0B\\f\\r]+"),
        lambda t: t != F.lit(""),
    )
    wc = F.size(toks).cast("int")
    df = docs.select(
        "doc_id",
        wc.alias("wc"),
        F.when(F.col("doc_id") % 3 == 0, wc * 2).otherwise(wc).alias("wc2"),
        (F.col("doc_id") % 2 == 0).alias("b_passed"),
    )

    @F.pandas_udf("array<string>")
    def discs_udf(wc, wc2, b_passed):
        import pandas as pd

        from smart_ocr_spark.kernel.consensus import find_discrepancies

        return pd.Series(
            [
                find_discrepancies(
                    [
                        {"variant": "layout", "word_count": int(a),
                         "audit_passed": True},
                        {"variant": "density", "word_count": int(b),
                         "audit_passed": bool(p)},
                    ]
                )
                for a, b, p in zip(wc, wc2, b_passed)
            ]
        )

    return df.select(
        "doc_id", discs_udf("wc", "wc2", "b_passed").alias("discs")
    ).select(
        "doc_id",
        F.size("discs").cast("int").alias("n_discrepancies"),
        F.array_join("discs", " || ").alias("discs_concat"),
    )


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (k=8, 2 Lloyd rounds, md5-order seeds,
    exact-sum centroid updates) — oracle-checked cluster assignment per
    vector.  The oracle unrolls both rounds in SQL."""
    from smart_ocr_spark.functions import clustering

    _ship(spark)
    return clustering.kmeans_assign(
        _t(spark, sf_dir, "embeddings"), k=8, iters=2
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sampling, oracle-checked:
    the md5-threshold keep decision is pure hash arithmetic, identical
    in Spark and SQL — a reproducibility property df.sample (per-
    partition RNG) cannot give."""
    from smart_ocr_spark.functions import sampling

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        docs,
        "lang",
        {"en": 0.5, "zh": 0.25},
        default_fraction=0.1,
        id_col="doc_id",
        salt="r2",
    )
    return out.select("doc_id", "lang")


def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination, oracle-checked: hash-split the corpus
    into a 20% eval and 80% train side, then count each eval doc's
    8-gram shingles that appear anywhere in train."""
    from smart_ocr_spark.functions import contamination, sampling

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    eval_df, train = sampling.deterministic_split(docs, 0.2, salt="eval")
    return contamination.contamination_report(train, eval_df).select(
        "doc_id", "n_shingles", "n_contaminated", "contamination"
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS, oracle-checked end-to-end: MinHash-LSH verified
    pairs -> connected components (iterative min-label propagation to
    fixpoint) -> (doc, component, is_canonical).  The oracle reaches the
    same fixpoint with a recursive CTE over the same pair SQL."""
    from smart_ocr_spark.functions import components, dedup

    _ship(spark)
    pairs = dedup.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8
    )
    comps = components.connected_components(pairs)
    return comps.select(
        F.col("id").alias("doc_id"),
        "component_id",
        (F.col("id") == F.col("component_id")).alias("is_canonical"),
    )


def q_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END PRODUCT, oracle-checked: the corpus rows that
    survive near-dup removal — every doc in no pair, plus the minimum
    id of each MinHash-LSH component (``functions.components.
    canonical_docs``).  The oracle anti-joins the recursive-CTE
    component table's non-canonical ids."""
    from smart_ocr_spark.functions import components, dedup

    _ship(spark)
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.8)
    return components.canonical_docs(docs.select("doc_id", "lang"), pairs)


def _query_pool_core() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational operator families (SURVEY.md §2)
        "rollup_pricing": q_rollup_pricing,
        "anti_join_skip": q_anti_join_skip,
        "window_first_passing": q_window_first_passing,
        "argmax_consensus": q_argmax_consensus,
        "topk_attempts": q_topk_attempts,
        "union_escalation": q_union_escalation,
        "selfjoin_pairwise": q_selfjoin_pairwise,
        "ordered_assembly": q_ordered_assembly,
        "fanout_chunk": q_fanout_chunk,
        "join_broadcast_rollup": q_join_broadcast_rollup,
        "skew_twostage_rollup": q_skew_twostage_rollup,
        "classify_priority": q_classify_priority,
        "json_extract_rollup": q_json_extract_rollup,
        "merge_latest_state": q_merge_latest_state,
        "setop_untried": q_setop_untried,
        "score_levenshtein": q_score_levenshtein,
        # normalization / audit / calibration batteries (N/Q/A6 series)
        "normalize_battery": q_normalize_battery,
        "audit_battery": q_audit_battery,
        "calibration_rollup": q_calibration_rollup,
        # training-data pipeline
        "latex_blocks": q_latex_blocks,
        "text_token_stats": q_text_token_stats,
        "text_lang_id": q_text_lang_id,
        "text_quality": q_text_quality,
        "text_redact_pii": q_text_redact_pii,
        "quality_keep_list": q_quality_keep_list,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        # the extraction engine itself
        "figures_fanout": q_figures_fanout,
        "figures_embed_text": q_figures_embed_text,
        "extract_roundtrip": q_extract_roundtrip,
        "extract_pdf_roundtrip": q_extract_pdf_roundtrip,
        "extract_multipage_assembly": q_extract_multipage_assembly,
        # rows-only (non-SQL-expressible; pinned by pytest golden tests)
        "extract_pipeline_report": q_extract_pipeline_report,
        "extract_scanned_report": q_extract_scanned_report,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "dedup_simhash64_pairs": q_dedup_simhash64_pairs,
        "dedup_minhash_lsh_pairs": q_dedup_minhash_lsh_pairs,
        "reconcile_latex": q_reconcile_latex,
        "consensus_discrepancies": q_consensus_discrepancies,
        "kmeans_clusters": q_kmeans_clusters,
        "sample_stratified": q_sample_stratified,
        "contamination_report": q_contamination_report,
        "dedup_components": q_dedup_components,
        "dedup_embedding_neardup": q_dedup_embedding_neardup,
        "dedup_keep_list": q_dedup_keep_list,
        "multimodal_meta": q_multimodal_meta,
        "text_winnow_fingerprint": q_text_winnow_fingerprint,
    }


def _query_pool_curation() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_repetition": q_text_repetition,
        "curation_funnel": q_curation_funnel,
        "paragraph_dedup": q_paragraph_dedup,
        "text_unigram_lm": q_text_unigram_lm,
        "semantic_dedup": q_semantic_dedup,
        "url_canonical_dedup": q_url_canonical_dedup,
        "url_host_stats": q_url_host_stats,
        "dedup_incremental_bloom": q_dedup_incremental_bloom,
        "dsir_importance": q_dsir_importance,
        "quality_classifier": q_quality_classifier,
        "seq_packing": q_seq_packing,
        "mix_resample": q_mix_resample,
        "dedup_doc_lines": q_dedup_doc_lines,
        "c4_filters": q_c4_filters,
        "shuffle_shards": q_shuffle_shards,
        "shard_assembly": q_shard_assembly,
        "dup_span_report": q_dup_span_report,
        "dedup_minhash_incremental": q_dedup_minhash_incremental,
        "media_ahash_neardup": q_media_ahash_neardup,
        "remove_dup_spans": q_remove_dup_spans,
        "bpe_merges": q_bpe_merges,
        "text_bigram_lm": q_text_bigram_lm,
        "media_frame_neardup": q_media_frame_neardup,
        "url_blocklist": q_url_blocklist,
        "pmi_collocations": q_pmi_collocations,
        "robots_filter": q_robots_filter,
        "url_latest_revision": q_url_latest_revision,
        "bpe_encode_stats": q_bpe_encode_stats,
        "lm_perplexity_buckets": q_lm_perplexity_buckets,
        # round-6 additions
        "text_trigram_lm": q_text_trigram_lm,
        "warc_roundtrip": q_warc_roundtrip,
        "warc_write_roundtrip": q_warc_write_roundtrip,
    }


# Round-6 rotation (VERDICT r5 #1): every op that has NEVER had a
# driver-recorded CORRECTNESS row takes a driver slot this round — the
# 17 round-5 overflow ops plus the 2 new round-6 ops — closing the
# record so every operator in the repo has a driver-recorded pass on
# file.  In their place, 19 multi-round-green veterans rotate to
# extra_queries() (each carries 2-5 rounds of green driver history AND
# stays verified here by the driver-identical pytest-side compare).
# Rotating = editing this list — membership, not code, moves.
_ROTATED_TO_EXTRA = (
    # r5 rotation survivors (r1-r4 driver history)
    "argmax_consensus",
    "topk_attempts",
    "union_escalation",
    "fanout_chunk",
    "classify_priority",
    "json_extract_rollup",
    "setop_untried",
    "latex_blocks",
    "score_levenshtein",
    "consensus_discrepancies",
    "calibration_rollup",
    "multimodal_meta",
    # rotated OUT this round (r1-r5 driver history, all also pinned by
    # pytest and, where applicable, verbatim reference replay)
    "rollup_pricing",
    "anti_join_skip",
    "window_first_passing",
    "selfjoin_pairwise",
    "ordered_assembly",
    "join_broadcast_rollup",
    "skew_twostage_rollup",
    "normalize_battery",
    "audit_battery",
    "text_token_stats",
    "text_lang_id",
    "text_redact_pii",
    "quality_keep_list",
    "reconcile_latex",
    "sample_stratified",
    "contamination_report",
    "text_winnow_fingerprint",
    "ann_ivf_topk",
    "figures_embed_text",
    "dedup_ngram_jaccard",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver registry — exactly 50 entries (the driver's per-round
    verification cap; VERDICT r3 #3)."""
    pool = {**_query_pool_core(), **_query_pool_curation()}
    return {k: v for k, v in pool.items() if k not in _ROTATED_TO_EXTRA}


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Overflow beyond the driver's 50-query verification cap.  Every
    entry here with an ``extra_oracle_sql()`` mirror is verified with
    the IDENTICAL compare by tests/test_entry_contract.py and
    scripts/validate_oracles.py — the gate is pytest-side instead of
    driver-side, which is the flagged difference.  Iterative ops with
    no SQL mirror (``bpe_merges``) get the rows-only stability check
    plus their own reference-equivalence suite."""
    pool = {**_query_pool_core(), **_query_pool_curation()}
    return {k: pool[k] for k in _ROTATED_TO_EXTRA}


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer regex, SQL-quoted (shared with
# functions/text_analysis.py:BPE_TOKEN_RE — imported so the two sides
# cannot drift)
from smart_ocr_spark.functions.text_analysis import BPE_TOKEN_RE as _BPE_RE

_BPE_RE_SQL = _BPE_RE.replace("'", "''")

_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower(text),"
    " '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')"
)

# Hashed unigram+bigram feature instances for the selection ops
# (functions/selection.py mirror): md5-prefix bucket hash, 512 buckets
_SELFEAT_SQL = f"""
WITH tk AS (SELECT doc_id, lang, {_TOKS_SQL} AS t FROM documents),
ft AS (SELECT doc_id, lang, unnest(list_concat(t,
    CASE WHEN len(t) < 2 THEN [] ELSE
      list_transform(generate_series(1, len(t) - 1),
        i -> t[i] || ' ' || t[i + 1]) END)) AS tok
  FROM tk),
fb AS (SELECT doc_id, lang,
    CAST(('0x' || substr(md5('sel:' || tok), 1, 8))::UBIGINT % 512
         AS BIGINT) AS bucket
  FROM ft)"""

_SHINGLES_SQL = f"""
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(t) >= 3 THEN
             list_transform(generate_series(1, len(t) - 2),
                            i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
           ELSE [] END)) AS shingle
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
"""


def _minhash_oracle() -> str:
    sigs = ",\n    ".join(
        f"min(md5(concat('{s}:', shingle))) AS sig_{s}" for s in range(8)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
sig AS (SELECT doc_id, {sigs} FROM sh GROUP BY doc_id)
SELECT doc_id, sig_0, sig_1, sig_2, sig_3, sig_4, sig_5, sig_6, sig_7,
       md5(concat(sig_0, sig_1, sig_2, sig_3)) AS band_0,
       md5(concat(sig_4, sig_5, sig_6, sig_7)) AS band_1
FROM sig
"""


def _minhash_lsh_pairs_oracle() -> str:
    """LSH band buckets -> candidate pairs -> exact Jaccard verification
    at threshold 0.8: mirrors ``dedup.minhash_dedup_pairs`` end-to-end
    (the md5 hash family was chosen so every stage is SQL-identical)."""
    sigs = ",\n    ".join(
        f"min(md5(concat('{s}:', shingle))) AS sig_{s}" for s in range(8)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
sig AS (SELECT doc_id, {sigs} FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id,
         concat('0:', md5(concat(sig_0, sig_1, sig_2, sig_3))) AS bucket
  FROM sig
  UNION ALL
  SELECT doc_id,
         concat('1:', md5(concat(sig_4, sig_5, sig_6, sig_7))) AS bucket
  FROM sig),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT c.doc_a, c.doc_b,
  round(shared / CAST(ca.n_sh + cb.n_sh - shared AS DOUBLE), 4) AS jaccard
FROM cands c
JOIN shared s ON s.doc_a = c.doc_a AND s.doc_b = c.doc_b
JOIN cnt ca ON ca.doc_id = c.doc_a
JOIN cnt cb ON cb.doc_id = c.doc_b
WHERE round(shared / CAST(ca.n_sh + cb.n_sh - shared AS DOUBLE), 4) >= 0.8
"""


# 64-bit SimHash + pigeonhole chunk blocking in pure SQL.  The pinned
# big-endian first-8-bytes-of-md5 convention is '0x'||substr(md5(x),1,16)
# cast to UBIGINT; the unsigned accumulator lives in HUGEINT and drops to
# two's-complement BIGINT to match Spark's LongType simhash64.
_SIMHASH64_PAIRS_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS w FROM tok GROUP BY doc_id, tok),
th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, w
       FROM tf),
bits AS (
  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN w ELSE -w END) AS s
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
  GROUP BY doc_id, i),
uv AS (
  SELECT doc_id,
    sum(CASE WHEN s >= 0 THEN (1::HUGEINT << i) ELSE 0::HUGEINT END) AS v
  FROM bits GROUP BY doc_id),
-- token-less docs: every bit accumulator is 0 (>= 0), so all 64 bits set
uvfull AS (
  SELECT d.doc_id, coalesce(uv.v, 18446744073709551615::HUGEINT) AS v
  FROM (SELECT doc_id FROM documents) d LEFT JOIN uv ON uv.doc_id = d.doc_id),
sh AS (
  SELECT doc_id,
    CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
              THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT)
      AS simhash64,
    v
  FROM uvfull),
chunks AS (
  SELECT doc_id, simhash64, c, (v >> (c * 16)) & 65535::HUGEINT AS chunk
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash64 AS ha, b.simhash64 AS hb
  FROM chunks a
  JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(ha, hb)) <= 8
"""


# Random-hyperplane LSH ANN in pure SQL: the plane weights are the same
# md5-derived +/-1 signs the Spark kernel uses (sign = low bit of byte
# j of md5('t:p:d0'), i.e. the parity of hex char j*2+2), so bucket
# codes match bit-for-bit; cosine re-rank within shared buckets.
_ANN_LSH_SQL = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
             AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      FROM e),
el AS (SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) - 1 AS d
       FROM e),
planes AS (
  SELECT t, p, d,
    CASE WHEN substr(md5(t || ':' || p || ':' || ((d // 16) * 16)),
                     (d % 16) * 2 + 2, 1)
              IN ('1','3','5','7','9','b','d','f')
         THEN 1.0 ELSE -1.0 END AS w
  FROM (SELECT unnest(generate_series(0, 1)) AS t),
       (SELECT unnest(generate_series(0, 7)) AS p),
       (SELECT unnest(generate_series(0, 63)) AS d)),
dots AS (
  SELECT el.vec_id, pl.t, pl.p, sum(el.val * pl.w) AS dot
  FROM el JOIN planes pl ON pl.d = el.d
  GROUP BY 1, 2, 3),
codes AS (
  SELECT vec_id, t,
    sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS code
  FROM dots GROUP BY vec_id, t),
buckets AS (
  SELECT n.vec_id, n.v, n.nrm, c.t || ':' || c.code AS bucket
  FROM codes c JOIN n ON n.vec_id = c.vec_id),
cand AS (
  SELECT a.vec_id AS query_id, b.vec_id AS nbr_id,
         max(list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) AS cos
  FROM buckets a JOIN buckets b
    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
  WHERE a.nrm > 0 AND b.nrm > 0
  GROUP BY 1, 2),
r AS (SELECT query_id, nbr_id, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, nbr_id ASC) AS rank FROM cand)
SELECT query_id, CAST(rank AS INT) AS rank, nbr_id,
  round(cos, 4) + 0.0 AS cosine
FROM r WHERE rank <= 5
"""


# IVF ANN in pure SQL: label centroids via the exact floor(x*1e9) BIGINT
# convention (identical to the embedding_centroids oracle), nearest-cell
# assignment by cosine (ties -> lowest label), exact re-rank per cell.
_ANN_IVF_SQL = """
WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      FROM e),
cent AS (
  SELECT label, idx,
    round(CAST(sum(CAST(floor(val * 1e9) AS BIGINT)) AS DOUBLE)
          / 1e9 / count(*), 4) + 0.0 AS cv
  FROM (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS idx
        FROM e)
  GROUP BY label, idx),
cnorm AS (
  SELECT label,
    CASE WHEN sqrt(sum(cv * cv)) = 0 THEN 1.0 ELSE sqrt(sum(cv * cv)) END
      AS cn
  FROM cent GROUP BY label),
el AS (SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS idx
       FROM e),
adot AS (
  SELECT el.vec_id, c.label, sum(el.val * c.cv) AS dot
  FROM el JOIN cent c ON c.idx = el.idx
  GROUP BY 1, 2),
assign AS (
  SELECT vec_id, label AS cell FROM (
    SELECT a.vec_id, a.label,
      row_number() OVER (PARTITION BY a.vec_id
        ORDER BY a.dot / (n.nrm * cn.cn) DESC, a.label ASC) AS rn
    FROM adot a
    JOIN n ON n.vec_id = a.vec_id
    JOIN cnorm cn ON cn.label = a.label
    WHERE n.nrm > 0)
  WHERE rn = 1),
cellv AS (
  SELECT a.vec_id, a.cell, n.v, n.nrm
  FROM assign a JOIN n ON n.vec_id = a.vec_id),
cand AS (
  SELECT a.vec_id AS query_id, b.vec_id AS nbr_id,
         max(list_dot_product(a.v, b.v) / (a.nrm * b.nrm)) AS cos
  FROM cellv a JOIN cellv b ON a.cell = b.cell AND a.vec_id <> b.vec_id
  GROUP BY 1, 2),
r AS (SELECT query_id, nbr_id, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, nbr_id ASC) AS rank FROM cand)
SELECT query_id, CAST(rank AS INT) AS rank, nbr_id,
  round(cos, 4) + 0.0 AS cosine
FROM r WHERE rank <= 5
"""


# Winnowing fingerprint in pure SQL: k=5 char grams over whitespace-
# stripped lower(text); each gram hashed with a base-257 codepoint
# polynomial (exact in 64 bits) + xorshift-multiply mixer replayed in
# HUGEINT mod-2^64 arithmetic (multipliers < 2^62 keep z*M inside
# HUGEINT range); w=4 sliding-window min (ROWS BETWEEN), distinct mins
# XOR-folded (bit_xor) then >> 1 into a 63-bit BIGINT — matching
# _winnow_one (functions/text_analysis.py) exactly.
_WINNOW_SQL = """
WITH s AS (
  SELECT doc_id,
    regexp_replace(lower(coalesce(text, '')),
                   '[ \\t\\n\\x0b\\f\\r]+', '', 'g') AS st
  FROM documents),
grams AS (
  SELECT doc_id, i,
    (ascii(substr(st, CAST(i AS INT), 1))::UBIGINT * 4362470401
     + ascii(substr(st, CAST(i+1 AS INT), 1))::UBIGINT * 16974593
     + ascii(substr(st, CAST(i+2 AS INT), 1))::UBIGINT * 66049
     + ascii(substr(st, CAST(i+3 AS INT), 1))::UBIGINT * 257
     + ascii(substr(st, CAST(i+4 AS INT), 1))::UBIGINT) AS g0,
    count(*) OVER (PARTITION BY doc_id) AS n
  FROM s, unnest(generate_series(1, len(st) - 4)) AS t(i)
  WHERE len(st) >= 5),
m1 AS (SELECT doc_id, i, n,
  ((g0::HUGEINT + 11400714819323198485::HUGEINT)
     % 18446744073709551616::HUGEINT)::UBIGINT AS z0 FROM grams),
m2 AS (SELECT doc_id, i, n,
  ((xor(z0, z0 >> 30)::HUGEINT * 4564476756301768121::HUGEINT)
     % 18446744073709551616::HUGEINT)::UBIGINT AS z1 FROM m1),
m3 AS (SELECT doc_id, i, n,
  ((xor(z1, z1 >> 27)::HUGEINT * 1499779743744070123::HUGEINT)
     % 18446744073709551616::HUGEINT)::UBIGINT AS z2 FROM m2),
mixed AS (SELECT doc_id, i, n, xor(z2, z2 >> 31)::HUGEINT AS g FROM m3),
wins AS (
  SELECT doc_id, i, n,
    min(g) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
  FROM mixed),
sel AS (SELECT DISTINCT doc_id, mn FROM wins WHERE i <= greatest(n - 3, 1)),
folded AS (
  SELECT doc_id, CAST(bit_xor(mn) >> 1 AS BIGINT) AS winnow_fp
  FROM sel GROUP BY doc_id),
short AS (
  SELECT doc_id,
    CAST((('0x' || substr(md5(st), 1, 16))::UBIGINT >> 1) AS BIGINT)
      AS winnow_fp
  FROM s WHERE len(st) < 5)
SELECT doc_id, winnow_fp FROM folded
UNION ALL
SELECT doc_id, winnow_fp FROM short
"""


def _dedup_components_oracle() -> str:
    """Connected components over the MinHash-LSH pair graph: recursive
    reachability labels, min over reachable ids = component id — the
    same fixpoint the Spark min-label propagation loop converges to."""
    return f"""
WITH RECURSIVE pairs AS ({_minhash_lsh_pairs_oracle()}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
r(id, comp) AS (
  SELECT id, id AS comp FROM nodes
  UNION
  SELECT e.dst AS id, r.comp FROM r JOIN edges e ON e.src = r.id)
SELECT id AS doc_id, min(comp) AS component_id,
       id = min(comp) AS is_canonical
FROM r GROUP BY id
"""


def _lang_id_oracle() -> str:
    marker_exprs = []
    from smart_ocr_spark.functions.text_analysis import LANG_MARKERS

    for lang, words in LANG_MARKERS.items():
        parts = " + ".join(
            f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))" for w in words
        )
        marker_exprs.append(
            f"CAST(coalesce({parts}, 0) AS BIGINT) AS score_{lang}"
        )
    marker_exprs.append(
        "CAST(coalesce(len(regexp_extract_all(text,"
        " '[\\x{4e00}-\\x{9fff}]')), 0) AS BIGINT) AS score_zh"
    )
    scores = ",\n    ".join(marker_exprs)
    # argmax with fixed priority order zh > en > es > de > fr, 'und' if all 0
    return f"""
WITH s AS (SELECT doc_id, {scores} FROM documents)
SELECT doc_id, score_zh, score_en, score_es, score_de, score_fr,
  CASE WHEN greatest(score_zh, score_en, score_es, score_de, score_fr) <= 0
       THEN 'und'
       WHEN score_zh >= score_en AND score_zh >= score_es
            AND score_zh >= score_de AND score_zh >= score_fr THEN 'zh'
       WHEN score_en >= score_es AND score_en >= score_de
            AND score_en >= score_fr THEN 'en'
       WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
       WHEN score_de >= score_fr THEN 'de'
       ELSE 'fr' END AS predicted_lang
FROM s
"""


def _oracle_pool_core() -> dict[str, str]:
    return {
        "rollup_pricing": """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
  CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
    AS sum_disc_cents,
  round(avg(l_quantity), 4) AS avg_qty,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        "anti_join_skip": """
SELECT c_custkey, c_name, CAST(floor(c_acctbal*100) AS BIGINT) AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""",
        "window_first_passing": """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
    row_number() OVER (PARTITION BY l_orderkey
      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn
  FROM lineitem WHERE l_quantity >= 25)
WHERE rn = 1
""",
        "argmax_consensus": """
SELECT l_orderkey, l_partkey AS best_partkey,
       CAST(floor(l_extendedprice*100) AS BIGINT) AS best_price_cents FROM (
  SELECT *, row_number() OVER (PARTITION BY l_orderkey
    ORDER BY l_extendedprice DESC, l_linenumber, l_partkey, l_suppkey) AS rn
  FROM lineitem)
WHERE rn = 1
""",
        "topk_attempts": """
SELECT l_returnflag, CAST(rk AS INT) AS rk, l_orderkey,
       CAST(floor(l_extendedprice*100) AS BIGINT) AS price_cents FROM (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey,
             l_suppkey) AS rk
  FROM lineitem)
WHERE rk <= 3
""",
        "union_escalation": """
SELECT o_orderkey, 'hard' AS tier, CAST(floor(o_totalprice*100) AS BIGINT)
  AS price_cents FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, 'escalated' AS tier, CAST(floor(o_totalprice*100) AS BIGINT)
  AS price_cents FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 150000
""",
        "selfjoin_pairwise": """
SELECT a.l_returnflag AS l_returnflag, count(*) AS n_pairs,
  round(avg(abs(CAST(floor(a.l_extendedprice*100) AS BIGINT)
              - CAST(floor(b.l_extendedprice*100) AS BIGINT))), 4)
    AS avg_absdiff_cents
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
GROUP BY a.l_returnflag
""",
        "ordered_assembly": """
SELECT l_orderkey,
  string_agg(CAST(l_partkey AS VARCHAR), '|'
    ORDER BY l_linenumber, l_partkey, l_suppkey,
             CAST(floor(l_extendedprice*100) AS BIGINT), l_quantity)
    AS parts_concat,
  count(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
""",
        "fanout_chunk": """
SELECT p_partkey, CAST(chunk_id AS INT) AS chunk_id,
       CAST((chunk_id-1)*10 + 1 AS INT) AS chunk_start,
       CAST(least(chunk_id*10, p_size) AS INT) AS chunk_end
FROM (SELECT p_partkey, p_size,
        unnest(generate_series(1, CAST(ceil(p_size/10.0) AS INT))) AS chunk_id
      FROM part)
""",
        "join_broadcast_rollup": """
SELECT r_name,
  CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
    AS revenue_cents,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
""",
        "skew_twostage_rollup": """
SELECT l_returnflag, count(*) AS n,
  CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM lineitem GROUP BY l_returnflag
""",
        "classify_priority": """
WITH p AS (
  SELECT user_id, event_type,
    CASE event_type WHEN 'error' THEN 6 WHEN 'purchase' THEN 5
      WHEN 'signup' THEN 4 WHEN 'click' THEN 3 WHEN 'view' THEN 2
      ELSE 1 END AS priority
  FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY priority DESC, event_type) AS rn FROM p)
SELECT user_id, max(priority) AS max_priority,
       max(CASE WHEN rn = 1 THEN event_type END) AS primary_mode,
       count(*) AS n_events
FROM r GROUP BY user_id
""",
        "json_extract_rollup": """
SELECT event_type, count(*) AS n,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
FROM events GROUP BY event_type
""",
        "merge_latest_state": """
SELECT user_id, event_type AS last_event_type,
       CAST(floor(value*100) AS BIGINT) AS last_value_cents,
       epoch_us(ts) AS last_ts_us FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
WHERE rn = 1
""",
        "setop_untried": """
WITH all_t AS (SELECT list_sort(list(DISTINCT event_type)) AS all_types FROM events),
used AS (SELECT user_id, list_sort(list(DISTINCT event_type)) AS used
         FROM events GROUP BY user_id)
SELECT user_id,
  coalesce(
    array_to_string(list_filter(all_types, x -> NOT list_contains(used, x)), ','),
    '') AS untried_csv,
  CAST(len(used) AS INT) AS n_used
FROM used CROSS JOIN all_t
""",
        "score_levenshtein": """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
  round(1 - levenshtein(a.text, b.text)
          / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE), 4) AS nes
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
""",
        "normalize_battery": """
WITH m AS (SELECT doc_id,
  '“quoted” — dash’s' || e'\\r\\n\\r\\n\\r\\n\\r\\n  ' || text
    || e'   \\r\\n' || 'tail   ' AS c
  FROM documents),
n AS (SELECT doc_id,
  trim(
    regexp_replace(
      translate(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(c, '\\r\\n', e'\\n', 'g'),
              '\\r', e'\\n', 'g'),
            '[ \\t]+\\n', e'\\n', 'g'),
          '\\n{3,}', e'\\n\\n', 'g'),
        '‘’“”', '''''""'),
      '—', '--', 'g')) AS normalized
  FROM m)
SELECT doc_id, normalized FROM n
""",
        "audit_battery": f"""
WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
m AS (SELECT doc_id, text,
  CAST(len(toks) AS BIGINT) AS word_count,
  length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS nonspace
  FROM t),
s AS (SELECT doc_id, word_count,
  round(CASE WHEN word_count > 0
        THEN nonspace / CAST(word_count AS DOUBLE) ELSE 0.0 END, 4)
    AS avg_word_len,
  round(CASE WHEN length(text) > 0 THEN
    CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\x0b\\f\\r.,;:!?''"()-]', '', 'g'))
      AS DOUBLE) / length(text) ELSE 1.0 END, 4) AS garbage_ratio,
  regexp_matches(lower(text), 'i cannot|i can''t|unable to process|as an ai')
    AS refusal_hit
  FROM m)
SELECT doc_id, word_count, avg_word_len, garbage_ratio, refusal_hit,
  (word_count >= 50 AND avg_word_len >= 2.0 AND avg_word_len <= 15.0
   AND garbage_ratio <= 0.15 AND NOT refusal_hit) AS audit_passed
FROM s
""",
        "calibration_rollup": f"""
WITH t AS (SELECT lang, source,
  CAST(len({_TOKS_SQL}) AS BIGINT) AS wc FROM documents)
SELECT lang, source, count(*) AS n_docs,
  CAST(sum(wc) AS BIGINT) AS total_words,
  round(CAST(sum(wc) AS DOUBLE) / count(*), 4) AS avg_words,
  CAST(sum(CASE WHEN wc >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_floor
FROM t GROUP BY lang, source
""",
        "latex_blocks": """
WITH t AS (SELECT doc_id,
  'intro $$x_' || CAST(doc_id AS VARCHAR) || ' + y$$ middle text $$\\frac{a}{'
    || CAST(doc_id AS VARCHAR) || '}$$ tail' AS latexy
  FROM documents),
b AS (SELECT doc_id,
  regexp_extract_all(latexy, '\\$\\$(.*?)\\$\\$', 1) AS blocks FROM t)
SELECT doc_id, CAST(len(blocks) AS INT) AS n_blocks,
  array_to_string(blocks, '|') AS blocks_csv
FROM b
""",
        "text_token_stats": f"""
WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS token_count,
  CAST(len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS BIGINT)
    AS bpe_token_count,
  CAST(length(text) AS BIGINT) AS char_count,
  round(CASE WHEN len(toks) > 0 THEN
    CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT)))
         AS DOUBLE) / len(toks) ELSE 0.0 END, 4) AS avg_token_len
FROM t
""",
        "text_lang_id": _lang_id_oracle(),
        "text_quality": f"""
WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks,
  CAST(length(text) AS BIGINT) AS n_chars FROM documents),
m AS (SELECT doc_id, toks, n_chars,
  CASE WHEN n_chars > 0 THEN
    CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\x0b\\f\\r.,;:!?''"()-]', '', 'g'))
      AS DOUBLE) / n_chars ELSE 1.0 END AS garbage,
  CASE WHEN n_chars > 0 THEN
    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / n_chars
    ELSE 0.0 END AS punct,
  len(regexp_extract_all(lower(text), '\\bthe\\b'))
  + len(regexp_extract_all(lower(text), '\\ba\\b'))
  + len(regexp_extract_all(lower(text), '\\ban\\b'))
  + len(regexp_extract_all(lower(text), '\\bof\\b'))
  + len(regexp_extract_all(lower(text), '\\bto\\b'))
  + len(regexp_extract_all(lower(text), '\\band\\b'))
  + len(regexp_extract_all(lower(text), '\\bin\\b'))
  + len(regexp_extract_all(lower(text), '\\bis\\b'))
  + len(regexp_extract_all(lower(text), '\\bit\\b')) AS stop_hits
  FROM t)
SELECT doc_id, round(garbage, 4) AS garbage_ratio, round(punct, 4) AS punct_ratio,
  round(CASE WHEN len(toks) > 0 THEN stop_hits / CAST(len(toks) AS DOUBLE)
        ELSE 0.0 END, 4) AS stopword_ratio,
  round(
    0.4 * least(len(toks) / 100.0, 1.0)
    + 0.3 * (1.0 - least(garbage * 5, 1.0))
    + 0.2 * least(CASE WHEN len(toks) > 0 THEN stop_hits / CAST(len(toks) AS DOUBLE)
                  ELSE 0.0 END * 4, 1.0)
    + 0.1 * (1.0 - least(punct * 5, 1.0)), 4) AS quality_score
FROM m
""",
        # chained redaction replays functions/text_analysis.PII_PATTERNS
        # in order (email -> ip -> phone); each count is on the text AS
        # OF that stage of the chain (= replacements actually made),
        # exactly like with_pii_redaction (ADVICE r3)
        "text_redact_pii": """
WITH t AS (SELECT doc_id,
  text || ' Contact user' || doc_id
       || '@example.com or call (555) 123-4567; host 192.168.0.'
       || (doc_id % 250) || ' .' AS text
  FROM documents),
r1 AS (SELECT doc_id, text,
  regexp_replace(text,
    '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
    '<EMAIL>', 'g') AS s1 FROM t),
r2 AS (SELECT doc_id, text, s1,
  regexp_replace(s1,
    '\\b(?:(?:25[0-5]|2[0-4]\\d|1?\\d?\\d)\\.){3}(?:25[0-5]|2[0-4]\\d|1?\\d?\\d)\\b',
    '<IP>', 'g') AS s2
  FROM r1),
r3 AS (SELECT doc_id, text, s1, s2,
  regexp_replace(s2,
    '(?:\\+?\\d{1,2}[ .\\-])?\\(?\\d{3}\\)?[ .\\-]\\d{3}[ .\\-]\\d{4}\\b',
    '<PHONE>', 'g') AS redacted FROM r2)
SELECT doc_id, redacted,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')) AS INTEGER)
    AS n_email,
  CAST(len(regexp_extract_all(s1,
    '\\b(?:(?:25[0-5]|2[0-4]\\d|1?\\d?\\d)\\.){3}(?:25[0-5]|2[0-4]\\d|1?\\d?\\d)\\b'))
    AS INTEGER) AS n_ipv4,
  CAST(len(regexp_extract_all(s2,
    '(?:\\+?\\d{1,2}[ .\\-])?\\(?\\d{3}\\)?[ .\\-]\\d{3}[ .\\-]\\d{4}\\b'))
    AS INTEGER) AS n_phone
FROM r3
""",
        # the text_quality ladder + curation filter: quality floor 0.45,
        # token floor 20, language allowlist
        "quality_keep_list": f"""
WITH t AS (SELECT doc_id, lang, text, {_TOKS_SQL} AS toks,
  CAST(length(text) AS BIGINT) AS n_chars FROM documents),
m AS (SELECT doc_id, lang, toks, n_chars,
  CASE WHEN n_chars > 0 THEN
    CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\x0b\\f\\r.,;:!?''"()-]', '', 'g'))
      AS DOUBLE) / n_chars ELSE 1.0 END AS garbage,
  CASE WHEN n_chars > 0 THEN
    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / n_chars
    ELSE 0.0 END AS punct,
  len(regexp_extract_all(lower(text), '\\bthe\\b'))
  + len(regexp_extract_all(lower(text), '\\ba\\b'))
  + len(regexp_extract_all(lower(text), '\\ban\\b'))
  + len(regexp_extract_all(lower(text), '\\bof\\b'))
  + len(regexp_extract_all(lower(text), '\\bto\\b'))
  + len(regexp_extract_all(lower(text), '\\band\\b'))
  + len(regexp_extract_all(lower(text), '\\bin\\b'))
  + len(regexp_extract_all(lower(text), '\\bis\\b'))
  + len(regexp_extract_all(lower(text), '\\bit\\b')) AS stop_hits
  FROM t),
s AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS token_count,
  round(
    0.4 * least(len(toks) / 100.0, 1.0)
    + 0.3 * (1.0 - least(garbage * 5, 1.0))
    + 0.2 * least(CASE WHEN len(toks) > 0 THEN stop_hits / CAST(len(toks) AS DOUBLE)
                  ELSE 0.0 END * 4, 1.0)
    + 0.1 * (1.0 - least(punct * 5, 1.0)), 4) AS quality_score
  FROM m)
SELECT doc_id, lang, token_count, quality_score
FROM s
WHERE quality_score >= 0.45 AND token_count >= 20
  AND lang IN ('en', 'de', 'es')
""",
        "dedup_exact": """
SELECT md5(text) AS text_md5, min(doc_id) AS canonical_id,
       count(*) AS dup_count
FROM documents GROUP BY md5(text)
""",
        "dedup_ngram_jaccard": f"""
WITH sh AS ({_SHINGLES_SQL}),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, shared, ca.n_sh AS n_a, cb.n_sh AS n_b,
  round(shared / CAST(ca.n_sh + cb.n_sh - shared AS DOUBLE), 4) AS jaccard
FROM pairs JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
WHERE round(shared / CAST(ca.n_sh + cb.n_sh - shared AS DOUBLE), 4) >= 0.8
""",
        "dedup_minhash": _minhash_oracle(),
        "dedup_minhash_lsh_pairs": _minhash_lsh_pairs_oracle(),
        "dedup_components": _dedup_components_oracle(),
        "dedup_keep_list": f"""
SELECT d.doc_id, d.lang FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM ({_dedup_components_oracle()}) c
  WHERE NOT c.is_canonical)
""",
        # exact N^2 oracle is valid for the LSH-gated Spark plan: the
        # only >= 0.99 pairs are the scaled mirrors, whose buckets are
        # identical by scale-invariance (see q_dedup_embedding_neardup)
        "dedup_embedding_neardup": """
WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
u AS (
  SELECT vec_id, v FROM e
  UNION ALL
  SELECT vec_id + 1000000, list_transform(v, x -> x * 2.0)
  FROM e WHERE vec_id % 10 = 0),
n AS (SELECT vec_id, v,
        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM u)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(max(list_dot_product(a.v, b.v) / (a.nrm * b.nrm)), 4)
         AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE a.nrm > 0 AND b.nrm > 0
  AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.99
GROUP BY 1, 2
""",
        "dedup_simhash64_pairs": _SIMHASH64_PAIRS_SQL,
        "ann_lsh_topk": _ANN_LSH_SQL,
        "ann_ivf_topk": _ANN_IVF_SQL,
        "text_winnow_fingerprint": _WINNOW_SQL,
        # thresholds are the EXACT integers Spark computes —
        # int(frac * 2^32) truncates while CAST(frac * 2^32 AS UBIGINT)
        # rounds, an off-by-one that would keep a 1-in-2^32 hash value
        # on one side only
        "sample_stratified": f"""
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5('r2:' || doc_id), 1, 8))::UBIGINT
  < CASE lang WHEN 'en' THEN {int(0.5 * 4294967296)}::UBIGINT
              WHEN 'zh' THEN {int(0.25 * 4294967296)}::UBIGINT
              ELSE {int(0.1 * 4294967296)}::UBIGINT END
""",
        "contamination_report": f"""
WITH h AS (
  SELECT doc_id, text,
    ('0x' || substr(md5('eval:' || doc_id), 1, 8))::UBIGINT AS hv
  FROM documents),
ev AS (SELECT doc_id, text FROM h
       WHERE hv < {int(0.2 * 4294967296)}::UBIGINT),
tr AS (SELECT doc_id, text FROM h
       WHERE hv >= {int(0.2 * 4294967296)}::UBIGINT),
evsh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(t) >= 8 THEN
      list_transform(generate_series(1, len(t) - 7),
        i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                            t[i+4], t[i+5], t[i+6], t[i+7]))
    ELSE [] END)) AS shingle
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM ev)),
trsh AS (
  SELECT DISTINCT shingle FROM (
    SELECT unnest(list_distinct(
      CASE WHEN len(t) >= 8 THEN
        list_transform(generate_series(1, len(t) - 7),
          i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                              t[i+4], t[i+5], t[i+6], t[i+7]))
      ELSE [] END)) AS shingle
    FROM (SELECT {_TOKS_SQL} AS t FROM tr))),
per AS (SELECT doc_id, count(*) AS n_shingles FROM evsh GROUP BY doc_id),
hits AS (
  SELECT e.doc_id, count(*) AS n_contaminated
  FROM evsh e JOIN trsh t ON t.shingle = e.shingle
  GROUP BY e.doc_id)
SELECT p.doc_id, p.n_shingles,
  coalesce(hi.n_contaminated, 0) AS n_contaminated,
  round(coalesce(hi.n_contaminated, 0) / CAST(p.n_shingles AS DOUBLE), 4)
    AS contamination
FROM per p LEFT JOIN hits hi ON hi.doc_id = p.doc_id
""",
        # k-means with k=8, 2 Lloyd rounds unrolled: seeds = 8 smallest
        # md5(vec_id); assignment = cosine argmax (ties -> lower cluster);
        # update = exact floor(x*1e9) means rounded to 4 (same convention
        # as embedding_centroids).  Empty/zero clusters drop out of the
        # candidate set on both sides.
        "kmeans_clusters": "WITH " + _KMEANS_CTES + """
SELECT vec_id, CAST(cl AS INT) AS cluster,
  round(cos, 4) + 0.0 AS cosine
FROM a1
""",
        # The 5-phase pipeline's status ladder replayed in SQL for the
        # identity-wrapped corpus (layout text == documents.text):
        #   success        = audit passes on the text (first_passing)
        #   success_native = audit fails but the born-digital cascade
        #                    accepts the text layer
        #   partial        = neither, non-empty final text
        # Audit conditions mirror the audit_battery oracle; born-digital
        # conditions mirror kernel/assess.py:80-155 (char/word floors,
        # CID, source-garbage, space ratio, avg word length band).
        "extract_pipeline_report": f"""
WITH t AS (SELECT doc_id, lang, text, {_TOKS_SQL} AS toks FROM documents),
m AS (SELECT doc_id, lang, text,
    CAST(len(toks) AS BIGINT) AS word_count,
    length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS nonspace,
    length(text) AS char_count
  FROM t),
s AS (SELECT doc_id, lang, text, word_count, char_count,
    round(CASE WHEN word_count > 0
          THEN nonspace / CAST(word_count AS DOUBLE) ELSE 0.0 END, 4) AS awl,
    round(CASE WHEN char_count > 0 THEN
      CAST(length(regexp_replace(text,
        '[a-zA-Z0-9 \\t\\n\\x0b\\f\\r.,;:!?''"()-]', '', 'g'))
        AS DOUBLE) / char_count ELSE 1.0 END, 4) AS garbage_ratio,
    regexp_matches(lower(text), 'i cannot|i can''t|unable to process|as an ai')
      AS refusal_hit,
    regexp_matches(text, '\\(cid:[0-9]+\\)') AS cid_hit,
    CASE WHEN char_count > 0 THEN
      CAST(char_count - length(replace(text, ' ', '')) AS DOUBLE) / char_count
      ELSE 0.0 END AS space_ratio,
    CASE WHEN char_count > 0 THEN
      CAST(len(regexp_extract_all(text,
        '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]|\\x{{fffd}}|[\\x{{e000}}-\\x{{f8ff}}]'))
        AS DOUBLE) / char_count ELSE 0.0 END AS src_garbage
  FROM m),
cls AS (SELECT s.doc_id, s.lang,
    (s.word_count >= 50 AND s.awl >= 2.0 AND s.awl <= 15.0
     AND s.garbage_ratio <= 0.15 AND NOT s.refusal_hit) AS audit_passed,
    (s.char_count >= 50 AND s.word_count >= 15 AND NOT s.cid_hit
     AND s.src_garbage <= 0.05 AND s.space_ratio <= 0.6
     AND m.nonspace / CAST(greatest(s.word_count, 1) AS DOUBLE) >= 2.5
     AND m.nonspace / CAST(greatest(s.word_count, 1) AS DOUBLE) <= 20.0)
      AS born_digital,
    s.char_count
  FROM s JOIN m ON m.doc_id = s.doc_id),
st AS (SELECT doc_id, lang, audit_passed,
    CASE WHEN audit_passed THEN 'success'
         WHEN born_digital THEN 'success_native'
         WHEN char_count > 0 THEN 'partial'
         ELSE 'empty' END AS status,
    CASE WHEN audit_passed THEN 'layout'
         WHEN born_digital THEN 'native'
         ELSE 'layout' END AS selected_variant
  FROM cls)
SELECT lang, status, selected_variant,
  count(*) AS n_docs,
  CAST(sum(CASE WHEN audit_passed THEN 1 ELSE 0 END) AS BIGINT)
    AS n_audit_pass
FROM st GROUP BY lang, status, selected_variant
ORDER BY lang, status, selected_variant
""",
        # same identity ladder, but every doc_id % 37 == 5 payload was
        # swapped for a 2-page image-only PDF: those rows must land in
        # failed_scanned with 2 images each; the rest follow the ladder.
        "extract_scanned_report": f"""
WITH t AS (SELECT doc_id, lang, text, {_TOKS_SQL} AS toks FROM documents
           WHERE doc_id % 37 <> 5),
m AS (SELECT doc_id, lang, text,
    CAST(len(toks) AS BIGINT) AS word_count,
    length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS nonspace,
    length(text) AS char_count
  FROM t),
s AS (SELECT doc_id, lang, text, word_count, char_count,
    round(CASE WHEN word_count > 0
          THEN nonspace / CAST(word_count AS DOUBLE) ELSE 0.0 END, 4) AS awl,
    round(CASE WHEN char_count > 0 THEN
      CAST(length(regexp_replace(text,
        '[a-zA-Z0-9 \\t\\n\\x0b\\f\\r.,;:!?''"()-]', '', 'g'))
        AS DOUBLE) / char_count ELSE 1.0 END, 4) AS garbage_ratio,
    regexp_matches(lower(text), 'i cannot|i can''t|unable to process|as an ai')
      AS refusal_hit,
    regexp_matches(text, '\\(cid:[0-9]+\\)') AS cid_hit,
    CASE WHEN char_count > 0 THEN
      CAST(char_count - length(replace(text, ' ', '')) AS DOUBLE) / char_count
      ELSE 0.0 END AS space_ratio,
    CASE WHEN char_count > 0 THEN
      CAST(len(regexp_extract_all(text,
        '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]|\\x{{fffd}}|[\\x{{e000}}-\\x{{f8ff}}]'))
        AS DOUBLE) / char_count ELSE 0.0 END AS src_garbage
  FROM m),
cls AS (SELECT s.doc_id, s.lang,
    (s.word_count >= 50 AND s.awl >= 2.0 AND s.awl <= 15.0
     AND s.garbage_ratio <= 0.15 AND NOT s.refusal_hit) AS audit_passed,
    (s.char_count >= 50 AND s.word_count >= 15 AND NOT s.cid_hit
     AND s.src_garbage <= 0.05 AND s.space_ratio <= 0.6
     AND m.nonspace / CAST(greatest(s.word_count, 1) AS DOUBLE) >= 2.5
     AND m.nonspace / CAST(greatest(s.word_count, 1) AS DOUBLE) <= 20.0)
      AS born_digital,
    s.char_count
  FROM s JOIN m ON m.doc_id = s.doc_id),
st AS (SELECT doc_id,
    CASE WHEN audit_passed THEN 'success'
         WHEN born_digital THEN 'success_native'
         WHEN char_count > 0 THEN 'partial'
         ELSE 'empty' END AS status
  FROM cls),
html_side AS (SELECT status, count(*) AS n_docs,
              CAST(0 AS BIGINT) AS n_images,
              CAST(0 AS BIGINT) AS n_raster
              FROM st GROUP BY status),
scan_side AS (SELECT
              CASE WHEN doc_id % 74 = 5 THEN 'success'
                   ELSE 'failed_scanned' END AS status,
              count(*) AS n_docs,
              CAST(2 * count(*) AS BIGINT) AS n_images,
              CAST(sum(CASE WHEN doc_id % 74 = 5 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_raster
              FROM documents WHERE doc_id % 37 = 5 GROUP BY 1)
SELECT status, CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(n_images) AS BIGINT) AS n_images,
       CAST(sum(n_raster) AS BIGINT) AS n_raster_recovered
FROM (SELECT * FROM html_side UNION ALL
      SELECT * FROM scan_side WHERE n_docs > 0)
GROUP BY status
ORDER BY status
""",
        "reconcile_latex": """
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN
    replace(text || e'\\n\\nEq: $$ x + y = ' || doc_id || e' $$\\n\\nEnd.',
            '$$ x + y = ' || doc_id || ' $$',
            '$$x+y=' || doc_id || '$$')
  ELSE
    replace('The result for doc ' || doc_id || ' is given by: the following.',
            'given by:',
            e'given by:\\n\\n$$E_' || doc_id || e' = m c^2$$\\n\\n')
  END AS merged_text,
  CAST(1 AS INT) AS n_latex_merged
FROM documents
""",
        "consensus_discrepancies": f"""
WITH t AS (SELECT doc_id, len({_TOKS_SQL}) AS wc FROM documents),
d AS (SELECT doc_id,
  (CASE WHEN doc_id % 3 = 0 AND wc > 0
        THEN ['Word count spread: density=' || (wc * 2) || ', layout=' || wc]
        ELSE [] END)
  || (CASE WHEN doc_id % 2 = 1
        THEN ['Audit divergence: passed=[layout], failed=[density]']
        ELSE [] END) AS discs
  FROM t)
SELECT doc_id, CAST(len(discs) AS INT) AS n_discrepancies,
       coalesce(array_to_string(discs, ' || '), '') AS discs_concat
FROM d
""",
        "ann_cosine_topk": """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
n AS (SELECT vec_id, v,
        sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
p AS (SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
        list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.nrm > 0 AND c.nrm > 0),
r AS (SELECT query_id, nbr_id, cos,
        row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, nbr_id ASC) AS rank FROM p)
SELECT query_id, CAST(rank AS INT) AS rank, nbr_id, round(cos, 4) AS cosine
FROM r WHERE rank <= 5
""",
        "figures_fanout": """
SELECT doc_id,
  CAST(1 AS INT) AS figure_num, CAST(1 AS INT) AS page_num,
  'drawing' AS figure_type,
  CAST(100 + (doc_id % 50) * 2 AS DOUBLE) AS x0,
  CAST(200 + (doc_id % 30) * 3 AS DOUBLE) AS y0,
  CAST(100 + (doc_id % 50) * 2 + 200 + doc_id % 80 AS DOUBLE) AS x1,
  CAST(200 + (doc_id % 30) * 3 + 200 + doc_id % 60 AS DOUBLE) AS y1
FROM documents
""",
        # the interleaved figure-embedded assembly: byte-identical body
        # (first 60 chars, mirroring the builder's [:60]) + the appended
        # **Figure 1** block whose stub caption is the planted WxH
        # geometry; rstrip/has_text pinned to the ASCII whitespace class
        # on both engines (operators/extract.with_figure_embed)
        "figures_embed_text": """
WITH f AS (
  SELECT doc_id, substr(text, 1, 60) AS body,
    200 + doc_id % 80 AS w, 200 + doc_id % 60 AS h
  FROM documents)
SELECT doc_id,
  CASE WHEN length(regexp_replace(body, '[ \\t\\n\\x0b\\f\\r]', '', 'g')) > 0
  THEN rtrim(body, e' \\t\\n\\x0b\\f\\r')
    || e'\\n\\n**Figure 1** (page 1): [stub] drawing region, '
    || CAST(w AS INT) || 'x' || CAST(h AS INT)
    || e' pt\\n\\n![Figure 1](figures/figure_1_page1.png)'
  ELSE body END AS final_text
FROM f
""",
        "extract_roundtrip": """
SELECT doc_id, text AS final_text FROM documents
""",
        "extract_pdf_roundtrip": """
SELECT doc_id, text AS final_text FROM documents
""",
        "multimodal_meta": """
SELECT concat('media://', doc_id) AS url, 'image' AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS byte_size,
  sha256(text) AS sha256,
  CASE WHEN octet_length(encode(text)) = 0 THEN 'empty' ELSE 'unknown' END AS format
FROM documents
""",
        "extract_multipage_assembly": """
WITH t AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS toks
  FROM documents),
c AS (
  SELECT doc_id, toks, CAST(ceil(len(toks) / 3.0) AS INT) AS k
  FROM t WHERE len(toks) >= 3)
SELECT doc_id,
  array_to_string(toks[1:k], ' ')
    || e'\n\n---\n\n' || array_to_string(toks[k+1:2*k], ' ')
    || e'\n\n---\n\n' || array_to_string(toks[2*k+1:len(toks)], ' ')
    AS assembled,
  CAST(3 AS INT) AS n_pages
FROM c
""",
    }


# Shared CTE body (no WITH prefix, so callers can prepend RECURSIVE):
# two exact-sum Lloyd rounds from md5-order seeds — the deterministic
# k-means derivation the kmeans_clusters oracle has always used, now
# also composed into the semantic_dedup oracle.
_KMEANS_CTES = """
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
             AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      FROM e),
nn AS (SELECT * FROM n WHERE nrm > 0),
seeds AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           - 1 AS cl, v
  FROM nn
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
c0 AS (SELECT cl, unnest(v) AS cv, generate_subscripts(v, 1) AS idx
       FROM seeds),
c0n AS (SELECT cl, sqrt(sum(cv * cv)) AS cn FROM c0 GROUP BY cl
        HAVING sqrt(sum(cv * cv)) > 0),
el AS (SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS idx
       FROM nn),
a0dot AS (
  SELECT el.vec_id, c0.cl, sum(el.val * c0.cv) AS dot
  FROM el JOIN c0 ON c0.idx = el.idx
  GROUP BY 1, 2),
a0 AS (
  SELECT vec_id, cl FROM (
    SELECT a.vec_id, a.cl,
      row_number() OVER (PARTITION BY a.vec_id
        ORDER BY a.dot / (nn.nrm * cn.cn) DESC, a.cl ASC) AS rn
    FROM a0dot a
    JOIN nn ON nn.vec_id = a.vec_id
    JOIN c0n cn ON cn.cl = a.cl)
  WHERE rn = 1),
c1 AS (
  SELECT a0.cl, el.idx,
    round(CAST(sum(CAST(floor(el.val * 1e9) AS BIGINT)) AS DOUBLE)
          / 1e9 / count(*), 4) + 0.0 AS cv
  FROM a0 JOIN el ON el.vec_id = a0.vec_id
  GROUP BY a0.cl, el.idx),
c1n AS (SELECT cl, sqrt(sum(cv * cv)) AS cn FROM c1 GROUP BY cl
        HAVING sqrt(sum(cv * cv)) > 0),
a1dot AS (
  SELECT el.vec_id, c1.cl, sum(el.val * c1.cv) AS dot
  FROM el JOIN c1 ON c1.idx = el.idx
  GROUP BY 1, 2),
a1 AS (
  SELECT vec_id, cl, cos FROM (
    SELECT a.vec_id, a.cl, a.dot / (nn.nrm * cn.cn) AS cos,
      row_number() OVER (PARTITION BY a.vec_id
        ORDER BY a.dot / (nn.nrm * cn.cn) DESC, a.cl ASC) AS rn
    FROM a1dot a
    JOIN nn ON nn.vec_id = a.vec_id
    JOIN c1n cn ON cn.cl = a.cl)
  WHERE rn = 1)
"""

# Shared CTE prefix: plant the messy URLs (mirror of _planted_url_col)
# and canonicalize them with DuckDB's own regexp chain.
_URL_CANON_SQL = """
WITH u AS (SELECT doc_id,
  'https://Site' || ((doc_id // 2) % 50) || '.Example.ORG'
  || CASE WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END
  || '/Articles/item' || (doc_id // 2)
  || CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END
  || CASE WHEN doc_id % 2 = 1
       THEN '?utm_source=feed&id=' || (doc_id // 2) || '&b=2'
       ELSE '?b=2&id=' || (doc_id // 2) END
  || CASE WHEN doc_id % 3 = 0 THEN '#sec' || doc_id ELSE '' END AS url
  FROM documents),
parts AS (SELECT doc_id,
  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS proto,
  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1))
    AS hostport,
  regexp_replace(
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1),
    '/+$', '') AS path,
  -- fragment stripped BEFORE query extraction: '#/route?x=1' carries
  -- no query (mirrors functions/urls.canonical_url_col)
  regexp_extract(regexp_replace(url, '#.*$', ''), '\\?(.*)$', 1) AS query
  FROM u),
parts2 AS (SELECT doc_id, proto,
  regexp_replace(hostport, ':[0-9]+$', '') AS host,
  regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
  path,
  array_to_string(list_sort(list_filter(string_split(query, '&'),
    x -> x <> '' AND NOT regexp_matches(x,
      '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref|mc_cid|mc_eid)(=|$)'))), '&')
    AS q
  FROM parts),
canon AS (SELECT doc_id, host,
  proto || '://'
  || CASE WHEN port <> '' AND NOT ((proto = 'http' AND port = '80')
                                   OR (proto = 'https' AND port = '443'))
       THEN host || ':' || port ELSE host END
  || path
  || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url
  FROM parts2)
"""


# Shared CTE prefix for the Gopher repetition metrics (consumed by the
# text_repetition oracle and recombined inside curation_funnel).
_REPETITION_CTES = """
WITH lines AS (
  SELECT doc_id, u, length(u) AS len FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS u
    FROM documents)
  WHERE length(trim(u)) > 0),
lg AS (SELECT doc_id, u, count(*) AS k, any_value(len) AS len
       FROM lines GROUP BY doc_id, u),
lstat AS (SELECT doc_id,
    CAST(sum(k - 1) AS DOUBLE) / sum(k) AS dup_line_frac,
    CAST(sum((k - 1) * len) AS DOUBLE) / sum(k * len)
      AS dup_line_char_frac
  FROM lg GROUP BY doc_id),
paras AS (
  SELECT doc_id, u, length(u) AS len FROM (
    SELECT doc_id, unnest(string_split(text, chr(10) || chr(10))) AS u
    FROM documents)
  WHERE length(trim(u)) > 0),
pg AS (SELECT doc_id, u, count(*) AS k, any_value(len) AS len
       FROM paras GROUP BY doc_id, u),
pstat AS (SELECT doc_id,
    CAST(sum(k - 1) AS DOUBLE) / sum(k) AS dup_para_frac,
    CAST(sum((k - 1) * len) AS DOUBLE) / sum(k * len)
      AS dup_para_char_frac
  FROM pg GROUP BY doc_id),
t AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'),
                x -> x <> '') AS toks,
    length(regexp_replace(text, '[ \t\n\x0b\f\r]', '', 'g')) AS nonspace
  FROM documents),
gg AS (SELECT doc_id, nonspace,
    unnest(list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i + 1])) AS gram
  FROM t WHERE len(toks) >= 2),
gcnt AS (SELECT doc_id, gram, count(*) AS k, any_value(nonspace) AS ns
         FROM gg GROUP BY doc_id, gram),
ranked AS (SELECT doc_id, k, gram, ns,
    row_number() OVER (PARTITION BY doc_id ORDER BY k DESC, gram ASC)
      AS rn
  FROM gcnt),
top AS (SELECT doc_id,
    CASE WHEN ns > 0
      THEN round(k * length(replace(gram, ' ', '')) / CAST(ns AS DOUBLE), 4)
      ELSE 0.0 END AS top_2gram_char_frac
  FROM ranked WHERE rn = 1),
repm AS (SELECT d.doc_id,
  round(coalesce(l.dup_line_frac, 0.0), 4) AS dup_line_frac,
  round(coalesce(l.dup_line_char_frac, 0.0), 4) AS dup_line_char_frac,
  round(coalesce(p.dup_para_frac, 0.0), 4) AS dup_para_frac,
  round(coalesce(p.dup_para_char_frac, 0.0), 4) AS dup_para_char_frac,
  coalesce(g.top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
  (round(coalesce(l.dup_line_frac, 0.0), 4) > 0.30
   OR round(coalesce(p.dup_para_frac, 0.0), 4) > 0.30
   OR coalesce(g.top_2gram_char_frac, 0.0) > 0.20) AS repetitive
FROM documents d
LEFT JOIN lstat l ON l.doc_id = d.doc_id
LEFT JOIN pstat p ON p.doc_id = d.doc_id
LEFT JOIN top g ON g.doc_id = d.doc_id)
"""


def _oracle_pool_curation() -> dict[str, str]:
    return {
        # Gopher repetition rules: duplicate lines/paragraphs (count +
        # char share of repeated occurrences) and the deterministic
        # top-2-gram character share (ties toward the smallest gram)
        "text_repetition": _REPETITION_CTES + """
SELECT doc_id, dup_line_frac, dup_line_char_frac, dup_para_frac,
       dup_para_char_frac, top_2gram_char_frac, repetitive
FROM repm
""",
        # the full curation funnel: quality floor + Gopher repetition
        # + exact-content dedup, reported as stage-survival counts
        "curation_funnel": _REPETITION_CTES + f"""
, qm AS (SELECT doc_id, lang, text, {_TOKS_SQL} AS toks,
    CAST(length(text) AS BIGINT) AS n_chars FROM documents),
qg AS (SELECT doc_id, lang, text, toks, n_chars,
  CASE WHEN n_chars > 0 THEN
    CAST(length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\x0b\\f\\r.,;:!?''"()-]', '', 'g'))
      AS DOUBLE) / n_chars ELSE 1.0 END AS garbage,
  CASE WHEN n_chars > 0 THEN
    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / n_chars
    ELSE 0.0 END AS punct,
  len(regexp_extract_all(lower(text), '\\bthe\\b'))
  + len(regexp_extract_all(lower(text), '\\ba\\b'))
  + len(regexp_extract_all(lower(text), '\\ban\\b'))
  + len(regexp_extract_all(lower(text), '\\bof\\b'))
  + len(regexp_extract_all(lower(text), '\\bto\\b'))
  + len(regexp_extract_all(lower(text), '\\band\\b'))
  + len(regexp_extract_all(lower(text), '\\bin\\b'))
  + len(regexp_extract_all(lower(text), '\\bis\\b'))
  + len(regexp_extract_all(lower(text), '\\bit\\b')) AS stop_hits
  FROM qm),
qs AS (SELECT doc_id, lang, text,
    CAST(len(toks) AS BIGINT) AS token_count,
    round(
      0.4 * least(len(toks) / 100.0, 1.0)
      + 0.3 * (1.0 - least(garbage * 5, 1.0))
      + 0.2 * least(CASE WHEN len(toks) > 0
                      THEN stop_hits / CAST(len(toks) AS DOUBLE)
                      ELSE 0.0 END * 4, 1.0)
      + 0.1 * (1.0 - least(punct * 5, 1.0)), 4) AS quality_score
  FROM qg),
flags AS (SELECT q.doc_id,
    (q.quality_score >= 0.45 AND q.token_count >= 20
     AND q.lang IN ('en', 'de', 'es')) AS quality_ok,
    NOT r.repetitive AS repetition_ok,
    q.doc_id = min(q.doc_id) OVER (PARTITION BY q.text)
      AS content_canonical
  FROM qs q JOIN repm r ON r.doc_id = q.doc_id)
SELECT CAST(count(*) AS BIGINT) AS n_total,
  CAST(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT)
    AS n_quality_ok,
  CAST(sum(CASE WHEN repetition_ok THEN 1 ELSE 0 END) AS BIGINT)
    AS n_repetition_ok,
  CAST(sum(CASE WHEN content_canonical THEN 1 ELSE 0 END) AS BIGINT)
    AS n_content_canonical,
  CAST(sum(CASE WHEN quality_ok AND repetition_ok AND content_canonical
           THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM flags
""",
        # SemDeDup: the kmeans CTEs + within-cluster exact-cosine pairs
        # + recursive-component min-id keep
        "semantic_dedup": "WITH RECURSIVE " + _KMEANS_CTES + """
, pr AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM a1 x JOIN a1 y ON x.cl = y.cl AND x.vec_id < y.vec_id
  JOIN nn nx ON nx.vec_id = x.vec_id
  JOIN nn ny ON ny.vec_id = y.vec_id
  WHERE list_dot_product(nx.v, ny.v) / (nx.nrm * ny.nrm) >= 0.95),
edg AS (
  SELECT vec_a AS src, vec_b AS dst FROM pr
  UNION
  SELECT vec_b AS src, vec_a AS dst FROM pr),
nodes AS (SELECT DISTINCT src AS id FROM edg),
r(id, comp) AS (
  SELECT id, id AS comp FROM nodes
  UNION
  SELECT e2.dst AS id, r.comp FROM r JOIN edg e2 ON e2.src = r.id),
comp AS (SELECT id, min(comp) AS component_id FROM r GROUP BY id)
SELECT a1.vec_id, CAST(a1.cl AS INT) AS cluster,
  coalesce(c.id = c.component_id, TRUE) AS kept,
  CAST(0 AS BIGINT) AS n_nbr_dropped
FROM a1 LEFT JOIN comp c ON c.id = a1.vec_id
""",
        # corpus-trained unigram LM: top-K vocab (count desc, tok asc),
        # add-one smoothing over (N + V), OOV floor 1/(N+V)
        "text_unigram_lm": f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM (
    SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rn
    FROM cnt) WHERE rn <= 500),
tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cnt) AS n_total,
               (SELECT count(*) FROM vocab) AS v_size),
scored AS (SELECT t.doc_id, v.c, tot.n_total, tot.v_size
  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok CROSS JOIN tot),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
    round(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)
          / CAST(count(*) AS DOUBLE), 4) AS oov_rate,
    round(avg(log10((coalesce(c, 0) + 1)
                    / CAST(n_total + v_size AS DOUBLE))), 4) + 0.0
      AS avg_logprob
  FROM scored GROUP BY doc_id)
SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
  coalesce(p.oov_rate, 0.0) AS oov_rate,
  coalesce(p.avg_logprob, 0.0) AS avg_logprob
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
""",
        # ccnet head/middle/tail: per-lang tercile cutoffs over the
        # unigram-LM scores (quantile_cont == Spark percentile: both
        # linear-interpolate at p*(n-1)); CASE/NULL fall-through
        # mirrors the when-chain
        "lm_perplexity_buckets": f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM (
    SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rn
    FROM cnt) WHERE rn <= 500),
tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cnt) AS n_total,
               (SELECT count(*) FROM vocab) AS v_size),
scored AS (SELECT t.doc_id, v.c, tot.n_total, tot.v_size
  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok CROSS JOIN tot),
per AS (SELECT doc_id,
    round(avg(log10((coalesce(c, 0) + 1)
                    / CAST(n_total + v_size AS DOUBLE))), 4) + 0.0
      AS avg_logprob
  FROM scored GROUP BY doc_id),
-- inner join: docs with zero tokens have no per row (the sentinel
-- 0.0 would inflate the cutoffs); mirrors the n_tokens > 0 filter
sc AS (SELECT d.doc_id, d.lang, p.avg_logprob
  FROM documents d JOIN per p ON p.doc_id = d.doc_id),
cuts AS (SELECT lang,
    quantile_cont(avg_logprob,
                  [{1.0 / 3.0!r}, {2.0 / 3.0!r}]) AS q
  FROM sc GROUP BY lang)
SELECT sc.doc_id, sc.lang, sc.avg_logprob,
  CASE WHEN sc.avg_logprob >= q[2] THEN 'head'
       WHEN sc.avg_logprob >= q[1] THEN 'middle'
       ELSE 'tail' END AS bucket
FROM sc LEFT JOIN cuts USING (lang)
""",
        # ccnet paragraph dedup: first occurrence by (doc, pos) wins
        # corpus-wide; blanks never dedup; docs reassemble in order
        "paragraph_dedup": """
WITH t AS (SELECT doc_id,
  text || e'\\n\\n' || 'Subscribe to our newsletter for updates today'
    AS text
  FROM documents),
p AS (SELECT doc_id,
    unnest(string_split(text, e'\\n\\n')) AS para,
    generate_subscripts(string_split(text, e'\\n\\n'), 1) AS pos
  FROM t),
flagged AS (SELECT doc_id, para, pos,
    (length(trim(para)) = 0
     OR row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1)
      AS keep
  FROM p)
SELECT doc_id,
  coalesce(string_agg(CASE WHEN keep THEN para END, e'\\n\\n'
                      ORDER BY pos), '') AS cleaned_text,
  CAST(count(*) AS BIGINT) AS n_paras,
  CAST(sum(CASE WHEN keep AND length(trim(para)) > 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_kept
FROM flagged GROUP BY doc_id
""",
        # the planted-URL build + an independent regexp canonicalization
        # chain (lowercase scheme/host, default-port strip, fragment
        # drop, trailing-slash strip, tracking-param drop, param sort)
        "url_canonical_dedup": _URL_CANON_SQL + """
SELECT doc_id, canonical_url, host,
  doc_id = min(doc_id) OVER (PARTITION BY canonical_url) AS kept
FROM canon
""",
        # freshness keeper: newest (ts, id) per canonical URL via the
        # same struct-max shape the op uses (all planted ts non-NULL;
        # the NULL branch is pinned by pytest)
        "url_latest_revision": _URL_CANON_SQL + """
, wts AS (SELECT doc_id, canonical_url,
    1600000000 + (doc_id * 7919) % 100000 AS warc_ts FROM canon),
best AS (SELECT canonical_url,
    max(struct_pack(t := warc_ts, i := doc_id)) AS b
  FROM wts GROUP BY canonical_url)
SELECT w.doc_id, w.canonical_url, w.doc_id = (best.b).i AS kept
FROM wts w JOIN best USING (canonical_url)
""",
        "url_host_stats": _URL_CANON_SQL + """
, keep AS (SELECT doc_id, canonical_url, host,
    doc_id = min(doc_id) OVER (PARTITION BY canonical_url) AS kept
  FROM canon)
SELECT host, count(*) AS n_docs,
  CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_canonical,
  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM keep GROUP BY host
""",
        # robots.txt filter: the oracle bypasses text parsing (pinned
        # by pytest) and re-derives the RULE table + startswith join +
        # longest-match/allow-wins struct max directly
        "robots_filter": """
WITH u AS (SELECT doc_id,
  'site' || (doc_id % 50) || '.example.org' AS host,
  CASE doc_id % 4 WHEN 0 THEN '/private/doc' WHEN 1 THEN '/private/ok/doc'
       WHEN 2 THEN '/public/doc' ELSE '/tmpstuff/doc' END
  || doc_id AS path
  FROM documents),
rh AS (SELECT DISTINCT host FROM u WHERE doc_id % 50 < 25),
rules AS (SELECT host, rp, allow FROM rh CROSS JOIN
  (VALUES ('/private', false), ('/private/ok', true), ('/tmp', false))
  r(rp, allow)),
hits AS (SELECT doc_id,
    max(struct_pack(l := length(rp), a := allow, p := rp)) AS w
  FROM u JOIN rules USING (host)
  WHERE starts_with(path, rp)
  GROUP BY doc_id)
SELECT u.doc_id, u.host, u.path,
  coalesce(NOT (w).a, false) AS robots_blocked,
  (w).p AS matched_rule
FROM u LEFT JOIN hits ON u.doc_id = hits.doc_id
""",
        # PMI collocations: bigram-table marginals, one log10 over
        # exact counts (no float accumulation), same tie-break
        "pmi_collocations": f"""
WITH t AS (SELECT {_TOKS_SQL} AS t FROM documents),
pairs AS (SELECT t[i] AS w1, t[i+1] AS w2
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM t WHERE len(t) >= 2)),
bi AS (SELECT w1, w2, count(*) AS c_bi FROM pairs GROUP BY 1, 2),
l AS (SELECT w1, sum(c_bi) AS c_left FROM bi GROUP BY 1),
r AS (SELECT w2, sum(c_bi) AS c_right FROM bi GROUP BY 1),
tot AS (SELECT sum(c_bi) AS n_bi FROM bi),
rk AS (SELECT b.w1, b.w2, CAST(b.c_bi AS BIGINT) AS c_bi,
  (CAST(b.c_bi AS DOUBLE) * CAST(tot.n_bi AS DOUBLE))
    / (CAST(l.c_left AS DOUBLE) * CAST(r.c_right AS DOUBLE)) AS ratio
FROM bi b JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot
WHERE b.c_bi >= 5
ORDER BY ratio DESC, b.w1 ASC, b.w2 ASC
LIMIT 100)
SELECT w1, w2, c_bi, round(log10(ratio), 6) AS pmi FROM rk
""",
        # domain blocklist: re-derives host, suffix chain, join, and
        # longest-match pick with DuckDB's own list algebra
        "url_blocklist": """
WITH u AS (SELECT doc_id,
  CASE WHEN doc_id % 5 = 0 THEN 'www.'
       WHEN doc_id % 7 = 0 THEN 'm.' ELSE '' END
  || 'site' || (doc_id % 50) || '.example.org' AS host
  FROM documents),
bl(domain) AS (VALUES ('site7.example.org'), ('www.site10.example.org'),
  ('site10.example.org'), ('m.site14.example.org'), ('example.net')),
labels AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM u),
suf AS (SELECT doc_id, unnest(list_transform(
    range(CAST(greatest(1, len(ls) - 9) AS BIGINT),
          CAST(len(ls) + 1 AS BIGINT)),
    i -> array_to_string(list_slice(ls, i, len(ls)), '.'))) AS suffix
  FROM labels),
hits AS (SELECT doc_id, arg_max(domain, length(domain)) AS matched_domain
  FROM suf JOIN bl ON suffix = domain GROUP BY doc_id)
SELECT u.doc_id, u.host, hits.doc_id IS NOT NULL AS blocked,
  hits.matched_domain
FROM u LEFT JOIN hits ON u.doc_id = hits.doc_id
""",
        # the Bloom tier is plan-shape only: the oracle is the exact
        # anti-join the op must reproduce bit-for-bit
        "dedup_incremental_bloom": """
SELECT n.doc_id, n.lang, n.n_chars
FROM documents n
WHERE n.doc_id % 3 = 0
  AND n.text NOT IN (SELECT text FROM documents WHERE doc_id % 3 <> 0)
""",
        # DSIR (Xie et al. 2023): hashed unigram+bigram bag models,
        # target = lang='en' vs the raw pool, add-one smoothing over
        # the 512-bucket space, per-doc log10 likelihood ratio
        "dsir_importance": _SELFEAT_SQL + f"""
, tgt AS (SELECT bucket, count(*) AS cn FROM fb
    WHERE lang = 'en' GROUP BY bucket),
raw AS (SELECT bucket, count(*) AS cd FROM fb GROUP BY bucket),
tot AS (SELECT
    (SELECT CAST(coalesce(sum(cn), 0) AS BIGINT) FROM tgt) AS n_num,
    (SELECT CAST(coalesce(sum(cd), 0) AS BIGINT) FROM raw) AS n_den),
w AS (SELECT bucket,
    log10((coalesce(cn, 0) + 1) / CAST(n_num + 512 AS DOUBLE))
  - log10((coalesce(cd, 0) + 1) / CAST(n_den + 512 AS DOUBLE)) AS w
  FROM tgt FULL JOIN raw USING (bucket) CROSS JOIN tot),
w0 AS (SELECT log10(1 / CAST(n_num + 512 AS DOUBLE))
         - log10(1 / CAST(n_den + 512 AS DOUBLE)) AS w0 FROM tot),
per AS (SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_features,
    round(sum(coalesce(w.w, w0.w0)), 4) + 0.0 AS log_weight,
    round(avg(coalesce(w.w, w0.w0)), 4) + 0.0 AS avg_weight
  FROM fb LEFT JOIN w ON w.bucket = fb.bucket CROSS JOIN w0
  GROUP BY fb.doc_id)
SELECT d.doc_id, coalesce(p.n_features, 0) AS n_features,
  coalesce(p.log_weight, 0.0) AS log_weight,
  coalesce(p.avg_weight, 0.0) AS avg_weight
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
""",
        # NB log-odds classifier: 30%-md5-sampled labeled slice with
        # proxy label lang='en'; same hashed-feature space + smoothing
        "quality_classifier": _SELFEAT_SQL + f"""
, lab AS (SELECT doc_id, lang = 'en' AS label FROM documents
    WHERE ('0x' || substr(md5('lbl:' || doc_id), 1, 8))::UBIGINT
      < {int(0.3 * 4294967296)}::UBIGINT),
pos AS (SELECT bucket, count(*) AS cn
    FROM fb JOIN lab USING (doc_id) WHERE label GROUP BY bucket),
neg AS (SELECT bucket, count(*) AS cd
    FROM fb JOIN lab USING (doc_id) WHERE NOT label GROUP BY bucket),
tot AS (SELECT
    (SELECT CAST(coalesce(sum(cn), 0) AS BIGINT) FROM pos) AS n_num,
    (SELECT CAST(coalesce(sum(cd), 0) AS BIGINT) FROM neg) AS n_den),
w AS (SELECT bucket,
    log10((coalesce(cn, 0) + 1) / CAST(n_num + 512 AS DOUBLE))
  - log10((coalesce(cd, 0) + 1) / CAST(n_den + 512 AS DOUBLE)) AS w
  FROM pos FULL JOIN neg USING (bucket) CROSS JOIN tot),
w0 AS (SELECT log10(1 / CAST(n_num + 512 AS DOUBLE))
         - log10(1 / CAST(n_den + 512 AS DOUBLE)) AS w0 FROM tot),
per AS (SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_features,
    round(sum(coalesce(w.w, w0.w0)), 4) + 0.0 AS score,
    round(avg(coalesce(w.w, w0.w0)), 4) + 0.0 AS avg_weight
  FROM fb LEFT JOIN w ON w.bucket = fb.bucket CROSS JOIN w0
  GROUP BY fb.doc_id)
SELECT d.doc_id, coalesce(p.n_features, 0) AS n_features,
  coalesce(p.score, 0.0) AS score,
  coalesce(p.avg_weight, 0.0) AS avg_weight,
  coalesce(p.score, 0.0) > 0 AS pred
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
""",
        # Sequence packing: per-group virtual token tape, bin by start
        # offset // budget (budget 512, 8 md5-uniform groups)
        "seq_packing": f"""
WITH tk AS (SELECT doc_id,
    CAST(('0x' || substr(md5('pack:' || doc_id), 1, 8))::UBIGINT % 8
         AS BIGINT) AS group_id,
    CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (SELECT doc_id, group_id, n_tokens,
    CAST(sum(n_tokens) OVER (PARTITION BY group_id ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      AS BIGINT) AS start_offset
  FROM tk)
SELECT doc_id, group_id, n_tokens, start_offset,
  CAST(start_offset // 512 AS BIGINT) AS bin_id
FROM cum
""",
        # Mixture resampling: T = min(n/p) feasible total, per-class
        # keep threshold floor((p*T/n) * 2^32), md5-hash keep rule
        "mix_resample": """
WITH tgt(source, p) AS (VALUES
    ('src0', CAST(0.5 AS DOUBLE)),
    ('src1', CAST(0.3 AS DOUBLE)),
    ('src2', CAST(0.2 AS DOUBLE))),
cnt AS (SELECT d.source, t.p, CAST(count(*) AS DOUBLE) AS n
  FROM documents d JOIN tgt t USING (source) GROUP BY d.source, t.p),
tt AS (SELECT min(n / p) AS t_total FROM cnt),
thr AS (SELECT source,
    CAST(floor((p * t_total / n) * 4294967296.0) AS BIGINT)
      AS keep_threshold
  FROM cnt CROSS JOIN tt)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN thr USING (source)
WHERE CAST(('0x' || substr(md5('mix0:' || d.doc_id), 1, 8))::UBIGINT
           AS BIGINT) < thr.keep_threshold
""",
        # Within-doc line dedup: keep first occurrence of each content
        # line (1-based lambda index == list_position of first match);
        # whitespace-only lines are structure and always kept
        "dedup_doc_lines": """
WITH p AS (SELECT doc_id,
    text || chr(10) || 'We use cookies on this site' || chr(10) ||
    'Contact us' || chr(10) || 'We use cookies on this site' AS t
  FROM documents),
s AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM p),
k AS (SELECT doc_id, l,
    list_filter(l, (x, i) -> len(trim(x)) = 0
                             OR list_position(l, x) = i) AS kept
  FROM s)
SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept,
  array_to_string(kept, chr(10)) AS cleaned_text
FROM k
""",
        # C4 cleaning (Raffel et al. 2020): line rules = terminal
        # punctuation + >=3 words + no "javascript"; page flags =
        # >=5 sentences after cleaning, no lorem ipsum, no curly brace
        "c4_filters": """
WITH p AS (SELECT doc_id,
    text || chr(10) ||
    'This line ends with a terminal mark and enough words.' ||
    chr(10) || 'no terminal punctuation here' || chr(10) ||
    'Enable Javascript to view this content.' || chr(10) || 'Tiny.' ||
    CASE WHEN doc_id % 7 = 0
      THEN chr(10) || 'Lorem ipsum dolor sit amet, consectetur.'
      ELSE '' END ||
    CASE WHEN doc_id % 11 = 0
      THEN chr(10) || 'function f() { return 1; }'
      ELSE '' END AS t
  FROM documents),
s AS (SELECT doc_id, t, string_split(t, chr(10)) AS l FROM p),
k AS (SELECT doc_id, t, l,
    list_filter(l, x ->
        substr(trim(x), -1, 1) IN ('.', '!', '?', '"')
        AND len(list_filter(regexp_split_to_array(trim(x), '[ \t]+'),
                            w -> w <> '')) >= 3
        AND NOT contains(lower(trim(x)), 'javascript')) AS kept
  FROM s),
c AS (SELECT doc_id, t, l, kept,
    array_to_string(kept, chr(10)) AS cleaned_text,
    CAST(len(string_split_regex(array_to_string(kept, chr(10)),
                                '[.!?]')) - 1 AS BIGINT) AS n_sentences
  FROM k)
SELECT doc_id,
  CAST(len(l) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept,
  n_sentences,
  contains(lower(t), 'lorem ipsum') AS has_lorem,
  contains(t, '{') AS has_brace,
  (n_sentences >= 5 AND NOT contains(lower(t), 'lorem ipsum')
   AND NOT contains(t, '{')) AS page_keep,
  cleaned_text
FROM c
""",
        # Global training shuffle: shard by one md5 hash, order within
        # the shard by an independent md5 hash (ties: doc_id)
        "shuffle_shards": """
WITH h AS (SELECT doc_id,
    CAST(('0x' || substr(md5('shuf:shard:' || doc_id), 1, 8))::UBIGINT
         % 16 AS BIGINT) AS shard_id,
    CAST(('0x' || substr(md5('shuf:order:' || doc_id), 1, 8))::UBIGINT
         AS BIGINT) AS order_key
  FROM documents)
SELECT doc_id, shard_id,
  CAST(row_number() OVER (PARTITION BY shard_id
                          ORDER BY order_key, doc_id) AS BIGINT) AS pos
FROM h
""",
        # Shard assembly: shuffle + token-tape packing in shuffled
        # order (budget 512, 16 shards; both window functions share
        # the same partition/order spec)
        "shard_assembly": f"""
WITH h AS (SELECT doc_id,
    CAST(('0x' || substr(md5('shuf:shard:' || doc_id), 1, 8))::UBIGINT
         % 16 AS BIGINT) AS shard_id,
    CAST(('0x' || substr(md5('shuf:order:' || doc_id), 1, 8))::UBIGINT
         AS BIGINT) AS order_key,
    CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (SELECT doc_id, shard_id, n_tokens,
    CAST(row_number() OVER (PARTITION BY shard_id
        ORDER BY order_key, doc_id) AS BIGINT) AS pos,
    CAST(sum(n_tokens) OVER (PARTITION BY shard_id
        ORDER BY order_key, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      AS BIGINT) AS start_offset
  FROM h)
SELECT doc_id, shard_id, pos, n_tokens, start_offset,
  CAST(start_offset // 512 AS BIGINT) AS bin_id
FROM cum
""",
        # Exact-substring duplicate spans (8-token windows, stride 1):
        # the oracle groups by the span TEXT where Spark groups by
        # xxhash64(span) — identical modulo 2^-64 collisions
        "dup_span_report": f"""
WITH p AS (SELECT doc_id,
    text || CASE WHEN doc_id % 5 = 0
      THEN ' the quick brown fox jumps over the lazy sleeping dog'
      ELSE '' END AS text
  FROM documents),
t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM p),
s0 AS (SELECT doc_id, toks,
    unnest(generate_series(1, len(toks) - 8 + 1)) AS i
  FROM t),
s AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS span FROM s0),
d AS (SELECT span, doc_id, count(*) AS occ FROM s GROUP BY 1, 2),
g AS (SELECT span, count(*) AS n_docs FROM d GROUP BY 1),
r AS (SELECT d.doc_id,
    sum(d.occ) AS n_spans,
    sum(CASE WHEN g.n_docs >= 2 THEN d.occ ELSE 0 END) AS n_dup_spans
  FROM d JOIN g USING (span) GROUP BY 1)
SELECT p.doc_id,
  CAST(coalesce(r.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(coalesce(r.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
  round(CASE WHEN coalesce(r.n_spans, 0) > 0
        THEN r.n_dup_spans / r.n_spans ELSE 0.0 END, 4) AS dup_span_frac
FROM p LEFT JOIN r USING (doc_id)
""",
        # Incremental MinHash near-dup: dump (doc_id%3==0, every 6th
        # doc a planted near-dup of its successor history doc) vs
        # history; keep = no LSH candidate verifies at Jaccard >= 0.8.
        # Mirrors the md5 signature/band family of dedup_minhash.
        "dedup_minhash_incremental": f"""
WITH nd AS (
  SELECT d.doc_id,
    CASE WHEN d.doc_id % 6 = 0 AND d2.text IS NOT NULL
         THEN d2.text || ' incremental dump suffix'
         ELSE d.text END AS text
  FROM documents d LEFT JOIN documents d2 ON d2.doc_id = d.doc_id + 1
  WHERE d.doc_id % 3 = 0),
hd AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
corpus AS (SELECT doc_id, text, TRUE AS is_new FROM nd
  UNION ALL SELECT doc_id, text, FALSE AS is_new FROM hd),
sh AS (SELECT doc_id, is_new, unnest(list_distinct(
    CASE WHEN len(t) >= 3 THEN
      list_transform(generate_series(1, len(t) - 2),
                     i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
    ELSE [] END)) AS shingle
  FROM (SELECT doc_id, is_new, {_TOKS_SQL} AS t FROM corpus)),
sig AS (SELECT doc_id, is_new,
    {", ".join(f"min(md5(concat('{s}:', shingle))) AS sig_{s}" for s in range(8))}
  FROM sh GROUP BY 1, 2),
bands AS (
  SELECT doc_id, is_new,
         concat('0:', md5(concat(sig_0, sig_1, sig_2, sig_3))) AS bucket
  FROM sig
  UNION ALL
  SELECT doc_id, is_new,
         concat('1:', md5(concat(sig_4, sig_5, sig_6, sig_7))) AS bucket
  FROM sig),
cands AS (SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS hist_id
  FROM bands n JOIN bands h
    ON n.bucket = h.bucket AND n.is_new AND NOT h.is_new),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
shared AS (SELECT a.doc_id AS new_id, b.doc_id AS hist_id,
    count(*) AS shared
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.is_new AND NOT b.is_new
  GROUP BY 1, 2),
dups AS (SELECT DISTINCT s.new_id
  FROM shared s
  JOIN cands c ON c.new_id = s.new_id AND c.hist_id = s.hist_id
  JOIN cnt ca ON ca.doc_id = s.new_id
  JOIN cnt cb ON cb.doc_id = s.hist_id
  WHERE round(s.shared / CAST(ca.n_sh + cb.n_sh - s.shared AS DOUBLE), 4)
        >= 0.8)
SELECT n.doc_id, CAST(len(n.text) AS BIGINT) AS n_chars
FROM nd n LEFT JOIN dups ON dups.new_id = n.doc_id
WHERE dups.new_id IS NULL
""",
        # Frame-grain aHash near-dup: the printable text is the raw
        # grayscale tape, 64 bytes per frame (zero-padded tail; short
        # docs are one padded frame), same packing + chunk join as
        # media_ahash_neardup at frame_id = 'tape://doc#idx' grain.
        "media_frame_neardup": """
WITH g AS (
  SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS p
  FROM documents),
fr AS (
  SELECT doc_id, p,
    unnest(generate_series(0, greatest(len(p) // 64, 1) - 1)) AS i
  FROM g),
px AS (
  SELECT doc_id, i,
    list_transform(generate_series(1, 64),
      j -> CASE WHEN i * 64 + j <= len(p)
                THEN ascii(p[i * 64 + j]) ELSE 0 END) AS pix
  FROM fr),
hv AS (
  SELECT doc_id, i,
    list_sum(list_transform(generate_series(1, 64),
      j -> CASE WHEN pix[j] >= list_sum(pix) / 64.0
                THEN 1::HUGEINT << (j - 1) ELSE 0::HUGEINT END)) AS v
  FROM px),
sh AS (
  SELECT 'tape://' || doc_id || '#' || i AS frame_id,
    CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
              THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT)
      AS ahash64,
    v
  FROM hv),
chunks AS (
  SELECT frame_id, ahash64, c, (v >> (c * 16)) & 65535::HUGEINT AS chunk
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c)),
pairs AS (
  SELECT DISTINCT a.frame_id AS frame_a, b.frame_id AS frame_b,
         a.ahash64 AS ha, b.ahash64 AS hb
  FROM chunks a
  JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk
   AND a.frame_id < b.frame_id)
SELECT frame_a, frame_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(ha, hb)) <= 2
""",
        # Bigram LM with stupid backoff (Brants 2007): top-2000 bigram
        # MLE with exact context counts; outside the model, 0.4 x the
        # add-one-smoothed top-50k unigram probability (OOV floor).
        # WARC round-trip: the oracle re-derives the fixture's rows
        # (URL/date construction, UTF-8 byte length) straight from the
        # documents table — any header-parse, envelope-strip, gunzip,
        # or decode defect on the Spark side breaks the value hash
        "warc_roundtrip": """
SELECT 'http://doc' || doc_id || '.example/item' AS url,
  strftime(TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND,
           '%Y-%m-%d %H:%M:%S') AS ts,
  coalesce(text, '') AS text,
  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes
FROM documents
""",
        # distributed-writer round-trip: same row derivation as
        # warc_roundtrip — the writer+reader loop must be value-invisible
        "warc_write_roundtrip": """
SELECT 'http://doc' || doc_id || '.example/item' AS url,
  strftime(TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND,
           '%Y-%m-%d %H:%M:%S') AS ts,
  coalesce(text, '') AS text,
  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes
FROM documents
""",
        "text_trigram_lm": f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
uni AS (SELECT tok, count(*) AS c_uni FROM
  (SELECT unnest(t) AS tok FROM t) GROUP BY 1),
pairs AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM t WHERE len(t) >= 2)),
bic AS (SELECT w1, w2, count(*) AS c_bi FROM pairs GROUP BY 1, 2),
tris AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM t WHERE len(t) >= 3)),
tric AS (SELECT w1, w2, w3, count(*) AS c_tri FROM tris GROUP BY 1, 2, 3),
trim_ AS (
  SELECT g.w1, g.w2, g.w3, g.c_tri, b.c_bi AS c_ctx12
  FROM (SELECT * FROM tric WHERE c_tri >= 2
        ORDER BY c_tri DESC, w1 ASC, w2 ASC, w3 ASC LIMIT 1500) g
  JOIN bic b ON b.w1 = g.w1 AND b.w2 = g.w2),
bim AS (
  SELECT b.w1 AS w2, b.w2 AS w3, b.c_bi, u.c_uni AS c_ctx2
  FROM (SELECT * FROM bic ORDER BY c_bi DESC, w1 ASC, w2 ASC
        LIMIT 2000) b
  JOIN uni u ON u.tok = b.w1),
vocab AS (SELECT tok, c_uni FROM uni
  ORDER BY c_uni DESC, tok ASC LIMIT 50000),
tot AS (SELECT (SELECT sum(c_uni) FROM uni) AS n_total,
               (SELECT count(*) FROM vocab) AS v_size),
scored AS (
  SELECT p.doc_id, m.c_tri, m.c_ctx12, bm.c_bi, bm.c_ctx2,
         v.c_uni, tot.n_total, tot.v_size
  FROM tris p
  LEFT JOIN trim_ m ON m.w1 = p.w1 AND m.w2 = p.w2 AND m.w3 = p.w3
  LEFT JOIN bim bm ON bm.w2 = p.w2 AND bm.w3 = p.w3
  LEFT JOIN vocab v ON v.tok = p.w3
  CROSS JOIN tot),
lp AS (
  SELECT doc_id, c_tri, c_bi,
    CASE WHEN c_tri IS NOT NULL
         THEN log10(c_tri / CAST(c_ctx12 AS DOUBLE))
         WHEN c_bi IS NOT NULL
         THEN log10(0.4) + log10(c_bi / CAST(c_ctx2 AS DOUBLE))
         ELSE 2.0 * log10(0.4) + log10((coalesce(c_uni, 0) + 1)
              / CAST(n_total + v_size AS DOUBLE)) END AS logp
  FROM scored),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
    round(sum(CASE WHEN c_tri IS NOT NULL THEN 1 ELSE 0 END)
          / CAST(count(*) AS DOUBLE), 4) AS trigram_hit_rate,
    round(sum(CASE WHEN c_tri IS NULL AND c_bi IS NOT NULL
              THEN 1 ELSE 0 END)
          / CAST(count(*) AS DOUBLE), 4) AS bigram_hit_rate,
    round(avg(logp), 4) + 0.0 AS avg_logprob
  FROM lp GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(p.n_trigrams, 0) AS n_trigrams,
  coalesce(p.trigram_hit_rate, 0.0) AS trigram_hit_rate,
  coalesce(p.bigram_hit_rate, 0.0) AS bigram_hit_rate,
  coalesce(p.avg_logprob, 0.0) AS avg_logprob
FROM documents d LEFT JOIN per p USING (doc_id)
""",
        "text_bigram_lm": f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
uni AS (SELECT tok, count(*) AS c_uni FROM
  (SELECT unnest(t) AS tok FROM t) GROUP BY 1),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM t WHERE len(t) >= 2)),
bic AS (SELECT w1, w2, count(*) AS c_bi FROM pairs GROUP BY 1, 2),
bim AS (
  SELECT b.w1, b.w2, b.c_bi, u.c_uni AS c_w1
  FROM (SELECT * FROM bic ORDER BY c_bi DESC, w1 ASC, w2 ASC
        LIMIT 2000) b
  JOIN uni u ON u.tok = b.w1),
vocab AS (SELECT tok, c_uni FROM uni
  ORDER BY c_uni DESC, tok ASC LIMIT 50000),
tot AS (SELECT (SELECT sum(c_uni) FROM uni) AS n_total,
               (SELECT count(*) FROM vocab) AS v_size),
scored AS (
  SELECT p.doc_id, m.c_bi, m.c_w1, v.c_uni, tot.n_total, tot.v_size
  FROM pairs p
  LEFT JOIN bim m ON m.w1 = p.w1 AND m.w2 = p.w2
  LEFT JOIN vocab v ON v.tok = p.w2
  CROSS JOIN tot),
lp AS (
  SELECT doc_id, c_bi,
    CASE WHEN c_bi IS NOT NULL
         THEN log10(c_bi / CAST(c_w1 AS DOUBLE))
         ELSE log10(0.4) + log10((coalesce(c_uni, 0) + 1)
              / CAST(n_total + v_size AS DOUBLE)) END AS logp
  FROM scored),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
    round(sum(CASE WHEN c_bi IS NOT NULL THEN 1 ELSE 0 END)
          / CAST(count(*) AS DOUBLE), 4) AS bigram_hit_rate,
    round(avg(logp), 4) + 0.0 AS avg_logprob
  FROM lp GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(p.n_bigrams, 0) AS n_bigrams,
  coalesce(p.bigram_hit_rate, 0.0) AS bigram_hit_rate,
  coalesce(p.avg_logprob, 0.0) AS avg_logprob
FROM documents d LEFT JOIN per p USING (doc_id)
""",
        # Exact-substring removal at disjoint 8-token blocks: keeper =
        # global min (doc_id, pos) per recurring block; reconstruction
        # token-joined; tail (< 8 tokens) never dedups.  Mirrored at
        # block-string grain (collision-free twin of xxhash64).
        "remove_dup_spans": f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
b AS (
  SELECT doc_id, i AS pos, array_to_string(toks[i:i+7], ' ') AS btext
  FROM (SELECT doc_id, toks,
          unnest(generate_series(1, ((len(toks) // 8) - 1) * 8 + 1, 8))
            AS i
        FROM t WHERE len(toks) >= 8)),
occ AS (SELECT btext, count(*) AS n_occ FROM b GROUP BY 1),
keeper AS (
  SELECT btext, doc_id AS kid, pos AS kpos
  FROM (SELECT btext, doc_id, pos,
          row_number() OVER (PARTITION BY btext ORDER BY doc_id, pos)
            AS rn
        FROM b) WHERE rn = 1),
flagged AS (
  SELECT b.doc_id, b.pos, b.btext,
    (o.n_occ = 1 OR (b.doc_id = k.kid AND b.pos = k.kpos)) AS kept
  FROM b JOIN occ o USING (btext) JOIN keeper k USING (btext)),
tails AS (
  SELECT doc_id, (len(toks) // 8) * 8 + 1 AS pos,
    array_to_string(toks[(len(toks) // 8) * 8 + 1 : len(toks)], ' ')
      AS btext
  FROM t WHERE len(toks) > (len(toks) // 8) * 8),
parts AS (
  SELECT doc_id, pos, btext FROM flagged WHERE kept
  UNION ALL SELECT doc_id, pos, btext FROM tails),
asm AS (SELECT doc_id,
    string_agg(btext, ' ' ORDER BY pos) AS cleaned_text
  FROM parts GROUP BY doc_id),
st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
    CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
      AS n_removed_blocks
  FROM flagged GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(a.cleaned_text, '') AS cleaned_text,
  coalesce(s.n_blocks, 0) AS n_blocks,
  coalesce(s.n_removed_blocks, 0) AS n_removed_blocks
FROM documents d
LEFT JOIN asm a USING (doc_id) LEFT JOIN st s USING (doc_id)
""",
        # Average-hash image near-dup over the raw-grayscale decode
        # path: pixel i = byte i of the 64-char printable-ASCII grid,
        # bit i set iff pixel >= the exact float mean (sum/64.0 is
        # exact in double), 64 bits packed little-endian-by-bit into a
        # signed bigint, then the 4x16-bit pigeonhole chunk join.
        "media_ahash_neardup": """
WITH g AS (
  SELECT doc_id,
    rpad(substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 64), 64, 'x')
      AS img
  FROM documents),
pay AS (
  SELECT a.doc_id,
    CASE WHEN a.doc_id % 4 = 0 AND d.img IS NOT NULL
         THEN substr(d.img, 1, 63) || '|' ELSE a.img END AS p
  FROM g a LEFT JOIN g d ON d.doc_id = a.doc_id + 1),
px AS (
  SELECT doc_id,
    list_transform(generate_series(1, 64), i -> ascii(p[i])) AS pix
  FROM pay),
hv AS (
  SELECT doc_id,
    list_sum(list_transform(generate_series(1, 64),
      i -> CASE WHEN pix[i] >= list_sum(pix) / 64.0
                THEN 1::HUGEINT << (i - 1) ELSE 0::HUGEINT END)) AS v
  FROM px),
sh AS (
  SELECT 'img://' || doc_id AS url,
    CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
              THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT)
      AS ahash64,
    v
  FROM hv),
chunks AS (
  SELECT url, ahash64, c, (v >> (c * 16)) & 65535::HUGEINT AS chunk
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c)),
pairs AS (
  SELECT DISTINCT a.url AS url_a, b.url AS url_b,
         a.ahash64 AS ha, b.ahash64 AS hb
  FROM chunks a
  JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk AND a.url < b.url)
SELECT url_a, url_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(ha, hb)) <= 8
""",
    }


def oracle_sql() -> dict[str, str]:
    """Oracles for the driver's 50-entry registry — keys are the
    queries() entries that are SQL-expressible (rows-only pipeline
    queries are intentionally absent)."""
    pool = {**_oracle_pool_core(), **_oracle_pool_curation()}
    return {k: pool[k] for k in queries() if k in pool}


def extra_oracle_sql() -> dict[str, str]:
    """Oracles for extra_queries() — same DuckDB dialect and compare as
    oracle_sql(), verified by pytest/validate_oracles instead of the
    capped driver run."""
    pool = {**_oracle_pool_core(), **_oracle_pool_curation()}
    return {k: pool[k] for k in extra_queries() if k in pool}
