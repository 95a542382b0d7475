"""Spark extraction operators: the socr pipeline phases as DataFrame ops.

Design for scale (SURVEY.md §7.0):
  * document-grain throughout — one row per url, attempts held as an
    ARRAY<STRUCT> column, so the hot path has NO shuffle: scan -> single
    mapInPandas parse -> column algebra -> (small) repair re-parse ->
    write.  Payload bytes never cross a shuffle boundary.
  * size-bucketed repartition before parsing (reference O4 / chunker
    analog): oversized blobs are spread round-robin so one partition
    doesn't serialize all the 1 MB+ payloads.
  * everything JVM-expressible stays JVM-side (difficulty routing, status
    rollups); Python only for the parse kernels and the regex batteries
    that need backreferences/NFKC (SURVEY.md §7.2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Schemas
# ---------------------------------------------------------------------------

AUDIT_FIELDS = [
    StructField("audit_passed", BooleanType()),
    StructField("primary_failure", StringType()),
    StructField("failure_modes", ArrayType(StringType())),
    StructField("failure_confidence", DoubleType()),
    StructField("word_count", IntegerType()),
    StructField("avg_word_len", DoubleType()),
    StructField("garbage_ratio", DoubleType()),
    StructField("has_structure", BooleanType()),
]
AUDIT_SCHEMA = StructType(AUDIT_FIELDS)

ATTEMPT_SCHEMA = StructType(
    [
        StructField("attempt_idx", IntegerType()),
        StructField("variant", StringType()),
        StructField("text", StringType()),
        StructField("escalated_from", StringType()),
    ]
    + AUDIT_FIELDS
)

FIRST_PASS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", StringType()),
        StructField("lang", StringType()),
        StructField("payload_size", LongType()),
        StructField("is_pdf", BooleanType()),
        StructField("parse_ok", BooleanType()),
        StructField("parse_error", StringType()),
        StructField("basic_text", StringType()),
        StructField("layout_text", StringType()),
        StructField("n_blocks", IntegerType()),
        StructField("n_tables", IntegerType()),
        StructField("n_headings", IntegerType()),
        StructField("n_lists", IntegerType()),
        StructField("total_chars", LongType()),
        StructField("link_density", DoubleType()),
        StructField("has_tables", BooleanType()),
        StructField("has_equations", BooleanType()),
        StructField("has_figures", BooleanType()),
        StructField("n_images", IntegerType()),
        StructField("n_pages", IntegerType()),
        StructField("font_count", IntegerType()),
        StructField("column_count", IntegerType()),
    ]
)
# The payload column ("html") is appended to this schema at runtime with the
# input's own binary type: repair re-extraction needs the bytes without a
# join back to the source table.

ASSESS_SCHEMA = StructType(
    [
        StructField("is_born_digital", BooleanType()),
        StructField("bd_confidence", DoubleType()),
        StructField("char_count", IntegerType()),
        StructField("bd_word_count", IntegerType()),
        StructField("needs_ocr_enhancement", BooleanType()),
        StructField("bd_notes", ArrayType(StringType())),
    ]
)

SELECT_SCHEMA = StructType(
    [
        StructField("final_text", StringType()),
        StructField("selected_variant", StringType()),
        StructField("selected_idx", IntegerType()),
        StructField("selection_rule", StringType()),
        StructField("agreement", DoubleType()),
        StructField("discrepancies", ArrayType(StringType())),
    ]
)

BIG_BLOB_BYTES = 1 << 20  # >=1 MB payloads get spread explicitly (O4)


def _audit_row(text: str, n_pages: int) -> dict:
    from smart_ocr_spark.kernel import audit as audit_kernel

    r = audit_kernel.check(text or "", expected_pages=n_pages)
    return {
        "audit_passed": r["audit_passed"],
        "primary_failure": r["primary_failure"],
        "failure_modes": r["failure_modes"],
        "failure_confidence": r["failure_confidence"],
        "word_count": r["word_count"],
        "avg_word_len": r["avg_word_len"],
        "garbage_ratio": r["garbage_ratio"],
        "has_structure": r["has_structure"],
    }


# ---------------------------------------------------------------------------
# Phase 0: size-aware partitioning
# ---------------------------------------------------------------------------


def size_bucketed(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Spread rows so oversized payloads don't skew partitions — but ONLY
    when the source doesn't already provide enough parallelism.

    The reference chunks >30-page PDFs to bound per-call latency (O4); the
    Spark analog is making partition cost uniform.  Shuffling payload
    bytes is expensive and I/O-bound, so for a well-laid-out table (scan
    splits >= cores) we parse scan partitions directly — payloads never
    cross a shuffle boundary; per-batch memory is bounded by the Arrow
    batch cap regardless of blob size.  The explicit salted repartition
    remains for low-parallelism sources (single file, small corpus,
    skewed layout): it moves bytes once and bounds the straggler tail.
    """
    sc = df.sparkSession.sparkContext
    n = partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        current = 0
    if current >= n:
        return df
    return df.repartition(
        n,
        F.floor(F.length("html") / F.lit(BIG_BLOB_BYTES)),
        F.crc32(F.col("url").cast("string")),
    )


# ---------------------------------------------------------------------------
# Phase 1: single-parse extraction (basic + layout + signals)
# ---------------------------------------------------------------------------


def first_pass(df: DataFrame) -> DataFrame:
    """documents(url, warc_ts, html, lang) -> flat extraction frame.

    One Arrow batch pass; payload bytes stay in the row (needed by repair)
    but are parsed exactly once here.
    """
    schema = StructType(
        list(FIRST_PASS_SCHEMA.fields)
        + [StructField("html", df.schema["html"].dataType)]
    )

    def run(batches):
        from smart_ocr_spark.kernel.extract import extract_payload_full

        for pdf in batches:
            out = []
            for url, ts, payload, lang in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"]
            ):
                b = bytes(payload) if payload is not None else b""
                r = extract_payload_full(b)
                out.append(
                    (
                        url,
                        str(ts),
                        lang,
                        len(b),
                        r["is_pdf"],
                        r["parse_ok"],
                        r["parse_error"],
                        r["basic_text"],
                        r["layout_text"],
                        r["n_blocks"],
                        r["n_tables"],
                        r["n_headings"],
                        r["n_lists"],
                        r["total_chars"],
                        r["link_density"],
                        r["has_tables"],
                        r["has_equations"],
                        r["has_figures"],
                        r["n_images"],
                        r["n_pages"],
                        r["font_count"],
                        r["column_count"],
                        payload,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema=schema)


FIGURE_SCHEMA = StructType(
    [
        StructField("figure_num", IntegerType()),
        StructField("page_num", IntegerType()),
        StructField("figure_type", StringType()),
        StructField("x0", DoubleType()),
        StructField("y0", DoubleType()),
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
    ]
)


def fused_first_pass(df: DataFrame, with_figures: bool = False) -> DataFrame:
    """Phases 1-2b in ONE Arrow pass: parse + assessment + audited
    primary attempt + conditional enhancement attempt.

    The staged formulation (first_pass → with_assessment →
    with_primary_attempt → with_enhancement_attempt) is kept for
    testability, but each extra pandas-UDF pass pays Arrow
    serialization of the whole row (payload + attempts array) plus a
    Python worker hop — measured ~10x the actual kernel cost at sf0.1.
    The kernels themselves are pure functions, so fusing them is purely
    a physical-plan change: identical columns, identical values.

    Deliberately does NOT emit the payload: persisting payload bytes is
    what blows the cache at scale (at 10^12 docs it's impossible); the
    repair loop joins back to the source table for the few rows that
    re-extract.  basic_text/layout_text are also dropped — layout is
    attempts[0].text and basic is consumed by the in-pass assessment, so
    carrying them would store every document's text three times.

    ``with_figures`` adds a ``figures`` ARRAY<STRUCT> column (§2.13
    metadata rows) computed in the SAME pass — the payload is already in
    hand, so inline figure extraction costs one kernel call, not a
    second scan of the payload table.
    """
    schema = StructType(
        [
            f
            for f in FIRST_PASS_SCHEMA.fields
            if f.name not in ("basic_text", "layout_text")
        ]
        + list(ASSESS_SCHEMA.fields)
        + [
            StructField("native_text", StringType()),
            StructField("attempts", ArrayType(ATTEMPT_SCHEMA)),
        ]
        + ([StructField("figures", ArrayType(FIGURE_SCHEMA))]
           if with_figures else [])
    )
    col_names = [f.name for f in schema.fields]

    def run(batches):
        from smart_ocr_spark.kernel.assess import assess_page
        from smart_ocr_spark.kernel.extract import (
            extract_payload_full,
            extract_payload_variant,
            sniff_pdf,
        )
        from smart_ocr_spark.kernel.figures import doc_figures

        for pdf in batches:
            out = []
            for url, ts, payload, lang in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"]
            ):
                b = bytes(payload) if payload is not None else b""
                r = extract_payload_full(b)
                a = assess_page(
                    r["basic_text"] or "",
                    font_count=int(r["font_count"]),
                    has_images=bool(r["has_figures"]),
                    has_tables=bool(r["has_tables"]),
                    has_equations=bool(r["has_equations"]),
                )
                native = r["layout_text"] if a["is_born_digital"] else ""
                attempts = [
                    dict(
                        attempt_idx=0,
                        variant="layout",
                        text=r["layout_text"],
                        escalated_from="",
                        **_audit_row(r["layout_text"], r["n_pages"]),
                    )
                ]
                if a["needs_ocr_enhancement"] and r["parse_ok"]:
                    enh = extract_payload_variant(b, "density")
                    attempts.append(
                        dict(
                            attempt_idx=1,
                            variant="density",
                            text=enh or "",
                            escalated_from="layout",
                            **_audit_row(enh, r["n_pages"]),
                        )
                    )
                row = (
                    url,
                    str(ts),
                    lang,
                    len(b),
                    r["is_pdf"],
                    r["parse_ok"],
                    r["parse_error"],
                    r["n_blocks"],
                    r["n_tables"],
                    r["n_headings"],
                    r["n_lists"],
                    r["total_chars"],
                    r["link_density"],
                    r["has_tables"],
                    r["has_equations"],
                    r["has_figures"],
                    r["n_images"],
                    r["n_pages"],
                    r["font_count"],
                    r["column_count"],
                    a["is_born_digital"],
                    a["confidence"],
                    a["char_count"],
                    a["word_count"],
                    a["needs_ocr_enhancement"],
                    a["notes"],
                    native,
                    attempts,
                )
                if with_figures:
                    # reuse the parse from extract_payload_full — the
                    # figure pass must not re-walk the PDF object tree
                    pdoc = r.get("_pdf_doc")
                    figs = (
                        [
                            (f["figure_num"], f["page_num"],
                             f["figure_type"], f["x0"], f["y0"],
                             f["x1"], f["y1"])
                            for f in doc_figures(b, doc=pdoc)
                        ]
                        if (pdoc is not None or sniff_pdf(b))
                        else []
                    )
                    row = row + (figs,)
                out.append(row)
            yield pd.DataFrame(out, columns=col_names)

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Phase 1b: assessment + difficulty (JVM-side where possible)
# ---------------------------------------------------------------------------


def with_assessment(df: DataFrame) -> DataFrame:
    """Born-digital assessment over the basic text layer (P1-P13).

    ``native_text`` is the layout rendering (the structured extraction the
    reference substitutes when tables are present, born_digital.py:369-375;
    for PDFs the page-separated assembly, state.py:148).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ASSESS_SCHEMA)
    def assess_udf(
        basic_text: pd.Series,
        font_count: pd.Series,
        has_images: pd.Series,
        has_tables: pd.Series,
        has_equations: pd.Series,
    ) -> pd.DataFrame:
        from smart_ocr_spark.kernel.assess import assess_page

        rows = []
        for text, fc, hi, ht, he in zip(
            basic_text, font_count, has_images, has_tables, has_equations
        ):
            r = assess_page(
                text or "",
                font_count=int(fc),
                has_images=bool(hi),
                has_tables=bool(ht),
                has_equations=bool(he),
            )
            rows.append(
                (
                    r["is_born_digital"],
                    r["confidence"],
                    r["char_count"],
                    r["word_count"],
                    r["needs_ocr_enhancement"],
                    r["notes"],
                )
            )
        return pd.DataFrame(
            rows, columns=[f.name for f in ASSESS_SCHEMA.fields]
        )

    df = df.withColumn(
        "assess",
        assess_udf("basic_text", "font_count", "has_figures", "has_tables", "has_equations"),
    ).select("*", "assess.*").drop("assess")
    return df.withColumn(
        "native_text",
        F.when(F.col("is_born_digital"), F.col("layout_text")).otherwise(F.lit("")),
    )


def difficulty_col() -> Column:
    """EASY/HARD routing as a pure column expression (difficulty.py:50-165).

    JVM-side ``when`` chain — whole-stage codegen, no Python."""
    from smart_ocr_spark.kernel import assess as A

    return (
        F.when(F.col("has_tables") | F.col("has_equations"), F.lit(A.HARD))
        .when(F.col("column_count") > A.MAX_COLUMNS_EASY, F.lit(A.HARD))
        .when(F.col("n_images") > A.MAX_IMAGES_EASY, F.lit(A.HARD))
        .when(F.col("n_blocks") > A.MAX_TEXT_BLOCKS_EASY, F.lit(A.HARD))
        .when(
            (F.col("n_blocks") < A.MIN_TEXT_BLOCKS_EASY) & (F.col("n_images") > 0),
            F.lit(A.HARD),
        )
        .otherwise(F.lit(A.EASY))
    )


# ---------------------------------------------------------------------------
# Phase 2/3: attempts + audit
# ---------------------------------------------------------------------------


def audit_udf_factory():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(AUDIT_SCHEMA)
    def audit_udf(text: pd.Series, n_pages: pd.Series) -> pd.DataFrame:
        rows = [_audit_row(t, int(p)) for t, p in zip(text, n_pages)]
        return pd.DataFrame(rows, columns=[f.name for f in AUDIT_SCHEMA.fields])

    return audit_udf


def with_primary_attempt(df: DataFrame) -> DataFrame:
    """Attempt 0 = the layout kernel output, audited."""
    audit_udf = audit_udf_factory()
    df = df.withColumn("audit0", audit_udf("layout_text", "n_pages"))
    attempt0 = F.struct(
        F.lit(0).alias("attempt_idx"),
        F.lit("layout").alias("variant"),
        F.col("layout_text").alias("text"),
        F.lit("").alias("escalated_from"),
        *[F.col(f"audit0.{f.name}").alias(f.name) for f in AUDIT_FIELDS],
    )
    return df.withColumn("attempts", F.array(attempt0)).drop("audit0")


def with_enhancement_attempt(df: DataFrame) -> DataFrame:
    """Complex born-digital docs get one extra kernel attempt (the
    needs_ocr_enhancement path, reference orchestrator.py:450-511): the
    ``density`` variant, tagged with escalated_from='layout'.

    Single conditional map pass: rows not needing enhancement carry a
    null variant and skip the kernel inside the batch.  (A filter/union
    formulation would scan the un-cached parse chain once per branch —
    measured 2x the whole pipeline cost at sf0.1.)
    """
    needs = F.col("needs_ocr_enhancement") & F.col("parse_ok")
    return _apply_variant_attempt(
        df,
        variant_expr=F.when(needs, F.lit("density")),
        escalated_from="layout",
    )


def _apply_variant_attempt(
    df: DataFrame, variant_expr: Column, escalated_from: str = ""
) -> DataFrame:
    """Append one re-extraction attempt to ``attempts`` for rows whose
    ``variant_expr`` is non-null; all other rows pass through untouched
    in the same map pass (selective computation O2/O5 without the
    branch-and-union double scan)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def reextract_udf(payload: pd.Series, variant: pd.Series) -> pd.Series:
        from smart_ocr_spark.kernel.extract import extract_payload_variant

        return pd.Series(
            [
                None
                if v is None
                else extract_payload_variant(bytes(p) if p is not None else b"", v)
                for p, v in zip(payload, variant)
            ]
        )

    audit_udf = audit_udf_factory()
    df = df.withColumn("_variant", variant_expr)
    df = df.withColumn("_new_text", reextract_udf("html", "_variant"))
    df = df.withColumn(
        "_new_audit",
        F.when(F.col("_variant").isNotNull(), audit_udf("_new_text", "n_pages")),
    )
    new_attempt = F.struct(
        F.size("attempts").cast("int").alias("attempt_idx"),
        F.col("_variant").alias("variant"),
        F.coalesce(F.col("_new_text"), F.lit("")).alias("text"),
        F.lit(escalated_from).alias("escalated_from"),
        *[F.col(f"_new_audit.{f.name}").alias(f.name) for f in AUDIT_FIELDS],
    )
    return df.withColumn(
        "attempts",
        F.when(
            F.col("_variant").isNotNull(),
            F.concat(F.col("attempts"), F.array(new_attempt)),
        ).otherwise(F.col("attempts")),
    ).drop("_variant", "_new_text", "_new_audit")


# ---------------------------------------------------------------------------
# Phase 4: selective repair loop
# ---------------------------------------------------------------------------


def scanned_py(row: dict) -> bool:
    """Image-only PDF with no text layer: the raster-recovery class
    (mirrors the ``failed_scanned`` status clause and ``scanned_col``)."""
    return bool(
        row.get("is_pdf")
        and (row.get("n_images") or 0) > 0
        and (row.get("total_chars") or 0) == 0
    )


def scanned_col() -> Column:
    return (
        F.col("is_pdf") & (F.col("n_images") > 0) & (F.col("total_chars") == 0)
    )


def needs_repair_py(row: dict) -> bool:
    """Python mirror of :func:`needs_repair_col` for the fused Arrow
    repair pass (state.py:37-57 analog).  Kept module-level so the
    equivalence test can pin JVM filter == Python mirror row-for-row."""
    if not row["parse_ok"]:
        return False
    if any(a["audit_passed"] for a in row["attempts"]):
        return False
    if row["is_born_digital"] and (row["native_text"] or ""):
        return False
    if scanned_py(row):
        # image-only docs are retriable through the raster tier even
        # though they have no extractable text layer (VERDICT r3 #6)
        return True
    return row["total_chars"] > 0 and row["link_density"] <= 0.8


def needs_repair_col() -> Column:
    """Document-grain needs_repair (reference state.py:37-57 + the
    legitimate-empty rule): no passing attempt, not covered by born-digital
    native text, and the source actually has extractable content — OR is
    an image-only scan, whose content lives in the raster tier."""
    any_passing = F.exists("attempts", lambda a: a["audit_passed"])
    # coalesce: a NULL native_text must behave like "" (the Python
    # mirror's `or ""`), not poison the whole predicate to NULL
    bd_covered = F.col("is_born_digital") & (
        F.length(F.coalesce("native_text", F.lit(""))) > 0
    )
    has_content = (F.col("total_chars") > 0) & (F.col("link_density") <= 0.8)
    return (
        ~any_passing & ~bd_covered & (has_content | scanned_col())
        & F.col("parse_ok")
    )


def repair_round(df: DataFrame, chain: list[str] | None = None) -> DataFrame:
    """One repair iteration (reference repair loop, orchestrator.py:897-1110):
    failed docs pick the next variant via the routing policy and re-extract;
    passing/exhausted docs carry a null route and skip the kernel — one
    map pass over the frame, no branch-and-union re-scan."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def route_udf(
        attempts: pd.Series, needing: pd.Series, scanned: pd.Series
    ) -> pd.Series:
        from smart_ocr_spark.kernel import repair as repair_kernel

        out = []
        for atts, need, scan in zip(attempts, needing, scanned):
            if not need:
                out.append(None)
                continue
            failures = [a["primary_failure"] for a in atts]
            tried = {a["variant"] for a in atts}
            dominant = repair_kernel.dominant_failure(failures)
            last = atts[-1]["variant"] if len(atts) else None
            runs = sum(1 for a in atts if a["variant"] == last)
            out.append(
                repair_kernel.select_repair_variant(
                    dominant, tried, chain=chain,
                    last_variant=last, last_variant_runs=runs,
                    # in-process kernels are deterministic: a same-variant
                    # retry reproduces the identical truncated text, so the
                    # O6 retry budget (meant for nondeterministic engines)
                    # would burn a repair round on a guaranteed no-op
                    truncation_retries=0,
                    scanned=bool(scan),
                )
            )
        return pd.Series(out, dtype=object)

    df = df.withColumn(
        "_routed",
        route_udf(
            "attempts",
            needs_repair_col().cast("boolean"),
            scanned_col().cast("boolean"),
        ),
    )
    return _apply_variant_attempt(df, variant_expr=F.col("_routed")).drop("_routed")


def fused_repair_round(df: DataFrame, chain: list[str] | None = None) -> DataFrame:
    """``repair_round`` as ONE Arrow pass (route + re-extract + audit
    fused; the chained-UDF formulation is three sequential
    ArrowEvalPython nodes).  Input must carry the payload column
    (``html``), joined back from the source table by the caller; output
    drops it.  Only ``attempts`` grows for rows that needed repair;
    rows whose variant chain is spent get ``repair_exhausted`` = True
    (when the caller carries that column) so later rounds skip them."""
    schema = StructType([f for f in df.schema.fields if f.name != "html"])
    col_names = [f.name for f in schema.fields]

    def run(batches):
        from smart_ocr_spark.kernel import repair as repair_kernel
        from smart_ocr_spark.kernel.extract import extract_payload_variant

        for pdf in batches:
            records = pdf.to_dict("records")
            for row in records:
                payload = row.pop("html", None)
                row["attempts"] = list(row["attempts"])
                if not needs_repair_py(row):
                    continue
                atts = row["attempts"]
                dominant = repair_kernel.dominant_failure(
                    [a["primary_failure"] for a in atts]
                )
                last = atts[-1]["variant"] if atts else None
                variant = repair_kernel.select_repair_variant(
                    dominant,
                    {a["variant"] for a in atts},
                    chain=chain,
                    last_variant=last,
                    last_variant_runs=sum(
                        1 for a in atts if a["variant"] == last
                    ),
                    # deterministic kernels: same-variant truncation retry
                    # is a guaranteed-identical no-op (see route_udf note)
                    truncation_retries=0,
                    scanned=scanned_py(row),
                )
                if variant is None:
                    if "repair_exhausted" in row:
                        row["repair_exhausted"] = True
                    continue
                b = bytes(payload) if payload is not None else b""
                text = extract_payload_variant(b, variant)
                atts.append(
                    dict(
                        attempt_idx=len(atts),
                        variant=variant,
                        text=text or "",
                        # reference PageOutput.escalated_from: "engine
                        # that failed, triggering escalation"
                        # (result.py:86) — the repair attempt records
                        # the variant it escalated away from
                        escalated_from=last or "",
                        **_audit_row(text, row["n_pages"]),
                    )
                )
            yield pd.DataFrame(records, columns=col_names)

    return df.mapInPandas(run, schema=schema)


def figure_metadata(df: DataFrame, url_col: str = "url", payload_col: str = "html") -> DataFrame:
    """Figure-metadata fan-out (SURVEY.md §2.13; the doc → N-figure-rows
    UDTF analog, reference ``figures/extractor.py:82-136``): one row per
    detected figure on PDF payloads; non-PDF rows emit nothing.
    Map-only; figure pixels are never materialized."""
    schema = (
        f"{url_col} string, figure_num int, page_num int, "
        "figure_type string, x0 double, y0 double, x1 double, y1 double"
    )

    def run(batches):
        from smart_ocr_spark.kernel.figures import doc_figures

        for pdf in batches:
            rows = []
            from smart_ocr_spark.kernel.extract import sniff_pdf

            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                if not sniff_pdf(b):
                    continue
                for fig in doc_figures(b):
                    rows.append(
                        (
                            url,
                            fig["figure_num"],
                            fig["page_num"],
                            fig["figure_type"],
                            fig["x0"],
                            fig["y0"],
                            fig["x1"],
                            fig["y1"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    url_col, "figure_num", "page_num", "figure_type",
                    "x0", "y0", "x1", "y1",
                ],
            )

    return df.select(url_col, payload_col).mapInPandas(run, schema)


def with_figure_embed(
    df: DataFrame,
    text_col: str = "final_text",
    figures_col: str = "figures",
) -> DataFrame:
    """Embed figure blocks into the output markdown — the reference's
    ``_describe_and_embed_figures`` append step (orchestrator.py:
    1272-1276, 1367-1371) with SURVEY §2.12's deterministic caption stub
    in place of the cloud vision description.

    Pure JVM column algebra over the ``figures`` ARRAY<STRUCT> the parse
    pass already emitted — no Python, no second payload scan, map-only
    at any scale.  Byte-parity with the kernel spec
    (:func:`smart_ocr_spark.kernel.figures.embed_figure_blocks`) is
    pinned by a mirror test."""
    text = F.col(text_col)

    def block(f):
        n = f["figure_num"].cast("string")
        p = f["page_num"].cast("string")
        return F.concat(
            F.lit("**Figure "), n, F.lit("** (page "), p,
            F.lit("): [stub] "), f["figure_type"], F.lit(" region, "),
            F.round(f["x1"] - f["x0"]).cast("int").cast("string"),
            F.lit("x"),
            F.round(f["y1"] - f["y0"]).cast("int").cast("string"),
            F.lit(" pt\n\n![Figure "), n,
            F.lit("](figures/figure_"), n, F.lit("_page"), p, F.lit(".png)"),
        )

    # has_text = bool(final_text.strip()) (orchestrator.py:1272); both
    # strip/rstrip pinned to the ASCII whitespace class on both engines
    has_text = (
        F.length(F.regexp_replace(text, "[ \\t\\n\\x0B\\f\\r]", "")) > 0
    )
    embedded = F.concat(
        F.regexp_replace(text, "[ \\t\\n\\x0B\\f\\r]+$", ""),
        F.lit("\n\n"),
        F.array_join(F.transform(F.col(figures_col), block), "\n\n"),
    )
    return df.withColumn(
        text_col,
        F.when(
            (F.size(F.col(figures_col)) > 0) & has_text, embedded
        ).otherwise(text),
    )


# ---------------------------------------------------------------------------
# Phase 4b/5: consensus selection + assembly
# ---------------------------------------------------------------------------


def with_selection(df: DataFrame) -> DataFrame:
    """Final text selection ladder (reference state.py:111-148 + phase 4b
    consensus, consensus.py:483-520):

      1. first passing attempt by attempt_idx (state.py:92-94),
      2. else born-digital native text,
      3. else consensus winner among attempts (grounded against native
         when present, ungrounded otherwise; ties -> lowest attempt_idx),
      4. else empty.

    Every multi-attempt row also reports WHY the attempts disagree
    (``discrepancies``: word-count spread + audit divergence, the
    reference's consensus.py:225-253 detectors — A8/A9).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(SELECT_SCHEMA)
    def select_udf(
        attempts: pd.Series, native_text: pd.Series, is_bd: pd.Series
    ) -> pd.DataFrame:
        from smart_ocr_spark.kernel import consensus as consensus_kernel
        from smart_ocr_spark.kernel import score as score_kernel

        rows = []
        for atts, native, bd in zip(attempts, native_text, is_bd):
            if atts is None:
                # single-attempt row: inputs pruned JVM-side (the
                # selection for these rows is computed by the JVM
                # branch below; this placeholder is discarded)
                rows.append(("", "", -1, "empty", 1.0, []))
                continue
            atts = list(atts)
            native = native or ""
            # multi-attempt rows only (VERDICT r2 #1c): discrepancies and
            # agreement are DEFINED as 1-attempt no-ops ([] and 1.0), but
            # the word-split for the agreement cap was still O(len) per
            # row — on the single-attempt majority that was pure waste in
            # the selection pass's hot loop.  Byte-identical outputs.
            if len(atts) >= 2:
                discrepancies = consensus_kernel.find_discrepancies(atts)
                # word-capped agreement: the pairwise word-DP is O(m*n)
                # and informational only — bound it so giant docs can't
                # dominate the selection pass (cap documented, not silent)
                agreement = score_kernel.pairwise_agreement(
                    [
                        " ".join((a["text"] or "").split()[:2000])
                        for a in atts
                        if (a["text"] or "").strip()
                    ]
                )
            else:
                discrepancies = []
                agreement = 1.0
            passing = [a for a in atts if a["audit_passed"]]
            if passing:
                best = min(passing, key=lambda a: a["attempt_idx"])
                rows.append(
                    (best["text"], best["variant"], best["attempt_idx"],
                     "first_passing", agreement, discrepancies)
                )
                continue
            if bd and native:
                rows.append(
                    (native, "native", -1, "native_text", agreement,
                     discrepancies)
                )
                continue
            if atts:
                scored = [
                    (
                        -score_kernel.score_attempt(
                            a["text"] or "",
                            bool(a["audit_passed"]),
                            int(a["word_count"] or 0),
                            # score_attempt wants QUALITY confidence
                            # (reference: engine-reported); our
                            # failure_confidence is certainty-of-broken,
                            # so invert it — passing raw failure
                            # confidence rewarded the MORE broken attempt
                            max(0.0, 1.0 - float(a["failure_confidence"] or 0.0)),
                            native,
                        ),
                        a["attempt_idx"],
                        a,
                    )
                    for a in atts
                ]
                scored.sort(key=lambda t: (t[0], t[1]))
                best = scored[0][2]
                rows.append(
                    (best["text"] or "", best["variant"], best["attempt_idx"],
                     "consensus", agreement, discrepancies)
                )
                continue
            rows.append(("", "", -1, "empty", 1.0, discrepancies))
        return pd.DataFrame(
            rows, columns=[f.name for f in SELECT_SCHEMA.fields]
        )

    # Hybrid selection (guide §4.1: built-ins over UDFs where they
    # exist): rows with FEWER THAN TWO attempts — the overwhelming
    # majority — are fully JVM-expressible, because the ladder needs no
    # scoring for them (rule 1 / rule 2 / "consensus of one" /
    # "empty"; agreement and discrepancies are DEFINED as the 1.0/[]
    # no-ops).  Only multi-attempt rows go through the Python kernel,
    # and the UDF's inputs are NULLed for everyone else so their
    # attempt texts never cross the Arrow boundary at all — at corpus
    # scale that removes ~95% of the selection pass's serialization.
    # Byte-identical outputs: each JVM branch mirrors the kernel's
    # corresponding code path exactly (see select_udf).
    multi = F.size("attempts") >= 2
    passing = F.filter("attempts", lambda a: a["audit_passed"])
    p0 = F.element_at(passing, 1)
    att0 = F.element_at(F.col("attempts"), 1)
    native_ok = F.col("is_born_digital") & (
        F.length(F.coalesce("native_text", F.lit(""))) > 0
    )
    no_discs = F.array().cast("array<string>")

    def _sel_struct(text, variant, idx, rule):
        return F.struct(
            text.alias("final_text"),
            variant.alias("selected_variant"),
            idx.cast("int").alias("selected_idx"),
            rule.alias("selection_rule"),
            F.lit(1.0).alias("agreement"),
            no_discs.alias("discrepancies"),
        )

    single_sel = (
        # rule 1: first passing attempt (min idx == element 1; the
        # array is built in attempt_idx order)
        F.when(
            F.size(passing) > 0,
            _sel_struct(
                p0["text"], p0["variant"], p0["attempt_idx"],
                F.lit("first_passing"),
            ),
        )
        # rule 2: born-digital native text
        .when(
            native_ok,
            _sel_struct(
                F.col("native_text"), F.lit("native"), F.lit(-1),
                F.lit("native_text"),
            ),
        )
        # rule 3 degenerates to "the only attempt" (argmin over one)
        .when(
            F.size("attempts") > 0,
            _sel_struct(
                F.coalesce(att0["text"], F.lit("")), att0["variant"],
                att0["attempt_idx"], F.lit("consensus"),
            ),
        )
        # rule 4: nothing at all
        .otherwise(
            _sel_struct(F.lit(""), F.lit(""), F.lit(-1), F.lit("empty"))
        )
    )
    df = df.withColumn(
        "sel",
        F.when(
            multi,
            select_udf(
                F.when(multi, F.col("attempts")),
                F.when(multi, F.col("native_text")),
                F.col("is_born_digital"),
            ),
        ).otherwise(single_sel),
    ).select("*", "sel.*").drop("sel")
    df = df.withColumn(
        "status",
        F.when(~F.col("parse_ok"), F.lit("failed_parse"))
        .when(F.col("selection_rule") == "first_passing", F.lit("success"))
        .when(F.col("selection_rule") == "native_text", F.lit("success_native"))
        .when(F.length("final_text") > 0, F.lit("partial"))
        # scanned page analog (reference benchmark category `scanned`,
        # rasterize.py:17-80): an image-only PDF with no text layer is a
        # DISTINCT graceful failure — the raster ladder isn't available
        # in-kernel (S3 partial-by-design), and folding it into `empty`
        # would hide the docs a raster-OCR tier should pick up.  The
        # signal columns are optional so reduced frames (unit fixtures)
        # still select — those simply have no scanned bucket.
        .when(
            (
                F.col("is_pdf")
                & (F.col("n_images") > 0)
                & (F.col("total_chars") == 0)
            )
            if {"is_pdf", "n_images", "total_chars"} <= set(df.columns)
            else F.lit(False),
            F.lit("failed_scanned"),
        )
        .otherwise(F.lit("empty")),
    )
    return with_cost_columns(df)


# Per-page cost analogs in micro-USD (exact integers — float dollar sums
# are order-dependent).  The cloud-tier variants carry the reference's
# published per-page rates (README.md:62-66: Gemini ~$0.0002/page,
# Mistral ~$0.001/page); in-process local kernels are free, like the
# reference's local engines.  `layout` is the Gemini-analog primary,
# `layout_alt` the different-family cloud escape hatch (Mistral-analog).
VARIANT_COST_MICROUSD = {
    "layout": 200,
    "layout_alt": 1000,
    "density": 0,
    "basic": 0,
    "raw": 0,
    # scanned-recovery tier: rasterize + local OCR (tesseract-class) is
    # compute, not API spend — free like the other local kernels
    "raster": 0,
}


def with_cost_columns(df: DataFrame) -> DataFrame:
    """A4: engines-used lineage + cost rollup (reference
    state.py:164-172 ``total_cost`` / ``engines_used``): ordered unique
    variant list across attempts, and the summed per-run cost where one
    attempt = one engine run over ``n_pages`` pages.  Pure column
    algebra — array_distinct keeps first-occurrence order like the
    reference's ``dict.fromkeys``."""
    # one aggregate over the attempts array; unknown variants cost 0
    per_run = (
        "aggregate(attempts, 0L, (acc, a) -> acc + "
        + "CASE a.variant "
        + " ".join(
            f"WHEN '{v}' THEN {u}L" for v, u in VARIANT_COST_MICROUSD.items()
        )
        + " ELSE 0L END * cast(greatest(n_pages, 1) as bigint))"
    )
    return df.withColumn(
        "engines_used",
        F.array_distinct(F.transform("attempts", lambda a: a["variant"])),
    ).withColumn("cost_microusd", F.expr(per_run))
