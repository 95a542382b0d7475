"""The reference's single-document 5-phase control flow as pure kernel
functions (reference ``pipeline/orchestrator.py:74-1290``).

This is the per-document SPEC of what the distributed pipeline
implements: ``plans/extract_pipeline.run_extraction`` expresses the
same analyze → backbone → score → repair → assemble ladder as fused
Arrow passes and driver-side repair rounds over a whole corpus.  The
reference's own orchestrator test matrix replays verbatim against
these functions (``tests/test_reference_replay.py``), so the control
flow — phase ordering, native-first routing, repair-loop bounds, the
O6 truncation retry, the assemble status ladder — is pinned at both
grains.

Seams are injected, never imported: ``get_engine(engine_type)`` must
return an object with ``.name``, ``.is_available()``,
``.process_pages(pdf_path, page_nums, config, dpi)``; ``scorer.score``
is the audit classifier (kernel.audit-backed in this repo);
``router`` the repair planner (kernel.repair-backed);
``make_page(**kw)`` / ``make_result(**kw)`` the row factories, so
callers choose the row class (the replay uses the reference's
attribute-style objects; dict rows work equally).

``doc`` rows: {path, page_count, pages (kernel.state shape),
whole_doc_attempts, engine_runs, status, last_assessment}.  Status and
failure-mode fields are the reference's string-enum VALUES, so plain
string comparison works against either enums or strings.
"""

from __future__ import annotations

from smart_ocr_spark.kernel import state as kstate

SUCCESS = "success"
ERROR = "error"
AUDIT_FAILED = "audit_failed"
TRUNCATED = "truncated"
MODEL_UNAVAILABLE = "model_unavailable"
NONE = "none"


def new_document(path, page_count: int) -> dict:
    return {
        "path": path,
        "page_count": page_count,
        "pages": kstate.new_pages(page_count),
        "whole_doc_attempts": [],
        "engine_runs": [],
        "status": "pending",
        "last_assessment": None,
    }


def _apply_result(doc: dict, result) -> None:
    doc["engine_runs"].append(result)
    kstate.apply_result(doc["pages"], doc["whole_doc_attempts"], result["pages"])


def phase_analyze(doc: dict, assessment) -> None:
    """Phase 1 (orchestrator.py:209-246): apply born-digital detection."""
    doc["last_assessment"] = assessment
    kstate.apply_born_digital(doc["pages"], assessment["pages"])


def _run_engine_on_pages(
    doc, page_nums, enhancement_pages, engine, config, make_page
):
    """orchestrator.py:543-635: per-page engine run with native fallback
    for enhancement pages (on unavailability or per-page failure)."""
    if not engine.is_available():
        outputs = []
        for page_num in page_nums:
            ps = doc["pages"][page_num]
            if page_num in enhancement_pages and ps["native_text"]:
                outputs.append(
                    make_page(
                        page_num=page_num, text=ps["native_text"],
                        status=SUCCESS, engine="native", audit_passed=True,
                    )
                )
            else:
                outputs.append(
                    make_page(
                        page_num=page_num, text="", status=ERROR,
                        engine=engine.name,
                        failure_mode=MODEL_UNAVAILABLE,
                    )
                )
        return outputs
    page_outputs = engine.process_pages(
        pdf_path=doc["path"], page_nums=page_nums, config=config,
        dpi=getattr(config, "render_dpi", 200),
    )
    final = []
    for po in page_outputs:
        if po["status"] != SUCCESS and po["page_num"] in enhancement_pages:
            ps = doc["pages"][po["page_num"]]
            if ps["native_text"]:
                final.append(
                    make_page(
                        page_num=po["page_num"], text=ps["native_text"],
                        status=SUCCESS, engine="native", audit_passed=True,
                    )
                )
                continue
        final.append(po)
    return final


def phase_backbone(
    doc, config, get_engine, scorer, make_page, make_result,
    native_first_fn=None,
):
    """Phase 2 (orchestrator.py:252-541): native-first routing when the
    document is mostly born-digital (non-tiered form: prose pages use
    native text, everything else goes to the primary engine, failed
    enhancement pages fall back to native); otherwise the primary
    engine processes every page.  Unavailable engines yield an ERROR
    result that still enters the state.  ``native_first_fn`` overrides
    the native-first implementation (the routing DECISION stays here)."""
    if getattr(config, "native_first", True):
        bd = [p for p in doc["pages"].values() if p["is_born_digital"]]
        if len(bd) / max(len(doc["pages"]), 1) >= 0.5:
            if native_first_fn is not None:
                return native_first_fn()
            return _backbone_native_first(
                doc, config, get_engine, scorer, make_page, make_result
            )
    engine = get_engine(config.primary_engine)
    if not engine.is_available():
        err = make_result(
            document_path=doc["path"], engine=engine.name, status=ERROR,
            error=f"Engine {engine.name} not available",
        )
        _apply_result(doc, err)
        return err
    all_pages = list(range(1, doc["page_count"] + 1))
    page_outputs = engine.process_pages(
        pdf_path=doc["path"], page_nums=all_pages, config=config,
        dpi=getattr(config, "render_dpi", 200),
    )
    ok = sum(1 for p in page_outputs if p["status"] == SUCCESS)
    result = make_result(
        document_path=doc["path"], engine=engine.name,
        status=SUCCESS if ok > 0 else ERROR, pages=page_outputs,
        pages_processed=doc["page_count"],
    )
    _apply_result(doc, result)
    return result


def _name_of(x):
    """String-enum-VALUE convention: enum members compare by .value,
    plain strings compare as themselves."""
    return getattr(x, "value", x)


def _backbone_native_first(
    doc, config, get_engine, scorer, make_page, make_result,
    classify_pages_fn=None, resolve_local_fn=None,
):
    """3-tier routing (orchestrator.py:335-541): native -> local ->
    cloud.

    Tier 1: born-digital prose -> native text.  Tier 2 (only when
    ``config.tiered`` and a local engine resolves and a
    ``classify_pages_fn`` seam is provided): EASY OCR pages go to the
    local engine, each output audited per page — engine errors and
    audit failures ESCALATE to tier 3 with ``escalated_from`` set to
    the local engine's name (orchestrator.py:500-512).  Tier 3: hard +
    escalated pages go to the primary (cloud) engine.  Without tiered
    routing the tiers collapse into one primary pass, byte-identical to
    the pre-tiered form."""
    prose, enhancement, scanned = [], [], []
    for page_num, ps in sorted(doc["pages"].items()):
        if (
            ps["is_born_digital"]
            and not ps["needs_ocr_enhancement"]
            and ps["native_text"]
        ):
            prose.append(page_num)
        elif ps["is_born_digital"] and ps["needs_ocr_enhancement"]:
            enhancement.append(page_num)
        else:
            scanned.append(page_num)
    ocr_pages = enhancement + scanned

    # tier 2/3 split (orchestrator.py:371-413)
    easy_pages, hard_pages = [], []
    local_engine_type = None
    if getattr(config, "tiered", False) and ocr_pages:
        local_cfg = getattr(config, "local_engine", None)
        if _name_of(local_cfg) == "auto":
            if resolve_local_fn is not None:
                local_engine_type = resolve_local_fn()
        elif local_cfg is not None and local_cfg != config.primary_engine:
            local_engine_type = local_cfg
    if local_engine_type and ocr_pages and classify_pages_fn is not None:
        assessment = doc.get("last_assessment")
        by_num = {
            pa["page_num"]: pa
            for pa in (assessment["pages"] if assessment else [])
        }
        page_hints = {}
        for n in ocr_pages:
            pa = by_num.get(n)
            if pa is not None:
                page_hints[n] = {
                    "has_tables": pa.get("has_tables", False),
                    "has_equations": pa.get("has_equations", False),
                }
            elif doc["pages"][n]["needs_ocr_enhancement"]:
                # fallback: enhancement pages assumed hard
                page_hints[n] = {"has_tables": True, "has_equations": False}
        difficulty_map = classify_pages_fn(
            str(doc["path"]), ocr_pages, page_hints=page_hints
        )
        for n in ocr_pages:
            da = difficulty_map.get(n)
            diff = None if da is None else getattr(da, "difficulty", None)
            if diff is None and isinstance(da, dict):
                diff = da.get("difficulty")
            if _name_of(diff) == "easy":
                easy_pages.append(n)
            else:
                hard_pages.append(n)
    else:
        hard_pages = ocr_pages

    # tier 1: native prose
    page_outputs = [
        make_page(
            page_num=n, text=doc["pages"][n]["native_text"],
            status=SUCCESS, engine="native", audit_passed=True,
        )
        for n in prose
    ]

    # tier 2: local engine on easy pages, per-page audit -> escalation
    escalated_pages: list = []
    local_engine_name = ""
    if easy_pages and local_engine_type:
        local_outputs = _run_engine_on_pages(
            doc, easy_pages, enhancement,
            get_engine(local_engine_type), config, make_page,
        )
        local_engine_name = get_engine(local_engine_type).name
        for po in local_outputs:
            if po["engine"] == "native":
                page_outputs.append(po)  # enhancement fallback passthrough
                continue
            if po["status"] != SUCCESS:
                # engine hard-error: escalate, never ship a blank page
                escalated_pages.append(po["page_num"])
                continue
            scoring = scorer.score(po["text"], engine=po["engine"])
            if scoring.passed:
                po["audit_passed"] = True
                page_outputs.append(po)
            else:
                escalated_pages.append(po["page_num"])

    # tier 3: primary (cloud) engine on hard + escalated pages
    cloud_pages = hard_pages + escalated_pages
    if cloud_pages:
        cloud_outputs = _run_engine_on_pages(
            doc, cloud_pages, enhancement,
            get_engine(config.primary_engine), config, make_page,
        )
        for co in cloud_outputs:
            if co["page_num"] in escalated_pages:
                co["escalated_from"] = local_engine_name
        page_outputs.extend(cloud_outputs)

    ok = sum(1 for p in page_outputs if p["status"] == SUCCESS)
    engines = sorted(
        {p["engine"] for p in page_outputs if p["engine"] and p["engine"] != "native"}
    )
    name = "native+" + "+".join(engines) if engines else "native"
    result = make_result(
        document_path=doc["path"], engine=name,
        status=SUCCESS if ok > 0 else ERROR, pages=page_outputs,
        pages_processed=len(doc["pages"]),
    )
    _apply_result(doc, result)
    return result


def phase_score(doc, config, backbone_result, scorer) -> None:
    """Phase 3 (orchestrator.py:722-812): whole-doc outputs score as one
    text (truncation check skipped for chunked docs); per-page outputs
    score individually, clearing a failing best_output and promoting a
    passing latest attempt."""
    has_whole = any(p["page_num"] == 0 for p in backbone_result["pages"])
    if has_whole:
        whole = next(p for p in backbone_result["pages"] if p["page_num"] == 0)
        was_chunked = doc["page_count"] > getattr(config, "chunk_threshold", 30)
        scoring = scorer.score(
            whole["text"], engine=backbone_result["engine"],
            expected_pages=0 if was_chunked else doc["page_count"],
        )
        whole["audit_passed"] = scoring.passed
        backbone_result["audit_passed"] = scoring.passed
        if scoring.passed:
            whole["failure_mode"] = NONE
        else:
            whole["failure_mode"] = scoring.primary_failure
            backbone_result["status"] = AUDIT_FAILED
            backbone_result["failure_mode"] = scoring.primary_failure
        return
    for page_num in sorted(doc["pages"]):
        ps = doc["pages"][page_num]
        if ps["is_born_digital"] and ps["native_text"]:
            continue
        if not ps["attempts"]:
            continue
        latest = ps["attempts"][-1]
        scoring = scorer.score(latest["text"], engine=latest["engine"])
        latest["audit_passed"] = scoring.passed
        if not scoring.passed:
            latest["failure_mode"] = scoring.primary_failure
            if ps["best_output"] is latest:
                ps["best_output"] = None
        else:
            latest["failure_mode"] = NONE
            if not ps["best_output"]:
                ps["best_output"] = latest


def _score_repair_result(doc, result, repairs, scorer) -> None:
    """orchestrator.py:1113-1152."""
    has_whole = any(p["page_num"] == 0 for p in result["pages"])
    if has_whole:
        whole = next(p for p in result["pages"] if p["page_num"] == 0)
        scoring = scorer.score(
            whole["text"], engine=result["engine"],
            expected_pages=doc["page_count"],
        )
        whole["audit_passed"] = scoring.passed
        whole["failure_mode"] = (
            NONE if scoring.passed else scoring.primary_failure
        )
        return
    repair_nums = {r.page_num for r in repairs}
    for po in result["pages"]:
        if po["page_num"] not in repair_nums:
            continue
        scoring = scorer.score(po["text"], engine=result["engine"])
        po["audit_passed"] = scoring.passed
        po["failure_mode"] = NONE if scoring.passed else scoring.primary_failure


def phase_repair(doc, config, get_engine, scorer, router, make_result) -> None:
    """Phase 4 (orchestrator.py:897-1111): O6 truncation retry first,
    then up to ``max_retries`` planned repair rounds (whole-doc fallback
    chain when the per-page plan is empty), early exit once nothing
    needs repair."""
    has_passing_whole = any(
        w["audit_passed"] for w in doc["whole_doc_attempts"]
    )
    has_failing_whole = any(
        not w["audit_passed"] for w in doc["whole_doc_attempts"]
    )
    needs_whole_retry = has_failing_whole and not has_passing_whole
    if has_passing_whole and not kstate.pages_needing_repair(doc["pages"]):
        return
    if (
        needs_whole_retry
        and getattr(config, "truncation_retries", 1) > 0
        and doc["whole_doc_attempts"]
    ):
        latest = doc["whole_doc_attempts"][-1]
        if not latest["audit_passed"] and latest["failure_mode"] == TRUNCATED:
            engine_type = _engine_type_for(config, latest["engine"])
            if engine_type is not None:
                for _ in range(config.truncation_retries):
                    engine = get_engine(engine_type)
                    if not engine.is_available():
                        break
                    all_pages = list(range(1, doc["page_count"] + 1))
                    outputs = engine.process_pages(
                        doc["path"], all_pages, config,
                        dpi=getattr(config, "render_dpi", 200),
                    )
                    retry = make_result(
                        document_path=doc["path"], engine=engine.name,
                        status=SUCCESS if any(
                            p["status"] == SUCCESS for p in outputs
                        ) else ERROR,
                        pages=outputs, pages_processed=doc["page_count"],
                    )
                    _apply_result(doc, retry)
                    if retry["status"] == SUCCESS:
                        _score_repair_result(doc, retry, [], scorer)
                    ok = sum(
                        1 for p in outputs
                        if p["status"] == SUCCESS and p["audit_passed"]
                    )
                    if ok == doc["page_count"]:
                        needs_whole_retry = False
                        break
                if not needs_whole_retry:
                    return
    for _attempt in range(config.max_retries):
        plan = router.plan_repairs_doc(doc)
        if plan.is_empty and needs_whole_retry:
            tried = {r["engine"] for r in doc["engine_runs"]}
            next_engine = next(
                (et for et in config.fallback_chain if et.value not in tried),
                None,
            )
            if next_engine:
                engine = get_engine(next_engine)
                if engine.is_available():
                    all_pages = list(range(1, doc["page_count"] + 1))
                    outputs = engine.process_pages(
                        doc["path"], all_pages, config,
                        dpi=getattr(config, "render_dpi", 200),
                    )
                    repair_result = make_result(
                        document_path=doc["path"], engine=engine.name,
                        status=SUCCESS if any(
                            p["status"] == SUCCESS for p in outputs
                        ) else ERROR,
                        pages=outputs, pages_processed=doc["page_count"],
                    )
                    _apply_result(doc, repair_result)
                    if repair_result["status"] == SUCCESS:
                        _score_repair_result(doc, repair_result, [], scorer)
                        if not kstate.pages_needing_repair(doc["pages"]):
                            needs_whole_retry = False
                            break
                continue
        if plan.is_empty:
            break
        for engine_type, repairs in plan.by_engine.items():
            engine = get_engine(engine_type)
            if not engine.is_available():
                continue
            failed_pages = [r.page_num for r in repairs]
            outputs = engine.process_pages(
                doc["path"], failed_pages, config,
                dpi=getattr(config, "render_dpi", 200),
            )
            repair_result = make_result(
                document_path=doc["path"], engine=engine.name,
                status=SUCCESS if any(
                    p["status"] == SUCCESS for p in outputs
                ) else ERROR,
                pages=outputs, pages_processed=len(failed_pages),
            )
            _apply_result(doc, repair_result)
            if repair_result["status"] == SUCCESS:
                _score_repair_result(doc, repair_result, repairs, scorer)
        if not kstate.pages_needing_repair(doc["pages"]):
            break


def backbone_multi_engine(doc, config, get_engine, make_result):
    """Phase 2, multi-engine mode (orchestrator.py:640-717): every
    configured engine runs over all pages; unsupported/unavailable
    engines are skipped; every result accumulates into the state."""
    results = []
    for engine_type in config.multi_engine:
        try:
            engine = get_engine(engine_type)
        except ValueError:
            continue
        if not engine.is_available():
            continue
        all_pages = list(range(1, doc["page_count"] + 1))
        outputs = engine.process_pages(
            pdf_path=doc["path"], page_nums=all_pages, config=config,
            dpi=getattr(config, "render_dpi", 200),
        )
        ok = sum(1 for p in outputs if p["status"] == SUCCESS)
        result = make_result(
            document_path=doc["path"], engine=engine.name,
            status=SUCCESS if ok > 0 else ERROR, pages=outputs,
            pages_processed=doc["page_count"],
        )
        _apply_result(doc, result)
        results.append(result)
    return results


def phase_score_multi(doc, config, backbone_results, scorer) -> None:
    """Phase 3, multi-engine (orchestrator.py:813-895): score every
    successful engine result; per-page passes promote to best_output
    when the page has none."""
    for result in backbone_results:
        if result["status"] != SUCCESS:
            continue
        has_whole = any(p["page_num"] == 0 for p in result["pages"])
        if has_whole:
            whole = next(p for p in result["pages"] if p["page_num"] == 0)
            was_chunked = doc["page_count"] > getattr(config, "chunk_threshold", 30)
            scoring = scorer.score(
                whole["text"], engine=result["engine"],
                expected_pages=0 if was_chunked else doc["page_count"],
            )
            whole["audit_passed"] = scoring.passed
            result["audit_passed"] = scoring.passed
            whole["failure_mode"] = (
                NONE if scoring.passed else scoring.primary_failure
            )
            continue
        for po in result["pages"]:
            scoring = scorer.score(po["text"], engine=result["engine"])
            po["audit_passed"] = scoring.passed
            if scoring.passed:
                po["failure_mode"] = NONE
                ps = doc["pages"].get(po["page_num"])
                if ps is not None and not ps["best_output"]:
                    ps["best_output"] = po
            else:
                po["failure_mode"] = scoring.primary_failure


def phase_consensus(doc, config, make_page):
    """Phase 4b (orchestrator.py:1155-1207 + consensus.py:483-520):
    per-page consensus over multi-attempt pages via the kernel's
    select_best, installing a passing consensus best_output."""
    from smart_ocr_spark.kernel import consensus as kconsensus

    results = []
    for page_num in sorted(doc["pages"]):
        ps = doc["pages"][page_num]
        if ps["is_born_digital"] and ps["native_text"]:
            continue
        if len(ps["attempts"]) < 2:
            continue
        rows = [
            {
                "variant": a["engine"],
                "text": a["text"],
                "status": "error" if a["status"] == ERROR else str(a["status"]),
                "audit_passed": a["audit_passed"],
                "word_count": len((a["text"] or "").split()),
                "confidence": a.get("confidence") or 0.0,
            }
            for a in ps["attempts"]
        ]
        sel = kconsensus.select_best(rows, ps["native_text"] or "")
        sel["page_num"] = page_num
        results.append(sel)
        ps["best_output"] = make_page(
            page_num=page_num,
            text=sel["merged_text"],
            status=SUCCESS if sel["merged_text"].strip() else ERROR,
            engine=f"consensus({sel['selected_variant']})",
            audit_passed=True,
            confidence=sel["agreement_score"],
        )
    return results


def _engine_type_for(config, engine_name):
    # string-tolerant seam (ADVICE r3): harnesses may inject plain
    # strings for config.primary_engine instead of enum members — then
    # there is no enum to enumerate, and names compare directly
    primary = config.primary_engine
    if not hasattr(primary, "value"):
        return engine_name
    for et in type(primary):
        if et.value == engine_name:
            return et
    return None


def phase_assemble(doc, config, make_page, make_result, normalize_fn=None):
    """Phase 5 (orchestrator.py:1210-1290): assemble via the state
    ladder, derive the SUCCESS / AUDIT_FAILED / ERROR status, one
    page_num=0 final output, cost/engines lineage."""
    final_text = kstate.assemble_text(
        doc["pages"], doc["whole_doc_attempts"], doc["page_count"]
    )
    has_text = bool(final_text.strip())
    has_passing_whole = any(
        w["audit_passed"] for w in doc["whole_doc_attempts"]
    )
    pages_ok = (
        not kstate.pages_needing_repair(doc["pages"]) or has_passing_whole
    )
    if has_text and pages_ok:
        status = SUCCESS
    elif has_text:
        status = AUDIT_FAILED
    else:
        status = ERROR
    doc["status"] = status
    if has_text and normalize_fn is not None:
        final_text = normalize_fn(final_text)
    # figure blocks append AFTER normalization (orchestrator.py:
    # 1244-1276): save_figures gates it, and the caption is the
    # deterministic SURVEY §2.12 stub in place of the vision call
    if has_text and getattr(config, "save_figures", False):
        from smart_ocr_spark.kernel.figures import embed_figure_blocks

        final_text = embed_figure_blocks(final_text, doc.get("figures") or [])
    engines = kstate.engines_used(doc["engine_runs"])
    total_time = sum(
        r.get("processing_time") or 0.0 for r in doc["engine_runs"]
    )
    return make_result(
        document_path=doc["path"],
        engine=", ".join(engines) if engines else "none",
        status=status,
        pages=[
            make_page(
                page_num=0, text=final_text,
                status=SUCCESS if has_text else ERROR,
                engine=", ".join(engines),
            )
        ],
        pages_processed=doc["page_count"],
        processing_time=total_time,
        cost=kstate.total_cost(doc["engine_runs"]),
        audit_passed=status == SUCCESS,
    )
