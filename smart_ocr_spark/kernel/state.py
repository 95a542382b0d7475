"""Pure per-document state-machine rules (reference ``core/state.py``).

The distributed pipeline expresses these as column algebra — first
passing attempt by index (W2, ``operators.extract.with_selection``),
ordered assembly concat (A2), engines-used/cost lineage (A4) — but the
RULES themselves live here as pure functions over plain dicts so the
reference's own state-machine test matrix replays against them verbatim
(``tests/test_reference_replay.py``) and the operator layer has one
place to cite.

Row shapes (plain dicts; extra keys ignored):
  page:    {page_num, is_born_digital, native_text,
            needs_ocr_enhancement, attempts: [attempt], best_output}
  attempt: {page_num, text, audit_passed, engine}
  run:     {engine, cost, pages: [attempt]}
"""

from __future__ import annotations

from smart_ocr_spark.kernel.repair import page_needs_repair

PAGE_SEP = "\n\n---\n\n"  # reference state.py:148


def new_pages(page_count: int) -> dict[int, dict]:
    """One pre-created page-state dict per 1-indexed page
    (reference state.py:74-77)."""
    return {
        i: {
            "page_num": i,
            "is_born_digital": False,
            "native_text": None,
            "needs_ocr_enhancement": False,
            "attempts": [],
            "best_output": None,
        }
        for i in range(1, page_count + 1)
    }


def apply_result(
    pages: dict[int, dict],
    whole_doc_attempts: list[dict],
    result_pages: list[dict],
) -> None:
    """Merge an engine run's page outputs (reference state.py:83-94):
    page_num=0 rows are whole-doc attempts; per-page rows append to the
    page's attempt list, and the FIRST passing attempt becomes
    best_output (later passing attempts never replace it).  Unknown
    page numbers are ignored."""
    for out in result_pages:
        if out["page_num"] == 0:
            whole_doc_attempts.append(out)
            continue
        page = pages.get(out["page_num"])
        if page is None:
            continue
        page["attempts"].append(out)
        if page["best_output"] is None and out["audit_passed"]:
            page["best_output"] = out


def apply_born_digital(pages: dict[int, dict], assessments: list[dict]) -> None:
    """Apply per-page born-digital assessment (reference state.py:96-106):
    the flag always lands; native text and the enhancement preference
    only when born-digital.  Unknown pages are ignored."""
    for pa in assessments:
        page = pages.get(pa["page_num"])
        if page is None:
            continue
        page["is_born_digital"] = pa["is_born_digital"]
        if pa["is_born_digital"]:
            page["native_text"] = pa.get("native_text")
            page["needs_ocr_enhancement"] = bool(
                pa.get("needs_ocr_enhancement", False)
            )


def assemble_text(
    pages: dict[int, dict],
    whole_doc_attempts: list[dict],
    page_count: int,
) -> str:
    """The final-text selection/assembly ladder (reference
    state.py:111-148, mirrored distributed by ``with_selection`` + the
    ordered-assembly concat):

    - whole-doc-only runs: last PASSING whole-doc attempt, else
      born-digital native assembly, else the latest attempt as a last
      resort;
    - otherwise per page: passing best output > born-digital native >
      any best output; pages with neither are skipped; joined with the
      reference page separator."""
    has_per_page = any(p["best_output"] for p in pages.values())
    has_native = any(
        p["is_born_digital"] and p["native_text"] for p in pages.values()
    )
    if not has_per_page and whole_doc_attempts:
        passing = [w for w in whole_doc_attempts if w["audit_passed"]]
        if passing:
            return passing[-1]["text"]
        if has_native:
            return assemble_native_text(pages, page_count)
        return whole_doc_attempts[-1]["text"]
    texts: list[str] = []
    for i in range(1, page_count + 1):
        p = pages[i]
        best = p["best_output"]
        if best and best["audit_passed"]:
            texts.append(best["text"])
        elif p["is_born_digital"] and p["native_text"]:
            texts.append(p["native_text"])
        elif best:
            texts.append(best["text"])
    return PAGE_SEP.join(texts)


def assemble_native_text(pages: dict[int, dict], page_count: int) -> str:
    """Born-digital native assembly (reference state.py:150-158)."""
    return PAGE_SEP.join(
        pages[i]["native_text"]
        for i in range(1, page_count + 1)
        if pages[i]["native_text"]
    )


def pages_needing_repair(pages: dict[int, dict]) -> list[int]:
    """Sorted page numbers still needing (re)processing
    (reference state.py:161-163); the predicate is
    :func:`kernel.repair.page_needs_repair`."""
    out = []
    for i, p in sorted(pages.items()):
        best = p["best_output"]
        if page_needs_repair(
            p["is_born_digital"],
            p["native_text"],
            p["needs_ocr_enhancement"],
            len(p["attempts"]),
            None if best is None else best["audit_passed"],
        ):
            out.append(i)
    return out


def result_markdown(page_texts: list[str]) -> str:
    """Engine-run markdown assembly (reference result.py:119-127):
    empty page texts are skipped; a single text returns as-is; multiple
    join with the page separator.  This is the per-RUN assembly — the
    per-DOCUMENT ladder is :func:`assemble_text`."""
    texts = [t for t in page_texts if t]
    if not texts:
        return ""
    if len(texts) == 1:
        return texts[0]
    return PAGE_SEP.join(texts)


def page_needs_reprocessing(status_is_error: bool, audit_passed: bool) -> bool:
    """Per-attempt reprocess predicate (reference result.py:91-94):
    errored attempts always reprocess; otherwise audit decides."""
    if status_is_error:
        return True
    return not audit_passed


def page_context(
    pages: dict[int, dict],
    whole_doc_attempts: list[dict],
    page_num: int,
    limit: int = 500,
) -> str:
    """Text context for a page's figure descriptions (reference
    ``_get_page_context``, orchestrator.py:1415-1423): the page's best
    output, else the first whole-doc attempt with text, truncated."""
    ps = pages.get(page_num)
    if ps and ps.get("best_output"):
        return (ps["best_output"]["text"] or "")[:limit]
    for attempt in whole_doc_attempts:
        if attempt.get("text"):
            return attempt["text"][:limit]
    return ""


def total_cost(engine_runs: list[dict]) -> float:
    """Sum of run costs (reference state.py:166-168; distributed as the
    A4 cost_microusd column).  Runs without a cost field count as 0."""
    return sum(r.get("cost") or 0.0 for r in engine_runs)


def engines_used(engine_runs: list[dict]) -> list[str]:
    """Ordered unique engines (reference state.py:170-172; distributed
    as array_distinct over attempt variants)."""
    return list(dict.fromkeys(r["engine"] for r in engine_runs))
