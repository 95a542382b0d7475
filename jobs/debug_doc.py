#!/usr/bin/env python
"""Single-document debug harness: run ONE payload through the
reference-shaped 5-phase control flow (``kernel.orchestrate``) with the
in-process kernel variants standing in as "engines".

This is the Spark-free path for answering "why did THIS document come
out this way?" — the same assess/audit/repair/consensus/assembly rules
the distributed pipeline applies, executed sequentially with a
phase-by-phase trace.  No SparkSession, no executors: paste a file and
read the ladder.

Usage:
    python jobs/debug_doc.py page.html
    python jobs/debug_doc.py paper.pdf --chain layout,basic,raw
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Scoring:
    def __init__(self, chk: dict):
        self.passed = chk["audit_passed"]
        self.primary_failure = chk["primary_failure"]
        self.details = dict.fromkeys(chk["failure_modes"], "")


class KernelScorer:
    """kernel.audit as the orchestrator's scorer seam."""

    def score(self, text: str, engine: str = "", expected_pages: int = 0):
        from smart_ocr_spark.kernel import audit

        return _Scoring(audit.check(text, expected_pages=expected_pages))


class VariantEngine:
    """One kernel variant presented through the engine seam."""

    def __init__(self, variant: str, payload: bytes):
        self.name = variant
        self.model_version = ""
        self._payload = payload

    def is_available(self) -> bool:
        return True

    def process_pages(self, pdf_path, page_nums, config, dpi=200):
        from smart_ocr_spark.kernel.extract import extract_payload_variant

        text = extract_payload_variant(self._payload, self.name) or ""
        ok = bool(text.strip())
        # doc-grain kernels: page 1 carries the whole rendering (the
        # distributed pipeline is likewise document-grain, SURVEY §1.4)
        return [
            {
                "page_num": pn,
                "text": text,
                "status": "success" if ok else "error",
                "engine": self.name,
                "failure_mode": "none" if ok else "empty_output",
                # empty output must not pre-pass (it would become a
                # passing best_output and disable the repair ladder)
                "audit_passed": ok,
                "confidence": 0.0,
                "escalated_from": "",
                "processing_time": 0.0,
            }
            for pn in page_nums
        ]


class VariantRouter:
    """kernel.repair over the kernel variant tables.  ``scanned`` routes
    image-only docs to the raster tier, mirroring the pipeline's
    scanned_py rule (operators/extract.py) and the compat CLI."""

    def __init__(self, chain, scanned: bool = False):
        self._chain = chain
        self._scanned = scanned

    def plan_repairs_doc(self, doc):
        from types import SimpleNamespace

        from smart_ocr_spark.kernel import repair

        repairs, skipped = [], []
        for page_num, ps in sorted(doc["pages"].items()):
            best = ps["best_output"]
            if not repair.page_needs_repair(
                ps["is_born_digital"], ps["native_text"],
                ps["needs_ocr_enhancement"], len(ps["attempts"]),
                None if best is None else best["audit_passed"],
            ):
                continue
            failure = repair.dominant_failure(
                [a["failure_mode"] for a in ps["attempts"]]
            )
            tried = {a["engine"] for a in ps["attempts"]}
            picked = repair.select_repair_variant(
                failure, tried, chain=self._chain, scanned=self._scanned
            )
            if picked is None:
                skipped.append(page_num)
            else:
                repairs.append(
                    SimpleNamespace(
                        page_num=page_num,
                        engine=picked,
                        reason=repair.build_reason(failure, tried, picked),
                    )
                )
        groups: dict = {}
        for r in repairs:
            groups.setdefault(r.engine, []).append(r)
        return SimpleNamespace(
            repairs=repairs, pages_skipped=skipped,
            is_empty=not repairs, by_engine=groups,
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="HTML or PDF file")
    ap.add_argument(
        "--chain",
        default=None,
        help="comma-separated repair chain (default: kernel DEFAULT_CHAIN)",
    )
    ap.add_argument("--max-retries", type=int, default=2)
    args = ap.parse_args()

    from types import SimpleNamespace

    from smart_ocr_spark.kernel import assess, orchestrate
    from smart_ocr_spark.kernel.extract import extract_payload_full, finalize_text
    from smart_ocr_spark.kernel.repair import DEFAULT_CHAIN

    payload = Path(args.path).read_bytes()
    chain = args.chain.split(",") if args.chain else list(DEFAULT_CHAIN)

    # Phase 1 inputs from the fused parse + assessment cascade
    parsed = extract_payload_full(payload)
    parsed.pop("_pdf_doc", None)
    n_pages = max(int(parsed.get("n_pages") or 1), 1)
    doc = orchestrate.new_document(args.path, 1)  # doc-grain: one "page"
    r = assess.assess_page(
        parsed["basic_text"],
        font_count=parsed["font_count"],
        has_images=parsed["has_figures"],
        has_tables=parsed["has_tables"],
        has_equations=parsed["has_equations"],
        # parity with the distributed path: the layout rendering (table
        # aware for ruled pages) is the born-digital native output
        structured_text=parsed["layout_text"],
    )
    orchestrate.phase_analyze(
        doc,
        {
            "path": args.path,
            "pages": [
                {
                    "page_num": 1,
                    "is_born_digital": r["is_born_digital"],
                    "native_text": r["native_text"],
                    "needs_ocr_enhancement": r["needs_ocr_enhancement"],
                }
            ],
        },
    )
    print(f"# analyze: born_digital={r['is_born_digital']} "
          f"confidence={r['confidence']} notes={r['notes']}")

    config = SimpleNamespace(
        primary_engine=chain[0],
        fallback_chain=chain[1:],
        enabled_engines=chain,
        native_first=True,
        audit_enabled=True,
        max_retries=args.max_retries,
        truncation_retries=0,  # deterministic kernels: retry is a no-op
        chunk_threshold=30,
        render_dpi=200,
        multi_engine=[],
    )
    engines = {v: VariantEngine(v, payload) for v in chain}

    def get_engine(v):
        # on-demand so off-chain tiers (raster for scanned docs) resolve
        v = str(v)
        if v not in engines:
            engines[v] = VariantEngine(v, payload)
        return engines[v]
    scorer = KernelScorer()
    scanned_doc = bool(
        parsed.get("is_pdf")
        and (parsed.get("n_images") or 0) > 0
        and (parsed.get("total_chars") or 0) == 0
    )
    router = VariantRouter(chain, scanned=scanned_doc)

    backbone = orchestrate.phase_backbone(
        doc, config, get_engine, scorer, dict, dict
    )
    print(f"# backbone: engine={backbone['engine']} status={backbone['status']}")
    if backbone["status"] == "success":
        orchestrate.phase_score(doc, config, backbone, scorer)
        atts = doc["pages"][1]["attempts"]
        if atts:
            print(f"# score: audit_passed={atts[-1]['audit_passed']} "
                  f"failure={atts[-1].get('failure_mode', 'none')}")
        else:
            print("# score: born-digital native text (no OCR attempt)")
    orchestrate.phase_repair(doc, config, get_engine, scorer, router, dict)
    print(f"# repair: attempts={[a['engine'] for a in doc['pages'][1]['attempts']]}")
    final = orchestrate.phase_assemble(
        doc, config, dict, dict, normalize_fn=finalize_text
    )
    print(f"# assemble: status={final['status']} "
          f"engines={final['engine']} chars={len(final['pages'][0]['text'])}")
    print(json.dumps({
        "status": final["status"],
        "engines": final["engine"],
        "n_pages": n_pages,
        "text": final["pages"][0]["text"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
