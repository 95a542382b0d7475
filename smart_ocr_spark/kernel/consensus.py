"""Consensus discrepancy detectors (A8/A9).

Re-implements the reference's ``_find_discrepancies``
(``src/socr/pipeline/consensus.py:225-253``): on every multi-attempt
page the reference reports WHY the attempts disagree — a word-count
spread beyond 30% of the mean, and a passed/failed audit split across
engines.  The note strings are kept byte-identical so downstream
consumers (and the reference's test expectations,
``tests/test_consensus.py:382-397``) transfer directly; "engine" maps
to our kernel ``variant``.
"""

from __future__ import annotations

WORD_COUNT_SPREAD_FRAC = 0.3  # reference consensus.py:239


def find_discrepancies(attempts: list[dict]) -> list[str]:
    """Notable differences between attempts.

    ``attempts`` rows need ``variant``, ``word_count``, ``audit_passed``
    (any extra keys ignored).  Returns [] for fewer than two attempts,
    mirroring the reference exactly — including its dict semantics where
    a variant attempted twice contributes its LAST audit status to the
    divergence split (consensus.py:243).
    """
    discs: list[str] = []
    if len(attempts) < 2:
        return discs

    word_counts = [(a["variant"], int(a["word_count"] or 0)) for a in attempts]
    wc_values = [wc for _, wc in word_counts]
    if wc_values:
        spread = max(wc_values) - min(wc_values)
        avg = sum(wc_values) / len(wc_values)
        if avg > 0 and spread / avg > WORD_COUNT_SPREAD_FRAC:
            sorted_wcs = sorted(word_counts, key=lambda x: x[1], reverse=True)
            desc = ", ".join(f"{eng}={wc}" for eng, wc in sorted_wcs)
            discs.append(f"Word count spread: {desc}")

    audit_statuses = {a["variant"]: bool(a["audit_passed"]) for a in attempts}
    passed = [e for e, v in audit_statuses.items() if v]
    failed = [e for e, v in audit_statuses.items() if not v]
    if passed and failed:
        discs.append(
            f"Audit divergence: passed=[{', '.join(passed)}], "
            f"failed=[{', '.join(failed)}]"
        )

    return discs


def select_best(attempts: list[dict], reference_text: str = "") -> dict:
    """Heuristic consensus selection (reference consensus.py:337-417
    ``ConsensusEngine.select_best``), kernel form.

    ``attempts`` rows need ``variant``, ``text``, ``status``,
    ``audit_passed``, ``word_count``, ``confidence``.  Returns
    ``{selected_variant, merged_text, agreement_score, discrepancies}``.

    Flow mirrors the reference exactly: empty input -> sentinel "none";
    viable = non-empty text and status != "error"; none viable -> first
    attempt's text as last resort with the canonical discrepancy note;
    single viable -> agreement 1.0; else grounded/ungrounded scoring
    (kernel.score.score_attempt) with a STABLE descending sort (score
    ties keep attempt order, like the reference's list.sort).
    """
    from smart_ocr_spark.kernel import score as score_kernel

    if not attempts:
        return {
            "selected_variant": "none",
            "merged_text": "",
            "agreement_score": 0.0,
            "discrepancies": [],
        }
    viable = [
        a for a in attempts
        if (a["text"] or "").strip() and a.get("status") != "error"
    ]
    if not viable:
        return {
            "selected_variant": attempts[0]["variant"],
            "merged_text": attempts[0]["text"] or "",
            "agreement_score": 0.0,
            "discrepancies": ["All attempts failed or produced empty output"],
        }
    if len(viable) == 1:
        a = viable[0]
        return {
            "selected_variant": a["variant"],
            "merged_text": a["text"],
            "agreement_score": 1.0,
            "discrepancies": [],
        }
    scored = [
        (
            a,
            score_kernel.score_attempt(
                a["text"] or "",
                bool(a["audit_passed"]),
                int(a["word_count"] or 0),
                float(a.get("confidence") or 0.0),
                reference_text,
            ),
        )
        for a in viable
    ]
    scored.sort(key=lambda x: x[1], reverse=True)  # stable: ties keep order
    best = scored[0][0]
    return {
        "selected_variant": best["variant"],
        "merged_text": best["text"],
        "agreement_score": score_kernel.pairwise_agreement(
            [a["text"] for a in viable]
        ),
        "discrepancies": find_discrepancies(viable),
    }
