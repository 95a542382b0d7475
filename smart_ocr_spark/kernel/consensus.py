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
