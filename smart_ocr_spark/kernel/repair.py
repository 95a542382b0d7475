"""Repair routing policy — failure mode × tried-variants → next variant.

Re-implements the reference's ``RepairRouter`` policy table
(``src/socr/pipeline/repair.py:19-53,109-136,178-245``) over our kernel
variants instead of subprocess engines.  The family/tier structure is kept
so the policy matrix (reference tests/test_repair_router.py:154-247) remains
exercisable:

  variant      family    tiers
  ---------    -------   ------------------------
  layout       struct    capable
  density      struct    capable
  basic        plain     light
  layout_alt   alt       capable, cloud-analog
  raw          plain     light

``layout_alt`` is the different-family escape hatch for hallucination-class
failures; ``raw`` is the lightest kernel for timeout-class failures.
"""

from __future__ import annotations

from smart_ocr_spark.kernel import audit

# Ordered default fallback chain (the reference's config.fallback_chain +
# primary + enabled, deduped in order: repair.py:183-208).
DEFAULT_CHAIN = ["layout", "density", "basic", "layout_alt", "raw"]

# Same-variant retries on TRUNCATED before falling to the capable tier
# (reference orchestrator.py:928-998 retry-on-truncation; the count is
# config.truncation_retries, core/config.py:108).
TRUNCATION_RETRIES = 1

FAMILIES = {
    "layout": "struct",
    "density": "struct",
    "basic": "plain",
    "raw": "plain",
    "layout_alt": "alt",
    "raster": "ocr",  # scanned-recovery tier (outside the text chain)
}

# Tier sets (reference repair.py:34-53).
CLOUD_VARIANTS = {"layout_alt", "layout"}      # _CLOUD_ENGINES analog
LIGHT_VARIANTS = ["basic", "raw"]              # _LIGHT_ENGINES analog
CAPABLE_VARIANTS = ["layout", "density", "layout_alt"]  # _CAPABLE_ENGINES analog

# The scanned-recovery tier (kernel/raster.py) sits OUTSIDE the text
# chain: it is only ever routed to image-only docs (select_repair_variant
# scanned=True), so chain consumers (calibration, exhaustion contracts)
# are untouched.
RASTER_VARIANT = "raster"


def candidates(tried: set[str], chain: list[str] | None = None) -> list[str]:
    """Untried chain variants in order (reference repair.py:178-181).

    An explicitly EMPTY chain means "repair disabled" and yields no
    candidates — `chain or DEFAULT_CHAIN` would silently re-enable the
    full default chain."""
    source = DEFAULT_CHAIN if chain is None else chain
    return [v for v in source if v not in tried]


def _pick_different_family(
    tried: set[str], cands: list[str], families: dict[str, str]
) -> str:
    tried_families = {families.get(v) for v in tried} - {None}
    for v in cands:
        fam = families.get(v)
        if fam and fam not in tried_families:
            return v
    return cands[0]


def _pick_first_in(preferred, cands: list[str]) -> str:
    for v in cands:
        if v in preferred:
            return v
    return cands[0]


def select_repair_variant(
    failure_mode: str,
    tried: set[str],
    chain: list[str] | None = None,
    last_variant: str | None = None,
    last_variant_runs: int = 1,
    truncation_retries: int = TRUNCATION_RETRIES,
    families: dict[str, str] | None = None,
    cloud: "set[str] | None" = None,
    light: "list[str] | None" = None,
    capable: "list[str] | None" = None,
    scanned: bool = False,
) -> str | None:
    """Policy table (reference repair.py:109-136):

    hallucination -> different family; refusal -> cloud tier;
    garbage / low_word_count / truncated -> capable tier;
    timeout -> light tier; otherwise first untried.  None when exhausted.

    TRUNCATED first retries the SAME variant up to ``truncation_retries``
    times before the capable-tier fallback (reference
    orchestrator.py:928-998: truncation is treated as transient, so the
    engine that truncated gets another shot).  ``last_variant_runs``
    counts how many times ``last_variant`` has run so far — retries are
    spent when it exceeds the original run + the retry budget.  The
    retry only makes sense for NONDETERMINISTIC engines; callers running
    deterministic in-process kernels pass ``truncation_retries=0`` (a
    same-variant retry would reproduce byte-identical output).

    The policy is TABLE-GENERIC: ``families``/``cloud``/``light``/
    ``capable`` default to the kernel-variant tables above, but the
    reference-test replay harness injects the reference's ENGINE tables
    (repair.py:19-53) and runs its full routing matrix through this very
    function — the algorithm, not just the tables, is what parity pins.
    """
    families = FAMILIES if families is None else families
    cloud = CLOUD_VARIANTS if cloud is None else cloud
    light = LIGHT_VARIANTS if light is None else light
    capable = CAPABLE_VARIANTS if capable is None else capable
    if scanned:
        # image-only docs have no text layer for ANY text-parse variant
        # to find — their only candidate is the raster-OCR tier, which
        # sits OUTSIDE the text chain (the reference routes its scanned
        # category to OCR engines, never to native extraction).  Once
        # raster has been tried the doc is exhausted.
        return RASTER_VARIANT if RASTER_VARIANT not in tried else None
    cands = candidates(tried, chain)
    if (
        failure_mode == audit.TRUNCATED
        and last_variant is not None
        and last_variant_runs <= truncation_retries
        and cands
    ):
        # retry only while the chain still has untried work: once the
        # chain is spent the documented exhaustion contract (-> None)
        # wins over another guaranteed round
        return last_variant
    if not cands:
        return None
    if failure_mode == audit.HALLUCINATION:
        return _pick_different_family(tried, cands, families)
    if failure_mode == audit.REFUSAL:
        return _pick_first_in(cloud, cands)
    if failure_mode in (audit.GARBAGE, audit.LOW_WORD_COUNT, audit.TRUNCATED):
        return _pick_first_in(capable, cands)
    if failure_mode == audit.TIMEOUT:
        return _pick_first_in(light, cands)
    return cands[0]


def page_needs_repair(
    is_born_digital: bool,
    native_text: str | None,
    needs_ocr_enhancement: bool,
    n_attempts: int,
    best_passed: bool | None,
) -> bool:
    """Page-grain needs-repair predicate (reference state.py:37-57).

    ``best_passed`` is None when no best output exists yet.  Born-digital
    prose pages with native text never need repair; enhancement pages
    want one OCR attempt then fall back to native (anti-infinite-loop);
    otherwise a page needs repair until a passing best output exists.
    The document-grain pipeline fuses this into
    ``operators.extract.needs_repair_col``; this scalar form is the
    per-page contract the reference router tests replay.
    """
    if is_born_digital and native_text:
        if needs_ocr_enhancement:
            if best_passed:
                return False  # OCR succeeded
            if n_attempts > 0:
                return False  # OCR tried and failed; native is fallback
            return True  # no OCR attempted yet: request it
        return False
    return best_passed is None or not best_passed


def dominant_failure(attempt_failures: list[str]) -> str:
    """Most recent non-NONE failure (reference repair.py:247-257); attempts
    ordered by attempt index ascending.  EMPTY_OUTPUT when none."""
    for mode in reversed(attempt_failures):
        if mode and mode != audit.NONE:
            return mode
    return audit.EMPTY_OUTPUT


def build_reason(failure: str, tried: set[str], variant: str) -> str:
    """Human-readable routing note (reference repair.py:271-281)."""
    tried_names = ", ".join(sorted(tried)) if tried else "none"
    return f"failure={failure}, tried=[{tried_names}], selected={variant}"
