"""Pure calibration rules (reference ``benchmark/calibrate.py``):
per-engine profiles from benchmark runs, failure-mode recovery rates,
and the category chain-ranking rule that O11 feeds back into the repair
router.

Row shapes (plain dicts):
  run:     {paper_name, failure_mode (str), processing_time, wer|None}
  profile: {engine, category_wer: {cat: avg}, failure_mode_recovery,
            avg_processing_time}

``plans.benchmark.recommended_chains`` uses :func:`rank_engines_for_
category` on the Spark-computed calibration rollup; the reference's own
calibrator test matrix replays against these functions verbatim.
"""

from __future__ import annotations

RECOVERY_WER_CEILING = 0.5  # reference calibrate.py:185: "recovered" =
#                             still produced a score with WER below this


def build_profile(
    engine: str,
    runs: list[dict],
    paper_categories: dict[str, str] | None = None,
) -> dict:
    """Per-engine profile (reference calibrate.py:156-211, 248-288).

    Without a category mapping every scored run lands in the ``_all``
    bucket; with one, unmapped papers land in ``_unknown``.  A failure
    mode counts as "recovered" when the run still carried a score with
    WER < 0.5 (usable output despite the failure).
    """
    category_wers: dict[str, list[float]] = {}
    processing_times: list[float] = []
    failure_counts: dict[str, int] = {}
    failure_successes: dict[str, int] = {}
    for run in runs:
        processing_times.append(float(run.get("processing_time") or 0.0))
        if paper_categories is None:
            category = "_all"
        else:
            category = paper_categories.get(run["paper_name"], "_unknown")
        fm = run.get("failure_mode") or "none"
        wer = run.get("wer")
        if fm != "none":
            failure_counts[fm] = failure_counts.get(fm, 0) + 1
            if wer is not None and wer < RECOVERY_WER_CEILING:
                failure_successes[fm] = failure_successes.get(fm, 0) + 1
        if wer is not None:
            category_wers.setdefault(category, []).append(float(wer))
    return {
        "engine": engine,
        "category_wer": {
            cat: (sum(ws) / len(ws) if ws else 1.0)
            for cat, ws in category_wers.items()
        },
        "failure_mode_recovery": {
            fm: failure_successes.get(fm, 0) / count
            for fm, count in failure_counts.items()
        },
        "avg_processing_time": (
            sum(processing_times) / len(processing_times)
            if processing_times
            else 0.0
        ),
    }


def avg_wer(profile: dict) -> float:
    """Average WER across a profile's categories; 1.0 with no data
    (reference calibrate.py:323-327)."""
    cw = profile.get("category_wer") or {}
    if not cw:
        return 1.0
    return sum(cw.values()) / len(cw)


def rank_engines_for_category(category: str, profiles: list[dict]) -> list[str]:
    """The O11 chain-ranking rule (reference calibrate.py:296-320):
    engines with data for the category rank by that category's WER;
    engines without data go last, ranked by their overall average WER.
    Ties break by engine name via the (wer, name) tuple sort — the
    determinism the distributed chain recommendation relies on."""
    with_data: list[tuple[float, str]] = []
    without_data: list[tuple[float, str]] = []
    for profile in profiles:
        wer = (profile.get("category_wer") or {}).get(category)
        if wer is not None:
            with_data.append((wer, profile["engine"]))
        else:
            without_data.append((avg_wer(profile), profile["engine"]))
    with_data.sort()
    without_data.sort()
    return [n for _, n in with_data] + [n for _, n in without_data]


def rank_overall(profiles: list[dict]) -> list[str]:
    """Engines by average WER across all categories, stable on ties
    (reference calibrate.py:130-134 apply_to_config ranking)."""
    return [
        p["engine"]
        for p in sorted(profiles, key=avg_wer)
    ]
