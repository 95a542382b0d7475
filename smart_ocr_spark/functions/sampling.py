"""Deterministic corpus sampling (training-data op).

Training pipelines sample constantly — held-out splits, per-language
quotas, ablation subsets — and the samples must be REPRODUCIBLE:
independent of partitioning, cluster size, row order, and engine.
Spark's ``df.sample`` is none of those (seeded per-partition RNG), so
these operators hash a stable row key instead:

    keep  <=>  int(md5(salt ':' id)[:8 hex], 16) < fraction * 2^32

All JVM column algebra (``conv(substr(md5(...)))`` — whole-stage
codegen); the same arithmetic is one expression in any SQL engine, so
every sample is exactly oracle-checkable.  Different ``salt`` values
give independent samples; the same salt always reproduces the same
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HASH_SPACE = 1 << 32  # first 8 md5 hex chars


def sample_hash_col(id_col, salt: str):
    """Uniform [0, 2^32) hash of (salt, id) — the sampling coordinate.

    NULL-propagating on purpose (F.concat, not concat_ws): a NULL id
    yields a NULL hash, and every threshold comparison drops the row —
    the same thing '<salt>:' || NULL does in SQL.  concat_ws would
    silently hash every NULL-id row to the constant md5(salt) and keep
    or drop them as a block."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), id_col)), 1, 8
        ),
        16,
        10,
    ).cast("bigint")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by stable hash of ``id_col``.

    Exactly reproducible across runs, partitionings, and engines; rows
    are kept or dropped by identity, never by position."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * HASH_SPACE)
    return df.where(
        sample_hash_col(F.col(id_col).cast("string"), salt) < F.lit(threshold)
    )


def deterministic_split(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> tuple[DataFrame, DataFrame]:
    """(kept, rest): the sample and its exact complement, from ONE
    threshold — so the split logic (and its NULL/rounding semantics)
    lives in one place.  NULL-id rows land in NEITHER side (their hash
    is NULL), mirroring the SQL formulation."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * HASH_SPACE)
    h = sample_hash_col(F.col(id_col).cast("string"), salt)
    return df.where(h < F.lit(threshold)), df.where(h >= F.lit(threshold))


def resample_to_mix(
    df: DataFrame,
    class_col: str,
    targets: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix0",
) -> DataFrame:
    """Deterministically downsample to a target class mixture (the
    domain-reweighting step of LM data recipes: "the training set
    should be 30% web, 30% code, 40% papers").

    ``targets`` maps class value -> desired share (must sum to ~1).
    The largest achievable total preserving the exact mixture is
    ``T = min_c(n_c / p_c)``; each class keeps fraction
    ``p_c * T / n_c`` (the binding class keeps everything), chosen by
    the same stable md5 threshold as :func:`deterministic_sample` —
    so the resample is reproducible across runs, partitionings, and
    engines, and classes not listed in ``targets`` are dropped.

    Scale shape: class counts are ONE aggregation with at most
    ``len(targets)`` result rows, broadcast back onto the corpus; the
    per-row decision is then a JVM hash-threshold compare.  The corpus
    never shuffles — the only exchange is the tiny counts agg.

    Engine parity: thresholds are ``floor((p * T / n) * 2^32)`` with
    the multiplication/division in that exact order, so IEEE double
    arithmetic produces bit-identical thresholds in Spark and SQL.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    for c, p in targets.items():
        if not 0.0 < p <= 1.0:
            raise ValueError(f"target share for {c!r} must be in (0, 1]")
    total = sum(targets.values())
    if not 0.99 <= total <= 1.01:
        raise ValueError(f"target shares must sum to ~1, got {total}")

    tgt = (
        df.sparkSession.createDataFrame(
            sorted(targets.items()), f"{class_col} string, p double"
        )
    )
    counts = (
        df.join(F.broadcast(tgt), class_col)
        .groupBy(class_col, "p")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    # a target class ABSENT from the corpus makes T = min(n/p) = 0 —
    # the requested mixture is unachievable; silently renormalizing
    # over the present classes would hand the caller a mixture that
    # does not match `targets`, so fail loudly instead (the counts agg
    # is ≤ len(targets) rows — the action is cheap)
    present = {r[class_col] for r in counts.select(class_col).collect()}
    missing = sorted(set(targets) - present)
    if missing:
        raise ValueError(
            f"target classes absent from the corpus: {missing}; "
            "T = min_c(n_c/p_c) is 0 and no resample can satisfy the mix"
        )
    feasible = counts.agg(
        F.min(F.col("n") / F.col("p")).alias("t_total")
    )
    thresholds = counts.crossJoin(F.broadcast(feasible)).select(
        class_col,
        F.floor(
            (F.col("p") * F.col("t_total") / F.col("n"))
            * F.lit(float(HASH_SPACE))
        ).alias("keep_threshold"),
    )
    return (
        df.join(F.broadcast(thresholds), class_col)
        .where(
            sample_hash_col(F.col(id_col).cast("string"), salt)
            < F.col("keep_threshold")
        )
        .drop("keep_threshold")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas).

    ``fractions`` maps stratum value -> keep fraction; strata not listed
    use ``default_fraction``.  The per-row decision is the same stable
    hash as :func:`deterministic_sample`, so enlarging one stratum's
    fraction only ADDS rows (nested samples — ablation-friendly)."""
    for v in list(fractions.values()) + [default_fraction]:
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fractions must be in [0, 1], got {v}")
    thr = F.lit(int(default_fraction * HASH_SPACE))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value),
            F.lit(int(frac * HASH_SPACE)),
        ).otherwise(thr)
    return df.where(
        sample_hash_col(F.col(id_col).cast("string"), salt) < thr
    )
