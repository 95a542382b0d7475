"""Sequence packing: assemble documents into fixed token-budget
training sequences (the "concat-and-chunk" shard-assembly step every
LM training pipeline runs between curation and the trainer).

The packing rule is offset-based greedy: documents are laid out in a
deterministic order on a virtual token tape, and a document belongs to
the bin its FIRST token falls in (``bin = start_offset // budget``).
Bins can therefore overflow by at most one document tail — exactly the
standard best-effort packing used before boundary-splitting tokenizer
work, and (unlike true first-fit bin packing, which is a sequential
fold) it is pure window algebra, so both Spark and any SQL engine
compute it identically.

Scale shape (100 TB):

* the tape is sharded into ``n_groups`` INDEPENDENT groups by a
  uniform hash of the doc id — the window below partitions by
  ``group_id``, which is a hash-UNIFORM key, so partition sizes are
  ``corpus/n_groups`` BY CONSTRUCTION and no hot key can exist (this
  is the fundamental difference from content-keyed windows like the
  pre-round-5 paragraph-dedup keeper: content repeats, hashes of
  unique ids do not pile up);
* size ``n_groups`` so one group's (id, n_tokens) pairs fit a task
  (~10 M docs/group is nothing — the window carries two longs per
  row); groups are the parallelism unit and pack concurrently;
* token counting is JVM column algebra over the pinned whitespace
  class (`text_analysis.tokens_col`) — whole-stage codegen, no Python;
* `packing_stats` is a plain (group, bin)-keyed aggregation with
  map-side partials.

Determinism: group assignment is the md5 idiom of
``functions.sampling`` (engine-independent), order within a group is
``doc_id`` — independent of partitioning, cluster size, and engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from smart_ocr_spark.functions.sampling import sample_hash_col
from smart_ocr_spark.functions.text_analysis import tokens_col

_SALT = "pack"


def pack_offsets(
    df: DataFrame,
    budget: int,
    n_groups: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc packing assignment: (id, group_id, bin_id, n_tokens,
    start_offset) with ``bin_id = start_offset // budget`` on the
    group's virtual token tape (docs ordered by id).

    Zero-token docs keep their tape position (width 0) — they are
    assigned a bin and dropped later by the trainer-side reader, so
    the count bookkeeping here stays total.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")
    sized = df.select(
        F.col(id_col).alias("id"),
        (
            sample_hash_col(F.col(id_col).cast("string"), _SALT)
            % F.lit(n_groups)
        ).alias("group_id"),
        F.size(tokens_col(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("group_id")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sized.select(
        F.col("id").alias(id_col),
        "group_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    ).withColumn(
        # integral `div`, not float division: tape offsets on a 100 TB
        # corpus exceed double's exact-integer range long before 2^63
        "bin_id", F.expr(f"start_offset div {int(budget)}")
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global training shuffle: assign every doc a shard
    and a position within it, uniformly pseudo-random but exactly
    reproducible (the "shuffle the corpus into N shard files" step
    between curation and the trainer — trainers stream shards
    sequentially, so the shuffle must happen here, once, and any rerun
    must place every doc identically for resumability).

    ``shard_id`` and the within-shard order are INDEPENDENT md5 hashes
    of the doc id (different salts), so the order within a shard is
    uncorrelated with shard assignment — a full random permutation,
    not an id sort.

    Scale shape: one window, keyed by the hash-UNIFORM ``shard_id`` —
    partition sizes are corpus/n_shards by construction (same argument
    as :func:`pack_offsets`: ids are unique, so no hash key can pile
    up).  Size ``n_shards`` so one shard's (id, order_key) pairs fit a
    task; shards order concurrently.  Everything is JVM column algebra.

    Output: (id, shard_id, pos) with pos 1-based in shard order.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    sid = F.col(id_col).cast("string")
    assigned = df.select(
        F.col(id_col).alias("id"),
        (
            sample_hash_col(sid, f"{salt}:shard") % F.lit(n_shards)
        ).alias("shard_id"),
        sample_hash_col(sid, f"{salt}:order").alias("order_key"),
    )
    w = Window.partitionBy("shard_id").orderBy("order_key", "id")
    return assigned.select(
        F.col("id").alias(id_col),
        "shard_id",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def pack_shuffled(
    df: DataFrame,
    budget: int,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shuf",
) -> DataFrame:
    """Shuffle + pack in one pass: every doc gets a shard (uniform
    hash), a SHUFFLED position within the shard (independent hash —
    :func:`shuffle_shards` semantics), and a token-tape bin computed
    in that shuffled order — so consecutive training sequences mix the
    corpus instead of replaying id-adjacent (i.e. crawl-adjacent)
    documents.  This is the final shard-assembly operator a curation
    job ends with.

    Scale shape: ``row_number`` and the running token sum share ONE
    window spec (same uniform ``shard_id`` key, same order), so
    Catalyst plans a single exchange + sort for both — one shuffle
    total, no join between the shuffle and the packing.

    Output: (id, shard_id, pos, n_tokens, start_offset, bin_id).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    sid = F.col(id_col).cast("string")
    sized = df.select(
        F.col(id_col).alias("id"),
        (
            sample_hash_col(sid, f"{salt}:shard") % F.lit(n_shards)
        ).alias("shard_id"),
        sample_hash_col(sid, f"{salt}:order").alias("order_key"),
        F.size(tokens_col(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("shard_id").orderBy("order_key", "id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        sized.select(
            F.col("id").alias(id_col),
            "shard_id",
            F.row_number().over(w).cast("bigint").alias("pos"),
            "n_tokens",
            (F.sum("n_tokens").over(wcum) - F.col("n_tokens")).alias(
                "start_offset"
            ),
        ).withColumn("bin_id", F.expr(f"start_offset div {int(budget)}"))
    )


def packing_stats(
    packed: DataFrame, budget: int, group_col: str = "group_id"
) -> DataFrame:
    """Roll the per-doc assignment up to (group, bin_id): doc count,
    token sum, 4-decimal fill ratio, and whether the bin overflows the
    budget (possible by at most one document tail — see module doc).

    ``group_col`` defaults to :func:`pack_offsets` output; pass
    ``"shard_id"`` to roll up :func:`pack_shuffled` output with the
    same fill/overflow definitions.

    One shuffle on (group, bin_id) with map-side partial aggs."""
    return packed.groupBy(group_col, "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 4).alias(
            "fill_ratio"
        ),
        (F.sum("n_tokens") > F.lit(budget)).alias("overflows"),
    )
