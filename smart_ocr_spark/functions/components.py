"""Connected components over near-duplicate pair graphs.

Pair emitters (MinHash-LSH, SimHash, embedding near-dup) answer "which
documents look alike"; the actionable dedup answer is "which GROUP does
each document belong to, and which single copy survives".  That is
connected components over the pair graph, with the canonical id = the
minimum doc id in each component.

Scale design: iterative min-label propagation — per round, every node
takes the min of its own label and its neighbors' labels; shuffles are
keyed by node id and cost O(E) per round; rounds needed = component
diameter, and near-dup components are small and dense (mirror sets of
the same document), so convergence is fast.  The loop stops at an
observed fixpoint, giving the exact components — the same fixpoint a
SQL recursive CTE reaches, which is what makes this oracle-checkable.
(At extreme diameters the large-star/small-star variant halves round
counts; for dedup graphs plain propagation is the right tool.)
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

_log = logging.getLogger(__name__)

MAX_CC_ITERS = 25  # >= diameter of any sane near-dup component

# Below this many DIRECTED edges (the doubled frame — i.e. half this
# many input pairs) the graph fits comfortably on the driver and a
# python union-find beats N rounds of distributed joins by orders of
# magnitude in LATENCY (each propagation round costs scheduling +
# shuffle setup regardless of data size).  200k directed edges collect
# as ~200k Row objects — tens of MB of Python heap, a deliberate
# conservative bound; the distributed path takes over beyond.
SMALL_GRAPH_EDGES = 200_000


def _driver_union_find(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Exact min-id components on the driver; same fixpoint the
    distributed propagation reaches."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [(x, find(x)) for x in parent]


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = MAX_CC_ITERS,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """(id, component_id) for every id appearing in ``pairs``;
    component_id = min id in the component.  Raises if the graph has
    not converged within ``max_iters`` rounds (diameter larger than any
    plausible dup cluster — a sign the input is not a dup graph).

    Scale-adaptive: dup-pair graphs are usually SMALL relative to the
    corpus (pairs are already the LSH-filtered residue), so when the
    edge count is under ``small_graph_edges`` the exact components are
    computed by a driver-side union-find (bounded collect, identical
    min-id result) instead of paying per-round scheduling latency for
    a graph that fits in one task; the distributed propagation is the
    path for genuinely large pair sets."""
    spark = pairs.sparkSession
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    n_edges = edges.count()  # doubles as the cache-warming action
    if n_edges <= small_graph_edges:
        comp = _driver_union_find(
            [(r["src"], r["dst"]) for r in edges.collect()]
        )
        edges.unpersist()
        _log.info(
            "connected_components: small-graph path (%d directed edges) "
            "— driver union-find", n_edges,
        )
        # schema mirrors the input id type exactly (string/int/long ids
        # all valid), matching the distributed path's output
        from pyspark.sql.types import StructField, StructType

        id_type = edges.schema["src"].dataType
        schema = StructType(
            [
                StructField("id", id_type),
                StructField("component_id", id_type),
            ]
        )
        return spark.createDataFrame(comp, schema)
    # localCheckpoint per round: iterative self-joins otherwise grow the
    # logical plan linearly in rounds (each round's frame embeds the
    # whole history), which OOMs the DRIVER on plan analysis long before
    # data size matters.  Checkpointing truncates lineage to the
    # materialized data.  (On a fault-tolerant production run, set a
    # checkpoint dir and use .checkpoint() — same shape.)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nbr = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("comp").alias("dst_comp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_comp").alias("nbr_comp"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.select("id", F.col("comp").alias("old_comp")), "id"
            )
            .where(F.col("comp") != F.col("old_comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.select(
                F.col("id"), F.col("comp").alias("component_id")
            )
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "component diameter exceeds any plausible dup cluster"
    )


def canonical_docs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """The dedup keep-list: every doc not in any pair, plus the minimum
    id of each near-dup component.  One broadcast-size join against the
    (small) component table."""
    comps = connected_components(pairs, a_col, b_col)
    drop = comps.where(F.col("id") != F.col("component_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
