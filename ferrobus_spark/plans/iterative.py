"""Driver-side iterative DataFrame loops (fixpoint algorithms).

Spark has no native iteration; these helpers run driver loops with
per-round ``localCheckpoint()`` to truncate lineage (SURVEY.md §4 —
the only "custom" execution machinery the engine needs; no Catalyst
rules). Used for connected components (reference osm/processor.rs:101-114)
and the iterative-join RAPTOR/Bellman-Ford variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """Min-label propagation to fixpoint → (node, component) DataFrame.

    ``edges`` must be symmetric (both directions present). Isolated
    nodes absent from ``edges`` won't appear — union them separately.
    Scale note: label propagation is O(diameter) shuffles; for a street
    grid that's large, but each round is a single hash join on (node),
    AQE-coalesced, and lineage is truncated per round.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint()
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    for _ in range(max_iter):
        # 1) neighbor-min: candidate = min over neighbors' labels
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(nbr_min, labels.node == nbr_min.a, "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
        )
        # 2) pointer doubling: comp := comp[comp] — labels are node ids, so
        # chase one hop through the label table (O(log diameter) rounds
        # instead of O(diameter) pure propagation)
        ptr = stepped.select(
            F.col("node").alias("pnode"), F.col("component").alias("pcomp")
        )
        jumped = (
            stepped.join(ptr, stepped.component == ptr.pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("pcomp", F.col("component"))
                ).alias("component"),
            )
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = jumped.localCheckpoint()
        if changed == 0:
            break
    return labels


def largest_component(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Nodes of the largest connected component (ties → smallest label)."""
    cc = connected_components(edges, src, dst)
    top = (
        cc.groupBy("component")
        .count()
        .orderBy(F.desc("count"), "component")
        .limit(1)
    )
    return cc.join(F.broadcast(top.select("component")), "component").select("node")
