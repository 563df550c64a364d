"""Street-network build: foot filter → symmetrize → largest component.

Spark re-expression of the reference's OSM processing
(osm/processor.rs:52-135): pedestrian-way filter (F1), undirected
graph, largest-connected-component selection (A5) via iterative
min-label propagation, edge walk cost floor(length/1.4)
(processor.rs:93-94 — truncates, unlike the snap cost which ceils).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferrobus_spark.functions.geo import edge_cost_col
from ferrobus_spark.plans.iterative import largest_component


def build_street_graph(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
) -> dict[str, DataFrame]:
    """→ {street_nodes(node_id, lon, lat), street_edges(src, dst, weight)}.

    ``street_edges`` is symmetric (both directions), restricted to the
    largest connected component of foot-passable ways.
    """
    ok = edges.filter(F.col("foot").isin("allowed", "unknown"))
    sym = ok.select("src", "dst", "length_m").union(
        ok.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "length_m")
    )
    keep = largest_component(sym).withColumnRenamed("node", "node_id")
    nodes_cc = nodes.join(keep, "node_id", "semi").select("node_id", "lon", "lat")
    edges_cc = (
        sym.join(keep.withColumnRenamed("node_id", "src"), "src", "semi")
        .join(keep.withColumnRenamed("node_id", "dst"), "dst", "semi")
        .withColumn("weight", edge_cost_col(F.col("length_m")))
        .select("src", "dst", "weight")
    )
    return {"street_nodes": nodes_cc, "street_edges": edges_cc}
