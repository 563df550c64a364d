"""Stop snapping + footpath transfer computation + precedence merge.

Spark re-expression of loading/transfers.rs:
* snap stops to street nodes, gate ≤ max_transfer_time (J1, :151-175);
* per-stop bounded Dijkstra over a broadcast CSR graph, partitioned by
  source node — the distributed analogue of the rayon par_iter
  (J7/J8, :178-204);
* synthetic zero-cost co-located links (J6, :222-248);
* GTFS transfers.txt conversion — drop type 3 / null / over-max /
  unknown stops / self-loops (F5, :62-115);
* precedence merge computed < co-located < GTFS (J5, :51-57, 117-147);
* node_to_stop: LAST stop index per node wins (:311-316) → max().
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ferrobus_spark.model.snap import nearest_node_join
from ferrobus_spark.routing.csr import CSRGraph, bounded_dijkstra


def snap_stops(
    spark: SparkSession,
    stops_dim: DataFrame,
    street_nodes: DataFrame,
    max_transfer_time: int,
) -> DataFrame:
    """(stop_idx, node_id, snap_secs) for stops within the snap gate."""
    snapped = nearest_node_join(
        stops_dim.select("stop_idx", "lon", "lat"), street_nodes, "stop_idx"
    )
    return snapped.filter(F.col("snap_secs") <= max_transfer_time).select(
        "stop_idx", "node_id", "snap_secs"
    )


def node_sssp(
    spark: SparkSession,
    source_nodes: DataFrame,
    csr: CSRGraph,
    max_cost: int,
    target_nodes: list[int] | None = None,
) -> DataFrame:
    """Bounded SSSP from every source node → (src_node, dst_node, secs).

    Broadcast-CSR kernel over ``mapInPandas`` partitioned by source —
    embarrassingly parallel like the reference's rayon loop. If
    ``target_nodes`` is given, only those destinations are emitted
    (keeps the shuffle small at scale). Reached set uses the
    reference's one-edge-overhang Dijkstra but filters secs ≤ max_cost
    like find_transfers_from_stop (transfers.rs:251-288).
    """
    bc = spark.sparkContext.broadcast(
        (csr, sorted(set(target_nodes)) if target_nodes is not None else None)
    )
    schema = T.StructType([
        T.StructField("src_node", T.LongType()),
        T.StructField("dst_node", T.LongType()),
        T.StructField("secs", T.LongType()),
    ])

    def run(batches):
        g, targets = bc.value
        tset = None if targets is None else set(g.dense_of(targets).tolist())
        for pdf in batches:
            out_src, out_dst, out_secs = [], [], []
            for ext in pdf["node_id"].tolist():
                dense = int(g.dense_of([ext])[0])
                dist = bounded_dijkstra(g, dense, max_cost=max_cost)
                for nd, secs in dist.items():
                    if secs <= max_cost and (tset is None or nd in tset):
                        out_src.append(ext)
                        out_dst.append(int(g.node_ids[nd]))
                        out_secs.append(secs)
            yield pd.DataFrame({"src_node": out_src, "dst_node": out_dst, "secs": out_secs})

    n_src = source_nodes.count()
    parts = max(1, min(n_src, spark.sparkContext.defaultParallelism * 2))
    return source_nodes.select("node_id").distinct().repartition(parts).mapInPandas(
        run, schema=schema
    )


def build_transfers(
    spark: SparkSession,
    stops_dim: DataFrame,
    stop_nodes: DataFrame,
    csr: CSRGraph,
    gtfs_transfers: DataFrame,
    max_transfer_time: int,
) -> dict[str, DataFrame]:
    """→ {transfers(from_stop, to_stop, duration), node_to_stop}."""
    # computed: SSSP between distinct snapped nodes, fanned back to stops
    walk = node_sssp(
        spark,
        stop_nodes.select("node_id"),
        csr,
        max_transfer_time,
        target_nodes=[r.node_id for r in stop_nodes.select("node_id").distinct().collect()],
    )
    src_stops = stop_nodes.select(
        F.col("stop_idx").alias("from_stop"), F.col("node_id").alias("src_node")
    )
    dst_stops = stop_nodes.select(
        F.col("stop_idx").alias("to_stop"), F.col("node_id").alias("dst_node")
    )
    computed = (
        walk.join(src_stops, "src_node")
        .join(dst_stops, "dst_node")
        .filter(F.col("from_stop") != F.col("to_stop"))
        .select("from_stop", "to_stop", F.col("secs").alias("duration"))
        .withColumn("priority", F.lit(1))
    )

    # co-located zero links
    a = stop_nodes.select(F.col("stop_idx").alias("from_stop"), "node_id")
    b = stop_nodes.select(F.col("stop_idx").alias("to_stop"), "node_id")
    colocated = (
        a.join(b, "node_id")
        .filter(F.col("from_stop") != F.col("to_stop"))
        .select("from_stop", "to_stop", F.lit(0).cast("long").alias("duration"))
        .withColumn("priority", F.lit(2))
    )

    # GTFS transfers (F5 validity chain)
    sid = stops_dim.select("stop_id", "stop_idx")
    gt = (
        gtfs_transfers.filter(F.col("transfer_type") != 3)
        .filter(F.col("min_transfer_time").isNotNull())
        .filter(F.col("min_transfer_time") <= max_transfer_time)
        .join(
            F.broadcast(sid.withColumnRenamed("stop_id", "from_stop_id")
                        .withColumnRenamed("stop_idx", "from_stop")),
            "from_stop_id",
        )
        .join(
            F.broadcast(sid.withColumnRenamed("stop_id", "to_stop_id")
                        .withColumnRenamed("stop_idx", "to_stop")),
            "to_stop_id",
        )
        .filter(F.col("from_stop") != F.col("to_stop"))
        .select(
            "from_stop", "to_stop",
            F.col("min_transfer_time").cast("long").alias("duration"),
        )
        .withColumn("priority", F.lit(3))
    )

    merged = computed.unionByName(colocated).unionByName(gt)
    w = Window.partitionBy("from_stop", "to_stop").orderBy(F.desc("priority"))
    transfers = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("from_stop", "to_stop", "duration")
    )

    node_to_stop = stop_nodes.groupBy("node_id").agg(
        F.max("stop_idx").alias("stop_idx")
    )
    return {"transfers": transfers, "node_to_stop": node_to_stop}
