"""Exact 1-NN point→street-node snapping (reference J1).

Distributed analogue of the reference's R-tree nearest-node lookup
(streets/network.rs:31-37): hex-cell candidate join with a proven
guarantee radius, plus a brute-force fallback for the (rare) points
whose nearest node lies beyond the candidate ring — so the result is
EXACT 1-NN by Haversine metres, at any scale.

Guarantee: for cells of circumradius ``s`` (pointy-top, neighbor
centers sqrt(3)*s apart), any node outside the k-ring of a point's cell
is at least ``s*(sqrt(3)*(k+1) - 2)`` degrees away. Candidates closer
than that (converted conservatively to metres) are provably the true
nearest.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ferrobus_spark import hexgrid
from ferrobus_spark.functions.geo import haversine_col, snap_cost_col
from ferrobus_spark.functions.hex_udfs import cell_expr_col, grid_disk_col

M_PER_DEG = 111194.9  # EARTH_RADIUS_M * pi / 180


def nearest_node_join(
    points: DataFrame,
    nodes: DataFrame,
    point_key: str,
    res: int = 8,
    ring: int = 2,
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """Exact nearest node per point → (point_key, node_id, dist_m, snap_secs).

    ``points``: (point_key, lon, lat); ``nodes``: (node_id, lon, lat).
    Snap cost is ``ceil(dist/1.4)`` (streets/network.rs:34-35).
    """
    s = hexgrid.cell_size(res)
    guarantee_deg = s * (hexgrid.SQRT3 * (ring + 1) - 2.0)
    guarantee_m = guarantee_deg * M_PER_DEG * math.cos(math.radians(max_abs_lat))

    p = points.select(
        point_key,
        F.col("lon").alias("__plon"),
        F.col("lat").alias("__plat"),
        cell_expr_col("lon", "lat", res).alias("__pc"),
    )
    n = nodes.select(
        "node_id",
        F.col("lon").alias("__nlon"),
        F.col("lat").alias("__nlat"),
        cell_expr_col("lon", "lat", res).alias("__cell"),
    )
    cand = (
        p.withColumn("__cell", F.explode(grid_disk_col("__pc", ring)))
        .join(n, "__cell")
        .withColumn("dist_m", haversine_col("__plon", "__plat", "__nlon", "__nlat"))
    )
    w = Window.partitionBy(point_key).orderBy("dist_m", "node_id")
    best = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(point_key, "node_id", "dist_m")
    )
    proven = best.filter(F.col("dist_m") <= guarantee_m)

    # fallback: points with no candidate or an unproven best → brute force
    unresolved = points.join(proven.select(point_key), point_key, "left_anti")
    if unresolved.limit(1).count() > 0:
        bf = (
            unresolved.select(
                point_key,
                F.col("lon").alias("__plon"),
                F.col("lat").alias("__plat"),
            )
            .crossJoin(
                nodes.select(
                    "node_id",
                    F.col("lon").alias("__nlon"),
                    F.col("lat").alias("__nlat"),
                )
            )
            .withColumn("dist_m", haversine_col("__plon", "__plat", "__nlon", "__nlat"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(point_key, "node_id", "dist_m")
        )
        proven = proven.unionByName(bf)

    return proven.withColumn("snap_secs", snap_cost_col(F.col("dist_m")))
