"""Model integrity audits (reference builder.rs:106-130 + transit_model.rs:36-145).

* :func:`graph_transit_overlap` — % of stops outside the street
  network's convex hull (J14; warn-level signal in the reference).
  Hull is computed on the driver from the (sampled) node set via
  Andrew's monotone chain — no geometry library needed — and applied
  as a broadcast half-plane... no: as an exact PIP column filter.
* :func:`audit_model` — structural assertion queries over the model
  tables: dense ids in range, pattern/stop_times shape consistency,
  transfer endpoints valid — the dataflow analogue of
  audit_transit_model's index checks.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferrobus_spark import hexgrid


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns CCW hull vertices (n, 2)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def build(seq):
        out: list[np.ndarray] = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = build(pts)
    upper = build(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def graph_transit_overlap(
    spark: SparkSession,
    street_nodes: DataFrame,
    stops_dim: DataFrame,
    max_hull_sample: int = 200_000,
) -> dict:
    """% of stops outside the street hull (reference warns when > 0)."""
    n_nodes = street_nodes.count()
    frac = min(1.0, max_hull_sample / max(n_nodes, 1))
    sample = (
        street_nodes.sample(fraction=frac, seed=42) if frac < 1.0 else street_nodes
    )
    pts = np.array(sample.select("lon", "lat").collect(), np.float64)
    hull = convex_hull(pts)

    pdf = stops_dim.select("stop_idx", "lon", "lat").toPandas()
    inside = hexgrid.point_in_polygon(
        pdf["lon"].to_numpy(np.float64), pdf["lat"].to_numpy(np.float64), hull
    )
    outside = int((~inside).sum())
    total = len(pdf)
    return {
        "stops_outside_hull": outside,
        "total_stops": total,
        "pct_outside": 100.0 * outside / total if total else 0.0,
        "outside_stop_idx": pdf.loc[~inside, "stop_idx"].astype(int).tolist(),
    }


def audit_model(model_tables: dict[str, DataFrame]) -> dict[str, int]:
    """Structural integrity checks; every count must be zero."""
    stops = model_tables["stops_dim"]
    routes = model_tables["routes"]
    route_stops = model_tables["route_stops"]
    stop_times = model_tables["stop_times"]
    transfers = model_tables["transfers"]

    n_stops = stops.count()
    checks = {}

    checks["route_stops_bad_stop"] = (
        route_stops.join(stops.select("stop_idx"), "stop_idx", "left_anti").count()
    )
    # each route's route_stops row count == num_stops
    rs_counts = route_stops.groupBy("route_idx").count()
    checks["route_stops_shape"] = (
        routes.join(rs_counts, "route_idx")
        .filter(F.col("count") != F.col("num_stops"))
        .count()
    )
    # stop_times rows per route == num_trips * num_stops
    st_counts = stop_times.groupBy("route_idx").count()
    checks["stop_times_shape"] = (
        routes.join(st_counts, "route_idx")
        .filter(F.col("count") != F.col("num_trips") * F.col("num_stops"))
        .count()
    )
    # arrivals ≤ departures at every stop event
    checks["arrival_after_departure"] = stop_times.filter(
        F.col("arrival") > F.col("departure")
    ).count()
    # transfers reference known stops, no self-loops, non-negative durations
    checks["transfer_bad_endpoint"] = (
        transfers.join(
            stops.select(F.col("stop_idx").alias("from_stop")), "from_stop", "left_anti"
        ).count()
        + transfers.join(
            stops.select(F.col("stop_idx").alias("to_stop")), "to_stop", "left_anti"
        ).count()
    )
    checks["transfer_self_loop"] = transfers.filter(
        F.col("from_stop") == F.col("to_stop")
    ).count()
    checks["transfer_negative"] = transfers.filter(F.col("duration") < 0).count()
    return checks
