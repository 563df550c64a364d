"""Product-scale bench for the traced family (round-7 verdict item 3):
detailed_journeys + legs_to_geojson_model over ≥100k OD pairs on the
real-city zhelez model — the one routing product without a BENCH entry
(matrix/one-to-many were benched in round 5, isochrones in round 6).

What it proves at scale:
* the `mapInPandas` backtrack kernel (routing/traced.py:305) fans out
  one bounded-Dijkstra + one traced RAPTOR per pair with NO driver-side
  growth — the OD set is a distributed crossJoin of point ids, never a
  driver list;
* the geometry stage's only collects are model-dimension (patterns,
  stops, snap nodes — constant in pair count), then one broadcast.

Usage: python scripts/traced_bench.py [n_origins] [n_dests]
Prints one JSON line with per-stage wall + pairs/s and rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

GTFS = "/root/reference/tests/test-data/zhelez"
PBF = "/root/reference/tests/test-data/roads_zhelez.pbf"


def main() -> None:
    n_origins = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_dests = int(sys.argv[2]) if len(sys.argv) > 2 else 220

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ferrobus_spark.model.build import build_model
    from ferrobus_spark.routing.points import build_point_tables
    from ferrobus_spark.routing.timetable import build_timetable_csr
    from ferrobus_spark.routing.traced import detailed_journeys, legs_to_geojson_model
    from ferrobus_spark.sources.gtfs_csv import load_gtfs_dirs
    from ferrobus_spark.sources.osm_pbf import street_tables_from_pbf

    t0 = time.time()
    tabs = load_gtfs_dirs(spark, GTFS)
    streets = street_tables_from_pbf(spark, PBF)
    tabs.update({k: v.localCheckpoint() for k, v in streets.items()})
    model = build_model(spark, tabs, "2024-01-11", max_transfer_time=600)
    tt = build_timetable_csr(model.tables)
    build_sec = round(time.time() - t0, 2)

    n_points = max(n_origins, n_dests)
    rng = np.random.default_rng(20240111)
    lon = rng.uniform(93.40, 93.57, n_points)
    lat = rng.uniform(56.19, 56.30, n_points)
    pts = spark.createDataFrame(
        [(int(i), float(lon[i]), float(lat[i])) for i in range(n_points)],
        "point_id long, lon double, lat double",
    )

    t0 = time.time()
    pt = build_point_tables(
        spark, pts, model["street_nodes"], model["node_to_stop"], model.csr,
        max_walking_time=1200, max_stops=10,
    )
    pt = {k: v.localCheckpoint() for k, v in pt.items()}
    snap_sec = round(time.time() - t0, 2)

    # distributed OD cross product of point ids — no driver-side list
    oid = pt["point_nodes"].select(F.col("point_id").alias("origin_id")).filter(
        F.col("origin_id") < n_origins
    )
    did = pt["point_nodes"].select(F.col("point_id").alias("dest_id")).filter(
        F.col("dest_id") < n_dests
    )
    od = oid.crossJoin(did).withColumn(
        "pair_id", F.col("origin_id") * n_points + F.col("dest_id")
    )
    n_pairs = od.count()

    out = {
        "n_origins": n_origins, "n_dests": n_dests, "n_pairs": n_pairs,
        "model_build_sec": build_sec, "point_tables_sec": snap_sec,
    }

    t0 = time.time()
    legs = detailed_journeys(spark, tt, model.csr, od, pt, pt, 8 * 3600, 2)
    legs = legs.localCheckpoint()  # materialize once; geojson stage reuses
    n_legs = legs.count()
    dt = time.time() - t0
    out["legs_rows"] = n_legs
    out["detailed_journeys_sec"] = round(dt, 2)
    out["detailed_journeys_pairs_per_sec"] = round(n_pairs / dt)

    t0 = time.time()
    gj = legs_to_geojson_model(legs, model)
    n_gj = gj.count()
    dt = time.time() - t0
    out["geojson_rows"] = n_gj
    out["geojson_sec"] = round(dt, 2)
    out["geojson_pairs_per_sec"] = round(n_pairs / dt)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
