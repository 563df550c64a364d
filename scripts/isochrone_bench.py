"""Product-scale isochrone bench (round-6 ask): bulk isochrone tiling +
percent-access over thousands of origins on the real-city zhelez model.

The driver-gated queries prove the tiling products correct at 1-origin
scale; this measures the fan-out path the operators were shaped for —
departures/origins as ROWS through one one-to-many job
(operators/isochrone.py), tile dissolve as an Arrow-batched pandas UDF,
percent-access as a single groupBy over the (origin x departure-sample)
row axis. No driver loop anywhere.

Usage: python scripts/isochrone_bench.py [n_origins] [res]
Prints one JSON line with per-product wall times and rows/s rates.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession

GTFS = "/root/reference/tests/test-data/zhelez"
PBF = "/root/reference/tests/test-data/roads_zhelez.pbf"


def main() -> None:
    n_origins = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ferrobus_spark.model.build import build_model
    from ferrobus_spark.operators import isochrone as iso
    from ferrobus_spark.routing.points import build_point_tables
    from ferrobus_spark.routing.timetable import build_timetable_csr
    from ferrobus_spark.sources.gtfs_csv import load_gtfs_dirs
    from ferrobus_spark.sources.osm_pbf import street_tables_from_pbf

    t0 = time.time()
    tabs = load_gtfs_dirs(spark, GTFS)
    streets = street_tables_from_pbf(spark, PBF)
    tabs.update({k: v.localCheckpoint() for k, v in streets.items()})
    model = build_model(spark, tabs, "2024-01-11", max_transfer_time=600)
    tt = build_timetable_csr(model.tables)
    build_sec = round(time.time() - t0, 2)

    # the serviced bbox as the grid area; res 7 ~ a few hundred cells,
    # res 8 ~ thousands — the grid is the DESTINATION axis of the product
    area = np.array([
        [93.40, 56.19], [93.57, 56.19], [93.57, 56.30], [93.40, 56.30],
        [93.40, 56.19],
    ])
    t0 = time.time()
    grid = iso.build_iso_grid(spark, model, area, res=res)
    grid = {k: v.localCheckpoint() for k, v in grid.items()}
    n_cells = grid["point_nodes"].select("point_id").distinct().count()
    grid_sec = round(time.time() - t0, 2)

    rng = np.random.default_rng(20240111)
    lon = rng.uniform(93.40, 93.57, n_origins)
    lat = rng.uniform(56.19, 56.30, n_origins)
    pts = spark.createDataFrame(
        [(int(i), float(lon[i]), float(lat[i])) for i in range(n_origins)],
        "point_id long, lon double, lat double",
    )
    t0 = time.time()
    origins = build_point_tables(
        spark, pts, model["street_nodes"], model["node_to_stop"], model.csr,
        max_walking_time=1200, max_stops=10,
    )
    origins = {k: v.localCheckpoint() for k, v in origins.items()}
    snap_sec = round(time.time() - t0, 2)

    out = {"n_origins": n_origins, "grid_res": res, "grid_cells": n_cells,
           "model_build_sec": build_sec, "grid_sec": grid_sec,
           "point_tables_sec": snap_sec}

    # 1) bulk isochrone tile assignment: every origin, one departure
    t0 = time.time()
    cells = iso.isochrone_cells(
        spark, tt, model, origins, grid, 8 * 3600, 2, 1800
    ).localCheckpoint()
    n_rows = cells.count()
    dt = time.time() - t0
    out["iso_cells_rows"] = n_rows
    out["iso_cells_sec"] = round(dt, 2)
    out["iso_cells_origin_pairs_per_sec"] = round(n_origins * n_cells / dt)

    # 2) WKT dissolve over every origin's cell set (pandas-UDF path)
    t0 = time.time()
    n_wkt = iso.isochrone_wkt(cells).count()
    dt = time.time() - t0
    out["iso_wkt_rows"] = n_wkt
    out["iso_wkt_sec"] = round(dt, 2)
    out["iso_wkt_origins_per_sec"] = round(n_wkt / dt) if dt > 0 else None

    # 3) percent-access heat map: 13 departure samples x origins in ONE job
    t0 = time.time()
    pa_rows = iso.percent_access_cells(
        spark, tt, model, origins, grid,
        (8 * 3600, 9 * 3600), 300, 2, 1800,
    ).count()
    dt = time.time() - t0
    n_samples = len(range(8 * 3600, 9 * 3600 + 1, 300))
    out["percent_access_rows"] = pa_rows
    out["percent_access_samples"] = n_samples
    out["percent_access_sec"] = round(dt, 2)
    out["percent_access_origin_departures_per_sec"] = round(
        n_origins * n_samples / dt
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
