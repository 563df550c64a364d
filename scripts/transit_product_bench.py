"""Product-scale transit bench (round-5 ask): travel_time_matrix /
one_to_many over thousands of points on the real-city zhelez model.

The fixture-based correctness tests exercise 13-62-row products; this
measures the actual fan-out path — one all-targets RAPTOR per origin in
the origin-partitioned broadcast-CSR kernel (routing/products.py:82-133,
the rayon-loop analogue), everything downstream DataFrame algebra. No
driver loop: the only collects are dimension-scale (_collect_dests).

Usage: python scripts/transit_product_bench.py [n_points]
Prints one JSON line with build/product wall times and pairs/s.
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
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ferrobus_spark.model.build import build_model
    from ferrobus_spark.routing import products
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

    # deterministic points across the serviced bbox (same seed every run)
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

    out = {"n_points": n_points, "model_build_sec": build_sec,
           "point_tables_sec": snap_sec}

    t0 = time.time()
    matrix = products.travel_time_matrix(spark, tt, model.csr, pt, 8 * 3600, 2)
    n_rows = matrix.count()
    dt = time.time() - t0
    out["matrix_rows"] = n_rows
    out["matrix_pairs"] = n_points * n_points
    out["matrix_sec"] = round(dt, 2)
    out["matrix_pairs_per_sec"] = round(n_points * n_points / dt)

    t0 = time.time()
    otm = products.one_to_many(spark, tt, model.csr, pt, pt, 43200, 2)
    n_rows2 = otm.count()
    dt2 = time.time() - t0
    out["one_to_many_rows"] = n_rows2
    out["one_to_many_sec"] = round(dt2, 2)
    out["one_to_many_pairs_per_sec"] = round(n_points * n_points / dt2)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
