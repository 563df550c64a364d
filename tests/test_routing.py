"""Routing kernels vs the pure-Python oracle — exact integer parity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ferrobus_spark.model.build import build_model
from ferrobus_spark.routing import products
from ferrobus_spark.routing.points import build_point_tables
from ferrobus_spark.routing.raptor import raptor as spark_raptor
from ferrobus_spark.routing.timetable import INF as TT_INF
from ferrobus_spark.routing.timetable import build_timetable_csr
from ferrobus_spark.sources.transit import (
    MAX_TRANSFER_TIME,
    QUERY_DATE,
    query_points,
    to_spark,
    transit_fixture,
)
from tests.oracle import transit_oracle as O

DEPARTURE = 8 * 3600
MAX_TRANSFERS = 3


@pytest.fixture(scope="module")
def oracle_points(oracle_model):
    pts = {}
    for row in query_points().itertuples(index=False):
        tp = O.make_transit_point(
            oracle_model, row.lon, row.lat, row.max_walking_time, row.max_nearest_stops
        )
        if tp is not None:
            pts[int(row.point_id)] = tp
    return pts


@pytest.fixture(scope="module")
def spark_points(spark, spark_model):
    pts = spark.createDataFrame(query_points())
    return build_point_tables(
        spark,
        pts,
        spark_model["street_nodes"],
        spark_model["node_to_stop"],
        spark_model.csr,
    )


def test_raptor_kernel_all_stops(timetable, oracle_model):
    """All-targets RAPTOR from several sources at several departures."""
    n = len(oracle_model.stops)
    for source in [0, 5, 17, 33, 50]:
        for dep in [7 * 3600, 8 * 3600 + 120]:
            o_best, o_k = O.raptor(oracle_model, source, None, dep, MAX_TRANSFERS)
            s_best, s_k = spark_raptor(timetable, source, dep, MAX_TRANSFERS, target=None)
            got = [None if b == TT_INF else (int(b), int(k)) for b, k in zip(s_best, s_k)]
            exp = [None if b == O.INF else (b, k) for b, k in zip(o_best, o_k)]
            assert got == exp, f"source={source} dep={dep}"


def test_raptor_single_target_mode(timetable, oracle_model):
    for source, target in [(0, 40), (5, 12), (20, 3)]:
        o_best, o_k = O.raptor(oracle_model, source, target, DEPARTURE, MAX_TRANSFERS)
        s_best, s_k = spark_raptor(timetable, source, DEPARTURE, MAX_TRANSFERS, target=target)
        o = None if o_best[target] == O.INF else (o_best[target], o_k[target])
        s = None if s_best[target] == TT_INF else (int(s_best[target]), int(s_k[target]))
        assert s == o, f"{source}->{target}"


def test_transit_points_match(spark_points, oracle_points):
    got_nodes = {
        int(r.point_id): (int(r.node_id), int(r.snap_secs))
        for r in spark_points["point_nodes"].collect()
    }
    assert set(got_nodes) == set(oracle_points)  # same snappable set
    stops_pdf = spark_points["point_stops"].toPandas()
    for pid, tp in oracle_points.items():
        exp_sorted = sorted((t, s) for s, t in tp.nearest_stops)
        sub = stops_pdf[stops_pdf["point_id"] == pid].sort_values("rank")
        got = list(zip(sub["access_secs"], sub["stop_idx"]))
        assert got == exp_sorted, f"point {pid} nearest stops"

    walk_pdf = spark_points["point_walk"].toPandas()
    for pid, tp in oracle_points.items():
        sub = walk_pdf[walk_pdf["point_id"] == pid]
        got = dict(zip(sub["node_id"], sub["walk_secs"]))
        assert got == tp.walking_paths, f"point {pid} walking paths"


def test_one_to_many_matches_oracle(
    spark, timetable, spark_model, spark_points, oracle_model, oracle_points
):
    got = products.one_to_many(
        spark, timetable, spark_model.csr, spark_points, spark_points,
        DEPARTURE, MAX_TRANSFERS,
    ).toPandas()
    got = got.set_index(["origin_id", "dest_id"]).sort_index()

    pids = sorted(oracle_points)
    pts = [oracle_points[p] for p in pids]
    for i, pid in enumerate(pids):
        exp = O.one_to_many(oracle_model, oracle_points[pid], pts, DEPARTURE, MAX_TRANSFERS)
        for j, dpid in enumerate(pids):
            e = exp[j]
            key = (pid, dpid)
            if e is None:
                assert key not in got.index, f"{key} should be unreachable"
                continue
            row = got.loc[key]
            assert int(row["travel_time"]) == e["travel_time"], key
            assert int(row["walking_time"]) == e["walking_time"], key
            assert int(row["transfers"]) == e["transfers"], key
            if e["transit_time"] is None:
                assert pd.isna(row["transit_time"]), key
            else:
                assert int(row["transit_time"]) == e["transit_time"], key


def test_matrix_diagonal_zero(spark, timetable, spark_model, spark_points):
    mat = products.travel_time_matrix(
        spark, timetable, spark_model.csr, spark_points, DEPARTURE, MAX_TRANSFERS
    ).toPandas()
    diag = mat[mat["origin_id"] == mat["dest_id"]]
    assert (diag["travel_time"] == 0).all()


def test_statistics_match_oracle(
    spark, timetable, spark_model, spark_points, oracle_model, oracle_points
):
    pids = sorted(oracle_points)
    pts = [oracle_points[p] for p in pids]
    for stat, cutoff in [("mean", None), ("median", None), ("mean", 3000)]:
        got = products.travel_time_statistics(
            spark, timetable, spark_model.csr, spark_points,
            DEPARTURE, MAX_TRANSFERS, threshold=0.5, stat=stat, filter_cutoff=cutoff,
        ).toPandas().set_index("origin_id")["stat_value"].to_dict()
        exp = O.travel_time_statistics(
            oracle_model, pts, DEPARTURE, MAX_TRANSFERS,
            threshold=0.5, stat=stat, filter_cutoff=cutoff,
        )
        for i, pid in enumerate(pids):
            g = got.get(pid)
            e = exp[i]
            if e is None:
                assert g is None or pd.isna(g), (stat, pid)
            else:
                assert g == pytest.approx(e, abs=1e-9), (stat, pid)
