"""Model audits: overlap (J14) + structural integrity checks."""

import numpy as np

from ferrobus_spark.model.audit import audit_model, convex_hull, graph_transit_overlap


def test_convex_hull_square():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 1.5]])
    hull = convex_hull(pts)
    assert sorted(map(tuple, hull)) == [(0, 0), (0, 2), (2, 0), (2, 2)]


def test_overlap_audit_flags_far_stop(spark, spark_model):
    res = graph_transit_overlap(
        spark, spark_model["street_nodes"], spark_model["stops_dim"]
    )
    # exactly the FAR_AWAY stop lies outside the street hull
    stops = spark_model["stops_dim"].toPandas().set_index("stop_id")
    far_idx = int(stops.loc["FAR_AWAY", "stop_idx"])
    assert res["stops_outside_hull"] == 1
    assert res["outside_stop_idx"] == [far_idx]
    assert 0 < res["pct_outside"] < 5


def test_model_integrity_all_zero(spark_model):
    checks = audit_model(spark_model.tables)
    assert all(v == 0 for v in checks.values()), checks
