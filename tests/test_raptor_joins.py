"""Iterative DataFrame-join RAPTOR ≡ broadcast kernel, label for label."""

import pytest

from ferrobus_spark.plans.raptor_joins import raptor_all_targets_joins
from ferrobus_spark.routing.raptor import raptor as kernel_raptor
from ferrobus_spark.routing.timetable import INF

MAX_TRANSFERS = 3
CASES = [(0, 0, 7 * 3600), (1, 5, 8 * 3600), (2, 33, 8 * 3600 + 300)]


def test_joins_variant_matches_kernel(spark, spark_model, timetable):
    sources = spark.createDataFrame(
        CASES, "origin_id LONG, stop_idx LONG, departure LONG"
    )
    got = raptor_all_targets_joins(
        spark, spark_model.tables, sources, MAX_TRANSFERS
    ).toPandas()
    by_origin = {
        oid: dict(zip(sub["stop_idx"], zip(sub["best_arrival"], sub["transfers"])))
        for oid, sub in got.groupby("origin_id")
    }
    for oid, stop, dep in CASES:
        best, best_k = kernel_raptor(timetable, stop, dep, MAX_TRANSFERS, target=None)
        exp = {
            s: (int(b), int(k))
            for s, (b, k) in enumerate(zip(best, best_k))
            if b != INF
        }
        g = {int(s): (int(a), int(t)) for s, (a, t) in by_origin.get(oid, {}).items()}
        assert g == exp, f"origin {oid}"
        assert len(exp) > 10  # routing actually reaches a nontrivial stop set
