"""OSM PBF reader unit tests: wire decode, foot rules, way splitting."""

import os

import pytest
from pyspark.sql import functions as F

from ferrobus_spark.sources import osm_pbf as O

PBF = "/root/reference/tests/test-data/roads_zhelez.pbf"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PBF), reason="zhelez PBF not present"
)


def test_blob_index_shape():
    idx = O.blob_index(PBF)
    assert idx[0][0] == "OSMHeader"
    assert all(t == "OSMData" for t, _, _ in idx[1:])
    # payload ranges must tile the file without overlap
    end = 0
    for _t, off, size in idx:
        assert off >= end
        end = off + size
    assert end == os.path.getsize(PBF)


def test_decode_counts_and_coords():
    nodes = ways = 0
    lon_lo = lat_lo = 1e9
    lon_hi = lat_hi = -1e9
    for t, off, size in O.blob_index(PBF):
        if t != "OSMData":
            continue
        n, w = O._decode_block(O._blob_payload(PBF, off, size))
        nodes += len(n)
        ways += len(w)
        if len(n):
            lon_lo = min(lon_lo, n["lon"].min()); lon_hi = max(lon_hi, n["lon"].max())
            lat_lo = min(lat_lo, n["lat"].min()); lat_hi = max(lat_hi, n["lat"].max())
    assert nodes == 15720  # full node count incl. non-routable ways' nodes
    assert ways >= 3934    # routable subset is 3,934
    # Zheleznogorsk bounding box (the fixture city)
    assert 93.0 < lon_lo and lon_hi < 94.0
    assert 56.0 < lat_lo and lat_hi < 56.5


def test_foot_access_rules():
    fa = O.foot_access
    assert fa({"highway": "footway"}) == "allowed"
    assert fa({"highway": "residential"}) == "unknown"
    assert fa({"highway": "motorway"}) == "forbidden"
    assert fa({"highway": "cycleway"}) == "forbidden"
    assert fa({"highway": "cycleway", "foot": "yes"}) == "allowed"
    assert fa({"highway": "residential", "foot": "no"}) == "forbidden"
    assert fa({"highway": "trunk_link"}) == "forbidden"
    assert fa({}) == "unknown"


def test_vertex_rule_and_lengths(spark):
    """Way splitting: endpoints always vertices; shared node splits both
    ways; interior-only nodes are geometry; lengths sum the polyline."""
    st = O.street_tables_from_pbf(spark, PBF)
    edges = st["street_edges"]
    nodes = st["street_nodes"]
    n_nodes = nodes.count()
    assert n_nodes == 7151
    assert edges.count() == 10112  # post parallel-collapse
    # every edge endpoint is a vertex
    ends = (
        edges.select(F.col("src").alias("node_id"))
        .union(edges.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    assert ends.join(nodes, "node_id", "left_anti").count() == 0
    # no degenerate edges
    assert edges.filter("length_m <= 0 AND src <> dst").count() == 0
    # parallel collapse left at most one edge per unordered pair
    dup = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0
