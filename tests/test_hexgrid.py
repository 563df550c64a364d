"""Unit tests for the pure-NumPy hex grid (the H3 replacement)."""

import numpy as np
import pytest

from ferrobus_spark import hexgrid as hg


def test_roundtrip_pack_unpack():
    rng = np.random.default_rng(42)
    q = rng.integers(-100000, 100000, 1000)
    r = rng.integers(-100000, 100000, 1000)
    for res in (0, 5, 9, 15):
        cells = hg.qr_to_cell(q, r, res)
        q2, r2, res2 = hg.cell_to_qr(cells)
        assert (q2 == q).all() and (r2 == r).all() and (res2 == res).all()
        assert (cells > 0).all()


def test_centroid_maps_back_to_same_cell():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179, 179, 5000)
    lat = rng.uniform(-85, 85, 5000)
    for res in (3, 8, 12):
        cells = hg.latlng_to_cell(lon, lat, res)
        clon, clat = hg.cell_to_latlng(cells)
        again = hg.latlng_to_cell(clon, clat, res)
        assert (again == cells).all()


def test_centroid_is_nearest_cell():
    # every point is closer to its own cell centroid than to any ring-1 neighbor
    rng = np.random.default_rng(3)
    lon = rng.uniform(-1, 1, 500)
    lat = rng.uniform(-1, 1, 500)
    res = 6
    cells = hg.latlng_to_cell(lon, lat, res)
    clon, clat = hg.cell_to_latlng(cells)
    d_own = (lon - clon) ** 2 + (lat - clat) ** 2
    offs = hg.grid_disk_offsets(1)
    q, r, _ = hg.cell_to_qr(cells)
    for dq, dr in offs:
        if dq == 0 and dr == 0:
            continue
        ncells = hg.qr_to_cell(q + dq, r + dr, res)
        nlon, nlat = hg.cell_to_latlng(ncells)
        d_n = (lon - nlon) ** 2 + (lat - nlat) ** 2
        assert (d_own <= d_n + 1e-15).all()


def test_grid_disk_sizes_and_distance():
    c = hg.latlng_to_cell(np.array([10.0]), np.array([20.0]), 8)[0]
    for k in range(4):
        disk = hg.grid_disk(int(c), k)
        assert len(disk) == 1 + 3 * k * (k + 1)
        assert (hg.grid_distance(disk, np.int64(c)) <= k).all()
    assert hg.grid_distance(np.int64(c), np.int64(c)) == 0


def test_point_in_polygon_square_and_concave():
    square = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    lon = np.array([1.0, 3.0, 0.0, 2.0, 1.0, -0.1])
    lat = np.array([1.0, 1.0, 1.0, 2.0, 0.0, 1.0])
    got = hg.point_in_polygon(lon, lat, square)
    assert got.tolist() == [True, False, True, True, True, False]
    # concave "C" shape
    cshape = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 2], [3, 2], [3, 3], [0, 3]], float)
    lon = np.array([2.0, 2.0, 0.5])
    lat = np.array([1.5, 0.5, 1.5])
    assert hg.point_in_polygon(lon, lat, cshape).tolist() == [False, True, True]


def test_polygon_to_cells_centroids_inside():
    poly = np.array([[0, 0], [0.5, 0], [0.5, 0.3], [0, 0.3]], float)
    cells = hg.polygon_to_cells(poly, 6)
    assert len(cells) > 10
    lon, lat = hg.cell_to_latlng(cells)
    assert hg.point_in_polygon(lon, lat, poly).all()
    # sorted unique
    assert (np.diff(cells) > 0).all()


def test_cells_to_wkt_dissolves_shared_edges():
    c = hg.latlng_to_cell(np.array([5.0]), np.array([5.0]), 7)[0]
    disk = hg.grid_disk(int(c), 1)
    wkt = hg.cells_to_wkt(disk)
    assert wkt.startswith("MULTIPOLYGON(")
    # 7 dissolved hexes → one ring with 18 edges (19 pts incl. closure)
    assert wkt.count(",") == 18
    assert hg.cells_to_wkt([]) == "MULTIPOLYGON EMPTY"


def test_haversine_known_value():
    # Paris → London ≈ 343.5 km
    d = hg.haversine_m(2.3522, 48.8566, -0.1276, 51.5074)
    assert d == pytest.approx(343.5e3, rel=0.01)
    assert hg.haversine_m(10.0, 20.0, 10.0, 20.0) == 0.0


def test_cell_sql_matches_numpy_in_duckdb():
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(11)
    lon = rng.uniform(-170, 170, 4000)
    lat = rng.uniform(-80, 80, 4000)
    con = duckdb.connect()
    con.register("tbl", pd.DataFrame({"lon": lon, "lat": lat}))
    for res in (4, 9):
        expected = hg.latlng_to_cell(lon, lat, res)
        got = con.sql(
            "SELECT " + hg.cell_sql("lon", "lat", res) + " AS cell FROM tbl"
        ).fetchnumpy()["cell"]
        assert (got == expected).all()
