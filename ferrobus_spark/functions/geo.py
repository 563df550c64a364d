"""Geodesic + deterministic-geography column expressions.

Two audiences, one source of truth: every formula here is emitted as a
portable SQL string (valid in Spark SQL *and* DuckDB) plus a NumPy mirror,
so the driver's DuckDB oracle, the pytest oracle, and the Spark plan all
compute bit-identical values.

The synthetic geography maps the web-pages graft input (BASELINE.json
``input_hint``) onto the reference's spatial world: each document gets a
deterministic (lon, lat) from a multiplicative hash of its id, with a
heavy-tailed cluster layout (6/16 of pages land in one ~4 km "downtown"
box) so a few hex cells are hot — exercising the salting + AQE skew-join
path the north rule requires.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ferrobus_spark.hexgrid import EARTH_RADIUS_M, dlit

#: Knuth multiplicative hash constant (public domain, TAOCP vol. 3).
HASH_MULT = 2654435761
HASH_MOD = 4294967296  # 2^32


def hash_sql(id_expr: str) -> str:
    """``h = (id * 2654435761) % 2^32`` as portable SQL."""
    return f"((({id_expr}) * {HASH_MULT}) % {HASH_MOD})"


def _floordiv_sql(expr: str, divisor: int) -> str:
    # portable integer division (Spark DIV / DuckDB // differ; FLOOR is common)
    return f"CAST(FLOOR(CAST({expr} AS DOUBLE) / {dlit(divisor)}) AS BIGINT)"


def lonlat_sql(id_expr: str) -> tuple[str, str]:
    """Deterministic (lon, lat) of a document as portable SQL expressions."""
    h = hash_sql(id_expr)
    c = f"({h} % 16)"
    u = f"({_floordiv_sql(h, 16)} % 20000)"
    v = f"({_floordiv_sql(h, 320000)} % 13000)"
    lon = (
        f"(CASE WHEN {c} < 6 THEN {dlit(-122.44)} + {u} * {dlit(2e-07)} "
        f"ELSE {dlit(-122.5)} + ({c} - 6) * {dlit(0.01)} + {u} * {dlit(2e-05)} END)"
    )
    lat = (
        f"(CASE WHEN {c} < 6 THEN {dlit(37.76)} + {v} * {dlit(2e-07)} "
        f"ELSE {dlit(37.7)} + (({c} - 6) % 5) * {dlit(0.01)} + {v} * {dlit(2e-05)} END)"
    )
    return lon, lat


def lonlat_cols(id_col: str = "doc_id") -> tuple[Column, Column]:
    """Same formulas as :func:`lonlat_sql`, as Spark Columns."""
    lon_sql, lat_sql = lonlat_sql(id_col)
    return F.expr(lon_sql), F.expr(lat_sql)


def lonlat_numpy(ids) -> tuple[np.ndarray, np.ndarray]:
    """NumPy mirror of :func:`lonlat_sql` for the pytest oracle."""
    ids = np.asarray(ids, np.int64)
    h = (ids * HASH_MULT) % HASH_MOD
    c = h % 16
    u = np.floor(h.astype(np.float64) / 16.0).astype(np.int64) % 20000
    v = np.floor(h.astype(np.float64) / 320000.0).astype(np.int64) % 13000
    lon = np.where(
        c < 6,
        -122.44 + u * 2e-07,
        -122.5 + (c - 6) * 0.01 + u * 2e-05,
    )
    lat = np.where(
        c < 6,
        37.76 + v * 2e-07,
        37.7 + ((c - 6) % 5) * 0.01 + v * 2e-05,
    )
    return lon, lat


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Great-circle metres (mean earth radius 6 371 008.8 m, matching the
    geo crate used at reference streets/network.rs:33-35) as portable SQL."""
    rad = dlit(np.pi / 180.0)
    two = dlit(2.0)
    dlat = f"(({lat2}) - ({lat1})) * {rad} / {two}"
    dlon = f"(({lon2}) - ({lon1})) * {rad} / {two}"
    h = (
        f"(SIN({dlat}) * SIN({dlat}) + COS(({lat1}) * {rad}) * COS(({lat2}) * {rad})"
        f" * SIN({dlon}) * SIN({dlon}))"
    )
    return f"({two} * {dlit(EARTH_RADIUS_M)} * ASIN(SQRT({h})))"


def haversine_col(lon1, lat1, lon2, lat2) -> Column:
    """Haversine metres as a pure Column expression (whole-stage codegen)."""
    rad = float(np.pi / 180.0)
    l1, p1, l2, p2 = (F.col(c) if isinstance(c, str) else c for c in (lon1, lat1, lon2, lat2))
    dlat = (p2 - p1) * rad / 2.0
    dlon = (l2 - l1) * rad / 2.0
    h = F.sin(dlat) ** 2 + F.cos(p1 * rad) * F.cos(p2 * rad) * F.sin(dlon) ** 2
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(h))


def snap_cost_col(dist_m: Column) -> Column:
    """Point→node snap cost: ``ceil(dist / 1.4)`` seconds
    (reference streets/network.rs:34-35 — note snap CEILS)."""
    return F.ceil(dist_m / 1.4).cast("long")


def edge_cost_col(length_m: Column) -> Column:
    """Edge walk cost: ``(length / 1.4) as u32`` — TRUNCATES
    (reference loading/osm/processor.rs:93-94; asymmetric with snap)."""
    return F.floor(length_m / 1.4).cast("long")
