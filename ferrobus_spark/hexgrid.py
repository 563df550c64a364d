"""Self-contained hexagonal tile index (H3-style, library-free).

The reference engine tiles space with Uber H3 cells
(``/root/reference/ferrobus-core/src/algo/isochrone.rs:191-211``). The ``h3``
library is not available in this environment, so this module implements an
equivalent deterministic hex grid from first principles:

* pointy-top hexagons in axial coordinates ``(q, r)`` over the
  equirectangular plane ``x = lon_deg, y = lat_deg``;
* resolution ``res`` gives circumradius ``size = 1 / 2**res`` degrees
  (aperture-4: each +1 res quarters the cell area);
* cells pack into a positive int64:
  ``cell = res * 2^58 + (q + 2^28) * 2^29 + (r + 2^28)``.

Everything here is pure NumPy so the same code runs inside vectorized
pandas UDFs on executors and inside the pytest oracle. For SQL-oracle
parity, :func:`cell_sql` emits the *identical* arithmetic as a portable SQL
expression (valid in both Spark SQL and DuckDB), so driver-side
correctness checks can hash-compare tile assignments exactly.

Grid API parity with the reference's H3 usage:

========================  =======================================
reference (h3 crate)       this module
========================  =======================================
``latlng_to_cell``         :func:`latlng_to_cell`
``cell_to_latlng``         :func:`cell_to_latlng`
``grid_disk`` (k-ring)     :func:`grid_disk`
``polygon_to_cells``       :func:`polygon_to_cells`
``cells_to_h3shape``       :func:`cells_to_wkt` (dissolving union)
========================  =======================================
"""

from __future__ import annotations

import numpy as np

SQRT3 = 1.7320508075688772
RES_SHIFT = 2**58
Q_SHIFT = 2**29
OFF = 2**28
MAX_RES = 15

__all__ = [
    "cell_size",
    "latlng_to_cell",
    "cell_to_qr",
    "qr_to_cell",
    "cell_to_latlng",
    "cell_resolution",
    "grid_disk",
    "grid_distance",
    "cell_boundary",
    "point_in_polygon",
    "polygon_to_cells",
    "cells_to_wkt",
    "cell_sql",
    "haversine_m",
    "EARTH_RADIUS_M",
]

# geo crate's Haversine uses the IUGG mean earth radius
# (reference: streets/network.rs:33-35 via geo::Haversine).
EARTH_RADIUS_M = 6371008.8


def cell_size(res: int) -> float:
    """Hex circumradius in degrees at a resolution (aperture-4)."""
    return 1.0 / (1 << int(res))


def _axial_frac(lon, lat, size):
    """Fractional axial coords of points (pointy-top hex layout)."""
    qf = (SQRT3 / 3.0 * lon - lat / 3.0) / size
    rf = (2.0 * lat / 3.0) / size
    return qf, rf


def _round_half_up(v):
    # floor(v + 0.5): deterministic, reproducible as SQL FLOOR(v + 0.5).
    return np.floor(v + 0.5)


def _cube_round(qf, rf):
    """Round fractional axial coords to the containing hex cell.

    Standard cube rounding: round each of (x=q, z=r, y=-q-r) and fix the
    coordinate with the largest rounding error so x+y+z == 0.
    """
    qf = np.asarray(qf, dtype=np.float64)
    rf = np.asarray(rf, dtype=np.float64)
    yf = -qf - rf
    rq = _round_half_up(qf)
    rr = _round_half_up(rf)
    ry = _round_half_up(yf)
    dq = np.abs(rq - qf)
    dr = np.abs(rr - rf)
    dy = np.abs(ry - yf)
    fix_q = (dq > dy) & (dq > dr)
    fix_r = ~fix_q & (dr > dy)
    q = np.where(fix_q, -ry - rr, rq)
    r = np.where(fix_r, -rq - ry, rr)
    return q.astype(np.int64), r.astype(np.int64)


def latlng_to_cell(lon, lat, res: int):
    """Vectorized point → int64 cell id."""
    size = cell_size(res)
    qf, rf = _axial_frac(np.asarray(lon, np.float64), np.asarray(lat, np.float64), size)
    q, r = _cube_round(qf, rf)
    return qr_to_cell(q, r, res)


def qr_to_cell(q, r, res: int):
    return (
        np.int64(res) * np.int64(RES_SHIFT)
        + (np.asarray(q, np.int64) + OFF) * np.int64(Q_SHIFT)
        + (np.asarray(r, np.int64) + OFF)
    )


def cell_to_qr(cell):
    cell = np.asarray(cell, np.int64)
    res = cell // RES_SHIFT
    rem = cell - res * RES_SHIFT
    q = rem // Q_SHIFT - OFF
    r = rem - (rem // Q_SHIFT) * Q_SHIFT - OFF
    return q, r, res


def cell_resolution(cell):
    return np.asarray(cell, np.int64) // RES_SHIFT


def cell_to_latlng(cell):
    """Cell centroid as (lon, lat) arrays."""
    q, r, res = cell_to_qr(cell)
    size = 1.0 / np.power(2.0, res.astype(np.float64))
    lon = size * SQRT3 * (q.astype(np.float64) + r.astype(np.float64) / 2.0)
    lat = size * 1.5 * r.astype(np.float64)
    return lon, lat


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells within hex distance k of ``cell`` (the H3 k-ring)."""
    q0, r0, res = cell_to_qr(np.int64(cell))
    q0, r0, res = int(q0), int(r0), int(res)
    qs, rs = [], []
    for dq in range(-k, k + 1):
        lo = max(-k, -dq - k)
        hi = min(k, -dq + k)
        for dr in range(lo, hi + 1):
            qs.append(q0 + dq)
            rs.append(r0 + dr)
    return qr_to_cell(np.array(qs, np.int64), np.array(rs, np.int64), res)


def grid_disk_offsets(k: int) -> np.ndarray:
    """(n, 2) array of (dq, dr) axial offsets within hex distance k."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((dq, dr))
    return np.array(out, np.int64)


def grid_distance(cell_a, cell_b):
    """Hex (axial) distance between cells of equal resolution."""
    qa, ra, _ = cell_to_qr(cell_a)
    qb, rb, _ = cell_to_qr(cell_b)
    dq = qa - qb
    dr = ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


_HEX_ANGLES = np.deg2rad(30.0 + 60.0 * np.arange(6))


def cell_boundary(cell) -> np.ndarray:
    """(6, 2) array of (lon, lat) hexagon vertices, counter-clockwise."""
    lon, lat = cell_to_latlng(np.asarray([cell], np.int64))
    res = int(cell_resolution(np.int64(cell)))
    size = cell_size(res)
    vx = lon[0] + size * SQRT3 / 2.0 * np.array([1, 0, -1, -1, 0, 1], np.float64)
    vy = lat[0] + size * np.array([0.5, 1.0, 0.5, -0.5, -1.0, -0.5], np.float64)
    return np.stack([vx, vy], axis=1)


def point_in_polygon(lon, lat, poly: np.ndarray):
    """Vectorized even-odd ray casting; boundary points count as inside.

    ``poly`` is an (n, 2) array of (lon, lat) ring vertices (open ring —
    do not repeat the first vertex). Replaces shapely's ``covers`` in the
    filter-refine spatial join (SURVEY.md J10).
    """
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    inside = np.zeros(lon.shape, dtype=bool)
    on_edge = np.zeros(lon.shape, dtype=bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        # edge containment (collinear + within bbox)
        cross = (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1)
        within = (
            (np.minimum(x1, x2) - 1e-12 <= lon)
            & (lon <= np.maximum(x1, x2) + 1e-12)
            & (np.minimum(y1, y2) - 1e-12 <= lat)
            & (lat <= np.maximum(y1, y2) + 1e-12)
        )
        on_edge |= (np.abs(cross) < 1e-12) & within
        # even-odd crossing
        crosses = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (lat - y1) / (y2 - y1) * (x2 - x1)
        inside ^= crosses & (lon < np.where(crosses, xint, np.inf))
    return inside | on_edge


def polygon_to_cells(poly: np.ndarray, res: int) -> np.ndarray:
    """Cells whose centroid lies inside the polygon (centroid mode).

    The reference polyfills with ``ContainmentMode::Covers``
    (algo/isochrone.rs:191-201) and then uses cell *centroids* as routing
    targets; centroid containment is the deterministic analogue here and
    is what the oracle also computes.
    """
    poly = np.asarray(poly, np.float64)
    size = cell_size(res)
    qf, rf = _axial_frac(poly[:, 0], poly[:, 1], size)
    pad = 2
    q_lo, q_hi = int(np.floor(qf.min())) - pad, int(np.ceil(qf.max())) + pad
    r_lo, r_hi = int(np.floor(rf.min())) - pad, int(np.ceil(rf.max())) + pad
    qq, rr = np.meshgrid(
        np.arange(q_lo, q_hi + 1, dtype=np.int64),
        np.arange(r_lo, r_hi + 1, dtype=np.int64),
        indexing="ij",
    )
    qq = qq.ravel()
    rr = rr.ravel()
    cells = qr_to_cell(qq, rr, res)
    lon, lat = cell_to_latlng(cells)
    keep = point_in_polygon(lon, lat, poly)
    return np.sort(cells[keep])


def _stitch_rings(edges: list[tuple[tuple[int, int], tuple[int, int]]]):
    """Order boundary edges into closed rings (vertices are quantized ints)."""
    nxt: dict[tuple[int, int], tuple[int, int]] = {}
    for a, b in edges:
        nxt[a] = b
    rings = []
    while nxt:
        start, cur = next(iter(nxt.items()))
        ring = [start]
        while cur != start:
            ring.append(cur)
            cur = nxt.pop(cur)
        nxt.pop(start, None)
        rings.append(ring)
    return rings


_QUANT = 10**9


def cells_to_wkt(cells) -> str:
    """Dissolve a cell set into a WKT MULTIPOLYGON (shared edges removed).

    Replaces the reference's ``SolventBuilder.dissolve`` + WKT emit
    (algo/isochrone.rs:106-110, src/isochrone.rs:238). Vertices are
    quantized to 1e-9 degrees so shared hex edges cancel exactly.
    """
    cells = np.asarray(cells, np.int64)
    if cells.size == 0:
        return "MULTIPOLYGON EMPTY"
    seen: dict[tuple[tuple[int, int], tuple[int, int]], None] = {}
    edges: dict = {}
    for cell in cells:
        b = cell_boundary(int(cell))
        iv = [(int(round(x * _QUANT)), int(round(y * _QUANT))) for x, y in b]
        for i in range(6):
            a, bb = iv[i], iv[(i + 1) % 6]
            if (bb, a) in edges:
                del edges[(bb, a)]  # interior edge: appears in both directions
            else:
                edges[(a, bb)] = None
    rings = _stitch_rings([(a, b) for (a, b) in edges])
    # outer rings are CCW in our construction; holes CW — WKT accepts both.
    polys = []
    outers = []
    holes = []
    for ring in rings:
        area2 = 0
        for i in range(len(ring)):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % len(ring)]
            area2 += x1 * y2 - x2 * y1
        (outers if area2 > 0 else holes).append(ring)

    def fmt_ring(ring):
        pts = ring + [ring[0]]
        return "(" + ", ".join(f"{x / _QUANT:.9f} {y / _QUANT:.9f}" for x, y in pts) + ")"

    # assign each hole to the outer ring that contains its first vertex
    for outer in outers:
        opoly = np.array([(x / _QUANT, y / _QUANT) for x, y in outer])
        my_holes = []
        for h in holes:
            hx, hy = h[0][0] / _QUANT, h[0][1] / _QUANT
            if point_in_polygon(np.array([hx]), np.array([hy]), opoly)[0]:
                my_holes.append(h)
        parts = [fmt_ring(outer)] + [fmt_ring(h) for h in my_holes]
        polys.append("(" + ", ".join(parts) + ")")
    # no space after MULTIPOLYGON: matches the reference's wkt-crate
    # emit (tests/python/test.py:38 asserts the exact prefix)
    return "MULTIPOLYGON(" + ", ".join(polys) + ")"


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle metres, mean earth radius — matches the geo crate
    (reference streets/network.rs:33-35)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(h))


# ---------------------------------------------------------------------------
# Portable SQL emission (identical arithmetic in Spark SQL and DuckDB)
# ---------------------------------------------------------------------------

def dlit(x: float) -> str:
    """A float literal as portable SQL that is DOUBLE in every engine.

    Bare fractional literals parse as DECIMAL in both Spark SQL and
    DuckDB, and decimal/double mixing breaks bit-exact parity with the
    NumPy mirrors — always cast.
    """
    return f"CAST({float(x)!r} AS DOUBLE)"


def cell_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """Emit ``latlng_to_cell`` as one portable SQL expression.

    The exact same expression string runs under Spark SQL and DuckDB, so
    the driver's hash-compare sees bit-identical int64 cell ids. Uses only
    +,-,*,/, FLOOR, ABS, CASE — IEEE double arithmetic evaluated in the
    same textual order in both engines.
    """
    # op-for-op identical to _axial_frac (left-assoc double arithmetic)
    size = dlit(cell_size(res))
    three = dlit(3.0)
    qf = f"(({dlit(SQRT3)} / {three} * ({lon_expr}) - ({lat_expr}) / {three}) / {size})"
    rf = f"(({dlit(2.0)} * ({lat_expr}) / {three}) / {size})"
    yf = f"(-{qf} - {rf})"
    half = dlit(0.5)
    rq = f"FLOOR({qf} + {half})"
    rr = f"FLOOR({rf} + {half})"
    ry = f"FLOOR({yf} + {half})"
    dq = f"ABS({rq} - {qf})"
    dr = f"ABS({rr} - {rf})"
    dy = f"ABS({ry} - {yf})"
    q = f"(CASE WHEN {dq} > {dy} AND {dq} > {dr} THEN -{ry} - {rr} ELSE {rq} END)"
    r = (
        f"(CASE WHEN NOT ({dq} > {dy} AND {dq} > {dr}) AND {dr} > {dy} "
        f"THEN -{rq} - {ry} ELSE {rr} END)"
    )
    return (
        f"(CAST({int(res)} AS BIGINT) * CAST({RES_SHIFT} AS BIGINT)"
        f" + (CAST({q} AS BIGINT) + {OFF}) * CAST({Q_SHIFT} AS BIGINT)"
        f" + (CAST({r} AS BIGINT) + {OFF}))"
    )
