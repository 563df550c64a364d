"""Deterministic synthetic GTFS + street-network fixture (FIXTURES.md).

Modeled on the reference's zhelez test fixture
(/root/reference/tests/test-data, conftest.py:25-33) but fully synthetic
and seed-free (pure arithmetic). Covers every loading edge case the
reference tests exercise:

* a GTFS route with TWO stop patterns, same length, different middle
  stop (pattern-variant splitting, gtfs/processor.rs:474-513);
* co-located stop pairs → synthetic zero-cost transfers
  (loading/transfers.rs:222-248, 326-361);
* an off-network stop beyond the snap gate (transfers.rs:159-173);
* transfers.txt rows of type 3 / null min_transfer_time / over-max /
  unknown stop (all dropped) plus an override pair (GTFS wins,
  transfers.rs:363-398);
* calendar + calendar_dates add/remove exceptions (processor.rs:158-175);
* a trip whose stop_sequence starts at 0 (arrival:=departure rule,
  processor.rs:283-289);
* a disconnected street component (largest-component selection,
  osm/processor.rs:101-114) and 'forbidden' foot edges (processor.rs:62-70).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

from ferrobus_spark.hexgrid import haversine_m

GRID_N = 40
LON0, LAT0 = -122.5, 37.7
SPACING = 0.002  # degrees between street nodes
MAX_TRANSFER_TIME = 600
QUERY_DATE = "2024-05-01"  # a Wednesday

def node_id(r: int, c: int) -> int:
    return r * 100 + c


def node_lonlat(r: int, c: int) -> tuple[float, float]:
    return LON0 + c * SPACING, LAT0 + r * SPACING


def _fmt_time(sec: int) -> str:
    return f"{sec // 3600:02d}:{sec % 3600 // 60:02d}:{sec % 60:02d}"


# route layout: (route_id, service_id, axis, line, stop cols/rows)
_H = "h"  # stops along a row
_V = "v"  # stops along a column
ROUTE_DEFS = [
    ("R1", "WK", _H, 10, [0, 3, 6, 9, 12, 15, 18, 21, 24, 27, 30]),
    ("R2", "WK", _H, 20, [0, 3, 6, 9, 12, 15, 18, 21, 24, 27, 30]),
    ("R3", "WK", _H, 30, [2, 5, 8, 11, 14, 17, 20, 23, 26, 29]),
    ("R4", "WK", _V, 10, [2, 6, 10, 14, 18, 22, 26, 30, 34]),
    ("R5", "WK", _V, 20, [2, 6, 10, 14, 18, 22, 26, 30, 34]),
    ("R6", "WKX", _V, 30, [2, 6, 10, 14, 18, 22, 26, 30, 34]),  # removed on QUERY_DATE
    ("R7", "WK", _H, 5, None),  # two patterns, built specially
    ("R8", "SPC", _H, 18, [14, 20, 26, 32]),  # added by exception on QUERY_DATE
]

N_TRIPS = 20
FIRST_DEP = 6 * 3600
HEADWAY = 600
RUN = 150  # stop-to-stop seconds
DWELL = 30


def _stop_pos(axis: str, line: int, k: int) -> tuple[int, int]:
    return (line, k) if axis == _H else (k, line)


@lru_cache(maxsize=1)
def transit_fixture() -> dict[str, pd.DataFrame]:
    """Build all fixture tables as pandas DataFrames (deterministic)."""
    # ----- street graph --------------------------------------------------
    nodes = []
    for r in range(GRID_N):
        for c in range(GRID_N):
            lon, lat = node_lonlat(r, c)
            nodes.append((node_id(r, c), lon, lat))
    # small disconnected component, far east (dropped by largest-component)
    for i in range(3):
        for j in range(3):
            nodes.append((90000 + i * 10 + j, -122.30 + j * SPACING, 37.70 + i * SPACING))
    nodes_df = pd.DataFrame(nodes, columns=["node_id", "lon", "lat"])

    edges = []

    def add_edge(n1, n2, foot="allowed"):
        a = nodes_df.loc[nodes_df.node_id == n1].iloc[0]
        b = nodes_df.loc[nodes_df.node_id == n2].iloc[0]
        length = float(haversine_m(a.lon, a.lat, b.lon, b.lat))
        edges.append((n1, n2, length, foot))

    node_xy = {nid: (lon, lat) for nid, lon, lat in nodes}

    def add_edge_fast(n1, n2, foot="allowed"):
        lon1, lat1 = node_xy[n1]
        lon2, lat2 = node_xy[n2]
        edges.append((n1, n2, float(haversine_m(lon1, lat1, lon2, lat2)), foot))

    for r in range(GRID_N):
        for c in range(GRID_N):
            if c + 1 < GRID_N:
                foot = "forbidden" if (r * GRID_N + c) % 97 == 13 else (
                    "unknown" if (r * GRID_N + c) % 31 == 7 else "allowed"
                )
                add_edge_fast(node_id(r, c), node_id(r, c + 1), foot)
            if r + 1 < GRID_N:
                add_edge_fast(node_id(r, c), node_id(r + 1, c), "allowed")
    for i in range(3):
        for j in range(3):
            if j + 1 < 3:
                add_edge_fast(90000 + i * 10 + j, 90000 + i * 10 + j + 1)
            if i + 1 < 3:
                add_edge_fast(90000 + i * 10 + j, 90000 + (i + 1) * 10 + j)
    edges_df = pd.DataFrame(edges, columns=["src", "dst", "length_m", "foot"])

    # ----- stops ----------------------------------------------------------
    stop_rows: list[tuple[str, str, float, float]] = []
    seen: set[str] = set()

    def add_stop(sid: str, lon: float, lat: float):
        if sid not in seen:
            seen.add(sid)
            stop_rows.append((sid, f"Stop {sid}", lat, lon))

    for route_id, _svc, axis, line, ks in ROUTE_DEFS:
        if ks is None:
            continue
        for k in ks:
            r, c = _stop_pos(axis, line, k)
            lon, lat = node_lonlat(r, c)
            add_stop(f"S{r}_{c}", lon, lat)
    # R7 pattern stops (row 5)
    for c in (0, 3, 6, 7, 9, 12):
        lon, lat = node_lonlat(5, c)
        add_stop(f"S5_{c}", lon, lat)
    # co-located pair at node (18, 20): S18_20 (R5) already sits there;
    # CO_A (served by R8) shares the node → synthetic zero-cost transfer
    lon, lat = node_lonlat(18, 20)
    add_stop("CO_A", lon, lat)
    # slightly offset stop (≈31 m east) to exercise nonzero snap cost
    lon, lat = node_lonlat(20, 24)
    add_stop("OFFSET_1", lon + 0.00035, lat)
    # off-network stop (snap > max_transfer_time → excluded from transfers)
    add_stop("FAR_AWAY", -122.10, 37.95)

    stops_df = pd.DataFrame(stop_rows, columns=["stop_id", "stop_name", "stop_lat", "stop_lon"])

    # ----- trips + stop_times --------------------------------------------
    trips = []
    stop_times = []

    def emit_trip(route_id, svc, trip_id, stop_ids, first_dep, seq_start=1):
        trips.append((route_id, svc, trip_id))
        t = first_dep
        for i, sid in enumerate(stop_ids):
            arr = t
            dep = t + DWELL
            stop_times.append((trip_id, _fmt_time(arr), _fmt_time(dep), sid, seq_start + i))
            t = dep + RUN

    for route_id, svc, axis, line, ks in ROUTE_DEFS:
        if ks is None:
            continue
        sids = [f"S{r}_{c}" for r, c in (_stop_pos(axis, line, k) for k in ks)]
        if route_id == "R8":
            sids = ["CO_A" if s == "S18_20" else s for s in sids]
        # R1 uses seq starting at 0 → hits the seq-0 arrival:=departure rule
        seq_start = 0 if route_id == "R1" else 1
        for t_i in range(N_TRIPS):
            emit_trip(route_id, svc, f"{route_id}_t{t_i:03d}",
                      sids, FIRST_DEP + t_i * HEADWAY, seq_start)

    # R7: two patterns, same length, different middle stop
    pat_a = ["S5_0", "S5_3", "S5_6", "S5_9", "S5_12"]
    pat_b = ["S5_0", "S5_3", "S5_7", "S5_9", "S5_12"]
    for t_i in range(N_TRIPS):
        pat = pat_a if t_i % 2 == 0 else pat_b
        emit_trip("R7", "WK", f"R7_t{t_i:03d}", pat, FIRST_DEP + 600 + t_i * HEADWAY)
    # an overnight trip (>24:00:00 departures — S4 time-parse rule)
    emit_trip("R1", "WK", "R1_night", [f"S10_{c}" for c in range(0, 31, 3)], 24 * 3600 + 1800, 0)

    trips_df = pd.DataFrame(trips, columns=["route_id", "service_id", "trip_id"])
    stop_times_df = pd.DataFrame(
        stop_times,
        columns=["trip_id", "arrival_time", "departure_time", "stop_id", "stop_sequence"],
    )

    # ----- calendar -------------------------------------------------------
    calendar_df = pd.DataFrame(
        [
            ("WK", "1", "1", "1", "1", "1", "0", "0", "20240101", "20241231"),
            ("WKX", "1", "1", "1", "1", "1", "0", "0", "20240101", "20241231"),
            ("WE", "0", "0", "0", "0", "0", "1", "1", "20240101", "20241231"),
            ("SPC", "0", "0", "0", "0", "0", "0", "0", "20240101", "20241231"),
            ("OLD", "1", "1", "1", "1", "1", "1", "1", "20230101", "20231231"),
        ],
        columns=[
            "service_id", "monday", "tuesday", "wednesday", "thursday", "friday",
            "saturday", "sunday", "start_date", "end_date",
        ],
    )
    calendar_dates_df = pd.DataFrame(
        [
            ("SPC", "20240501", 1),   # adds R8 on the query date
            ("WKX", "20240501", 2),   # removes R6 on the query date
            ("WK", "20240502", 2),    # unrelated date — no effect on 05-01
        ],
        columns=["service_id", "date", "exception_type"],
    )

    # ----- transfers.txt --------------------------------------------------
    transfers_df = pd.DataFrame(
        [
            # override: computed walk S10_0→S10_3 ≈ floor(haversine chain);
            # GTFS says 45 s and wins (precedence test)
            ("S10_0", "S10_3", 2, 45),
            # type 3 → dropped
            ("S20_0", "S20_3", 3, 60),
            # null min_transfer_time → dropped
            ("S20_3", "S20_6", 2, None),
            # over max_transfer_time → dropped
            ("S20_6", "S20_9", 2, 4000),
            # unknown stop → dropped
            ("NOPE", "S10_0", 2, 30),
            # self-loop → dropped
            ("S10_6", "S10_6", 2, 10),
        ],
        columns=["from_stop_id", "to_stop_id", "transfer_type", "min_transfer_time"],
    )
    transfers_df["min_transfer_time"] = transfers_df["min_transfer_time"].astype("Int64")

    feed_info_df = pd.DataFrame(
        [("ferrobus-spark-synthetic", "https://example.com", "en", "1.0", "20240101", "20241231")],
        columns=[
            "feed_publisher_name", "feed_publisher_url", "feed_lang",
            "feed_version", "feed_start_date", "feed_end_date",
        ],
    )

    return {
        "street_nodes": nodes_df,
        "street_edges": edges_df,
        "gtfs_stops": stops_df,
        "gtfs_trips": trips_df,
        "gtfs_stop_times": stop_times_df,
        "gtfs_calendar": calendar_df,
        "gtfs_calendar_dates": calendar_dates_df,
        "gtfs_transfers": transfers_df,
        "gtfs_feed_info": feed_info_df,
    }


def query_points() -> pd.DataFrame:
    """Deterministic test points: on-network, barely-reachable, off-network."""
    pts = []
    for i in range(12):
        r = 4 + i * 3
        c = 2 + (i * 7) % 36
        lon, lat = node_lonlat(r, c)
        pts.append((i, lon + 0.0003, lat + 0.0002, 1200, 10))
    pts.append((100, -122.10, 37.95, 1200, 10))  # off-network
    pts.append((101, *node_lonlat(0, 39), 60, 10))  # tiny walk budget
    return pd.DataFrame(pts, columns=["point_id", "lon", "lat", "max_walking_time", "max_nearest_stops"])


def to_spark(spark, fixture: dict[str, pd.DataFrame] | None = None):
    """Fixture tables as Spark DataFrames."""
    fixture = fixture or transit_fixture()
    out = {}
    for name, pdf in fixture.items():
        if name == "gtfs_transfers":
            pdf = pdf.copy()
            pdf["min_transfer_time"] = pdf["min_transfer_time"].astype(object).where(
                pdf["min_transfer_time"].notna(), None
            )
        if name == "gtfs_stops":
            # file order defines the dense stop index (processor.rs:389-393)
            pdf = pdf.copy()
            pdf["file_idx"] = range(len(pdf))
        out[name] = spark.createDataFrame(pdf)
    return out
