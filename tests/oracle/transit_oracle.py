"""Pure-Python oracle: reference semantics, single-node, exact integers.

Transliterates the behavior (not the code) of chingiztob/ferrobus into
plain Python over the synthetic fixture tables, preserving every
semantic subtlety catalogued in SURVEY.md §7 "hard parts":

* dense stop ids = stops.txt file order (gtfs/processor.rs:389-393);
* route order = sorted route_id, pattern order = lexicographic mapped
  stop sequence, trips by (first departure, trip_id)
  (processor.rs:322-382);
* stop_sequence == 0 → arrival := departure (processor.rs:283-289);
* weekday-flag-only service filter + calendar_dates exceptions
  (processor.rs:146-175) — note the reference does NOT check
  calendar start/end dates;
* edge cost floor(length/1.4), snap cost ceil(dist/1.4)
  (osm/processor.rs:93-94 vs streets/network.rs:34-35);
* bounded Dijkstra with one-edge overhang: nodes costing more than
  max_cost are recorded but not expanded (regular_dijkstra.rs:39-43);
* transfer precedence computed < co-located < GTFS (transfers.rs:51-57);
* node_to_stop: LAST snapped stop per node wins (transfers.rs:311-316);
* RAPTOR arrival-vs-board dual labels, mid-route trip upgrade, marks
  only on best-arrival improvement (state.rs:44-57,
  regular/default_raptor.rs);
* MAX_CANDIDATE_STOPS = 1 access cap; one-to-many egress uncapped
  (lib.rs:14, multimodal_routing.rs:86, :201);
* walking tie goes to walking (is_walking_better <=,
  multimodal_routing.rs:36);
* statistics median = midpoint(lo, hi); range median = times[len/2]
  upper median (src/matrix.rs:166-179 vs pareto.rs:66-71).

Deliberate deviation (documented): nearest-stop ties sort by
(time, stop_id); the reference's HashMap iteration makes tie order
unspecified there.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

INF = 2**63 - 1  # Time::MAX stand-in (u32::MAX in the reference)
MAX_CANDIDATE_STOPS = 1
WALK_SPEED = 1.4


def parse_gtfs_time(s: str) -> int:
    h, m, sec = s.split(":")
    return int(h) * 3600 + int(m) * 60 + int(sec)


# ---------------------------------------------------------------------------
# model build
# ---------------------------------------------------------------------------

@dataclass
class Route:
    route_id: str
    pattern: list[int]          # stop indices
    trips: list[list[tuple[int, int]]]  # per trip: [(arrival, departure)] per pos
    trip_ids: list[str]


@dataclass
class Model:
    stops: pd.DataFrame                      # stop_id, lon, lat (file order)
    routes: list[Route] = field(default_factory=list)
    stop_routes: dict[int, list[int]] = field(default_factory=dict)
    transfers: dict[int, list[tuple[int, int]]] = field(default_factory=dict)
    node_to_stop: dict[int, int] = field(default_factory=dict)
    stop_nodes: list[int | None] = field(default_factory=list)
    adj: dict[int, list[tuple[int, int]]] = field(default_factory=dict)  # node -> [(nbr, secs)]
    node_pos: dict[int, tuple[float, float]] = field(default_factory=dict)
    max_transfer_time: int = 600


def haversine(lon1, lat1, lon2, lat2):
    r = 6371008.8
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dlat = p2 - p1
    dlon = math.radians(lon2 - lon1)
    h = math.sin(dlat / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlon / 2) ** 2
    return 2 * r * math.asin(math.sqrt(h))


def active_services(calendar: pd.DataFrame, calendar_dates: pd.DataFrame, date: str) -> set[str]:
    dt = pd.Timestamp(date)
    weekday_col = ["monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday"][dt.weekday()]
    active = set(calendar.loc[calendar[weekday_col] == "1", "service_id"])
    ymd = dt.strftime("%Y%m%d")
    for _, row in calendar_dates.iterrows():
        if str(row["date"]) == ymd:
            if int(row["exception_type"]) == 1:
                active.add(row["service_id"])
            elif int(row["exception_type"]) == 2:
                active.discard(row["service_id"])
    return active


def build_street_graph(nodes: pd.DataFrame, edges: pd.DataFrame):
    """foot filter → undirected adjacency → largest connected component."""
    ok = edges[edges["foot"].isin(["allowed", "unknown"])]
    adj: dict[int, list[tuple[int, int]]] = {int(n): [] for n in nodes["node_id"]}
    for src, dst, length in zip(ok["src"], ok["dst"], ok["length_m"]):
        w = int(length / WALK_SPEED)  # truncation (osm/processor.rs:93-94)
        adj[int(src)].append((int(dst), w))
        adj[int(dst)].append((int(src), w))
    # largest connected component
    seen: set[int] = set()
    best: set[int] = set()
    for start in adj:
        if start in seen:
            continue
        comp = {start}
        stack = [start]
        seen.add(start)
        while stack:
            u = stack.pop()
            for v, _ in adj[u]:
                if v not in seen:
                    seen.add(v)
                    comp.add(v)
                    stack.append(v)
        if len(comp) > len(best):
            best = comp
    adj = {u: [e for e in nbrs if e[0] in best] for u, nbrs in adj.items() if u in best}
    node_pos = {
        int(n): (float(lo), float(la))
        for n, lo, la in zip(nodes["node_id"], nodes["lon"], nodes["lat"])
        if int(n) in best
    }
    return adj, node_pos


def nearest_node(node_pos: dict, lon: float, lat: float):
    """1-NN + ceil(haversine/1.4) snap cost (streets/network.rs:31-37).

    Nearest is EUCLIDEAN IN DEGREE SPACE — the reference's rstar R-tree
    indexes raw lon/lat Point<f64>s — while the returned cost is
    haversine meters / 1.4 (ceil). The two metrics pick different nodes
    at high latitude; the reference goldens require the degree metric.
    """
    best = None
    for nid, (nlon, nlat) in node_pos.items():
        d2 = (lon - nlon) ** 2 + (lat - nlat) ** 2
        key = (d2, nid)
        if best is None or key < best[0]:
            best = (key, nid)
    if best is None:
        return None
    nlon, nlat = node_pos[best[1]]
    return best[1], int(math.ceil(haversine(lon, lat, nlon, nlat) / WALK_SPEED))


def dijkstra(adj: dict, start: int, max_cost: float | None = None, target: int | None = None):
    """Bounded Dijkstra with the reference's one-edge overhang
    (regular_dijkstra.rs:11-72): nodes popped with cost > max_cost are
    kept in the distance map but never expanded."""
    dist = {start: 0}
    heap = [(0, start)]
    while heap:
        cost, node = heapq.heappop(heap)
        if target is not None and node == target:
            break
        if cost > dist.get(node, INF):
            continue
        if max_cost is not None and cost > max_cost:
            continue
        for nbr, w in adj[node]:
            nc = cost + w
            if nc < dist.get(nbr, INF):
                dist[nbr] = nc
                heapq.heappush(heap, (nc, nbr))
    return dist


def build_model(fixture: dict[str, pd.DataFrame], date: str, max_transfer_time: int = 600) -> Model:
    stops = fixture["gtfs_stops"].reset_index(drop=True)
    trips = fixture["gtfs_trips"]
    stop_times = fixture["gtfs_stop_times"]

    act = active_services(fixture["gtfs_calendar"], fixture["gtfs_calendar_dates"], date)
    trips = trips[trips["service_id"].isin(act)]
    active_trips = set(trips["trip_id"])
    stop_times = stop_times[stop_times["trip_id"].isin(active_trips)]

    stop_idx = {sid: i for i, sid in enumerate(stops["stop_id"])}

    # group stop_times by trip, sorted by stop_sequence (stable)
    st = stop_times.copy()
    st["arr"] = st["arrival_time"].map(parse_gtfs_time)
    st["dep"] = st["departure_time"].map(parse_gtfs_time)
    trip_sts: dict[str, list] = {}
    for tid, grp in st.groupby("trip_id", sort=False):
        grp = grp.sort_values("stop_sequence", kind="stable")
        rows = []
        for _, r in grp.iterrows():
            arr = r["dep"] if int(r["stop_sequence"]) == 0 else r["arr"]
            rows.append((r["stop_id"], int(arr), int(r["dep"])))
        trip_sts[tid] = rows

    trip_route = dict(zip(trips["trip_id"], trips["route_id"]))
    by_route: dict[str, list[str]] = {}
    for tid in trip_sts:
        rid = trip_route.get(tid)
        if rid is not None:
            by_route.setdefault(rid, []).append(tid)

    model = Model(stops=stops, max_transfer_time=max_transfer_time)
    for rid in sorted(by_route):
        groups: dict[tuple, list[str]] = {}
        for tid in by_route[rid]:
            rows = trip_sts[tid]
            pattern = []
            valid = True
            for sid, _a, _d in rows:
                if sid in stop_idx:
                    pattern.append(stop_idx[sid])
                else:
                    valid = False
                    break
            if valid:
                groups.setdefault(tuple(pattern), []).append(tid)
        for pattern in sorted(groups):
            tids = groups[pattern]
            tids.sort(key=lambda t: (trip_sts[t][0][2], t))  # (first departure, trip_id)
            route = Route(
                route_id=rid,
                pattern=list(pattern),
                trips=[[(a, d) for _s, a, d in trip_sts[t]] for t in tids],
                trip_ids=list(tids),
            )
            model.routes.append(route)

    # stop → sorted route indices
    for ridx, route in enumerate(model.routes):
        for s in route.pattern:
            model.stop_routes.setdefault(s, [])
            if ridx not in model.stop_routes[s]:
                model.stop_routes[s].append(ridx)
    for s in model.stop_routes:
        model.stop_routes[s].sort()

    # street graph
    model.adj, model.node_pos = build_street_graph(
        fixture["street_nodes"], fixture["street_edges"]
    )

    # snap stops (gate: ceil-cost <= max_transfer_time)
    stop_nodes: list[int | None] = []
    for _, srow in stops.iterrows():
        sn = nearest_node(model.node_pos, float(srow["stop_lon"]), float(srow["stop_lat"]))
        if sn is not None and sn[1] <= max_transfer_time:
            stop_nodes.append(sn[0])
        else:
            stop_nodes.append(None)
    model.stop_nodes = stop_nodes

    # computed transfers: bounded SSSP per snapped stop
    computed: dict[tuple[int, int], int] = {}
    node_of = {i: n for i, n in enumerate(stop_nodes) if n is not None}
    for i, n in node_of.items():
        reach = dijkstra(model.adj, n, max_cost=max_transfer_time)
        for j, m in node_of.items():
            if i == j:
                continue
            t = reach.get(m)
            if t is not None and t <= max_transfer_time:
                computed[(i, j)] = t

    # co-located synthetic zero links
    by_node: dict[int, list[int]] = {}
    for i, n in node_of.items():
        by_node.setdefault(n, []).append(i)
    colocated: dict[tuple[int, int], int] = {}
    for group in by_node.values():
        if len(group) < 2:
            continue
        for a in group:
            for b in group:
                if a != b:
                    colocated[(a, b)] = 0

    # GTFS transfers (drop type 3 / null / over-max / unknown / self)
    gtfs: dict[tuple[int, int], int] = {}
    for _, r in fixture["gtfs_transfers"].iterrows():
        if int(r["transfer_type"]) == 3:
            continue
        if pd.isna(r["min_transfer_time"]):
            continue
        dur = int(r["min_transfer_time"])
        if dur > max_transfer_time:
            continue
        fi = stop_idx.get(r["from_stop_id"])
        ti = stop_idx.get(r["to_stop_id"])
        if fi is None or ti is None or fi == ti:
            continue
        gtfs[(fi, ti)] = dur

    merged = dict(computed)
    merged.update(colocated)
    merged.update(gtfs)
    for (f, t), dur in sorted(merged.items()):
        model.transfers.setdefault(f, []).append((t, dur))

    # node_to_stop: LAST stop wins per node (insert order = stop index order)
    for i, n in enumerate(stop_nodes):
        if n is not None:
            model.node_to_stop[n] = i

    return model


# ---------------------------------------------------------------------------
# TransitPoint
# ---------------------------------------------------------------------------

@dataclass
class TransitPoint:
    lon: float
    lat: float
    node_id: int
    nearest_stops: list[tuple[int, int]]
    walking_paths: dict[int, int]

    def walking_time_to(self, other: "TransitPoint") -> int | None:
        return self.walking_paths.get(other.node_id)


def make_transit_point(
    model: Model, lon: float, lat: float, max_walking_time: int = 1200, max_stops: int = 10
) -> TransitPoint | None:
    sn = nearest_node(model.node_pos, lon, lat)
    if sn is None:
        return None
    node, distance = sn
    if distance > max_walking_time:
        return None
    paths = dijkstra(model.adj, node, max_cost=max_walking_time - distance)
    near = []
    for n, t in paths.items():
        if t <= max_walking_time - distance and n in model.node_to_stop:
            near.append((model.node_to_stop[n], t + distance))
    near.sort(key=lambda x: (x[1], x[0]))
    return TransitPoint(lon, lat, node, near[:max_stops], paths)


# ---------------------------------------------------------------------------
# RAPTOR
# ---------------------------------------------------------------------------

def _find_earliest_trip(route: Route, stop_pos: int, earliest_board: int) -> int | None:
    lo, hi, result = 0, len(route.trips), None
    while lo < hi:
        mid = (lo + hi) // 2
        if route.trips[mid][stop_pos][1] >= earliest_board:
            result = mid
            hi = mid
        else:
            lo = mid + 1
    return result


def raptor(model: Model, source: int, target: int | None, departure: int, max_transfers: int):
    """Returns (best_arrival, best_transfer_count) arrays (INF = unreachable)."""
    n = len(model.stops)
    max_rounds = max_transfers + 1
    prev_arr = [INF] * n
    prev_board = [INF] * n
    curr_arr = [INF] * n
    curr_board = [INF] * n
    best = [INF] * n
    best_k = [0] * n
    marked = set()

    def update(rnd, stop, arrival, board):
        nonlocal curr_arr, curr_board
        if arrival < curr_arr[stop]:
            curr_arr[stop] = arrival
            curr_board[stop] = board
            if arrival < best[stop]:
                best[stop] = arrival
                best_k[stop] = rnd
                return True
        return False

    update(0, source, departure, departure)
    marked.add(source)
    for tstop, dur in model.transfers.get(source, []):
        if update(0, tstop, departure + dur, departure + dur):
            marked.add(tstop)

    for rnd in range(1, max_rounds):
        prev_arr, curr_arr = curr_arr, prev_arr
        prev_board, curr_board = curr_board, prev_board
        curr_arr = [INF] * n
        curr_board = [INF] * n
        # rebind into closure
        queue = []
        for ridx, route in enumerate(model.routes):
            for pos, s in enumerate(route.pattern):
                if s in marked:
                    queue.append((ridx, pos))
                    break
        marked = set()
        target_bound = best[target] if target is not None else INF

        for ridx, start_pos in queue:
            route = model.routes[ridx]
            stops_ = route.pattern
            # earliest catchable trip
            trip_idx = None
            board_pos = 0
            for pos in range(start_pos, len(stops_)):
                eb = prev_board[stops_[pos]]
                if eb == INF:
                    continue
                ti = _find_earliest_trip(route, pos, eb)
                if ti is not None:
                    trip_idx, board_pos = ti, pos
                    break
            if trip_idx is None:
                continue
            trip = route.trips[trip_idx]
            for pos in range(board_pos, len(stops_)):
                s = stops_[pos]
                pb = prev_board[s]
                if pb < trip[pos][1]:
                    nti = _find_earliest_trip(route, pos, pb)
                    if nti is not None and nti != trip_idx:
                        trip_idx = nti
                        trip = route.trips[nti]
                actual_arrival = trip[pos][0]
                if target is not None and s == target:
                    effective_board = actual_arrival
                else:
                    effective_board = trip[pos][1]
                if update(rnd, s, actual_arrival, effective_board):
                    marked.add(s)
                if effective_board >= target_bound:
                    break

        # footpaths from marked stops (board times, same round).
        # Iterate ASCENDING: the reference walks a FixedBitSet
        # (state.marked_stops.ones()) and reads curr_board live, so
        # within-round transfer chaining is order-dependent.
        new_marks = set()
        tb = best[target] if target is not None else INF
        for s in sorted(marked):
            cb = curr_board[s]
            for tstop, dur in model.transfers.get(s, []):
                nt = cb + dur
                if nt >= curr_board[tstop] or nt >= tb:
                    continue
                if update(rnd, tstop, nt, nt):
                    new_marks.add(tstop)
        marked |= new_marks

        if target is not None:
            at = curr_arr[target]
            if at != INF and at > best[target]:
                return best, best_k
        if not marked:
            break
    return best, best_k


def one_to_many(model: Model, start: TransitPoint, ends: list[TransitPoint | None],
                departure: int, max_transfers: int):
    """multimodal_routing_one_to_many (multimodal_routing.rs:165-254).

    Returns list of dicts {travel_time, transit_time, walking_time,
    transfers} or None."""
    transit_results = {}
    for access_stop, access_time in start.nearest_stops[:MAX_CANDIDATE_STOPS]:
        best, best_k = raptor(model, access_stop, None, departure + access_time, max_transfers)
        transit_results[access_stop] = (access_time, best, best_k)

    out = []
    for end in ends:
        if end is None:
            out.append(None)
            continue
        walking = start.walking_time_to(end)
        best_cand = None
        for _astop, (a_time, best, best_k) in transit_results.items():
            for egress_stop, e_time in end.nearest_stops:
                if walking is not None and a_time + e_time >= walking:
                    continue
                if best_cand is not None and a_time + e_time >= best_cand[0]:
                    continue
                if best[egress_stop] != INF:
                    transit_time = best[egress_stop] - (departure + a_time)
                    total = a_time + transit_time + e_time
                    if best_cand is None or total < best_cand[0]:
                        best_cand = (total, transit_time, best_k[egress_stop])
        if best_cand is not None and not (walking is not None and walking <= best_cand[0]):
            total, transit_time, k = best_cand
            out.append({
                "travel_time": total,
                "transit_time": transit_time,
                "walking_time": total - transit_time,
                "transfers": k,
            })
        elif walking is not None:
            out.append({
                "travel_time": walking,
                "transit_time": None,
                "walking_time": walking,
                "transfers": 0,
            })
        else:
            out.append(None)
    return out


def travel_time_matrix(model, points, departure, max_transfers):
    mat = []
    for p in points:
        if p is None:
            mat.append([None] * len(points))
            continue
        res = one_to_many(model, p, points, departure, max_transfers)
        mat.append([r["travel_time"] if r else None for r in res])
    return mat


def travel_time_statistics(model, points, departure, max_transfers,
                           threshold=0.75, stat="mean", filter_cutoff=None):
    out = []
    total = len(points)
    for p in points:
        if p is None:
            out.append(None)
            continue
        res = one_to_many(model, p, points, departure, max_transfers)
        times = [r["travel_time"] for r in res if r is not None]
        if filter_cutoff is not None:
            times = [t for t in times if t <= filter_cutoff]
        if not times or len(times) / total < threshold:
            out.append(None)
            continue
        if stat == "mean":
            out.append(sum(times) / len(times))
        else:
            ts = sorted(times)
            mid = len(ts) // 2
            if len(ts) % 2 == 1:
                out.append(float(ts[mid]))
            else:
                out.append((ts[mid - 1] + ts[mid]) / 2.0)
    return out


# ---------------------------------------------------------------------------
# isochrones (over ferrobus_spark.hexgrid cells)
# ---------------------------------------------------------------------------

def isochrone_cells(model, index, start: TransitPoint, departure, max_transfers, cutoff):
    """index = list of (cell, TransitPoint); returns reached cell list."""
    pts = [tp for _c, tp in index]
    res = one_to_many(model, start, pts, departure, max_transfers)
    return [index[i][0] for i, r in enumerate(res) if r is not None and r["travel_time"] <= cutoff]


def build_iso_index(model, polygon, res, max_walking_time):
    from ferrobus_spark import hexgrid
    cells = hexgrid.polygon_to_cells(np.asarray(polygon, float), res)
    out = []
    for cell in cells:
        lon, lat = hexgrid.cell_to_latlng(np.array([cell]))
        tp = make_transit_point(model, float(lon[0]), float(lat[0]), max_walking_time, 3)
        if tp is not None:
            out.append((int(cell), tp))
    return out


def percent_access(model, index, start, dep_range, interval, max_transfers, cutoff):
    deps = []
    t = dep_range[0]
    while t <= dep_range[1]:
        deps.append(t)
        t += interval
    counts: dict[int, int] = {}
    for d in deps:
        for c in isochrone_cells(model, index, start, d, max_transfers, cutoff):
            counts[c] = counts.get(c, 0) + 1
    return {c: 100.0 * n / len(deps) for c, n in counts.items()}


# ---------------------------------------------------------------------------
# range routing (rRAPTOR) + Pareto
# ---------------------------------------------------------------------------

def source_departures(model: Model, source: int, lo: int, hi: int) -> list[int]:
    deps = set()
    for ridx in model.stop_routes.get(source, []):
        route = model.routes[ridx]
        for pos, s in enumerate(route.pattern):
            if s == source:
                for trip in route.trips:
                    d = trip[pos][1]
                    if lo <= d <= hi:
                        deps.add(d)
                break
    return sorted(deps)


def rraptor(model: Model, source: int, target: int, dep_range, max_transfers):
    """Independent-per-departure semantics (reference reuses labels only
    as a warm-start speed trick; results are identical per departure —
    SURVEY.md §4). Returns [(dep, arrival|None, transfers)] latest-first."""
    journeys = []
    for dep in sorted(source_departures(model, source, *dep_range), reverse=True):
        best, best_k = raptor(model, source, target, dep, max_transfers)
        arr = best[target]
        journeys.append((dep, None if arr == INF else arr,
                         0 if arr == INF else best_k[target]))
    return journeys


def range_routing(model, start: TransitPoint, end: TransitPoint, dep_range, max_transfers):
    """range_multimodal_routing (pareto.rs:147-208): all journeys."""
    walking = start.walking_time_to(end)
    journeys = []
    if walking is not None:
        journeys.append({
            "travel_time": walking, "transfers": 0, "walking_time": walking,
            "departure_time": dep_range[0], "arrival_time": dep_range[0] + walking,
        })
    for a_stop, a_time in start.nearest_stops[:MAX_CANDIDATE_STOPS]:
        for e_stop, e_time in end.nearest_stops[:MAX_CANDIDATE_STOPS]:
            if walking is not None and a_time + e_time >= walking:
                continue
            rng = (dep_range[0] + a_time, dep_range[1] + a_time)
            for dep, arr, k in rraptor(model, a_stop, e_stop, rng, max_transfers):
                if arr is None:
                    continue
                origin_dep = dep - a_time
                dest_arr = arr + e_time
                transit_time = arr - dep
                total = dest_arr - origin_dep
                journeys.append({
                    "travel_time": total, "transfers": k,
                    "walking_time": total - transit_time,
                    "departure_time": origin_dep, "arrival_time": dest_arr,
                })
    journeys.sort(key=lambda j: j["arrival_time"])
    return journeys


def _dominates(a, b) -> bool:
    be = (a["travel_time"] <= b["travel_time"] and a["transfers"] <= b["transfers"]
          and a["walking_time"] <= b["walking_time"])
    sb = (a["travel_time"] < b["travel_time"] or a["transfers"] < b["transfers"]
          or a["walking_time"] < b["walking_time"])
    return be and sb


def pareto_filter(journeys):
    """apply_pareto_filtering (pareto.rs:120-144) — order-dependent."""
    front = []
    for j in sorted(journeys, key=lambda x: x["departure_time"]):
        if any(_dominates(e, j) and e["arrival_time"] <= j["arrival_time"] for e in front):
            continue
        front = [e for e in front
                 if not (_dominates(j, e) and j["arrival_time"] <= e["arrival_time"])]
        front.append(j)
    return front


def upper_median_travel_time(journeys) -> int:
    """RangeRoutingResult::median_travel_time (pareto.rs:66-71)."""
    by_dep = sorted(journeys, key=lambda j: j["departure_time"])
    times = sorted(j["travel_time"] for j in by_dep)
    return times[len(times) // 2]


# ---------------------------------------------------------------------------
# Traced RAPTOR + detailed journey legs (traced_raptor.rs / itinerary/mod.rs)
# ---------------------------------------------------------------------------

def traced_raptor(model: Model, source: int, target: int, departure: int,
                  max_transfers: int):
    """Legs twin of the reference's traced kernel.

    Per-round label/board/predecessor records; marks fire on ROUND-
    arrival improvement (the traced kernel's semantics — a superset of
    the untraced best-improvement marks above). Returns
    (normalized_legs, departure_time, arrival_time) or None.
    """
    n = len(model.stops)
    rounds = max_transfers + 1
    arr = [[INF] * n for _ in range(rounds)]
    board = [[INF] * n for _ in range(rounds)]
    preds = [[None] * n for _ in range(rounds)]
    marked = [set() for _ in range(rounds)]
    best = [INF] * n

    def update(rnd, stop, arrival, brd, pred):
        improved = False
        if arrival < arr[rnd][stop]:
            arr[rnd][stop] = arrival
            preds[rnd][stop] = pred
            improved = True
        if brd < board[rnd][stop]:
            board[rnd][stop] = brd
        if arrival < best[stop]:
            best[stop] = arrival
        return improved

    update(0, source, departure, departure, ("source",))
    marked[0].add(source)
    for tstop, dur in model.transfers.get(source, []):
        at = departure + dur
        if update(0, tstop, at, at, ("transfer", source, departure, at, dur)):
            marked[0].add(tstop)

    def scan_routes(rnd):
        prev = rnd - 1
        prevmarks = marked[prev]
        marked[prev] = set()
        target_bound = best[target]
        for ridx, route in enumerate(model.routes):
            stops_ = route.pattern
            start_pos = None
            for pos, s in enumerate(stops_):
                if s in prevmarks:
                    start_pos = pos
                    break
            if start_pos is None:
                continue
            trip_idx = None
            board_pos = 0
            for pos in range(start_pos, len(stops_)):
                eb = board[prev][stops_[pos]]
                if eb == INF:
                    continue
                ti = _find_earliest_trip(route, pos, eb)
                if ti is not None:
                    trip_idx, board_pos = ti, pos
                    break
            if trip_idx is None:
                continue
            boarding_idx = board_pos
            for pos in range(board_pos, len(stops_)):
                s = stops_[pos]
                pb = board[prev][s]
                if pb < route.trips[trip_idx][pos][1]:
                    nti = _find_earliest_trip(route, pos, pb)
                    if nti is not None and nti != trip_idx:
                        trip_idx = nti
                        boarding_idx = pos
                trip = route.trips[trip_idx]
                actual_arrival = trip[pos][0]
                effective_board = actual_arrival if s == target else trip[pos][1]
                pred = ("transit", stops_[boarding_idx], ridx, trip_idx,
                        trip[boarding_idx][1], actual_arrival)
                if update(rnd, s, actual_arrival, effective_board, pred):
                    marked[rnd].add(s)
                if effective_board >= target_bound:
                    break

    def foot_paths(rnd):
        # ascending live-read pass over the round's route-marked stops
        current = sorted(marked[rnd])
        new_marks = set()
        tb = best[target]
        for s in current:
            cb = board[rnd][s]
            for tstop, dur in model.transfers.get(s, []):
                at = cb + dur
                if at >= board[rnd][tstop] or at >= tb:
                    continue
                if update(rnd, tstop, at, at, ("transfer", s, cb, at, dur)):
                    new_marks.add(tstop)
        marked[rnd] = set(current) | new_marks

    for rnd in range(1, rounds):
        scan_routes(rnd)
        foot_paths(rnd)
        at = arr[rnd][target]
        # round arrival got worse than best → the reference stops and
        # reconstructs; falling out of the loop does the same here
        if at != INF and at > best[target]:
            break
        if not marked[rnd]:
            break

    if best[target] == INF:
        return None

    best_round = next(r for r in range(rounds) if arr[r][target] == best[target])
    legs = []
    stop, rnd = target, best_round
    while stop != source:
        pred = preds[rnd][stop]
        if pred is None or pred[0] == "source":
            raise ValueError("invalid journey")
        if pred[0] == "transit":
            _, from_stop, ridx, tidx, dep, arrv = pred
            if arr[rnd][stop] != arrv or rnd == 0:
                raise ValueError("invalid journey")
            legs.append({"kind": "transit", "from_stop": from_stop, "to_stop": stop,
                         "depart": dep, "arrive": arrv, "route_idx": ridx,
                         "trip_pos": tidx})
            stop = from_stop
            rnd -= 1
        else:
            _, from_stop, dep, arrv, dur = pred
            if arr[rnd][stop] != arrv:
                raise ValueError("invalid journey")
            legs.append({"kind": "transfer", "from_stop": from_stop, "to_stop": stop,
                         "depart": dep, "arrive": arrv, "route_idx": -1,
                         "trip_pos": -1, "duration": dur})
            stop = from_stop
    legs.reverse()

    # normalize: hide zero-duration synthetic transfers; insert waiting
    # immediately before transit boarding (normalize_legs semantics)
    out = []
    if legs:
        prev = legs[0]
        for nxt in legs[1:]:
            if not (prev["kind"] == "transfer" and prev.get("duration") == 0):
                out.append(prev)
            if nxt["kind"] == "transit" and nxt["depart"] > prev["arrive"]:
                out.append({"kind": "wait", "from_stop": prev["to_stop"],
                            "to_stop": prev["to_stop"], "depart": prev["arrive"],
                            "arrive": nxt["depart"], "route_idx": -1,
                            "trip_pos": -1})
            prev = nxt
        if not (prev["kind"] == "transfer" and prev.get("duration") == 0):
            out.append(prev)
    return out, board[0][source], best[target]


def detailed_journey_legs(model: Model, points: dict, od_pairs, departure: int,
                          max_transfers: int):
    """traced_multimodal_routing capped 1x1: rank-1 access/egress stops,
    direct-walk comparison, access + transit legs + egress rows.
    Returns rows shaped like the engine's LEG_SCHEMA."""
    rows = []
    for pid, oi, di in od_pairs:
        o, d = points.get(oi), points.get(di)
        if o is None or d is None:
            continue
        walking = o.walking_time_to(d)
        best_cand = None
        if o.nearest_stops and d.nearest_stops:
            a_stop, a_secs = o.nearest_stops[0]
            e_stop, e_secs = d.nearest_stops[0]
            if walking is None or a_secs + e_secs < walking:
                j = traced_raptor(model, a_stop, e_stop, departure + a_secs,
                                  max_transfers)
                if j is not None:
                    legs, dep_t, arr_t = j
                    total = a_secs + (arr_t - dep_t) + e_secs
                    best_cand = (total, a_stop, a_secs, e_stop, e_secs, legs, arr_t)
        if walking is not None and (best_cand is None or walking <= best_cand[0]):
            rows.append((pid, 0, "walk", -1, -1, departure, departure + walking,
                         -1, -1))
        elif best_cand is not None:
            _, a_stop, a_secs, e_stop, e_secs, legs, arr_t = best_cand
            idx = 0
            rows.append((pid, idx, "walk", -1, a_stop, departure,
                         departure + a_secs, -1, -1))
            idx += 1
            for leg in legs:
                rows.append((pid, idx, leg["kind"], leg["from_stop"],
                             leg["to_stop"], leg["depart"], leg["arrive"],
                             leg["route_idx"], leg["trip_pos"]))
                idx += 1
            rows.append((pid, idx, "walk", e_stop, -1, arr_t, arr_t + e_secs,
                         -1, -1))
    return rows


def dijkstra_path(adj: dict, start: int, target: int, max_cost: float | None = None):
    """Shortest node path start→target with parent tracking (bounded,
    strict-improvement relaxation — to_geojson.rs dijkstra_paths
    semantics). Returns raw-node-id path or None."""
    import heapq

    dist = {start: 0}
    par: dict[int, int] = {}
    heap = [(0, start)]
    while heap:
        cost, node = heapq.heappop(heap)
        if node == target:
            break
        if cost > dist.get(node, INF):
            continue
        if max_cost is not None and cost > max_cost:
            continue
        for nbr, secs in adj.get(node, []):
            nc = cost + secs
            if nc < dist.get(nbr, INF):
                dist[nbr] = nc
                par[nbr] = node
                heapq.heappush(heap, (nc, nbr))
    if target not in dist or (target != start and target not in par):
        return None
    path = [target]
    while path[-1] != start:
        path.append(par[path[-1]])
    path.reverse()
    return path


def journey_geojson_rows(model: Model, points: dict, od_pairs, departure: int,
                         max_transfers: int):
    """(pair_id, geojson FeatureCollection string) twin of
    legs_to_geojson_model / to_geojson.rs: transit legs through
    intermediate pattern stops, transfer legs along the bounded street
    path (stop-snapped endpoints, straight-line fallback), waiting
    points, access/egress straight lines (null point endpoints when no
    od coordinates are supplied — the registry query supplies none)."""
    import json

    lons = model.stops["stop_lon"].astype(float).tolist()
    lats = model.stops["stop_lat"].astype(float).tolist()
    # reference naming: transit_stop_name = the GTFS stop_id string
    # (model/transit/data.rs:59-66)
    sids = model.stops["stop_id"].astype(str).tolist()

    def sxy(s):
        return [lons[int(s)], lats[int(s)]]

    def sname(s):
        return sids[int(s)] if int(s) >= 0 else ""

    legs = detailed_journey_legs(model, points, od_pairs, departure, max_transfers)
    by_pair: dict[int, list] = {}
    for row in legs:
        by_pair.setdefault(row[0], []).append(row)

    out = []
    for pid in sorted(by_pair):
        feats = []
        for (_p, leg_idx, kind, fs, ts, dep, arr, ridx, tpos) in sorted(
            by_pair[pid], key=lambda r: r[1]
        ):
            if kind == "wait":
                geom = {"type": "Point", "coordinates": sxy(ts)}
                leg_type = "waiting"
            elif kind == "transit":
                pat = model.routes[int(ridx)].pattern
                coords = [sxy(fs)]
                if fs in pat and ts in pat:
                    i, j = pat.index(fs), pat.index(ts)
                    mids = pat[i + 1 : j] if i < j else pat[j + 1 : i][::-1]
                    coords += [sxy(m) for m in mids]
                coords.append(sxy(ts))
                geom = {"type": "LineString", "coordinates": coords}
                leg_type = "transit"
            elif kind == "transfer":
                coords = None
                nf = model.stop_nodes[int(fs)] if int(fs) >= 0 else None
                nt = model.stop_nodes[int(ts)] if int(ts) >= 0 else None
                if nf is not None and nt is not None:
                    path = dijkstra_path(model.adj, nf, nt, model.max_transfer_time)
                    if path is not None and len(path) > 1:
                        coords = [
                            [model.node_pos[p][0], model.node_pos[p][1]]
                            for p in path
                        ]
                        coords[0] = sxy(fs)
                        coords[-1] = sxy(ts)
                if coords is None:
                    coords = [sxy(fs), sxy(ts)]
                geom = {"type": "LineString", "coordinates": coords}
                leg_type = "transfer"
            else:  # walk
                a = sxy(fs) if fs >= 0 else [None, None]
                b = sxy(ts) if ts >= 0 else [None, None]
                leg_type = (
                    "access_walk" if fs < 0 <= ts
                    else "egress_walk" if ts < 0 <= fs
                    else "direct_walk"
                )
                geom = {"type": "LineString", "coordinates": [a, b]}
            # property sets per leg type, the reference's exactly
            # (to_geojson.rs transit/transfer/waiting, journey_leg.rs
            # walks); leg_index is journey-relative (access walk at
            # engine idx 0 is not a transit-journey leg)
            if leg_type == "transit":
                props = {
                    "leg_type": leg_type,
                    "leg_index": int(leg_idx) - 1,
                    "route_id": model.routes[int(ridx)].route_id,
                    "trip_id": model.routes[int(ridx)].trip_ids[int(tpos)],
                    "from_name": sname(fs),
                    "to_name": sname(ts),
                    "departure_time": int(dep),
                    "arrival_time": int(arr),
                    "duration": int(arr) - int(dep),
                }
            elif leg_type == "transfer":
                props = {
                    "leg_type": leg_type,
                    "leg_index": int(leg_idx) - 1,
                    "from_name": sname(fs),
                    "to_name": sname(ts),
                    "departure_time": int(dep),
                    "arrival_time": int(arr),
                    "duration": int(arr) - int(dep),
                }
            elif leg_type == "waiting":
                props = {
                    "leg_type": leg_type,
                    "duration": int(arr) - int(dep),
                    "stop_name": sname(ts),
                }
            else:
                props = {
                    "leg_type": leg_type,
                    "from_name": sname(fs),
                    "to_name": sname(ts),
                    "departure_time": int(dep),
                    "arrival_time": int(arr),
                    "duration": int(arr) - int(dep),
                }
            feats.append(json.dumps({
                "type": "Feature",
                "geometry": geom,
                "properties": props,
            }))
        out.append((pid, '{"type": "FeatureCollection", "features": ['
                    + ", ".join(feats) + "]}"))
    return out
