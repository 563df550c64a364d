"""Traced RAPTOR + detailed journey legs (reference itinerary/, traced/).

Per-round label snapshots with predecessor records, backtracked into a
legs table: walk (access/egress/transfer) and transit legs with board/
alight stops and times, plus a GeoJSON emit. Arrival times are the
oracle-exact kernel's; leg structure is validated by invariants
(chronology, chaining, transfer-count and total-time consistency with
the untraced result) — full structural parity with the reference's
traced tests is round-2 work.

Leg shape mirrors DetailedJourney (itinerary/journey_leg.rs,
detailed_journey.rs): walking-only journeys emit a single walk leg;
transit journeys emit access walk → (transit | transfer)* → egress walk.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ferrobus_spark.routing.csr import bounded_dijkstra
from ferrobus_spark.routing.timetable import INF, Timetable

LEG_SCHEMA = T.StructType([
    T.StructField("pair_id", T.LongType()),
    T.StructField("leg_idx", T.IntegerType()),
    T.StructField("kind", T.StringType()),       # walk | transit | transfer | wait
    T.StructField("from_stop", T.LongType()),    # -1 for point endpoints
    T.StructField("to_stop", T.LongType()),
    T.StructField("depart", T.LongType()),
    T.StructField("arrive", T.LongType()),
    T.StructField("route_idx", T.LongType()),    # -1 for non-transit
    T.StructField("trip_pos", T.LongType()),
])


def raptor_traced(tt: Timetable, source: int, departure: int, max_transfers: int,
                  target: int):
    """Single-target RAPTOR keeping per-round labels + predecessors.

    pred record: ("source",) | ("transit", from_stop, route, trip, dep, arr)
    | ("transfer", from_stop, dep, arr).
    Returns (best_arrival or None, legs list target←source reversed).
    """
    n = tt.n_stops
    rounds = max_transfers + 1
    arr = [np.full(n, INF, np.int64) for _ in range(rounds)]
    board = [np.full(n, INF, np.int64) for _ in range(rounds)]
    preds: list[list] = [[None] * n for _ in range(rounds)]
    best = np.full(n, INF, np.int64)

    def update(rnd, stop, a, b, pred):
        updated = False
        if a < arr[rnd][stop]:
            arr[rnd][stop] = a
            preds[rnd][stop] = pred
            updated = True
        if b < board[rnd][stop]:
            board[rnd][stop] = b
        if a < best[stop]:
            best[stop] = a
        return updated

    marked = np.zeros(n, bool)
    update(0, source, departure, departure, ("source",))
    marked[source] = True
    for k in range(tt.tr_indptr[source], tt.tr_indptr[source + 1]):
        t = int(tt.tr_target[k])
        dur = int(tt.tr_secs[k])
        nt = departure + dur
        if update(0, t, nt, nt, ("transfer", source, departure, nt)):
            marked[t] = True

    for rnd in range(1, rounds):
        prev_board = board[rnd - 1]
        marked_stops = np.nonzero(marked)[0]
        if len(marked_stops) == 0:
            break
        route_ids = np.unique(np.concatenate(
            [tt.sr_routes[tt.sr_indptr[s]: tt.sr_indptr[s + 1]] for s in marked_stops]
        ))
        marked_mask = marked.copy()
        marked.fill(False)
        target_bound = best[target]

        for r in route_ids:
            stops = tt.route_stops(int(r))
            mk = np.nonzero(marked_mask[stops])[0]
            if len(mk) == 0:
                continue
            start_pos = int(mk[0])
            arr_m, dep_m = tt.trip_block(int(r))
            n_trips = arr_m.shape[0]
            boards = prev_board[stops]
            e = np.full(len(stops), n_trips, np.int64)
            active = boards != INF
            active[:start_pos] = False
            for pos in np.nonzero(active)[0]:
                e[pos] = np.searchsorted(dep_m[:, pos], boards[pos], side="left")
            t_pos = np.minimum.accumulate(e)
            riding = t_pos < n_trips
            if not riding.any():
                continue
            board_from = np.full(len(stops), -1, np.int64)
            # stop where the currently-ridden trip was boarded
            cur_trip = -1
            cur_from = -1
            cur_dep = -1
            for pos in np.nonzero(riding)[0]:
                ti = int(t_pos[pos])
                s = int(stops[pos])
                if ti != cur_trip:
                    cur_trip = ti
                    cur_from = s
                    cur_dep = int(dep_m[ti, pos])
                actual_arrival = int(arr_m[ti, pos])
                eff_board = actual_arrival if s == target else int(dep_m[ti, pos])
                pred = ("transit", cur_from, int(r), ti, cur_dep, actual_arrival)
                if update(rnd, s, actual_arrival, eff_board, pred):
                    marked[s] = True
                if eff_board >= target_bound:
                    break

        new_marks = np.zeros(n, bool)
        tb = best[target]
        for s in np.nonzero(marked)[0]:
            cb = int(board[rnd][s])
            for k in range(tt.tr_indptr[s], tt.tr_indptr[s + 1]):
                t = int(tt.tr_target[k])
                nt = cb + int(tt.tr_secs[k])
                if nt >= board[rnd][t] or nt >= tb:
                    continue
                if update(rnd, t, nt, nt, ("transfer", s, cb, nt)):
                    new_marks[t] = True
        marked |= new_marks
        at = arr[rnd][target]
        if at != INF and at > best[target]:
            break
        if not marked.any():
            break

    if best[target] == INF:
        return None, []
    # first round achieving the best arrival
    best_round = next(
        rnd for rnd in range(rounds) if arr[rnd][target] == best[target]
    )
    legs = []
    rnd, stop = best_round, target
    while True:
        pred = preds[rnd][stop]
        if pred is None:
            # label carried implicitly from an earlier round
            rnd -= 1
            continue
        if pred[0] == "source":
            break
        if pred[0] == "transit":
            _, from_stop, route, trip, dep, a = pred
            legs.append(("transit", from_stop, stop, dep, a, route, trip))
            stop = from_stop
            rnd -= 1
        else:  # transfer
            _, from_stop, dep, a = pred
            legs.append(("transfer", from_stop, stop, dep, a, -1, -1))
            stop = from_stop
            # transfers stay within the round
        if stop == -1:
            break
    legs.reverse()
    return int(best[target]), legs


def detailed_journeys(
    spark: SparkSession,
    tt: Timetable,
    csr,
    od_pairs: DataFrame,
    origin_tables: dict[str, DataFrame],
    dest_tables: dict[str, DataFrame],
    departure: int,
    max_transfers: int,
) -> DataFrame:
    """(pair_id legs...) for each OD pair (traced_multimodal_routing)."""
    o_nodes = origin_tables["point_nodes"].select(
        F.col("point_id").alias("origin_id"), F.col("node_id").alias("o_node"),
        F.col("snap_secs").alias("o_snap"), F.col("max_walking_time").alias("o_mwt"),
    )
    o_stop = origin_tables["point_stops"].filter(F.col("rank") == 1).select(
        F.col("point_id").alias("origin_id"),
        F.col("stop_idx").alias("a_stop"), F.col("access_secs").alias("a_secs"),
    )
    d_nodes = dest_tables["point_nodes"].select(
        F.col("point_id").alias("dest_id"), F.col("node_id").alias("d_node")
    )
    d_stop = dest_tables["point_stops"].filter(F.col("rank") == 1).select(
        F.col("point_id").alias("dest_id"),
        F.col("stop_idx").alias("e_stop"), F.col("access_secs").alias("e_secs"),
    )
    rows = (
        od_pairs.join(o_nodes, "origin_id").join(o_stop, "origin_id", "left")
        .join(d_nodes, "dest_id").join(d_stop, "dest_id", "left")
    )
    bc = spark.sparkContext.broadcast((tt, csr))

    def kernel(batches):
        tt_, csr_ = bc.value
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                pid = int(r.pair_id)
                dense = int(csr_.dense_of([int(r.o_node)])[0])
                walk = bounded_dijkstra(csr_, dense, max_cost=int(r.o_mwt) - int(r.o_snap))
                walking = {int(csr_.node_ids[k]): v for k, v in walk.items()}.get(int(r.d_node))
                has = (r.a_stop is not None and not pd.isna(r.a_stop)
                       and r.e_stop is not None and not pd.isna(r.e_stop))
                best_total = None
                transit_legs = None
                if has:
                    a_stop, a_secs = int(r.a_stop), int(r.a_secs)
                    e_stop, e_secs = int(r.e_stop), int(r.e_secs)
                    bound = walking if walking is not None else None
                    if bound is None or a_secs + e_secs < bound:
                        arr_t, legs = raptor_traced(
                            tt_, a_stop, departure + a_secs, max_transfers, e_stop
                        )
                        if arr_t is not None:
                            total = a_secs + (arr_t - departure - a_secs) + e_secs
                            best_total = total
                            transit_legs = (a_stop, a_secs, e_stop, e_secs, arr_t, legs)
                if walking is not None and (best_total is None or walking <= best_total):
                    out.append((pid, 0, "walk", -1, -1, departure,
                                departure + walking, -1, -1))
                elif transit_legs is not None:
                    a_stop, a_secs, e_stop, e_secs, arr_t, legs = transit_legs
                    idx = 0
                    out.append((pid, idx, "walk", -1, a_stop, departure,
                                departure + a_secs, -1, -1))
                    idx += 1
                    for kind, fs, ts, dep, a, route, trip in legs:
                        out.append((pid, idx, kind, fs, ts, dep, a, route, trip))
                        idx += 1
                    out.append((pid, idx, "walk", e_stop, -1, arr_t, arr_t + e_secs,
                                -1, -1))
            yield pd.DataFrame(out, columns=[f.name for f in LEG_SCHEMA.fields])

    parts = max(1, min(rows.count(), spark.sparkContext.defaultParallelism * 2))
    return rows.repartition(parts).mapInPandas(kernel, LEG_SCHEMA)


def legs_to_geojson(legs: DataFrame, stops_dim: DataFrame) -> DataFrame:
    """One GeoJSON FeatureCollection string per pair (to_geojson.rs shape;
    straight-line leg geometry)."""
    s_from = stops_dim.select(
        F.col("stop_idx").alias("from_stop"),
        F.col("lon").alias("f_lon"), F.col("lat").alias("f_lat"),
    )
    s_to = stops_dim.select(
        F.col("stop_idx").alias("to_stop"),
        F.col("lon").alias("t_lon"), F.col("lat").alias("t_lat"),
    )
    enriched = legs.join(F.broadcast(s_from), "from_stop", "left").join(
        F.broadcast(s_to), "to_stop", "left"
    )
    feature = F.to_json(F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.col("kind"), F.col("depart"), F.col("arrive"),
            (F.col("arrive") - F.col("depart")).alias("duration"),
        ).alias("properties"),
        F.struct(
            F.lit("LineString").alias("type"),
            F.array(
                F.array("f_lon", "f_lat"), F.array("t_lon", "t_lat")
            ).alias("coordinates"),
        ).alias("geometry"),
    ))
    return (
        enriched.withColumn("feature", feature)
        .groupBy("pair_id")
        .agg(F.sort_array(F.collect_list(F.struct("leg_idx", "feature"))).alias("fs"))
        .select(
            "pair_id",
            F.concat(
                F.lit('{"type": "FeatureCollection", "features": ['),
                F.concat_ws(", ", F.transform("fs", lambda x: x.feature)),
                F.lit("]}"),
            ).alias("geojson"),
        )
    )
