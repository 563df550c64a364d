"""Timetable as broadcastable structure-of-arrays (the RAPTOR CSR).

Mirrors the *shape* of the reference's PublicTransitData (data.rs:15-36
— flat arrays with (start, len) offsets, "based on original microsoft
paper") because that layout serializes trivially to executors and
vectorizes with NumPy. Built once from the model DataFrames, broadcast
per executor, reused by every routing kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

INF = np.iinfo(np.int64).max


@dataclass
class Timetable:
    n_stops: int
    # routes
    route_num_trips: np.ndarray      # (R,)
    route_num_stops: np.ndarray      # (R,)
    route_stops_start: np.ndarray    # (R,) into route_stops_flat
    route_trips_start: np.ndarray    # (R,) into arr/dep flat matrices
    route_stops_flat: np.ndarray     # (sum num_stops,)
    # stop_times: per route a (num_trips, num_stops) row-major block
    arr_flat: np.ndarray
    dep_flat: np.ndarray
    # stop → routes (CSR)
    sr_indptr: np.ndarray
    sr_routes: np.ndarray
    # stop → transfers (CSR)
    tr_indptr: np.ndarray
    tr_target: np.ndarray
    tr_secs: np.ndarray

    def route_stops(self, r: int) -> np.ndarray:
        s = self.route_stops_start[r]
        return self.route_stops_flat[s : s + self.route_num_stops[r]]

    def trip_block(self, r: int) -> tuple[np.ndarray, np.ndarray]:
        """(arr, dep) matrices of shape (num_trips, num_stops) for route r."""
        s = self.route_trips_start[r]
        n = self.route_num_trips[r] * self.route_num_stops[r]
        shape = (self.route_num_trips[r], self.route_num_stops[r])
        return (
            self.arr_flat[s : s + n].reshape(shape),
            self.dep_flat[s : s + n].reshape(shape),
        )


def build_timetable_csr(model) -> Timetable:
    """Collect the model DataFrames into the broadcastable Timetable."""
    routes = (
        model["routes"].toPandas().sort_values("route_idx").reset_index(drop=True)
    )
    route_stops = (
        model["route_stops"].toPandas().sort_values(["route_idx", "pos"])
    )
    stop_times = (
        model["stop_times"].toPandas().sort_values(["route_idx", "trip_pos", "pos"])
    )
    transfers = (
        model["transfers"].toPandas().sort_values(["from_stop", "to_stop"])
    )
    n_stops = model["stops_dim"].count()

    num_trips = routes["num_trips"].to_numpy(np.int64)
    num_stops = routes["num_stops"].to_numpy(np.int64)
    stops_start = np.concatenate([[0], np.cumsum(num_stops)[:-1]])
    trips_start = np.concatenate([[0], np.cumsum(num_trips * num_stops)[:-1]])

    rs_flat = route_stops["stop_idx"].to_numpy(np.int64)
    arr_flat = stop_times["arrival"].to_numpy(np.int64)
    dep_flat = stop_times["departure"].to_numpy(np.int64)

    # stop → sorted route list
    sr = (
        route_stops[["stop_idx", "route_idx"]]
        .drop_duplicates()
        .sort_values(["stop_idx", "route_idx"])
    )
    sr_indptr = np.zeros(n_stops + 1, np.int64)
    np.add.at(sr_indptr, sr["stop_idx"].to_numpy(np.int64) + 1, 1)
    sr_indptr = np.cumsum(sr_indptr)
    sr_routes = sr["route_idx"].to_numpy(np.int64)

    tr_indptr = np.zeros(n_stops + 1, np.int64)
    np.add.at(tr_indptr, transfers["from_stop"].to_numpy(np.int64) + 1, 1)
    tr_indptr = np.cumsum(tr_indptr)

    return Timetable(
        n_stops=n_stops,
        route_num_trips=num_trips,
        route_num_stops=num_stops,
        route_stops_start=stops_start,
        route_trips_start=trips_start,
        route_stops_flat=rs_flat,
        arr_flat=arr_flat,
        dep_flat=dep_flat,
        sr_indptr=sr_indptr,
        sr_routes=sr_routes,
        tr_indptr=tr_indptr,
        tr_target=transfers["to_stop"].to_numpy(np.int64),
        tr_secs=transfers["duration"].to_numpy(np.int64),
    )
