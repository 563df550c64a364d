"""Broadcast CSR street-graph kernels.

The street graph is flattened to NumPy CSR arrays (indptr/indices/
weights — the same structure-of-arrays shape the reference keeps its
model in, data.rs:15-36), broadcast once per executor, and queried by
vectorized/pandas-UDF kernels. Dijkstra reproduces the reference's
bounded search with one-edge overhang (regular_dijkstra.rs:39-43):
nodes popped with cost > max_cost are recorded but not expanded.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame


@dataclass
class CSRGraph:
    node_ids: np.ndarray      # int64, sorted — external node ids
    indptr: np.ndarray        # int64, len n+1
    indices: np.ndarray       # int32 — internal dense indices
    weights: np.ndarray       # int64 — walk seconds
    lon: np.ndarray
    lat: np.ndarray

    @property
    def n(self) -> int:
        return len(self.node_ids)

    def dense_of(self, external_ids) -> np.ndarray:
        """external node id → dense index (must exist)."""
        return np.searchsorted(self.node_ids, np.asarray(external_ids, np.int64))


def build_csr(nodes_df: DataFrame, edges_df: DataFrame) -> CSRGraph:
    """Collect (component-filtered) node/edge tables into CSR arrays.

    ``edges_df`` must already be symmetric with integer ``weight``.
    Columns: nodes(node_id, lon, lat); edges(src, dst, weight).
    """
    nodes = nodes_df.select("node_id", "lon", "lat").toPandas()
    nodes = nodes.sort_values("node_id").reset_index(drop=True)
    node_ids = nodes["node_id"].to_numpy(np.int64)
    edges = edges_df.select("src", "dst", "weight").toPandas()
    src = np.searchsorted(node_ids, edges["src"].to_numpy(np.int64))
    dst = np.searchsorted(node_ids, edges["dst"].to_numpy(np.int64))
    w = edges["weight"].to_numpy(np.int64)
    order = np.lexsort((dst, src))
    src, dst, w = src[order], dst[order], w[order]
    indptr = np.zeros(len(node_ids) + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    return CSRGraph(
        node_ids=node_ids,
        indptr=indptr,
        indices=dst.astype(np.int32),
        weights=w,
        lon=nodes["lon"].to_numpy(np.float64),
        lat=nodes["lat"].to_numpy(np.float64),
    )


INF = np.iinfo(np.int64).max


def bounded_dijkstra(g: CSRGraph, start_dense: int, max_cost: float | None = None,
                     target_dense: int | None = None) -> dict[int, int]:
    """Reference-exact bounded Dijkstra (dense-index keyed distances)."""
    dist: dict[int, int] = {start_dense: 0}
    heap = [(0, start_dense)]
    indptr, indices, weights = g.indptr, g.indices, g.weights
    while heap:
        cost, node = heapq.heappop(heap)
        if target_dense is not None and node == target_dense:
            break
        if cost > dist.get(node, INF):
            continue
        if max_cost is not None and cost > max_cost:
            continue
        for k in range(indptr[node], indptr[node + 1]):
            nbr = int(indices[k])
            nc = cost + int(weights[k])
            if nc < dist.get(nbr, INF):
                dist[nbr] = nc
                heapq.heappush(heap, (nc, nbr))
    return dist


def bounded_dijkstra_path(
    g: CSRGraph, start_dense: int, target_dense: int, max_cost: float | None = None
) -> list[int] | None:
    """Shortest node path start→target (dense indices), or None.

    Mirrors the reference's ``dijkstra_paths`` used for transfer-leg
    geometry (itinerary/to_geojson.rs:206-268): bounded, single target.
    """
    dist: dict[int, int] = {start_dense: 0}
    par: dict[int, int] = {}
    heap = [(0, start_dense)]
    indptr, indices, weights = g.indptr, g.indices, g.weights
    while heap:
        cost, node = heapq.heappop(heap)
        if node == target_dense:
            break
        if cost > dist.get(node, INF):
            continue
        if max_cost is not None and cost > max_cost:
            continue
        for k in range(indptr[node], indptr[node + 1]):
            nbr = int(indices[k])
            nc = cost + int(weights[k])
            if nc < dist.get(nbr, INF):
                dist[nbr] = nc
                par[nbr] = node
                heapq.heappush(heap, (nc, nbr))
    if target_dense not in dist or (target_dense != start_dense and target_dense not in par):
        return None
    path = [target_dense]
    while path[-1] != start_dense:
        path.append(par[path[-1]])
    path.reverse()
    return path
