"""Routing products: one-to-many, travel-time matrix, statistics.

The broadcast-kernel regime of SURVEY §3.2: the timetable CSR and the
destination set are broadcast once; origins are the parallel axis
(mirroring the reference's rayon loops in src/matrix.rs:40). Each
origin runs ONE all-targets RAPTOR and fans results across all
destinations — the shape the reference itself uses for one-to-many
(multimodal_routing.rs:165-254).

Semantics replicated exactly:
* MAX_CANDIDATE_STOPS = 1 access cap, egress uncapped (lib.rs:14,
  multimodal_routing.rs:181, :201);
* walking tie goes to walking (``walking <= total``,
  multimodal_routing.rs:36);
* direct walk time = origin's bounded-SSSP map at the dest's node —
  snap legs NOT added (transit_model.rs:250-252);
* candidate iteration in (egress_secs, stop) order with first-strictly-
  better wins (ties keep the earlier candidate).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ferrobus_spark.routing.csr import CSRGraph, bounded_dijkstra
from ferrobus_spark.routing.raptor import raptor
from ferrobus_spark.routing.timetable import INF, Timetable

RESULT_SCHEMA = T.StructType([
    T.StructField("origin_id", T.LongType()),
    T.StructField("departure", T.LongType()),
    T.StructField("dest_id", T.LongType()),
    T.StructField("travel_time", T.LongType()),
    T.StructField("transit_time", T.LongType()),   # null = walking-only
    T.StructField("walking_time", T.LongType()),
    T.StructField("transfers", T.LongType()),
])


def _collect_dests(point_tables: dict[str, DataFrame]) -> list:
    """[(dest_id, node_id, [(egress_secs, stop_idx), ...]), ...]"""
    nodes = {
        int(r.point_id): int(r.node_id)
        for r in point_tables["point_nodes"].select("point_id", "node_id").collect()
    }
    stops: dict[int, list] = {pid: [] for pid in nodes}
    for r in (
        point_tables["point_stops"]
        .select("point_id", "stop_idx", "access_secs", "rank")
        .orderBy("point_id", "rank")
        .collect()
    ):
        stops[int(r.point_id)].append((int(r.access_secs), int(r.stop_idx)))
    return [(pid, nodes[pid], stops[pid]) for pid in sorted(nodes)]


def one_to_many(
    spark: SparkSession,
    tt: Timetable,
    csr: CSRGraph,
    origin_tables: dict[str, DataFrame],
    dest_tables: dict[str, DataFrame],
    departure: int | None,
    max_transfers: int,
) -> DataFrame:
    """All origins × all dests multimodal travel times (J13 as a job).

    ``departure``: constant seconds-since-midnight, or None if the
    origins table carries a per-row ``departure`` column (used by
    percent-access sampling: same origin × many departures — one job).
    """
    dests = _collect_dests(dest_tables)
    bc = spark.sparkContext.broadcast((tt, csr, dests))

    origins = origin_tables["point_nodes"].join(
        origin_tables["point_stops"].filter(F.col("rank") == 1)
        .select("point_id", "stop_idx", "access_secs"),
        "point_id",
        "left",
    )
    if departure is not None:
        origins = origins.withColumn("departure", F.lit(int(departure)))

    def kernel(batches):
        tt_, csr_, dests_ = bc.value
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                origin_id = int(row.point_id)
                dep = int(row.departure)
                node = int(row.node_id)
                snap = int(row.snap_secs)
                mwt = int(getattr(row, "max_walking_time", 1200))
                # walking map (recomputed: identical to point_walk rows)
                dense = int(csr_.dense_of([node])[0])
                walk = bounded_dijkstra(csr_, dense, max_cost=mwt - snap)
                walk_ext = {int(csr_.node_ids[k]): v for k, v in walk.items()}

                has_access = row.stop_idx is not None and not pd.isna(row.stop_idx)
                if has_access:
                    a_stop = int(row.stop_idx)
                    a_secs = int(row.access_secs)
                    best, best_k = raptor(
                        tt_, a_stop, dep + a_secs, max_transfers, target=None
                    )
                for dest_id, dnode, egress in dests_:
                    walking = walk_ext.get(dnode)
                    cand = None  # (total, transit, transfers)
                    if has_access:
                        for e_secs, e_stop in egress:
                            if walking is not None and a_secs + e_secs >= walking:
                                continue
                            if cand is not None and a_secs + e_secs >= cand[0]:
                                continue
                            arr = best[e_stop]
                            if arr != INF:
                                transit = int(arr) - (dep + a_secs)
                                total = a_secs + transit + e_secs
                                if cand is None or total < cand[0]:
                                    cand = (total, transit, int(best_k[e_stop]))
                    if cand is not None and not (walking is not None and walking <= cand[0]):
                        total, transit, k = cand
                        out.append((origin_id, dep, dest_id, total, transit, total - transit, k))
                    elif walking is not None:
                        out.append((origin_id, dep, dest_id, walking, None, walking, 0))
            yield pd.DataFrame(
                out,
                columns=[
                    "origin_id", "departure", "dest_id", "travel_time",
                    "transit_time", "walking_time", "transfers",
                ],
            )

    parts = max(1, min(origins.count(), spark.sparkContext.defaultParallelism * 2))
    return origins.repartition(parts).mapInPandas(kernel, RESULT_SCHEMA)


def route_pairs(
    spark: SparkSession,
    tt: Timetable,
    csr: CSRGraph,
    origin_tables: dict[str, DataFrame],
    dest_tables: dict[str, DataFrame],
    pairs: list[tuple[int, int]],
    departure: int,
    max_transfers: int,
) -> DataFrame:
    """The reference's ``find_route`` product (multimodal_routing.rs:70-141).

    Unlike one_to_many (all egress candidates scanned), find_route takes
    the SINGLE rank-1 access stop × SINGLE rank-1 egress stop
    (``take(MAX_CANDIDATE_STOPS)`` on both sides, lib.rs:14) and runs the
    target-pruned single-target RAPTOR — whose pruning semantics make its
    arrival differ from the all-targets scan (the reference's own
    find_route vs one-to-many goldens differ on the same OD pair: 1566
    vs 1524 on the zhelez fixture). Walking tie goes to walking.
    """
    dests = _collect_dests(dest_tables)
    dmap = {pid: (node, stops) for pid, node, stops in dests}
    bc = spark.sparkContext.broadcast((tt, csr, dmap, pairs))

    origins = origin_tables["point_nodes"].join(
        origin_tables["point_stops"].filter(F.col("rank") == 1)
        .select("point_id", "stop_idx", "access_secs"),
        "point_id",
        "left",
    ).withColumn("departure", F.lit(int(departure)))

    def kernel(batches):
        tt_, csr_, dmap_, pairs_ = bc.value
        want: dict[int, list[int]] = {}
        for o, d in pairs_:
            want.setdefault(int(o), []).append(int(d))
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                origin_id = int(row.point_id)
                if origin_id not in want:
                    continue
                dep = int(row.departure)
                node = int(row.node_id)
                snap = int(row.snap_secs)
                mwt = int(getattr(row, "max_walking_time", 1200))
                dense = int(csr_.dense_of([node])[0])
                walk = bounded_dijkstra(csr_, dense, max_cost=mwt - snap)
                walk_ext = {int(csr_.node_ids[k]): v for k, v in walk.items()}
                has_access = row.stop_idx is not None and not pd.isna(row.stop_idx)
                for dest_id in want[origin_id]:
                    dnode, egress = dmap_[dest_id]
                    walking = walk_ext.get(dnode)
                    cand = None
                    if has_access and egress:
                        a_stop, a_secs = int(row.stop_idx), int(row.access_secs)
                        e_secs, e_stop = egress[0]  # take(1): rank-1 only
                        skip = (
                            (walking is not None and a_secs + e_secs >= walking)
                        )
                        if not skip:
                            best, best_k = raptor(
                                tt_, a_stop, dep + a_secs, max_transfers, target=e_stop
                            )
                            arr = best[e_stop]
                            if arr != INF:
                                transit = int(arr) - (dep + a_secs)
                                cand = (a_secs + transit + e_secs, transit, int(best_k[e_stop]))
                    if cand is not None and not (walking is not None and walking <= cand[0]):
                        total, transit, k = cand
                        out.append((origin_id, dep, dest_id, total, transit, total - transit, k))
                    elif walking is not None:
                        out.append((origin_id, dep, dest_id, walking, None, walking, 0))
            yield pd.DataFrame(
                out,
                columns=[
                    "origin_id", "departure", "dest_id", "travel_time",
                    "transit_time", "walking_time", "transfers",
                ],
            )

    parts = max(1, min(origins.count(), spark.sparkContext.defaultParallelism))
    return origins.repartition(parts).mapInPandas(kernel, RESULT_SCHEMA)


def travel_time_matrix(
    spark, tt, csr, point_tables, departure, max_transfers
) -> DataFrame:
    """(origin_id, dest_id, travel_time nullable) — src/matrix.rs:30-67."""
    res = one_to_many(spark, tt, csr, point_tables, point_tables, departure, max_transfers)
    return res.select("origin_id", "dest_id", "travel_time")


def travel_time_statistics(
    spark,
    tt,
    csr,
    point_tables,
    departure: int,
    max_transfers: int,
    threshold: float = 0.75,
    stat: str = "mean",
    filter_cutoff: int | None = None,
) -> DataFrame:
    """Per-origin mean/exact-median with reachability gate (A6/A10,
    src/matrix.rs:102-186). Median = midpoint(lo, hi) for even counts —
    Spark's exact ``percentile(col, 0.5)`` matches that rule."""
    res = one_to_many(spark, tt, csr, point_tables, point_tables, departure, max_transfers)
    total = point_tables["point_nodes"].count()
    if filter_cutoff is not None:
        res = res.filter(F.col("travel_time") <= filter_cutoff)
    agg = F.avg("travel_time") if stat == "mean" else F.percentile("travel_time", F.lit(0.5))
    return (
        res.groupBy("origin_id")
        .agg(F.count("*").alias("n_reached"), agg.alias("stat_value"))
        .withColumn(
            "stat_value",
            F.when(F.col("n_reached") / F.lit(float(total)) < threshold, F.lit(None)).otherwise(
                F.col("stat_value")
            ),
        )
        .select("origin_id", "stat_value")
    )
