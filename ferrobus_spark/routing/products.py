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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
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


# find_route is an explicit-OD-pairs product; its dest map is broadcast to
# the kernel, so bound the driver-side footprint with a hard cap (a caller
# with more pairs wants the one_to_many join regime, not find_route).
MAX_ROUTE_PAIRS = 100_000


def _collect_dests(point_tables: dict[str, DataFrame], dest_ids: list[int]) -> list:
    """[(dest_id, node_id, [(egress_secs, stop_idx)]), ...] — ONLY the
    requested dests, and only their rank-1 egress row (``take(1)`` —
    find_route scans a single egress candidate, lib.rs:14), so the
    driver collect is O(|pairs' dests|), never the whole point table."""
    wanted = F.col("point_id").isin([int(d) for d in dest_ids])
    nodes = {
        int(r.point_id): int(r.node_id)
        for r in point_tables["point_nodes"]
        .filter(wanted).select("point_id", "node_id").collect()
    }
    stops: dict[int, list] = {pid: [] for pid in nodes}
    for r in (
        point_tables["point_stops"]
        .filter(wanted & (F.col("rank") == 1))
        .select("point_id", "stop_idx", "access_secs")
        .collect()
    ):
        stops[int(r.point_id)].append((int(r.access_secs), int(r.stop_idx)))
    return [(pid, nodes[pid], stops[pid]) for pid in sorted(nodes)]


LABEL_SCHEMA = T.StructType([
    T.StructField("origin_id", T.LongType()),
    T.StructField("departure", T.LongType()),
    T.StructField("a_secs", T.LongType()),
    T.StructField("stop_idx", T.LongType()),     # reached stop
    T.StructField("arrival", T.LongType()),
    T.StructField("k_transfers", T.LongType()),
])


def raptor_labels(
    spark: SparkSession,
    tt: Timetable,
    origin_tables: dict[str, DataFrame],
    departure: int | None,
    max_transfers: int,
) -> DataFrame:
    """One all-targets RAPTOR per origin → (origin, stop, arrival) labels.

    The kernel axis is origins (the reference's rayon loop, matrix.rs:40);
    everything downstream of the labels is DataFrame algebra. Origins with
    no access stop emit nothing (walking-only pairs are handled by the
    point_walk join in one_to_many).
    """
    bc = spark.sparkContext.broadcast(tt)

    origins = origin_tables["point_nodes"].join(
        origin_tables["point_stops"].filter(F.col("rank") == 1)
        .select("point_id", "stop_idx", "access_secs"),
        "point_id",
    )
    if departure is not None:
        origins = origins.withColumn("departure", F.lit(int(departure)))

    def kernel(batches):
        tt_ = bc.value
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                dep = int(row.departure)
                a_secs = int(row.access_secs)
                best, best_k = raptor(
                    tt_, int(row.stop_idx), dep + a_secs, max_transfers, target=None
                )
                hit = np.nonzero(best != INF)[0]
                outs.append(pd.DataFrame({
                    "origin_id": np.full(len(hit), int(row.point_id), np.int64),
                    "departure": np.full(len(hit), dep, np.int64),
                    "a_secs": np.full(len(hit), a_secs, np.int64),
                    "stop_idx": hit.astype(np.int64),
                    "arrival": best[hit].astype(np.int64),
                    "k_transfers": best_k[hit].astype(np.int64),
                }))
            yield pd.concat(outs) if outs else pd.DataFrame(
                {f.name: pd.Series(dtype="int64") for f in LABEL_SCHEMA.fields}
            )

    parts = max(1, min(origins.count(), spark.sparkContext.defaultParallelism * 2))
    return origins.repartition(parts).mapInPandas(kernel, LABEL_SCHEMA)


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

    Plan shape (the join regime — nothing is collected to the driver and
    the origin walk maps are REUSED from point_walk, not recomputed):

      1. labels   = one all-targets RAPTOR per origin (kernel);
      2. walking  = origin point_walk ⋈ dest snap nodes on node_id
                    (walking_time_to, transit_model.rs:250-252);
      3. transit  = labels ⋈ dest point_stops on stop_idx; per-pair
                    argmin by (total, egress rank) — the reference's
                    rank-order "first strictly better wins" scan, whose
                    a+e pruning rules are subsumed by the min since
                    total ≥ a+e always;
      4. walking ties beat transit (walking <= total,
         multimodal_routing.rs:36).

    ``csr`` is kept in the signature for API stability; the walk maps
    come precomputed from ``origin_tables["point_walk"]``.
    """
    labels = raptor_labels(spark, tt, origin_tables, departure, max_transfers)

    o_meta = origin_tables["point_nodes"].select(
        F.col("point_id").alias("origin_id")
    )
    if departure is not None:
        o_meta = o_meta.withColumn("departure", F.lit(int(departure)))
    else:
        o_meta = origin_tables["point_nodes"].select(
            F.col("point_id").alias("origin_id"), "departure"
        )

    dest_nodes = dest_tables["point_nodes"].select(
        F.col("point_id").alias("dest_id"), "node_id"
    )
    walking = (
        o_meta.join(
            origin_tables["point_walk"].withColumnRenamed("point_id", "origin_id"),
            "origin_id",
        )
        .join(dest_nodes, "node_id")
        .select("origin_id", "departure", "dest_id", F.col("walk_secs").alias("walking"))
    )

    egress = dest_tables["point_stops"].select(
        F.col("point_id").alias("dest_id"),
        "stop_idx",
        F.col("access_secs").alias("e_secs"),
        "rank",
    )
    cand = (
        labels.join(egress, "stop_idx")
        .withColumn("total", F.col("arrival") - F.col("departure") + F.col("e_secs"))
    )
    w = Window.partitionBy("origin_id", "departure", "dest_id").orderBy("total", "rank")
    best_cand = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "origin_id", "departure", "dest_id", "total",
            (F.col("arrival") - F.col("departure") - F.col("a_secs")).alias("transit"),
            F.col("k_transfers").alias("k"),
        )
    )

    joined = best_cand.join(
        walking, ["origin_id", "departure", "dest_id"], "full_outer"
    )
    take_transit = F.col("total").isNotNull() & (
        F.col("walking").isNull() | (F.col("walking") > F.col("total"))
    )
    return joined.select(
        "origin_id",
        "departure",
        "dest_id",
        F.when(take_transit, F.col("total")).otherwise(F.col("walking")).alias("travel_time"),
        F.when(take_transit, F.col("transit")).alias("transit_time"),
        F.when(take_transit, F.col("total") - F.col("transit"))
        .otherwise(F.col("walking")).alias("walking_time"),
        F.when(take_transit, F.col("k")).otherwise(F.lit(0)).alias("transfers"),
    ).filter(F.col("travel_time").isNotNull())


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
    if len(pairs) > MAX_ROUTE_PAIRS:
        raise ValueError(
            f"route_pairs: {len(pairs)} OD pairs exceeds MAX_ROUTE_PAIRS="
            f"{MAX_ROUTE_PAIRS}; use one_to_many (the join regime) for "
            "bulk OD products instead of find_route."
        )
    dests = _collect_dests(dest_tables, sorted({int(d) for _o, d in pairs}))
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
