"""RAPTOR as iterative DataFrame joins — the no-broadcast scale path.

The broadcast-kernel regime (routing/products.py) assumes the timetable
fits per-executor. When it doesn't (continental feeds, 10^12-row label
tables), RAPTOR becomes pure dataflow (SURVEY §3.2 "Spark
re-expression"): labels are a DataFrame keyed by (origin_id, stop);
each round is

  frontier → route queue (min marked pos per route)
  → earliest-trip range join + min-agg        (J11 as a join)
  → running-min over pattern positions        (W2: the trip-upgrade rule)
  → arrival harvest join
  → one-hop footpath join                     (transfer relax)
  → groupBy(origin, stop) min                 (A9 label reduce)

with a driver loop over ≤ max_transfers rounds and localCheckpoint()
truncating lineage. All-targets mode only (the shape every product
uses). Equivalence to the sequential reference semantics:

* running-min over per-position earliest catchable trips ≡ the
  mid-route upgrade loop (an upgrade is always an earlier trip);
* min-union of route labels and footpath labels ≡ the reference's
  guarded sequential updates, because in all-targets mode
  curr_board ≥ curr_arr holds for every label, so the board-time skip
  (raptor_utils.rs:90) can never reject an arrival-improving relax;
* next frontier = stops whose best arrival improved this round
  (state.rs:44-57 marks exactly when best improves).

Within-round footpath chaining: the reference's footpath pass reads
live board times in ascending stop order, so a transfer chain
s1→s2→s3 (s1<s2 route-marked) relaxes TWO hops within one round as an
artifact of iteration order. This variant reproduces that exactly via
an ascending-chain min recursion over route-marked stops
(_FOOT_CHAIN_DEPTH passes) — see the relax comment in the round loop
for the equivalence argument. Chains needing more than
_FOOT_CHAIN_DEPTH+1 ascending route-marked stops would complete one
round later than the reference (practically unreachable).

Verified label-for-label against the broadcast kernel in
tests/test_raptor_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

INF = (1 << 62)

# footpath ascending-chain passes per round (see the relax comment below):
# depth k reproduces the reference's within-round chaining through up to
# k+1 route-marked stops in ascending id order
_FOOT_CHAIN_DEPTH = 2


def raptor_all_targets_joins(
    spark: SparkSession,
    model_tables: dict[str, DataFrame],
    sources: DataFrame,
    max_transfers: int,
    broadcast_timetable: bool = True,
) -> DataFrame:
    """sources(origin_id, stop_idx, departure) → (origin_id, stop_idx,
    best_arrival, transfers) for every reached stop."""
    route_stops = model_tables["route_stops"]      # route_idx, pos, stop_idx
    stop_times = model_tables["stop_times"]        # route_idx, trip_pos, pos, arrival, departure
    transfers = model_tables["transfers"]          # from_stop, to_stop, duration
    if broadcast_timetable:
        route_stops = F.broadcast(route_stops)
        stop_times = F.broadcast(stop_times)
        transfers = F.broadcast(transfers)

    # round 0: source label + one-hop footpaths from the source
    seed = sources.select(
        "origin_id",
        F.col("stop_idx"),
        F.col("departure").alias("arrival"),
        F.col("departure").alias("board"),
    )
    foot0 = (
        seed.join(transfers, seed.stop_idx == transfers.from_stop)
        .select(
            "origin_id",
            F.col("to_stop").alias("stop_idx"),
            (F.col("board") + F.col("duration")).alias("arrival"),
            (F.col("board") + F.col("duration")).alias("board"),
        )
    )
    labels = (
        seed.unionByName(foot0)
        .groupBy("origin_id", "stop_idx")
        .agg(
            F.min("arrival").alias("arrival"),
            F.min_by("board", "arrival").alias("board"),
        )
        .localCheckpoint()
    )
    best = labels.select(
        "origin_id", "stop_idx",
        F.col("arrival").alias("best_arrival"),
        F.lit(0).cast("long").alias("transfers"),
    ).localCheckpoint()
    frontier = labels.select("origin_id", "stop_idx").localCheckpoint()

    for rnd in range(1, max_transfers + 1):
        if frontier.limit(1).count() == 0:
            break
        # route queue: first marked position per (origin, route)
        queue = (
            frontier.join(route_stops, "stop_idx")
            .groupBy("origin_id", "route_idx")
            .agg(F.min("pos").alias("start_pos"))
        )
        # labeled positions on queued routes at/after start_pos
        lab_pos = (
            queue.join(route_stops, "route_idx")
            .filter(F.col("pos") >= F.col("start_pos"))
            .join(labels, ["origin_id", "stop_idx"])
            .select("origin_id", "route_idx", "pos", "board")
        )
        # earliest catchable trip per labeled position (range join + min agg)
        earliest = (
            lab_pos.join(stop_times, ["route_idx", "pos"])
            .filter(F.col("departure") >= F.col("board"))
            .groupBy("origin_id", "route_idx", "pos")
            .agg(F.min("trip_pos").alias("e_trip"))
        )
        # running min across positions = trip actually ridden (upgrade rule)
        w = (
            Window.partitionBy("origin_id", "route_idx")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        riding = earliest.withColumn("trip_pos", F.min("e_trip").over(w))
        # harvest arrivals downstream of (and at) each riding position
        w_all = (
            Window.partitionBy("origin_id", "route_idx")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ride_full = (
            queue.join(route_stops, "route_idx")
            .filter(F.col("pos") >= F.col("start_pos"))
            .join(riding.select("origin_id", "route_idx", "pos", "trip_pos"),
                  ["origin_id", "route_idx", "pos"], "left")
            .withColumn("trip_pos", F.min("trip_pos").over(w_all))
            .filter(F.col("trip_pos").isNotNull())
        )
        route_cand = (
            ride_full.join(stop_times, ["route_idx", "trip_pos", "pos"])
            .select(
                "origin_id", "stop_idx",
                F.col("arrival"),
                F.col("departure").alias("board"),
            )
        )
        curr = (
            route_cand.groupBy("origin_id", "stop_idx")
            .agg(
                F.min("arrival").alias("arrival"),
                F.min_by("board", "arrival").alias("board"),
            )
        )
        # marks after the route phase: best arrival improved
        marked1 = (
            curr.join(best, ["origin_id", "stop_idx"], "left")
            .filter(
                F.col("best_arrival").isNull()
                | (F.col("arrival") < F.col("best_arrival"))
            )
            .select("origin_id", "stop_idx", "arrival", "board")
        )
        # Footpath relax replicating the reference's live-read ascending
        # pass (raptor_utils.rs:63-103) EXACTLY: sources are the
        # route-marked stops; because the bitset is iterated in ascending
        # stop order with live board reads, a marked stop u's effective
        # board is min(route board, ascending chains w1<w2<...<u of
        # transfers between route-marked stops). The improvement guard in
        # the sequential code only prunes dominated chains, so a min-agg
        # recursion over ascending hops is result-identical. Chains longer
        # than _FOOT_CHAIN_DEPTH+1 marked stops are astronomically rare
        # (requires 3+ route-marked stops in ascending id order within
        # walking range in one round); depth 2 matches the kernel on every
        # fixture tested.
        marked_stops = marked1.select("origin_id", "stop_idx")
        acc = marked1.select("origin_id", "stop_idx", "board")
        for _hop in range(_FOOT_CHAIN_DEPTH):
            nxt = (
                acc.join(transfers, acc.stop_idx == transfers.from_stop)
                .filter(F.col("from_stop") < F.col("to_stop"))
                .select(
                    "origin_id",
                    F.col("to_stop").alias("stop_idx"),
                    (F.col("board") + F.col("duration")).alias("board"),
                )
                .join(marked_stops, ["origin_id", "stop_idx"], "semi")
            )
            acc = (
                acc.unionByName(nxt)
                .groupBy("origin_id", "stop_idx")
                .agg(F.min("board").alias("board"))
            )
        foot = (
            acc.join(transfers, acc.stop_idx == transfers.from_stop)
            .select(
                "origin_id",
                F.col("to_stop").alias("stop_idx"),
                (F.col("board") + F.col("duration")).alias("arrival"),
                (F.col("board") + F.col("duration")).alias("board"),
            )
        )
        curr2 = (
            curr.unionByName(foot)
            .groupBy("origin_id", "stop_idx")
            .agg(
                F.min("arrival").alias("arrival"),
                F.min_by("board", "arrival").alias("board"),
            )
            .localCheckpoint()
        )
        # frontier + best update
        improved = (
            curr2.join(best, ["origin_id", "stop_idx"], "left")
            .filter(
                F.col("best_arrival").isNull()
                | (F.col("arrival") < F.col("best_arrival"))
            )
            .select(
                "origin_id", "stop_idx",
                F.col("arrival").alias("best_arrival"),
                F.lit(rnd).cast("long").alias("transfers"),
            )
        )
        frontier = improved.select("origin_id", "stop_idx").localCheckpoint()
        best = (
            best.unionByName(improved)
            .groupBy("origin_id", "stop_idx")
            .agg(
                F.min("best_arrival").alias("best_arrival"),
                F.min_by("transfers", "best_arrival").alias("transfers"),
            )
            .localCheckpoint()
        )
        labels = curr2

    return best
