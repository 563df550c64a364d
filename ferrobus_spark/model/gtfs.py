"""GTFS → normalized timetable tables (the model-build ETL, SURVEY §3.1).

Spark re-expression of the reference's 4-stage pipeline
(gtfs/processor.rs:17-22): load → date-filter → pattern-group → index.
All tie-breaks replicate the reference exactly (SURVEY §7 hard part 2):

* dense ``stop_idx`` = stops.txt file order (processor.rs:389-393);
* internal routes ordered by (route_id, pattern) — pattern compared
  lexicographically as an int sequence (processor.rs:350-353, 406-408);
* trips within a pattern ordered by (first departure, trip_id)
  (processor.rs:355-361);
* ``stop_sequence == 0`` → arrival := departure (processor.rs:283-289);
* service filter = weekday flag only + calendar_dates exceptions
  (processor.rs:146-175; the reference ignores calendar start/end).

Output tables (all DataFrames):
  stops_dim(stop_idx, stop_id, lon, lat)
  routes(route_idx, route_id, num_trips, num_stops)
  route_stops(route_idx, pos, stop_idx)
  stop_times(route_idx, trip_pos, pos, arrival, departure)
  trips_dim(route_idx, trip_pos, trip_id)
  stop_routes(stop_idx, route_idx)
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

WEEKDAY_COLS = ["monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday"]


def parse_time_col(col: str) -> F.Column:
    """``HH:MM:SS`` → seconds since midnight; supports hours ≥ 24
    (reference de.rs:60-82). Pure column expression."""
    parts = F.split(F.col(col), ":")
    return (
        parts.getItem(0).cast("long") * 3600
        + parts.getItem(1).cast("long") * 60
        + parts.getItem(2).cast("long")
    )


def active_service_ids(
    spark: SparkSession,
    calendar: DataFrame,
    calendar_dates: DataFrame,
    date: str,
) -> DataFrame:
    """Active services on a date: weekday flag, then ±exceptions (F2/F3)."""
    weekday_col = WEEKDAY_COLS[_dt.date.fromisoformat(date).weekday()]
    ymd = date.replace("-", "")
    regular = calendar.filter(F.col(weekday_col) == "1").select("service_id")
    exc = calendar_dates.filter(F.col("date").cast("string") == ymd)
    added = exc.filter(F.col("exception_type") == 1).select("service_id")
    removed = exc.filter(F.col("exception_type") == 2).select("service_id")
    return regular.union(added).distinct().join(removed, "service_id", "left_anti")


def build_timetable(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    date: str | None,
) -> dict[str, DataFrame]:
    stops = tables["gtfs_stops"]
    trips = tables["gtfs_trips"]
    stop_times = tables["gtfs_stop_times"]

    # dense stop ids = file order (file_idx provided by the source)
    stops_dim = stops.select(
        F.col("file_idx").cast("long").alias("stop_idx"),
        "stop_id",
        F.col("stop_lon").alias("lon"),
        F.col("stop_lat").alias("lat"),
    )

    if date is not None:
        active = active_service_ids(
            spark, tables["gtfs_calendar"], tables["gtfs_calendar_dates"], date
        )
        trips = trips.join(F.broadcast(active), "service_id", "semi")
        stop_times = stop_times.join(trips.select("trip_id"), "trip_id", "semi")

    st = stop_times.select(
        "trip_id",
        F.col("stop_sequence").cast("long").alias("seq"),
        "stop_id",
        parse_time_col("arrival_time").alias("arr_raw"),
        parse_time_col("departure_time").alias("dep"),
    ).withColumn(
        "arrival", F.when(F.col("seq") == 0, F.col("dep")).otherwise(F.col("arr_raw"))
    )

    # map to dense stop ids; trips touching unknown stops are dropped whole
    st = st.join(
        F.broadcast(stops_dim.select("stop_id", "stop_idx")), "stop_id", "left"
    )
    bad_trips = st.filter(F.col("stop_idx").isNull()).select("trip_id").distinct()
    st = st.join(bad_trips, "trip_id", "left_anti")

    # per-trip ordered struct array → pattern + first departure
    per_trip = (
        st.groupBy("trip_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("seq", "stop_idx", "arrival", "dep"))
            ).alias("sts")
        )
        .select(
            "trip_id",
            F.transform("sts", lambda x: x.stop_idx).alias("pattern"),
            F.transform(
                "sts", lambda x: F.struct(x.arrival.alias("arrival"), x.dep.alias("departure"))
            ).alias("times"),
            F.element_at("sts", 1).dep.alias("first_dep"),
        )
        .join(trips.select("trip_id", "route_id"), "trip_id", "inner")
    )

    # one internal route per (route_id, pattern); deterministic dense ids
    w_route = Window.orderBy("route_id", "pattern")
    routes = (
        per_trip.groupBy("route_id", "pattern")
        .agg(F.count("*").alias("num_trips"))
        .withColumn("route_idx", F.row_number().over(w_route) - 1)
        .withColumn("num_stops", F.size("pattern"))
        .select("route_idx", "route_id", "pattern", "num_trips", "num_stops")
    )

    w_trip = Window.partitionBy("route_idx").orderBy("first_dep", "trip_id")
    trip_rows = (
        per_trip.join(routes.select("route_id", "pattern", "route_idx"), ["route_id", "pattern"])
        .withColumn("trip_pos", F.row_number().over(w_trip) - 1)
    )

    trips_dim = trip_rows.select("route_idx", "trip_pos", "trip_id")

    stop_times_flat = trip_rows.select(
        "route_idx",
        "trip_pos",
        F.posexplode("times").alias("pos", "t"),
    ).select(
        "route_idx", "trip_pos", "pos",
        F.col("t.arrival").alias("arrival"),
        F.col("t.departure").alias("departure"),
    )

    route_stops = routes.select(
        "route_idx", F.posexplode("pattern").alias("pos", "stop_idx")
    )

    stop_routes = (
        route_stops.select("stop_idx", "route_idx").distinct()
    )

    return {
        "stops_dim": stops_dim,
        "routes": routes.drop("pattern"),
        "routes_with_pattern": routes,
        "route_stops": route_stops,
        "stop_times": stop_times_flat,
        "trips_dim": trips_dim,
        "stop_routes": stop_routes,
    }
