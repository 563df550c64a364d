"""Real GTFS CSV directory loader (reference parity: loading/gtfs/de.rs:24-57,
gtfs/processor.rs:34-70).

Produces the same table dict the synthetic fixture's ``to_spark`` emits, so
``model.build.build_model`` / ``model.gtfs.build_timetable`` consume either
interchangeably:

  gtfs_stops(stop_id, stop_name, stop_lat, stop_lon, file_idx)
  gtfs_trips(route_id, service_id, trip_id)
  gtfs_stop_times(trip_id, arrival_time, departure_time, stop_id, stop_sequence)
  gtfs_calendar(service_id, monday..sunday, start_date, end_date)
  gtfs_calendar_dates(service_id, date, exception_type)
  gtfs_transfers(from_stop_id, to_stop_id, transfer_type, min_transfer_time)
  gtfs_feed_info(...)

Reference semantics replicated:

* required files (stops/trips/stop_times/calendar) raise on absence the way
  ``deserialize_gtfs_file`` surfaces Error::IoError (de.rs:24-43);
* optional files (feed_info/calendar_dates/transfers) default to EMPTY tables
  (``deserialize_optional_gtfs_file``, de.rs:45-57);
* multi-feed loads concatenate dir-by-dir in argument order
  (processor.rs:43-53) — and the dense stop index is stops.txt file order
  ACROSS dirs in that same order (processor.rs:389-393), so ``file_idx``
  carries a running offset.

Scale notes: stop_times.txt (the fact table — the only GTFS file that grows
past dim scale) goes through a plain distributed ``spark.read.csv`` scan, so
Catalyst predicate pushdown / partition-parallel parsing apply as usual.
``stops.txt`` is a dimension file whose *row order is semantic* (legacy dense
index), which is inherently sequential: we read it as a single CSV split
(GTFS stops tops out at a few hundred-thousand rows — megabytes) and assign
``file_idx`` with a row_number window over ``monotonically_increasing_id``,
one JVM-side single-reducer pass over a dim table. Everything downstream
joins on the dense index, never on file order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical output columns per table (missing CSV columns become nulls, extra
# CSV columns are dropped — serde ignores unknown fields the same way)
_STOPS_COLS = ["stop_id", "stop_name", "stop_lat", "stop_lon"]
_TRIPS_COLS = ["route_id", "service_id", "trip_id"]
_STOP_TIMES_COLS = [
    "trip_id", "arrival_time", "departure_time", "stop_id", "stop_sequence",
]
_CALENDAR_COLS = [
    "service_id", "monday", "tuesday", "wednesday", "thursday", "friday",
    "saturday", "sunday", "start_date", "end_date",
]
_CALENDAR_DATES_COLS = ["service_id", "date", "exception_type"]
_TRANSFERS_COLS = [
    "from_stop_id", "to_stop_id", "transfer_type", "min_transfer_time",
]
_FEED_INFO_COLS = [
    "feed_publisher_name", "feed_publisher_url", "feed_lang",
    "feed_version", "feed_start_date", "feed_end_date",
]

# post-select casts (CSV is read all-string; GTFS numeric fields are cast
# here so downstream gets the same dtypes the synthetic fixture emits)
_CASTS = {
    "stop_lat": "double",
    "stop_lon": "double",
    "exception_type": "int",
    "transfer_type": "int",
    "min_transfer_time": "int",
}


def _read_csv(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    df = spark.read.option("header", True).option("mode", "PERMISSIVE").csv(path)
    out = []
    for c in cols:
        col = F.col(c) if c in df.columns else F.lit(None).cast("string")
        if c in _CASTS:
            col = col.cast(_CASTS[c])
        out.append(col.alias(c))
    return df.select(out)


def _empty(spark: SparkSession, cols: list[str]) -> DataFrame:
    fields = [
        T.StructField(
            c,
            T.DoubleType() if _CASTS.get(c) == "double"
            else T.IntegerType() if c in _CASTS
            else T.StringType(),
        )
        for c in cols
    ]
    return spark.createDataFrame([], T.StructType(fields))


def _required(spark: SparkSession, dirpath: str, name: str, cols: list[str]) -> DataFrame:
    path = os.path.join(dirpath, name)
    if not os.path.exists(path):
        # reference: deserialize_gtfs_file -> Error::IoError (de.rs:28-33)
        raise FileNotFoundError(f"required GTFS file missing: {path}")
    return _read_csv(spark, path, cols)


def _optional(spark: SparkSession, dirpath: str, name: str, cols: list[str]) -> DataFrame:
    path = os.path.join(dirpath, name)
    if not os.path.exists(path):
        # reference: deserialize_optional_gtfs_file -> Ok(vec![]) (de.rs:45-57)
        return _empty(spark, cols)
    return _read_csv(spark, path, cols)


def _indexed_stops(spark: SparkSession, dirpath: str, offset: int) -> tuple[DataFrame, int]:
    """stops.txt with ``file_idx`` = file order + running multi-dir offset."""
    df = _required(spark, dirpath, "stops.txt", _STOPS_COLS)
    w = Window.orderBy("_mono")
    df = (
        df.withColumn("_mono", F.monotonically_increasing_id())
        .withColumn("file_idx", F.row_number().over(w) - 1 + F.lit(offset))
        .drop("_mono")
    )
    n = df.count()
    return df, offset + n


def load_gtfs_dirs(
    spark: SparkSession, dirs: list[str] | str, materialize: bool = True
) -> dict[str, DataFrame]:
    """Load one or more GTFS directories into the canonical table dict.

    Multi-feed union is ``unionByName`` in dir order; the dense stop index
    spans feeds (processor.rs:43-53, 389-393).

    ``materialize=True`` (default) localCheckpoints every table once
    loaded: the model build consumes each table from several downstream
    branches, and re-planning the raw CSV scans (especially the stops
    file-order window) per branch measured 3× slower end-to-end on the
    zhelez fixture. Set False when stop_times is too large for executor
    cache — then write the loaded tables to parquet/Iceberg (bronze) and
    re-read instead, which is the production shape anyway.
    """
    if isinstance(dirs, str):
        dirs = [dirs]
    if not dirs:
        raise ValueError("load_gtfs_dirs: at least one GTFS directory required")

    per_dir: dict[str, list[DataFrame]] = {k: [] for k in (
        "gtfs_stops", "gtfs_trips", "gtfs_stop_times", "gtfs_calendar",
        "gtfs_calendar_dates", "gtfs_transfers", "gtfs_feed_info",
    )}
    offset = 0
    for d in dirs:
        stops, offset = _indexed_stops(spark, d, offset)
        per_dir["gtfs_stops"].append(stops)
        per_dir["gtfs_trips"].append(_required(spark, d, "trips.txt", _TRIPS_COLS))
        per_dir["gtfs_stop_times"].append(
            _required(spark, d, "stop_times.txt", _STOP_TIMES_COLS)
        )
        per_dir["gtfs_calendar"].append(
            _required(spark, d, "calendar.txt", _CALENDAR_COLS)
        )
        per_dir["gtfs_calendar_dates"].append(
            _optional(spark, d, "calendar_dates.txt", _CALENDAR_DATES_COLS)
        )
        per_dir["gtfs_transfers"].append(
            _optional(spark, d, "transfers.txt", _TRANSFERS_COLS)
        )
        per_dir["gtfs_feed_info"].append(
            _optional(spark, d, "feed_info.txt", _FEED_INFO_COLS)
        )

    out = {}
    for name, parts in per_dir.items():
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        out[name] = df.localCheckpoint() if materialize else df
    return out
