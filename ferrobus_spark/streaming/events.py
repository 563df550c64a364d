"""Structured Streaming operators.

The reference is strictly batch (SURVEY §2.8) — no watermarks or state
stores anywhere in the crate — so streaming here serves the graft's
ingestion story: pages/events arriving continuously, windowed rollups
with late-data handling, and a stateful per-key session operator. All
readers are file sources so tests drive them with ``availableNow``
triggers against the driver-provided parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, path_dir: str) -> DataFrame:
    """File-source stream over events parquet files."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window counts per event type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based) — the streaming twin of the
    batch ``events_sessionize`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stateful_first_seen(events: DataFrame) -> DataFrame:
    """Custom stateful operator: first event per user, exactly once.

    ``applyInPandasWithState``: per-user state records whether the user
    has been emitted; later events (across micro-batches) are dropped.
    The streaming building block for streaming dedup / new-entity
    detection over the pages firehose.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id BIGINT, first_ts TIMESTAMP, first_event_id BIGINT"
    state_schema = "seen BOOLEAN"

    def fn(key, pdf_iter, state: GroupState):
        if state.exists and state.get[0]:
            for _ in pdf_iter:
                pass
            return
        best = None
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            head = pdf.iloc[0]
            if best is None or (head["ts"], head["event_id"]) < (best["ts"], best["event_id"]):
                best = head
        if best is not None:
            state.update((True,))
            yield pd.DataFrame({
                "user_id": [key[0]],
                "first_ts": [best["ts"]],
                "first_event_id": [int(best["event_id"])],
            })

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def url_first_seen(pages: DataFrame) -> DataFrame:
    """Streaming crawl-frontier dedup: first fetch per CANONICAL url.

    The pages firehose re-crawls the same resource under case/port/
    fragment variants; keying the state store on
    ``functions.urls.canonical_url_col`` collapses them and emits
    exactly one row per canonical url: FIRST-ARRIVAL semantics — the
    earliest (warc_ts, url) among batches seen before the key's first
    emission. A later micro-batch carrying an earlier warc_ts (late
    data) cannot retract the emitted row; hold state open behind a
    watermark/timeout before emitting if exact earliest-ever matters.
    Same state shape as :func:`stateful_first_seen`, keyed by a
    derived column."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ferrobus_spark.functions.urls import canonical_url_col

    canon = pages.withColumn("canon_url", canonical_url_col(F.col("url")))
    out_schema = "canon_url STRING, first_ts TIMESTAMP, first_url STRING"
    state_schema = "seen BOOLEAN"

    def fn(key, pdf_iter, state: GroupState):
        if state.exists and state.get[0]:
            for _ in pdf_iter:
                pass
            return
        best = None
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["warc_ts", "url"])
            head = pdf.iloc[0]
            if best is None or (head["warc_ts"], head["url"]) < (
                best["warc_ts"], best["url"]
            ):
                best = head
        if best is not None:
            state.update((True,))
            yield pd.DataFrame({
                "canon_url": [key[0]],
                "first_ts": [best["warc_ts"]],
                "first_url": [best["url"]],
            })

    return canon.groupBy("canon_url").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> list:
    """Drain a file stream with the availableNow trigger into memory;
    returns the collected rows (test/bench harness helper)."""
    session = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return session.sql(f"SELECT * FROM {query_name}").collect()


DOCS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def read_pages_stream(spark: SparkSession, path_dir: str) -> DataFrame:
    """File-source stream over documents parquet, with the page columns
    (warc_ts, lon, lat) derived by the SAME shared expressions as the
    batch pages table (sources/pages.py) — the streaming ingestion twin
    of the crawl feed."""
    from ferrobus_spark.functions.geo import lonlat_cols
    from ferrobus_spark.sources.pages import warc_ts_col

    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_dir)
    )
    lon, lat = lonlat_cols("doc_id")
    return docs.select(
        "doc_id",
        warc_ts_col("doc_id").alias("warc_ts"),
        lon.alias("lon"),
        lat.alias("lat"),
    )


def streaming_tile_counts(
    pages: DataFrame, window: str = "1 hour", watermark: str = "1 day"
) -> DataFrame:
    """Watermarked per-tile ingestion heat map — the streaming twin of
    the batch ``tile_histogram`` headline query: hex cell (res 9, shared
    codegen SQL) per page, tumbling-window counts per (window, cell) as
    the crawl arrives, late fetches admitted inside the watermark. The
    cell derivation stays whole-stage-codegen inside the stream's
    stateful agg; state is keyed (window, cell), so hot cells shard
    across the shuffle like the batch plan's skewed agg."""
    from ferrobus_spark.registry import CELL_REF_SQL

    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            F.expr(CELL_REF_SQL).alias("cell"),
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            "cell",
            "n_pages",
        )
    )
