"""Boundary pin for the sessionize gap test (registry_ext.q_events_sessionize).

The sf1.0 sweep exposed a whole-second-vs-fractional divergence: a gap of
1800.5 s is a session break under microsecond semantics but NOT under
truncated unix_timestamp() seconds (1800 > 1800 is false). This test plants
gaps at 1799.5 s / 1800.5 s / exactly 1800 s and checks both the absolute
session counts and exact parity with the DuckDB oracle SQL on the same
parquet — so neither side can silently regress to whole-second truncation.
"""

import datetime as dt

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(tmp_path):
    # user 1: gap 1800.5s -> 2 sessions; user 2: gap 1799.5s -> 1 session;
    # user 3: gap exactly 1800s -> 1 session (break requires STRICTLY > 30min).
    rows = [
        (1, 1, T0),
        (2, 1, T0 + dt.timedelta(seconds=1800, microseconds=500000)),
        (3, 2, T0),
        (4, 2, T0 + dt.timedelta(seconds=1799, microseconds=500000)),
        (5, 3, T0),
        (6, 3, T0 + dt.timedelta(seconds=1800)),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    # Spark cannot read TIMESTAMP(NANOS); match the generator's micros.
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path, index=False)
    return tmp_path


def test_sessionize_subsecond_boundary(spark, tmp_path):
    sf_dir = _mk_events(tmp_path)
    got = (
        entry_mod.queries()["events_sessionize"](spark, str(sf_dir))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["n_sessions"].tolist() == [2, 1, 1]
    assert got["n_events"].tolist() == [2, 2, 2]

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    exp = (
        con.sql(entry_mod.oracle_sql()["events_sessionize"])
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert exp["n_sessions"].tolist() == got["n_sessions"].tolist()
    assert exp["n_events"].tolist() == got["n_events"].tolist()
