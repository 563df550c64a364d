"""Real GTFS CSV loader vs the reference's own integration goldens.

The reference ships a real-city fixture (zhelez, 2.3 MB GTFS) and asserts
hard model-build numbers in ferrobus-core/tests/test_model_creation.rs:87-136:

  * no date filter:   194 stops, 18 internal routes, 34,860 stop_times
  * date 2024-05-01:  194 stops, 17 internal routes, 12,235 stop_times

Running the SAME files through load_gtfs_dirs + build_timetable and hitting
the SAME numbers is direct output parity with the reference engine — not
with our own oracle.
"""

from __future__ import annotations

import os

import pytest

from ferrobus_spark.model.gtfs import build_timetable
from ferrobus_spark.sources.gtfs_csv import load_gtfs_dirs

ZHELEZ = "/root/reference/tests/test-data/zhelez"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ZHELEZ), reason="reference zhelez fixture not present"
)


@pytest.fixture(scope="module")
def zhelez_tables(spark):
    return load_gtfs_dirs(spark, ZHELEZ)


def test_loader_raw_counts(zhelez_tables):
    assert zhelez_tables["gtfs_stops"].count() == 194
    assert zhelez_tables["gtfs_stop_times"].count() == 34860
    assert zhelez_tables["gtfs_calendar"].count() == 7
    # optional files absent in zhelez -> empty, not error (de.rs:45-57)
    assert zhelez_tables["gtfs_transfers"].count() == 0
    assert zhelez_tables["gtfs_feed_info"].count() == 0


def test_file_idx_is_file_order(zhelez_tables):
    rows = (
        zhelez_tables["gtfs_stops"]
        .orderBy("file_idx")
        .select("file_idx", "stop_id")
        .collect()
    )
    assert [r.file_idx for r in rows] == list(range(194))
    # first two stops.txt data rows (verified by eye against the file)
    assert rows[0].stop_id == "0"
    assert rows[1].stop_id == "8"


def test_model_goldens_no_date(spark, zhelez_tables):
    tt = build_timetable(spark, zhelez_tables, None)
    assert tt["stops_dim"].count() == 194
    assert tt["routes"].count() == 18  # test_model_creation.rs:90
    assert tt["stop_times"].count() == 34860


def test_model_goldens_date_filtered(spark, zhelez_tables):
    tt = build_timetable(spark, zhelez_tables, "2024-05-01")
    assert tt["stops_dim"].count() == 194
    assert tt["routes"].count() == 17  # test_model_creation.rs:118-120
    assert tt["stop_times"].count() == 12235


def test_multi_feed_union(spark):
    # loading the same dir twice = two feeds: stops concat with running
    # file_idx offset (processor.rs:43-53, 389-393)
    tabs = load_gtfs_dirs(spark, [ZHELEZ, ZHELEZ])
    stops = tabs["gtfs_stops"]
    assert stops.count() == 388
    idx = sorted(r.file_idx for r in stops.select("file_idx").collect())
    assert idx == list(range(388))
    assert tabs["gtfs_stop_times"].count() == 2 * 34860


def test_missing_required_file_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        load_gtfs_dirs(spark, str(tmp_path))
