"""Smoke: every rows-only (no-oracle) registry query runs and returns rows.

The transit_* queries are excluded here — their exactness is covered by
the dedicated oracle suites and they rebuild the model (minutes).
"""

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

ROWS_ONLY = sorted(
    name
    for name in set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    if not name.startswith("transit_")  # transit exactness → oracle suites
)


def test_every_query_carries_an_oracle():
    """Since round 4 the rows-only set is empty by construction — every
    registered query is hash-gated. Regressing a query to rows-only
    should be a deliberate, visible act."""
    assert set(entry_mod.queries()) == set(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    rows = df.limit(20000).collect()
    assert df.schema is not None
    if name not in ("minhash_dup_pairs", "simhash_near_pairs", "embedding_neardup_pairs"):
        # pair-finders may legitimately be empty on a dup-free corpus
        assert len(rows) > 0, name
