"""Transit SQL-oracle generator: kernel parity + stated assumptions.

The driver-gate comparison itself lives in test_driver_contract.py
(Spark query vs generated DuckDB SQL). These tests pin the generator's
documented assumptions independently of Spark:

* the range oracle uses the ALL-TARGETS RAPTOR formulation; assert that
  the target-pruned kernel (what the Spark query runs per departure)
  agrees with the all-targets run at the egress stop for every
  (pair, departure) the range query enumerates;
* the SQL recomputes routing in DuckDB and matches the pure-Python
  reference twin end-to-end (matrix + range rows);
* generation is deterministic (the driver may call oracle_sql() in a
  separate process from queries()).
"""

import duckdb
import pytest

from ferrobus_spark import transit_oracle_sql as tq

O = tq._pyoracle()


@pytest.fixture(scope="module")
def ctx():
    return tq._ctx()


def test_target_pruned_equals_all_targets(ctx):
    model, _rs, _st, _tr, pts = ctx
    lo, hi = 7 * 3600, 9 * 3600
    checked = 0
    for _pid, o, d in [(0, 0, 5), (1, 2, 8), (2, 1, 11)]:
        so, sd = pts[o], pts[d]
        a_stop, a_secs = so.nearest_stops[0]
        e_stop, _ = sd.nearest_stops[0]
        for dep in O.source_departures(model, a_stop, lo + a_secs, hi + a_secs):
            bt, kt = O.raptor(model, a_stop, e_stop, dep, 3)
            ba, ka = O.raptor(model, a_stop, None, dep, 3)
            assert bt[e_stop] == ba[e_stop], (o, d, dep)
            if bt[e_stop] != O.INF:
                assert kt[e_stop] == ka[e_stop], (o, d, dep)
            checked += 1
    assert checked >= 30


def test_matrix_sql_matches_python_twin(ctx):
    model, _rs, _st, _tr, pts = ctx
    got = {
        (int(a), int(b)): int(c)
        for a, b, c in duckdb.sql(tq.matrix_oracle_sql()).fetchall()
    }
    pids = sorted(pts)
    exp = {}
    for o in pids:
        res = O.one_to_many(model, pts[o], [pts[d] for d in pids], 8 * 3600, 3)
        for d, r in zip(pids, res):
            if r is not None:
                exp[(o, d)] = r["travel_time"]
    assert got == exp and len(got) > 0


def test_range_sql_matches_python_twin(ctx):
    model, _rs, _st, _tr, pts = ctx
    got = sorted(
        tuple(bool(x) if isinstance(x, bool) else int(x) for x in row)
        for row in duckdb.sql(tq.range_oracle_sql()).fetchall()
    )
    exp = []
    for pid, o, d in [(0, 0, 5), (1, 2, 8), (2, 1, 11)]:
        js = O.range_routing(model, pts[o], pts[d], (7 * 3600, 9 * 3600), 3)
        kept = {id(j) for j in O.pareto_filter(js)}
        for j in js:
            exp.append((
                pid, j["departure_time"], j["arrival_time"], j["travel_time"],
                j["transfers"], j["walking_time"], id(j) in kept,
            ))
    assert got == sorted(exp) and len(got) > 0
    assert any(row[-1] is False or row[-1] == False for row in got)  # noqa: E712


def test_iso_sql_matches_python_twin(ctx):
    model = ctx[0]
    index = tq._grid()
    origin = tq._iso_origin()
    got = sorted(int(c) for _, _, c in duckdb.sql(tq.isochrone_oracle_sql()).fetchall())
    exp = sorted(O.isochrone_cells(model, index, origin, 8 * 3600, 3, 1800))
    assert got == exp and len(got) >= 3


def test_percent_sql_matches_python_twin(ctx):
    model = ctx[0]
    index = tq._grid()
    origin = tq._iso_origin()
    got = {
        int(c): float(p)
        for _, c, p in duckdb.sql(tq.percent_access_oracle_sql()).fetchall()
    }
    exp = O.percent_access(
        model, index, origin, (7 * 3600, 7 * 3600 + 3600), 1200, 3, 1800
    )
    assert got == {int(c): float(p) for c, p in exp.items()} and len(got) > 0


def test_generation_deterministic():
    assert tq.matrix_oracle_sql() == tq.matrix_oracle_sql()
    assert tq.range_oracle_sql() == tq.range_oracle_sql()
