"""Fused-pipeline coverage: with the device threshold lowered, the
Scan -> joins -> Select/Map -> Aggregate spine compiles into one program
(dimension joins as unique-key binary-search lookups, general grouping via
in-program sort + padded outputs). Results must match the sqlite oracle and
the fused path must actually engage (guards against silent eager fallback)."""

import os
import sqlite3

import pytest

QDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "queries", "tpch")

# queries where the fused pipeline engages (all 22: single-join spine +
# broadcast scalars, materialized Tmp/aggregate bases, groupjoin rewrite for
# Q13, distinct split for Q16, any_value for FD-reduced group keys)
FUSED = list(range(1, 23))


@pytest.fixture(scope="module")
def fused_session():
    import lingodb_tpu as ldb
    from lingodb_tpu.runtime import device as dv
    from lingodb_tpu.tools import tpchgen

    old = dv.SMALL_ROWS
    dv.SMALL_ROWS = 64
    s = ldb.create_in_memory()
    tables = tpchgen.load_into(s, sf=0.005)
    conn = sqlite3.connect(":memory:")
    tpchgen.to_sqlite(conn, tables)
    yield s, conn
    dv.SMALL_ROWS = old


@pytest.mark.parametrize("q", FUSED)
def test_fused_query_matches_oracle(q, fused_session):
    import lingodb_tpu.runtime.executor as ex
    from lingodb_tpu.tools import sqlite_oracle as so

    s, conn = fused_session
    hits = []
    orig = ex.Executor._try_fused_agg

    def spy(self, op, epi=None):
        r = orig(self, op, epi=epi)
        hits.append(r is not None)
        return r

    ex.Executor._try_fused_agg = spy
    try:
        sql = open(os.path.join(QDIR, f"{q}.sql")).read()
        ours = so.our_rows(s.sql(sql))
    finally:
        ex.Executor._try_fused_agg = orig
    theirs = so.run_sqlite(conn, sql)
    ok, msg = so.rows_equal(ours, theirs, ordered=True)
    assert ok, f"Q{q}: {msg}"
    assert any(hits), f"Q{q}: fused pipeline did not engage"
