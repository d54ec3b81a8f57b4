"""Multi-device SPMD correctness: the same TPC-H queries produce identical
results with base tables row-sharded over the 8-device CPU mesh as on a
single device (the sharded fused-aggregate path + GSPMD-inserted collectives
stand in for the reference's ThreadLocal+merge parallelism,
reference: ParallelizePass.cpp, PreAggregationHashtable.cpp)."""

import os
import sqlite3

import pytest

QDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "queries", "tpch")


@pytest.fixture(scope="module")
def meshed():
    import lingodb_tpu as ldb
    from lingodb_tpu.runtime import device as dv
    from lingodb_tpu.tools import tpchgen

    old_small, old_mesh, old_init = dv.SMALL_ROWS, dv._MESH, dv._MESH_INIT
    dv.SMALL_ROWS = 64
    dv._MESH, dv._MESH_INIT = None, False
    s = ldb.create_in_memory()
    tables = tpchgen.load_into(s, sf=0.002)
    assert dv.get_mesh() is not None
    conn = sqlite3.connect(":memory:")
    tpchgen.to_sqlite(conn, tables)
    yield s, conn
    dv.SMALL_ROWS, dv._MESH, dv._MESH_INIT = old_small, old_mesh, old_init


@pytest.mark.parametrize("q", list(range(1, 23)))
def test_mesh_query_matches_oracle(q, meshed):
    from lingodb_tpu.tools import sqlite_oracle as so

    s, conn = meshed
    sql = open(os.path.join(QDIR, f"{q}.sql")).read()
    ours = so.our_rows(s.sql(sql))
    theirs = so.run_sqlite(conn, sql)
    ok, msg = so.rows_equal(ours, theirs, ordered=True)
    assert ok, f"Q{q}: {msg}"
