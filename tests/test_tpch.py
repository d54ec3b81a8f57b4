"""TPC-H correctness: all 22 reference query texts
(reference: resources/sql/tpch/*.sql) on generated spec-shaped data,
differentially tested against sqlite3 (reference CI instead checks against
stored result hashes from dbgen data, which needs network access)."""

import os
import sqlite3

import pytest

QDIR = "/root/reference/resources/sql/tpch"
SF = float(os.environ.get("TPCH_TEST_SF", "0.005"))


@pytest.fixture(scope="module")
def tpch():
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import tpchgen

    s = ldb.create_in_memory()
    tables = tpchgen.load_into(s, sf=SF)
    conn = sqlite3.connect(":memory:")
    tpchgen.to_sqlite(conn, tables)
    return s, conn


@pytest.mark.parametrize("q", list(range(1, 23)))
def test_tpch_query(q, tpch):
    from lingodb_tpu.tools import sqlite_oracle as so

    s, conn = tpch
    sql = open(os.path.join(QDIR, f"{q}.sql")).read()
    res = s.sql(sql)
    ours = so.our_rows(res)
    theirs = so.run_sqlite(conn, sql)
    ok, msg = so.rows_equal(ours, theirs, ordered=True)
    assert ok, f"Q{q}: {msg}"
