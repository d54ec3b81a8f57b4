"""SF1-scale TPC-H correctness sweep (run with `pytest -m sf1`).

Tiny-SF conformance cannot catch overflow/cardinality/capacity cliffs that
only appear at realistic row counts (the class of bug behind round 2's SF10
outliers). This sweep runs all 22 TPC-H queries at SF1 (~6M lineitem rows)
through the full engine on the virtual 8-device mesh and checks every result
against an indexed sqlite oracle. Deselected by default (pytest.ini
addopts); the whole module is one session fixture so data generation and
oracle load happen once."""

import os
import sqlite3
import time

import pytest

pytestmark = pytest.mark.sf1

QDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "queries", "tpch")

# join/filter keys: without these the sqlite oracle, not the engine, is the
# 30-minute-budget risk (q21-style correlated EXISTS is quadratic unindexed)
_ORACLE_INDEXES = [
    "create index li_ok on lineitem(l_orderkey)",
    "create index li_pk on lineitem(l_partkey)",
    "create index li_sk on lineitem(l_suppkey)",
    "create index o_ok on orders(o_orderkey)",
    "create index o_ck on orders(o_custkey)",
    "create index c_ck on customer(c_custkey)",
    "create index p_pk on part(p_partkey)",
    "create index s_sk on supplier(s_suppkey)",
    "create index ps_pk on partsupp(ps_partkey, ps_suppkey)",
]


@pytest.fixture(scope="module")
def sf1():
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import tpchgen

    s = ldb.create_in_memory()
    t0 = time.time()
    tables = tpchgen.load_into(s, sf=1.0)
    conn = sqlite3.connect(":memory:")
    tpchgen.to_sqlite(conn, tables)
    for ddl in _ORACLE_INDEXES:
        conn.execute(ddl)
    conn.commit()
    print(f"\n# sf1 setup {time.time() - t0:.0f}s")
    return s, conn


@pytest.mark.parametrize("q", list(range(1, 23)))
def test_sf1_query(q, sf1):
    from lingodb_tpu.tools import sqlite_oracle as so

    s, conn = sf1
    sql = open(os.path.join(QDIR, f"{q}.sql")).read()
    t0 = time.time()
    ours = so.our_rows(s.sql(sql))
    t1 = time.time()
    theirs = so.run_sqlite(conn, sql)
    print(f"# q{q}: engine {t1 - t0:.1f}s oracle {time.time() - t1:.1f}s")
    ok, msg = so.rows_equal(ours, theirs, ordered=True)
    assert ok, f"Q{q}: {msg}"
