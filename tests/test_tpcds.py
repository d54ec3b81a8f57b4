"""TPC-DS conformance: the reference's query texts
(/root/reference/resources/sql/tpcds/*.sql) run against generated data with
sqlite3 as differential oracle (reference runs the same queries in CI against
dsdgen data, .github/workflows: tpcdsSf1.test). All 103 queries run."""

import os
import sqlite3

import pytest

QDIR = "/root/reference/resources/sql/tpcds"

SUBSET = sorted(
    (f[:-4] for f in os.listdir(QDIR)
     if f.endswith(".sql") and f != "initialize.sql"),
    key=lambda q: (int("".join(c for c in q if c.isdigit())), q),
) if os.path.isdir(QDIR) else []

pytestmark = pytest.mark.skipif(
    not os.path.isdir(QDIR), reason="reference TPC-DS queries not mounted")


@pytest.fixture(scope="module")
def tpcds():
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import tpcdsgen

    s = ldb.create_in_memory()
    tables = tpcdsgen.load_into(s, sf=0.002)
    conn = sqlite3.connect(":memory:")
    tpcdsgen.to_sqlite(conn, tables)
    return s, conn


@pytest.mark.parametrize("q", SUBSET)
def test_tpcds_query(q, tpcds):
    from lingodb_tpu.tools import sqlite_oracle as so

    s, conn = tpcds
    sql = open(os.path.join(QDIR, f"{q}.sql")).read()
    ours = so.our_rows(s.sql(sql))
    if "rollup" in sql.lower():
        # sqlite has no GROUP BY ROLLUP: execution asserted here; rollup
        # SEMANTICS are differentially validated against the explicit
        # UNION ALL expansion in test_rollup_matches_expanded_union
        assert isinstance(ours, list)
        return
    theirs = so.run_sqlite(conn, sql)
    ok, msg = so.rows_equal(ours, theirs, ordered=True)
    assert ok, f"q{q}: {msg}"


def test_rollup_matches_expanded_union(tpcds):
    """GROUP BY ROLLUP must equal the explicit UNION ALL expansion (which
    sqlite can also run): validates the grouping-sets rewrite end to end."""
    from lingodb_tpu.tools import sqlite_oracle as so

    s, conn = tpcds
    rollup_sql = """
        SELECT i_category, i_class, SUM(i_current_price)
        FROM item GROUP BY ROLLUP(i_category, i_class)
        ORDER BY i_category NULLS LAST, i_class NULLS LAST"""
    expanded_sql = """
        SELECT i_category, i_class, SUM(i_current_price) AS s
        FROM item GROUP BY i_category, i_class
        UNION ALL
        SELECT i_category, NULL, SUM(i_current_price) FROM item GROUP BY i_category
        UNION ALL
        SELECT NULL, NULL, SUM(i_current_price) FROM item
        ORDER BY i_category NULLS LAST, i_class NULLS LAST"""
    ours = so.our_rows(s.sql(rollup_sql))
    theirs = so.run_sqlite(conn, expanded_sql)
    # the data contains genuine NULL group keys, which tie with rolled-up
    # subtotal rows under ORDER BY: compare as multisets
    ok, msg = so.rows_equal(ours, theirs, ordered=False)
    assert ok, msg


def test_grouping_function(tpcds):
    s, _conn = tpcds
    r = s.sql("""
        SELECT grouping(i_category), grouping(i_class), count(*)
        FROM item GROUP BY ROLLUP(i_category, i_class)
        ORDER BY 1, 2 LIMIT 1""")
    assert r.format_rows()[0][:2] == ["0", "0"]
