"""End-to-end queries with the Pallas substrate forced on (interpret mode):
the same TPC-H results must come out with kernels on and off."""

import numpy as np
import pytest

from lingodb_tpu.ops import pgather


@pytest.fixture()
def pallas_session(monkeypatch):
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import tpchgen

    monkeypatch.setattr(pgather, "INTERPRET", True)
    monkeypatch.setattr(pgather, "FORCE_PALLAS", True)
    monkeypatch.setattr(pgather, "MIN_N", 1)  # tiny test data hits kernels
    s = ldb.create_in_memory()
    tpchgen.load_into(s, sf=0.005)
    return s


@pytest.fixture(scope="module")
def baseline_session():
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import tpchgen

    s = ldb.create_in_memory()
    tpchgen.load_into(s, sf=0.005)
    return s


# q1: fused agg; q6: scan filter; q14: fused join + compaction path;
# q3: eager joins + select_mask compaction; q4: semi join
@pytest.mark.parametrize("q", [1, 3, 4, 6, 14])
def test_tpch_pallas_matches(q, pallas_session, baseline_session):
    text = open(f"queries/tpch/{q}.sql").read()
    got = pallas_session.sql(text).format_rows()
    want = baseline_session.sql(text).format_rows()
    assert got == want


def test_sorted_cols_declared(baseline_session):
    st = baseline_session.catalog.get_table("lineitem").storage
    assert "l_orderkey" in st.sorted_cols
    st2 = baseline_session.catalog.get_table("orders").storage
    assert "o_orderkey" in st2.sorted_cols


def test_append_clears_broken_sort_order(baseline_session):
    import lingodb_tpu as ldb

    s = ldb.create_in_memory()
    s.sql_stmt("CREATE TABLE t(a INT)")
    s.sql_stmt("INSERT INTO t VALUES (1), (2), (3)")
    st = s.catalog.get_table("t").storage
    st.sorted_cols = ("a",)
    s.sql_stmt("INSERT INTO t VALUES (10)")  # still ascending
    assert st.sorted_cols == ("a",)
    s.sql_stmt("INSERT INTO t VALUES (5)")  # breaks order
    assert st.sorted_cols == ()
