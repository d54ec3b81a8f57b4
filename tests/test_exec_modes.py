"""Execution modes + hardware counters.

DEBUG mode = the reference's verification backend (CPULLVMDebugBackend,
LLVMBackends.cpp:939-1010): every operator's output is invariant-checked.
PERF mode = per-operator profile (the perf-record wrapping analogue).
utils/perf.py = PerfEvent (include/lingodb/utility/PerfEvent.h) via
perf_event_open, software-counter fallback on PMU-less VMs."""

import pytest


@pytest.fixture()
def dbg_session():
    import lingodb_tpu as ldb
    from lingodb_tpu.utils.settings import EXECUTION_MODE

    s = ldb.create_in_memory()
    s.sql_stmt("create table t (g int, v int, s varchar(8))")
    s.sql_stmt("insert into t values (1,10,'a'),(1,20,'b'),(2,30,'a'),"
               "(2,null,'c'),(3,5,null)")
    yield s, EXECUTION_MODE
    EXECUTION_MODE.set("DEFAULT")


QUERIES = [
    "select g, sum(v), count(*) from t group by g order by g",
    "select a.g, b.v from t a join t b on a.g = b.g where b.v > 10 order by a.g, b.v",
    "select g, v, rank() over (partition by g order by v) from t order by g, v",
    "select s, count(*) from t group by s order by s nulls first",
    "with recursive r(n) as (select 1 union all select n+1 from r where n<4)"
    " select sum(n) from r",
]


def test_debug_mode_queries_pass(dbg_session):
    s, mode = dbg_session
    mode.set("DEBUG")
    expected = [s.sql(q).format_rows() for q in QUERIES]
    mode.set("DEFAULT")
    plain = [s.sql(q).format_rows() for q in QUERIES]
    assert expected == plain


def test_debug_mode_catches_bad_output(dbg_session):
    """Force a broken operator result and check DEBUG flags it."""
    import numpy as np

    from lingodb_tpu.runtime.executor import ExecError
    from lingodb_tpu.runtime.vtable import VTable

    s, mode = dbg_session
    mode.set("DEBUG")
    ex = s.executor
    orig = ex._run_scan

    def broken(op):
        vt = orig(op)
        if vt.num_rows:
            first = next(iter(vt.cols))
            bad = dict(vt.cols)
            bad[first] = bad[first].take(np.zeros(1, np.int64))
            return VTable(bad, vt.num_rows)  # column length != num_rows
        return vt

    ex._run_scan = broken
    try:
        with pytest.raises(ExecError, match="DEBUG"):
            s.sql("select v, s from t order by v")
    finally:
        ex._run_scan = orig


def test_perf_mode_profile(dbg_session):
    s, mode = dbg_session
    mode.set("PERF")
    s.sql("select g, sum(v) from t group by g order by g")
    prof = s.executor.last_op_profile
    # name, self_ms, rows, incl_ms, bytes, sol_ratio
    assert prof and all(len(rec) == 6 for rec in prof)
    names = [rec[0] for rec in prof]
    assert any("Aggregate" in n or "Scan" in n for n in names)
    assert all(rec[4] >= 0 for rec in prof)  # bytes accounted per operator
    assert any(rec[4] > 0 for rec in prof)


def test_perf_event_counters():
    import numpy as np

    from lingodb_tpu.utils.perf import PerfEvent

    with PerfEvent() as pe:
        for _ in range(5):
            np.arange(500_000).sum()
    if not pe.supported:
        pytest.skip("perf_event_open unavailable in this kernel/container")
    assert any(v > 0 for v in pe.counters.values())
