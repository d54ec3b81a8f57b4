"""Isolated Python-UDF execution (runtime/sandbox.py).

The reference runs python UDFs in per-worker CPython sub-interpreters
(Scheduler.cpp:941-954) and optionally a WASM runtime (WASM.cpp:25-60) so
user code cannot take down the engine; here the same guarantee comes from a
persistent worker process. These tests check correct results under
isolation, that a crashing UDF surfaces as an error (not an engine crash),
and that the worker recovers for subsequent calls."""

import pytest


@pytest.fixture()
def iso_session():
    import lingodb_tpu as ldb

    s = ldb.create_in_memory()
    s.sql_stmt("create table t (i int not null)")
    s.sql_stmt("insert into t values (1),(2),(3),(4)")
    s.sql_stmt("set udf_isolation = 'process'")
    yield s
    s.sql_stmt("set udf_isolation = 'none'")
    from lingodb_tpu.runtime import sandbox

    if sandbox._GLOBAL_WORKER is not None:
        sandbox._GLOBAL_WORKER.close()


def test_isolated_udf_results(iso_session):
    s = iso_session
    s.sql_stmt("create function triple(x int) returns int as $$\n"
               "def triple(x):\n    return x * 3\n$$ language python")
    assert [r[0] for r in s.sql("select triple(i) from t order by i").to_pylist()] \
        == [3, 6, 9, 12]
    # vectorized numpy path inside the worker too
    s.sql_stmt("create function sq(x int) returns int as $$\n"
               "def sq(x):\n    return x ** 2\n$$ language python")
    assert [r[0] for r in s.sql("select sq(i) from t order by i").to_pylist()] \
        == [1, 4, 9, 16]


def test_udf_crash_is_contained(iso_session):
    """A UDF that kills its process must raise, not kill the engine; the
    worker restarts transparently for the next call."""
    s = iso_session
    s.sql_stmt("create function boom(x int) returns int as $$\n"
               "def boom(x):\n"
               "    import os\n    os._exit(3)\n$$ language python")
    with pytest.raises(Exception, match="worker"):
        s.sql("select boom(i) from t")
    # engine still alive, non-UDF queries fine
    assert s.sql("select count(*) from t").format_rows() == [["4"]]
    # and the worker comes back for the next UDF call
    s.sql_stmt("create function ok(x int) returns int as $$\n"
               "def ok(x):\n    return x + 7\n$$ language python")
    assert [r[0] for r in s.sql("select ok(i) from t order by i").to_pylist()] \
        == [8, 9, 10, 11]


def test_udf_exception_reported(iso_session):
    s = iso_session
    s.sql_stmt("create function bad(x int) returns int as $$\n"
               "def bad(x):\n    raise ValueError('nope')\n$$ language python")
    with pytest.raises(Exception, match="nope"):
        s.sql("select bad(i) from t")
    assert s.sql("select count(*) from t").format_rows() == [["4"]]
