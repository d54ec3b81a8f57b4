"""Conformance: reference sqllogictest files (test/sqlite-small/*) run
unmodified against our runner (reference: src/tools/sqlite-tester.cpp)."""

import os

import pytest

REF = "/root/reference/test/sqlite-small"

SUITES = ["uni", "join", "groupby", "setops"]


@pytest.mark.parametrize("name", SUITES)
def test_suite(name, session):
    from lingodb_tpu.tester.runner import run_file

    stats = run_file(session, os.path.join(REF, f"{name}.test"), stop_on_error=True)
    assert stats.queries > 0
    assert stats.ok


def test_unnesting_suite(session):
    """General unnesting: the full DuckDB-derived correlated-subquery torture
    suite (aggregates over outer columns, multi-level nesting, subqueries in
    aggregate arguments and join conditions, LIMIT 0)."""
    from lingodb_tpu.tester.runner import run_file

    stats = run_file(
        session, os.path.join(REF, "unnesting.test"), stop_on_error=False
    )
    assert stats.queries == 104
    assert stats.ok, f"unnesting failures: {stats.failures[:5]}"


def test_python_udfs_suite(session):
    """Python-UDF conformance (reference: test/sqlite-small-python/
    python-udfs.test; string/date arguments decode to Python values, string
    results dictionary-encode, NULLs short-circuit)."""
    from lingodb_tpu.tester.runner import run_file

    path = "/root/reference/test/sqlite-small-python/python-udfs.test"
    if not os.path.exists(path):
        pytest.skip("reference python-udf suite not present")
    stats = run_file(session, path, stop_on_error=False)
    assert stats.queries == 9
    assert stats.ok, f"python-udf failures: {stats.failures[:5]}"
