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
