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
    """General unnesting: most of the DuckDB-derived correlated-subquery
    torture suite passes; the aggregate-over-outer-column family is a known
    gap (tracked for a later round)."""
    from lingodb_tpu.tester.runner import run_file

    stats = run_file(
        session, os.path.join(REF, "unnesting.test"), stop_on_error=False
    )
    passed = stats.queries - len(stats.failures)
    assert passed >= 80, f"unnesting regressed: {passed}/{stats.queries} passed"
