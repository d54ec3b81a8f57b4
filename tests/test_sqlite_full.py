"""Full sqlite sqllogictest conformance: the reference's big generated suites
(test/sqlite/select*.test — 999 to 3319 queries each, plus the 64-table-join
select5 family) run unmodified through the runner (reference:
src/tools/sqlite-tester.cpp, CI workflow sqliteTests). These are the largest
conformance sweeps in the repo; select5-* additionally stress the join-order
optimizer (up to 64-relation components → GOO path)."""

import os

import pytest

REF = "/root/reference/test/sqlite"

SUITES = [
    "select1", "select2", "select3", "select4",
    "select5-1", "select5-2", "select5-3", "select5-4", "select5-5",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference sqlite suites not mounted")


@pytest.mark.parametrize("name", SUITES)
def test_suite(name, session):
    from lingodb_tpu.tester.runner import run_file

    stats = run_file(session, os.path.join(REF, f"{name}.test"),
                     stop_on_error=False)
    assert stats.queries > 0
    assert stats.ok, f"{name} failures: {stats.failures[:3]}"


def test_c_udf_suite(session):
    """C-UDF conformance (reference: test/sqlite-small/udf.test): CREATE
    FUNCTION ... LANGUAGE C compiles via the host toolchain and runs
    vectorized."""
    from lingodb_tpu.tester.runner import run_file

    path = "/root/reference/test/sqlite-small/udf.test"
    stats = run_file(session, path, stop_on_error=False)
    assert stats.queries > 0
    assert stats.ok, f"udf failures: {stats.failures[:3]}"
