"""JOB (join order benchmark) conformance: the reference's 113 query texts
run against generated IMDB-schema data with sqlite3 as differential oracle
(reference: test/sqlite-datasets/job.test against real IMDB dumps). All 113
queries run."""

import os
import sqlite3

import pytest

QDIR = "/root/reference/resources/sql/job"

SUBSET = sorted(
    f[:-4] for f in os.listdir(QDIR)
    if f.endswith(".sql") and f != "initialize.sql"
) if os.path.isdir(QDIR) else []

pytestmark = pytest.mark.skipif(
    not os.path.isdir(QDIR), reason="reference JOB queries not mounted")


@pytest.fixture(scope="module")
def job():
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import jobgen

    s = ldb.create_in_memory()
    tables = jobgen.load_into(s, sf=0.02)
    conn = sqlite3.connect(":memory:")
    jobgen.to_sqlite(conn, tables)
    return s, conn


@pytest.mark.parametrize("q", SUBSET)
def test_job_query(q, job):
    from lingodb_tpu.tools import sqlite_oracle as so

    s, conn = job
    sql = open(os.path.join(QDIR, f"{q}.sql")).read()
    ours = so.our_rows(s.sql(sql))
    theirs = so.run_sqlite(conn, sql)
    ok, msg = so.rows_equal(ours, theirs, ordered=False)
    assert ok, f"{q}: {msg}"
