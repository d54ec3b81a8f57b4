"""Standalone query artifacts (sql-to-artifact / run-artifact): the
reference's tools/standalone-query analogue. A cold process must execute a
packaged query without reparse/reoptimize and with every stage served from
the packaged executables (asserted: the compile cache gains no new entries)."""

import json
import os
import sqlite3
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# big enough that fused stages engage (device.SMALL_ROWS) so the artifact
# actually carries executables
_SF = 0.01
_Q = "queries/tpch/6.sql"


def _run(code: str, cache_dir: str) -> str:
    env = dict(os.environ)
    env["LINGODB_COMPILATION_CACHE"] = cache_dir
    env["LINGODB_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    return out.stdout


def test_artifact_round_trip_cold_process(tmp_path):
    art = str(tmp_path / "q6.lqa")
    build_cache = str(tmp_path / "cache_build")
    run_cache = str(tmp_path / "cache_run")
    db = str(tmp_path / "db")

    # builder process: create a db, build the artifact
    build = _run(f"""
import lingodb_tpu as ldb
from lingodb_tpu.tools import tpchgen
from lingodb_tpu.tools.artifact import build_artifact
s = ldb.connect_to_db({db!r})
tpchgen.load_into(s, sf={_SF})
s.close()
s = ldb.connect_to_db({db!r})
q = open({_Q!r}).read()
m = build_artifact(s, q, {art!r})
print("EXES", m["n_executables"])
print("REF", s.sql(q).format_rows())
""", build_cache)
    n_exes = int(build.split("EXES ")[1].split("\n")[0])
    assert n_exes > 0, "artifact carries no executables"
    ref_rows = build.split("REF ")[1].strip()

    with zipfile.ZipFile(art) as z:
        m = json.loads(z.read("manifest.json"))
        assert "select" in m["query"].lower()
        assert len([n for n in z.namelist() if n.startswith("xla/")]) == n_exes

    # cold process, EMPTY cache: run-artifact must produce the same rows AND
    # write nothing new to the compile cache (every stage is a cache hit)
    cold = _run(f"""
import os
import lingodb_tpu as ldb
from lingodb_tpu.tools.artifact import run_artifact
s = ldb.connect_to_db({db!r})
r = run_artifact(s, {art!r})
print("ROWS", r.format_rows())
cache = {run_cache!r}
import zipfile
packaged = set(os.path.basename(n) for n in zipfile.ZipFile({art!r}).namelist()
               if n.startswith("xla/"))
on_disk = set(os.listdir(cache))
print("NEW", sorted(on_disk - packaged))
""", run_cache)
    assert cold.split("ROWS ")[1].split("\nNEW")[0].strip() == ref_rows
    assert "NEW []" in cold, f"stages recompiled: {cold.split('NEW ')[1]}"


def test_artifact_rejects_stale_catalog(tmp_path, session):
    import lingodb_tpu as ldb
    from lingodb_tpu.tools.artifact import build_artifact, run_artifact

    db = str(tmp_path / "db2")
    s = ldb.connect_to_db(db)
    s.sql_stmt("create table t(a int)")
    s.sql_stmt("insert into t values (1),(2),(3)")
    art = str(tmp_path / "t.lqa")
    build_artifact(s, "select sum(a) from t", art)
    s.sql_stmt("insert into t values (4)")  # bump version
    with pytest.raises(ValueError, match="different table versions"):
        run_artifact(s, art)
    r = run_artifact(s, art, strict=False)
    assert r.format_rows() == [["10"]]


def test_artifact_matches_oracle(tmp_path):
    """Artifact execution path (run_plan) differentially vs sqlite."""
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import sqlite_oracle as so
    from lingodb_tpu.tools import tpchgen
    from lingodb_tpu.tools.artifact import build_artifact, run_artifact

    s = ldb.create_in_memory()
    tables = tpchgen.load_into(s, sf=0.002)
    conn = sqlite3.connect(":memory:")
    tpchgen.to_sqlite(conn, tables)
    sql = open(os.path.join(REPO, _Q)).read()
    art = str(tmp_path / "q.lqa")
    build_artifact(s, sql, art)
    ours = so.our_rows(run_artifact(s, art))
    theirs = so.run_sqlite(conn, sql)
    ok, msg = so.rows_equal(ours, theirs, ordered=True)
    assert ok, msg
