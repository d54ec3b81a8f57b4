"""Persistent hash-index payloads: CREATE INDEX writes `<index>.idx`, and a
reopened database LOADS the payload instead of rebuilding it (reference:
src/runtime/LingoDBHashIndex.cpp — file-backed index, flushed on append,
loaded on open)."""

import os

import numpy as np


def _reset_stats():
    from lingodb_tpu.storage import hashindex as hx

    for k in hx.STATS:
        hx.STATS[k] = 0


def test_index_payload_persists_and_reloads(tmp_path):
    import lingodb_tpu as ldb
    from lingodb_tpu.storage import hashindex as hx

    db = str(tmp_path / "db")
    s = ldb.connect_to_db(db)
    s.sql_stmt("create table orders(okey bigint, cust int)")
    rows = ",".join(f"({i * 3 + 7},{i % 50})" for i in range(2000))
    s.sql_stmt(f"insert into orders values {rows}")
    s.sql_stmt("create table lines(okey bigint, qty int)")
    lrows = ",".join(f"({(i * 7) % 6000},{i % 9})" for i in range(4000))
    s.sql_stmt(f"insert into lines values {lrows}")
    _reset_stats()
    s.sql_stmt("create index orders_pk on orders(okey)")
    assert hx.STATS["builds"] == 1 and hx.STATS["saves"] == 1
    assert os.path.exists(os.path.join(db, "orders_pk.idx"))
    expected = s.sql(
        "select l.okey, sum(l.qty) s from lines l, orders o "
        "where l.okey = o.okey group by l.okey order by l.okey").format_rows()
    s.close()

    # reopen: the payload must LOAD, not rebuild
    s2 = ldb.connect_to_db(db)
    _reset_stats()
    got = s2.sql(
        "select l.okey, sum(l.qty) s from lines l, orders o "
        "where l.okey = o.okey group by l.okey order by l.okey").format_rows()
    assert got == expected and len(got) > 100
    assert hx.STATS["loads"] >= 1, "persisted payload was not consumed"
    assert hx.STATS["builds"] == 0, "index was rebuilt despite .idx file"
    s2.close()


def test_index_payload_refreshes_on_append(tmp_path):
    import lingodb_tpu as ldb
    from lingodb_tpu.storage import hashindex as hx

    db = str(tmp_path / "db")
    s = ldb.connect_to_db(db)
    s.sql_stmt("create table t(k int, v int)")
    s.sql_stmt("insert into t values (1,10),(2,20),(3,30)")
    s.sql_stmt("create index t_k on t(k)")
    s.sql_stmt("insert into t values (4,40)")  # payload now stale
    s.close()  # save() must rewrite the payload at the new row count
    p = hx.load(os.path.join(db, "t_k.idx"))
    assert p is not None and p["rows"] == 4
    assert p["kind"] == "dense"
    lut = np.asarray(p["lut"])
    assert lut[4 - p["kmin"]] == 3  # key 4 -> row 3


def test_sorted_payload_for_duplicate_keys(tmp_path):
    import lingodb_tpu as ldb
    from lingodb_tpu.storage import hashindex as hx

    db = str(tmp_path / "db")
    s = ldb.connect_to_db(db)
    s.sql_stmt("create table d(k int, v int)")
    s.sql_stmt("insert into d values (5,1),(5,2),(9,3)")
    s.sql_stmt("create index d_k on d(k)")
    s.close()
    p = hx.load(os.path.join(db, "d_k.idx"))
    assert p is not None and p["kind"] == "sorted"
    assert list(p["keys"]) == [5, 5, 9]
