"""Large non-equi joins: blockwise nested-loop driver.

Round-1 raised "non-equi join too large" past 2^26 candidate pairs; the
reference nested-loops any size morsel-wise. The chunked driver processes
the left side in 2^26/nr-row blocks against the whole right side. Differential
check vs sqlite on ~72M-pair inputs across join kinds."""

import sqlite3

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env():
    import pyarrow as pa

    import lingodb_tpu as ldb

    rng = np.random.default_rng(3)
    na, nb = 9000, 8000  # 72M pairs > 2^26
    ax = rng.integers(0, 1000, na).astype("int64")
    av = rng.integers(0, 50, na).astype("int64")
    by = rng.integers(0, 1000, nb).astype("int64")
    bv = rng.integers(0, 50, nb).astype("int64")

    s = ldb.create_in_memory()
    s.add_table("a", pa.table({"x": pa.array(ax), "av": pa.array(av)}))
    s.add_table("b", pa.table({"y": pa.array(by), "bv": pa.array(bv)}))

    con = sqlite3.connect(":memory:")
    con.execute("create table a(x int, av int)")
    con.executemany("insert into a values (?,?)",
                    [(int(p), int(q)) for p, q in zip(ax, av)])
    con.execute("create table b(y int, bv int)")
    con.executemany("insert into b values (?,?)",
                    [(int(p), int(q)) for p, q in zip(by, bv)])
    yield s, con
    con.close()


def _both(env, q):
    s, con = env
    ours = [tuple(r) for r in s.sql(q).to_pylist()]
    theirs = [tuple(r) for r in con.execute(q).fetchall()]
    return ours, theirs


def test_chunked_inner_band_join(env):
    q = ("select count(*), sum(a.av + b.bv) from a, b"
         " where a.x < b.y and b.y - a.x < 3")
    ours, theirs = _both(env, q)
    assert ours == theirs


def test_chunked_semi_and_anti(env):
    q = ("select count(*) from a where exists"
         " (select 1 from b where b.y > a.x + 990)")
    ours, theirs = _both(env, q)
    assert ours == theirs
    q = ("select count(*) from a where not exists"
         " (select 1 from b where b.y > a.x + 990)")
    ours, theirs = _both(env, q)
    assert ours == theirs


def test_chunked_left_join(env):
    q = ("select a.x, count(b.bv) from a left join b"
         " on b.y = a.x + 1 and b.bv < 2 and b.y > 997"
         " group by a.x order by a.x")
    # the ON clause mixes an equi term with a.x inside arithmetic — binder
    # keeps it non-equi; >2^26 pairs
    ours, theirs = _both(env, q)
    assert sorted(ours) == sorted(theirs)


def test_chunked_full_join(env):
    q = ("select count(*) from a full outer join b"
         " on b.y - a.x = 500 and a.av > 45 and b.bv > 45")
    ours, theirs = _both(env, q)
    assert ours == theirs
