"""Distributed shuffle execution: keyed repartition joins and two-round
combiner aggregation over the 8-device CPU mesh, differentially checked
against sqlite (reference: ParallelizePass.cpp:34-97 state partitioning,
PreAggregationHashtable.cpp partitioned merge). Also asserts the shuffle
path actually ran (STATS) and that its collective program moves rows with
all-to-all rather than replicating a side (HLO inspection)."""

import sqlite3

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env():
    import pyarrow as pa

    import lingodb_tpu as ldb
    from lingodb_tpu.runtime import device as dv
    from lingodb_tpu.utils.settings import set_setting

    old_small, old_mesh, old_init = dv.SMALL_ROWS, dv._MESH, dv._MESH_INIT
    dv.SMALL_ROWS = 16
    dv._MESH, dv._MESH_INIT = None, False
    set_setting("system.shuffle_min_rows", 32)

    s = ldb.create_in_memory()
    rng = np.random.default_rng(7)
    n, m = 6000, 900
    okey = rng.integers(0, m, n).astype("int64")
    qty = rng.integers(1, 50, n).astype("int64")
    # NULLs in a key column exercise strict-key semantics through the shuffle
    null_every = 97
    okey_null = okey.copy().astype(object)
    okey_null[::null_every] = None
    flag = rng.choice(["A", "B", "C"], n)
    s.add_table("lines", pa.table({
        "okey": pa.array(list(okey_null), type=pa.int64()),
        "qty": pa.array(qty), "flag": pa.array(flag)}))
    cust = rng.integers(0, 300, m).astype("int64")
    s.add_table("orders", pa.table({
        "okey": pa.array(np.arange(m, dtype="int64")), "cust": pa.array(cust)}))
    assert dv.get_mesh() is not None

    con = sqlite3.connect(":memory:")
    con.execute("create table lines(okey int, qty int, flag text)")
    con.executemany("insert into lines values (?,?,?)", [
        (None if o is None else int(o), int(q), str(f))
        for o, q, f in zip(okey_null, qty, flag)])
    con.execute("create table orders(okey int, cust int)")
    con.executemany("insert into orders values (?,?)",
                    [(int(i), int(c)) for i, c in enumerate(cust)])
    yield s, con
    dv.SMALL_ROWS, dv._MESH, dv._MESH_INIT = old_small, old_mesh, old_init
    set_setting("system.shuffle_min_rows", 1 << 16)


def _check(env, q, expect_stats=None):
    from lingodb_tpu.parallel import shuffle as sh
    from lingodb_tpu.tools import sqlite_oracle as so

    s, con = env
    for k in sh.STATS:
        sh.STATS[k] = 0
    ours = so.our_rows(s.sql(q))
    theirs = con.execute(q).fetchall()
    ok, msg = so.rows_equal(ours, theirs, ordered=False)
    assert ok, f"{q}: {msg}"
    if expect_stats:
        for k, v in expect_stats.items():
            assert sh.STATS[k] >= v, f"{k}: {sh.STATS[k]} < {v} for {q}"


def test_sharded_inner_join_groupby(env):
    _check(env, "select l.okey, sum(l.qty) from lines l, orders o "
                "where l.okey = o.okey group by l.okey",
           {"joins": 1, "groupbys": 1, "exchanges": 3})


def test_sharded_semi_join(env):
    _check(env, "select count(*) from (select * from lines l where l.okey in "
                "(select okey from orders where cust < 150)) t")


def test_sharded_anti_join_null_keys(env):
    # NULL-keyed probe rows must be kept by anti, dropped by semi
    _check(env, "select count(*) from (select * from lines l where l.okey not in "
                "(select okey from orders where cust < 150) or l.okey is null) t")


def test_sharded_left_join(env):
    _check(env, "select o.okey, count(l.qty) from orders o left join lines l "
                "on o.okey = l.okey and l.qty > 25 group by o.okey")


def test_sharded_groupby_minmax_with_predicate(env):
    _check(env, "select l.okey, count(*), min(l.qty), max(l.qty) from lines l "
                "where l.qty > 5 group by l.okey",
           {"groupbys": 1})


def test_skewed_join_heavy_hitter_split(env):
    """One key dominating the probe side triggers the sampled heavy-hitter
    split; results remain exact."""
    import pyarrow as pa

    s, con = env
    rng = np.random.default_rng(11)
    n = 8000
    hot = np.full(n, 5, dtype="int64")
    hot[: n // 8] = rng.integers(0, 900, n // 8)  # 7/8 of rows share key 5
    val = rng.integers(1, 10, n).astype("int64")
    s.add_table("skewed", pa.table({"k": pa.array(hot), "v": pa.array(val)}))
    con.execute("create table skewed(k int, v int)")
    con.executemany("insert into skewed values (?,?)",
                    [(int(a), int(b)) for a, b in zip(hot, val)])
    _check(env, "select o.cust, count(*) from skewed s, orders o "
                "where s.k = o.okey group by o.cust",
           {"joins": 1, "skew_splits": 1})


def test_exchange_program_uses_all_to_all_not_gather(env):
    """The shuffle moves rows with all-to-all; neither side is replicated
    (no all-gather of an operand in the exchange program)."""
    import jax
    import jax.numpy as jnp

    from lingodb_tpu.parallel import shuffle as sh
    from lingodb_tpu.runtime import device as dv

    mesh = dv.get_mesh()
    fn = sh._exchange_fn(mesh, 64, ("int64",))
    n = mesh.shape["dp"]
    d = jnp.zeros((n * 128,), jnp.int32)
    v = jnp.ones((n * 128,), jnp.bool_)
    c = jnp.zeros((n * 128,), jnp.int64)
    txt = fn.lower(d, v, c).compile().as_text()
    assert "all-to-all" in txt
    assert "all-gather" not in txt


def test_inputs_stay_row_sharded(env):
    """Exchange inputs and outputs carry explicit P('dp') row sharding."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lingodb_tpu.parallel import shuffle as sh
    from lingodb_tpu.runtime import device as dv

    mesh = dv.get_mesh()
    n = 4096
    h = jnp.arange(n, dtype=jnp.uint64)
    dest = sh.hash_dest(mesh, h)
    valid, outs, lp = sh.exchange(mesh, dest, [h.astype(jnp.int64)])
    assert valid.sharding == NamedSharding(mesh, P("dp"))
    assert outs[0].sharding == NamedSharding(mesh, P("dp"))
    # every row arrives exactly once
    import numpy as np_

    got = np_.asarray(outs[0])[np_.asarray(valid)]
    assert sorted(got.tolist()) == list(range(n))


def test_distributed_sample_sort(env):
    """ORDER BY over the mesh runs the sample-sort (range partition +
    per-shard local sort) instead of a replicated whole-table sort, and
    matches sqlite's ordering exactly (reference: parallel merge sort,
    src/runtime/Sorting.cpp)."""
    from lingodb_tpu.parallel import shuffle as sh
    from lingodb_tpu.tools import sqlite_oracle as so

    s, con = env
    for k in sh.STATS:
        sh.STATS[k] = 0
    q = ("select okey, qty, flag from lines"
         " order by flag desc, qty, okey nulls first")
    ours = so.our_rows(s.sql(q))
    theirs = con.execute(q).fetchall()
    ok, msg = so.rows_equal(ours, theirs, ordered=True)
    assert ok, msg
    assert sh.STATS["sorts"] >= 1, "sample-sort path did not run"
    assert len(ours) == 6000


def test_sharded_full_outer_join(env):
    """FULL joins shuffle both sides and emit unmatched rows from each:
    matched pairs + NULL-extended probe rows + NULL-extended build rows
    (reference: ParallelizePass.cpp parallelizes every join kind)."""
    _check(env, "select o.okey, o.cust, l.qty from orders o "
                "full join lines l on o.okey = l.okey and l.qty > 40",
           {"joins": 1, "exchanges": 2})


def test_sharded_single_join_scalar_subquery(env):
    """Correlated scalar subqueries lower to single joins (binder.py:1510);
    over the mesh the first passing pair per probe row is picked shard-locally
    after the keyed exchange."""
    _check(env, "select l.okey, l.qty, (select o.cust from orders o "
                "where o.okey = l.okey) from lines l",
           {"joins": 1})


def test_sharded_count_distinct(env):
    """DISTINCT aggregates ship raw rows keyed by group hash (no two-round
    pre-combine) so each group's distinct set is complete on one shard."""
    _check(env, "select l.okey, count(distinct l.flag), count(*) "
                "from lines l group by l.okey",
           {"groupbys": 1, "exchanges": 1})


def test_sharded_sum_distinct_mixed(env):
    _check(env, "select l.okey, sum(distinct l.qty), min(l.qty), "
                "count(distinct l.qty) from lines l group by l.okey",
           {"groupbys": 1})


def test_build_side_skew_correctness(env):
    """7/8 of BUILD rows share one key: the build-side heavy-hitter split
    spreads the hot key's build rows by position and replicates the matching
    probe rows, instead of landing 7/8 of the build on one shard."""
    import pyarrow as pa

    s, con = env
    rng = np.random.default_rng(13)
    nb = 6000
    bk = np.full(nb, 7, dtype="int64")
    bk[: nb // 8] = rng.integers(0, 50, nb // 8)
    bv = rng.integers(1, 100, nb).astype("int64")
    s.add_table("bskew", pa.table({"k": pa.array(bk), "v": pa.array(bv)}))
    con.execute("create table bskew(k int, v int)")
    con.executemany("insert into bskew values (?,?)",
                    [(int(a), int(b)) for a, b in zip(bk, bv)])
    _check(env, "select l.okey, count(*), sum(b.v) from lines l, bskew b "
                "where l.okey = b.k group by l.okey",
           {"joins": 1, "skew_splits": 1})


def test_wide_decimal_payload_ships_over_mesh(env):
    """decimal(38) payloads beyond int64 limb-split into (hi, lo) int64
    arrays for the exchange and reassemble exactly on the far side
    (reference: i128 runtime values, DBToStd lowering)."""
    from decimal import Decimal

    import pyarrow as pa

    from lingodb_tpu.parallel import shuffle as sh

    s, _ = env
    n = 2000
    ks = (np.arange(n, dtype="int64") * 7) % 300
    rs = np.arange(n, dtype="int64")
    vals = [Decimal(10) ** 20 + Decimal(int(i)) for i in range(n)]
    s.add_table("widep", pa.table({
        "k": pa.array(ks), "r": pa.array(rs),
        "d": pa.array(vals, type=pa.decimal128(38, 0))}))
    for key in sh.STATS:
        sh.STATS[key] = 0
    rows = list(s.sql("select w.r, w.d from widep w, orders o "
                      "where w.k = o.okey").to_arrow().to_pylist())
    assert sh.STATS["joins"] >= 1, "sharded join path did not run"
    got = sorted((int(r["r"]), Decimal(r["d"])) for r in rows)
    assert got == [(int(i), vals[i]) for i in range(n)]
    # distributed sort with a wide payload column
    for key in sh.STATS:
        sh.STATS[key] = 0
    rows = list(s.sql("select d from widep order by r desc")
                .to_arrow().to_pylist())
    assert sh.STATS["sorts"] >= 1, "sample-sort path did not run"
    assert [Decimal(r["d"]) for r in rows] == list(reversed(vals))


def test_distributed_sort_single_key_desc(env):
    from lingodb_tpu.parallel import shuffle as sh
    from lingodb_tpu.tools import sqlite_oracle as so

    s, con = env
    for k in sh.STATS:
        sh.STATS[k] = 0
    q = "select qty from lines order by qty desc"
    ours = so.our_rows(s.sql(q))
    theirs = con.execute(q).fetchall()
    ok, msg = so.rows_equal(ours, theirs, ordered=True)
    assert ok, msg
    assert sh.STATS["sorts"] >= 1
