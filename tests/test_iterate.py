"""Iterate-until-fixpoint programs.

The Iterate plan operator is the engine's equivalent of the reference's
subop.loop / subop.loop_continue (SubOperatorOps.td:937-953), exercised
upstream by test/lit/SubOp/{loop,kmeans,pagerank}.mlir. On top of it we
expose SQL WITH RECURSIVE (the reference has no SQL surface for its loop).

Coverage: recursive CTEs vs the sqlite3 differential oracle, the reference's
loop.mlir / pagerank.mlir / kmeans.mlir programs reproduced with their exact
expected outputs, semi-naive UNION termination on cyclic graphs, and the
plan-JSON round trip (our analogue of feeding IR files to run-mlir)."""

import sqlite3

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engine():
    import lingodb_tpu as ldb

    s = ldb.create_in_memory()
    s.sql_stmt("create table edges (src int not null, dst int not null)")
    s.sql_stmt("insert into edges values (0,1),(1,2),(2,4),(3,4),(4,1),(0,3)")
    s.sql_stmt("create table emp (id int, mgr int, name varchar(10))")
    s.sql_stmt("insert into emp values (1,null,'ceo'),(2,1,'vp1'),(3,1,'vp2'),"
               "(4,2,'m1'),(5,2,'m2'),(6,4,'e1'),(7,4,'e2'),(8,3,'e3')")
    return s


@pytest.fixture(scope="module")
def oracle():
    con = sqlite3.connect(":memory:")
    con.execute("create table edges (src int not null, dst int not null)")
    con.executemany("insert into edges values (?,?)",
                    [(0, 1), (1, 2), (2, 4), (3, 4), (4, 1), (0, 3)])
    con.execute("create table emp (id int, mgr int, name text)")
    con.executemany(
        "insert into emp values (?,?,?)",
        [(1, None, "ceo"), (2, 1, "vp1"), (3, 1, "vp2"), (4, 2, "m1"),
         (5, 2, "m2"), (6, 4, "e1"), (7, 4, "e2"), (8, 3, "e3")])
    yield con
    con.close()


ORACLE_QUERIES = [
    # counters / arithmetic series
    "with recursive t(n) as (select 1 union all select n+1 from t where n < 50)"
    " select count(*), sum(n), min(n), max(n) from t",
    "with recursive t(n, s) as (select 1, 1 union all"
    " select n+1, s+n+1 from t where n < 30) select n, s from t order by n",
    # UNION (distinct) fixpoint on a cyclic graph: must terminate
    "with recursive r(v) as (select 0 union"
    " select edges.dst from r, edges where edges.src = r.v)"
    " select v from r order by v",
    # reachability from 3
    "with recursive r(v) as (select 3 union"
    " select edges.dst from r join edges on edges.src = r.v)"
    " select v from r order by v",
    # org chart with depth + path-ish labels
    "with recursive org(id, name, depth) as ("
    " select id, name, 0 from emp where mgr is null"
    " union all"
    " select e.id, e.name, org.depth+1 from emp e join org on e.mgr = org.id)"
    " select id, name, depth from org order by id",
    # recursive CTE consumed by joins/aggregates downstream
    "with recursive t(n) as (select 1 union all select n+1 from t where n < 8)"
    " select a.n, b.n from t a join t b on b.n = a.n + 1 order by a.n",
    # two CTEs: recursive one referencing a plain one
    "with recursive base(m) as (select 10), "
    " t(n) as (select 1 union all select n*2 from t, base where n < base.m)"
    " select n from t order by n",
]


@pytest.mark.parametrize("q", ORACLE_QUERIES)
def test_recursive_vs_sqlite(engine, oracle, q):
    ours = [tuple(r) for r in engine.sql(q).to_pylist()]
    theirs = [tuple(r) for r in oracle.execute(q).fetchall()]

    def norm(rows):
        return [tuple(float(x) if isinstance(x, (int, float)) and not
                      isinstance(x, bool) else x for x in r) for r in rows]

    assert norm(ours) == norm(theirs), q


def test_union_all_cycle_guard(engine):
    """UNION ALL over a cycle never reaches a fixpoint: the executor's
    iteration cap must fail loudly, not hang (reference loops are bounded by
    an explicit continue flag)."""
    from lingodb_tpu.runtime.executor import ExecError

    engine.sql_stmt("set max_recursion = 50")
    try:
        with pytest.raises(ExecError, match="max_iters"):
            engine.sql("with recursive r(v) as (select 0 union all"
                       " select edges.dst from r, edges where edges.src = r.v)"
                       " select count(*) from r")
    finally:
        engine.sql_stmt("set max_recursion = 10000")


def test_loop_mlir_counter(engine):
    """The reference's loop.mlir program: counter starts at 0, increments
    while < 5, result is 6 (test/lit/SubOp/loop.mlir CHECK: ctr = 6).
    emit='last' on the plan-level Iterate is the state-replacement loop."""
    from lingodb_tpu.plan import logical as L
    from lingodb_tpu.plan.exprs import Call, ColRef, Const
    from lingodb_tpu.plan.serial import plan_from_json, plan_to_json
    from lingodb_tpu.sql.types import Type

    t = Type.bigint(False)
    holder = L.IterateHolder()
    c_base = L.ColInfo(9001, "ctr", t)
    c_ref = L.ColInfo(9002, "ctr", t)
    c_new = L.ColInfo(9003, "ctr", t)
    base = L.ConstRel([c_base], [[0]])
    ref = L.IterRef(holder, [c_ref])
    step = L.Map(
        L.Select(ref, Call("lt", [ColRef(9002, t), Const(6, t)], Type.bool_(True))),
        [(c_new, Call("add", [ColRef(9002, t), Const(1, t)], t))])
    it = L.Iterate(holder, base, step, [L.ColInfo(9004, "ctr", t)],
                   distinct=False, lmap=[9001], smap=[9003], emit="last")
    plan = L.Materialize(it, [9004], ["ctr"])

    r = engine.run_plan(plan_to_json(plan))
    assert r.format_rows() == [["6"]]
    # and the JSON round trip preserves loop structure (holder identity)
    p2 = plan_from_json(plan_to_json(plan))
    assert isinstance(p2.child, L.Iterate)
    assert p2.child.step.child.child.holder is p2.child.holder
    r2 = engine.run_plan(plan_to_json(p2))
    assert r2.format_rows() == [["6"]]


def test_pagerank_mlir(engine):
    """The reference's pagerank.mlir program (same graph, l = out-degree,
    rank' = 0.15/V + 0.85 * sum(rank_u / max(l_u,1)) over incoming edges),
    expressed as a recursive CTE with aggregates+joins in the step. Exact
    check vs a numpy evaluation of the same recurrence at 60 iterations,
    approximate check vs the reference's converged CHECK values."""
    q = """
    with recursive
      verts(id, l) as (
        select v, count(es.src) from (
          select src as v from edges union select dst as v from edges) vs
        left join edges es on es.src = vs.v group by v),
      pr(iter, id, rank, l) as (
        select 0, id, cast(0.2 as double), l from verts
        union all
        select pr.iter + 1, pr.id,
               0.03 + 0.85 * coalesce(inc.s, cast(0 as double)), pr.l
        from pr left join (
            select e.dst as d,
                   sum(pr2.rank / (case when pr2.l < 1 then 1 else pr2.l end)) as s
            from pr pr2, edges e where e.src = pr2.id group by e.dst) inc
          on pr.id = inc.d
        where pr.iter < 60)
    select id, rank, l from pr where iter = 60 order by id
    """
    got = engine.sql(q).to_pylist()
    # numpy reference of the identical recurrence
    edges = [(0, 1), (1, 2), (2, 4), (3, 4), (4, 1), (0, 3)]
    out_deg = np.zeros(5)
    for s, _d in edges:
        out_deg[s] += 1
    rank = np.full(5, 0.2)
    for _ in range(60):
        nxt = np.full(5, 0.03)
        for s, d in edges:
            nxt[d] += 0.85 * rank[s] / max(out_deg[s], 1)
        rank = nxt
    for (gid, grank, gl), i in zip(got, range(5)):
        assert gid == i and gl == out_deg[i]
        assert abs(grank - rank[i]) < 1e-12, (i, grank, rank[i])
    # reference CHECK values (converged; pagerank.mlir:4-9)
    expected = {0: 0.03, 1: 0.31308551992225453, 2: 0.2961226919339164,
                3: 0.042749999999999996, 4: 0.3180417881438289}
    for (gid, grank, _gl) in got:
        assert abs(grank - expected[gid]) < 2e-4, (gid, grank)


def test_kmeans_mlir(engine):
    """The reference's kmeans.mlir program: 10 points, k=3, centroids seeded
    with the first three points, assignment by squared distance, iterate to
    convergence. Expected centroids from kmeans.mlir CHECK lines:
    (1.75, 1.5), (2.3333, 4.6667), (6.6667, 4.0)."""
    engine.sql_stmt("create table pts (pid int, x double, y double)")
    engine.sql_stmt(
        "insert into pts values (1,1,1),(2,1,2),(3,2,1),(4,2,4),(5,2,5),"
        "(6,3,2),(7,3,5),(8,6,3),(9,6,5),(10,8,4)")
    q = """
    with recursive c(iter, id, x, y) as (
      select 0, pid - 1, x, y from pts where pid <= 3
      union all
      select iter + 1, cid, avg(px), avg(py) from (
        select c.iter as iter, p.pid as pid, p.x as px, p.y as py,
               c.id as cid,
               row_number() over (partition by c.iter, p.pid
                 order by (p.x-c.x)*(p.x-c.x) + (p.y-c.y)*(p.y-c.y), c.id) rn
        from pts p, c) a
      where rn = 1 and iter < 10
      group by cid, iter)
    select id, x, y from c where iter = 10 order by id
    """
    got = engine.sql(q).to_pylist()
    expected = [(0, 1.75, 1.5), (1, 7 / 3, 14 / 3), (2, 20 / 3, 4.0)]
    assert len(got) == 3
    for (gid, gx, gy), (eid, ex, ey) in zip(got, expected):
        assert gid == eid
        assert abs(gx - ex) < 1e-6 and abs(gy - ey) < 1e-6, (gid, gx, gy)


def test_iterate_survives_optimizer_passes(engine):
    """EXPLAIN (runs the full pass pipeline) and execution agree; CSE must
    collapse two references to the same recursive CTE onto one shared
    materialization rather than diverging the loop."""
    q = ("with recursive t(n) as (select 1 union all select n+1 from t"
         " where n < 6) select a.n + b.n from t a, t b where a.n = b.n"
         " order by a.n")
    assert [r[0] for r in engine.sql(q).to_pylist()] == [2, 4, 6, 8, 10, 12]
    plan = engine.sql("explain " + q)
    txt = "\n".join(r[0] for r in plan.to_pylist())
    assert "Iterate" in txt
