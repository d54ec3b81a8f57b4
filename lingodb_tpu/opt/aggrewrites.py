"""Aggregate-shape rewrites: eager aggregation (groupjoin) + distinct split.

TPU-native equivalents of:
- the reference's groupjoin (relalg.groupjoin, RelAlgOps.td:240; detection in
  OptimizeImplementations.cpp:580-660): an Aggregate whose group keys are the
  unique join key of the left side pushes the aggregation into the right side
  BEFORE the join. On TPU this turns a duplicate-key materializing join +
  wide grouping into a segment reduction followed by a unique-key lookup —
  the shape the fused single-program pipeline compiles.
- splitting DISTINCT aggregates into a two-level grouping (dedup grouping,
  then plain aggregation), so the heavy dedup level runs through the fused
  join+group program instead of an eager distinct (reference lowers
  count(distinct) via a nested aggregation in RelAlgToSubOp as well).
"""

from __future__ import annotations

from ..plan import exprs as E
from ..plan import logical as L
from ..plan.exprs import Call, ColRef
from ..sql.types import Type


def _max_cid(plan: L.LogicalOp) -> int:
    m = 0
    for node in L.walk_plan(plan):
        for c in node.output_cols():
            m = max(m, c.cid)
        if isinstance(node, L.Map):
            m = max([m] + [ci.cid for ci, _e in node.computed])
        if isinstance(node, L.Tmp):
            m = max(m, _max_cid(node.holder.plan))
    return m


class _Cids:
    def __init__(self, plan):
        self.next = _max_cid(plan) + 1

    def fresh(self, name: str, t: Type) -> L.ColInfo:
        c = L.ColInfo(self.next, name, t)
        self.next += 1
        return c


# ------------------------------------------------------- eager aggregation
_PUSHABLE = ("sum", "count", "count_star", "min", "max")


def eager_aggregation(plan: L.LogicalOp, catalog) -> L.LogicalOp:
    """Aggregate(K, aggs) over Join[inner|left](L, R, lk=rk AND residual(R))
    where K are L columns containing lk, L is unique on lk, and every
    aggregate reads R: push the aggregation into R, then join on the now
    unique key (reference: groupjoin detection,
    OptimizeImplementations.cpp:580-660).

      count/count_star need a post-join fixup: unmatched L rows produce
      NULL -> count is 0 (left join count over NULL-extension) and
      count_star is 1 (the NULL-extended row itself counts)."""
    from .constraints import collect_fds

    cids = _Cids(plan)

    def rec(op: L.LogicalOp) -> L.LogicalOp:
        kids = op.children()
        if kids:
            op = op.replace_children([rec(c) for c in kids])
        if not isinstance(op, L.Aggregate) or not op.group_by:
            return op
        j = op.child
        if not isinstance(j, L.Join) or j.kind not in ("inner", "left"):
            return op
        lcids = {c.cid for c in j.left.output_cols()}
        rcids = {c.cid for c in j.right.output_cols()}
        eqs, residual = [], []
        for c in E.conjuncts(j.predicate):
            if (isinstance(c, Call) and c.op == "eq"
                    and isinstance(c.args[0], ColRef) and isinstance(c.args[1], ColRef)):
                a, b = c.args[0].cid, c.args[1].cid
                if a in lcids and b in rcids:
                    eqs.append((c.args[0], c.args[1]))
                    continue
                if b in lcids and a in rcids:
                    eqs.append((c.args[1], c.args[0]))
                    continue
            residual.append(c)
        if len(eqs) != 1:
            return op
        lk, rk = eqs[0]
        if any(E.used_cols(r) - rcids for r in residual):
            return op
        if not set(op.group_by) <= lcids or lk.cid not in op.group_by:
            return op
        if any(a.distinct or a.fn not in _PUSHABLE for a in op.aggs):
            return op
        if any(a.arg is not None and a.arg not in rcids for a in op.aggs):
            return op
        fds = collect_fds(j.left, catalog)
        if fds.key is None or not fds.key <= fds.expand({lk.cid}):
            return op  # L not unique on the join key

        r_in = L.Select(j.right, E.make_and(residual)) if residual else j.right
        rk_info = next(c for c in j.right.output_cols() if c.cid == rk.cid)
        inner_aggs = []
        fixups = []  # (orig ColInfo, inner ColInfo, fn)
        for a in op.aggs:
            fn, arg = a.fn, a.arg
            if fn == "count_star":
                # count(*) per key over R = count of the (non-null) key rows
                fn, arg = "count", rk.cid
            out_t = a.out.type if a.out.type.nullable else a.out.type.as_nullable()
            ic = cids.fresh(a.out.name, out_t)
            inner_aggs.append(L.AggSpec(ic, fn, arg))
            fixups.append((a.out, ic, a.fn))
        inner = L.Aggregate(r_in, [rk.cid], inner_aggs, [rk_info])
        jkind = "inner" if j.kind == "inner" else "single"
        njoin = L.Join(jkind, j.left, inner,
                       Call("eq", [lk, ColRef(rk.cid, rk_info.type)], Type.bool_(True)))
        computed = []
        for orig, ic, fn in fixups:
            ref = ColRef(ic.cid, ic.type)
            if fn in ("count", "count_star"):
                # inner join: matches guarantee a value, default never fires.
                # left join: unmatched L rows must count 0 (count over the
                # NULL extension) resp. 1 (count_star counts the row itself)
                dflt = 1 if (fn == "count_star" and j.kind == "left") else 0
                e = Call("coalesce", [ref, E.Const(dflt, orig.type)], orig.type)
            else:
                e = ref if ic.type == orig.type else __cast(ref, orig.type)
            computed.append((orig, e))
        return L.Map(njoin, computed)

    return rec(plan)


def __cast(ref: ColRef, t: Type):
    from ..plan.exprs import Cast

    return Cast(ref, t)


# ------------------------------------------------------------ distinct split
def split_distinct_aggregates(plan: L.LogicalOp, catalog=None) -> L.LogicalOp:
    """Aggregate(K, aggs all DISTINCT on one shared argument x) becomes
      Aggregate(K, plain aggs on x) over Aggregate(K+[x], no aggs)
    — the inner dedup grouping carries the join/filter spine into the fused
    program; the outer level runs over the small distinct set."""
    cids = _Cids(plan)

    def rec(op: L.LogicalOp) -> L.LogicalOp:
        kids = op.children()
        if kids:
            op = op.replace_children([rec(c) for c in kids])
        if not isinstance(op, L.Aggregate) or not op.aggs:
            return op
        if not all(a.distinct for a in op.aggs):
            return op
        args = {a.arg for a in op.aggs}
        if len(args) != 1 or None in args:
            return op
        (x,) = args
        if any(a.fn not in ("count", "sum", "min", "max") for a in op.aggs):
            return op
        child_cols = {c.cid: c for c in op.child.output_cols()}
        if x not in child_cols or x in op.group_by:
            return op
        inner_keys = list(op.group_by) + [x]
        inner_infos = list(op.group_cols) + [child_cols[x]]
        inner = L.Aggregate(op.child, inner_keys, [], inner_infos)
        outer_aggs = [L.AggSpec(a.out, a.fn, a.arg) for a in op.aggs]
        return L.Aggregate(inner, list(op.group_by), outer_aggs, op.group_cols)

    return rec(plan)
