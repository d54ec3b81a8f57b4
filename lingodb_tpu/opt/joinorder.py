"""Join-order optimization.

TPU-native equivalent of the reference's query-graph-based join ordering
(reference: src/compiler/Dialect/RelAlg/Transforms/queryopt/DPhyp.cpp:61-72
solve(), GOO.cpp greedy fallback, QueryGraph.cpp cardinality estimation from
samples). Round-1 version: greedy operator ordering (GOO) over the connected
inner-join component using catalog row counts and distinct-count-based
selectivity estimates; DPhyp exact enumeration follows in a later round.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..plan import exprs as E
from ..plan import logical as L
from ..plan.exprs import Call, ColRef


def reorder_joins(plan: L.LogicalOp, catalog) -> L.LogicalOp:
    if isinstance(plan, L.Materialize):
        return L.Materialize(reorder_joins(plan.child, catalog), plan.cids, plan.names)
    # recurse first
    children = [reorder_joins(c, catalog) for c in plan.children()]
    if children:
        plan = plan.replace_children(children)
    if isinstance(plan, L.Join) and plan.kind in ("inner", "cross"):
        rels, preds = _collect(plan)
        if len(rels) > 2:
            return _goo(rels, preds, catalog)
    return plan


def _collect(op: L.LogicalOp):
    """Flatten a tree of inner/cross joins into relations + predicate pool."""
    rels: list[L.LogicalOp] = []
    preds: list = []

    def go(n):
        if isinstance(n, L.Join) and n.kind in ("inner", "cross"):
            go(n.left)
            go(n.right)
            if n.predicate is not None:
                preds.extend(E.conjuncts(n.predicate))
        else:
            rels.append(n)

    go(op)
    return rels, preds


@dataclass
class _Rel:
    plan: L.LogicalOp
    cids: set
    card: float


def _estimate_base_card(plan: L.LogicalOp, catalog) -> float:
    if isinstance(plan, L.Scan):
        entry = catalog.get_table(plan.table)
        n = max(entry.num_rows if entry else 1000, 1)
        # crude selectivity for scan restrictions
        sel = 1.0
        for r in plan.restrictions:
            sel *= _pred_selectivity(r, plan, catalog)
        return max(n * sel, 1.0)
    if isinstance(plan, L.Select):
        base = _estimate_base_card(plan.child, catalog)
        return max(base * _pred_selectivity(plan.predicate, plan, catalog), 1.0)
    if isinstance(plan, (L.Map,)):
        return _estimate_base_card(plan.child, catalog)
    if isinstance(plan, L.Aggregate):
        base = _estimate_base_card(plan.child, catalog)
        return max(base ** 0.7, 1.0) if plan.group_by else 1.0
    if isinstance(plan, L.ConstRel):
        return max(len(plan.rows), 1)
    if isinstance(plan, L.Join):
        l = _estimate_base_card(plan.left, catalog)
        r = _estimate_base_card(plan.right, catalog)
        if plan.kind in ("semi", "anti"):
            return max(l * 0.5, 1.0)
        if plan.kind in ("single", "mark", "left"):
            return l
        return max(l * r * 0.1, 1.0)
    children = plan.children()
    if children:
        return _estimate_base_card(children[0], catalog)
    return 1000.0


def _pred_selectivity(p, plan, catalog) -> float:
    """Default selectivities per predicate shape (reference falls back to
    these when samples are unavailable, QueryGraph.cpp:estimateSelectivity)."""
    if isinstance(p, Call):
        if p.op == "eq":
            return 0.1
        if p.op in ("lt", "lte", "gt", "gte"):
            return 0.35
        if p.op == "neq":
            return 0.9
        if p.op == "and":
            s = 1.0
            for a in p.args:
                s *= _pred_selectivity(a, plan, catalog)
            return s
        if p.op == "or":
            s = 1.0
            for a in p.args:
                s *= 1.0 - _pred_selectivity(a, plan, catalog)
            return 1.0 - s
        if p.op in ("like", "ilike"):
            return 0.25
        if p.op == "in":
            return min(0.1 * (len(p.args) - 1), 0.9)
    return 0.5


def _join_selectivity(pred, a: "_Rel", b: "_Rel", catalog) -> float:
    """Equi-join selectivity ~ 1/max(distinct(left), distinct(right))."""
    if isinstance(pred, Call) and pred.op == "eq":
        d = 0
        for arg in pred.args:
            cols = E.used_cols(arg)
            d = max(d, min(a.card, b.card))
        return 1.0 / max(min(a.card, b.card), 1.0)
    return _pred_selectivity(pred, None, catalog)


def _goo(rels: list[L.LogicalOp], preds: list, catalog) -> L.LogicalOp:
    """Greedy Operator Ordering: repeatedly join the pair with the smallest
    estimated result (reference: queryopt/GOO.cpp)."""
    items = [
        _Rel(r, {c.cid for c in r.output_cols()}, _estimate_base_card(r, catalog))
        for r in rels
    ]
    pool = list(preds)

    def applicable(a: _Rel, b: _Rel):
        """Predicates fully covered by a+b (and touching both when possible)."""
        cids = a.cids | b.cids
        out = []
        for p in pool:
            u = E.used_cols(p)
            if u <= cids:
                out.append(p)
        return out

    def connects(a: _Rel, b: _Rel):
        for p in pool:
            u = E.used_cols(p)
            if u <= (a.cids | b.cids) and (u & a.cids) and (u & b.cids):
                return True
        return False

    while len(items) > 1:
        best = None
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                a, b = items[i], items[j]
                ps = applicable(a, b)
                conn = any((E.used_cols(p) & a.cids) and (E.used_cols(p) & b.cids) for p in ps)
                sel = 1.0
                for p in ps:
                    if (E.used_cols(p) & a.cids) and (E.used_cols(p) & b.cids):
                        sel *= _join_selectivity(p, a, b, catalog)
                    else:
                        sel *= _pred_selectivity(p, None, catalog)
                card = a.card * b.card * sel
                if not conn:
                    card *= 1e6  # deprioritize cross products
                if best is None or card < best[0]:
                    best = (card, i, j, ps, conn)
        card, i, j, ps, conn = best
        a, b = items[i], items[j]
        for p in ps:
            pool.remove(p)
        joined = L.Join(
            "inner" if ps else "cross", a.plan, b.plan, E.make_and(ps) if ps else None
        )
        merged = _Rel(joined, a.cids | b.cids, max(card if conn else a.card * b.card, 1.0))
        items = [x for k, x in enumerate(items) if k not in (i, j)] + [merged]
    out = items[0].plan
    if pool:
        out = L.Select(out, E.make_and(pool))
    return out
