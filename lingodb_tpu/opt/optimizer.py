"""Query optimizer: logical rewrite passes.

TPU-native equivalent of the reference RelAlg optimization pipeline
(reference: src/compiler/Dialect/RelAlg/Passes.cpp:17-50 — the pass order is
SimplifyAggregations -> ... -> Pushdown -> ... -> OptimizeJoinOrder -> ...).
Round-1 passes: predicate pushdown (reference: Transforms/Pushdown.cpp) and
scan-restriction folding; join ordering (DPhyp) lands in opt/joinorder.py.
"""

from __future__ import annotations

from ..plan import exprs as E
from ..plan import logical as L
from ..plan.exprs import BExpr


def optimize(plan: L.LogicalOp, catalog) -> L.LogicalOp:
    plan = pushdown(plan)
    plan = fold_scan_restrictions(plan)
    from .joinorder import reorder_joins

    plan = reorder_joins(plan, catalog)
    return plan


# ----------------------------------------------------------------- pushdown
def pushdown(plan: L.LogicalOp) -> L.LogicalOp:
    """Push Select predicates toward the scans (reference:
    Transforms/Pushdown.cpp:709 LoC — same rules: through Map when the
    predicate doesn't use computed columns, into the matching side of joins;
    predicates over both join sides stay as join predicates)."""
    return _push(plan, [])


def _push(op: L.LogicalOp, preds: list[BExpr]) -> L.LogicalOp:
    if isinstance(op, L.Select):
        return _push(op.child, preds + E.conjuncts(op.predicate))
    if isinstance(op, L.Map):
        computed_cids = {c.cid for c, _ in op.computed}
        down, stay = _split(preds, lambda p: not (E.used_cols(p) & computed_cids))
        child = _push(op.child, down)
        out: L.LogicalOp = L.Map(child, [(c, e) for c, e in op.computed])
        return _wrap(out, stay)
    if isinstance(op, L.Join):
        lcids = {c.cid for c in op.left.output_cols()}
        rcids = {c.cid for c in op.right.output_cols()}
        if op.kind in ("inner", "cross"):
            jpreds = E.conjuncts(op.predicate) if op.predicate else []
            allp = preds + jpreds
            lp, rest = _split(allp, lambda p: E.used_cols(p) <= lcids)
            rp, joinp = _split(rest, lambda p: E.used_cols(p) <= rcids)
            left = _push(op.left, lp)
            right = _push(op.right, rp)
            kind = "inner" if joinp else op.kind
            if op.kind == "inner" and not joinp:
                kind = "cross"
            return L.Join(kind, left, right, E.make_and(joinp) if joinp else None,
                          op.mark_col)
        if op.kind in ("semi", "anti", "mark", "single", "left"):
            # left-side-only predicates can push into the left child
            lp, stay = _split(preds, lambda p: E.used_cols(p) <= lcids)
            left = _push(op.left, lp)
            right = _push(op.right, [])
            j = L.Join(op.kind, left, right, op.predicate, op.mark_col)
            if hasattr(op, "null_aware"):
                j.null_aware = op.null_aware
            return _wrap(j, stay)
        # full outer: nothing pushes
        left = _push(op.left, [])
        right = _push(op.right, [])
        return _wrap(L.Join(op.kind, left, right, op.predicate, op.mark_col), preds)
    if isinstance(op, (L.Sort, L.Limit, L.TopK, L.Distinct)):
        # limit/topk change semantics; apply preds above
        child = _push(op.children()[0], [] if isinstance(op, (L.Limit, L.TopK)) else preds)
        out = op.replace_children([child])
        return _wrap(out, preds if isinstance(op, (L.Limit, L.TopK)) else [])
    if isinstance(op, L.Aggregate):
        group_cids = set(op.group_by)
        down, stay = _split(preds, lambda p: E.used_cols(p) <= group_cids)
        child = _push(op.child, down)
        return _wrap(op.replace_children([child]), stay)
    if isinstance(op, L.SetOp):
        # conservatively keep above (mapping cids through is a later pass)
        l = _push(op.left, [])
        r = _push(op.right, [])
        return _wrap(op.replace_children([l, r]), preds)
    if isinstance(op, L.Window):
        child = _push(op.child, [])
        return _wrap(op.replace_children([child]), preds)
    if isinstance(op, L.Materialize):
        return L.Materialize(_push(op.child, preds), op.cids, op.names)
    # leaves: Scan / ConstRel
    return _wrap(op, preds)


def _split(preds, f):
    yes, no = [], []
    for p in preds:
        (yes if f(p) else no).append(p)
    return yes, no


def _wrap(op: L.LogicalOp, preds: list[BExpr]) -> L.LogicalOp:
    if not preds:
        return op
    return L.Select(op, E.make_and(preds))


# -------------------------------------------------- scan restriction folding
def fold_scan_restrictions(plan: L.LogicalOp) -> L.LogicalOp:
    """Move simple single-column predicates directly above scans into the scan
    node (reference: pushed-down scan filters, src/runtime/storage/
    Restrictions.cpp — vectorized selection applied during the scan)."""
    if isinstance(plan, L.Select):
        child = fold_scan_restrictions(plan.child)
        if isinstance(child, L.Scan):
            scan_cids = {c.cid for c in child.cols}
            into, stay = _split(
                E.conjuncts(plan.predicate),
                lambda p: E.used_cols(p) <= scan_cids and _is_simple(p),
            )
            if into:
                child = L.Scan(child.table, child.cols, child.restrictions + into)
            return _wrap(child, stay)
        return L.Select(child, plan.predicate)
    new_children = [fold_scan_restrictions(c) for c in plan.children()]
    if not new_children:
        return plan
    return plan.replace_children(new_children)


def _is_simple(p: BExpr) -> bool:
    from ..plan.exprs import Call, CaseExpr

    for node in E.walk(p):
        if isinstance(node, CaseExpr):
            return False
    return True
