"""Canonical plan serialization for compilation caching.

TPU-native analogue of the reference's query compilation cache
(reference: the ORC JIT object cache, LLVMBackends.cpp:81-460). Two
executions of the same SQL bind to identical plans (the binder's cid counter
is deterministic), so a stable string key over the plan identifies a
compiled stage; the session keeps plan_key -> jitted-function maps.
"""

from __future__ import annotations

from . import logical as L
from .exprs import BExpr


def expr_key(e: BExpr) -> str:
    return repr(e)


def plan_key(op: L.LogicalOp) -> str:
    parts = [type(op).__name__]
    if isinstance(op, L.Scan):
        parts.append(op.table)
        parts.append(",".join(f"{c.cid}:{c.name}" for c in op.cols))
        parts.extend(expr_key(r) for r in op.restrictions)
    elif isinstance(op, L.ConstRel):
        parts.append(repr(op.rows))
    elif isinstance(op, L.Select):
        parts.append(expr_key(op.predicate))
    elif isinstance(op, L.Map):
        parts.extend(f"{c.cid}={expr_key(e)}" for c, e in op.computed)
    elif isinstance(op, L.Join):
        parts.append(op.kind)
        parts.append(expr_key(op.predicate) if op.predicate else "-")
    elif isinstance(op, L.Aggregate):
        parts.append(repr(op.group_by))
        parts.extend(f"{a.out.cid}={a.fn}({a.arg}){'d' if a.distinct else ''}" for a in op.aggs)
    elif isinstance(op, (L.Sort, L.TopK)):
        parts.extend(f"{k.cid}{k.ascending}{k.nulls_first}" for k in op.keys)
        if isinstance(op, L.TopK):
            parts.append(f"n={op.n},o={op.offset}")
    elif isinstance(op, L.Limit):
        parts.append(f"n={op.n},o={op.offset}")
    elif isinstance(op, L.Distinct):
        parts.append(repr(op.cids))
    elif isinstance(op, L.SetOp):
        parts.append(f"{op.kind}{op.all}{op.lmap}{op.rmap}")
    elif isinstance(op, L.Window):
        parts.append(repr(op.partition_by))
        parts.extend(f"{k.cid}{k.ascending}" for k in op.order_by)
        parts.extend(f"{f.out.cid}={f.fn}({f.arg},{f.extra})" for f in op.funcs)
    elif isinstance(op, L.Materialize):
        parts.append(repr(op.cids))
    children = ";".join(plan_key(c) for c in op.children())
    return "(" + " ".join(parts) + (("|" + children) if children else "") + ")"
