"""Window function kernels.

TPU-native equivalent of the reference's window lowering
(reference: WindowLowering RelAlgToSubOp.cpp:2193 — buffer + sorted/continuous
views + segment-tree views for frame aggregates; runtime SegmentTreeView.cpp).
Plan: sort rows by (partition, order) once; partitions become segments;
  - ranking fns: positional arithmetic over the sorted order
  - whole-partition aggregates: segment reduce + broadcast back
  - running frames (unbounded preceding .. current row): segmented prefix
    scans (cumsum / associative_scan) — the O(log n) parallel equivalent of
    the reference's segment trees
  - bounded ROWS frames: windowed difference of prefix sums
Results scatter back to the original row order."""

from __future__ import annotations

import jax

from . import backend as be
import jax.numpy as jnp
import numpy as np

from ..plan import logical as L
from ..runtime.vtable import SCol, VTable, dec_is_float, jnp_dtype
from ..sql.types import K, Type
from . import keys as keymod

INT64_MIN = -(2**63)


def run_window(op: L.Window, vt: VTable) -> VTable:
    n = vt.num_rows
    if n == 0:
        cols = dict(vt.cols)
        for f in op.funcs:
            cols[f.out.cid] = SCol(f.out.type, jnp.zeros((0,), jnp_dtype(f.out.type)), None)
        return VTable(cols, 0)

    part_cols = [vt.col(c) for c in op.partition_by]
    order_keys = [(vt.col(k.cid), k.ascending, k.nulls_first) for k in op.order_by]

    # one global sort: partition keys (as equality groups) then order keys
    operands = []
    for c in part_cols:
        operands.extend(keymod.grouping_images([c]))
    n_part_ops = len(operands)
    for c, asc, nf in order_keys:
        if nf is None:
            nf = not asc
        f = keymod.null_flag(c, nf)
        img = keymod.order_image(c)
        if f is not None:
            operands.append(f)
            # NULL rows carry arbitrary underlying values: zero their image so
            # they don't split peer groups or break ties (see keys.py)
            img = jnp.where(c.valid, img, jnp.zeros((), img.dtype))
        operands.append(img if asc else keymod.descending(img))
    iota = jnp.arange(n, dtype=jnp.int64)
    res = jax.lax.sort(operands + [iota], num_keys=len(operands) + 1)
    perm = res[-1]
    sorted_part = res[:n_part_ops]
    sorted_order = res[n_part_ops:-1]

    # partition boundaries in sorted space
    first = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    pb = first
    for s in sorted_part:
        pb = pb | jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
    seg = jnp.cumsum(pb.astype(jnp.int64)) - 1
    num_parts = int(seg[-1]) + 1
    pos = jnp.arange(n, dtype=jnp.int64)
    part_start = be.segment_min(pos, seg.astype(jnp.int32), num_segments=num_parts, indices_are_sorted=True)
    part_end = be.segment_max(pos, seg.astype(jnp.int32), num_segments=num_parts, indices_are_sorted=True)
    pos_in_part = pos - jnp.take(part_start, seg)

    # order-key run boundaries (peer groups) for rank/dense_rank
    ob = pb
    for s in sorted_order:
        ob = ob | jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])

    has_order = bool(op.order_by)
    inv = jnp.zeros((n,), jnp.int64).at[perm].set(pos)  # original row -> sorted pos

    cols = dict(vt.cols)
    for f in op.funcs:
        out_sorted = _compute_fn(f, op, vt, perm, seg, num_parts, pos, pos_in_part,
                                 part_start, part_end, pb, ob, has_order, n)
        # scatter back to original order
        data = jnp.take(out_sorted.data, inv, axis=0)
        valid = None if out_sorted.valid is None else jnp.take(out_sorted.valid, inv, axis=0)
        cols[f.out.cid] = SCol(f.out.type, data, valid, out_sorted.dictionary)
    return VTable(cols, n)


def _segmented_cumsum(vals, pb):
    """Prefix sums that reset at partition boundaries."""
    c = jnp.cumsum(vals, axis=0)
    # subtract the cumsum value just before each partition start
    base_idx = jnp.cumsum(pb.astype(jnp.int64)) - 1
    starts = jnp.concatenate([jnp.zeros((1,), c.dtype), c])[
        jnp.nonzero(pb, size=int(pb.sum()))[0]
    ]
    return c - jnp.take(starts, base_idx)


def _segmented_scan_minmax(vals, pb, is_min: bool):
    neutral = jnp.iinfo(vals.dtype).max if is_min else jnp.iinfo(vals.dtype).min
    if jnp.issubdtype(vals.dtype, jnp.floating):
        neutral = jnp.inf if is_min else -jnp.inf

    def combine(a, b):
        av, af = a
        bv, bf = b
        v = jnp.where(bf, bv, jnp.minimum(av, bv) if is_min else jnp.maximum(av, bv))
        return v, af | bf

    out, _ = jax.lax.associative_scan(combine, (vals, pb))
    return out


def _compute_fn(f: L.WindowFn, op: L.Window, vt: VTable, perm, seg, num_parts,
                pos, pos_in_part, part_start, part_end, pb, ob, has_order, n) -> SCol:
    fn = f.fn
    t = f.out.type
    if fn == "row_number":
        return SCol(t, pos_in_part + 1, None)
    if fn == "rank":
        # position of the first row of this peer group within the partition
        run_start = _segmented_scan_last_true(pos, ob)
        return SCol(t, run_start - jnp.take(part_start, seg) + 1, None)
    if fn == "dense_rank":
        new_run = ob.astype(jnp.int64)
        runs = _segmented_cumsum(new_run, pb)
        return SCol(t, runs, None)
    if fn == "percent_rank":
        run_start = _segmented_scan_last_true(pos, ob)
        rank = (run_start - jnp.take(part_start, seg)).astype(jnp.float64)
        size = (jnp.take(part_end, seg) - jnp.take(part_start, seg)).astype(jnp.float64)
        return SCol(t, jnp.where(size > 0, rank / jnp.maximum(size, 1), 0.0), None)
    if fn == "cume_dist":
        # peers counted through the inclusive end of the peer group
        run_end = _run_inclusive_end(pos, ob)
        size = (jnp.take(part_end, seg) - jnp.take(part_start, seg) + 1).astype(jnp.float64)
        return SCol(t, (run_end - jnp.take(part_start, seg) + 1).astype(jnp.float64) / size, None)
    if fn == "ntile":
        k = int(f.extra)
        size = jnp.take(part_end, seg) - jnp.take(part_start, seg) + 1
        return SCol(t, (pos_in_part * k) // jnp.maximum(size, 1) + 1, None)

    arg = vt.col(f.arg) if f.arg is not None else None
    arg_sorted = None if arg is None else arg.take(perm)

    if fn in ("lead", "lag"):
        off = int(f.extra or 1)
        shift = -off if fn == "lead" else off
        src = pos + (off if fn == "lead" else -off)
        in_part = (src >= jnp.take(part_start, seg)) & (src <= jnp.take(part_end, seg))
        src_c = jnp.clip(src, 0, n - 1)
        data = jnp.take(arg_sorted.data, src_c, axis=0)
        base_valid = arg_sorted.valid_mask() if arg_sorted.valid is not None else None
        v = jnp.take(base_valid, src_c) if base_valid is not None else jnp.ones((n,), jnp.bool_)
        return SCol(t, data, v & in_part, arg_sorted.dictionary)
    if fn == "first_value":
        idx = jnp.take(part_start, seg)
        data = jnp.take(arg_sorted.data, idx, axis=0)
        valid = None if arg_sorted.valid is None else jnp.take(arg_sorted.valid, idx)
        return SCol(t, data, valid, arg_sorted.dictionary)
    if fn == "last_value":
        # default frame: through current row when ordered, else whole partition
        idx = pos if has_order and op.frame_end is None else jnp.take(part_end, seg)
        data = jnp.take(arg_sorted.data, idx, axis=0)
        valid = None if arg_sorted.valid is None else jnp.take(arg_sorted.valid, idx)
        return SCol(t, data, valid, arg_sorted.dictionary)

    # aggregates over the frame
    # running frames: [unbounded preceding .. current row]. The SQL default
    # frame (ORDER BY, no explicit frame) is RANGE ... CURRENT ROW, which
    # includes the whole peer group of the current row; explicit
    # ROWS ... CURRENT ROW cuts at the current row exactly.
    running = has_order and op.frame_start in (None, "unbounded") and (
        op.frame_end is None or op.frame_end == 0)
    peer_mode = running and (
        op.frame_end is None or (op.frame_mode == "range" and op.frame_end == 0))
    peer_end = None
    if peer_mode:
        peer_end = _run_inclusive_end(pos, ob)
    if fn == "count_star":
        vals = jnp.ones((n,), jnp.int64)
        valid_rows = None
    else:
        vals = arg_sorted.data
        valid_rows = arg_sorted.valid
    if fn in ("sum", "avg", "count", "count_star"):
        if fn == "count" or fn == "count_star":
            x = jnp.ones((n,), jnp.int64) if valid_rows is None else valid_rows.astype(jnp.int64)
        else:
            x = vals if valid_rows is None else jnp.where(valid_rows, vals, jnp.zeros_like(vals))
            if x.dtype in (jnp.int32,):
                x = x.astype(jnp.int64)
        if running:
            s = _segmented_cumsum(x, pb)
            cnt = _segmented_cumsum(
                jnp.ones((n,), jnp.int64) if valid_rows is None else valid_rows.astype(jnp.int64), pb)
            if peer_end is not None:
                s = jnp.take(s, peer_end, axis=0)
                cnt = jnp.take(cnt, peer_end)
        else:
            stot = be.segment_sum(x, seg.astype(jnp.int32), num_segments=num_parts, indices_are_sorted=True)
            s = jnp.take(stot, seg, axis=0)
            ctot = be.segment_sum(
                jnp.ones((n,), jnp.int64) if valid_rows is None else valid_rows.astype(jnp.int64),
                seg.astype(jnp.int32), num_segments=num_parts, indices_are_sorted=True)
            cnt = jnp.take(ctot, seg)
        if fn in ("count", "count_star"):
            return SCol(t, s if fn == "count" else cnt if False else s, None)
        if fn == "sum":
            return SCol(t, s, cnt > 0)
        # avg: `s` is at the argument's representation (scaled int for exact
        # decimals); produce the output type's representation
        arg_scale = (arg.type.s
                     if arg.type.kind == K.DECIMAL and not dec_is_float(arg.type)
                     else 0)
        if t.kind == K.DECIMAL and not dec_is_float(t):
            num = s.astype(jnp.int64) * (10 ** max(t.s - arg_scale, 0))
            den = jnp.maximum(cnt, 1) * (10 ** max(arg_scale - t.s, 0))
            q = jnp.sign(num) * ((jnp.abs(num) + den // 2) // den)
            return SCol(t, q.astype(jnp.int64), cnt > 0)
        num = s.astype(jnp.float64) / (10.0**arg_scale)
        return SCol(t, num / jnp.maximum(cnt, 1), cnt > 0)
    if fn in ("min", "max"):
        big = _neutral(vals.dtype, fn == "min")
        x = vals if valid_rows is None else jnp.where(valid_rows, vals, big)
        if running:
            out = _segmented_scan_minmax(x, pb, fn == "min")
            if peer_end is not None:
                out = jnp.take(out, peer_end, axis=0)
        else:
            tot = (be.segment_min if fn == "min" else be.segment_max)(
                x, seg.astype(jnp.int32), num_segments=num_parts, indices_are_sorted=True)
            out = jnp.take(tot, seg, axis=0)
        cnt_arr = jnp.ones((n,), jnp.int64) if valid_rows is None else valid_rows.astype(jnp.int64)
        if running:
            cnt = _segmented_cumsum(cnt_arr, pb)
            if peer_end is not None:
                cnt = jnp.take(cnt, peer_end)
        else:
            ctot = be.segment_sum(cnt_arr, seg.astype(jnp.int32), num_segments=num_parts, indices_are_sorted=True)
            cnt = jnp.take(ctot, seg)
        return SCol(t, out, cnt > 0, arg_sorted.dictionary)
    raise NotImplementedError(f"window function {fn}")


def _neutral(dtype, is_min: bool):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(jnp.inf if is_min else -jnp.inf, dtype)
    info = jnp.iinfo(dtype)
    return jnp.asarray(info.max if is_min else info.min, dtype)


def _segmented_scan_last_true(pos, flags):
    """For each position: the largest position <= it where flags is True."""
    v = jnp.where(flags, pos, INT64_MIN)
    return jax.lax.associative_scan(jnp.maximum, v)


def _run_inclusive_end(pos, ob):
    """Last position of each peer group (inclusive end of the run)."""
    next_start = jnp.concatenate([ob[1:], jnp.ones((1,), jnp.bool_)])
    v = jnp.where(next_start, pos, jnp.iinfo(jnp.int64).max)
    rev = jax.lax.associative_scan(jnp.minimum, v[::-1])[::-1]
    return rev
