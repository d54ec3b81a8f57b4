"""Dual numpy/JAX array backend.

Small host-resident tables execute with plain numpy (zero XLA compilation,
microsecond dispatch — the equivalent of the reference running short queries
through its fast Baseline backend instead of the optimizing JIT,
src/execution/baseline/); large device-resident tables and everything inside
jit traces execute with jax.numpy. Dispatch is automatic per call: if any
argument is a JAX array or tracer, the jnp implementation runs.

`xnp` is a drop-in replacement for the `jnp` module object within this
package. jax.lax / jax.ops specifics (multi-key sort, segment reductions,
scatter updates) have explicit twins below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def is_jax(x) -> bool:
    return isinstance(x, (jax.Array, jax.core.Tracer))


def is_tracer(x) -> bool:
    """True only under an active trace (jit): the value CANNOT leave the
    device; a concrete jax.Array can (device_get)."""
    return isinstance(x, jax.core.Tracer)


def any_jax(*values) -> bool:
    for v in jax.tree_util.tree_leaves(values):
        if is_jax(v):
            return True
    return False


class _XNP:
    """Attribute proxy: xnp.foo(...) -> np.foo or jnp.foo per arguments."""

    def __getattr__(self, name):
        jf = getattr(jnp, name)
        nf = getattr(np, name, None)
        if isinstance(jf, type) or not callable(jf):
            return jf  # dtypes like int64/bool_, constants like inf/newaxis
        if nf is None:
            return jf

        def call(*args, **kwargs):
            if any_jax(args, kwargs):
                return jf(*args, **kwargs)
            if name == "nonzero" and "size" in kwargs:
                kwargs = {k: v for k, v in kwargs.items() if k != "size"}
            return nf(*args, **kwargs)

        call.__name__ = name
        return call


xnp = _XNP()


# ------------------------------------------------------------------ sorting
def multi_sort(operands: list, num_keys: int) -> list:
    """Lexicographic multi-key sort of parallel arrays; the non-key trailing
    operands are permuted along (jax.lax.sort semantics)."""
    if any_jax(operands):
        return list(jax.lax.sort(operands, num_keys=num_keys))
    keys = operands[:num_keys]
    perm = np.lexsort(tuple(reversed(keys)))
    return [np.asarray(o)[perm] for o in operands]


# ------------------------------------------------------- segment reductions
#
# XLA:TPU lowers scatter-with-duplicate-indices to a serialized loop (~440ms
# for 6M rows measured through this environment's chip), so jax.ops.segment_*
# is the LAST resort on TPU. Strategy ladder (TPU only; CPU scatter is fast):
#   small domain  (D <= MASKED_LIMIT): per-group masked reductions — XLA fuses
#                 the broadcast-compare-reduce into one streaming pass.
#   sorted seg    : sum via cumsum + boundary gather; min/max via a segmented
#                 associative scan + boundary gather (O(N log N) vector work).
#   otherwise     : scatter fallback.
MASKED_LIMIT = 64


def _tpu_target() -> bool:
    return jax.default_backend() != "cpu"


def _segment_via_mask(vals, seg, num_segments, kind):
    ids = jnp.arange(num_segments, dtype=seg.dtype)
    onehot = seg[None, :] == ids[:, None]  # D x N, fused by XLA (never materialized)
    if kind == "sum":
        contrib = jnp.where(onehot, vals[None, :], jnp.zeros_like(vals)[None, :])
        return jnp.sum(contrib, axis=1)
    sentinel = _extreme(vals.dtype, maximum=(kind == "min"))
    contrib = jnp.where(onehot, vals[None, :], sentinel)
    red = jnp.min if kind == "min" else jnp.max
    return red(contrib, axis=1)


def _sorted_segment_sum(vals, seg, num_segments):
    cs = jnp.cumsum(vals, dtype=vals.dtype)
    ids = jnp.arange(num_segments, dtype=seg.dtype)
    ends = jnp.searchsorted(seg, ids, side="right")
    tot = jnp.where(ends > 0, cs[jnp.maximum(ends - 1, 0)], jnp.zeros((), vals.dtype))
    starts = jnp.searchsorted(seg, ids, side="left")
    lo = jnp.where(starts > 0, cs[jnp.maximum(starts - 1, 0)], jnp.zeros((), vals.dtype))
    return tot - lo


def _sorted_segment_minmax(vals, seg, num_segments, kind):
    # inclusive segmented scan: carry resets at segment starts
    n = vals.shape[0]
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), seg[1:] != seg[:-1]]) if n else jnp.zeros((0,), jnp.bool_)
    op = jnp.minimum if kind == "min" else jnp.maximum

    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, op(av, bv))

    _, scanned = jax.lax.associative_scan(combine, (starts, vals))
    ids = jnp.arange(num_segments, dtype=seg.dtype)
    ends = jnp.searchsorted(seg, ids, side="right")
    empty = ends == jnp.searchsorted(seg, ids, side="left")
    sentinel = _extreme(vals.dtype, maximum=(kind == "min"))
    return jnp.where(empty, sentinel, scanned[jnp.maximum(ends - 1, 0)])


def _extreme(dtype, maximum: bool):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf if maximum else -jnp.inf, dtype)
    if dtype == jnp.bool_:
        return jnp.array(maximum, dtype)
    info = jnp.iinfo(dtype)
    return jnp.array(info.max if maximum else info.min, dtype)


def _segment_jax(vals, seg, num_segments, indices_are_sorted, kind):
    flat = vals.ndim == 1
    if flat and num_segments > 0 and _tpu_target():
        if indices_are_sorted:
            if kind == "sum":
                return _sorted_segment_sum(vals, seg, num_segments)
            return _sorted_segment_minmax(vals, seg, num_segments, kind)
        if num_segments <= MASKED_LIMIT:
            return _segment_via_mask(vals, seg, num_segments, kind)
        # medium/large domain, unsorted: sort by segment id in-kernel, then
        # use the sorted strategy — ~10x faster than TPU scatter at 6M rows
        sseg, svals = jax.lax.sort([seg, vals], num_keys=1)
        if kind == "sum":
            return _sorted_segment_sum(svals, sseg, num_segments)
        return _sorted_segment_minmax(svals, sseg, num_segments, kind)
    f = {"sum": jax.ops.segment_sum, "min": jax.ops.segment_min,
         "max": jax.ops.segment_max}[kind]
    return f(vals, seg, num_segments=num_segments,
             indices_are_sorted=indices_are_sorted)


def segment_sum(vals, seg, num_segments: int, indices_are_sorted=False):
    if any_jax(vals, seg):
        return _segment_jax(vals, seg, num_segments, indices_are_sorted, "sum")
    out = np.zeros((num_segments,) + np.shape(vals)[1:], dtype=np.asarray(vals).dtype)
    np.add.at(out, np.asarray(seg), np.asarray(vals))
    return out


def segment_min(vals, seg, num_segments: int, indices_are_sorted=False):
    if any_jax(vals, seg):
        return _segment_jax(vals, seg, num_segments, indices_are_sorted, "min")
    vals = np.asarray(vals)
    out = np.full((num_segments,), _extreme_np(vals.dtype, True), dtype=vals.dtype)
    np.minimum.at(out, np.asarray(seg), vals)
    return out


def segment_max(vals, seg, num_segments: int, indices_are_sorted=False):
    if any_jax(vals, seg):
        return _segment_jax(vals, seg, num_segments, indices_are_sorted, "max")
    vals = np.asarray(vals)
    out = np.full((num_segments,), _extreme_np(vals.dtype, False), dtype=vals.dtype)
    np.maximum.at(out, np.asarray(seg), vals)
    return out


def _extreme_np(dtype, maximum: bool):
    if np.issubdtype(dtype, np.floating):
        return np.inf if maximum else -np.inf
    if dtype == np.bool_:
        return True if maximum else False
    if dtype == np.object_:
        # wide-decimal sentinel: beyond any decimal(38) scaled value
        return 10**40 if maximum else -(10**40)
    info = np.iinfo(dtype)
    return info.max if maximum else info.min


# ------------------------------------------------------------------ scatter
def set_at(arr, idx, vals):
    """arr.at[idx].set(vals) with a numpy twin (copy-on-write semantics)."""
    if any_jax(arr, idx, vals):
        return jnp.asarray(arr).at[idx].set(vals)
    out = np.array(arr, copy=True)
    out[idx] = vals
    return out


def first_true(n: int, like=None):
    """Length-n bool vector with only position 0 True."""
    if like is not None and is_jax(like):
        return jnp.zeros((n,), jnp.bool_).at[0].set(True)
    out = np.zeros((n,), np.bool_)
    if n:
        out[0] = True
    return out


def cummax(v):
    """Cumulative maximum (jax: associative scan; numpy: ufunc accumulate)."""
    if is_jax(v):
        return jax.lax.associative_scan(jnp.maximum, v)
    return np.maximum.accumulate(v)


def rev_cummin(v):
    """Reverse cumulative minimum: out[i] = min(v[i:])."""
    if is_jax(v):
        return jax.lax.associative_scan(jnp.minimum, v[::-1])[::-1]
    return np.minimum.accumulate(v[::-1])[::-1]


def segmented_scan_minmax(vals, pb, is_min: bool):
    """Within-segment running min/max; pb flags segment starts (Blelloch-style
    segmented scan; jax: associative_scan over (value, flag) pairs; numpy:
    the same combine via log2(n) Hillis-Steele doubling passes)."""
    if any_jax(vals, pb):
        def combine(a, b):
            av, af = a
            bv, bf = b
            m = jnp.minimum(av, bv) if is_min else jnp.maximum(av, bv)
            return jnp.where(bf, bv, m), af | bf

        out, _ = jax.lax.associative_scan(combine, (jnp.asarray(vals),
                                                    jnp.asarray(pb)))
        return out
    v = np.array(vals, copy=True)
    f = np.array(pb, copy=True)
    n = len(v)
    d = 1
    while d < n:
        pv, pf = v[:-d], f[:-d]
        nv, nf = v[d:], f[d:]
        m = np.minimum(pv, nv) if is_min else np.maximum(pv, nv)
        v = np.concatenate([v[:d], np.where(nf, nv, m)])
        f = np.concatenate([f[:d], pf | nf])
        d *= 2
    return v


def lut_take(lut, codes):
    """Gather a lookup table by (possibly traced) codes. Routes through the
    Pallas-aware dispatcher: big-LUT gathers otherwise hit XLA's ~770x-SOL
    1-D gather (bench_results/op_sol.log)."""
    if is_jax(codes):
        import jax.numpy as jnp_

        from . import pgather

        return pgather.take_fast(jnp_.asarray(lut), codes)
    return np.asarray(lut)[np.asarray(codes)]
