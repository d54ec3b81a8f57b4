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
def segment_sum(vals, seg, num_segments: int, indices_are_sorted=False):
    if any_jax(vals, seg):
        return jax.ops.segment_sum(vals, seg, num_segments=num_segments,
                                   indices_are_sorted=indices_are_sorted)
    out = np.zeros((num_segments,) + np.shape(vals)[1:], dtype=np.asarray(vals).dtype)
    np.add.at(out, np.asarray(seg), np.asarray(vals))
    return out


def segment_min(vals, seg, num_segments: int, indices_are_sorted=False):
    if any_jax(vals, seg):
        return jax.ops.segment_min(vals, seg, num_segments=num_segments,
                                   indices_are_sorted=indices_are_sorted)
    vals = np.asarray(vals)
    out = np.full((num_segments,), _extreme_np(vals.dtype, True), dtype=vals.dtype)
    np.minimum.at(out, np.asarray(seg), vals)
    return out


def segment_max(vals, seg, num_segments: int, indices_are_sorted=False):
    if any_jax(vals, seg):
        return jax.ops.segment_max(vals, seg, num_segments=num_segments,
                                   indices_are_sorted=indices_are_sorted)
    vals = np.asarray(vals)
    out = np.full((num_segments,), _extreme_np(vals.dtype, False), dtype=vals.dtype)
    np.maximum.at(out, np.asarray(seg), vals)
    return out


def _extreme_np(dtype, maximum: bool):
    if np.issubdtype(dtype, np.floating):
        return np.inf if maximum else -np.inf
    if dtype == np.bool_:
        return True if maximum else False
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
