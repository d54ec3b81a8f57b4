"""Device-resident columnar data.

TPU-native replacement for the reference's ExecutionContext-managed runtime
buffers (reference: include/lingodb/runtime/ExecutionContext.h, Buffer.h).
Intermediate query state is a VTable: a set of flat device tensors (one per
column) plus host-side string dictionaries. All device tensors in one VTable
share the same leading length.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import functools
import numpy as np

from ..sql.types import K, IntervalUnit, Type


@functools.partial(jax.jit, static_argnames=("monotone",))
def _gather_tree(idx, arrays: dict, monotone: bool = False):
    """One fused gather over a pytree of equal-length columns. Routes through
    the batched Pallas gather kernels (ops/pgather.py) on the chip — XLA's
    1-D random gather is ~770x off memory bandwidth there, and batching the
    whole column group into one kernel amortizes both the ~10 s-per-kernel
    remote Mosaic compile and the per-plane index decode; monotone=True
    additionally enables the windowed sorted-gather kernel (safe: a wrong
    hint is caught by the kernel's overflow flag and falls back to XLA)."""
    from ..ops import pgather as pg

    bidx = jnp.maximum(idx, 0)
    keys = list(arrays)
    outs = pg.take_fast_multi([arrays[k] for k in keys], bidx,
                              monotone=monotone)
    return dict(zip(keys, outs))


def jnp_dtype(t: Type):
    """Physical device dtype for a logical type (see sql/types.py docstring)."""
    if t.kind == K.BOOL:
        return jnp.bool_
    if t.kind == K.INT:
        return jnp.int32
    if t.kind == K.BIGINT:
        return jnp.int64
    if t.kind == K.FLOAT:
        return jnp.float32
    if t.kind == K.DOUBLE:
        return jnp.float64
    if t.kind == K.DECIMAL:
        # wide decimals (dec_is_wide) default to scaled int64 physically;
        # values that genuinely need more than 63 bits live in host object
        # arrays of Python ints (see storage/column.py + ops/scalar.py)
        return jnp.int64
    if t.kind in (K.STRING, K.CHAR):
        return jnp.int32
    if t.kind == K.DATE:
        return jnp.int32
    if t.kind == K.TIMESTAMP:
        return jnp.int64
    if t.kind == K.INTERVAL:
        return jnp.int32 if t.unit == IntervalUnit.MONTH else jnp.int64
    if t.kind == K.NULL:
        return jnp.int32
    raise NotImplementedError(str(t))


def dec_is_wide(t: Type) -> bool:
    """Decimals that may not fit a scaled int64 (precision or scale > 18).
    Wide columns are stored as host numpy object arrays of Python ints
    (exact arbitrary precision — a superset of the reference's i128,
    DBToStd/LowerToStd.cpp:128-330) and never upload to the device; device
    programs that produce wide SUM results accumulate in 32-bit-split int64
    lanes and recombine exactly on the host."""
    return t.kind == K.DECIMAL and (t.p > 18 or t.s > 18)


def dec_is_float(t: Type) -> bool:
    """Legacy predicate from the float64 fallback era: wide decimals are now
    exact (see dec_is_wide), so no decimal is ever float-backed."""
    return False


def is_obj(a) -> bool:
    """True for host object-dtype arrays (Python-int decimal limbs)."""
    return isinstance(a, np.ndarray) and a.dtype == np.object_


def _host_idx(idx) -> np.ndarray:
    """Fetch an index/mask array to the host for object-column gathers."""
    if isinstance(idx, np.ndarray):
        return idx
    import jax

    return np.asarray(jax.device_get(idx))


@dataclass
class SCol:
    """One device column: data tensor + optional validity + host dictionary."""

    type: Type
    data: jax.Array
    valid: Optional[jax.Array] = None  # bool tensor, True = present
    dictionary: Optional[np.ndarray] = None  # host np object array (strings)

    def __len__(self):
        return int(self.data.shape[0])

    def valid_mask(self):
        if self.valid is None:
            from ..ops.backend import xnp

            return xnp.ones(self.data.shape[0], dtype=np.bool_)
        return self.valid

    def take(self, idx, monotone: bool = False) -> "SCol":
        from ..ops import pgather as pg

        data = self.data
        if is_obj(data):  # host-only wide-decimal column: numpy gather
            idx = _host_idx(idx)
            return SCol(
                self.type, data[idx],
                None if self.valid is None else np.asarray(self.valid)[idx],
                self.dictionary)
        return SCol(
            self.type,
            pg.take_fast(data, idx, monotone=monotone),
            None if self.valid is None
            else pg.take_fast(self.valid, idx, monotone=monotone),
            self.dictionary,
        )

    def take_with_invalid(self, idx, oob_invalid, monotone: bool = False) -> "SCol":
        """Gather, then mark rows where oob_invalid is True as NULL (used for
        outer joins: unmatched rows gather slot 0 but become NULL)."""
        from ..ops.backend import xnp
        from ..ops import pgather as pg

        if is_obj(self.data):
            idx = _host_idx(idx)
            oob_invalid = _host_idx(oob_invalid).astype(np.bool_)
        bidx = xnp.maximum(idx, 0)
        data = pg.take_fast(self.data, bidx, monotone=monotone)
        base = (
            pg.take_fast(self.valid, bidx, monotone=monotone)
            if self.valid is not None
            else xnp.ones(idx.shape[0], np.bool_)
        )
        return SCol(self.type.as_nullable(), data, base & ~oob_invalid, self.dictionary)


@dataclass
class VTable:
    """Intermediate relational result: cid -> SCol, all of equal length.

    row_valid is an optional selection vector (True = live row) used by the
    eager mesh path: compacting a GSPMD-sharded table is a global gather
    whose cost scales with survivor count (~86 s at 600 k rows on the
    virtual 8-device host mesh, measured in benchtools/mesh_compact_bench),
    while the keyed exchanges that sharded joins/aggregations run anyway
    drop dead rows for free. So big sharded operators defer compaction by
    carrying the mask instead — the TPU-mesh analogue of the reference's
    morsel selection running filters before materializing
    (reference: ScanBatchesTask restriction evaluation,
    src/runtime/storage/LingoDBTable.cpp:360-470). Operators that need a
    dense table call .dense()."""

    cols: dict[int, SCol] = field(default_factory=dict)
    num_rows: int = 0
    row_valid: Optional[jax.Array] = None

    def col(self, cid: int) -> SCol:
        return self.cols[cid]

    def dense(self) -> "VTable":
        """Materialize the selection vector (global compaction). The slow
        fallback — hot mesh operators consume row_valid directly instead."""
        if self.row_valid is None:
            return self
        inner = VTable(self.cols, self.num_rows)
        return inner.select_mask(self.row_valid)

    def take(self, idx, n: int, monotone: bool = False) -> "VTable":
        """Gather all columns with ONE device call (jitted pytree gather) on
        the accelerator; plain numpy fancy-indexing on host tables."""
        from ..ops.backend import any_jax

        assert self.row_valid is None, \
            "take() on a selection-vector VTable: call .dense() first " \
            "(indices would address the padded layout)"
        arrays = {}
        obj_arrays = {}
        for cid, c in self.cols.items():
            # wide-decimal object columns are host-only: gather with numpy
            (obj_arrays if is_obj(c.data) else arrays)[("d", cid)] = c.data
            if c.valid is not None:
                arrays[("v", cid)] = c.valid
        if arrays and any_jax(idx, arrays):
            out = _gather_tree(idx, arrays, monotone)
        else:
            bidx = np.maximum(np.asarray(idx), 0)
            out = {k: np.take(a, bidx, axis=0) for k, a in arrays.items()}
        if obj_arrays:
            import jax

            hidx = np.maximum(np.asarray(jax.device_get(idx)), 0)
            out.update({k: a[hidx] for k, a in obj_arrays.items()})
        cols = {}
        for cid, c in self.cols.items():
            cols[cid] = SCol(c.type, out[("d", cid)], out.get(("v", cid)), c.dictionary)
        return VTable(cols, n)

    def select_mask(self, mask) -> "VTable":
        """Compact rows where mask is True (one host sync for the count)."""
        from ..ops.backend import xnp

        if mask.ndim == 0:
            mask = xnp.broadcast_to(mask, (self.num_rows,))
        if self.row_valid is not None:
            mask = mask & self.row_valid
            return VTable(self.cols, self.num_rows).select_mask(mask)
        n = int(xnp.sum(mask))
        if n == self.num_rows:
            return self
        import jax as _jax

        from ..ops import pgather as pg

        if isinstance(mask, _jax.Array) and pg.use_pallas() and n:
            _, idx = pg.nonzero_positions(mask, n)
        else:
            (idx,) = xnp.nonzero(mask, size=n)
        return self.take(idx, n, monotone=True)

    def merge(self, other: "VTable") -> "VTable":
        assert self.num_rows == other.num_rows or not self.cols or not other.cols
        assert other.row_valid is None or self.row_valid is other.row_valid
        cols = dict(self.cols)
        cols.update(other.cols)
        return VTable(cols, max(self.num_rows, other.num_rows),
                      row_valid=self.row_valid)
