"""Table storage: columnar host tables with Arrow IPC persistence.

TPU-native equivalent of the reference's LingoDBTable
(reference: src/runtime/storage/LingoDBTable.cpp:27-120 — Arrow IPC load/store,
1024-row sample, append+flush). We persist one Arrow IPC file per table so data
dirs interoperate with Arrow tooling; in memory the table is a set of dense
numpy columns (dictionary-encoded strings), which upload to the TPU as flat
tensors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ..sql.types import K, IntervalUnit, Type
from .column import Column, physical_dtype

SAMPLE_SIZE = 1024  # reference: LingoDBTable.cpp:78-120


@dataclass
class TableStorage:
    name: str
    column_names: list[str]
    column_types: list[Type]
    columns: list[Column] = field(default_factory=list)
    num_rows: int = 0
    version: int = 0  # bumped on append; invalidates device cache

    @staticmethod
    def create(name: str, names: list[str], types: list[Type]) -> "TableStorage":
        cols = [
            Column(t, np.zeros(0, dtype=physical_dtype(t)),
                   None if not t.nullable else np.zeros(0, dtype=np.bool_),
                   np.zeros(0, dtype=object) if t.is_string else None)
            for t in types
        ]
        return TableStorage(name, list(names), list(types), cols, 0)

    def col_index(self, name: str) -> int:
        return self.column_names.index(name)

    def column(self, name: str) -> Column:
        return self.columns[self.col_index(name)]

    # ---- mutation ---------------------------------------------------------
    def append_rows(self, rows: list[list]):
        """Append Python-value rows (None = NULL)."""
        if not rows:
            return
        new_cols = []
        for i, t in enumerate(self.column_types):
            vals = [r[i] for r in rows]
            new_cols.append(Column.from_values(t, vals))
        self.append_columns(new_cols)

    def append_columns(self, new_cols: list[Column]):
        n = len(new_cols[0].data)
        if self.num_rows == 0:
            self.columns = new_cols
        else:
            self.columns = [c.concat(nc) for c, nc in zip(self.columns, new_cols)]
        self.num_rows += n
        self.version += 1

    # ---- statistics (reference: catalog Sample + HLL distinct counts) ------
    def sample_indices(self, rng: np.random.Generator | None = None) -> np.ndarray:
        if self.num_rows <= SAMPLE_SIZE:
            return np.arange(self.num_rows)
        rng = rng or np.random.default_rng(42)
        return np.sort(rng.choice(self.num_rows, size=SAMPLE_SIZE, replace=False))

    def column_stats(self) -> list[dict]:
        """Per-column stats: approximate distinct count (exact on small tables,
        sample-extrapolated otherwise, standing in for the reference's
        HyperLogLog sketches), null fraction, min/max for numerics."""
        stats = []
        idx = self.sample_indices()
        scale = self.num_rows / max(len(idx), 1)
        for c in self.columns:
            s: dict = {}
            if self.num_rows == 0:
                stats.append({"distinct": 0, "nulls": 0})
                continue
            data = c.data[idx] if len(idx) < self.num_rows else c.data
            mask = c.is_valid_mask()
            m = mask[idx] if len(idx) < self.num_rows else mask
            vals = data[m]
            d = len(np.unique(vals))
            if len(idx) < self.num_rows:
                # first-order extrapolation (Chao-ish): if nearly all sample values
                # distinct, assume proportional growth; else assume saturation.
                if d > 0.8 * len(vals):
                    d = int(d * scale)
            s["distinct"] = max(int(d), 1)
            s["nulls"] = int(self.num_rows - mask.sum())
            if c.type.is_numeric or c.type.kind in (K.DATE, K.TIMESTAMP):
                if len(vals):
                    s["min"] = int(np.min(vals)) if np.issubdtype(vals.dtype, np.integer) else float(np.min(vals))
                    s["max"] = int(np.max(vals)) if np.issubdtype(vals.dtype, np.integer) else float(np.max(vals))
            stats.append(s)
        return stats

    # ---- persistence (Arrow IPC like the reference) -------------------------
    def save(self, db_dir: str):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        arrays, fields = [], []
        for name, t, c in zip(self.column_names, self.column_types, self.columns):
            arr, f = _to_arrow(name, t, c)
            arrays.append(arr)
            fields.append(f)
        table = pa.table(dict(zip(self.column_names, arrays)))
        path = os.path.join(db_dir, f"{self.name}.arrow")
        with ipc.RecordBatchFileWriter(path, table.schema) as w:
            w.write_table(table)

    @staticmethod
    def load(name: str, db_dir: str, names: list[str], types: list[Type]) -> "TableStorage":
        import pyarrow.ipc as ipc

        path = os.path.join(db_dir, f"{name}.arrow")
        with ipc.open_file(path) as r:
            table = r.read_all()
        t = TableStorage.create(name, names, types)
        cols = []
        for cname, ctype in zip(names, types):
            arr = table.column(cname)
            cols.append(_from_arrow(ctype, arr))
        n = len(cols[0].data) if cols else 0
        t.columns = cols
        t.num_rows = n
        return t


def _to_arrow(name: str, t: Type, c: Column, decimal_as_int: bool = True):
    import pyarrow as pa

    mask = None if c.valid is None else ~c.valid
    if t.is_string:
        if decimal_as_int:
            # persistence fast path: keep the dictionary encoding (codes +
            # sorted dictionary), no per-value Python loop on either side
            codes = pa.array(c.data.astype(np.int32), mask=mask)
            dct = pa.array(c.dictionary, type=pa.string())
            arr = pa.DictionaryArray.from_arrays(codes, dct)
            return arr, pa.field(name, arr.type, t.nullable)
        vals = c.dictionary[c.data] if len(c.data) else np.zeros(0, dtype=object)
        arr = pa.array(vals, type=pa.string(), mask=mask)
        return arr, pa.field(name, pa.string(), t.nullable)
    if t.kind == K.DECIMAL:
        if c.data.dtype == np.object_:
            # wide (Python-int) column: decimal128 round-trips exactly
            from decimal import Decimal

            dt = pa.decimal128(38, t.s)
            vals = [
                None if (mask is not None and mask[i])
                else Decimal(int(c.data[i])).scaleb(-t.s)
                for i in range(len(c.data))
            ]
            arr = pa.array(vals, type=dt)
            return arr, pa.field(name, dt, t.nullable)
        if decimal_as_int:
            # persist the scaled-int64 representation directly (fast bulk
            # path); the logical decimal type lives in catalog.json.
            # _from_arrow accepts both this form and real decimal128 columns
            # (LingoDB data dirs).
            arr = pa.array(c.data, mask=mask)
            return arr, pa.field(name, arr.type, t.nullable)
        # reinterpret scaled int64 as decimal128 by building the 16-byte
        # little-endian two's-complement buffer directly (vectorized)
        dt = pa.decimal128(max(t.p, 1), t.s)
        lo = c.data.astype(np.int64)
        hi = np.where(lo < 0, np.int64(-1), np.int64(0))
        buf = np.empty((len(lo), 2), dtype=np.int64)
        buf[:, 0] = lo
        buf[:, 1] = hi
        validbuf = None
        if mask is not None:
            validbuf = pa.array(~mask).buffers()[1]
        arr = pa.Array.from_buffers(
            dt, len(lo), [validbuf, pa.py_buffer(buf.tobytes())],
            null_count=int(mask.sum()) if mask is not None else 0,
        )
        return arr, pa.field(name, dt, t.nullable)
    if t.kind == K.DATE:
        arr = pa.array(c.data.astype("datetime64[D]"), mask=mask)
        return arr, pa.field(name, pa.date32(), t.nullable)
    if t.kind == K.TIMESTAMP:
        arr = pa.array(c.data.astype("datetime64[us]"), mask=mask)
        return arr, pa.field(name, pa.timestamp("us"), t.nullable)
    arr = pa.array(c.data, mask=mask)
    return arr, pa.field(name, arr.type, t.nullable)


def _from_arrow(t: Type, chunked) -> Column:
    import pyarrow as pa

    arr = chunked.combine_chunks() if hasattr(chunked, "combine_chunks") else chunked
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0) if arr.num_chunks == 1 else pa.concat_arrays(arr.chunks)
    valid = None
    if arr.null_count:
        valid = ~np.asarray(arr.is_null())
    if t.is_string:
        from .column import encode_strings

        if pa.types.is_dictionary(arr.type):
            dct = np.asarray(arr.dictionary.to_pylist(), dtype=object)
            codes = np.asarray(arr.indices.fill_null(0) if arr.null_count else arr.indices)
            codes = codes.astype(np.int32)
            if len(dct) > 1 and not np.all(dct[:-1] <= dct[1:]):
                # foreign file with unsorted dictionary: re-sort (engine
                # invariant: dictionaries are sorted for order-preserving
                # comparisons on codes)
                order = np.argsort(dct)
                remap = np.empty(len(dct), np.int32)
                remap[order] = np.arange(len(dct), dtype=np.int32)
                dct = dct[order]
                codes = remap[codes]
            return Column(t, codes, valid, dct)
        # plain string column (foreign file): dictionary-encode in Arrow C++
        # (no per-value Python), then sort the dictionary for our order-
        # preserving code invariant
        import pyarrow.compute as pc

        if arr.null_count:
            arr = arr.fill_null("")
        enc = pc.dictionary_encode(arr)
        dct = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        codes = np.asarray(enc.indices).astype(np.int32)
        order = np.argsort(dct)
        remap = np.empty(len(dct), np.int32)
        remap[order] = np.arange(len(dct), dtype=np.int32)
        return Column(t, remap[codes] if len(dct) else codes, valid,
                      dct[order])
    if t.kind == K.DECIMAL:
        if pa.types.is_integer(arr.type):  # our scaled-int64 persistence form
            data = np.asarray(arr.fill_null(0) if arr.null_count else arr)
            return Column(t, data.astype(np.int64), valid)
        pyvals = [0 if v is None else int(v.scaleb(t.s)) for v in arr.to_pylist()]
        if all(-(1 << 63) <= v < (1 << 63) for v in pyvals):
            return Column(t, np.array(pyvals, dtype=np.int64), valid)
        return Column(t, np.array(pyvals, dtype=np.object_), valid)
    if t.kind == K.DATE:
        days = np.asarray(arr.cast(pa.int32()))
        return Column(t, days.astype(np.int32), valid)
    if t.kind == K.TIMESTAMP:
        us = np.asarray(arr.cast(pa.int64()))
        return Column(t, us.astype(np.int64), valid)
    data = np.asarray(arr)
    return Column(t, np.ascontiguousarray(data, dtype=physical_dtype(t)), valid)


def arrow_type_for(t: Type):
    """Arrow type to parse a column as (used by the CSV COPY loader)."""
    import pyarrow as pa

    if t.kind == K.DECIMAL:
        return pa.decimal128(max(t.p, 1), t.s)
    if t.kind == K.DATE:
        return pa.date32()
    if t.kind == K.TIMESTAMP:
        return pa.timestamp("us")
    if t.kind == K.BOOL:
        return pa.bool_()
    if t.kind == K.INT:
        return pa.int32()
    if t.kind == K.BIGINT:
        return pa.int64()
    if t.kind == K.SMALLINT:
        return pa.int16()
    if t.kind == K.FLOAT:
        return pa.float32()
    if t.kind == K.DOUBLE:
        return pa.float64()
    return pa.string()
