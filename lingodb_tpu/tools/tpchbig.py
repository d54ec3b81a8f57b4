"""Large-SF lineitem subset for out-of-core benchmarks (Q1/Q6 @ SF100).

Generates ONLY the lineitem columns TPC-H Q1 and Q6 read — quantity,
extendedprice, discount, tax, returnflag, linestatus, shipdate — slice by
slice with bounded temporaries, so SF100 (~600M rows) generates in minutes
inside host RAM and ~26 GB of cache. Value distributions follow the same
spec rules as tools/tpchgen.py's lineitem block (quantity U[1,50],
discount 0.00-0.10, tax 0.00-0.08, retail price from the part formula,
ship/receipt date offsets, returnflag/linestatus date rules). Strings and
the order linkage are omitted: Q1/Q6 never read them, and the subset
registers as table `lineitem`, so those queries run verbatim.

The resulting table's Q6-hot columns (~17 GB at SF100) exceed a single
v5e chip's HBM: exactly the shape the executor's out-of-core chunked
scan+aggregate path (_try_chunked_agg) exists for — the reference streams
arbitrary-size tables morsel-wise by construction
(reference: src/runtime/storage/LingoDBTable.cpp:360-470).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..sql.types import Type
from ..storage.column import Column
from ..storage.table import TableStorage
from .tpchgen import EPOCH, _cache_dir

SLICE = 1 << 24  # 16M rows per generation slice (~1 GB of temporaries)

RF_DICT = np.array(["A", "N", "R"], dtype=object)   # sorted
LS_DICT = np.array(["F", "O"], dtype=object)        # sorted


def _gen_subset(sf: float, seed: int) -> TableStorage:
    n_li = int(6_000_000 * sf)
    n_part = max(int(200_000 * sf), 40)
    d0 = (np.datetime64("1992-01-01") - EPOCH).astype(np.int64)
    d1 = (np.datetime64("1998-08-02") - EPOCH).astype(np.int64)
    current = (np.datetime64("1995-06-17") - EPOCH).astype(np.int64)

    qty = np.empty(n_li, np.int64)
    extp = np.empty(n_li, np.int64)
    disc = np.empty(n_li, np.int64)
    tax = np.empty(n_li, np.int64)
    rf = np.empty(n_li, np.int32)
    ls = np.empty(n_li, np.int32)
    ship = np.empty(n_li, np.int32)

    rng = np.random.default_rng(seed)
    for lo in range(0, n_li, SLICE):
        hi = min(n_li, lo + SLICE)
        m = hi - lo
        q = rng.integers(1, 51, m)
        part = rng.integers(1, n_part + 1, m)
        retail = (90000 + ((part // 10) % 20001) + 100 * (part % 1000))
        qty[lo:hi] = q * 100  # scale-2 decimal
        extp[lo:hi] = q * retail
        disc[lo:hi] = rng.integers(0, 11, m)
        tax[lo:hi] = rng.integers(0, 9, m)
        odate = rng.integers(d0, d1 + 1, m)
        sd = odate + rng.integers(1, 122, m)
        rd = sd + rng.integers(1, 31, m)
        ship[lo:hi] = sd.astype(np.int32)
        # returnflag: R/A when receipt <= current else N (codes into RF_DICT)
        ra = rng.integers(0, 2, m)  # 0 -> A, 1 -> R
        rf[lo:hi] = np.where(rd <= current,
                             np.where(ra == 1, 2, 0), 1).astype(np.int32)
        ls[lo:hi] = (sd > current).astype(np.int32)  # F=0, O=1

    cols = {
        "l_quantity": Column(Type.decimal(15, 2), qty, None, None),
        "l_extendedprice": Column(Type.decimal(15, 2), extp, None, None),
        "l_discount": Column(Type.decimal(15, 2), disc, None, None),
        "l_tax": Column(Type.decimal(15, 2), tax, None, None),
        "l_returnflag": Column(Type.char(1), rf, None, RF_DICT),
        "l_linestatus": Column(Type.char(1), ls, None, LS_DICT),
        "l_shipdate": Column(Type.date(), ship, None, None),
    }
    names = list(cols)
    columns = list(cols.values())
    return TableStorage("lineitem", names, [c.type for c in columns],
                        columns, n_li)


def generate_cached(sf: float, seed: int = 19920601) -> TableStorage:
    from ..catalog.catalog import type_from_json, type_to_json

    d = _cache_dir(sf, seed) + "_li6"
    meta_path = os.path.join(d, "schema.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        sch = meta["lineitem"]
        return TableStorage.load(
            "lineitem", d, [c[0] for c in sch],
            [type_from_json(c[1]) for c in sch])
    t = _gen_subset(sf, seed)
    try:
        os.makedirs(d, exist_ok=True)
        t.save(d)
        json.dump({"lineitem": [[n, type_to_json(ty)] for n, ty in
                                zip(t.column_names, t.column_types)]},
                  open(meta_path, "w"))
    except Exception:
        pass
    return t


def load_into(session, sf: float, seed: int = 19920601) -> TableStorage:
    """Register the big-SF lineitem subset as table `lineitem`."""
    from ..catalog.catalog import TableEntry

    t = generate_cached(sf, seed)
    session.catalog.tables["lineitem"] = TableEntry(
        "lineitem", t.column_names, t.column_types,
        [], t)
    return t
