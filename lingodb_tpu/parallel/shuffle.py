"""Distributed keyed-shuffle execution over the device mesh.

TPU-native equivalent of the reference's compiler-decided state partitioning
(reference: ParallelizePass.cpp:34-97 decides per shared state between
thread-local+merge and lock-wrapped access; PreAggregationHashtable.cpp's
64-partition fragments are the repartition analogue). Here the mesh axis
replaces worker threads:

  exchange      ragged all-to-all routing each row to shard = dest (usually
                hash(key) % n). Two phases: an exact per-(src,dst) count
                program picks the static buffer capacity, then one collective
                moves the rows. No row is ever dropped (capacity is exact),
                and no operand is replicated.
  local join    per-shard sort/searchsorted equi-join over the exchanged rows
                (equal keys are co-located after the exchange) with a count
                pass fixing the static pair capacity, all inside shard_map —
                payload gathers stay on-shard.
  local groupby per-shard grouping of exchanged rows: after a keyed exchange
                every group lives on exactly one shard, so the local
                aggregation is final (no psum / merge needed) — the
                large-domain counterpart of partial_agg_then_psum.

All programs are jitted once per (mesh, capacity, dtype-signature) and cached.
Host syncs: one per capacity decision (counts / pair totals) plus the final
compaction — matching the executor's one-sync-per-size-change contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)

# observability: how often each shuffle strategy ran (tests assert on these)
STATS = {"exchanges": 0, "joins": 0, "groupbys": 0, "skew_splits": 0,
         "sorts": 0}

_JIT_CACHE: dict = {}


def _cached(key, builder):
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = builder()
        _JIT_CACHE[key] = fn
    return fn


def _axis(mesh) -> str:
    return mesh.axis_names[0]


def shard_put(mesh, arr, n_rows=None):
    """Pad a 1-D array to a multiple of the mesh axis and row-shard it.
    Returns (sharded_array, pad_count)."""
    ax = _axis(mesh)
    n = mesh.shape[ax]
    arr = jnp.asarray(arr)
    rows = arr.shape[0] if n_rows is None else n_rows
    pad = (-rows) % n
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return jax.device_put(arr, NamedSharding(mesh, P(ax))), pad


# --------------------------------------------------------------- exchange
def _counts_fn(mesh):
    ax = _axis(mesh)
    n = mesh.shape[ax]

    def local(d, v):
        dd = jnp.where(v, d.astype(jnp.int32), jnp.int32(n))
        ds = jnp.sort(dd)
        bounds = jnp.searchsorted(ds, jnp.arange(n + 1, dtype=jnp.int32))
        return (bounds[1:] - bounds[:n]).astype(jnp.int32)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(ax), P(ax)), out_specs=P(ax)))


def _exchange_fn(mesh, cap, dtypes):
    ax = _axis(mesh)
    n = mesh.shape[ax]

    def local(d, v, *cs):
        m = d.shape[0]
        dd = jnp.where(v, d.astype(jnp.int32), jnp.int32(n))
        order = jnp.argsort(dd)
        ds = jnp.take(dd, order)
        bounds = jnp.searchsorted(ds, jnp.arange(n + 1, dtype=jnp.int32))
        starts, cnt = bounds[:n], bounds[1:] - bounds[:n]
        pos = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        ok = jnp.arange(cap, dtype=jnp.int32)[None, :] < cnt[:, None]
        src = jnp.take(order, jnp.clip(pos, 0, m - 1))
        outs = [jax.lax.all_to_all(ok, ax, 0, 0).reshape(-1)]
        for c in cs:
            buf = jnp.where(ok, jnp.take(c, src), jnp.zeros((), c.dtype))
            outs.append(jax.lax.all_to_all(buf, ax, 0, 0).reshape(-1))
        return tuple(outs)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ax),) * (2 + len(dtypes)),
        out_specs=(P(ax),) * (1 + len(dtypes))))


def exchange(mesh, dest, arrays: list, valid=None):
    """Route rows to shards. dest: per-row destination shard (int); valid:
    rows to keep (None = all). Returns (out_valid, out_arrays, local_len):
    sharded arrays of global length n * local_len whose shard-s segment holds
    the rows routed to shard s (padding marked invalid)."""
    ax = _axis(mesh)
    n = mesh.shape[ax]
    rows = int(dest.shape[0])
    if valid is None:
        valid = jnp.ones((rows,), jnp.bool_)
    d_s, pad = shard_put(mesh, dest)
    v_s, _ = shard_put(mesh, valid)  # zero-pad = False = dropped
    counts = np.asarray(jax.device_get(_cached(("cnt", n), lambda: _counts_fn(mesh))(d_s, v_s)))
    cap = max(int(counts.max()), 1)
    dtypes = tuple(str(a.dtype) for a in arrays)
    fn = _cached(("ex", n, cap, dtypes), lambda: _exchange_fn(mesh, cap, dtypes))
    ins = [shard_put(mesh, a)[0] for a in arrays]
    out = fn(d_s, v_s, *ins)
    STATS["exchanges"] += 1
    return out[0], list(out[1:]), n * cap


def hash_dest(mesh, h):
    """Destination shard for a uint64 hash column."""
    n = mesh.shape[_axis(mesh)]
    return (h % jnp.uint64(n)).astype(jnp.int32)


def dest_counts(mesh, dest, valid=None):
    """Per-(source, destination) routed row counts as a host (n, n) matrix —
    used for skew detection before committing to an exchange."""
    n = mesh.shape[_axis(mesh)]
    rows = int(dest.shape[0])
    if valid is None:
        valid = jnp.ones((rows,), jnp.bool_)
    d_s, _ = shard_put(mesh, dest)
    v_s, _ = shard_put(mesh, valid)
    counts = np.asarray(jax.device_get(
        _cached(("cnt", n), lambda: _counts_fn(mesh))(d_s, v_s)))
    return counts.reshape(n, n)


# --------------------------------------------------------------- local join
def _join_count_fn(mesh):
    ax = _axis(mesh)

    def local(bh, bv, ph, pv):
        bh2 = jnp.where(bv, bh, jnp.uint64(_U64_MAX))
        sb = jnp.sort(bh2)
        s = jnp.searchsorted(sb, ph, side="left")
        e = jnp.searchsorted(sb, ph, side="right")
        cnt = jnp.where(pv, e - s, 0)
        return jnp.sum(cnt).astype(jnp.int64)[None]

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(ax),) * 4, out_specs=P(ax)))


def _join_expand_fn(mesh, cap_out, n_build_payload, n_probe_payload, dtypes):
    ax = _axis(mesh)

    def local(bh, bv, ph, pv, *payload):
        bcols = payload[:n_build_payload]
        pcols = payload[n_build_payload:]
        mb = bh.shape[0]
        bh2 = jnp.where(bv, bh, jnp.uint64(_U64_MAX))
        order = jnp.argsort(bh2)
        sb = jnp.take(bh2, order)
        s = jnp.searchsorted(sb, ph, side="left")
        e = jnp.searchsorted(sb, ph, side="right")
        cnt = jnp.where(pv, e - s, 0)
        offs_incl = jnp.cumsum(cnt)
        offs_excl = offs_incl - cnt
        total = offs_incl[-1] if cnt.shape[0] else jnp.int64(0)
        pos = jnp.arange(cap_out, dtype=offs_incl.dtype)
        probe_of = jnp.searchsorted(offs_incl, pos, side="right")
        probe_of = jnp.clip(probe_of, 0, cnt.shape[0] - 1)
        within = pos - jnp.take(offs_excl, probe_of)
        slot = jnp.take(s, probe_of) + within
        build_of = jnp.take(order, jnp.clip(slot, 0, mb - 1))
        in_range = pos < total
        pair_valid = in_range & jnp.take(bv, build_of) & jnp.take(pv, probe_of)
        outs = [pair_valid, probe_of.astype(jnp.int64), build_of.astype(jnp.int64)]
        for c in bcols:
            outs.append(jnp.take(c, build_of))
        for c in pcols:
            outs.append(jnp.take(c, probe_of))
        return tuple(outs)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ax),) * (4 + len(dtypes)),
        out_specs=(P(ax),) * (3 + len(dtypes))))


def join_pairs(mesh, bh, bv, ph, pv, build_payload: list, probe_payload: list):
    """Per-shard equi-candidate expansion over exchanged sides. Inputs are the
    sharded arrays produced by exchange(); hashes must already encode NULL-key
    sentinels. Returns (pair_valid, local_probe_idx, local_build_idx, gathered
    build payload, gathered probe payload, local pair capacity). All gathers
    are on-shard."""
    ax = _axis(mesh)
    n = mesh.shape[ax]
    totals = np.asarray(jax.device_get(
        _cached(("jc", n), lambda: _join_count_fn(mesh))(bh, bv, ph, pv)))
    cap_out = max(int(totals.max()), 1)
    dtypes = tuple(str(a.dtype) for a in build_payload + probe_payload)
    fn = _cached(
        ("jx2", n, cap_out, len(build_payload), len(probe_payload), dtypes),
        lambda: _join_expand_fn(mesh, cap_out, len(build_payload),
                                len(probe_payload), dtypes))
    out = fn(bh, bv, ph, pv, *build_payload, *probe_payload)
    pair_valid, probe_idx, build_idx = out[0], out[1], out[2]
    nb = len(build_payload)
    STATS["joins"] += 1
    return (pair_valid, probe_idx, build_idx,
            list(out[3:3 + nb]), list(out[3 + nb:]),
            cap_out, int(totals.sum()))


def _flags_fn(mesh, probe_len):
    ax = _axis(mesh)

    def local(pair_ok, probe_idx):
        return jax.ops.segment_max(
            pair_ok.astype(jnp.int32), probe_idx.astype(jnp.int32),
            num_segments=probe_len) > 0

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(ax), P(ax)), out_specs=P(ax)))


def probe_flags(mesh, pair_ok, probe_idx, probe_local_len):
    """Per exchanged-probe-row: any passing pair (for semi/anti/mark/left).
    probe_idx are shard-local indices, so the reduction is shard-local.
    Works symmetrically for build-side flags (pass build_idx + build len)."""
    n = mesh.shape[_axis(mesh)]
    fn = _cached(("fl", n, probe_local_len), lambda: _flags_fn(mesh, probe_local_len))
    return fn(pair_ok, probe_idx)


def _single_pick_fn(mesh, probe_len, dtypes):
    ax = _axis(mesh)

    def local(pair_ok, probe_idx, *arrays):
        m = pair_ok.shape[0]
        pos = jnp.arange(m, dtype=jnp.int64)
        slot = jax.ops.segment_min(
            jnp.where(pair_ok, pos, jnp.int64(m)),
            probe_idx.astype(jnp.int32), num_segments=probe_len)
        found = slot < m
        cl = jnp.clip(slot, 0, m - 1)
        return (found,) + tuple(jnp.take(a, cl) for a in arrays)

    k = len(dtypes)
    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(ax),) * (2 + k),
        out_specs=(P(ax),) * (1 + k)))


def single_pick(mesh, pair_ok, probe_idx, probe_local_len, arrays: list):
    """Per exchanged-probe-row: pick the FIRST passing pair's values from the
    pair-aligned `arrays` (for single joins: at most one build match survives
    per probe row; ties resolve to the lowest pair slot). Returns
    (found_flags, picked_arrays) aligned to the exchanged probe rows."""
    n = mesh.shape[_axis(mesh)]
    dtypes = tuple(str(a.dtype) for a in arrays)
    fn = _cached(("sp", n, probe_local_len, dtypes),
                 lambda: _single_pick_fn(mesh, probe_local_len, dtypes))
    out = fn(pair_ok, probe_idx, *arrays)
    return out[0], list(out[1:])


# ------------------------------------------------------------ local groupby
def _group_fn(mesh, n_imgs, n_reps, agg_descr):
    """agg_descr: tuple of (kind, n_arrays, dtypes) with kind in {sum, count,
    min, max, cdist, sdist}, each consuming n_arrays value inputs plus one
    valid mask. sum/min/max take (vals,); cdist takes the argument's grouping
    images; sdist takes (*images, vals). sum/min/max/sdist additionally emit
    the per-group non-null(-distinct) count (for SQL NULL-on-empty
    semantics); cdist emits the distinct non-null count. Distinct kinds are
    exact here because after a keyed exchange every group lives wholly on
    this shard (reference: nested dedup aggregation, RelAlgToSubOp.cpp)."""
    ax = _axis(mesh)

    def local(v, *rest):
        m = v.shape[0]
        imgs = rest[:n_imgs]
        reps = rest[n_imgs:n_imgs + n_reps]
        avs = rest[n_imgs + n_reps:]
        vkey = jnp.where(v, 0, 1).astype(jnp.int32)

        def boundaries(res_imgs, sv):
            b = jnp.zeros((m,), jnp.bool_).at[0].set(True)
            for s in res_imgs:
                b = b | jnp.concatenate(
                    [jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
            prev_sv = jnp.concatenate([jnp.zeros((1,), jnp.bool_), sv[:-1]])
            return (b | ~prev_sv) & sv

        # sort: invalid rows last, then group keys
        keys = [vkey] + [jnp.asarray(i) for i in imgs] + [
            jnp.arange(m, dtype=jnp.int64)]
        res = jax.lax.sort(keys, num_keys=len(keys))
        sv = res[0] == 0
        simgs = res[1:1 + n_imgs]
        order = res[-1]
        boundary = boundaries(simgs, sv)
        seg = jnp.cumsum(boundary.astype(jnp.int32)) - 1
        segc = jnp.clip(seg, 0, m - 1)
        num_groups = jnp.sum(boundary.astype(jnp.int32))
        gvalid = jnp.arange(m, dtype=jnp.int32) < num_groups
        # representative input row per group
        rowpos = jnp.where(sv, order, jnp.int64(0))
        rep_row = jax.ops.segment_max(
            jnp.where(boundary, rowpos, jnp.int64(0)), segc, num_segments=m)
        outs = [gvalid]
        for r in reps:
            outs.append(jnp.take(r, rep_row))
        ai = 0
        for kind, n_arr, _dts in agg_descr:
            arrays = avs[ai:ai + n_arr]
            avalid = avs[ai + n_arr]
            ai += n_arr + 1
            if kind in ("cdist", "sdist"):
                # secondary sort including the argument images: groups appear
                # in the same order as the main sort (both sort by the group
                # images first), so per-group outputs align positionally.
                aimgs = arrays[:-1] if kind == "sdist" else arrays
                dvals = arrays[-1] if kind == "sdist" else None
                keys2 = ([vkey] + [jnp.asarray(i) for i in imgs]
                         + [(~avalid).astype(jnp.int32)]
                         + [jnp.asarray(a) for a in aimgs])
                carried = [avalid] + ([dvals] if dvals is not None else [])
                res2 = jax.lax.sort(keys2 + carried, num_keys=len(keys2))
                sv2 = res2[0] == 0
                simgs2 = res2[1:1 + n_imgs]
                saimgs = res2[2 + n_imgs:2 + n_imgs + len(aimgs)]
                sav = res2[len(keys2)]
                b2 = boundaries(simgs2, sv2)
                seg2 = jnp.clip(jnp.cumsum(b2.astype(jnp.int32)) - 1, 0, m - 1)
                uniq = b2
                for s in saimgs:
                    uniq = uniq | jnp.concatenate(
                        [jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
                uniq = uniq & sv2 & sav  # distinct NON-NULL values only
                dcnt = jax.ops.segment_sum(
                    uniq.astype(jnp.int64), seg2, num_segments=m)
                if kind == "cdist":
                    outs.append(dcnt)
                else:
                    sval = res2[len(keys2) + 1]
                    outs.append(jax.ops.segment_sum(
                        jnp.where(uniq, sval, jnp.zeros((), sval.dtype)),
                        seg2, num_segments=m))
                    outs.append(dcnt)
                continue
            vals = arrays[0]
            x = jnp.take(vals, order)
            xv = jnp.take(avalid, order) & sv
            cnt = jax.ops.segment_sum(xv.astype(jnp.int64), segc, num_segments=m)
            if kind == "count":
                outs.append(cnt)
                continue
            if kind == "sum":
                outs.append(jax.ops.segment_sum(
                    jnp.where(xv, x, jnp.zeros((), x.dtype)), segc, num_segments=m))
            else:  # min / max
                xx = x.astype(jnp.int32) if x.dtype == jnp.bool_ else x
                if jnp.issubdtype(xx.dtype, jnp.floating):
                    big = jnp.asarray(jnp.inf if kind == "min" else -jnp.inf, xx.dtype)
                else:
                    info = jnp.iinfo(xx.dtype)
                    big = jnp.asarray(info.max if kind == "min" else info.min, xx.dtype)
                xm = jnp.where(xv, xx, big)
                red = (jax.ops.segment_min if kind == "min" else jax.ops.segment_max)
                outs.append(red(xm, segc, num_segments=m))
            outs.append(cnt)
        return tuple(outs)

    n_in = 1 + n_imgs + n_reps + sum(na + 1 for _k, na, _d in agg_descr)
    n_out = 1 + n_reps + sum(1 if k in ("count", "cdist") else 2
                             for k, _na, _d in agg_descr)
    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(ax),) * n_in, out_specs=(P(ax),) * n_out))


def _range_dest_fn(mesh, n_ops, n_split, dtypes):
    """dest[i] = number of splitter tuples lexicographically <= row i."""

    def fn(*args):
        sps = args[:n_ops]
        ops = args[n_ops:]
        rows = ops[0].shape[0]
        dest = jnp.zeros((rows,), jnp.int32)
        for j in range(n_split):
            ge = None
            eq = None
            for o, sp in zip(ops, sps):
                v = sp[j]
                gt_here = o > v
                eq_here = o == v
                if ge is None:
                    ge, eq = gt_here, eq_here
                else:
                    ge = ge | (eq & gt_here)
                    eq = eq & eq_here
            dest = dest + (ge | eq).astype(jnp.int32)
        return dest

    return jax.jit(fn)


def _local_sort_fn(mesh, n_keys, dtypes):
    ax = _axis(mesh)

    def local(valid, *arrs):
        pad_key = (~valid).astype(jnp.int32)  # padding sorts after real rows
        out = jax.lax.sort([pad_key, *arrs], num_keys=1 + n_keys)
        return (out[0] == 0,) + tuple(out[1:])

    k = len(dtypes) + 1
    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(ax),) * k, out_specs=(P(ax),) * k))


def sample_sort(mesh, operands: list, payload: list):
    """Distributed sample-sort (reference gap: the C++ engine's parallel
    merge sort, src/runtime/Sorting.cpp; TPU-natively: sample lexicographic
    splitter tuples, range-partition rows over the mesh with the exact-
    capacity ragged all-to-all, then sort each shard locally — equal keys
    colocate, so concatenating shards in order is the global sort).

    operands: int images in lexicographic sort order (ops/keys.sort_operands)
    payload: additional row-aligned arrays permuted along.
    Returns (valid, arrays(global n_shards*cap), cap): shard s's real rows
    occupy [s*cap, s*cap+count_s) in sorted order; arrays = operands then
    payload. Skew note: duplicate-heavy splitters degrade balance, never
    correctness (ties route to one shard by construction)."""
    ax = _axis(mesh)
    n = mesh.shape[ax]
    rows = int(operands[0].shape[0])
    # deterministic splitter sample (one small host fetch per operand)
    k = int(min(rows, max(n * 32, 256)))
    idx = jnp.asarray(np.linspace(0, rows - 1, k).astype(np.int64))
    samples = [np.asarray(jax.device_get(jnp.take(o, idx))) for o in operands]
    order = np.lexsort(tuple(reversed(samples)))
    qpos = [min((i + 1) * k // n, k - 1) for i in range(n - 1)]
    sps = [jnp.asarray(s[order][qpos]) for s in samples]
    dts = tuple(str(o.dtype) for o in operands)
    dfn = _cached(("rdest", n, len(operands), n - 1, dts),
                  lambda: _range_dest_fn(mesh, len(operands), n - 1, dts))
    dest = dfn(*sps, *operands)
    valid, arrs, glen = exchange(mesh, dest, list(operands) + list(payload))
    cap = glen // n
    all_d = tuple(str(a.dtype) for a in arrs)
    sfn = _cached(("lsort", n, len(operands), all_d, cap),
                  lambda: _local_sort_fn(mesh, len(operands), all_d))
    out = sfn(valid, *arrs)
    STATS["sorts"] += 1
    return out[0], list(out[1:]), cap


def grouped_reduce(mesh, valid, key_imgs: list, rep_cols: list, aggs: list):
    """Per-shard final grouping of exchanged rows.
    valid/key_imgs/rep_cols: sharded arrays from exchange(); aggs: list of
    (kind, arrays, valid_mask) with kind in {sum,count,min,max,cdist,sdist};
    arrays is [vals] for sum/count/min/max, the argument's grouping images
    for cdist, and [*images, vals] for sdist.
    Returns (group_valid, rep_cols_out, agg_outs) — padded, sharded; agg_outs
    entries are (value,) for count/cdist and (value, nonnull_count)
    otherwise."""
    n = mesh.shape[_axis(mesh)]
    descr = tuple((k, len(arrs), tuple(str(a.dtype) for a in arrs))
                  for k, arrs, _m in aggs)
    img_d = tuple(str(i.dtype) for i in key_imgs)
    rep_d = tuple(str(r.dtype) for r in rep_cols)
    fn = _cached(("gr2", n, img_d, rep_d, descr),
                 lambda: _group_fn(mesh, len(key_imgs), len(rep_cols), descr))
    flat = []
    for _k, arrs, m in aggs:
        flat.extend(arrs)
        flat.append(m)
    out = fn(valid, *key_imgs, *rep_cols, *flat)
    gvalid = out[0]
    reps = list(out[1:1 + len(rep_cols)])
    rest = list(out[1 + len(rep_cols):])
    aouts = []
    i = 0
    for k, _arrs, _m in aggs:
        if k in ("count", "cdist"):
            aouts.append((rest[i],))
            i += 1
        else:
            aouts.append((rest[i], rest[i + 1]))
            i += 2
    STATS["groupbys"] += 1
    return gvalid, reps, aouts
