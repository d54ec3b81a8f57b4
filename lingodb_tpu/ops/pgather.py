"""Pallas TPU kernels for the engine's hot data-movement primitives.

XLA's 1-D random gather on this chip runs ~770x off memory-bandwidth
speed-of-light and scatter-based segment_sum ~6200x (measured,
bench_results/op_sol.log) — they serialize element-by-element. The reference
engine's JIT'd tuple loops (lingo-db: src/runtime/Hashtable.cpp,
LazyJoinHashtable.cpp:7-32, generated per-morsel loops) run these at
memory speed; this module is the TPU-native equivalent, built on what the
hardware actually offers (measured in tools_kbench.py):

  - lane gather   take_along_axis(axis=1) on (R,128) tiles: ~378 Ge/s (free)
  - sublane gather axis=0 works only WITHIN one vreg (8 rows for 32-bit);
    Mosaic rejects taller operands ("Multiple source vregs along gather
    dimension") — so arbitrary big-table gathers must be algorithmic.

Kernels (all int32 in-kernel; wrappers limb-split 64-bit types):

  gather_chunked(table, idx)      table <= ~8K entries: per 128-entry chunk,
                                  broadcast + lane-gather + select.
  compact_positions(mask, k)      positions of mask's set bits, compacted:
                                  within-tile binary-staged shifts + a VMEM
                                  carry buffer flushed in aligned blocks.
  gather_sorted(table, idx)       idx monotone nondecreasing (post-filter
                                  positions, sorted-FK probes): per-tile HBM
                                  window + per-vreg chunk loop.
  segscan(gid, vals)              segmented inclusive scan over sorted gid
                                  (Hillis-Steele with gid-equality masks) —
                                  run totals land on run-last positions.

The binary-staged shift compaction is collision-free: an element with
original position p and hole-count d sits, after stage b, at
p - (d mod 2^(b+1)); for consecutive survivors the targets stay strictly
increasing at every stage (proof: (d2&M)-(d1&M) is congruent to d2-d1 mod
2^(b+1) and bounded by M, while p2-p1 > d2-d1 when both are multiples
considered — see compact kernel comment).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# interpret mode for CPU tests (set by conftest / explicit callers)
INTERPRET = False


def _pl():
    from jax.experimental import pallas as pl
    return pl


def _pltpu():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu


# --------------------------------------------------------------------------
# small helpers (trace-time, inside kernels)
# --------------------------------------------------------------------------

def _lane_gather(x, idx):
    """take_along_axis(x, idx, axis=1). Kernels are traced under
    jax.enable_x64(False) (see _x32 below) so the index dtype stays int32 —
    Mosaic has no 64-bit types and rejects the promotion jnp inserts when
    jax_enable_x64 is on."""
    return jnp.take_along_axis(x, idx, axis=1)


class _x32:
    """Trace-time context: pallas kernels must see 32-bit default dtypes."""

    def __enter__(self):
        self._ctx = jax.enable_x64(False)
        self._ctx.__enter__()
        return self

    def __exit__(self, *a):
        return self._ctx.__exit__(*a)

def _sub_gather(x, idx):
    """take_along_axis(x, idx, axis=0) — valid only within one vreg
    (operand height <= 8 for 32-bit types)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(0,),
        start_index_map=(0,),
        operand_batching_dims=(1,),
        start_indices_batching_dims=(1,),
    )
    return jax.lax.gather(
        x, idx.astype(jnp.int32)[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _bcast_last(tile8, r):
    """Broadcast tile8[7,127] to an (r,128) tile using only within-vreg
    gathers (no scalar extraction: integer reductions promote to i64 in
    Mosaic's lowering proxy, and single-row slices need relayouts)."""
    col = _lane_gather(tile8, jnp.full((8, 128), 127, jnp.int32))
    row = _sub_gather(col, jnp.full((8, 128), 7, jnp.int32))
    return jnp.concatenate([row] * (r // 8), axis=0)


def _flat_roll_left(x, sh: int):
    """Static flat roll of an (R,128) tile: out[f] = x[f+sh] (row-major flat
    order), zero-filled at the tail. sh is a Python int."""
    r = x.shape[0]
    z = jnp.zeros_like(x)
    rows, lanes = divmod(sh, 128)
    if rows:
        x = jnp.concatenate([x[rows:], z[:rows]], axis=0)
    if lanes:
        xd = jnp.concatenate([x[1:], z[:1]], axis=0)
        x = jnp.concatenate([x[:, lanes:], xd[:, :lanes]], axis=1)
    return x


def _flat_cumsum_excl(m):
    """Exclusive flat (row-major) cumsum of an (R,128) int32 tile."""
    r = m.shape[0]
    # within-row inclusive cumsum via log2(128) static shifted adds
    c = m
    for sh in (1, 2, 4, 8, 16, 32, 64):
        z = jnp.zeros((r, sh), c.dtype)
        c = c + jnp.concatenate([z, c[:, :-sh]], axis=1)
    # row totals broadcast across lanes (full-width tiles: Mosaic rejects
    # narrow (R,1) shift chains with "offset mismatch on non-concat dim")
    row_tot = _lane_gather(c, jnp.full((r, 128), 127, jnp.int32))
    # exclusive cumsum over rows via log2(R) static row-shifted adds
    rs = row_tot
    acc = jnp.zeros_like(row_tot)
    sh = 1
    while sh < r:
        z = jnp.zeros((sh, 128), rs.dtype)
        shifted = jnp.concatenate([z, rs[:-sh]], axis=0)
        acc = acc + shifted
        rs = rs + shifted  # doubling: rs now holds sums of 2*sh rows
        sh *= 2
    return c - m + acc  # exclusive within row + rows before


def _flat_iota(r, dtype=jnp.int32):
    row = jax.lax.broadcasted_iota(dtype, (r, 128), 0)
    lane = jax.lax.broadcasted_iota(dtype, (r, 128), 1)
    return row * 128 + lane


# --------------------------------------------------------------------------
# K1: gather_chunked — small VMEM-resident tables
# --------------------------------------------------------------------------

# entries; cost is ~3 vreg-ops per 128-entry chunk of the table per output
# tile. 16K keeps dimension-table probes (customer/part at small SFs) on
# the sort-free chunked kernel: every lax.sort the alternative sort-route
# path would emit costs ~20s+8s/operand of remote compile
CHUNK_TABLE_LIMIT = 16384


@functools.partial(jax.jit, static_argnames=("s_pad", "t_rows", "interpret"))
def _gather_chunked_i32(idx2d, s_pad: int, t_rows: int, interpret: bool,
                        *tables2d):
    """C-plane chunked gather: ONE kernel gathers every plane with the same
    indices (the index decode is computed once and amortized; one Mosaic
    compile covers a whole column group instead of one ~10 s remote compile
    per column — the axon tunnel compiles cost that much)."""
    pl = _pl()
    chunks = s_pad // 128
    nt = idx2d.shape[0] // t_rows
    C = len(tables2d)

    def kernel(idx_ref, *refs):
        tab_refs, out_refs = refs[:C], refs[C:]
        idx = idx_ref[:]
        lane = idx & 127
        hi = idx >> 7
        accs = [jnp.zeros((t_rows, 128), jnp.int32) for _ in range(C)]
        for c in range(chunks):
            sel = hi == c
            for p in range(C):
                row = jnp.broadcast_to(tab_refs[p][c:c + 1, :], (t_rows, 128))
                accs[p] = jnp.where(sel, _lane_gather(row, lane), accs[p])
        for p in range(C):
            out_refs[p][:] = accs[p]

    with _x32():
        return pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[pl.BlockSpec((t_rows, 128), lambda i: (i, 0))]
            + [pl.BlockSpec((chunks, 128), lambda i: (0, 0))] * C,
            out_specs=[pl.BlockSpec((t_rows, 128), lambda i: (i, 0))] * C,
            out_shape=[jax.ShapeDtypeStruct((nt * t_rows, 128), jnp.int32)] * C,
            interpret=interpret,
        )(idx2d, *tables2d)


def gather_chunked_planes(tables, idx):
    """[t[clip(idx)] for t in tables] for int32 1-D equal-length tables with
    <= CHUNK_TABLE_LIMIT entries; idx any shape int32. One kernel call."""
    s = tables[0].shape[0]
    # pow2 table padding: kernel instances are keyed on the chunk count, so
    # nearby table sizes share one compiled kernel
    s_pad = max(128, 1 << (s - 1).bit_length()) if s > 1 else 128
    if s_pad != s:
        z = jnp.zeros((s_pad - s,), jnp.int32)
        tables = [jnp.concatenate([t, z]) for t in tables]
    idx_flat = idx.reshape(-1)
    idx_flat = jnp.clip(idx_flat, 0, s - 1)
    n = idx_flat.shape[0]
    # the unrolled chunk loop keeps up to chunks x C x (t_rows,128) i32
    # broadcast temporaries live on the scoped VMEM stack (limit 16MB);
    # r4's fixed rule (512 rows up to 8K tables) was calibrated for ONE
    # plane and compile-OOMed at C=2 (measured: 64 chunks x 2 planes x 512
    # rows = 28.9MB). Model the worst case explicitly and shrink the tile.
    chunks_ = s_pad // 128
    t_rows = 512
    budget = 12 << 20
    while t_rows > 8 and chunks_ * len(tables) * t_rows * 128 * 4 > budget:
        t_rows //= 2
    tile = t_rows * 128
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        idx_flat = jnp.concatenate(
            [idx_flat, jnp.zeros((n_pad - n,), idx_flat.dtype)])
    outs = _gather_chunked_i32(idx_flat.reshape(-1, 128), s_pad, t_rows,
                               INTERPRET, *[t.reshape(-1, 128) for t in tables])
    return [o.reshape(-1)[:n].reshape(idx.shape) for o in outs]


def gather_chunked_i32(table, idx):
    """table[clip(idx)] for int32 1-D table with <= CHUNK_TABLE_LIMIT
    entries; idx any shape int32. Out-of-range indices are clamped."""
    return gather_chunked_planes([table], idx)[0]


# --------------------------------------------------------------------------
# K3: compact_positions — streaming stream-compaction of set-bit positions
# --------------------------------------------------------------------------

_CP_ROWS = 64          # tile rows: 8192 elements/grid step, 13 shift stages
_CP_BITS = 13


@functools.partial(jax.jit,
                   static_argnames=("nt", "ko_rows", "interpret"))
def _compact_positions_kernel(mask2d, nt: int, ko_rows: int, interpret: bool):
    pl = _pl()
    pltpu = _pltpu()
    R = _CP_ROWS
    Rc = 2 * R + 2  # carry rows: < R*128 resident + R*128 appended + roll spill

    def kernel(mask_ref, out_ref, cnt_ref, carry, state, sem):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            state[0] = 0  # ccnt: flat elements resident in carry
            state[1] = 0  # out rows flushed
            state[2] = 0  # total survivors seen

        m = mask_ref[:].astype(jnp.int32)
        pos = _flat_iota(R) + t * (R * 128)  # global positions
        rank_excl = _flat_cumsum_excl(m)
        f = _flat_iota(R)
        # d = holes before f (for survivors); -1 marks garbage slots
        d = jnp.where(m == 1, f - rank_excl, -1)
        v = pos
        for b in range(_CP_BITS):
            sh = 1 << b
            d_s = _flat_roll_left(d, sh)
            v_s = _flat_roll_left(v, sh)
            take = (d_s >= 0) & (((d_s >> b) & 1) == 1)
            keep = (d >= 0) & (((d >> b) & 1) == 0)
            v = jnp.where(take, v_s, v)
            d = jnp.where(take, d_s - sh, jnp.where(keep, d, -1))
        # integer jnp.sum re-traces in Mosaic's reduction proxy OUTSIDE any
        # enable_x64(False) scope and promotes to int64 — reduce in f32
        # (exact: tile counts <= 8192 < 2^24) and convert back
        cnt = jnp.sum(m.astype(jnp.float32)).astype(jnp.int32)
        # ---- append compacted prefix into carry at flat offset ccnt -------
        ccnt = state[0]
        l0 = ccnt & 127
        r0 = ccnt >> 7
        # dynamic flat roll right by l0: target[i,j] = v[i,(j-l0)%128], with
        # rows shifted down for lanes j < l0
        # dynamic flat-roll-right by l0 into an (R+1,128) tile:
        # rolled[I,J] = v[I - (J<l0), (J-l0)%128]; row R (spill) holds the
        # tail of v's last row at lanes J < l0.
        lanes = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        src = (lanes - l0) % 128
        lg = _lane_gather(v, src)
        lg_dn = jnp.concatenate([jnp.zeros((1, 128), lg.dtype), lg[:-1]],
                                axis=0)
        body = jnp.where(lanes < l0, lg_dn, lg)
        spill = jnp.where(lanes[:1] < l0, lg[-1:],
                          jnp.zeros((1, 128), lg.dtype))
        rolled = jnp.concatenate([body, spill], axis=0)
        win = carry[pl.ds(r0, R + 1), :]
        fpos = (_flat_iota(R + 1) + r0 * 128)
        keep_new = (fpos >= ccnt) & (fpos < ccnt + cnt)
        carry[pl.ds(r0, R + 1), :] = jnp.where(keep_new, rolled, win)
        ccnt = ccnt + cnt
        state[0] = ccnt
        state[2] = state[2] + cnt

        # ---- flush a full R-row block when ready ---------------------------
        @pl.when(ccnt >= R * 128)
        def _flush():
            ooff = jnp.minimum(state[1], ko_rows - R)
            cp = pltpu.make_async_copy(
                carry.at[pl.ds(0, R), :], out_ref.at[pl.ds(ooff, R), :], sem)
            cp.start()
            cp.wait()
            carry[pl.ds(0, Rc - R), :] = carry[pl.ds(R, Rc - R), :]
            state[0] = ccnt - R * 128
            state[1] = state[1] + R

        @pl.when(t == nt - 1)
        def _final():
            ooff = jnp.minimum(state[1], ko_rows - (R + 1))
            cp = pltpu.make_async_copy(
                carry.at[pl.ds(0, R + 1), :],
                out_ref.at[pl.ds(ooff, R + 1), :], sem)
            cp.start()
            cp.wait()
            cnt_ref[0] = state[2]

    with _x32():
        out, cnt = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec((R, 128), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=_pltpu().SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ko_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            _pltpu().VMEM((2 * _CP_ROWS + 2, 128), jnp.int32),
            _pltpu().SMEM((4,), jnp.int32),
            _pltpu().SemaphoreType.DMA(()),
        ],
            compiler_params=_pltpu().CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(mask2d)
    return out, cnt


def compact_positions(mask, k: int):
    """Positions (int32, ascending) of the set bits of 1-D `mask`, padded to
    length k (garbage beyond the returned count). Returns (count, positions).
    If count > k the positions are truncated/garbage — callers must check."""
    n = mask.shape[0]
    R = _CP_ROWS
    tile = R * 128
    n_pad = -(-n // tile) * tile
    m = mask.astype(jnp.int32)
    if n_pad != n:
        m = jnp.concatenate([m, jnp.zeros((n_pad - n,), jnp.int32)])
    nt = n_pad // tile
    ko_rows = max(-(-k // 128) + R + 2, 2 * R + 4)
    out, cnt = _compact_positions_kernel(m.reshape(-1, 128), nt, ko_rows,
                                         INTERPRET)
    return cnt[0], out.reshape(-1)[:k]


# --------------------------------------------------------------------------
# K2: gather_sorted — monotone indices, windowed HBM access
# --------------------------------------------------------------------------

_GS_TROWS = 256            # idx rows per grid step (32768 indices)
_GS_WROWS = 2048           # window rows (262144 table entries per window)


@functools.partial(
    jax.jit, static_argnames=("wrows", "t_rows", "d_chunks", "interpret"))
def _gather_sorted_i32(idx2d, wstarts, vbase, vlast, wrows: int,
                       t_rows: int, d_chunks: int, interpret: bool,
                       *tables2d):
    """C-plane windowed sorted gather: the chunk walk (index decode, window
    arithmetic, trip counts) runs ONCE per vreg and gathers every plane in
    the same trip — one Mosaic compile and one HBM window stream per column
    group instead of per column."""
    pl = _pl()
    C = len(tables2d)
    nt = idx2d.shape[0] // t_rows
    n_vreg = t_rows // 8
    tab_rows = tables2d[0].shape[0]
    wblocks = max(tab_rows // wrows, 1)

    # the vreg dimension rides the GRID in blocks of VUN vregs (not one big
    # unrolled Python loop): the kernel body covers VUN vregs' walks,
    # ~n_vreg/VUN x smaller to Mosaic-compile (remote kernel compiles cost
    # ~10 s each on this rig and scale with body size), while consecutive
    # v-steps reuse the same HBM window block for free
    VUN = min(4, n_vreg)
    nv = n_vreg // VUN

    def kernel(wstart_ref, idx_ref, vb_ref, vl_ref, *refs):
        win0s = refs[:C]
        win1s = refs[C:2 * C]
        out_refs = refs[2 * C:2 * C + C]
        ovf_ref = refs[2 * C + C]
        t = pl.program_id(0)
        v = pl.program_id(1)
        w0 = wstart_ref[t]  # window block index (units of wrows rows)
        win_chunks = wrows // 8
        idx = idx_ref[:]
        ovf = jnp.zeros((), jnp.int32)
        vaccs = [[] for _ in range(C)]
        for k in range(VUN):
            vidx = idx[k * 8:(k + 1) * 8, :]
            lane = vidx & 127
            hi = vidx >> 7
            base = vb_ref[t * n_vreg + v * VUN + k]  # global chunk (8 rows)
            # early exit: the vreg's indices are sorted, so its true span
            # ends at its last element's chunk — walk only that many
            trips = jnp.clip(vl_ref[t * n_vreg + v * VUN + k] - base + 1,
                             1, d_chunks)

            def chunk_step(d_, vacc, base=base, lane=lane, hi=hi):
                g = base + d_
                loc0 = g - w0 * win_chunks
                in0 = (loc0 >= 0) & (loc0 < win_chunks)
                loc0c = jnp.clip(loc0, 0, win_chunks - 1)
                loc1c = jnp.clip(loc0 - win_chunks, 0, win_chunks - 1)
                out = []
                for p in range(C):
                    c0 = win0s[p][pl.ds(loc0c * 8, 8), :]
                    c1 = win1s[p][pl.ds(loc1c * 8, 8), :]
                    chunk = jnp.where(in0, c0, c1)
                    va = vacc[p]
                    for s in range(8):
                        row = jnp.broadcast_to(chunk[s:s + 1, :], (8, 128))
                        gg = _lane_gather(row, lane)
                        va = jnp.where(hi == g * 8 + s, gg, va)
                    out.append(va)
                return tuple(out)

            vacc = tuple(jnp.zeros((8, 128), jnp.int32) for _ in range(C))
            if d_chunks <= 4:  # unroll the shortest walks; loop the rest
                for d_ in range(d_chunks):
                    vacc = chunk_step(d_, vacc)
            else:
                vacc = jax.lax.fori_loop(0, trips, chunk_step, vacc)
            # overflow: any index outside its vreg's capped walk OR outside
            # the dual aligned window (f32 reduce: int reductions promote
            # to i64 in Mosaic's lowering proxy)
            bad = (hi < base * 8) | (hi >= (base + d_chunks) * 8)
            bad = bad | (hi < w0 * win_chunks * 8) | (
                hi >= (w0 + 2) * win_chunks * 8)
            ovf = ovf + jnp.sum(bad.astype(jnp.float32)).astype(jnp.int32)
            for p in range(C):
                vaccs[p].append(vacc[p])
        for p in range(C):
            out_refs[p][:] = (vaccs[p][0] if VUN == 1
                              else jnp.concatenate(vaccs[p], axis=0))
        ovf_ref[0] = jnp.where((t == 0) & (v == 0), ovf,
                               jnp.maximum(ovf_ref[0], ovf))

    pltpu = _pltpu()

    def win_spec(off):
        return pl.BlockSpec(
            (wrows, 128),
            lambda i, v, w, off=off: (jnp.clip(w[i] + off, 0, wblocks - 1), 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, nv),
        in_specs=[
            pl.BlockSpec((8 * VUN, 128), lambda i, v, w: (i * nv + v, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [win_spec(0)] * C + [win_spec(1)] * C,
        out_specs=[pl.BlockSpec((8 * VUN, 128),
                                lambda i, v, w: (i * nv + v, 0))] * C
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
    )
    with _x32():
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nt * t_rows, 128), jnp.int32)
                       ] * C + [jax.ShapeDtypeStruct((1,), jnp.int32)],
            interpret=interpret,
        )(wstarts, idx2d, vbase, vlast, *tables2d, *tables2d)
    return res[:C], res[C]


def _gs_wrows(C: int) -> int:
    """Window rows per plane: scale down as planes multiply so the dual,
    double-buffered windows stay well under the ~16 MB VMEM budget
    (2 windows x 2 pipeline buffers x C planes x wrows x 512 B)."""
    if C <= 2:
        return _GS_WROWS
    if C <= 4:
        return 1024
    return 512  # C <= 8 (callers batch larger groups)


def gather_sorted_planes(tables, idx, d_chunks: int = 0, t_rows: int = 0,
                         conservative: bool = False):
    """[t[idx] for t in tables] for equal-length 1-D int32 tables and
    monotone nondecreasing int32 idx, in ONE kernel call. Returns
    (values_list, overflow_count); overflow>0 means some index fell outside
    its tile window (skewed density) — caller falls back to XLA.

    d_chunks bounds the table span (in 1024-entry chunks) that 1024
    consecutive indices may cover; t_rows (idx rows per grid step) must keep
    t_rows*128*avg_gap under the 2x window. Pass 0 to derive both from a
    density hint via pick_sorted_params.

    conservative=True parameterizes for UNKNOWN density: one vreg per grid
    step and a deep (dynamic-trip) walk, safe for any average gap <= 128.
    Callers use it for sentinel-padded position arrays (group boundaries),
    whose true count the static density hint overestimates — with fast
    params those overflow at runtime and the whole gather silently fell
    back to XLA takes at 770x off memory bandwidth (r4 device traces)."""
    C = len(tables)
    s = int(tables[0].shape[0])
    if conservative:
        # guarantee: tile span <= half the dual window regardless of
        # alignment -> with 1024-entry tiles and wrows=2048 any average
        # LOCAL gap <= 256 cannot overflow (callers cap plane groups at 2
        # so the widened double-buffered windows stay ~8MB of VMEM).
        # Realistic ceiling: TPC-H Q3@SF10 groups every ~200th row.
        wrows = 2048
        d_chunks = d_chunks or 512
        t_rows = t_rows or 8
    else:
        wrows = _gs_wrows(C)
    dc_auto, tr_auto = pick_sorted_params(s, int(idx.shape[0]), wrows)
    d_chunks = d_chunks or dc_auto
    t_rows = t_rows or tr_auto
    s_pad = -(-s // (wrows * 128)) * (wrows * 128)
    s_pad = max(s_pad, wrows * 128)
    if s_pad != s:
        z = jnp.zeros((s_pad - s,), jnp.int32)
        tables = [jnp.concatenate([t, z]) for t in tables]
    n = idx.shape[0]
    idx = jnp.clip(idx, 0, max(s - 1, 0))
    tile = t_rows * 128
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        # pad with the last index (keeps monotonicity and window locality)
        pad_val = idx[-1:] if n else jnp.zeros((1,), idx.dtype)
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(pad_val, (n_pad - n,))])
    nt = n_pad // tile
    # per-tile window block + per-vreg chunk bases (strided slices: cheap)
    firsts = idx[:: tile]  # (nt,)
    wstarts = (firsts // (wrows * 128)).astype(jnp.int32)
    vfirsts = idx[:: 1024]  # (nt * n_vreg,)
    vbase = (vfirsts // 1024).astype(jnp.int32)
    vlast = (idx[1023:: 1024] // 1024).astype(jnp.int32)
    if vlast.shape[0] < vbase.shape[0]:  # defensive: n_pad is a 1024-multiple
        vlast = jnp.concatenate(
            [vlast, vbase[vlast.shape[0]:]])
    outs, ovf = _gather_sorted_i32(
        idx.reshape(-1, 128), wstarts, vbase, vlast,
        wrows, t_rows, d_chunks, INTERPRET,
        *[t.reshape(-1, 128) for t in tables])
    return [o.reshape(-1)[:n] for o in outs], ovf[0]


def gather_sorted_i32(table, idx, d_chunks: int = 0, t_rows: int = 0):
    """Single-plane gather_sorted_planes (kept for tests/direct callers)."""
    outs, ovf = gather_sorted_planes([table], idx, d_chunks, t_rows)
    return outs[0], ovf


def pick_sorted_params(table_n: int, idx_n: int, wrows: int = _GS_WROWS):
    """(d_chunks, t_rows) for an expected average index gap of
    table_n/idx_n: per-vreg span ~1024*gap entries with 4x headroom, and a
    tile whose span stays within the 2x aligned window. Both are rounded to
    powers of two so kernel instantiations dedupe across nearby shapes
    (every distinct static combo costs a ~10 s remote Mosaic compile)."""
    gap = max(table_n / max(idx_n, 1), 0.25)
    d_chunks = int(min(max(4 * gap + 2, 4), 512))
    d_chunks = 1 << (d_chunks - 1).bit_length()  # pow2: dedupe compiles
    span_cap = wrows * 128  # half the dual window (alignment-safe budget)
    # 2x headroom: LOCAL density routinely runs ~2x the global average
    # (filtered fact columns); without it borderline tiles overflow and the
    # whole gather silently degrades to the XLA fallback
    t_rows = int(span_cap / (gap * 128) / 2)
    t_rows = max(min(t_rows, 256), 8)
    t_rows = 1 << (t_rows.bit_length() - 1)  # pow2 rows
    return d_chunks, t_rows


# --------------------------------------------------------------------------
# K4: segscan — segmented inclusive scan over sorted int32 gid
# --------------------------------------------------------------------------

_SS_ROWS = 64


@functools.partial(jax.jit, static_argnames=("n_words", "interpret"))
def _segscan_kernel(gid2d, vals3d, n_words: int, interpret: bool):
    pl = _pl()
    pltpu = _pltpu()
    R = _SS_ROWS
    nt = gid2d.shape[0] // R

    def kernel(gid_ref, vals_ref, out_ref, carry, gidc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            gidc[:] = jnp.full((8, 128), -2147483647, jnp.int32)
            carry[:] = jnp.zeros((n_words, 8, 128), jnp.int32)

        g = gid_ref[:]
        vs = [vals_ref[w] for w in range(n_words)]
        # Hillis-Steele segmented scan: sorted gid makes "same gid at
        # distance sh" a valid segment-same test at every stage
        for b in range(_CP_BITS):
            sh = 1 << b
            g_s = _flat_roll_right(g, sh)
            same = g_s == g
            vs = [v + jnp.where(same, _flat_roll_right(v, sh),
                                jnp.zeros_like(v)) for v in vs]
        # cross-tile carry: first run continues the previous tile's last
        # run. Carries live as (8,128) vreg tiles whose [7,127] element is
        # the carried value (vreg-aligned stores; _bcast_last reads it).
        first_run = g == _bcast_last(gidc[:], R)
        for w in range(n_words):
            cw = _bcast_last(carry[w], R)
            vs[w] = vs[w] + jnp.where(first_run, cw, jnp.zeros_like(vs[w]))
            out_ref[w] = vs[w]
            carry[w] = vs[w][R - 8:R, :]
        gidc[:] = g[R - 8:R, :]

    with _x32():
        return pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0)),
                pl.BlockSpec((n_words, R, 128), lambda i: (0, i, 0)),
            ],
            out_specs=pl.BlockSpec((n_words, R, 128), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_words, nt * R, 128), jnp.int32),
            scratch_shapes=[
                _pltpu().VMEM((n_words, 8, 128), jnp.int32),
                _pltpu().VMEM((8, 128), jnp.int32),
            ],
            interpret=interpret,
        )(gid2d, vals3d)


def _flat_roll_right(x, sh: int):
    """Static flat roll: out[f] = x[f-sh], zero-filled at the head."""
    z = jnp.zeros_like(x)
    rows, lanes = divmod(sh, 128)
    if rows:
        x = jnp.concatenate([z[:rows], x[:-rows]], axis=0)
    if lanes:
        xu = jnp.concatenate([z[:1], x[:-1]], axis=0)
        x = jnp.concatenate([xu[:, -lanes:], x[:, :-lanes]], axis=1)
    return x


def segscan_i32(gid, vals):
    """Segmented inclusive scan (sum) of each (n,) int32 array in `vals`
    over sorted nondecreasing int32 `gid`. Run totals land on run-last
    positions. int32 adds wrap — callers limb-split to stay exact."""
    n = gid.shape[0]
    R = _SS_ROWS
    tile = R * 128
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        gid = jnp.concatenate(
            [gid, jnp.full((n_pad - n,), jnp.int32(2147483647))])
        vals = [jnp.concatenate([v, jnp.zeros((n_pad - n,), v.dtype)])
                for v in vals]
    v3 = jnp.stack([v.reshape(-1, 128) for v in vals])
    out = _segscan_kernel(gid.reshape(-1, 128), v3, len(vals), INTERPRET)
    return [out[w].reshape(-1)[:n] for w in range(len(vals))]


# --------------------------------------------------------------------------
# Engine-facing dispatcher
# --------------------------------------------------------------------------

def use_pallas() -> bool:
    """Whether the Pallas kernels should run: real TPU backend, no mesh
    (kernels are single-device; sharded paths use the shuffle layer), and
    the setting is on. Overridable for tests via FORCE_PALLAS."""
    if FORCE_PALLAS is not None:
        return FORCE_PALLAS
    from ..utils.settings import get_setting

    if str(get_setting("system.pallas")).lower() in ("off", "false", "0"):
        return False
    from ..runtime import device as dv

    if dv.get_mesh() is not None:
        return False
    return jax.default_backend() == "tpu"


FORCE_PALLAS = None  # tests set True (with INTERPRET) or False

# below this many indices XLA's gather cost is negligible and kernel
# padding/dispatch overhead dominates
MIN_N = 1 << 16
# random-gather size below which plain XLA take beats the sort-route's
# runtime+compile economics (~19ns/elem -> 80ms at 4M, vs two multi-operand
# lax.sorts costing ~45-65s of one-time remote compile)
SORT_ROUTE_MIN_N = 4 << 20
# monotone gather beats XLA take while the average index gap keeps the
# chunk walk short; with the per-vreg early exit the walk costs
# ~gap*26/1024 instr per element vs XLA take's ~19ns/elem, so the
# crossover sits past gap 128
MAX_SORTED_GAP = 128.0


def _limbify(table):
    """Split a 1-D table into int32 limb arrays + a rebuild function."""
    dt = table.dtype
    if dt == jnp.bool_ or dt.itemsize <= 2:
        return ([table.astype(jnp.int32)],
                lambda outs: outs[0].astype(dt))
    if dt.itemsize == 4:
        return ([jax.lax.bitcast_convert_type(table, jnp.int32)],
                lambda outs: jax.lax.bitcast_convert_type(outs[0], dt))
    limbs = jax.lax.bitcast_convert_type(table, jnp.int32)  # (S, 2)
    return ([limbs[:, 0], limbs[:, 1]],
            lambda outs: jax.lax.bitcast_convert_type(
                jnp.stack([outs[0], outs[1]], axis=-1), dt))


_MAX_PLANES = 8  # per kernel call: dual double-buffered windows in ~16MB VMEM

# When set (a list), windowed-gather overflow flags are APPENDED here instead
# of guarded by an in-program lax.cond fallback. XLA conditionals COPY their
# operands — ~150MB-class copies per guarded gather dominated the fused
# programs (r4 device traces: 1.36s of q3's 1.59s was conditionals), even
# when the fallback branch never ran. Fused pipelines trace under
# collect_ovf(): the host checks the combined flag alongside the scalars it
# already fetches and retries ONE non-Pallas variant on overflow.
_OVF_SINK: list | None = None
_OVF_DESC: list = []  # parallel descriptions (shapes/params) for diagnostics


class collect_ovf:
    """Trace-time context: route overflow flags to a sink (no cond)."""

    def __enter__(self):
        global _OVF_SINK
        self._old = _OVF_SINK
        self._entered = True
        _OVF_SINK = []
        _OVF_DESC.clear()
        return _OVF_SINK

    def __exit__(self, *a):
        # idempotent: callers exit explicitly before computing the combined
        # flag AND from a finally block (so a trace-time exception — the
        # expected DECLINED path — cannot leave the sink installed and
        # silently disable the eager gathers' lax.cond fallback)
        global _OVF_SINK
        if getattr(self, "_entered", False):
            _OVF_SINK = self._old
            self._entered = False
        return False


def _guard_ovf(gs, ovf, planes, idx32, desc=""):
    if _OVF_SINK is not None:
        _OVF_SINK.append(ovf)
        _OVF_DESC.append(
            f"#{len(_OVF_SINK) - 1} C={len(planes)} s={planes[0].shape[0]} "
            f"n={idx32.shape[0]} {desc}")
        return list(gs)
    return list(jax.lax.cond(
        ovf == 0, lambda: tuple(gs),
        lambda: tuple(jnp.take(t, idx32, mode="clip") for t in planes)))


def _planes_gather(planes, idx32, monotone: bool, s: int, n: int,
                   conservative: bool = False):
    """Gather a group of <= _MAX_PLANES equal-length i32 planes with shared
    idx through whichever kernel wins; returns list of (n,) i32."""
    if s <= CHUNK_TABLE_LIMIT:
        return gather_chunked_planes(planes, idx32)
    dense = s / max(n, 1) <= MAX_SORTED_GAP
    if monotone and dense:
        gs, ovf = gather_sorted_planes(planes, idx32,
                                       conservative=conservative)
        return _guard_ovf(gs, ovf, planes, idx32,
                          f"mono cons={conservative}")
    if dense and n >= SORT_ROUTE_MIN_N:
        # random big-table gather as sort + monotone windowed gather +
        # unsort. XLA's 1-D random gather costs ~8-26ns per index regardless
        # of locality (bench_results/op_sol.log: 770x SOL); lax.sort runs at
        # ~5-6x SOL. ONE index sort and ONE multi-operand unsort serve the
        # whole plane group (reference: LazyJoinHashtable.cpp probe loops).
        # Below SORT_ROUTE_MIN_N the XLA take's ~19ns/elem costs less wall
        # time than it looks while each lax.sort the route needs costs
        # ~20s+8s/operand of REMOTE compile — small/mid gathers stay on
        # plain takes (compile-free).
        iota = jnp.arange(n, dtype=jnp.int32)
        sidx, perm = jax.lax.sort([idx32, iota], num_keys=1)
        gs, ovf = gather_sorted_planes(planes, sidx)
        gs = _guard_ovf(gs, ovf, planes, sidx, "sortroute")
        outs = jax.lax.sort([perm] + gs, num_keys=1)
        return list(outs[1:])
    return [jnp.take(t, idx32, mode="clip") for t in planes]


def take_fast_multi(tables, idx, *, monotone: bool = False,
                    conservative: bool = False):
    """[t[idx] for t in tables] with OOB clipped, for equal-length 1-D
    tables sharing one index array. Columns are limb-split to i32 planes and
    gathered in batched kernel calls (<= _MAX_PLANES planes each): ONE
    Mosaic compile and one index decode per group instead of per column.
    Set monotone=True ONLY for nondecreasing idx; violations are caught by
    the kernel's overflow flag and fall back (cost: time, not correctness)."""
    if not tables:
        return []
    if not isinstance(idx, jax.Array) or any(
            not isinstance(t, jax.Array) for t in tables):
        bidx = np.maximum(np.asarray(idx), 0)
        return [np.take(np.asarray(t), bidx, axis=0) for t in tables]
    n = int(idx.shape[0]) if idx.ndim == 1 else idx.size
    if (not use_pallas()) or n < MIN_N or any(t.ndim != 1 for t in tables):
        return [jnp.take(t, idx, axis=0, mode="clip") for t in tables]
    s = int(tables[0].shape[0])
    assert all(int(t.shape[0]) == s for t in tables), "equal-length tables"
    idx32 = idx.astype(jnp.int32)
    planes = []
    rebuilds = []  # (plane_start, n_limbs, rebuild_fn)
    for t in tables:
        limbs, rb = _limbify(t)
        rebuilds.append((len(planes), len(limbs), rb))
        planes.extend(limbs)
    outs = []
    group = 2 if conservative else _MAX_PLANES  # wider windows need VMEM
    for g0 in range(0, len(planes), group):
        outs.extend(_planes_gather(planes[g0:g0 + group], idx32,
                                   monotone, s, n, conservative))
    return [rb(outs[st:st + k]) for st, k, rb in rebuilds]


def take_fast(table, idx, *, monotone: bool = False,
              conservative: bool = False):
    """table[idx] with OOB clipped — a drop-in for jnp.take(mode='clip').
    See take_fast_multi; column groups should prefer the multi form so the
    gather kernels compile and run once per group."""
    return take_fast_multi([table], idx, monotone=monotone,
                           conservative=conservative)[0]


def nonzero_positions(mask, k: int):
    """(count, positions[:k]) of mask's set bits — compact_positions on the
    chip, jnp.nonzero elsewhere. count is exact even when it exceeds k."""
    if not isinstance(mask, jax.Array):  # numpy baseline backend
        pos = np.flatnonzero(mask)
        out = np.zeros(k, np.int32)
        out[: min(len(pos), k)] = pos[:k]
        return np.int64(len(pos)), out
    n = int(mask.shape[0])
    if use_pallas() and n >= MIN_N:
        cnt, pos = compact_positions(mask, k)
        # sentinel-fill the padding tail: the kernel leaves stale carry
        # values there, which would break the monotonicity downstream
        # monotone gathers rely on (clipped to the table end by take_fast)
        ar = jnp.arange(k, dtype=jnp.int32)
        pos = jnp.where(ar < cnt, pos, jnp.int32(2147483646))
        return cnt.astype(jnp.int64), pos
    # sentinel-fill the padding tail here too (not 0): downstream monotone
    # gathers rely on nondecreasing positions regardless of which branch
    # produced them — keeping the two branches' contracts identical removes
    # the implicit coupling on use_pallas()/MIN_N thresholds
    pos = jnp.nonzero(mask, size=k, fill_value=2147483646)[0].astype(jnp.int32)
    return jnp.sum(mask.astype(jnp.int64)), pos
