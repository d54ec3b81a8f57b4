"""Pallas VMEM-resident-table gather kernels (experiment).

XLA's 1-D random gather is the dominant cost of fused-join LUT probes and
compaction on this chip (BASELINE.json names VMEM hash/lookup kernels as the
native-speed substrate). Mosaic supports exactly two gather forms, both
`take_along_axis` on equal-shaped 2-D tiles (jax/_src/pallas/mosaic/
lowering.py:2464-2524, tpu.dynamic_gather): per-column sublane gather
(axis=0) and per-row lane gather (axis=1). Arbitrary `table[idx]` needs a
(row, lane) pair per element, which those forms cannot address directly, so:

  pallas_gather_shift  table (S,) lives in VMEM as (R,128), R=S/128. For
      each lane shift s in 0..127 (statically unrolled): roll the table s
      lanes, axis-0-gather with the row indices (gives tab[row[i,j],
      (j+s)%128]), keep elements whose target lane satisfies
      (lane-j)%128 == s. 128 gathers per tile — trades XLA's serial
      element loop for full-width vector ops.

  pallas_gather_small  table with S <= 128*chunks entries: broadcast each
      128-entry chunk across a (T,128) tile, lane-gather by idx&127, select
      by idx>>7. One gather per 128 table entries — for tiny dimension LUTs.

Run on the real TPU:
    python tools_pallas_gather.py          # correctness + timing vs jnp.take
Interpret-mode correctness check (CPU):
    python tools_pallas_gather.py --interpret
"""

import sys
import time

import numpy as np


def _pad_table(table, jnp):
    s = table.shape[0]
    pad = (-s) % 1024
    if pad:
        table = jnp.concatenate([table, jnp.zeros((pad,), table.dtype)])
    return table


def pallas_gather_shift(table, idx, interpret=False):
    """table[idx] with the table VMEM-resident; S padded to 1024 multiple.
    Processes S indices per grid step (tile shape == table shape)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    table = _pad_table(table, jnp)
    s = table.shape[0]
    r = s // 128
    t2 = table.reshape(r, 128)
    n = idx.shape[0]
    pad = (-n) % s
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    npad = n + pad

    def kernel(idx_ref, tab_ref, out_ref):
        idx_t = idx_ref[:]
        tab = tab_ref[:]
        row = (idx_t >> 7).astype(jnp.int32)
        lane = (idx_t & 127).astype(jnp.int32)
        j = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 1)
        shift = (lane - j) % 128
        acc = jnp.zeros((r, 128), tab.dtype)
        for sh in range(128):
            # tab rolled left by sh lanes: tsh[i,l] = tab[i, (l+sh)%128]
            tsh = jnp.concatenate([tab[:, sh:], tab[:, :sh]], axis=1) \
                if sh else tab
            g = jnp.take_along_axis(tsh, row, axis=0)
            acc = jnp.where(shift == sh, g, acc)
        out_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(npad // s,),
        in_specs=[
            pl.BlockSpec((r, 128), lambda i: (i, 0)),
            pl.BlockSpec((r, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad // s * r, 128), table.dtype),
        interpret=interpret,
    )(idx.reshape(-1, 128), t2)
    return out.reshape(-1)[:n]


def pallas_gather_small(table, idx, tile_rows=2048, interpret=False):
    """table[idx] for tables <= a few thousand entries: one lane-gather per
    128-entry chunk, selected by the high bits."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    s0 = table.shape[0]
    pad_s = (-s0) % 128
    if pad_s:
        table = jnp.concatenate([table, jnp.zeros((pad_s,), table.dtype)])
    chunks = table.shape[0] // 128
    t2 = table.reshape(chunks, 128)
    n = idx.shape[0]
    tile = tile_rows * 128
    pad = (-n) % tile
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    npad = n + pad

    def kernel(idx_ref, tab_ref, out_ref):
        idx_t = idx_ref[:]
        lane = (idx_t & 127).astype(jnp.int32)
        hi = (idx_t >> 7).astype(jnp.int32)
        acc = jnp.zeros((tile_rows, 128), tab_ref.dtype)
        for c in range(chunks):
            chunk = jnp.broadcast_to(tab_ref[c:c + 1, :], (tile_rows, 128))
            g = jnp.take_along_axis(chunk, lane, axis=1)
            acc = jnp.where(hi == c, g, acc)
        out_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(npad // tile,),
        in_specs=[
            pl.BlockSpec((tile_rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((chunks, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_rows, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad // 128, 128), table.dtype),
        interpret=interpret,
    )(idx.reshape(-1, 128), t2)
    return out.reshape(-1)[:n]


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)

    cases = [
        ("small", pallas_gather_small, 1024, 1 << 20),
        ("shift", pallas_gather_shift, 1 << 21, 1 << 20),
        ("shift", pallas_gather_shift, 1 << 21, 6_000_000),
    ]
    if not interpret:
        cases.append(("shift", pallas_gather_shift, 1 << 21, 60_000_000))
        cases.append(("small", pallas_gather_small, 1024, 60_000_000))

    for name, fn, table_size, n in cases:
        if interpret and n > 1 << 20:
            n = 1 << 18
        table = jnp.asarray(rng.integers(0, 1 << 30, table_size, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, table_size, n, dtype=np.int32))
        out = fn(table, idx, interpret=interpret)
        ref = jnp.take(table, idx)
        ok = bool(jnp.all(out == ref))
        print(f"{name} table={table_size} n={n}: correct={ok}", flush=True)
        assert ok
        if not interpret:
            # scalar summaries on-device: timing excludes tunneling results
            p_j = jax.jit(lambda i: jnp.sum(fn(table, i)))
            x_j = jax.jit(lambda i: jnp.sum(jnp.take(table, i)))

            def timed(f):
                float(jax.device_get(f(idx)))
                best = 1e9
                for _ in range(3):
                    t0 = time.time()
                    float(jax.device_get(f(idx)))
                    best = min(best, time.time() - t0)
                return best * 1e3

            print(f"  pallas={timed(p_j):.1f}ms xla_take={timed(x_j):.1f}ms",
                  flush=True)


if __name__ == "__main__":
    main()
