"""Pallas VMEM-resident-table gather experiment.

XLA's 1-D random gather measured ~15ms per million rows on this v5e — the
dominant cost of fused-join probes and compaction (BASELINE.json names VMEM
hash/lookup kernels as the native-speed substrate). This kernel keeps the
whole lookup table in VMEM (fits for dimension LUTs <= ~12MB, e.g. Q14's 2M
x int32 = 8MB) and streams index tiles through the grid; per tile the gather
happens entirely on-chip.

Run on the real TPU:
    python tools_pallas_gather.py          # correctness + timing vs jnp.take
Interpret-mode correctness check (CPU):
    python tools_pallas_gather.py --interpret
"""

import sys
import time

import numpy as np


def pallas_gather(table, idx, tile=8192, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = idx.shape[0]
    pad = (-n) % tile
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    npad = n + pad

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    grid = (npad // tile,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,)),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,)),
        out_shape=jax.ShapeDtypeStruct((npad,), table.dtype),
        interpret=interpret,
    )(idx, table)
    return out[:n]


def main():
    import jax
    import jax.numpy as jnp

    interpret = "--interpret" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    for table_size, n in ((1 << 21, 1 << 20), (1 << 21, 6_000_000)):
        table = jnp.asarray(rng.integers(0, 1 << 30, table_size, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, table_size, n, dtype=np.int32))
        out = pallas_gather(table, idx, interpret=interpret)
        ref = jnp.take(table, idx)
        ok = bool(jnp.all(out == ref))
        print(f"table={table_size} n={n}: correct={ok}", flush=True)
        assert ok
        if not interpret:
            def timed(fn):
                r = fn(); np.asarray(jax.device_get(r))
                t0 = time.time()
                for _ in range(3):
                    r = fn()
                np.asarray(jax.device_get(r))
                return (time.time() - t0) / 3 * 1e3

            t_p = timed(lambda: pallas_gather(table, idx))
            t_x = timed(lambda: jnp.take(table, idx))
            print(f"  pallas={t_p:.1f}ms xla_take={t_x:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
