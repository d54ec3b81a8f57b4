"""On-chip gather strategy micro-benchmark (run when the TPU is free).

Random gathers through XLA's native 1-D gather measured ~15ms per million
rows on this v5e (memory-bandwidth SOL would be ~0.03ms/M) — it decides the
fused-join probe cost, compaction cost, and every take(). This compares:

  g1d      out = table[idx]                    (XLA 1-D gather)
  g1dseq   same with idx = arange (sequential) — dispatch+stream bound
  g2d      table reshaped (S/128, 128); row gather by idx>>7, lane select
           by idx&127 via take_along_axis      (minor-dim-dense row gather)
  sortback sort idx, gather sorted (locality), scatter-back via inverse perm

Each variant reduces its output to ONE scalar on-device (jnp.sum) so the
timing covers device work only, not tunneling the n-sized result back to the
host (an earlier version device_get the full array — every variant measured
the same ~65MB/s tunnel transfer, not the gather).

Prints ms per variant at 6M and 60M indices over 2M- and 64M-entry tables.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    def timed(fn, *args, reps=3):
        fn_j = jax.jit(fn)
        r = fn_j(*args)
        float(jax.device_get(r))  # compile + first run
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            r = fn_j(*args)
            float(jax.device_get(r))
            best = min(best, time.time() - t0)
        return best * 1e3

    rng = np.random.default_rng(0)
    for table_size in (1 << 21, 1 << 26):
        table = jnp.asarray(rng.integers(0, 1 << 40, table_size, dtype=np.int64))
        t2d = table.reshape(-1, 128)
        t8 = table.reshape(-1, 8)
        for n in (6_000_000, 60_000_000):
            idx = jnp.asarray(rng.integers(0, table_size, n, dtype=np.int32))

            def g1d(t, i):
                return jnp.sum(jnp.take(t, i))

            def g1dseq(t, i):
                seq = jnp.arange(n, dtype=jnp.int32) % t.shape[0]
                return jnp.sum(jnp.take(t, seq)) + 0 * i[0]

            def g2d(t, i):
                rows = jnp.take(t, i >> 7, axis=0)          # (n,128) row gather
                lane = (i & 127).astype(jnp.int32)[:, None]
                return jnp.sum(jnp.take_along_axis(rows, lane, axis=1)[:, 0])

            def g2d8(t, i):
                rows = jnp.take(t, i >> 3, axis=0)          # (n,8)
                lane = (i & 7).astype(jnp.int32)[:, None]
                return jnp.sum(jnp.take_along_axis(rows, lane, axis=1)[:, 0])

            def sortback(t, i):
                si, order = jax.lax.sort([i, jnp.arange(n, dtype=jnp.int32)],
                                         num_keys=1)
                v = jnp.take(t, si)
                out = jnp.zeros((n,), t.dtype).at[order].set(v)
                return jnp.sum(out)

            res = {}
            res["g1d"] = timed(g1d, table, idx)
            res["g1dseq"] = timed(g1dseq, table, idx)
            res["g2d128"] = timed(g2d, t2d, idx)
            res["g2d8"] = timed(g2d8, t8, idx)
            if n <= 6_000_000:
                res["sortback"] = timed(sortback, table, idx)
            line = " ".join(f"{k}={v:.1f}ms" for k, v in res.items())
            print(f"table={table_size>>20}M n={n>>20}M: {line}", flush=True)


if __name__ == "__main__":
    main()
