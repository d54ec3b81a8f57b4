"""Follow-up SOL probe: gather reformulations + group-by alternatives.

tools_op_sol.py showed: 1-D gather 770x off SOL, lane take_along_axis only
20x off, large-domain segment_sum 6200x off. This probes the candidate
replacements for the engine's two hottest patterns:

gather table[idx] (fused-join LUT probe / compaction):
  g2d8    rows = take(table.reshape(-1,8),  idx>>3, axis=0); lane taa by idx&7
  g2d128  rows = take(table.reshape(-1,128),idx>>7, axis=0); lane taa by idx&127
  g2d512  same with 512-wide rows (4 vregs per row)
  (if XLA row gathers are DMA-shaped, g2d8 moves only 8x the bytes)

group-by sum(vals) by sorted gid into S segments (agg pipelines):
  sgsum_dense  jax.ops.segment_sum at S=8192 (small domain control)
  cumsum       plain jnp.cumsum over N int64 (segmented-scan building block)
  sortedseg    cumsum + boundary gather: out[g] = csum[end_g] - csum[start_g]
               (one S-sized 1-D gather instead of an N-sized scatter)

searchsorted probe (sort-based joins): jnp.searchsorted(sorted S, N keys)
"""

import os
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    HBM = 819e9
    N = int(os.environ.get("SOL_N", 60_000_000))
    S = int(os.environ.get("SOL_S", 1 << 21))

    def wall(f, *a):
        jax.device_get(f(*a))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            jax.device_get(f(*a))
            best = min(best, time.time() - t0)
        return best * 1e3

    def probe(name, state, body, summary, nbytes, K=8):
        def runk(k):
            def f(s):
                return summary(lax.fori_loop(0, k, lambda i, s_: body(s_), s))
            return jax.jit(f)

        t1 = wall(runk(1), state)
        tK = wall(runk(K), state)
        per = (tK - t1) / (K - 1)
        sol = nbytes / HBM * 1e3
        print(
            f"{name}: 1it={t1:.1f}ms {K}it={tK:.1f}ms per_iter={per:.2f}ms "
            f"bytes={nbytes/1e6:.0f}MB sol={sol:.2f}ms ratio={per/sol:.1f}x",
            flush=True,
        )

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, S, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, S, N, dtype=np.int32))
    bit = lambda s: (s[1] & 1).astype(jnp.int32)

    def g2d(w, shiftbits, t2):
        def body(s):
            i = s[0] ^ bit(s)
            rows = jnp.take(t2, i >> shiftbits, axis=0)
            lane = (i & (w - 1))[:, None]
            return (s[0], jnp.sum(jnp.take_along_axis(rows, lane, axis=1)))
        return body

    for w, b in ((8, 3), (128, 7), (512, 9)):
        # cap n so the (n, w) row intermediate stays ~<=3GB if unfused;
        # TPU tiling T(8,128) pads the minor dim to 128 lanes
        n_eff = min(N, (3 << 30) // (4 * max(w, 128)))
        idx_w = idx[:n_eff]
        probe(f"g2d{w}_n{n_eff >> 20}M", (idx_w, jnp.zeros((), jnp.int64)),
              g2d(w, b, table.reshape(-1, w)),
              lambda s: s[1], nbytes=n_eff * (4 + 4 * w), K=4)

    # group-by formulations
    SD = 8192
    segd = jnp.asarray(np.sort(rng.integers(0, SD, N).astype(np.int32)))
    vals = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int64))
    wt_d = jnp.asarray(rng.integers(1, 97, SD, dtype=np.int64))
    probe(
        "sgsum_dense8k", (vals, jnp.zeros((), jnp.int64)),
        lambda s: (s[0], jnp.sum(wt_d * jax.ops.segment_sum(
            s[0] ^ bit(s), segd, num_segments=SD, indices_are_sorted=True))),
        lambda s: s[1], nbytes=N * 12, K=4,
    )

    probe(
        "cumsum", (vals, jnp.zeros((), jnp.int64)),
        lambda s: (s[0], jnp.cumsum(s[0] ^ bit(s))[N // 2]),
        lambda s: s[1], nbytes=N * 16, K=4,
    )

    seg = jnp.asarray(np.sort(rng.integers(0, S, N).astype(np.int32)))
    wt = jnp.asarray(rng.integers(1, 97, S, dtype=np.int64))
    starts = jnp.searchsorted(seg, jnp.arange(S, dtype=jnp.int32))

    def sortedseg(s):
        c = jnp.cumsum(s[0] ^ bit(s))
        tot = c[-1]
        at_start = jnp.take(c, starts)  # S-sized gather
        sums = jnp.diff(jnp.concatenate([at_start, tot[None]]))
        return (s[0], jnp.sum(wt * sums))

    probe("sortedseg2M", (vals, jnp.zeros((), jnp.int64)), sortedseg,
          lambda s: s[1], nbytes=N * 16 + S * 8, K=4)

    # searchsorted: 6M probes into sorted S table (binary search =
    # log2(S) rounds of 1-D pivot gathers, expected slow — confirm)
    skeys = jnp.sort(table)
    n_ss = min(N, 6_000_000)
    probe(
        "searchsorted", (idx[:n_ss], jnp.zeros((), jnp.int64)),
        lambda s: (s[0], jnp.sum(
            jnp.searchsorted(skeys, s[0] ^ bit(s)).astype(jnp.int64))),
        lambda s: s[1], nbytes=n_ss * 8, K=2,
    )


if __name__ == "__main__":
    main()
