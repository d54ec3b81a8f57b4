"""Per-operator device-time speed-of-light probe (run when the TPU is free).

Every previously recorded on-chip number (gather ~15ms/M, q6 24x off SOL)
timed ONE jit call end-to-end — which includes the axon tunnel dispatch+sync
round-trip. This tool separates the two:

  - dispatch floor: jit(x+1) on a scalar, timed per call
  - per-op device cost: the op iterated K times INSIDE one jit via a
    data-dependent fori_loop (the op input is xor'd with a bit of the
    running accumulator, so XLA cannot CSE or hoist the iterations), the
    1-iteration wall subtracted, divided by (K-1)

Each jit returns a scalar summary (the accumulator / a middle element), so
no bulk result crosses the tunnel. Ops and sizes match the fused TPC-H
pipelines at SF10. Treat results as order-of-magnitude: loop-carried inputs
may get different layouts than straight-line code.
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax import lax

    HBM = 819e9

    def wall(f, *a):
        r = jax.device_get(f(*a))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            r = jax.device_get(f(*a))
            best = min(best, time.time() - t0)
        return best * 1e3, r

    one = jnp.zeros((), jnp.int64)
    f_floor = jax.jit(lambda x: x + 1)
    floor_ms, _ = wall(f_floor, one)
    print(f"dispatch_floor={floor_ms:.2f}ms", flush=True)

    rng = np.random.default_rng(0)

    def probe(name, state, body, summary, nbytes, K=8):
        def runk(k):
            def f(s):
                out = lax.fori_loop(0, k, lambda i, s_: body(s_), s)
                return summary(out)
            return jax.jit(f)

        f1, fK = runk(1), runk(K)
        t1, _ = wall(f1, state)
        tK, _ = wall(fK, state)
        per = (tK - t1) / (K - 1)
        sol = nbytes / HBM * 1e3
        print(
            f"{name}: 1it={t1:.1f}ms {K}it={tK:.1f}ms per_iter={per:.2f}ms "
            f"bytes={nbytes/1e6:.0f}MB sol={sol:.2f}ms ratio={per/sol:.1f}x",
            flush=True,
        )

    import os

    N = int(os.environ.get("SOL_N", 60_000_000))
    S = int(os.environ.get("SOL_S", 1 << 21))

    x64 = jnp.asarray(rng.integers(0, 1 << 40, N, dtype=np.int64))
    probe(
        "copy", x64,
        lambda s: s * 3 + 1,
        lambda s: s[N // 2],
        nbytes=N * 16,
    )

    table = jnp.asarray(rng.integers(0, 1 << 30, S, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, S, N, dtype=np.int32))
    probe(
        "gather_rand", (idx, jnp.zeros((), jnp.int64)),
        lambda s: (s[0], jnp.sum(jnp.take(table, s[0] ^ (s[1] & 1).astype(jnp.int32)))),
        lambda s: s[1],
        nbytes=N * (4 + 4),
    )

    idxs = jnp.asarray(np.arange(N, dtype=np.int32) % S)
    probe(
        "gather_seq", (idxs, jnp.zeros((), jnp.int64)),
        lambda s: (s[0], jnp.sum(jnp.take(table, s[0] ^ (s[1] & 1).astype(jnp.int32)))),
        lambda s: s[1],
        nbytes=N * (4 + 4),
    )

    rows = jnp.asarray(
        rng.integers(0, 1 << 30, (N // 128, 128), dtype=np.int32))
    lanes = jnp.asarray(rng.integers(0, 128, (N // 128, 1), dtype=np.int32))
    probe(
        "lane_taa", (rows, jnp.zeros((), jnp.int64)),
        lambda s: (s[0], jnp.sum(jnp.take_along_axis(
            s[0], lanes ^ (s[1] & 1).astype(jnp.int32), axis=1))),
        lambda s: s[1],
        nbytes=N * 4,
    )

    M = int(os.environ.get("SOL_M", 6_000_000))
    k6 = jnp.asarray(rng.integers(0, 1 << 40, M, dtype=np.int64))
    probe(
        "sort", k6,
        lambda s: lax.sort(s ^ 1),
        lambda s: s[M // 2],
        nbytes=M * 8 * 2 * 23,  # ~log2(6M) passes, rough
        K=4,
    )
    p6 = jnp.asarray(rng.integers(0, 1 << 40, M, dtype=np.int64))
    probe(
        "sortpair", (k6, p6),
        lambda s: tuple(lax.sort([s[0] ^ 1, s[1]], num_keys=1)),
        lambda s: s[0][M // 2] + s[1][M // 2],
        nbytes=M * 16 * 2 * 23,
        K=4,
    )

    seg = jnp.asarray(np.sort(rng.integers(0, S, N).astype(np.int32)))
    vals = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int64))
    wt = jnp.asarray(rng.integers(1, 97, S, dtype=np.int64))
    probe(
        "sgsum", (vals, jnp.zeros((), jnp.int64)),
        lambda s: (s[0], jnp.sum(wt * jax.ops.segment_sum(
            s[0] ^ (s[1] & 1).astype(jnp.int32), seg, num_segments=S,
            indices_are_sorted=True))),
        lambda s: s[1],
        nbytes=N * (8 + 4),
        K=4,
    )


if __name__ == "__main__":
    main()
