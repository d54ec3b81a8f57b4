"""On-chip correctness + timing for the pgather Pallas kernels (round 3).

Run: python tools_kbench2.py [--quick]
Prints per kernel: steady-state per-iter ms, Ge/s, ratio vs HBM SOL.
"""

import sys
import time

import numpy as np

QUICK = "--quick" in sys.argv


def timed(fn, *args, k=6):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)

    def run(n):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run(1), run(k)
    return (tk - t1) / (k - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from lingodb_tpu.ops import pgather

    rng = np.random.default_rng(0)
    N = 6_000_000 if QUICK else 60_000_000
    HBM = 819e9
    print(f"devices={jax.devices()} N={N}", flush=True)

    def rep(name, per, n, nbytes, ok):
        sol = nbytes / HBM * 1e3
        print(f"{name}: per_iter={per:.2f}ms rate={n/per/1e6:.2f}Ge/s "
              f"sol={sol:.2f}ms ratio={per/max(sol,1e-9):.1f}x correct={ok}",
              flush=True)

    # K1 gather_chunked
    for s in (1024, 8192):
        table = jnp.asarray(rng.integers(0, 1 << 30, s, np.int32))
        idx = jnp.asarray(rng.integers(0, s, N, np.int32))
        f = jax.jit(lambda i, t=table: pgather.gather_chunked_i32(t, i))
        out = f(idx)
        ok = bool(jnp.all(out == jnp.take(table, idx)))
        per = timed(f, idx)
        rep(f"k1_chunked_S{s}", per, N, N * 8, ok)

    # K3 compact_positions
    for p in (0.01, 0.5):
        mask = jnp.asarray(rng.random(N) < p)
        k = int(N * p * 1.5) + 8192
        f = jax.jit(lambda m: pgather.compact_positions(m, k))
        cnt, pos = f(mask)
        expect = np.flatnonzero(np.asarray(mask))
        ok = (int(cnt) == len(expect)
              and bool(np.array_equal(np.asarray(pos)[:len(expect)], expect)))
        per = timed(f, mask)
        rep(f"k3_compact_p{p}", per, N, N * 1 + len(expect) * 4, ok)

    # K2 gather_sorted: dense-ish monotone (FK probe shape)
    s = N  # table as large as the stream
    table = jnp.asarray(rng.integers(0, 1 << 30, s, np.int32))
    steps = rng.integers(0, 2, N)
    idx = jnp.asarray(np.minimum(np.cumsum(steps), s - 1).astype(np.int32))
    f = jax.jit(lambda i, t=table: pgather.gather_sorted_i32(t, i)[0])
    out = f(idx)
    ok = bool(jnp.all(out == jnp.take(table, idx)))
    per = timed(f, idx)
    rep("k2_sorted_dense", per, N, N * 8 + N * 4, ok)

    # K2 sparse monotone (post-filter positions at 1% selectivity)
    nsel = N // 100
    pos_idx = np.sort(rng.choice(N, nsel, replace=False)).astype(np.int32)
    pos_j = jnp.asarray(pos_idx)
    dck, trk = pgather.pick_sorted_params(N, nsel)
    f2 = jax.jit(lambda i, t=table: pgather.gather_sorted_i32(
        t, i, d_chunks=dck, t_rows=trk)[0])
    out2, ovf2 = pgather.gather_sorted_i32(table, pos_j, d_chunks=dck,
                                           t_rows=trk)
    ok2 = bool(jnp.all(out2 == jnp.take(table, pos_j))) if int(ovf2) == 0 \
        else f"ovf={int(ovf2)}"
    per2 = timed(f2, pos_j)
    rep(f"k2_sorted_sparse1pct_d{dck}t{trk}", per2, nsel, N * 4, ok2)

    # K4 segscan (2 words)
    runs_n = N // 4
    gid = jnp.asarray(np.repeat(np.arange(runs_n, dtype=np.int32), 4)[:N])
    v1 = jnp.asarray(rng.integers(-1000, 1000, N, np.int32))
    ones = jnp.ones((N,), jnp.int32)
    f3 = jax.jit(lambda g, a, b: pgather.segscan_i32(g, [a, b]))
    o1, o2 = f3(gid, v1, ones)
    # spot-verify on a slice
    gs = np.asarray(gid[:10000]); vs = np.asarray(v1[:10000])
    acc = 0; ref = np.zeros(10000, np.int64)
    for i in range(10000):
        if i and gs[i] != gs[i - 1]:
            acc = 0
        acc += int(vs[i]); ref[i] = acc
    ok3 = bool(np.array_equal(np.asarray(o1[:10000]), ref.astype(np.int32)))
    per3 = timed(f3, gid, v1, ones)
    rep("k4_segscan_w2", per3, N, N * 4 * 5, ok3)

    # XLA baselines at matching shapes
    fx = jax.jit(lambda i, t=table: jnp.take(t, i))
    per = timed(fx, idx, k=2)
    rep("xla_take_sorted", per, N, N * 8, True)


if __name__ == "__main__":
    main()
