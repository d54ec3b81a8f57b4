"""On-chip timing of the engine's actual hot data-movement shapes (round 3).

Measures, at TPC-H SF10 shapes, each primitive the fused q14/q3/q10/q18
programs dispatch, so a slow kernel is visible in isolation rather than
inside a 200-second-compile fused program:

  mask60M        elementwise date-range mask over 60M int32
  compact60M     pgather.nonzero_positions(mask, 1.5M) over 60M rows
  gsorted_60M    windowed sorted gather: 1.5M monotone idx over a 60M table
  gsorted_2M     windowed sorted gather: 1.5M monotone idx over a 2M table
  sortroute_2M   take_fast sort-route: 1.5M RANDOM idx over a 2M table
  sortroute_60M  take_fast sort-route: 60M RANDOM idx over a 2M table
  xla_take_*     jnp.take baselines at the same shapes
  cumsum60M      jnp.cumsum int64 over 60M (the new group-sum substrate)
  sort_pay60M    lax.sort of 60M int32 key + 3 payloads (general grouping)
  boundary_g     boundary gathers: cumsum + 2 monotone takes at 1.5M bounds

Run on the real chip: python benchtools/tools_kbench3.py [--quick]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

QUICK = "--quick" in sys.argv
N = 8_000_000 if QUICK else 60_000_000
NP = 200_000 if QUICK else 1_500_000
S = 2_000_000


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


def report(name, per_ms, nbytes, extra=""):
    sol_ms = nbytes / 819e9 * 1e3
    print(f"{name}: per_iter={per_ms:.2f}ms bytes={nbytes / 1e6:.0f}MB "
          f"sol={sol_ms:.2f}ms ratio={per_ms / max(sol_ms, 1e-9):.1f}x {extra}",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lingodb_tpu.ops import pgather

    rng = np.random.default_rng(5)
    print(f"# devices={jax.devices()} N={N} NP={NP} S={S}", flush=True)

    dates = jnp.asarray(rng.integers(8000, 11000, N).astype(np.int32))
    table60 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    table2m = jnp.asarray(rng.integers(0, 1 << 30, S).astype(np.int32))
    idx_sorted60 = jnp.asarray(np.sort(rng.integers(0, N, NP)).astype(np.int32))
    idx_sorted2m = jnp.asarray(np.sort(rng.integers(0, S, NP)).astype(np.int32))
    idx_rand2m = jnp.asarray(rng.integers(0, S, NP).astype(np.int32))
    idx_rand2m_big = jnp.asarray(rng.integers(0, S, N).astype(np.int32))

    f = jax.jit(lambda d: jnp.sum(((d >= 9000) & (d < 9030)).astype(jnp.int32)))
    report("mask60M", timed(f, dates), N * 4)

    k = 1 << 21

    def compact(m):
        cnt, pos = pgather.nonzero_positions(m, k)
        return cnt, jnp.sum(pos[:128])

    mask = jax.jit(lambda d: (d >= 9000) & (d < 9075))(dates)
    report("compact60M", timed(jax.jit(compact), mask), N * 1 + k * 4)

    def gs(t, i):
        g, ovf = pgather.gather_sorted_i32(t, i)
        return jnp.sum(g[:128]) + ovf

    report("gsorted_60M", timed(jax.jit(gs), table60, idx_sorted60),
           N * 4 + NP * 4, "(whole-table window walk)")
    report("gsorted_2M", timed(jax.jit(gs), table2m, idx_sorted2m),
           S * 4 + NP * 4)

    tf = jax.jit(lambda t, i: jnp.sum(pgather.take_fast(t, i)[:128]))
    report("sortroute_2M", timed(tf, table2m, idx_rand2m), NP * 4 * 4 + S * 4)
    report("sortroute_60M", timed(tf, table2m, idx_rand2m_big), N * 4 * 4 + S * 4)

    xt = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, mode="clip")[:128]))
    report("xla_take_2M_np", timed(xt, table2m, idx_rand2m), NP * 4 * 2 + S * 4)
    report("xla_take_2M_60M", timed(xt, table2m, idx_rand2m_big), N * 4 * 2 + S * 4)

    v64 = jnp.asarray(rng.integers(0, 1 << 40, N).astype(np.int64))
    cs = jax.jit(lambda v: jnp.cumsum(v)[-1])
    report("cumsum60M", timed(cs, v64), N * 8 * 2)

    p1 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    p3 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int64))

    def spay(kk, a, b, c):
        r = jax.lax.sort([kk, a, b, c], num_keys=1)
        return r[0][-1] + r[1][-1]

    report("sort_pay60M", timed(jax.jit(spay), table60, p1, p2, p3),
           N * (4 + 4 + 4 + 8) * 2)

    bpos = idx_sorted60

    def bg(v, b):
        csum = jnp.cumsum(v)
        hi = pgather.take_fast(csum, b, monotone=True)
        lo = pgather.take_fast(csum, jnp.maximum(b - 1, 0), monotone=True)
        return jnp.sum((hi - lo)[:128])

    report("boundary_g", timed(jax.jit(bg), v64, bpos), N * 8 * 2 + NP * 8 * 2)


if __name__ == "__main__":
    main()
