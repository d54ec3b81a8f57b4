"""On-chip calibration of Pallas gather-substrate primitives (round 3).

The engine's perf blocker is XLA's 1-D random gather (~770x SOL) and
scatter-based segment_sum (~6200x SOL) — bench_results/op_sol.log. This tool
measures, on the real chip, the building blocks of a Pallas replacement:

  calib_lane    take_along_axis(axis=1) on (T,128) tiles — lane gather rate
  calib_sub_R   take_along_axis(axis=0) of (Ti,128) rows from an (R,128)
                VMEM-resident table, by R — sublane gather rate vs height
  calib_roll    static lane-roll (concat) of (R,128) — roll rate
  gather_small  chunked broadcast+lane-gather for tables <= ~4K entries
  gather_shift  128-shift VMEM-table gather (arbitrary table[idx], S <= VMEM)
  xla_take      jnp.take baseline at the same sizes
  mm_compact    within-tile compaction as an fp32 onehot matmul (MXU route)

Timing: per-iteration steady state — K async dispatches back-to-back,
(t_K - t_1)/(K-1), result summarized to a scalar on device so nothing bulky
crosses the axon tunnel. int32 only (Mosaic has no 64-bit).

Run: JAX_PLATFORMS=  python tools_kbench.py [--quick]
"""

import functools
import sys
import time

import numpy as np

QUICK = "--quick" in sys.argv


def timed(fn, *args, k=8):
    """Steady-state ms/call: k back-to-back async dispatches."""
    import jax

    r = fn(*args)
    jax.block_until_ready(r)  # compile + warm
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
    return (tk - t1) / (k - 1) * 1e3, t1 * 1e3


def report(name, per_ms, n_elem, nbytes, extra=""):
    hbm = 819e9
    sol_ms = nbytes / hbm * 1e3
    rate = n_elem / (per_ms * 1e-3) / 1e9
    print(f"{name}: per_iter={per_ms:.2f}ms rate={rate:.2f}Ge/s "
          f"sol={sol_ms:.2f}ms ratio={per_ms/max(sol_ms,1e-9):.1f}x {extra}",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    N = 6_000_000 if QUICK else 60_000_000
    print(f"devices={jax.devices()} N={N}", flush=True)

    # ---- calib_lane: lane gather rate --------------------------------------
    T = 1024  # rows per tile
    n_tiles = N // (T * 128)
    data = jnp.asarray(rng.integers(0, 1 << 30, (n_tiles * T, 128), np.int32))
    lanes = jnp.asarray(rng.integers(0, 128, (n_tiles * T, 128), np.int32))

    def k_lane(d_ref, l_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(d_ref[:], l_ref[:], axis=1)

    f_lane = jax.jit(lambda d, l: pl.pallas_call(
        k_lane,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((T, 128), lambda i: (i, 0)),
                  pl.BlockSpec((T, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * T, 128), jnp.int32),
    )(d, l)[0, 0])
    per, _ = timed(f_lane, data, lanes)
    report("calib_lane", per, n_tiles * T * 128, n_tiles * T * 128 * 4 * 3)

    # ---- calib_sub_R: sublane gather within (R,128) tiles (idx shape == tab
    # shape — Mosaic tpu.dynamic_gather requirement) ------------------------
    for R in (8, 64, 512, 4096, 16384):
        nt = max(1, N // (R * 128))
        tab = jnp.asarray(rng.integers(0, 1 << 30, (R, 128), np.int32))
        rows = jnp.asarray(rng.integers(0, R, (nt * R, 128), np.int32))

        def k_sub(r_ref, t_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], r_ref[:], axis=0)

        try:
            f_sub = jax.jit(lambda r, t, R=R, nt=nt: pl.pallas_call(
                k_sub,
                grid=(nt,),
                in_specs=[pl.BlockSpec((R, 128), lambda i: (i, 0)),
                          pl.BlockSpec((R, 128), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((nt * R, 128), jnp.int32),
            )(r, t)[0, 0])
            per, _ = timed(f_sub, rows, tab)
            report(f"calib_sub_R{R}", per, nt * R * 128, nt * R * 128 * 4 * 3)
        except Exception as e:  # noqa: BLE001
            print(f"calib_sub_R{R}: FAIL {repr(e)[:150]}", flush=True)

    # ---- calib_roll: 128 static rolls of (R,128) ---------------------------
    R = 4096
    tab = jnp.asarray(rng.integers(0, 1 << 30, (R, 128), np.int32))

    def k_roll(t_ref, o_ref):
        t = t_ref[:]
        acc = jnp.zeros_like(t)
        for sh in range(1, 129):
            s = sh % 128
            tsh = jnp.concatenate([t[:, s:], t[:, :s]], axis=1) if s else t
            acc = acc + tsh
        o_ref[:] = acc

    f_roll = jax.jit(lambda t: pl.pallas_call(
        k_roll,
        grid=(8,),
        in_specs=[pl.BlockSpec((R, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
    )(t)[0, 0])
    per, _ = timed(f_roll)
    report("calib_roll128x8", per, 8 * 128 * R * 128, R * 128 * 4)

    # ---- pltpu.roll variant ------------------------------------------------
    try:
        from jax.experimental.pallas import tpu as pltpu

        def k_roll2(t_ref, o_ref):
            t = t_ref[:]
            acc = jnp.zeros_like(t)
            for sh in range(1, 129):
                acc = acc + pltpu.roll(t, shift=sh % 128, axis=1)
            o_ref[:] = acc

        f_roll2 = jax.jit(lambda t: pl.pallas_call(
            k_roll2,
            grid=(8,),
            in_specs=[pl.BlockSpec((R, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        )(t)[0, 0])
        per, _ = timed(f_roll2)
        report("calib_pltpuroll", per, 8 * 128 * R * 128, R * 128 * 4)
    except Exception as e:  # noqa: BLE001
        print(f"calib_pltpuroll: FAIL {repr(e)[:150]}",
              flush=True)

    # ---- composite: gather_shift on (S, n) ---------------------------------
    sys.path.insert(0, ".")
    from tools_pallas_gather import pallas_gather_shift, pallas_gather_small

    for S, n in ((1 << 16, N), (1 << 21, N)):
        tab1 = jnp.asarray(rng.integers(0, 1 << 30, S, np.int32))
        idx = jnp.asarray(rng.integers(0, S, n, np.int32))
        f = jax.jit(lambda i, t=tab1: jnp.sum(
            pallas_gather_shift(t, i), dtype=jnp.int32))
        try:
            per, t1 = timed(f, idx, k=4)
            ok = bool(jnp.sum(jnp.take(tab1, idx), dtype=jnp.int32) == f(idx))
            report(f"gather_shift_S{S}_n{n}", per, n, n * 8,
                   extra=f"correct={ok} t1={t1:.0f}ms")
        except Exception as e:  # noqa: BLE001
            print(f"gather_shift_S{S}: FAIL {repr(e)[:150]}",
                  flush=True)

    for S, n in ((1024, N), (4096, N)):
        tab1 = jnp.asarray(rng.integers(0, 1 << 30, S, np.int32))
        idx = jnp.asarray(rng.integers(0, S, n, np.int32))
        f = jax.jit(lambda i, t=tab1: jnp.sum(
            pallas_gather_small(t, i), dtype=jnp.int32))
        try:
            per, t1 = timed(f, idx, k=4)
            ok = bool(jnp.sum(jnp.take(tab1, idx), dtype=jnp.int32) == f(idx))
            report(f"gather_small_S{S}_n{n}", per, n, n * 8,
                   extra=f"correct={ok} t1={t1:.0f}ms")
        except Exception as e:  # noqa: BLE001
            print(f"gather_small_S{S}: FAIL {repr(e)[:150]}",
                  flush=True)

    # ---- XLA take baselines ------------------------------------------------
    for S in (1024, 1 << 16, 1 << 21):
        tab1 = jnp.asarray(rng.integers(0, 1 << 30, S, np.int32))
        idx = jnp.asarray(rng.integers(0, S, N, np.int32))
        f = jax.jit(lambda i, t=tab1: jnp.sum(jnp.take(t, i),
                                              dtype=jnp.int32))
        per, _ = timed(f, idx, k=2)
        report(f"xla_take_S{S}_n{N}", per, N, N * 8)

    # ---- mm_compact: onehot-matmul within-tile compaction rate -------------
    # out[q] = x[src_q]; P[q,p] = (cumsum_p == q+1 & mask_p); out = P @ x.
    Tc = 256
    ntc = max(1, N // (Tc * 128))  # treat each of 128 lanes as a column batch
    xs = jnp.asarray(rng.integers(0, 1 << 15, (ntc * Tc, 128), np.int32))
    ms = jnp.asarray((rng.random((ntc * Tc, 128)) < 0.2), np.int32)

    def k_mm(x_ref, m_ref, o_ref):
        x = x_ref[:].astype(jnp.float32)
        m = m_ref[:].astype(jnp.float32)
        c = jnp.cumsum(m, axis=0)  # per-lane compaction (column-wise)
        q = jax.lax.broadcasted_iota(jnp.float32, (Tc, Tc), 0)
        # P[q,p] per lane would be 3-D; approximate the cost: one (Tc,Tc)
        # fp32 matmul per tile against the (Tc,128) values.
        P = (q == c[:, :1].T).astype(jnp.float32)
        o_ref[:] = jnp.dot(P, x * m,
                           preferred_element_type=jnp.float32).astype(jnp.int32)

    f_mm = jax.jit(lambda x, m: pl.pallas_call(
        k_mm,
        grid=(ntc,),
        in_specs=[pl.BlockSpec((Tc, 128), lambda i: (i, 0)),
                  pl.BlockSpec((Tc, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((Tc, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ntc * Tc, 128), jnp.int32),
    )(x, m)[0, 0])
    try:
        per, _ = timed(f_mm, xs, ms)
        report("mm_compact_cost", per, ntc * Tc * 128, ntc * Tc * 128 * 4 * 3)
    except Exception as e:  # noqa: BLE001
        print(f"mm_compact: FAIL {repr(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
