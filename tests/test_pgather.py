"""Interpret-mode correctness tests for the Pallas data-movement kernels
(lingodb_tpu/ops/pgather.py). On-chip timing lives in tools_kbench.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lingodb_tpu.ops import pgather


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pgather, "INTERPRET", True)


RNG = np.random.default_rng(7)


@pytest.mark.parametrize("s,n", [(1, 100), (100, 1000), (1024, 5000),
                                 (4096, 70000), (8192, 9000)])
def test_gather_chunked(s, n):
    table = jnp.asarray(RNG.integers(-(1 << 30), 1 << 30, s, np.int32))
    idx = jnp.asarray(RNG.integers(0, s, n, np.int32))
    out = pgather.gather_chunked_i32(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[idx])


def test_gather_chunked_clamps():
    table = jnp.asarray(np.arange(100, dtype=np.int32))
    idx = jnp.asarray(np.array([-5, 0, 99, 150], np.int32))
    out = np.asarray(pgather.gather_chunked_i32(table, idx))
    np.testing.assert_array_equal(out, [0, 0, 99, 99])


@pytest.mark.parametrize("n,p", [(100, 0.5), (8192, 0.1), (40000, 0.01),
                                 (70000, 0.9), (8192 * 3, 0.0),
                                 (8192, 1.0)])
def test_compact_positions(n, p):
    mask = RNG.random(n) < p
    expect = np.flatnonzero(mask)
    k = max(int(len(expect) * 1.5) + 256, 512)
    cnt, pos = pgather.compact_positions(jnp.asarray(mask), k)
    assert int(cnt) == len(expect)
    np.testing.assert_array_equal(np.asarray(pos)[: len(expect)], expect)


def test_compact_positions_overflow_reports_count():
    n = 9000
    mask = np.ones(n, bool)
    cnt, _pos = pgather.compact_positions(jnp.asarray(mask), 1024)
    assert int(cnt) == n  # count is honest even when k overflows


@pytest.mark.parametrize("s,n,maxstep", [(300_000, 40_000, 4),
                                         (5_000, 30_000, 2),
                                         (600_000, 50_000, 7)])
def test_gather_sorted(s, n, maxstep):
    table = jnp.asarray(RNG.integers(-(1 << 30), 1 << 30, s, np.int32))
    # monotone indices whose local span stays under d_chunks*1024
    steps = RNG.integers(0, maxstep, n)
    idx = np.minimum(np.cumsum(steps), s - 1).astype(np.int32)
    out, ovf = pgather.gather_sorted_i32(table, jnp.asarray(idx))
    assert int(ovf) == 0
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[idx])


def test_gather_sorted_overflow_flag():
    # local span far beyond d_chunks*1024 within one vreg -> must flag
    s = 600_000
    table = jnp.asarray(RNG.integers(0, 1 << 30, s, np.int32))
    idx = np.sort(RNG.integers(0, s, 40_000)).astype(np.int32)
    out, ovf = pgather.gather_sorted_i32(table, jnp.asarray(idx),
                                         d_chunks=1)
    assert int(ovf) > 0


def test_segscan():
    # sorted gid with short runs
    runs = RNG.integers(1, 9, 6000)
    gid = np.repeat(np.arange(len(runs)), runs).astype(np.int32)
    n = len(gid)
    v1 = RNG.integers(-1000, 1000, n).astype(np.int32)
    v2 = np.ones(n, np.int32)
    o1, o2 = pgather.segscan_i32(jnp.asarray(gid),
                                 [jnp.asarray(v1), jnp.asarray(v2)])
    # reference: within-run inclusive cumsum
    import pandas as pd  # noqa: F401  (numpy-only reference below)
    ref1 = np.zeros(n, np.int64)
    ref2 = np.zeros(n, np.int64)
    acc1 = acc2 = 0
    for i in range(n):
        if i and gid[i] != gid[i - 1]:
            acc1 = acc2 = 0
        acc1 += int(v1[i]); acc2 += int(v2[i])
        ref1[i], ref2[i] = acc1, acc2
    np.testing.assert_array_equal(np.asarray(o1), ref1.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(o2), ref2.astype(np.int32))


def test_segscan_long_single_run():
    n = 20_000
    gid = np.zeros(n, np.int32)
    v = np.ones(n, np.int32)
    (o,) = pgather.segscan_i32(jnp.asarray(gid), [jnp.asarray(v)])
    np.testing.assert_array_equal(np.asarray(o), np.arange(1, n + 1))


@pytest.mark.parametrize("dtype", [np.int64, np.float64, np.int32, np.bool_])
def test_take_fast_sort_route(dtype, monkeypatch):
    """Random indices over a big dense table ride sort + windowed gather +
    unsort; outputs must equal numpy take for every limb layout."""
    monkeypatch.setattr(pgather, "FORCE_PALLAS", True)
    monkeypatch.setattr(pgather, "MIN_N", 1 << 10)
    s, n = 300_000, 70_000  # gap ~4 << MAX_SORTED_GAP, table > chunk limit
    if dtype == np.bool_:
        table = RNG.integers(0, 2, s).astype(np.bool_)
    elif dtype == np.float64:
        table = RNG.normal(size=s)
    else:
        table = RNG.integers(-(1 << 40), 1 << 40, s).astype(dtype)
        if dtype == np.int32:
            table = RNG.integers(-(1 << 30), 1 << 30, s, np.int32)
    idx = RNG.integers(0, s, n).astype(np.int32)
    out = pgather.take_fast(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_take_fast_sort_route_sparse_falls_back(monkeypatch):
    """Average gap beyond MAX_SORTED_GAP keeps the plain XLA take."""
    monkeypatch.setattr(pgather, "FORCE_PALLAS", True)
    monkeypatch.setattr(pgather, "MIN_N", 1 << 10)
    s, n = 2_000_000, 2_000  # gap 1000: windowed walk would thrash
    table = RNG.integers(-(1 << 30), 1 << 30, s, np.int32)
    idx = RNG.integers(0, s, n).astype(np.int32)
    out = pgather.take_fast(jnp.asarray(table), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), table[idx])
