"""Vectorized 64-bit hashing of column sets.

TPU-native equivalent of the reference's runtime hash support
(reference: src/runtime/Hash.cpp, include/lingodb/runtime/helpers.h — CRC
combine + varlen hashing called per tuple). Here: murmur-style finalizer over
whole columns in uint64, combined across key columns; strings hash their
dictionary codes (dictionaries are per-column stable, so equal codes <=> equal
strings within a column; cross-column joins remap through a merged dictionary
first, see ops/join.py)."""

from __future__ import annotations

import numpy as np

from .backend import xnp as jnp


def splitmix64(x):
    """Murmur/splitmix finalizer, uint64 -> uint64, vectorized."""
    x = x.astype(jnp.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return x


def _to_u64(data):
    if getattr(data, "dtype", None) == np.object_:
        # wide (Python-int) decimals: fold 64-bit limbs (equal values hash
        # equal; joins verify candidates exactly so collisions are safe)
        M = (1 << 64) - 1
        flat = data.reshape(-1)
        folded = np.fromiter(
            ((int(v) & M) ^ ((int(v) >> 64) & M) ^ ((int(v) >> 128) & M)
             for v in flat),
            dtype=np.uint64, count=flat.size)
        return folded.reshape(data.shape)
    if data.dtype == jnp.bool_:
        return data.astype(jnp.uint64)
    if data.dtype in (jnp.float32, jnp.float64):
        # bitcast so -0.0 == 0.0 hash equal: normalize -0 to +0 first
        d = jnp.where(data == 0, jnp.zeros_like(data), data)
        bits = jnp.asarray(d, jnp.float64).view(jnp.int64)
        return bits.astype(jnp.uint64)
    return data.astype(jnp.int64).astype(jnp.uint64)


def hash_column(data, valid=None):
    h = splitmix64(_to_u64(data))
    if valid is not None:
        # NULLs get a distinct fixed hash
        h = jnp.where(valid, h, np.uint64(0x9E3779B97F4A7C15))
    return h


def combine(h1, h2):
    """Order-dependent combine (boost::hash_combine style)."""
    return splitmix64(h1 ^ (h2 + np.uint64(0x9E3779B97F4A7C15) + (h1 << np.uint64(6)) + (h1 >> np.uint64(2))))


def hash_columns(cols) -> jnp.ndarray:
    """Hash a list of SCol into one uint64 per row."""
    h = None
    for c in cols:
        hc = hash_column(c.data, c.valid)
        h = hc if h is None else combine(h, hc)
    return h
