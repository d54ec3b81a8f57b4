"""Device mesh + SPMD query primitives.

TPU-native replacement for the reference's morsel-driven scheduler
(reference: src/scheduler/Scheduler.cpp — worker threads + fibers + work
stealing; src/runtime/PreAggregationHashtable.cpp — per-thread fragments
merged across threads). On TPU the same roles map to:

  morsel work-stealing        -> even hash/block partitioning over the mesh
  thread-local state + merge  -> per-shard partial aggregates + psum/all_gather
  lock-based shared state     -> keyed repartition (ragged all-to-all) so each
                                 key lands on exactly one shard

The data axis is named "dp". Partial-aggregation runs under shard_map; the
combine is an XLA collective riding ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_rows(mesh: Mesh, arr: jax.Array, axis: str = "dp") -> jax.Array:
    """Shard a row-partitioned column across the mesh (pads to a multiple of
    the axis size; callers carry the true row count separately)."""
    n = mesh.shape[axis]
    rows = arr.shape[0]
    pad = (-rows) % n
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def partial_agg_then_psum(mesh: Mesh, num_groups: int, axis: str = "dp"):
    """Build a sharded grouped-sum: each shard segment-sums its local rows
    into a dense group vector, then psum combines across the mesh — the
    TPU-native ThreadLocal+merge (reference: ParallelizePass.cpp decides this
    transform per state; here it's the default strategy)."""

    def fn(gids, weights, mask):
        def local(gid_s, w_s, m_s):
            part = jax.ops.segment_sum(
                jnp.where(m_s, w_s, jnp.zeros_like(w_s)), gid_s,
                num_segments=num_groups,
            )
            return jax.lax.psum(part, axis)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(),
        )(gids, weights, mask)

    return fn


def repartition_by_key(mesh: Mesh, axis: str = "dp"):
    """Keyed shuffle: route each row to shard = hash(key) % n via all_to_all.
    Rows are bucketed locally (fixed per-bucket capacity with validity masks,
    the static-shape equivalent of the reference's 64-partition
    PreAggregationHashtable fragments) and exchanged in one collective."""

    n = mesh.shape[axis]

    def fn(keys, *cols):
        cap = keys.shape[0]  # per-shard capacity after exchange (upper bound)

        def local(k_s, *cs):
            m = k_s.shape[0]
            dest = (k_s % n).astype(jnp.int32)
            # stable bucket: sort rows by destination
            order = jnp.argsort(dest)
            dest_sorted = dest[order]
            counts = jax.ops.segment_sum(jnp.ones((m,), jnp.int32), dest_sorted, num_segments=n)
            # pack each destination bucket into m//n slots (capacity bound)
            slot = jnp.arange(m) - jnp.searchsorted(dest_sorted, jnp.arange(n))[dest_sorted]
            percap = m // n
            buf_k = jnp.zeros((n, percap), k_s.dtype)
            valid = jnp.zeros((n, percap), jnp.bool_)
            ok = slot < percap
            buf_k = buf_k.at[dest_sorted, jnp.minimum(slot, percap - 1)].set(
                jnp.where(ok, k_s[order], 0))
            valid = valid.at[dest_sorted, jnp.minimum(slot, percap - 1)].set(ok)
            out_k = jax.lax.all_to_all(buf_k, axis, 0, 0, tiled=False)
            out_v = jax.lax.all_to_all(valid, axis, 0, 0, tiled=False)
            outs = []
            for c in cs:
                buf = jnp.zeros((n, percap), c.dtype)
                buf = buf.at[dest_sorted, jnp.minimum(slot, percap - 1)].set(
                    jnp.where(ok, c[order], 0))
                outs.append(jax.lax.all_to_all(buf, axis, 0, 0, tiled=False).reshape(-1))
            return (out_k.reshape(-1), out_v.reshape(-1), *outs)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis),) * (1 + len(cols)),
            out_specs=(P(axis),) * (2 + len(cols)),
        )(keys, *cols)

    return fn
