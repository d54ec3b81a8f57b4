"""Multi-host execution scaffold: jax.distributed wiring + host-aware mesh.

The reference engine is single-process (SURVEY §2.5: worker threads over
shared memory — no network distribution). This build's scale-out axis is the
TPU pod: one JAX process per host, devices joined into one global mesh, XLA
collectives riding ICI inside a host/slice and DCN between hosts (SURVEY
§2.9 mapping: "ICI collectives inside one program; DCN between hosts").

Design rules encoded here:
  - the dp mesh axis is ordered HOST-MAJOR (each process's devices occupy a
    contiguous rank block), so a keyed repartition decomposes into dense
    intra-host blocks (ICI) plus a single inter-host stripe (DCN) — the
    all-to-all's expensive lanes are minimized and XLA can overlap them;
  - initialization is env-driven and idempotent: LINGODB_COORDINATOR,
    LINGODB_NUM_PROCESSES, LINGODB_PROCESS_ID (mirroring the reference's
    LINGODB_PARALLELISM env convention, Setting.h:38-78);
  - everything degrades to single-process transparently: with one process
    the host-major order is the plain device order and no DCN phase exists.

Tested two ways: mesh/order/grouping logic by unit tests over fake device
descriptors, and end-to-end by tests/test_multihost.py spawning two real
CPU processes (4 virtual devices each) that build the 8-device global mesh
and run a sharded aggregate through jax.distributed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join (or start) a multi-process JAX cluster. Parameters default from
    LINGODB_COORDINATOR / LINGODB_NUM_PROCESSES / LINGODB_PROCESS_ID.
    Returns True when distributed mode is active. Idempotent; a no-op in
    single-process runs (num_processes absent or <= 1)."""
    import jax

    coordinator = coordinator or os.environ.get("LINGODB_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("LINGODB_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("LINGODB_PROCESS_ID", "0") or 0)
    if not coordinator or num_processes <= 1:
        return False
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already initialized
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_major_order(devices) -> list:
    """Global device list ordered (process_index, device id): every host's
    devices contiguous. This ordering IS the dp rank order — shard r of a
    row-sharded table lives on host r // devices_per_host."""
    return sorted(devices, key=lambda d: (d.process_index,
                                          getattr(d, "id", 0)))


def host_groups(devices) -> list[list[int]]:
    """Ranks (positions in host_major_order) grouped per host. With the
    host-major invariant each group is a contiguous range — the property
    the hierarchical exchange plan relies on."""
    ordered = host_major_order(devices)
    groups: dict[int, list[int]] = {}
    for rank, d in enumerate(ordered):
        groups.setdefault(d.process_index, []).append(rank)
    return [groups[k] for k in sorted(groups)]


@dataclass(frozen=True)
class ExchangePlan:
    """Two-phase keyed-repartition plan for a host-major mesh.

    Phase 1 (ICI): within each host, all-to-all among local ranks — every
    local rank gathers the rows destined for ANY rank of each remote host
    into one per-host send buffer (local combining, like the reference's
    per-worker partition buffers, PreAggregationHashtable.h:16-27).
    Phase 2 (DCN): one all-to-all between hosts moves each per-host buffer
    in a single stripe; rows then scatter to their final local rank over
    ICI. Total DCN bytes = sum of cross-host row payloads, each row crossing
    DCN exactly once — the minimum any repartition can do.
    """

    n_hosts: int
    per_host: int

    def dest_host(self, dest_rank: int) -> int:
        return dest_rank // self.per_host

    def dcn_lanes(self) -> list[tuple[int, int]]:
        """(src_host, dst_host) pairs that cross DCN (src != dst)."""
        return [(a, b) for a in range(self.n_hosts)
                for b in range(self.n_hosts) if a != b]

    def ici_lanes(self) -> int:
        """All-to-all lanes that stay on ICI (per host, both phases)."""
        return self.n_hosts * self.per_host * (self.per_host - 1)


def exchange_plan(devices) -> ExchangePlan:
    groups = host_groups(devices)
    sizes = {len(g) for g in groups}
    if len(sizes) != 1:
        raise ValueError(f"hosts expose unequal device counts: {groups}")
    # contiguity check: the invariant every shuffle slice depends on
    for g in groups:
        if g != list(range(g[0], g[0] + len(g))):
            raise ValueError(f"host ranks not contiguous: {g}")
    return ExchangePlan(n_hosts=len(groups), per_host=len(groups[0]))


def process_span(devices) -> tuple[int, int]:
    """This process's contiguous [start, end) rank range in the global
    host-major order (the shards whose host arrays live here)."""
    import jax

    ordered = host_major_order(devices)
    mine = [r for r, d in enumerate(ordered)
            if d.process_index == jax.process_index()]
    return (mine[0], mine[-1] + 1) if mine else (0, 0)
