"""Device placement policy + packed transfers.

The TPU sits behind a high-latency dispatch path (each device->host sync
costs ~30-50ms through the tunnel in this environment), so the executor runs
large columnar work on the accelerator and *small* intermediate results on
the local XLA CPU backend — the TPU-native analogue of the reference keeping
small state in caches near the core while the JIT'd pipeline streams the base
data (and of classic engines not shipping 4-row tables to an accelerator).

All bulk device->host movement goes through ONE packed transfer: every column
is widened/bitcast to int64 lanes inside a single jitted function, fetched as
one buffer, and re-split on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .vtable import SCol, VTable

SMALL_ROWS = 8192

_MESH = None
_MESH_INIT = False


def get_mesh():
    """Data-parallel mesh over all same-platform accelerator (or CPU)
    devices; None when only one device is available or parallelism is OFF
    (reference analogue: scheduler worker count from LINGODB_PARALLELISM,
    Scheduler.cpp:927-939)."""
    global _MESH, _MESH_INIT
    if _MESH_INIT:
        return _MESH
    _MESH_INIT = True
    from ..utils.settings import get_setting

    if str(get_setting("system.parallelism")).upper() == "OFF":
        return None
    from ..parallel import multihost as mh

    # multi-host: join the jax.distributed cluster when LINGODB_COORDINATOR
    # / LINGODB_NUM_PROCESSES are set (no-op single-process); the dp axis is
    # then host-major so keyed exchanges split into ICI blocks + one DCN
    # stripe (parallel/multihost.py)
    mh.initialize()
    devs = [d for d in jax.devices() if d.platform != "cpu"]
    if len(devs) < 2:
        devs = jax.devices("cpu") if not devs else devs
    if len(devs) < 2:
        return None
    from jax.sharding import Mesh

    _MESH = Mesh(np.array(mh.host_major_order(devs)), ("dp",))
    return _MESH


def shard_column(arr, mesh):
    """Row-shard a column over the mesh, padding to a multiple of the axis
    size. Returns (sharded_array, original_rows)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["dp"]
    rows = arr.shape[0]
    pad = (-rows) % n
    if pad:
        arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return jax.device_put(arr, NamedSharding(mesh, P("dp"))), rows


def cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


def accel_device():
    for d in jax.devices():
        if d.platform != "cpu":
            return d
    return jax.devices()[0]


_CPU = None
_ACCEL = None


def devices():
    global _CPU, _ACCEL
    if _CPU is None:
        _CPU = cpu_device()
        _ACCEL = accel_device()
    return _CPU, _ACCEL


def has_accel() -> bool:
    cpu, accel = devices()
    return accel.platform != "cpu"


def array_device(a) -> object:
    try:
        return list(a.devices())[0]
    except Exception:
        return None


def vtable_on_accel(vt: VTable) -> bool:
    cpu, accel = devices()
    for c in vt.cols.values():
        d = array_device(c.data)
        if d is not None and d.platform != "cpu":
            return True
    return False


# ----------------------------------------------------------- packed transfer
@jax.jit
def _pack_lanes(arrays: dict):
    """Pack 1-D arrays into at most two matrices: int64 lanes for integer/bool
    arrays, float64 lanes for floats. No 64-bit bitcasts — the TPU AOT
    X64-rewriting pass does not implement f64<->s64 bitcast_convert."""
    ilanes, flanes = [], []
    for key in sorted(arrays.keys()):
        a = arrays[key]
        if a.dtype in (jnp.float64, jnp.float32):
            flanes.append(a.astype(jnp.float64))
        else:
            ilanes.append(a.astype(jnp.int64))
    iout = jnp.stack(ilanes) if ilanes else jnp.zeros((0, 0), jnp.int64)
    fout = jnp.stack(flanes) if flanes else jnp.zeros((0, 0), jnp.float64)
    return iout, fout


def fetch_arrays_np(arrays: dict) -> dict:
    """Fetch a dict of equal-length 1-D device arrays with ONE sync.
    Returns numpy arrays with the original dtypes."""
    if not arrays:
        return {}
    from ..ops.backend import any_jax

    if not any_jax(arrays):
        return {k: np.asarray(a) for k, a in arrays.items()}
    from ..ops.backend import is_jax

    # host-resident planes (incl. object-dtype wide decimals) pass through;
    # only device arrays ride the packed transfer
    host_part = {k: np.asarray(a) for k, a in arrays.items() if not is_jax(a)}
    arrays = {k: a for k, a in arrays.items() if is_jax(a)}
    if not arrays:
        return host_part
    dtypes = {k: np.dtype(a.dtype) for k, a in arrays.items()}
    packed_i, packed_f = _pack_lanes({k: a for k, a in arrays.items()})
    host_i, host_f = jax.device_get((packed_i, packed_f))
    host_i, host_f = np.asarray(host_i), np.asarray(host_f)
    out = {}
    ii = fi = 0
    for key in sorted(arrays.keys()):
        dt = dtypes[key]
        if dt in (np.dtype(np.float64), np.dtype(np.float32)):
            out[key] = host_f[fi].astype(dt)
            fi += 1
        else:
            out[key] = host_i[ii].astype(dt)
            ii += 1
    out.update(host_part)
    return out


def fetch_vtable_np(vt: VTable) -> dict:
    """VTable -> {('d'|'v', cid): np.ndarray} with one sync."""
    arrays = {}
    for cid, c in vt.cols.items():
        arrays[("d", cid)] = c.data
        if c.valid is not None:
            arrays[("v", cid)] = c.valid
    return fetch_arrays_np(arrays)


def demote_small(vt: VTable) -> VTable:
    """Move a small accelerator-resident VTable onto the local CPU backend so
    downstream operators run without tunnel round trips."""
    if vt.num_rows >= SMALL_ROWS or vt.num_rows == 0:
        return vt
    if vt.row_valid is not None:  # selection-vector tables stay on the mesh
        return vt
    if not vtable_on_accel(vt):
        return vt
    host = fetch_vtable_np(vt)
    cols = {}
    for cid, c in vt.cols.items():
        cols[cid] = SCol(c.type, host[("d", cid)], host.get(("v", cid)), c.dictionary)
    return VTable(cols, vt.num_rows)


def promote(vt: VTable) -> VTable:
    """Move a CPU-resident VTable to the accelerator (e.g. the small side of
    a join against an accelerator-resident table)."""
    from .vtable import is_obj

    cpu, accel = devices()
    cols = {}
    for cid, c in vt.cols.items():
        if is_obj(c.data):
            # wide-decimal object columns are host-only by contract
            # (vtable.dec_is_wide): they never upload (q22's avg(c_acctbal)
            # scalar crashed here on the chip — device_put on dtype=object)
            cols[cid] = c
            continue
        cols[cid] = SCol(
            c.type, jax.device_put(c.data, accel),
            None if c.valid is None else jax.device_put(c.valid, accel),
            c.dictionary,
        )
    return VTable(cols, vt.num_rows, row_valid=vt.row_valid)


def align_devices(a: VTable, b: VTable) -> tuple[VTable, VTable]:
    """Ensure two VTables are co-located before a binary operator."""
    if not has_accel():
        return a, b
    aa, ba = vtable_on_accel(a), vtable_on_accel(b)
    if aa == ba:
        return a, b
    if aa:
        return a, promote(b)
    return promote(a), b
