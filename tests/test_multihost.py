"""Multi-host scaffold tests: host-major mesh math (unit) and a REAL
two-process jax.distributed cluster on CPU (4 virtual devices per process,
8-device global mesh) running a sharded sum end-to-end.

Reference context: the reference has no network distribution (SURVEY §2.5);
this validates the TPU build's DCN-facing layer — jax.distributed wiring,
host-major rank order, and the hierarchical exchange plan — without TPU
pod hardware (VERDICT r3 'what's missing' #3)."""

import os
import subprocess
import sys
import textwrap

import pytest

from lingodb_tpu.parallel import multihost as mh


class _Dev:
    def __init__(self, pid, did):
        self.process_index = pid
        self.id = did

    def __repr__(self):
        return f"d{self.process_index}.{self.id}"


def test_host_major_order_and_groups():
    # devices reported interleaved (as jax sometimes does) -> host-major
    devs = [_Dev(1, 0), _Dev(0, 1), _Dev(1, 1), _Dev(0, 0)]
    ordered = mh.host_major_order(devs)
    assert [(d.process_index, d.id) for d in ordered] == [
        (0, 0), (0, 1), (1, 0), (1, 1)]
    assert mh.host_groups(devs) == [[0, 1], [2, 3]]


def test_exchange_plan_math():
    devs = [_Dev(p, d) for p in range(2) for d in range(4)]
    plan = mh.exchange_plan(devs)
    assert plan.n_hosts == 2 and plan.per_host == 4
    assert plan.dest_host(0) == 0 and plan.dest_host(5) == 1
    assert plan.dcn_lanes() == [(0, 1), (1, 0)]
    # 2 hosts x 4 ranks x 3 peers: lanes that stay on ICI
    assert plan.ici_lanes() == 24


def test_exchange_plan_rejects_ragged_hosts():
    devs = [_Dev(0, 0), _Dev(0, 1), _Dev(1, 0)]
    with pytest.raises(ValueError):
        mh.exchange_plan(devs)


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("LINGODB_COORDINATOR", raising=False)
    assert mh.initialize() is False
    assert mh.initialize(num_processes=1, coordinator="x:1") is False


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) if "__file__" in dir() else ".")
    from lingodb_tpu.parallel import multihost as mh

    pid = int(sys.argv[1])
    port = sys.argv[2]
    ok = mh.initialize(coordinator=f"127.0.0.1:{port}", num_processes=2,
                       process_id=pid)
    assert ok, "distributed init failed"
    assert jax.process_count() == 2
    devs = jax.devices()
    assert len(devs) == 8, devs
    ordered = mh.host_major_order(devs)
    plan = mh.exchange_plan(devs)
    assert plan.n_hosts == 2 and plan.per_host == 4

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(ordered), ("dp",))
    # every process contributes its local shards of a 8*1024 row column;
    # the jitted global sum runs one psum over DCN+ICI
    import jax.numpy as jnp
    rows = 8 * 1024
    sharding = NamedSharding(mesh, P("dp"))
    local_ranks = range(*mh.process_span(devs))
    full = np.arange(rows, dtype=np.int64)
    arrs = [jax.device_put(full[r * 1024:(r + 1) * 1024], d)
            for r, d in zip(local_ranks, jax.local_devices())]
    garr = jax.make_array_from_single_device_arrays(
        (rows,), sharding, arrs)
    total = int(jax.jit(lambda x: jnp.sum(x),
                        out_shardings=NamedSharding(mesh, P()))(garr)[()])
    assert total == rows * (rows - 1) // 2, total
    print(f"proc {pid} OK total={total}")
""")


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    """Spawn 2 real processes x 4 CPU devices; build the global mesh and run
    a sharded reduction through jax.distributed."""
    w = tmp_path / "worker.py"
    w.write_text(_WORKER)
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = str(s.getsockname()[1])
    s.close()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen([sys.executable, str(w), str(i), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process cluster timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
