"""Benchmark driver (configs follow BASELINE.json).

Prints ONE JSON line for the primary metric, plus per-config/per-query detail
lines on stderr. For every query it records:
  wall_ms     best end-to-end latency (includes the host<->device tunnel)
  device_ms   wall minus the measured tunnel round-trip (the dispatch+sync
              overhead of this environment's TPU tunnel, ~25-30ms) — the
              honest estimate of on-device time
  bytes       bytes the query must touch: scanned columns of the OPTIMIZED
              plan (rows x physical dtype width), i.e. the memory-bandwidth
              lower bound's numerator
  sol_ms      bytes / HBM bandwidth (BENCH_HBM_GBPS, default 819 GB/s = v5e)
  sol_ratio   device_ms / sol_ms — 1.0 means the query runs at the
              memory-bandwidth speed of light; the BASELINE.md perf bar

Config selection: BENCH_CONFIG=q1_sf1 (default) | q6_sf10 | q14_sf10 |
q3_sf10 | q10_sf10 | q18_sf10 | all22_sf1 | all22_sf10. BENCH_SF overrides
the scale factor, BENCH_REPS the repetitions. BENCH_OUT=<path> additionally
appends the full per-query JSON record to that file (one line per config).

Baseline context: the reference repo publishes no numbers (BASELINE.md), so
vs_baseline is computed against a NOMINAL 60M lineitem-rows/s single-socket
figure for LingoDB-class compiling engines — a labeled estimate, not a
measured side-by-side run (the reference binaries are not built/runnable in
this environment).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NOMINAL_BASELINE_ROWS_PER_S = 60e6  # nominal, not measured — see docstring
QDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "queries", "tpch")

CONFIGS = {
    "q1_sf1": (1.0, [1]),
    "q6_sf10": (10.0, [6]),
    "q14_sf10": (10.0, [14]),
    "q3_sf10": (10.0, [3]),
    "q10_sf10": (10.0, [10]),
    "q18_sf10": (10.0, [18]),
    "all22_sf1": (1.0, list(range(1, 23))),
    "all22_sf10": (10.0, list(range(1, 23))),
}


def _tunnel_roundtrip_ms() -> float:
    """Median latency of a minimal device->host sync (the only trustworthy
    timing barrier through the axon tunnel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.zeros((8,), jnp.int64) + 1
    np.asarray(jax.device_get(x))  # warm
    times = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(jax.device_get(x))
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2] * 1e3


def _bytes_touched(session, sql: str) -> int:
    """Scan bytes of the optimized plan: rows x physical width per scanned
    column (the numerator of the memory-bandwidth speed-of-light bound)."""
    import numpy as np

    from lingodb_tpu.opt.optimizer import optimize
    from lingodb_tpu.plan import logical as L
    from lingodb_tpu.runtime.vtable import jnp_dtype
    from lingodb_tpu.sql.binder import Binder
    from lingodb_tpu.sql.parser import parse_sql

    stmts = parse_sql(sql)
    plan = optimize(Binder(session.catalog).bind_query(stmts[-1]), session.catalog)
    total = 0
    for op in L.walk_plan(plan):
        if isinstance(op, L.Scan):
            e = session.catalog.get_table(op.table)
            rows = e.storage.num_rows if e is not None else 0
            for c in op.cols:
                total += rows * np.dtype(jnp_dtype(c.type)).itemsize
    return total


def run_config(name: str, emit_primary: bool):
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import tpchgen

    sf, queries = CONFIGS[name]
    sf = float(os.environ.get("BENCH_SF", sf))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    hbm_gbps = float(os.environ.get("BENCH_HBM_GBPS", "819"))

    t0 = time.time()
    s = ldb.create_in_memory()
    tables = tpchgen.load_into(s, sf=sf)
    n_rows = tables["lineitem"].num_rows
    gen_s = time.time() - t0

    texts = {q: open(os.path.join(QDIR, f"{q}.sql")).read() for q in queries}

    t0 = time.time()
    for q in queries:
        s.sql(texts[q])
    warm_s = time.time() - t0
    rt_ms = _tunnel_roundtrip_ms()

    detail = {}
    for q in queries:
        times = []
        for _ in range(reps):
            t0 = time.time()
            s.sql(texts[q])
            times.append(time.time() - t0)
        wall_ms = min(times) * 1e3
        device_ms = max(wall_ms - rt_ms, 0.01)
        b = _bytes_touched(s, texts[q])
        sol_ms = b / (hbm_gbps * 1e9) * 1e3
        detail[q] = {
            "wall_ms": round(wall_ms, 2),
            "device_ms": round(device_ms, 2),
            "bytes": b,
            "sol_ms": round(sol_ms, 3),
            "sol_ratio": round(device_ms / sol_ms, 2) if sol_ms > 0 else None,
        }

    total_wall = sum(d["wall_ms"] for d in detail.values())
    record = {
        "config": name, "sf": sf, "lineitem_rows": n_rows,
        "tunnel_rt_ms": round(rt_ms, 2), "hbm_gbps": hbm_gbps,
        "total_wall_ms": round(total_wall, 1),
        "queries": detail,
        "baseline_note": "vs_baseline uses a NOMINAL 60M rows/s figure; the reference publishes no numbers",
    }
    if emit_primary:
        q0 = queries[0]
        rows_per_s = n_rows / (detail[q0]["wall_ms"] / 1e3)
        print(json.dumps({
            "metric": f"tpch_{name}_rows_per_s",
            "value": round(rows_per_s),
            "unit": "rows/s",
            "vs_baseline": round(rows_per_s / NOMINAL_BASELINE_ROWS_PER_S, 3),
        }))
    print(f"# config={name} sf={sf:g} lineitem={n_rows} gen={gen_s:.1f}s "
          f"warmup={warm_s:.1f}s tunnel_rt={rt_ms:.1f}ms "
          f"total_wall={total_wall:.1f}ms", file=sys.stderr)
    for q, d in detail.items():
        print(f"#   q{q}: wall={d['wall_ms']:.1f}ms device={d['device_ms']:.1f}ms "
              f"bytes={d['bytes'] / 1e6:.0f}MB sol={d['sol_ms']:.2f}ms "
              f"sol_ratio={d['sol_ratio']}", file=sys.stderr)
    out = os.environ.get("BENCH_OUT")
    if out:
        with open(out, "a") as f:
            f.write(json.dumps(record) + "\n")


def main():
    name = os.environ.get("BENCH_CONFIG", "q1_sf1")
    if name not in CONFIGS:
        print(f"unknown BENCH_CONFIG {name}; one of {list(CONFIGS)}", file=sys.stderr)
        sys.exit(2)
    run_config(name, emit_primary=True)


if __name__ == "__main__":
    main()
