"""On-chip SF10 per-query profile run (round 3).

Loads TPC-H SF10 once, then for each BASELINE SF10 query: warm (compile),
steady-state best-of-N wall, then one PERF-mode run whose per-operator
self-time/bytes/SOL lines land on stderr. Appends one JSON record per query
to bench_results/r03_sf10_profile.jsonl so partial progress survives a
tunnel outage.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join("bench_results", "r03_sf10_profile.jsonl")
SF = float(os.environ.get("BENCH_SF", "10"))
QUERIES = [int(x) for x in os.environ.get("BENCH_QUERIES", "6,14,3,10,18").split(",")]
REPS = int(os.environ.get("BENCH_REPS", "3"))

import lingodb_tpu as ldb  # noqa: E402
from lingodb_tpu.tools import tpchgen  # noqa: E402
from lingodb_tpu.utils import settings  # noqa: E402

s = ldb.create_in_memory()
t0 = time.time()
tpchgen.load_into(s, sf=SF)
print(f"# sf={SF:g} load {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

for q in QUERIES:
    sql = open(os.path.join("queries", "tpch", f"{q}.sql")).read()
    t0 = time.time()
    s.sql(sql)
    warm = time.time() - t0
    print(f"# q{q} warm {warm:.1f}s", file=sys.stderr, flush=True)
    times = []
    for _ in range(REPS):
        t0 = time.time()
        s.sql(sql)
        times.append((time.time() - t0) * 1e3)
    print(f"# q{q} runs: {[round(t, 1) for t in times]} ms", file=sys.stderr,
          flush=True)
    settings.EXECUTION_MODE.set("PERF")
    try:
        s.sql(sql)
        prof = s.executor.last_op_profile or []
    finally:
        settings.EXECUTION_MODE.set("DEFAULT")
    top = sorted(prof, key=lambda r: -r[1])[:8]
    for name, ms, rows, incl, nbytes, sol in top:
        print(f"#   q{q} {name:<12} self={ms:9.1f}ms bytes={nbytes / 1e6:8.1f}MB "
              f"sol={sol} rows={rows}", file=sys.stderr, flush=True)
    rec = {
        "q": q, "sf": SF, "warm_s": round(warm, 1),
        "wall_ms": [round(t, 1) for t in times],
        "best_ms": round(min(times), 1),
        "profile": [
            {"op": name, "self_ms": round(ms, 2), "rows": rows,
             "incl_ms": round(incl, 2), "bytes": nbytes, "sol": sol}
            for name, ms, rows, incl, nbytes, sol in prof
        ],
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
print("# done", file=sys.stderr, flush=True)
