"""On-chip profiling of the SF10 SOL outliers (Q14/Q3/Q10).

Run (real TPU, nothing else using the chip):
    python tools_profile_sf10.py 14 3
Prints, per query: warm wall time, per-operator PERF profile, which fused
pipelines engaged vs fell back ('eager' stage-cache marks), and a manual
stage breakdown around the fused program."""

import sys
import time

import numpy as np

import lingodb_tpu as ldb
from lingodb_tpu.tools import tpchgen
from lingodb_tpu.utils.settings import EXECUTION_MODE

QDIR = "queries/tpch"


def main():
    queries = [int(a) for a in sys.argv[1:]] or [14, 3]
    t0 = time.time()
    s = ldb.create_in_memory()
    tpchgen.load_into(s, sf=10.0)
    print(f"# load {time.time() - t0:.1f}s", flush=True)

    for q in queries:
        text = open(f"{QDIR}/{q}.sql").read()
        t0 = time.time()
        s.sql(text)  # warm (compile)
        print(f"# q{q} warm {time.time() - t0:.1f}s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.time()
            s.sql(text)
            times.append(time.time() - t0)
        print(f"# q{q} runs: {[round(t * 1e3, 1) for t in times]} ms", flush=True)

        EXECUTION_MODE.set("PERF")
        t0 = time.time()
        s.sql(text)
        EXECUTION_MODE.set("DEFAULT")
        prof = s.executor.last_op_profile or []
        prof.sort(key=lambda r: -r[1])
        print(f"# q{q} profiled run {time.time() - t0:.1f}s; top ops:")
        for name, ms, rows, incl, nbytes, sol in prof[:12]:
            print(f"#   {name:<12} self={ms:10.2f}ms incl={incl:10.2f}ms "
                  f"rows={rows} bytes={nbytes / 1e6:.0f}MB sol={sol}x")
        eager = [k for k in s.stage_cache
                 if isinstance(s.stage_cache.get(k), str)
                 and s.stage_cache.get(k) == "eager"]
        print(f"# q{q} eager-marked fused keys: {len(eager)}")
        for k in eager[:4]:
            print(f"#   {str(k)[:160]}")
        nocompact = [k for k in s.stage_cache
                     if isinstance(k, tuple) and k and k[0] == "fused_nocompact"]
        print(f"# q{q} nocompact marks: {len(nocompact)}", flush=True)


if __name__ == "__main__":
    main()
