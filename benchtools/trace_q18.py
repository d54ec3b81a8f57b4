"""Device-trace the steady-state q18@SF10 fused program: top device ops.

Run on the real chip: python benchtools/trace_q18.py [Q] [SF]
Parses the profiler trace and prints the top device-plane ops by total
duration — attribution INSIDE the single fused program that op-level PERF
cannot see.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import lingodb_tpu as ldb
from lingodb_tpu.tools import tpchgen

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 18
SF = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

s = ldb.create_in_memory()
t0 = time.time()
tpchgen.load_into(s, sf=SF)
print(f"# load {time.time() - t0:.1f}s", flush=True)
sql = open(f"queries/tpch/{Q}.sql").read()
for i in range(2):  # warm: exe-store deserialize + first dispatch
    t0 = time.time()
    s.sql(sql)
    print(f"# warm{i} {time.time() - t0:.1f}s", flush=True)

tdir = "/tmp/q18trace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    t0 = time.time()
    s.sql(sql)
    wall = time.time() - t0
print(f"# traced run {wall:.2f}s", flush=True)

files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
assert files, "no trace written"
ev = json.load(gzip.open(files[0]))["traceEvents"]
# device-plane events: pick pids whose process_name mentions TPU/device
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in names.items()
            if "TPU" in n or "Device" in n or "/device" in n.lower()}
print("# planes:", {p: names[p] for p in sorted(names)}, flush=True)
agg = {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        agg.setdefault(e["name"], [0.0, 0])
        agg[e["name"]][0] += e.get("dur", 0) / 1e3
        agg[e["name"]][1] += 1
top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]
tot = sum(v[0] for v in agg.values())
print(f"# total device ms {tot:.1f}")
for name, (ms, cnt) in top:
    print(f"{ms:10.1f}ms  x{cnt:<5d} {name[:110]}")
