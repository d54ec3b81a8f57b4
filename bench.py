"""Benchmark driver (configs follow BASELINE.json).

Prints ONE JSON line for the primary metric (TPC-H Q1 @ SF1 rows/s on one
chip), plus per-config detail lines on stderr.

Config selection: BENCH_CONFIG=q1_sf1 (default) | q6_sf10 | q14_sf10 |
q3_sf10 | q10_sf10 | all22_sf1 | all22_sf10. BENCH_SF overrides the scale
factor, BENCH_REPS the repetitions.

Baseline context: the reference repo publishes no numbers (BASELINE.md);
LingoDB-class compiling engines execute Q1 SF1 in the tens of milliseconds on
a server CPU. We use 60M lineitem-rows/s as the nominal single-socket
baseline for vs_baseline, and report our measured rows/s on the chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_ROWS_PER_S = 60e6
QDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "queries", "tpch")

CONFIGS = {
    "q1_sf1": (1.0, [1]),
    "q6_sf10": (10.0, [6]),
    "q14_sf10": (10.0, [14]),
    "q3_sf10": (10.0, [3]),
    "q10_sf10": (10.0, [10]),
    "all22_sf1": (1.0, list(range(1, 23))),
    "all22_sf10": (10.0, list(range(1, 23))),
}


def run_config(name: str, emit_primary: bool):
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import tpchgen

    sf, queries = CONFIGS[name]
    sf = float(os.environ.get("BENCH_SF", sf))
    reps = int(os.environ.get("BENCH_REPS", "5"))

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

    per_query = {}
    for q in queries:
        times = []
        for _ in range(reps):
            t0 = time.time()
            s.sql(texts[q])
            times.append(time.time() - t0)
        per_query[q] = min(times)

    total = sum(per_query.values())
    if emit_primary:
        rows_per_s = n_rows / per_query[queries[0]]
        print(json.dumps({
            "metric": f"tpch_{name}_rows_per_s",
            "value": round(rows_per_s),
            "unit": "rows/s",
            "vs_baseline": round(rows_per_s / BASELINE_ROWS_PER_S, 3),
        }))
    print(f"# config={name} sf={sf:g} lineitem={n_rows} gen={gen_s:.1f}s "
          f"warmup={warm_s:.1f}s total_best={total * 1e3:.1f}ms "
          f"per_query_ms={{{', '.join(f'{q}: {v * 1e3:.1f}' for q, v in per_query.items())}}}",
          file=sys.stderr)


def main():
    name = os.environ.get("BENCH_CONFIG", "q1_sf1")
    if name not in CONFIGS:
        print(f"unknown BENCH_CONFIG {name}; one of {list(CONFIGS)}", file=sys.stderr)
        sys.exit(2)
    run_config(name, emit_primary=True)


if __name__ == "__main__":
    main()
