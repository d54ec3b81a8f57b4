"""Benchmark driver: TPC-H Q1 @ SF1 on one chip (BASELINE.json config 1).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

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
SF = float(os.environ.get("BENCH_SF", "1"))
REPS = int(os.environ.get("BENCH_REPS", "5"))


def main():
    import lingodb_tpu as ldb
    from lingodb_tpu.tools import tpchgen

    t0 = time.time()
    s = ldb.create_in_memory()
    tables = tpchgen.load_into(s, sf=SF)
    n_rows = tables["lineitem"].num_rows
    gen_s = time.time() - t0

    q1 = open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "queries", "tpch", "1.sql")).read()

    # warm-up: uploads device tables + compiles kernels
    t0 = time.time()
    s.sql(q1)
    warm_s = time.time() - t0

    times = []
    for _ in range(REPS):
        t0 = time.time()
        s.sql(q1)
        times.append(time.time() - t0)
    best = min(times)
    rows_per_s = n_rows / best

    print(json.dumps({
        "metric": f"tpch_q1_sf{SF:g}_rows_per_s",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / BASELINE_ROWS_PER_S, 3),
    }))
    print(f"# rows={n_rows} gen={gen_s:.1f}s warmup={warm_s:.2f}s "
          f"best={best * 1e3:.1f}ms times_ms={[round(t * 1e3, 1) for t in times]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
