#!/bin/bash
# Sequential BASELINE bench matrix on the real TPU (one config per process;
# the persistent XLA cache makes later runs of the same shapes fast).
set -u
cd /root/repo
OUT=bench_results/r02_matrix.jsonl
LOG=bench_results/r02_matrix.log
for cfg in "$@"; do
  echo "=== $cfg start $(date +%T) ===" >> "$LOG"
  BENCH_CONFIG=$cfg BENCH_OUT=$OUT timeout 5400 python bench.py >> "$LOG" 2>&1
  echo "=== $cfg exit $? $(date +%T) ===" >> "$LOG"
done
