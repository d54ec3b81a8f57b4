#!/bin/bash
# Probe the axon tunnel every 5 minutes; when it answers, run the full
# prewarm matrix with the current code.
cd /root/repo
LOG=bench_results/r05_watch.log
echo "watch started $(date +%F-%T)" >> "$LOG"
for i in $(seq 1 100); do
  if timeout 240 python -c "import jax; jax.devices()[0].platform" >/dev/null 2>&1; then
    echo "tunnel UP $(date +%F-%T); launching matrix" >> "$LOG"
    BENCH_BUDGET_S=100000 BENCH_CONFIG=matrix BENCH_OUT=bench_results/r05_prewarm4.jsonl \
      python bench.py > bench_results/r05_prewarm4.log 2> bench_results/r05_prewarm4.err
    echo "matrix done $(date +%F-%T) rc=$?" >> "$LOG"
    exit 0
  fi
  echo "tunnel still down $(date +%F-%T)" >> "$LOG"
  sleep 300
done
