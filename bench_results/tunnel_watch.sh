#!/bin/bash
# Probe the axon tunnel every 10 minutes; when it answers, run the bench
# configs the outage blocked, then the SF10 profile and gather microbench.
cd /root/repo
LOG=bench_results/tunnel_watch.log
echo "watch started $(date +%F-%T)" >> "$LOG"
for i in $(seq 1 60); do
  if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel UP $(date +%F-%T); launching matrix" >> "$LOG"
    bash bench_results/run_matrix.sh q14_sf10 q3_sf10 q10_sf10 q18_sf10 all22_sf1
    echo "matrix done $(date +%F-%T)" >> "$LOG"
    timeout 3600 python tools_gather_bench.py >> bench_results/gather_bench.log 2>&1
    echo "gather bench done $(date +%F-%T)" >> "$LOG"
    timeout 5400 python tools_profile_sf10.py 14 3 >> bench_results/profile_sf10.log 2>&1
    echo "profile done $(date +%F-%T)" >> "$LOG"
    exit 0
  fi
  echo "tunnel still down $(date +%F-%T)" >> "$LOG"
  sleep 600
done
echo "gave up $(date +%F-%T)" >> "$LOG"
