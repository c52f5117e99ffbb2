#!/bin/bash
# Round-5 fifth-session matched-window scaling pairs on the final code
# (same 250k fixture and protocol as the session-4 manual pairs).
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
for N in 1 2 4 8; do
  LAST=$(( N - 1 ))
  echo "launch c${N} probe=$(python -c 'import bench; print(bench.wake_rt_per_sec())')"
  SPARK_GRAFT_CPUS=$N taskset -c 0-$LAST python bench.py \
    > "BENCH/r5/s5manual_c${N}.out" 2> "BENCH/r5/s5manual_c${N}.err"
  echo "done c${N} probe=$(python -c 'import bench; print(bench.wake_rt_per_sec())')"
done
