#!/bin/bash
# Round-5 second-session repetition iteration (post 17-jobs/round engine):
# same protocol as pair_reps.sh — c2 then c8 back-to-back, 250k fixture,
# probes before/after each level.
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
LOG=BENCH/r5/rep7_s2.log
probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }
for N in 2 8; do
  LAST=$(( N - 1 ))
  echo "$(date +%H:%M:%S) launch c${N} probe=$(probe)" >> "$LOG"
  SPARK_GRAFT_CPUS=$N taskset -c 0-$LAST python bench.py \
    > "BENCH/r5/rep7_c${N}.out" 2> "BENCH/r5/rep7_c${N}.err"
  echo "$(date +%H:%M:%S) done c${N} probe=$(probe)" >> "$LOG"
done
