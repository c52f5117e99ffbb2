#!/bin/bash
# Round-5 scaling pair, phase 4: extra c8 draws.
#
# Phase 3 established the c2 level's healthy-window ceiling (1223.9 urls/s,
# probes 46.7k/44.6k — reproducing r4's healthy c2 = 1221 within 0.3%), but
# every c8 launch so far drew a degraded phase (before-probes 10k-16k; r4
# documented that >=4-core runs can themselves trigger the degraded band).
# Under the best-of-N estimator more c8 draws can only sharpen the c8 max,
# so this phase runs c8 repeatedly until stopped; outputs c8x{N}.out.
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
LOG=BENCH/r5/pair_reps.log
probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }

echo "=== r5 extra c8 draws start $(date) ===" >> "$LOG"
for IT in 1 2 3 4 5 6 7 8; do
  echo "$(date +%H:%M:%S) c8x${IT} launch probe=$(probe)" >> "$LOG"
  SPARK_GRAFT_CPUS=8 taskset -c 0-7 python bench.py \
    > "BENCH/r5/c8x${IT}.out" 2> "BENCH/r5/c8x${IT}.err"
  echo "$(date +%H:%M:%S) c8x${IT} done probe=$(probe)" >> "$LOG"
done
echo "=== r5 extra c8 draws done $(date) ===" >> "$LOG"
