#!/bin/bash
# Round-5 scaling pair, phase 3: REPETITION harness.
#
# The >=30k launch gate (pair_now.sh phase 2) watched for another hour
# without firing — this host session appears pinned in the degraded
# wake-latency band (probes 1k-17k). Phase 3 accepts that and measures the
# 2->8 pair REPEATEDLY, back-to-back within each iteration, probes recorded
# around every run. Reporting (BENCH/BASELINE.md):
#   - per-iteration efficiency eff_i = (v8_i / v2_i) / 4 — both levels share
#     the iteration's host phase, so the ratio is the cleanest single-window
#     estimate available;
#   - best-of-N per level — the standard throughput estimator under
#     external interference: the max over repetitions approaches the code's
#     property as N grows, because interference only ever subtracts.
# Fixture: the r4 policy-curve 250k fixture, comparable to BENCH/r4/pc*.out.
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
LOG=BENCH/r5/pair_reps.log
probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }

run_level() {  # run_level <cores> <iter>
  local N=$1 IT=$2 LAST=$(( $1 - 1 ))
  echo "$(date +%H:%M:%S) it${IT} launch c${N} probe=$(probe)" >> "$LOG"
  SPARK_GRAFT_CPUS=$N taskset -c 0-$LAST python bench.py \
    > "BENCH/r5/rep${IT}_c${N}.out" 2> "BENCH/r5/rep${IT}_c${N}.err"
  echo "$(date +%H:%M:%S) it${IT} done c${N} probe=$(probe)" >> "$LOG"
}

echo "=== r5 repetition pairs start $(date) ===" >> "$LOG"
for IT in 1 2 3 4 5 6; do
  run_level 2 "$IT"
  run_level 8 "$IT"
done
echo "=== r5 repetition pairs done $(date) ===" >> "$LOG"
