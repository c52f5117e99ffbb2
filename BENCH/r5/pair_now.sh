#!/bin/bash
# Round-5 scaling-pair measurement, phase 1: UNGATED back-to-back run.
#
# The r5 health-gated queue (scaling_pair.sh) watched for ~1h40m and the
# probe never left the degraded band (3k-17k rt/s vs the >=30k gate), so
# this phase measures the pair NOW, back-to-back in the same window, with
# the probe recorded before/after every level. Rationale: the scaling
# RATIO between levels measured minutes apart in the same host phase is
# meaningful even when the absolute numbers are depressed; r4 established
# the caveat that >=4-core runs can additionally self-degrade the window,
# so probes are the evidence either way. Phase 2 (gated retry, appended
# below) supersedes these rows if a healthy window ever appears.
#
# Fixture: the r4 policy-curve 250k fixture (100 domains x 2500 pages),
# comparable to BENCH/r4/pc*.out.
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
LOG=BENCH/r5/pair_now.log

probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }

run_level() {  # run_level <cores> <tag>
  local N=$1 TAG=$2 LAST=$(( $1 - 1 ))
  echo "$(date +%H:%M:%S) launch c${N} probe=$(probe)" >> "$LOG"
  SPARK_GRAFT_CPUS=$N taskset -c 0-$LAST python bench.py \
    > "BENCH/r5/${TAG}_c${N}.out" 2> "BENCH/r5/${TAG}_c${N}.err"
  echo "$(date +%H:%M:%S) done c${N} probe=$(probe)" >> "$LOG"
}

echo "=== r5 ungated pair start $(date) ===" >> "$LOG"
run_level 2 up
run_level 8 up
run_level 1 up
run_level 4 up
echo "=== r5 ungated pair done $(date) ===" >> "$LOG"

# Phase 2: resume the health-gated queue (same protocol as scaling_pair.sh,
# >=30k launch gate + before-probe accept) for the rest of the session.
wait_healthy() {
  local deadline=$(( $(date +%s) + 14400 ))   # 4h
  while true; do
    P=$(probe)
    echo "$(date +%H:%M:%S) gate probe $P" >> "$LOG"
    [ "$P" -ge 30000 ] && return 0
    [ "$(date +%s)" -ge "$deadline" ] && return 1
    sleep 120
  done
}

gated_level() {
  local N=$1 LAST=$(( $1 - 1 ))
  wait_healthy || return 1
  echo "$(date +%H:%M:%S) gated launch c${N}" >> "$LOG"
  SPARK_GRAFT_CPUS=$N taskset -c 0-$LAST python bench.py \
    > "BENCH/r5/healthy_c${N}.out" 2> "BENCH/r5/healthy_c${N}.err"
  echo "$(date +%H:%M:%S) gated done c${N} probe=$(probe)" >> "$LOG"
}

echo "=== r5 gated phase start $(date) ===" >> "$LOG"
gated_level 2 && gated_level 8 && gated_level 1 && gated_level 4
echo "=== r5 gated phase done $(date) ===" >> "$LOG"
