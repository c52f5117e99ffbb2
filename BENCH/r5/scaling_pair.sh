#!/bin/bash
# Round-5 health-gated N->4N scaling re-measurement (VERDICT r4 item 2).
# The standing 2->8 = 0.65 predates the per-round AQE policy + write
# batching + plan hoist, which all attack the measured serial term; this
# queue re-measures the pair the moment the host offers a healthy window.
#
# Protocol (BENCH/BASELINE.md "host variable isolated"):
#   - launch gate: futex wake probe >= 30k rt/s (the healthy band)
#   - accept: the run's own BEFORE probe >= 30k (>=4-core runs self-degrade
#     the AFTER probe; that pathology is documented, not noise)
#   - fixture: the r4 policy-curve 250k fixture (100 domains x 2500 pages)
#     so levels are comparable to BENCH/r4/pc*.out
#   - pairs measured back-to-back per window: 2 then 8 (the standing debt),
#     then 1 and 4 if the window holds.
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
LOG=BENCH/r5/scaling_pair.log

probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }

wait_healthy() {
  local deadline=$(( $(date +%s) + 18000 ))   # give up after 5h
  while true; do
    P=$(probe)
    echo "$(date +%H:%M:%S) probe $P" >> "$LOG"
    [ "$P" -ge 30000 ] && return 0
    [ "$(date +%s)" -ge "$deadline" ] && return 1
    sleep 120
  done
}

accept() {  # accept <out-file> : run's own before-probe >= 30k
  python - "$1" <<'PY'
import json, sys
lines = open(sys.argv[1]).read().strip().splitlines()
if not lines: sys.exit(1)
j = json.loads(lines[-1])
w = j["crawl"]["wake_rt_per_sec"]
ok = (w["before"] or 0) >= 30000
print(f'value={j["value"]} before={w["before"]} after={w["after"]} wall={j["crawl"]["wall_s"]} -> {"ACCEPT" if ok else "REJECT"}')
sys.exit(0 if ok else 1)
PY
}

run_level() {  # run_level <cores> : one gated attempt; 0 = kept
  local N=$1 LAST=$(( $1 - 1 ))
  wait_healthy || { echo "$(date +%H:%M:%S) c${N}: no healthy window, giving up" >> "$LOG"; return 1; }
  echo "$(date +%H:%M:%S) launch c${N}" >> "$LOG"
  local OUT=BENCH/r5/sp_c${N}.out ERR=BENCH/r5/sp_c${N}.err
  SPARK_GRAFT_CPUS=$N taskset -c 0-$LAST python bench.py > "$OUT" 2> "$ERR"
  if accept "$OUT" >> "$LOG" 2>&1; then
    echo "$(date +%H:%M:%S) c${N} kept" >> "$LOG"
    return 0
  fi
  local STAMP=$(date +%H%M%S)
  mv "$OUT" "BENCH/r5/rej_c${N}_$STAMP.out"; mv "$ERR" "BENCH/r5/rej_c${N}_$STAMP.err"
  echo "$(date +%H:%M:%S) c${N} rejected" >> "$LOG"
  return 2
}

retry_level() {  # up to 3 gated attempts
  for try in 1 2 3; do
    run_level "$1"; rc=$?
    [ $rc -eq 0 ] && return 0
    [ $rc -eq 1 ] && return 1   # window never came — stop burning the host
  done
  return 2
}

echo "=== r5 scaling pair queue start $(date) ===" >> "$LOG"
retry_level 2 && retry_level 8 && retry_level 1 && retry_level 4
echo "=== r5 scaling pair queue done $(date) ===" >> "$LOG"
