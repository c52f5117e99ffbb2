#!/bin/bash
# Post-AQE-policy measurement queue (same session-band gating protocol as
# post_batch_curve.sh): re-measure the 250k-page fixture levels with the
# per-round AQE policy ACTIVE (CrawlConfig.adaptive_min_round_rows default
# 10M -> every fixture round runs AQE-off; queries + any >=10M-row round
# keep AQE on). Pre-policy rows for the same fixture/window band:
#   c1 = 615.2, c2 = 565.7 (AQE on) / 1,183.8 (session AQE off — the
#   behavior the policy now selects), c4 = 553.6, c8 = 858.8.
# Goal rows: pc1, pc2, pc4, pc8 -> the policy's own committed curve and
# the 1->4 / 2->8 efficiency pairs under one band.
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
MIN_OK=${MIN_OK:-12000}
MIN_KEEP=6000
LOG=BENCH/r4/policy_curve.log

probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }

wait_healthy() {
  while true; do
    P=$(probe)
    echo "$(date +%H:%M:%S) probe $P" >> "$LOG"
    [ "$P" -ge "$MIN_OK" ] && return 0
    sleep 120
  done
}

accept() {
  python - "$1" <<'PY'
import json, sys
lines = open(sys.argv[1]).read().strip().splitlines()
if not lines: sys.exit(1)
j = json.loads(lines[-1])
w = j["crawl"]["wake_rt_per_sec"]
ok = (w["before"] or 0) >= 6000 and (w["after"] or 0) >= 6000
print(f'value={j["value"]} before={w["before"]} after={w["after"]} wall={j["crawl"]["wall_s"]} -> {"ACCEPT" if ok else "REJECT"}')
sys.exit(0 if ok else 1)
PY
}

run_gated() {  # $1=cores $2=suffix $3=keep-any(0/1)
  local N=$1 SUF=$2 KEEPANY=${3:-0} LAST=$(( $1 - 1 ))
  for try in 1 2 3; do
    wait_healthy
    echo "$(date +%H:%M:%S) launch pc$N$SUF try $try" >> "$LOG"
    local OUT=BENCH/r4/pc$N$SUF.out ERR=BENCH/r4/pc$N$SUF.err
    SPARK_GRAFT_CPUS=$N taskset -c 0-$LAST python bench.py > "$OUT" 2> "$ERR"
    if accept "$OUT" >> "$LOG" 2>&1 || [ "$KEEPANY" = 1 ]; then
      echo "$(date +%H:%M:%S) pc$N$SUF kept" >> "$LOG"
      return 0
    fi
    mv "$OUT" "BENCH/r4/rej_pc$N${SUF}_$try.out"
    mv "$ERR" "BENCH/r4/rej_pc$N${SUF}_$try.err"
    echo "$(date +%H:%M:%S) pc$N$SUF rejected (try $try)" >> "$LOG"
  done
  echo "$(date +%H:%M:%S) pc$N$SUF gave up after 3 tries" >> "$LOG"
}

echo "=== policy curve queue start $(date) ===" >> "$LOG"
run_gated 2 "" 0
run_gated 8 "" 1
run_gated 4 "" 1
run_gated 1 "" 0
echo "=== policy curve queue done $(date) ===" >> "$LOG"
