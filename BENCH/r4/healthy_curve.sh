#!/bin/bash
# Health-gated pinned curve: the host's thread-wake latency oscillates
# between ~4k and ~64k round-trips/sec on a tens-of-minutes period
# (BENCH/BASELINE.md r4), which moves identical runs 4x. Each level is
# launched only when a pre-flight probe reads healthy, and accepted only
# if the bench JSON's own before/after probes stayed healthy — otherwise
# retried, so every accepted row on the curve was measured on a
# comparably healthy host.
cd /root/repo
export BENCH_DOMAINS=200 BENCH_PAGES_PER_DOMAIN=5000 BENCH_SKIP_QUERIES=1
MIN_OK=30000       # launch gate (rt/s)
MIN_KEEP=20000     # accept gate on the run's own before/after probes
LOG=BENCH/r4/healthy_curve.log

probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }

wait_healthy() {
  while true; do
    P=$(probe)
    echo "$(date +%H:%M:%S) probe $P" >> "$LOG"
    [ "$P" -ge "$MIN_OK" ] && return 0
    sleep 120
  done
}

accept() {  # $1 = out file
  python - "$1" <<'PY'
import json, sys
line = open(sys.argv[1]).read().strip().splitlines()
if not line: sys.exit(1)
j = json.loads(line[-1])
w = j["crawl"]["wake_rt_per_sec"]
ok = (w["before"] or 0) >= 20000 and (w["after"] or 0) >= 20000
print(f'before={w["before"]} after={w["after"]} wall={j["crawl"]["wall_s"]} -> {"ACCEPT" if ok else "REJECT"}')
sys.exit(0 if ok else 1)
PY
}

run_level() {  # $1=cores $2=suffix $3=extra-env (k=v,k=v)
  local N=$1 SUF=$2 EXTRA=$3 LAST=$(( $1 - 1 ))
  for try in 1 2 3 4; do
    wait_healthy
    echo "$(date +%H:%M:%S) launch c$N$SUF try $try" >> "$LOG"
    local OUT=BENCH/r4/curve_c$N$SUF.out ERR=BENCH/r4/curve_c$N$SUF.err
    env $(echo "$EXTRA" | tr ',' ' ') SPARK_GRAFT_CPUS=$N \
      taskset -c 0-$LAST python bench.py > "$OUT" 2> "$ERR"
    if accept "$OUT" >> "$LOG" 2>&1; then
      echo "$(date +%H:%M:%S) c$N$SUF accepted" >> "$LOG"
      return 0
    fi
    mv "$OUT" "BENCH/r4/rej_c$N${SUF}_try$try.out"
    mv "$ERR" "BENCH/r4/rej_c$N${SUF}_try$try.err"
  done
  echo "$(date +%H:%M:%S) c$N$SUF gave up after 4 tries" >> "$LOG"
}

run_level 8 "" ""
run_level 4 "" ""
rm -rf /tmp/bench_ckpt_r4
run_level 8 "_disk" "BENCH_CHECKPOINT_DIR=/tmp/bench_ckpt_r4"
run_level 1 "" ""
echo "$(date +%H:%M:%S) DONE" >> "$LOG"
