#!/bin/bash
# Round-5 sixth-session opportunistic health-gated c2/c8 pair.
# Protocol unchanged from session5_pair.sh: probe every 3 minutes; when a
# probe reads >= 30k rt/s (healthy band) AND no other JVM is running, fire
# one back-to-back c2,c8 pair on the 250k fixture and exit.
cd /root/repo
LOG=BENCH/r5/session6_pair.log
probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }
while true; do
  P=$(probe)
  echo "$(date +%H:%M:%S) gate probe $P" >> "$LOG"
  if [ "$P" -ge 30000 ] && ! pgrep -f "java.*spark" > /dev/null; then
    echo "$(date +%H:%M:%S) GATE FIRED at $P" >> "$LOG"
    export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
    for N in 2 8; do
      LAST=$(( N - 1 ))
      echo "$(date +%H:%M:%S) launch c${N} probe=$(probe)" >> "$LOG"
      SPARK_GRAFT_CPUS=$N taskset -c 0-$LAST python bench.py \
        > "BENCH/r5/gated_s6_c${N}.out" 2> "BENCH/r5/gated_s6_c${N}.err"
      echo "$(date +%H:%M:%S) done c${N} probe=$(probe)" >> "$LOG"
    done
    echo "$(date +%H:%M:%S) pair complete" >> "$LOG"
    exit 0
  fi
  sleep 180
done
