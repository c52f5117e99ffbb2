#!/bin/bash
# Round-5 second-session opportunistic gated pair: same protocol as
# pair_now.sh phase 2 (>=30k launch gate). Runs c2 then c8 back-to-back the
# moment a healthy window appears; logs every probe. The builder's own
# foreground Spark work keeps the probe low while it runs, so this can only
# fire in a genuinely idle healthy window.
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
LOG=BENCH/r5/session2_pair.log
probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }
echo "=== session2 gated watcher start $(date) ===" >> "$LOG"
deadline=$(( $(date +%s) + 18000 ))
while true; do
  P=$(probe)
  echo "$(date +%H:%M:%S) gate probe $P" >> "$LOG"
  if [ "$P" -ge 30000 ]; then
    echo "$(date +%H:%M:%S) HEALTHY - launching pair" >> "$LOG"
    SPARK_GRAFT_CPUS=2 taskset -c 0-1 python bench.py \
      > BENCH/r5/s2healthy_c2.out 2> BENCH/r5/s2healthy_c2.err
    echo "$(date +%H:%M:%S) c2 done probe=$(probe)" >> "$LOG"
    SPARK_GRAFT_CPUS=8 taskset -c 0-7 python bench.py \
      > BENCH/r5/s2healthy_c8.out 2> BENCH/r5/s2healthy_c8.err
    echo "$(date +%H:%M:%S) c8 done probe=$(probe)" >> "$LOG"
    break
  fi
  [ "$(date +%s)" -ge "$deadline" ] && { echo "expired $(date)" >> "$LOG"; break; }
  sleep 180
done
