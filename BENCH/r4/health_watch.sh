#!/bin/bash
# Log the thread-wake health probe once a minute so a healthy window
# (>=30k rt/s) can be spotted and used for the pinned scaling pair.
cd /root/repo
while true; do
  rt=$(python -c "import bench; print(bench.wake_rt_per_sec(2000))" 2>/dev/null)
  echo "$(date +%s) $rt" >> BENCH/r4/health_watch.log
  sleep 60
done
