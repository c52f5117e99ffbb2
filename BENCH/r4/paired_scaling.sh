#!/bin/bash
# Fallback 2-vs-8 scaling evidence for an oscillating host: a SMALLER
# fixture (100 domains x 2500 pages, 240k visits) so a c2+c8 PAIR runs
# back-to-back inside one healthy phase (~5-6 min total), bracketed by
# wake-latency probes. Repeat pairs; report each pair with its probes so
# the efficiency ratio comes from two runs on a comparably healthy host.
# The smaller fixture UNDERSTATES efficiency vs the 1M protocol (per-round
# fixed driver terms weigh ~4x more per visit), so a pair here is a
# conservative bound, not a flattering one.
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
LOG=BENCH/r4/paired_scaling.log
probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }

for pair in 1 2 3; do
  while true; do
    P=$(probe); echo "$(date +%H:%M:%S) probe $P" >> "$LOG"
    [ "$P" -ge 10000 ] && break
    sleep 120
  done
  echo "$(date +%H:%M:%S) pair $pair launch" >> "$LOG"
  SPARK_GRAFT_CPUS=2 taskset -c 0-1 python bench.py \
    > BENCH/r4/pair${pair}_c2.out 2> BENCH/r4/pair${pair}_c2.err
  SPARK_GRAFT_CPUS=8 taskset -c 0-7 python bench.py \
    > BENCH/r4/pair${pair}_c8.out 2> BENCH/r4/pair${pair}_c8.err
  python - <<PY >> "$LOG"
import json
a = json.loads(open("BENCH/r4/pair${pair}_c2.out").read().strip().splitlines()[-1])
b = json.loads(open("BENCH/r4/pair${pair}_c8.out").read().strip().splitlines()[-1])
wa, wb = a["crawl"]["wake_rt_per_sec"], b["crawl"]["wake_rt_per_sec"]
eff = b["value"]/a["value"]/4
print(f'pair ${pair}: c2={a["value"]} ({wa}) c8={b["value"]} ({wb}) eff={eff:.3f}')
PY
done
echo "$(date +%H:%M:%S) DONE" >> "$LOG"
