#!/bin/bash
# 1-vs-4-core pairs (the north rule's other N->4N pair). Round-4 paired
# runs showed the DEGRADED host phase is triggered by the local[8]
# thread population itself (c2 runs kept healthy 35-64k rt/s wake probes
# five times; every c8 run's own probes collapsed to 3.5-16k), so the
# 2->8 pair cannot be measured as a code property here. local[1] and
# local[4] carry smaller thread populations; pairs run back-to-back,
# bracketed by probes, accepted only if all four probe readings are
# mutually comparable.
cd /root/repo
export BENCH_DOMAINS=100 BENCH_PAGES_PER_DOMAIN=2500 BENCH_SKIP_QUERIES=1
LOG=BENCH/r4/pairs14.log
probe() { python -c "import bench; print(bench.wake_rt_per_sec())"; }

for pair in 1 2 3; do
  while true; do
    P=$(probe); echo "$(date +%H:%M:%S) probe $P" >> "$LOG"
    [ "$P" -ge 10000 ] && break
    sleep 120
  done
  echo "$(date +%H:%M:%S) pair $pair launch" >> "$LOG"
  SPARK_GRAFT_CPUS=1 taskset -c 0 python bench.py \
    > BENCH/r4/p14_${pair}_c1.out 2> BENCH/r4/p14_${pair}_c1.err
  SPARK_GRAFT_CPUS=4 taskset -c 0-3 python bench.py \
    > BENCH/r4/p14_${pair}_c4.out 2> BENCH/r4/p14_${pair}_c4.err
  python - <<PY >> "$LOG"
import json
a = json.loads(open("BENCH/r4/p14_${pair}_c1.out").read().strip().splitlines()[-1])
b = json.loads(open("BENCH/r4/p14_${pair}_c4.out").read().strip().splitlines()[-1])
wa, wb = a["crawl"]["wake_rt_per_sec"], b["crawl"]["wake_rt_per_sec"]
eff = b["value"]/a["value"]/4
print(f'pair ${pair}: c1={a["value"]} ({wa}) c4={b["value"]} ({wb}) eff={eff:.3f}')
PY
done
echo "$(date +%H:%M:%S) DONE" >> "$LOG"
