#!/bin/bash
# Pinned strong-scaling curve, round-4 protocol == round-3 protocol:
# 200 domains x 5000 pages, every page seeded, 3 rounds, queries skipped.
cd /root/repo
export BENCH_DOMAINS=200 BENCH_PAGES_PER_DOMAIN=5000 BENCH_SKIP_QUERIES=1
for N in 2 8 4 1; do
  LAST=$((N-1))
  echo "=== pinned local[$N] cores 0-$LAST ==="
  taskset -c 0-$LAST env SPARK_GRAFT_CPUS=$N python bench.py \
    > BENCH/r4/curve_c$N.out 2> BENCH/r4/curve_c$N.err
  echo "rc=$? for N=$N"
done
echo "=== disk-mode local[8] ==="
rm -rf /tmp/bench_ckpt_r4 && taskset -c 0-7 env SPARK_GRAFT_CPUS=8 \
  BENCH_CHECKPOINT_DIR=/tmp/bench_ckpt_r4 python bench.py \
  > BENCH/r4/curve_c8_disk.out 2> BENCH/r4/curve_c8_disk.err
echo "rc=$? disk"
