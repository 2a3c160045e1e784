#!/bin/bash
# Round-4 end-to-end packed-grid bench queue (decides the flagship promotion).
# Waits for the microbench ladder, then measures the full 5-modality training
# step (bench.py) at three table geometries. Runs alongside the mlp rehearsal
# (chip contention depresses absolutes ~10-20%; the ranking is what we need —
# the chosen config gets a clean re-measure at session end).
set -u
cd /root/repo
while [ -f /tmp/ladder.pid ] && kill -0 "$(cat /tmp/ladder.pid)" 2>/dev/null; do
  sleep 20
done
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site BENCH_METHOD=grid_raw_tpu "$@" \
    timeout 3000 python bench.py
}
run                                                         # r3 flagship
run BENCH_GRID_FEATS=2 BENCH_GRID_DTYPE=bf16 BENCH_GRID_ENTRIES=4096
run BENCH_GRID_FEATS=2 BENCH_GRID_DTYPE=bf16 BENCH_GRID_ENTRIES=2048 \
    BENCH_GRID_LEVELS=16 BENCH_GRID_MAXRES=2048
run BENCH_GRID_FEATS=2 BENCH_GRID_DTYPE=bf16 BENCH_GRID_ENTRIES=512
echo BENCHQ_DONE
