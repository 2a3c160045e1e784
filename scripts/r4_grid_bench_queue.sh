#!/bin/bash
# Round-4 session-8: grid bench after the fwd-residual kernel rework,
# at the shipped table and at the packed promotion candidate.
set -u
cd /root/repo
while [ -f /tmp/benchq.pid ] && kill -0 "$(cat /tmp/benchq.pid)" 2>/dev/null; do sleep 30; done
echo "=== bench grid (shipped table) ==="
env PYTHONPATH=/root/repo:/root/.axon_site BENCH_METHOD=grid_raw_tpu timeout 3600 python bench.py
echo "=== bench grid (packed 4096e F2 bf16) ==="
env PYTHONPATH=/root/repo:/root/.axon_site BENCH_METHOD=grid_raw_tpu \
  BENCH_GRID_FEATS=2 BENCH_GRID_ENTRIES=4096 BENCH_GRID_DTYPE=bf16 \
  timeout 3600 python bench.py
echo GRID_BENCH_DONE
