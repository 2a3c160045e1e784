#!/bin/bash
# Round-4 session-7: forward-block decision queue.
#
# The session-6 ladder measured the fused fwd kernel 1.87x faster at block
# 256 (74.9 vs 40.1 M samples/s) with the bwd indifferent; fwd/bwd blocks
# are now decoupled (MMS_SLOT_FWD_BLOCK). Measure the microbench at the
# packed point and the end-to-end grid bench at fwd-block {default, 256,
# 128} to pick DEFAULT_FWD_BLOCK. Runs under capacity-arm contention —
# relative ordering is the decision signal; clean re-measure at promotion.
set -u
cd /root/repo

echo "=== micro fwd_block=256 ==="
env PYTHONPATH=/root/repo:/root/.axon_site N=65536 MMS_SLOT_FWD_BLOCK=256 \
  timeout 3000 python scripts/slot_fused_bench.py
echo "=== micro fwd_block=128 ==="
env PYTHONPATH=/root/repo:/root/.axon_site N=65536 MMS_SLOT_FWD_BLOCK=128 \
  timeout 3000 python scripts/slot_fused_bench.py

for fb in 0 256 128; do
  echo "=== bench grid fwd_block=$fb ==="
  env PYTHONPATH=/root/repo:/root/.axon_site BENCH_METHOD=grid_raw_tpu \
    MMS_SLOT_FWD_BLOCK=$fb timeout 3000 python bench.py
done
echo FWDBLOCK_QUEUE_DONE
