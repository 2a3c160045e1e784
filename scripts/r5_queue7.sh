#!/bin/bash
# Final-code measurement queue: mlp regression bench + a clean (uncontended)
# retry of the decoupled fwd-block A/B that was only measured contended.
set -u
cd /root/repo
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site "$@" timeout 2700 python bench.py
}
run BENCH_METHOD=mlp_raw_tpu
run BENCH_METHOD=grid_raw_tpu MMS_SLOT_FWD_BLOCK=256
run BENCH_METHOD=grid_raw_tpu
echo R5_QUEUE7_DONE
