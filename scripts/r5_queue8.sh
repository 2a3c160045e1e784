#!/bin/bash
# Block-size shots at the packed point, uncontended (r3 tuned block 512
# pre-packed; the packed table + adjoint backward may prefer larger
# blocks — fewer full-table scatter-accumulator revisits).
set -u
cd /root/repo
while kill -0 $(cat /tmp/queue7.pid) 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site "$@" timeout 2700 python bench.py
}
run BENCH_METHOD=grid_raw_tpu MMS_SLOT_BLOCK=640
run BENCH_METHOD=grid_raw_tpu MMS_FUSED_BLOCK=384
echo R5_QUEUE8_DONE
