#!/bin/bash
# Round-5 queue #3: microbatch ladder at the packed point (the r2 finding
# that mb=512 beats 1024 predates the fused slot kernels — per-microbatch
# XLA glue is now ~40% of the step, and fewer scan iterations amortize it)
# + the mlp regression bench. Waits for gridbench_ab to finish first.
set -u
cd /root/repo
mkdir -p r5logs
while kill -0 $(cat /tmp/gridab.pid) 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site "$@" timeout 2400 python bench.py
}
run BENCH_METHOD=grid_raw_tpu BENCH_MICROBATCH=1024
run BENCH_METHOD=grid_raw_tpu BENCH_MICROBATCH=2048
run BENCH_METHOD=grid_raw_tpu BENCH_MICROBATCH=1024 MMS_SLOT_FWD_BLOCK=256
run BENCH_METHOD=mlp_raw_tpu
echo R5_QUEUE3_DONE
