#!/bin/bash
# Round-5 queue #5: glue-cut A/B (new code vs the 82.2/82.7K pre-glue
# controls in r5logs/gridbench_ab.log) + the microbatch ladder on the SAME
# code + mlp regression. Chip exclusive (capacity ladder done).
set -u
cd /root/repo
mkdir -p r5logs
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site "$@" timeout 2700 python bench.py
}
run BENCH_METHOD=grid_raw_tpu
run BENCH_METHOD=grid_raw_tpu BENCH_MICROBATCH=1024
run BENCH_METHOD=grid_raw_tpu BENCH_MICROBATCH=2048
run BENCH_METHOD=mlp_raw_tpu
run BENCH_METHOD=grid_raw_tpu
echo R5_QUEUE5_DONE
