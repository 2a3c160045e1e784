#!/bin/bash
# Round-5 queue #4 (clean chip): microbatch ladder + mlp regression bench.
# Runs after the profile process exits.
set -u
cd /root/repo
mkdir -p r5logs
while kill -0 $(cat /tmp/prof.pid) 2>/dev/null; do sleep 20; done
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site "$@" timeout 2700 python bench.py
}
run BENCH_METHOD=grid_raw_tpu BENCH_MICROBATCH=1024
run BENCH_METHOD=grid_raw_tpu BENCH_MICROBATCH=2048
run BENCH_METHOD=mlp_raw_tpu
run BENCH_METHOD=grid_raw_tpu   # clean paired control, cached
echo R5_QUEUE4_DONE
