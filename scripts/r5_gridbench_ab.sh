#!/bin/bash
# Paired A/B: promoted packed grid flagship, default blocks (fwd=bwd=512)
# vs decoupled fwd block 256 (r5 microbench winner: 35.8 vs 18.9 M
# samples/s fused fwd+bwd). Contended with the capacity ladder arm —
# paired ordering is the signal. Then the mlp method as a regression check.
set -u
cd /root/repo
mkdir -p r5logs
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site "$@" timeout 2400 python bench.py
}
run BENCH_METHOD=grid_raw_tpu
run BENCH_METHOD=grid_raw_tpu MMS_SLOT_FWD_BLOCK=256
run BENCH_METHOD=grid_raw_tpu
run BENCH_METHOD=grid_raw_tpu MMS_SLOT_FWD_BLOCK=256
echo R5_GRIDBENCH_AB_DONE
