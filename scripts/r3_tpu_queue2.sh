#!/bin/bash
# Round-3 queue #2: post in-kernel-geometry + rows512 measurements.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "$(date +%T) $*" >> /tmp/r3_queue2.log; }

log "QUEUE2 START"

# 1. mlp flagship 1500-step QC — first quality run since the adjoint-mode
#    switch; tests whether the rehearsal NaN is an adjoint bug.
timeout 3600 python scripts/quality_check.py --method mlp_raw_tpu \
  --steps 1500 --rays 512 --modalities rgb mono \
  --out qc_mlp_adjoint_r3.json > r3logs/qc_mlp_adjoint.log 2>&1
log "qc mlp adjoint rc=$?"

# 2. grid flagship 1500-step QC at the new default (in-kernel geometry,
#    rows512) — confirms numerical equivalence at scale.
timeout 3600 python scripts/quality_check.py --method grid_raw_tpu \
  --steps 1500 --rays 512 --modalities rgb mono \
  --out qc_grid_geom_r3.json > r3logs/qc_grid_geom.log 2>&1
log "qc grid geom rc=$?"

# 3. grid 5-mod bench (cold compile for the new program)
t0=$(date +%s)
BENCH_METHOD=grid_raw_tpu timeout 7200 python bench.py > r3logs/bench_grid5_geom.log 2>&1
log "grid5 bench rc=$? wall=$(( $(date +%s) - t0 ))s"
tail -1 r3logs/bench_grid5_geom.log >> /tmp/r3_queue2.log

# 4. mlp 5-mod bench (unchanged program, cache hit — sanity)
t0=$(date +%s)
timeout 5400 python bench.py > r3logs/bench_mlp5_geom.log 2>&1
log "mlp5 bench rc=$? wall=$(( $(date +%s) - t0 ))s"
tail -1 r3logs/bench_mlp5_geom.log >> /tmp/r3_queue2.log

log "QUEUE2 DONE"
