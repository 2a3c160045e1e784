#!/bin/bash
# Seed-variance calibration: the 1500-step harness is deterministic per
# seed, so program-numerics deltas (operand vs in-kernel geometry: 45.0 vs
# 40.7 dB; jvp vs adjoint: 44.1 vs 41.9) can only be judged against the
# seed-to-seed spread of the same program.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "$(date +%T) $*" >> /tmp/r3_seed_var.log; }

until grep -q "ab done" /tmp/r3_ab_mode.log 2>/dev/null; do sleep 60; done
log "seed-var start"

for s in 1 2; do
  timeout 3600 python scripts/quality_check.py --method grid_raw_tpu \
    --steps 1500 --rays 512 --modalities rgb mono --seed $s \
    --out qc_grid_geom_s${s}_r3.json > r3logs/qc_grid_geom_s${s}.log 2>&1
  log "grid geom seed $s rc=$?"
done
timeout 3600 python scripts/quality_check.py --method mlp_raw_tpu \
  --steps 1500 --rays 512 --modalities rgb mono --seed 1 \
  --out qc_mlp_adjoint_s1_r3.json > r3logs/qc_mlp_adjoint_s1.log 2>&1
log "mlp adjoint seed 1 rc=$?"
log "seed-var done"
