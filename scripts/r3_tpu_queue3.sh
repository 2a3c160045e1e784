#!/bin/bash
# Round-3 session-3 TPU queue (v2): post-NaN-fix benches, slot-block ladder,
# QC regression check, named-scope profile, then the rehearsals (VERDICT #5).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "$(date +%T) $*" >> /tmp/r3_queue3.log; }
log "QUEUE3v2 START"

timeout 1800 python bench.py > r3logs/bench_mlp_fix.log 2>&1
log "bench mlp rc=$? : $(grep -o '{.*}' r3logs/bench_mlp_fix.log | tail -1)"

BENCH_METHOD=grid_raw_tpu timeout 1800 python bench.py > r3logs/bench_grid_fix.log 2>&1
log "bench grid b384 rc=$? : $(grep -o '{.*}' r3logs/bench_grid_fix.log | tail -1)"

# slot-block ladder: microbench says onehot rows512 block512 ~2x block-384
MMS_SLOT_BLOCK=512 BENCH_METHOD=grid_raw_tpu timeout 1800 python bench.py > r3logs/bench_grid_b512.log 2>&1
log "bench grid b512 rc=$? : $(grep -o '{.*}' r3logs/bench_grid_b512.log | tail -1)"
MMS_SLOT_BLOCK=768 BENCH_METHOD=grid_raw_tpu timeout 1800 python bench.py > r3logs/bench_grid_b768.log 2>&1
log "bench grid b768 rc=$? : $(grep -o '{.*}' r3logs/bench_grid_b768.log | tail -1)"
MMS_FUSED_BLOCK=512 timeout 1800 python bench.py > r3logs/bench_mlp_b512.log 2>&1
log "bench mlp fused-b512 rc=$? : $(grep -o '{.*}' r3logs/bench_mlp_b512.log | tail -1)"

timeout 2400 python scripts/quality_check.py --method grid_raw_tpu --steps 1500 --out qc_grid_fix_r3.json > r3logs/qc_grid_fix.log 2>&1
log "qc grid rc=$?"
timeout 2400 python scripts/quality_check.py --method mlp_raw_tpu --steps 1500 --out qc_mlp_fix_r3.json > r3logs/qc_mlp_fix.log 2>&1
log "qc mlp rc=$?"

PROF_METHOD=grid_raw_tpu PROF_MICROBATCH=512 timeout 1800 python scripts/profile_step.py > r3logs/prof_grid_scoped.log 2>&1
log "grid profile rc=$?"

# grid rehearsal (bounded ~90 min), then the mlp arm runs until round end
timeout 5400 python -m multimodalstudio_tpu.launcher --mode train \
  --conf_path confs/rehearsal_grid_dense.yaml \
  --scene synthetic_raw:views=36,size=256 --version r3_dense \
  > r3logs/rehearsal_grid_dense.log 2>&1
log "grid rehearsal (90min cap) rc=$?"

timeout 43200 python -m multimodalstudio_tpu.launcher --mode train \
  --conf_path confs/rehearsal_mlp_dense.yaml \
  --scene synthetic_raw:views=36,size=256 --version r3_dense \
  > r3logs/rehearsal_mlp_dense.log 2>&1
log "mlp rehearsal rc=$?"
log "QUEUE3v2 DONE"
