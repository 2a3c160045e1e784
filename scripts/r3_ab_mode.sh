#!/bin/bash
# A/B: fused_sdf_chain jvp vs adjoint on the 1500-step quality harness —
# the r3 adjoint default measured 41.85/39.14 dB where the r2 jvp QC
# measured 44.08/41.56; isolate whether the estimator mode is the cause.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "$(date +%T) $*" >> /tmp/r3_ab_mode.log; }

until grep -q "ladder done" /tmp/r3_nan_ladder.log 2>/dev/null; do sleep 60; done
log "ab start"

MMS_SDF_CHAIN_MODE=jvp timeout 3600 python scripts/quality_check.py \
  --method mlp_raw_tpu --steps 1500 --rays 512 --modalities rgb mono \
  --out qc_mlp_jvp_r3.json > r3logs/qc_mlp_jvp.log 2>&1
log "qc mlp jvp rc=$?"
log "ab done"
