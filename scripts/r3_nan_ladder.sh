#!/bin/bash
# NaN bisection ladder — runs after queue2 drains. Most-informative-first:
# probe A reuses the bench program (cache hit) at the rehearsal's batch
# geometry; later probes flip one factor each.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "$(date +%T) $*" >> /tmp/r3_nan_ladder.log; }

until grep -q "QUEUE2 DONE" /tmp/r3_queue2.log 2>/dev/null; do sleep 60; done
log "ladder start"

# A: bench-identical geometry (views=10, size=256, 2048x5, 100K schedules)
PROBE_STEPS=400 timeout 3600 python scripts/nan_probe.py > r3logs/nanprobe_A.log 2>&1
rcA=$?; log "A (views10 size256 100K) rc=$rcA"

if [ $rcA -eq 0 ]; then
  # clean -> flip views to the rehearsal's 36
  PROBE_VIEWS=36 PROBE_STEPS=400 timeout 5400 python scripts/nan_probe.py > r3logs/nanprobe_B.log 2>&1
  log "B (views36) rc=$?"
else
  # NaN at bench geometry -> shorten schedules to the clean longrun's 25K
  PROBE_MAXITER=25000 PROBE_STEPS=400 timeout 5400 python scripts/nan_probe.py > r3logs/nanprobe_C.log 2>&1
  log "C (maxiter 25K) rc=$?"
  # and the QC-like small batch at 100K schedules
  PROBE_RAYS=512 PROBE_MODS=rgb,mono PROBE_SIZE=96 PROBE_VIEWS=12 PROBE_STEPS=400 \
    timeout 5400 python scripts/nan_probe.py > r3logs/nanprobe_D.log 2>&1
  log "D (512x2 96px 100K) rc=$?"
fi
log "ladder done"
