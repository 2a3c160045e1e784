#!/bin/bash
# Round-5 merged-backward block ladder at the packed point: the split lost
# to the merged kernel (r5logs/split_ladder.log), so tune the merged path —
# r4 measured fwd block 256 at 1.87x fwd block 512, but the production
# default still runs fwd=bwd=512. MODE=fwdbwd, N=65536, contended with the
# capacity arms (paired ordering is what matters).
set -u
cd /root/repo
mkdir -p r5logs
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site N=65536 MODE=fwdbwd "$@" \
    timeout 3000 python scripts/slot_fused_bench.py
}
run                                          # merged b512 (control)
run MMS_SLOT_FWD_BLOCK=256                   # decoupled fwd
run MMS_SLOT_FWD_BLOCK=384
run MMS_SLOT_FWD_BLOCK=256 BLOCK=384         # bwd 384 (r2 sweet spot)
run MMS_SLOT_FWD_BLOCK=256 BLOCK=768
run MODE=fwd BLOCK=512 MMS_SLOT_FWD_BLOCK=256  # fwd-only confirmation
echo R5_BLOCK_LADDER_DONE
