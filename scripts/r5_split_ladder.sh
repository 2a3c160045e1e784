#!/bin/bash
# Round-5 split-backward ladder at the packed point (4096e F2 bf16 L6,
# 3x128->257, pe6, N=65536): merged vs split backward, block/scatter-block
# tuning. Runs MODE=fwdbwd only (fwd is unchanged by the split).
# May run contended with a capacity-ladder arm (~10-20%); relative ordering
# is what matters — the winner gets a clean confirmation run.
set -u
cd /root/repo
mkdir -p r5logs
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site N=65536 MODE=fwdbwd "$@" \
    timeout 3000 python scripts/slot_fused_bench.py
}
run                                                   # merged baseline b512
run MMS_SLOT_BWD_SPLIT=1                              # split b512
run MMS_SLOT_BWD_SPLIT=1 MMS_SLOT_SCATTER_BLOCK=2048  # bigger scatter block
run MMS_SLOT_BWD_SPLIT=1 BLOCK=256                    # split wants smaller b1?
run MMS_SLOT_BWD_SPLIT=1 BLOCK=256 MMS_SLOT_SCATTER_BLOCK=2048
run MMS_SLOT_BWD_SPLIT=1 BLOCK=1024 MMS_SLOT_SCATTER_BLOCK=2048
run MMS_SLOT_BWD_SPLIT=1 MMS_SLOT_FWD_BLOCK=256 MMS_SLOT_SCATTER_BLOCK=2048
echo R5_SPLIT_LADDER_DONE
