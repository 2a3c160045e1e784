#!/bin/bash
# Round-4: fused-bwd kernel section attribution (MMS_SLOT_ABLATE).
# Packed prod point (4096e F2 bf16 L6, 3x128->257, pe6, N=65536), MODE=fwdbwd.
# Sections: adj / grid3 / gafwd / rev / scatter / fold; the all-off combo
# is the irreducible base (geometry + chain rebuild + kernel glue).
set -u
cd /root/repo
for AB in "" adj grid3 gafwd rev scatter fold grid3,gafwd,rev,scatter,fold,adj; do
  echo "=== ablate='$AB' ==="
  env PYTHONPATH=/root/repo:/root/.axon_site N=65536 MODE=fwdbwd MMS_SLOT_ABLATE="$AB" \
    timeout 3000 python scripts/slot_fused_bench.py
done
echo BWD_ABLATE_DONE
