#!/bin/bash
# Round-4 session-6 decomposition ladder for the fused slot+MLP kernel.
# The packed-entry work cut the gather MACs 8-16x but end-to-end only moved
# +17-22% — this ladder attributes the remaining fused-kernel time:
# gather (ROWS), chain depth (NLAYERS), encoding (PEF), geo width (DOUT),
# block size (BLOCK). Runs alongside the mlp rehearsal (contention ~10-20%;
# relative ordering is what matters).
set -u
cd /root/repo
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site N=65536 "$@" \
    timeout 3000 python scripts/slot_fused_bench.py
}
run                                    # prod packed point (4096e F2 bf16 L6 3x128->257 pe6 b512)
run ROWS=64                            # gather ~free -> gather share
run NLAYERS=2                          # one hidden layer -> chain share
                                       # (NLAYERS=1 invalid: no 128-wide hidden)
run PEF=1                              # encoding ~free -> encoding share
run DOUT=129                           # geo half-width
run BLOCK=1024                         # MXU efficiency probe
run BLOCK=256
run LEVELS=16 MAXRES=2048 ROWS=2048    # tcnn-shaped full story
echo FUSED_LADDER_DONE
