#!/bin/bash
# Round-4 packed slot-grid measurement ladder (VERDICT r3 #1).
# Standalone slot-op microbench across (feats, table_dtype, rows, levels):
# the packed cell layout puts P=128/(8F) hash entries per physical row, so
# the one-hot gather/scatter MACs per entry drop P-fold; bf16 tables halve
# the table-dot MACs again. Baseline = the r3 flagship point (11.1 M
# samples/s fwd+bwd at 6x512x16 f32).
# NOTE: runs concurrently with the mlp rehearsal (mild chip contention);
# relative ordering is what matters, the winner is re-measured clean.
set -e
cd /root/repo
run() {
  echo "=== $* ==="
  env PYTHONPATH=/root/repo:/root/.axon_site N=65536 LAYOUT=cell GATHER=onehot "$@" \
    python scripts/slot_grid_bench.py
}
run LEVELS=6  MAXRES=512  ROWS=512  FEATS=16 TDT=f32   # r3 flagship baseline
run LEVELS=6  MAXRES=512  ROWS=512  FEATS=2  TDT=bf16  # equal entries, 16x MAC cut
run LEVELS=6  MAXRES=512  ROWS=4096 FEATS=2  TDT=bf16  # 8x entries, 2x MAC cut
run LEVELS=16 MAXRES=2048 ROWS=2048 FEATS=2  TDT=bf16  # tcnn-shaped 16-level
run LEVELS=16 MAXRES=2048 ROWS=8192 FEATS=2  TDT=bf16  # capacity push
run LEVELS=6  MAXRES=512  ROWS=512  FEATS=2  TDT=f32   # dtype isolation
echo LADDER_DONE
