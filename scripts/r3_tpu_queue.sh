#!/bin/bash
# Round-3 TPU measurement ladder. Waits for the tunnel, then runs the
# queued measurements sequentially, logging to r3logs/.
# Start: nohup bash scripts/r3_tpu_queue.sh > /tmp/r3_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p r3logs

probe() {
  timeout 180 python -c "import jax; print(jax.devices())" > /dev/null 2>&1
}

echo "$(date +%T) waiting for TPU..."
until probe; do sleep 60; done
echo "$(date +%T) TPU UP"

# --- stage A (detached): 5-modality grid bench — the long compile starts
# now on the remote helper; execution only grabs the chip at the end.
( t0=$(date +%s)
  BENCH_METHOD=grid_raw_tpu timeout 7200 python bench.py > r3logs/bench_grid5.log 2>&1
  echo "grid5 bench rc=$? wall=$(( $(date +%s) - t0 ))s" >> r3logs/bench_grid5.log
) &
GRID_PID=$!
echo "$(date +%T) grid 5-mod bench launched (pid $GRID_PID)"

# --- stage B (sequential): slot-grid microbench sweep
for cfg in "onehot 2048 128" "onehot 2048 512" "onehot 512 128" "onehot 512 512" "copy 2048 128" "onehot 1024 256"; do
  set -- $cfg
  echo "$(date +%T) slot bench gather=$1 rows=$2 block=$3"
  N=65536 LAYOUT=cell GATHER=$1 ROWS=$2 BLOCK=$3 \
    timeout 1800 python scripts/slot_grid_bench.py \
    > "r3logs/slot_${1}_r${2}_b${3}.log" 2>&1
done
echo "$(date +%T) slot sweep done"

# --- stage C: mlp flagship step bench (adjoint program, cold compile)
t0=$(date +%s)
timeout 5400 python bench.py > r3logs/bench_mlp5.log 2>&1
echo "mlp5 bench rc=$? wall=$(( $(date +%s) - t0 ))s" >> r3logs/bench_mlp5.log
echo "$(date +%T) mlp bench done"

# --- stage D: wait for the grid bench
wait $GRID_PID
echo "$(date +%T) grid bench done"
tail -2 r3logs/bench_grid5.log
echo "$(date +%T) QUEUE_DONE"
