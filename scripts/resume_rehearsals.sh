#!/bin/bash
# One-command rehearsal resume for a fresh builder session (VERDICT r2 #5).
#
# Relaunches the 100K-step non-overfit grid rehearsal; the Trainer
# auto-resumes from the newest git-committed checkpoint in the run dir
# (scripts/commit_rehearsal_progress.sh keeps it current via the watcher).
# Run this FIRST in a session — the cold 5-mod compile (~6 min) and the
# training itself are chip-bound, so CPU work can proceed alongside, but
# do NOT run pytest during the compile (1 CPU core starves the tracer).
#
# Arm selection: GRID (default) or ARM=mlp for the mlp flagship arm.
set -e
cd /root/repo
arm=${ARM:-grid}
run_dir="output/synthetic_raw/${arm}_raw_tpu/rehearsal_${arm}_dense/r3rehearsal"
conf="confs/rehearsal_${arm}_dense.yaml"

# refuse to double-launch: a second trainer on the same run_dir corrupts it
for kind in rehearsal watcher; do
  pidfile="/tmp/${kind}_${arm}.pid"
  if [ -f "$pidfile" ] && kill -0 "$(cat "$pidfile")" 2>/dev/null; then
    echo "$kind for arm '$arm' already running (pid $(cat "$pidfile")); aborting"
    exit 1
  fi
done

mkdir -p "$(dirname "$run_dir")"
nohup env PYTHONPATH=/root/repo:/root/.axon_site \
  python -m multimodalstudio_tpu.launcher --mode train \
  --conf_path "$conf" --scene synthetic_raw:views=36,size=256 \
  --version r3rehearsal > "/tmp/rehearsal_${arm}.log" 2>&1 &
echo $! > "/tmp/rehearsal_${arm}.pid"

nohup bash scripts/rehearsal_watcher.sh "$run_dir" 300 \
  > "/tmp/watcher_${arm}.log" 2>&1 &
echo $! > "/tmp/watcher_${arm}.pid"

echo "rehearsal: tail -f /tmp/rehearsal_${arm}.log   (pid $(cat /tmp/rehearsal_${arm}.pid))"
echo "watcher:   pid $(cat /tmp/watcher_${arm}.pid); progress commits every 5 min"
