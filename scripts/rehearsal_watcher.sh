#!/bin/bash
# Periodically commit rehearsal progress (results.txt + latest checkpoint)
# so chip-time survives the between-session filesystem reset. Companion of
# scripts/commit_rehearsal_progress.sh; run detached alongside a rehearsal.
#
# Usage: scripts/rehearsal_watcher.sh <run_dir> [interval_s]
run_dir=${1:?usage: rehearsal_watcher.sh <run_dir> [interval_s]}
interval=${2:-300}
cd /root/repo
while true; do
  sleep "$interval"
  bash scripts/commit_rehearsal_progress.sh "$run_dir" \
    "Rehearsal checkpoint sync: $(basename "$run_dir")" 2>/dev/null | tail -1
done
