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
  # stderr lands in the watcher's nohup log; warn loudly on failure so
  # persistent sync breakage is visible instead of silently looping.
  if ! bash scripts/commit_rehearsal_progress.sh "$run_dir" \
      "Rehearsal checkpoint sync: $(basename "$run_dir")" | tail -1; then
    echo "WARNING: rehearsal progress commit FAILED at $(date -u +%FT%TZ)" >&2
  fi
done
