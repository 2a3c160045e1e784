#!/bin/bash
# Persist volatile /tmp measurement logs into the repo every few minutes so
# queue results survive a worker-VM reset (only git-tracked state is
# durable; see CLAUDE.md). Companion of the capacity/bench queues.
# Usage: scripts/log_persist_watcher.sh [interval_s]
interval=${1:-300}
cd /root/repo
mkdir -p r4logs
while true; do
  sleep "$interval"
  changed=0
  for f in /tmp/capacity.log /tmp/capacity2.log /tmp/fwdblock.log \
           /tmp/fused_ladder.log /tmp/benchq.log /tmp/gridbench.log; do
    b=r4logs/$(basename "$f")
    if [ -f "$f" ] && ! cmp -s "$f" "$b"; then cp "$f" "$b"; changed=1; fi
  done
  if [ "$changed" = 1 ]; then
    git add -f r4logs && git commit -q -m "Persist measurement-queue logs" -- r4logs || true
  fi
done
