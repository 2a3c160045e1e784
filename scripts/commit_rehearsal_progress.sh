#!/bin/bash
# Persist rehearsal progress across builder sessions (VERDICT r2 item 5).
#
# The build environment resets its filesystem between sessions — only
# git-tracked state survives. The 100K-step non-overfit rehearsal takes
# ~4.5 h of chip time, several sessions' worth, so each session commits
# the run's results.txt + newest checkpoint; the next session re-launches
# the same command and the Trainer auto-resumes from the committed
# checkpoint (engine/trainer.py auto-resume, reference trainer.py:156-171).
#
# Only finalized orbax checkpoints are candidates (in-flight
# `*.orbax-checkpoint-tmp*` dirs sort after finalized names and must never
# be committed), and a checkpoint blob is only added when it is NEW since
# the last sync — results.txt-only ticks stay tiny.
#
# Usage: scripts/commit_rehearsal_progress.sh <run_dir> [message]
set -e
run_dir=${1:?usage: commit_rehearsal_progress.sh <run_dir> [message]}
msg=${2:-"Rehearsal progress: $run_dir"}
cd /root/repo

[ -d "$run_dir" ] || { echo "no such run dir: $run_dir"; exit 1; }

# results.txt + config + eval metric logs (small, always keep)
for f in results.txt config.yaml; do
  [ -f "$run_dir/$f" ] && git add -f -- "$run_dir/$f"
done

# newest FINALIZED checkpoint only (the Trainer already prunes to latest)
ckpts="$run_dir/checkpoints"
if [ -d "$ckpts" ]; then
  latest=$(ls "$ckpts" | grep -E '^step-[0-9]+$' | sort | tail -1)
  if [ -n "$latest" ] && [ -e "$ckpts/$latest/_CHECKPOINT_METADATA" ]; then
    # skip the blob add when this exact checkpoint is already in the index
    if ! git ls-files --error-unmatch -- "$ckpts/$latest" > /dev/null 2>&1; then
      du -sh "$ckpts/$latest"
      git add -f -- "$ckpts/$latest"
      # drop stale older checkpoint blobs from the index
      for d in "$ckpts"/*/; do
        b=$(basename "$d")
        [ "$b" != "$latest" ] && git rm -r -q --cached -- "$ckpts/$b" 2>/dev/null || true
      done
    fi
  fi
fi

# pathspec-scoped commit: never sweep files another session has staged
git commit -q -m "$msg" -- "$run_dir" || echo "nothing to commit"
git log --oneline -1
