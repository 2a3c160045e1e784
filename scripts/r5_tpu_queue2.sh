#!/bin/bash
# Round-5 TPU queue #2 (session 2): finish the 20K capacity ladder that
# gates flagship promotion (VERDICT r4 #1/#7).
#
# State on entry (committed checkpoints):
#   base6       20K DONE  (no results.txt — all-images eval was uncapped)
#   packed6     15K       (resume -> 20K)
#   packed16    10K       (resume -> 20K)
#   base6_4tap  never ran (0 -> 20K)
#   packed16big never ran (0 -> 20K, capacity-curve upper point, riskiest last)
#
# MMS_EVAL_MAX_VIEWS=3 caps the step-20000 all-images eval to the first 3
# held-out views per modality — identical protocol for every arm, ~7 min
# instead of ~25, and it writes the results.txt the promotion table needs.
#
# All python runs use the .ladder_snap package snapshot so kernel edits in
# the live tree cannot break arms launched later in the queue.
set -u
cd /root/repo
mkdir -p r5logs

SNAP=/root/repo/.ladder_snap
rm -rf "$SNAP"; mkdir -p "$SNAP"
cp -r multimodalstudio_tpu "$SNAP/"
export PYTHONPATH="$SNAP:/root/.axon_site"
export MMS_EVAL_MAX_VIEWS=3

SCENE="synthetic_raw:views=50,size=512,texfreq=150"

mkconf() {
  name=$1
  conf=/tmp/capacity_${name}.yaml
  {
    cat <<'BASECONF'
method: grid_raw_tpu
max_num_iterations: 20000
steps_per_eval_batch: 1000
steps_per_eval_image: 5000
steps_per_eval_all_images: 20000
steps_per_save: 5000
modalities: [rgb, infrared, mono, polarization, multispectral]
evaluator:
  eval_num_rays_per_chunk: 4096
  rendering_scale: 1.0
  export_mesh: false
  export_poses: false
logging:
  steps_per_log: 500
  steps_per_flush_buffer: 1000
datamanager:
  num_rays_per_modality: 2048
  microbatch_rays: 512
  camera_optimizer:
    mode: "off"
BASECONF
    cat  # arm-specific override block from stdin
  } > "$conf"
}

arm() {
  name=$1; tmo=$2
  conf=/tmp/capacity_${name}.yaml
  run_dir="output/synthetic_raw/grid_raw_tpu/capacity_${name}/cap_${name}"
  echo "=== ARM $name (timeout ${tmo}s) ==="
  nohup bash scripts/rehearsal_watcher.sh "$run_dir" 300 \
    > "/tmp/watcher_cap_${name}.log" 2>&1 &
  wpid=$!
  timeout "$tmo" \
    python -m multimodalstudio_tpu.launcher --mode train \
    --conf_path "$conf" --scene "$SCENE" --version "cap_${name}" \
    2>&1 | tail -60
  kill "$wpid" 2>/dev/null
  bash scripts/commit_rehearsal_progress.sh "$run_dir" \
    "Capacity ladder arm ${name}: results" || true
}

evalarm() {
  name=$1
  conf=/tmp/capacity_${name}.yaml
  run_dir="output/synthetic_raw/grid_raw_tpu/capacity_${name}/cap_${name}"
  echo "=== EVAL $name ==="
  timeout 3600 \
    python -m multimodalstudio_tpu.launcher --mode eval \
    --conf_path "$conf" --scene "$SCENE" --version "cap_${name}" \
    2>&1 | tail -20
  bash scripts/commit_rehearsal_progress.sh "$run_dir" \
    "Capacity ladder arm ${name}: capped 20K eval" || true
}

mkconf packed6 <<'ARMCONF'
model:
  surface:
    surface_field:
      field:
        grid:
          encoding: {feats: 2, table_dtype: bf16, rows_per_level: 4096}
ARMCONF

mkconf base6 <<'ARMCONF'
# registry-default table (6L x 512 x F16 f32) — the promotion comparator
ARMCONF

mkconf packed16 <<'ARMCONF'
model:
  surface:
    surface_field:
      field:
        grid:
          encoding: {feats: 2, table_dtype: bf16, rows_per_level: 2048, num_levels: 16, max_res: 2048}
ARMCONF

mkconf base6_4tap <<'ARMCONF'
# curvature-estimator gate: identical to base6 but the reference 4-tap
model:
  surface:
    curvature_taps: 4
ARMCONF

mkconf packed16big <<'ARMCONF'
model:
  surface:
    surface_field:
      field:
        grid:
          encoding: {feats: 2, table_dtype: bf16, rows_per_level: 16384, num_levels: 16, max_res: 2048}
ARMCONF

arm packed6 4500        # 5K steps + compile + capped 20K eval
evalarm base6           # comparable results.txt from the existing 20K ckpt
arm packed16 6600       # 10K steps + compile + eval
arm base6_4tap 9000     # 20K steps + compile + eval
arm packed16big 9000    # 20K steps + compile + eval
echo R5_QUEUE2_DONE
