#!/bin/bash
# Round-4 capacity stress ladder, take 2 (VERDICT r3 #4 + curvature gate
# #2). Differences from r4_capacity_queue.sh:
#   - arms re-prioritized: packed6 (the 4096e F2 bf16 promotion candidate)
#     first, then the tcnn-shaped capacity probes, then the curvature gate;
#   - steps_per_save 5000 + a rehearsal watcher per arm so mid-arm
#     progress survives a worker-VM reset (the take-1 packed16 arm lost
#     40 min to exactly this);
#   - steps_per_eval_all_images 20000 -> the final step writes results.txt
#     (take 1 logged eval-batch PSNRs only to a volatile log).
# Waits for the interactive bench queues to free the chip.
set -u
cd /root/repo

for pidf in /tmp/benchq.pid /tmp/gridbenchq.pid; do
  while [ -f "$pidf" ] && kill -0 "$(cat "$pidf")" 2>/dev/null; do sleep 60; done
done

SCENE="synthetic_raw:views=50,size=512,texfreq=150"

arm() {
  name=$1; shift
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
  run_dir="output/synthetic_raw/grid_raw_tpu/capacity_${name}/cap_${name}"
  echo "=== ARM $name ==="
  nohup bash scripts/rehearsal_watcher.sh "$run_dir" 300 \
    > "/tmp/watcher_cap_${name}.log" 2>&1 &
  wpid=$!
  env PYTHONPATH=/root/repo:/root/.axon_site timeout 7200 \
    python -m multimodalstudio_tpu.launcher --mode train \
    --conf_path "$conf" --scene "$SCENE" --version "cap_${name}" \
    2>&1 | tail -40
  kill "$wpid" 2>/dev/null
  bash scripts/commit_rehearsal_progress.sh "$run_dir" \
    "Capacity ladder arm ${name}: results" || true
}

arm packed6 <<'ARMCONF'
model:
  surface:
    surface_field:
      field:
        grid:
          encoding: {feats: 2, table_dtype: bf16, rows_per_level: 4096}
ARMCONF

arm packed16 <<'ARMCONF'
model:
  surface:
    surface_field:
      field:
        grid:
          encoding: {feats: 2, table_dtype: bf16, rows_per_level: 2048, num_levels: 16, max_res: 2048}
ARMCONF

arm base6_4tap <<'ARMCONF'
# curvature-estimator gate: identical to base6 but the reference 4-tap
model:
  surface:
    curvature_taps: 4
ARMCONF

arm packed16big <<'ARMCONF'
model:
  surface:
    surface_field:
      field:
        grid:
          encoding: {feats: 2, table_dtype: bf16, rows_per_level: 16384, num_levels: 16, max_res: 2048}
ARMCONF

echo CAPACITY_QUEUE2_DONE
