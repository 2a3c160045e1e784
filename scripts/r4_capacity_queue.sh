#!/bin/bash
# Round-4 capacity stress ladder (VERDICT r3 #4) + curvature-estimator gate
# (VERDICT r3 #2, 20K-step horizon).
#
# Scene: 512px, 50 views, texfreq=150 (detail at ~4px period — the regime
# where table capacity binds; plain texfreq=6 is invisible to any table).
# 20K steps each, all 5 modalities, reference ray geometry, camera
# optimizer off (synthetic poses are exact). Arms in priority order — the
# session clock decides how many complete; each commits its results via
# the rehearsal sync script when done.
#
# Waits for the mlp rehearsal and the bench queue to free the chip.
set -u
cd /root/repo

for pidf in /tmp/rehearsal_mlp.pid /tmp/benchq.pid /tmp/ladder.pid; do
  while [ -f "$pidf" ] && kill -0 "$(cat "$pidf")" 2>/dev/null; do sleep 60; done
done

SCENE="synthetic_raw:views=50,size=512,texfreq=150"

arm() {
  name=$1; shift
  conf=/tmp/capacity_${name}.yaml
  {
    cat <<'BASE'
method: grid_raw_tpu
max_num_iterations: 20000
steps_per_eval_batch: 1000
steps_per_eval_image: 5000
steps_per_eval_all_images: 0
steps_per_save: 10000
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
BASE
    cat  # arm-specific override block from stdin
  } > "$conf"
  echo "=== ARM $name ==="
  env PYTHONPATH=/root/repo:/root/.axon_site timeout 7200 \
    python -m multimodalstudio_tpu.launcher --mode train \
    --conf_path "$conf" --scene "$SCENE" --version "cap_${name}" \
    2>&1 | tail -40
  run_dir="output/synthetic_raw/grid_raw_tpu/capacity_${name}/cap_${name}"
  bash scripts/commit_rehearsal_progress.sh "$run_dir" \
    "Capacity ladder arm ${name}: results" || true
}

# Arm order is decision priority: base6 is the comparator every other arm
# is judged against (run it first so a truncated session still yields a
# comparable pair), then the tcnn-shaped packed table (the promotion
# candidate), then the curvature-estimator gate, then the capacity sweeps.
arm base6 <<'EOF'
# flagship table as shipped (6L x 512e x F16 f32), 2-tap curvature
EOF

arm packed16 <<'EOF'
model:
  surface:
    surface_field:
      field:
        grid:
          encoding: {feats: 2, table_dtype: bf16, rows_per_level: 2048, num_levels: 16, max_res: 2048}
EOF

arm base6_4tap <<'EOF'
# curvature-estimator gate: identical to base6 but the reference 4-tap
model:
  surface:
    curvature_taps: 4
EOF

arm packed6 <<'EOF'
model:
  surface:
    surface_field:
      field:
        grid:
          encoding: {feats: 2, table_dtype: bf16, rows_per_level: 4096}
EOF

arm packed16big <<'EOF'
model:
  surface:
    surface_field:
      field:
        grid:
          encoding: {feats: 2, table_dtype: bf16, rows_per_level: 16384, num_levels: 16, max_res: 2048}
EOF

echo CAPACITY_QUEUE_DONE
