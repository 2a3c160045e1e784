#!/bin/bash
# Round-5 TPU queue #1: fresh packed-point attribution (VERDICT r4 #3),
# then the unfinished 20K capacity-ladder arms that gate flagship
# promotion (VERDICT r4 #1/#7):
#   1. named-scope trace of the grid step at the packed6 point (2048x5,
#      6L x 4096e x F2 bf16, 2-tap) -> r5logs/attrib_packed.txt
#   2. arm packed6   (promotion candidate) 20K from scratch
#   3. arm packed16  (tcnn-shaped 16L x 2048e) resume 10K -> 20K
#   4. arm base6_4tap (curvature-estimator gate) 20K
#   5. arm packed16big (capacity curve upper point) 20K
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

SCENE="synthetic_raw:views=50,size=512,texfreq=150"

# ---- 1. attribution trace at the packed point --------------------------
echo "=== ATTRIBUTION packed6 ==="
env PROF_METHOD=grid_raw_tpu PROF_RAYS=2048 PROF_MICROBATCH=512 \
    BENCH_GRID_FEATS=2 BENCH_GRID_DTYPE=bf16 BENCH_GRID_ENTRIES=4096 \
    PROF_TAG=r5packed timeout 3600 \
    python scripts/profile_step.py 2>&1 | tail -5
python scripts/trace_attrib.py prof_grid_raw_tpu_2048_512_r5packed 60 \
    > r5logs/attrib_packed.txt 2>&1 || true
git add -f r5logs/attrib_packed.txt && git commit -q -m "r5: packed-point step attribution trace" || true

# ---- 2-5. capacity arms ------------------------------------------------
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
  timeout 7200 \
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

echo R5_QUEUE1_DONE
