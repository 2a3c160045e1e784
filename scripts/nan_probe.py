"""NaN bisection probe: run the bench-geometry fused training loop and
print total_loss every chunk — the rehearsal (2048x5, 256px raw, 100K-step
schedules) trained at NaN from the first logged step while the 1500-step
QC harness (512x2, 96px) is clean; this isolates which factor flips it.

Factors via env: PROBE_METHOD, PROBE_RAYS, PROBE_VIEWS, PROBE_SIZE,
PROBE_MODS (comma list), PROBE_STEPS, PROBE_MAXITER (schedule length),
PROBE_MICRO.
"""

import dataclasses
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

# PROBE_MATMUL=high mirrors Trainer.__init__ (trainer.py:64-69), which maps
# config.matmul_precision "high" -> global f32 contract precision. The direct
# fused-loop probes historically left this at the bf16 default — a program
# difference vs production.
if os.environ.get("PROBE_MATMUL"):
    jax.config.update(
        "jax_default_matmul_precision",
        {"highest": "highest", "high": "float32", "default": "bfloat16"}[
            os.environ["PROBE_MATMUL"]
        ],
    )


def main():
    from multimodalstudio_tpu.configs.methods import method_configs
    from multimodalstudio_tpu.data.device_cache import build_device_cache
    from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset
    from multimodalstudio_tpu.engine.train import init_train_state, make_fused_train_fn
    from multimodalstudio_tpu.models.model import MMSModel

    method = os.environ.get("PROBE_METHOD", "mlp_raw_tpu")
    n_rays = int(os.environ.get("PROBE_RAYS", "2048"))
    views = int(os.environ.get("PROBE_VIEWS", "10"))
    size = int(os.environ.get("PROBE_SIZE", "256"))
    mods = tuple(
        os.environ.get(
            "PROBE_MODS", "rgb,infrared,mono,polarization,multispectral"
        ).split(",")
    )
    steps = int(os.environ.get("PROBE_STEPS", "300"))
    max_iter = int(os.environ.get("PROBE_MAXITER", "100000"))
    micro = int(os.environ.get("PROBE_MICRO", "512"))
    seed = int(os.environ.get("PROBE_SEED", "0"))
    # PROBE_SPLIT=1 reproduces the launcher's train split (every 5th view
    # held out) — the nanrepro run shows the Trainer path NaNs at step 20
    # where the unsplit probe is clean.
    split = os.environ.get("PROBE_SPLIT", "0") == "1"

    cfg = method_configs()[method]
    cfg = dataclasses.replace(
        cfg,
        modalities=mods,
        max_num_iterations=max_iter,
        datamanager=dataclasses.replace(
            cfg.datamanager, num_rays_per_modality=n_rays, microbatch_rays=micro
        ),
    )
    view_ids = None
    n_train_views = views
    if split:
        view_ids = [i for i in range(views) if i % 5 != 4]
        n_train_views = len(view_ids)
    dataset = make_synthetic_dataset(
        mods, num_views=views, height=size, width=size, raw=True, view_ids=view_ids
    )
    cache = build_device_cache(dataset)
    cameras = {m: dataset.data[m].cameras for m in mods}
    model = MMSModel(cfg.model)
    # mirror Trainer.__init__ exactly: rng, init_rng = split(key(seed))
    rng, init_rng = jax.random.split(jax.random.key(seed))
    state = init_train_state(cfg, model, init_rng, {m: n_train_views for m in mods})
    fused = make_fused_train_fn(cfg, model, cameras, cache, 1)

    print(f"probe {method} rays={n_rays} views={views} size={size} "
          f"mods={len(mods)} max_iter={max_iter} seed={seed} split={split}", flush=True)
    for i in range(steps):
        state, aux = fused(state, rng)
        if i % 10 == 0 or i < 5:
            tl = float(aux["losses"]["total_loss"])
            print(f"step {i}: total_loss {tl:.6f}", flush=True)
            if tl != tl:
                print("NAN_DETECTED", flush=True)
                for k, v in aux["losses"].items():
                    print("  ", k, float(v), flush=True)
                sys.exit(1)
    print("PROBE_CLEAN", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
