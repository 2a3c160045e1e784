"""Second-level NaN bisection: eager is finite under f32 matmul precision
(nan_stage_probe), the jitted fused step is NaN (nanprobe_M) — so bisect the
jitted program: forward-only loss vs value_and_grad, at production shapes.

PROBE_MATMUL=high|default|highest, PROBE_MODS, PROBE_RAYS (default 512 = one
microbatch slice; no accumulation scan so the program is as small as possible).
"""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
jax.config.update(
    "jax_default_matmul_precision",
    {"highest": "highest", "high": "float32", "default": "bfloat16"}[
        os.environ.get("PROBE_MATMUL", "high")
    ],
)


def main():
    from multimodalstudio_tpu.configs.methods import method_configs
    from multimodalstudio_tpu.data.device_cache import build_device_cache, sample_pixel_batch
    from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset
    from multimodalstudio_tpu.engine.train import (
        _surface_grid, build_rays, init_train_state, make_schedules,
        select_mosaick_channels,
    )
    from multimodalstudio_tpu.engine.losses import compute_losses
    from multimodalstudio_tpu.models.model import MMSModel
    from multimodalstudio_tpu.ops.math import psnr

    method = os.environ.get("PROBE_METHOD", "mlp_raw_tpu")
    mods = tuple(
        os.environ.get("PROBE_MODS", "rgb,infrared,mono,polarization,multispectral").split(",")
    )
    n_rays = int(os.environ.get("PROBE_RAYS", "512"))
    views, size = 36, 256

    cfg = method_configs()[method]
    cfg = dataclasses.replace(
        cfg,
        modalities=mods,
        datamanager=dataclasses.replace(
            cfg.datamanager, num_rays_per_modality=n_rays, microbatch_rays=n_rays
        ),
    )
    dataset = make_synthetic_dataset(mods, num_views=views, height=size, width=size, raw=True)
    cache = build_device_cache(dataset)
    cameras = {m: dataset.data[m].cameras for m in mods}
    model = MMSModel(cfg.model)
    grid = _surface_grid(cfg)
    rng, init_rng = jax.random.split(jax.random.key(654824))
    state = init_train_state(cfg, model, init_rng, {m: views for m in mods})
    params = state.params
    schedules = make_schedules(cfg, jnp.asarray(0))

    batch = sample_pixel_batch(cache, jax.random.key(7), n_rays, mods)

    def loss_fn(params, batch, rng_model, rng_loss):
        rays, segments = build_rays(cfg, params, cameras, batch)
        outputs = model.forward(
            params["model"], rays, segments, schedules, rng_model, train=True
        )
        outputs = select_mosaick_channels(cfg, outputs, batch)
        targets = {mod: batch[mod].pixels for mod in cfg.modalities}
        losses, total = compute_losses(
            cfg.loss_manager, outputs, targets, jnp.asarray(0),
            cfg.max_num_iterations, grid, rng_loss, train=True,
        )
        metrics = {f"psnr_{mod}": psnr(outputs[mod], targets[mod]) for mod in cfg.modalities}
        return total, (losses, metrics)

    rm, rl = jax.random.split(jax.random.key(11))

    print(f"== A: jit forward-only loss ({os.environ.get('PROBE_MATMUL','high')}) ==", flush=True)
    total, (losses, _) = jax.jit(loss_fn)(params, batch, rm, rl)
    for k in sorted(losses):
        print(f"  {k}: {float(losses[k]):.6f}", flush=True)
    print(f"  total: {float(total):.6f}", flush=True)

    print("== B: jit value_and_grad ==", flush=True)
    (total, (losses, _)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params, batch, rm, rl)
    for k in sorted(losses):
        print(f"  {k}: {float(losses[k]):.6f}", flush=True)
    print(f"  total: {float(total):.6f}", flush=True)
    bad = [
        p for p, g in jax.tree_util.tree_leaves_with_path(grads)
        if not bool(jnp.all(jnp.isfinite(g)))
    ]
    print(f"  non-finite grad leaves: {len(bad)}", flush=True)
    for p in bad[:20]:
        print("   ", jax.tree_util.keystr(p), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
