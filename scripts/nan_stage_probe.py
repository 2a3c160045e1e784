"""Stage-level NaN localization for the f32-matmul-precision failure.

nanprobe_M shows: under jax_default_matmul_precision=float32 (the Trainer's
matmul_precision="high" mapping, trainer.py:64-69) the 1-channel modalities
(infrared, mono) render NaN from the very first forward, while the identical
program at the bf16 default is clean. This script runs ONE forward eagerly
on the TPU and prints finiteness per stage to localize the producing op.
"""

import os
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
if os.environ.get("PROBE_MATMUL", "high"):
    jax.config.update(
        "jax_default_matmul_precision",
        {"highest": "highest", "high": "float32", "default": "bfloat16"}[
            os.environ.get("PROBE_MATMUL", "high")
        ],
    )


def stat(name, x):
    x = jnp.asarray(x)
    finite = bool(jnp.all(jnp.isfinite(x)))
    mx = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
    print(f"  {name:38s} finite={finite} max|x|={mx:.4g} {x.shape} {x.dtype}", flush=True)
    return finite


def main():
    from multimodalstudio_tpu.configs.methods import method_configs
    from multimodalstudio_tpu.data.device_cache import build_device_cache, sample_pixel_batch
    from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset
    from multimodalstudio_tpu.engine.train import build_rays, init_train_state
    from multimodalstudio_tpu.models.model import MMSModel

    import dataclasses

    method = os.environ.get("PROBE_METHOD", "mlp_raw_tpu")
    mods = tuple(os.environ.get("PROBE_MODS", "rgb,mono").split(","))
    n_rays = int(os.environ.get("PROBE_RAYS", "256"))
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
    rng, init_rng = jax.random.split(jax.random.key(654824))
    state = init_train_state(cfg, model, init_rng, {m: views for m in mods})
    params = state.params

    batch = sample_pixel_batch(cache, jax.random.key(7), n_rays, mods)
    rays, segments = build_rays(cfg, params, cameras, batch)
    print("stage: rays", flush=True)
    stat("origins", rays.origins); stat("directions", rays.directions)

    from multimodalstudio_tpu.engine.train import make_schedules

    sched = make_schedules(cfg, jnp.asarray(0))
    mp = params["model"]

    # ---- replicate forward() stage by stage
    from multimodalstudio_tpu.models.colliders import sphere_collide
    from multimodalstudio_tpu.models.samplers import neus_sampling, spaced_sampling
    from multimodalstudio_tpu.models.colliders import background_bounds

    spec = model.spec
    collided, mask = sphere_collide(rays, spec.scene_radius)
    samples = neus_sampling(
        collided,
        lambda pos: model.sdf_only(mp, pos, sched.active_level, spec.surface.sampler_levels),
        spec.ray_sampler, jax.random.key(3), True,
    )
    print("stage: sampler", flush=True)
    stat("starts", samples.starts); stat("deltas", samples.deltas)

    positions = samples.start_positions()
    sdf, geo, gradients, hessians = model.sdf_gradients(mp, positions, sched, True)
    print("stage: sdf", flush=True)
    stat("sdf", sdf); stat("geo", geo); stat("gradients", gradients)

    norm = jnp.linalg.norm(gradients, axis=-1, keepdims=True)
    normals = gradients / jnp.maximum(norm, 1e-12)
    from multimodalstudio_tpu.models.volume_rendering import neus_weights

    inv_s = model.inv_s(mp)
    weights = neus_weights(samples, sdf, gradients, inv_s, sched.cos_anneal_ratio)
    print("stage: weights", flush=True)
    stat("weights", weights)

    radiance = model._radiance_forward(mp, samples, normals, geo, segments, False)
    print("stage: radiance heads", flush=True)
    for mod in mods:
        stat(f"radiance[{mod}]", radiance[mod])

    bg_rays = background_bounds(rays, mask, spec.scene_radius)
    bg_samples = spaced_sampling(bg_rays, spec.background_ray_sampler, jax.random.key(4), True)
    background = model._background_forward(mp, bg_samples, segments, False)
    print("stage: background", flush=True)
    for mod in mods:
        stat(f"background[{mod}]", background[mod])

    print("DONE", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
