"""Quality parity harness: train a method briefly and report eval PSNR/SSIM.

Used to compare training recipes (e.g. the reference-faithful `grid_raw`
numerical-gradient estimator vs the TPU-tuned `grid_raw_tpu` analytic one)
on the built-in synthetic multimodal scene, or on a real scene directory.

    python scripts/quality_check.py --method grid_raw_tpu --steps 2000 \
        --scene synthetic --modalities rgb mono
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", default="grid_raw_tpu")
    parser.add_argument("--scene", default="synthetic")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--modalities", nargs="+", default=None)
    parser.add_argument("--rays", type=int, default=512)
    parser.add_argument("--cpu", action="store_true", help="force CPU platform")
    parser.add_argument("--out", default=None)
    parser.add_argument(
        "--layout", default=None, choices=["vertex", "cell"],
        help="override the slot-grid table layout (grid methods)",
    )
    parser.add_argument(
        "--tap-stride", type=int, default=None,
        help="override surface.curvature_tap_stride",
    )
    parser.add_argument(
        "--grid-rows", type=int, default=None,
        help="override slot-grid rows_per_level",
    )
    parser.add_argument(
        "--seed", type=int, default=None,
        help="override config.seed (trajectory-variance estimates)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        # CPU AOT cache entries are machine-feature-specific; the in-tree
        # .jaxcache travels across round VMs with different CPUs and a
        # mismatched entry SIGILLs on load — keep CPU caches host-local
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_cpu")
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

    from multimodalstudio_tpu.configs.config import load_config
    from multimodalstudio_tpu.launcher import build_datasets, resolve_model_channels
    from multimodalstudio_tpu.engine.trainer import Trainer

    config = load_config(None, method=args.method)
    overrides = dict(
        max_num_iterations=args.steps,
        steps_per_eval_batch=0,
        steps_per_eval_image=0,
        steps_per_eval_all_images=0,
        steps_per_save=args.steps,
        steps_per_export_mesh=0,
        steps_per_export_poses=0,
    )
    config = dataclasses.replace(config, **overrides)
    if args.seed is not None:
        config = dataclasses.replace(config, seed=args.seed)
    if args.modalities:
        config = dataclasses.replace(config, modalities=tuple(args.modalities))
    config = dataclasses.replace(
        config,
        datamanager=dataclasses.replace(
            config.datamanager,
            num_rays_per_modality=args.rays,
            microbatch_rays=min(config.datamanager.microbatch_rays or args.rays, args.rays),
        ),
        evaluator=dataclasses.replace(
            config.evaluator, eval_num_rays_per_chunk=4096, rendering_scale=0.5,
            export_mesh=False, export_poses=False,
        ),
        logging=dataclasses.replace(config.logging, steps_per_log=max(args.steps // 10, 1)),
    )

    if args.layout or args.tap_stride or args.grid_rows:
        surface = config.model.surface
        if args.tap_stride:
            surface = dataclasses.replace(surface, curvature_tap_stride=args.tap_stride)
        if args.layout or args.grid_rows:
            sf = surface.surface_field
            enc = sf.field.grid.encoding
            enc = dataclasses.replace(
                enc,
                layout=args.layout or enc.layout,
                rows_per_level=args.grid_rows or enc.rows_per_level,
            )
            grid = dataclasses.replace(sf.field.grid, encoding=enc)
            surface = dataclasses.replace(
                surface,
                surface_field=dataclasses.replace(
                    sf, field=dataclasses.replace(sf.field, grid=grid)
                ),
            )
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, surface=surface)
        )

    train_ds, eval_ds = build_datasets(config, args.scene)
    config = resolve_model_channels(config, train_ds)

    trainer = Trainer(config, train_ds, eval_ds, output_dir=None)
    trainer.setup()
    t0 = time.time()
    trainer.train()
    train_time = time.time() - t0

    results = trainer.evaluator.render_all_eval_views(trainer.state)
    report = {
        "method": args.method,
        "steps": args.steps,
        "train_seconds": round(train_time, 1),
        "rays_per_sec": round(
            args.steps * args.rays * len(config.modalities) / train_time
        ),
        "metrics": {m: {k: round(v, 3) for k, v in r.items()} for m, r in results.items()},
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
