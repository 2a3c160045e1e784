"""CLI launcher: train or evaluate a scene.

TPU-native counterpart of reference src/launcher.py:19-32:

    python -m multimodalstudio_tpu.launcher --mode train \
        --conf_path confs/grid_raw.yaml --scene <data_dir> --version v1

`--scene` is the dataset directory holding meta_data.json (or `synthetic` /
`synthetic_raw` for the built-in analytic scene; optional geometry suffix
`synthetic_raw:views=36,size=128,texfreq=40` controls view count / image size
/ texture frequency (the capacity stress knob) — every
5th view is held out for eval, mirroring the reference eval_image_indices
convention, confs/grid_raw.yaml:46).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Dict, List

from multimodalstudio_tpu.configs.config import load_config, make_output_dir
from multimodalstudio_tpu.configs.methods import MODALITY_CHANNELS


def build_datasets(config, scene: str):
    from multimodalstudio_tpu.data import dataset as D

    if scene.startswith("synthetic"):
        from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset

        raw = config.datamanager.raw
        views, size, texfreq = 12, 96, 6.0
        if ":" in scene:
            for kv in scene.split(":", 1)[1].split(","):
                k, _, v = kv.partition("=")
                if k == "views":
                    views = int(v)
                elif k == "size":
                    size = int(v)
                elif k == "texfreq":
                    texfreq = float(v)
                else:
                    raise ValueError(f"unknown synthetic scene option {kv!r}")
        train = make_synthetic_dataset(
            config.modalities, num_views=views, height=size, width=size, raw=raw,
            view_ids=[i for i in range(views) if i % 5 != 4], tex_freq=texfreq,
        )
        evald = make_synthetic_dataset(
            config.modalities, num_views=views, height=size, width=size, raw=raw,
            view_ids=[i for i in range(views) if i % 5 == 4], tex_freq=texfreq,
        )
        return train, evald

    eval_per_mod = None
    if config.datamanager.eval_indices_per_modality is not None:
        eval_per_mod = dict(config.datamanager.eval_indices_per_modality)
    train_idx, eval_idx = D.train_eval_indices(
        scene,
        config.modalities,
        eval_image_indices=list(config.datamanager.eval_image_indices),
        eval_indices_per_modality=eval_per_mod,
        eval_ratio=config.datamanager.eval_ratio,
    )
    if config.datamanager.skip_indices_per_modality is not None:
        for mod, skips in config.datamanager.skip_indices_per_modality:
            train_idx[mod] = [i for i in train_idx[mod] if i not in set(skips)]
    train = D.load_dataset(scene, config.modalities, train_idx, raw=config.datamanager.raw)
    evald = D.load_dataset(scene, config.modalities, eval_idx, raw=config.datamanager.raw)
    return train, evald


def resolve_model_channels(config, dataset):
    """Bind per-modality channel counts from the dataset into the model spec
    (the reference passes channels_per_modality at pipeline setup,
    base_pipeline.py:101-105)."""
    channels = dataset.channels_per_modality
    model = dataclasses.replace(
        config.model,
        modalities=tuple((m, channels[m]) for m in config.modalities),
    )
    return dataclasses.replace(config, model=model)


def main(argv=None):
    parser = argparse.ArgumentParser(description="mms-tpu launcher")
    parser.add_argument("--mode", choices=["train", "eval"], default="train")
    parser.add_argument("--conf_path", default=None, help="YAML config path")
    parser.add_argument("--method", default=None, help="method registry name")
    parser.add_argument("--scene", required=True, help="dataset dir or 'synthetic'")
    parser.add_argument("--version", default=None, help="run version tag")
    parser.add_argument("--output", default="output", help="output root")
    parser.add_argument("--view_ids", type=int, nargs="*", default=None)
    parser.add_argument("--max_iterations", type=int, default=None)
    args = parser.parse_args(argv)

    # Persistent compile cache: the remote TPU AOT compiler costs minutes per
    # program; cache hits skip it entirely (CLAUDE.md environment facts).
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MMS_JAXCACHE", "/root/repo/.jaxcache"),
    )

    # Multi-host (DCN): when MMS_COORDINATOR is set, join the process group
    # before any JAX computation — jax.devices() becomes global and the
    # Trainer's data mesh spans hosts (reference multi-node Fabric launch,
    # src/engine/trainer.py:57-63).
    from multimodalstudio_tpu.parallel.sharding import initialize_distributed

    initialize_distributed()

    config = load_config(args.conf_path, method=args.method)
    if args.max_iterations:
        config = dataclasses.replace(config, max_num_iterations=args.max_iterations)

    train_ds, eval_ds = build_datasets(config, args.scene)
    config = resolve_model_channels(config, train_ds)

    scene = args.scene.split(":", 1)[0] if args.scene.startswith("synthetic") else args.scene
    scene_name = os.path.basename(os.path.normpath(scene)) or scene
    conf_name = (
        os.path.splitext(os.path.basename(args.conf_path))[0]
        if args.conf_path
        else config.method_name
    )
    out_dir = make_output_dir(
        args.output, scene_name, config.method_name, conf_name, args.version
    )
    print(f"output dir: {out_dir}")

    from multimodalstudio_tpu.engine.trainer import Trainer

    trainer = Trainer(config, train_ds, eval_ds, out_dir)
    trainer.setup()
    if args.mode == "train":
        trainer.train()
    else:
        results = trainer.eval(view_ids=args.view_ids)
        print(results)


if __name__ == "__main__":
    main()
