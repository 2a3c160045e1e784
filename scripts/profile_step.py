"""Profile one fused training step on the TPU and attribute device time by op.

Writes a jax.profiler trace, then parses the xplane proto with
tensorboard_plugin_profile to print the top ops by self time.

nohup python scripts/profile_step.py > profile_step.log 2>&1 &
"""

import dataclasses
import glob
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
sys.path.insert(0, "/root/repo")


def main():
    from multimodalstudio_tpu.configs.config import apply_env_grid_overrides
    from multimodalstudio_tpu.configs.methods import method_configs
    from multimodalstudio_tpu.data.device_cache import build_device_cache
    from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset
    from multimodalstudio_tpu.engine.train import init_train_state, make_fused_train_fn
    from multimodalstudio_tpu.models.model import MMSModel

    method = os.environ.get("PROF_METHOD", "mlp_raw_tpu")
    n_rays = int(os.environ.get("PROF_RAYS", "2048"))
    micro = int(os.environ.get("PROF_MICROBATCH", "1024"))
    modalities = tuple(
        os.environ.get(
            "PROF_MODS", "rgb,infrared,mono,polarization,multispectral"
        ).split(",")
    )

    cfg = method_configs()[method]
    jax.config.update(
        "jax_default_matmul_precision",
        {"highest": "highest", "high": "float32", "default": "bfloat16"}.get(
            cfg.matmul_precision, "float32"
        ),
    )
    cfg = dataclasses.replace(
        cfg, modalities=modalities, max_num_iterations=100000,
        datamanager=dataclasses.replace(
            cfg.datamanager, num_rays_per_modality=n_rays, microbatch_rays=micro
        ),
    )
    cfg = apply_env_grid_overrides(cfg)
    ds = make_synthetic_dataset(modalities, num_views=10, height=256, width=256, raw=True)
    cache = build_device_cache(ds)
    cams = {m: ds.data[m].cameras for m in modalities}
    model = MMSModel(cfg.model)
    state = init_train_state(cfg, model, jax.random.key(0), {m: 10 for m in modalities})
    fused = make_fused_train_fn(cfg, model, cams, cache, 1)
    rng = jax.random.key(1)

    for _ in range(3):
        state, aux = fused(state, rng)
    jax.block_until_ready(state.params["model"])

    tag = os.environ.get("PROF_TAG", "")
    trace_dir = f"/root/repo/prof_{method}_{n_rays}_{micro}{('_' + tag) if tag else ''}"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, aux = fused(state, rng)
        jax.block_until_ready(state.params["model"])
    print("trace written to", trace_dir, flush=True)

    # ---- parse: op profile via tensorboard_plugin_profile
    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats^", {})
        out = os.path.join(trace_dir, "op_stats.json")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        print("op stats written to", out, flush=True)
    except Exception as e:  # noqa: BLE001
        print("op-stats conversion failed:", repr(e), flush=True)
        # fallback: trace viewer json
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

            data, _ = rtd.xspace_to_tool_data(xplanes, "trace_viewer^", {})
            out = os.path.join(trace_dir, "trace.json")
            with open(out, "w") as f:
                f.write(data if isinstance(data, str) else data.decode())
            print("trace json written to", out, flush=True)
        except Exception as e2:  # noqa: BLE001
            print("trace conversion failed:", repr(e2), flush=True)


if __name__ == "__main__":
    main()
