"""Benchmark: training throughput (rays/sec/chip) on the flagship config.

Measures the reference's rays/sec definition — num_rays_per_modality x
n_modalities / iter_time (reference src/engine/trainer.py:107-114) — at the
reference's batch geometry (2048 rays x 5 modalities, 32+32 NeuS + 16
background samples, raw mosaicked frames) using the fused device-cached
training loop. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Default method: `grid_raw_tpu` — the slot-hash-grid flagship (fully-fused
Pallas grid+MLP kernels with in-kernel geometry, ops/pallas/slot_fused.py,
packed bf16 table promoted r5). It is the only architecture whose FLOP
ceiling clears the 2M rays/s target (docs/performance.md §2 caps the
pure-MLP method at ~280K) and since the r5 packed promotion it is also the
measured-faster method. Set BENCH_METHOD=mlp_raw_tpu for the pure-MLP
recipe, BENCH_RAYS / BENCH_MICROBATCH to vary batch geometry.
Baseline target: 2,000,000 rays/sec/chip on TPU v5e (BASELINE.md).
"""

import dataclasses
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")


def main():
    from multimodalstudio_tpu.configs.config import apply_env_grid_overrides
    from multimodalstudio_tpu.configs.methods import method_configs
    from multimodalstudio_tpu.data.device_cache import build_device_cache
    from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset
    from multimodalstudio_tpu.engine.train import init_train_state, make_fused_train_fn
    from multimodalstudio_tpu.models.model import MMSModel

    import os

    modalities = ("rgb", "infrared", "mono", "polarization", "multispectral")
    n_rays = 2048  # reference training batch: 2048 rays/modality (BASELINE.md)
    steps_per_call = 5  # dispatches per measurement; program is K=1

    method = os.environ.get("BENCH_METHOD", "grid_raw_tpu")
    n_rays = int(os.environ.get("BENCH_RAYS", n_rays))
    micro = int(os.environ.get("BENCH_MICROBATCH", "512"))
    cfg = method_configs()[method]
    # mirror Trainer.__init__ (trainer.py:64-69) so the benched program is
    # the production program (the TPU flagships run bf16 contract precision
    # globally with f32 pinned locally in geometry matmuls)
    jax.config.update(
        "jax_default_matmul_precision",
        {"highest": "highest", "high": "float32", "default": "bfloat16"}.get(
            cfg.matmul_precision, "float32"
        ),
    )
    cfg = dataclasses.replace(
        cfg,
        modalities=modalities,
        max_num_iterations=100000,
        datamanager=dataclasses.replace(
            cfg.datamanager, num_rays_per_modality=n_rays, microbatch_rays=micro
        ),
    )
    cfg = apply_env_grid_overrides(cfg)

    dataset = make_synthetic_dataset(modalities, num_views=10, height=256, width=256, raw=True)
    cache = build_device_cache(dataset)
    cameras = {m: dataset.data[m].cameras for m in modalities}

    model = MMSModel(cfg.model)
    state = init_train_state(
        cfg, model, jax.random.key(0), {m: 10 for m in modalities}
    )
    fused = make_fused_train_fn(cfg, model, cameras, cache, 1)
    rng = jax.random.key(1)

    # warmup / compile (2 chunks: compile + steady-state)
    for _ in range(2 * steps_per_call):
        state, aux = fused(state, rng)
        jax.block_until_ready(state.params["model"])

    # median over chunks — executions through the TPU tunnel show ~2x
    # run-to-run variance
    n_chunks = 5
    rates = []
    rays_per_step = n_rays * len(modalities)
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        for _ in range(steps_per_call):
            state, aux = fused(state, rng)
        jax.block_until_ready(state.params["model"])
        rates.append(steps_per_call * rays_per_step / (time.perf_counter() - t0))
    rates.sort()
    rays_per_sec = rates[len(rates) // 2]

    print(
        json.dumps(
            {
                "metric": f"train_rays_per_sec_per_chip ({method}, 5 modalities)",
                "value": round(rays_per_sec),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / 2_000_000, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
