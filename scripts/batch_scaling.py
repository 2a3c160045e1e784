"""Batch-scaling + MFU study (round-2 item 1, VERDICT.md).

Sweeps rays/modality for a method with gradient accumulation disabled,
measuring rays/s and MFU (XLA cost-analysis FLOPs / wall time / peak).
Run detached:
    nohup python scripts/batch_scaling.py > batch_scaling.log 2>&1 &

rays/sec definition matches reference src/engine/trainer.py:107-114.
"""

import dataclasses
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

# TPU v5e peak: 197 TFLOP/s bf16 per chip.
PEAK_FLOPS = 197e12


def run_one(method, n_rays, micro, modalities, dataset, steps_per_call=5):
    from multimodalstudio_tpu.configs.methods import method_configs
    from multimodalstudio_tpu.data.device_cache import build_device_cache
    from multimodalstudio_tpu.engine.train import init_train_state, make_fused_train_fn
    from multimodalstudio_tpu.models.model import MMSModel

    cfg = method_configs()[method]
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
    if os.environ.get("STUDY_REMAT", "1") == "0":
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat=False)
        )
    cache = build_device_cache(dataset)
    cameras = {m: dataset.data[m].cameras for m in modalities}
    model = MMSModel(cfg.model)
    state = init_train_state(cfg, model, jax.random.key(0), {m: 10 for m in modalities})
    fused = make_fused_train_fn(cfg, model, cameras, cache, 1)
    rng = jax.random.key(1)

    # FLOP accounting via XLA cost analysis (honest: what the compiled
    # program actually executes, incl. backward).
    t_compile = time.perf_counter()
    lowered = fused.lower(state, rng)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t_compile
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001
        print(f"  cost_analysis failed: {e}", flush=True)
        flops_per_step = float("nan")

    # warmup (chained state carry defeats tunnel memoization)
    for _ in range(2 * steps_per_call):
        state, aux = fused(state, rng)
    jax.block_until_ready(state.params["model"])

    rays_per_step = n_rays * len(modalities)
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(steps_per_call):
            state, aux = fused(state, rng)
        jax.block_until_ready(state.params["model"])
        rates.append(steps_per_call * rays_per_step / (time.perf_counter() - t0))
    rates.sort()
    rays_per_sec = rates[len(rates) // 2]
    steps_per_sec = rays_per_sec / rays_per_step
    mfu = flops_per_step * steps_per_sec / PEAK_FLOPS
    rec = {
        "method": method,
        "n_rays_per_modality": n_rays,
        "microbatch": micro,
        "n_modalities": len(modalities),
        "rays_per_sec": round(rays_per_sec),
        "rays_per_sec_min_max": [round(rates[0]), round(rates[-1])],
        "flops_per_step": flops_per_step,
        "mfu": round(mfu, 4),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset

    modalities = ("rgb", "infrared", "mono", "polarization", "multispectral")
    dataset = make_synthetic_dataset(modalities, num_views=10, height=256, width=256, raw=True)

    results = []
    method = os.environ.get("STUDY_METHOD", "mlp_raw_tpu")
    # (n_rays_per_modality, microbatch) pairs; 0 = no accumulation
    combos = os.environ.get(
        "STUDY_COMBOS", "2048:0,2048:1024,4096:0,4096:2048,8192:0,8192:4096,16384:4096"
    )
    for combo in combos.split(","):
        n, micro = (int(v) for v in combo.split(":"))
        try:
            results.append(run_one(method, n, micro, modalities, dataset))
        except Exception as e:  # noqa: BLE001
            msg = repr(e)
            if len(msg) > 400:
                msg = msg[:200] + " ... " + msg[-200:]
            print(json.dumps({"method": method, "n_rays_per_modality": n,
                              "microbatch": micro, "error": msg}), flush=True)
    with open(f"batch_scaling_{method}.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
