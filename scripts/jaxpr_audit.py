"""Program-size audit: where do the train step's jaxpr equations come from?

Traces (no compile, CPU) the fused train step for a method and reports
equation counts grouped by primitive and by source region (the innermost
user frame). Round-1 found the 5-modality grid program at ~12.6K eqns and
25-35 min remote-compile; this attributes the bloat (VERDICT r1 item 8).

    STUDY_METHOD=grid_raw_tpu python scripts/jaxpr_audit.py
"""

import collections
import dataclasses
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _region(eqn):
    """Innermost repo frame 'file:line' for an eqn, else '?'."""
    try:
        frames = eqn.source_info.traceback.frames
    except Exception:
        return "?"
    for fr in frames:
        fn = getattr(fr, "file_name", "")
        if "multimodalstudio_tpu" in fn and "site-packages" not in fn:
            short = fn.split("multimodalstudio_tpu/", 1)[-1]
            return f"{short}:{fr.line_num}"
    return "?"


def count_eqns(jaxpr, prim_counts, region_counts, depth=0):
    n = 0
    for eqn in jaxpr.eqns:
        n += 1
        prim_counts[eqn.primitive.name] += 1
        region_counts[_region(eqn)] += 1
        for v in eqn.params.values():
            if isinstance(v, jax.extend.core.ClosedJaxpr):
                n += count_eqns(v.jaxpr, prim_counts, region_counts, depth + 1)
            elif isinstance(v, (tuple, list)):
                for item in v:
                    if isinstance(item, jax.extend.core.ClosedJaxpr):
                        n += count_eqns(item.jaxpr, prim_counts, region_counts, depth + 1)
    return n


def main():
    from multimodalstudio_tpu.configs.methods import method_configs
    from multimodalstudio_tpu.data.device_cache import build_device_cache
    from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset
    from multimodalstudio_tpu.engine.train import init_train_state, make_fused_train_fn
    from multimodalstudio_tpu.models.model import MMSModel

    method = os.environ.get("STUDY_METHOD", "grid_raw_tpu")
    mods = os.environ.get("STUDY_MODS", "rgb,infrared,mono,polarization,multispectral").split(",")
    n_rays = int(os.environ.get("STUDY_RAYS", "2048"))
    micro = int(os.environ.get("STUDY_MICROBATCH", "512"))

    cfg = method_configs()[method]
    cfg = dataclasses.replace(
        cfg,
        modalities=tuple(mods),
        max_num_iterations=100000,
        datamanager=dataclasses.replace(
            cfg.datamanager, num_rays_per_modality=n_rays, microbatch_rays=micro
        ),
    )
    ds = make_synthetic_dataset(tuple(mods), num_views=4, height=64, width=64, raw=True)
    cache = build_device_cache(ds)
    cameras = {m: ds.data[m].cameras for m in mods}
    model = MMSModel(cfg.model)
    state = init_train_state(cfg, model, jax.random.key(0), {m: 4 for m in mods})
    fused = make_fused_train_fn(cfg, model, cameras, cache, 1)

    import time

    t0 = time.perf_counter()
    traced = fused.trace(state, jax.random.key(1))
    trace_s = time.perf_counter() - t0
    jaxpr = traced.jaxpr
    prim_counts = collections.Counter()
    region_counts = collections.Counter()
    total = count_eqns(jaxpr.jaxpr, prim_counts, region_counts)
    print(f"method={method} mods={len(mods)} rays={n_rays} micro={micro}")
    print(f"total eqns (incl. nested): {total}   trace time: {trace_s:.1f}s")
    for prim, c in prim_counts.most_common(25):
        print(f"  {prim:35s} {c}")
    print("\n== by source region (innermost repo frame) ==")
    for reg, c in region_counts.most_common(40):
        print(f"  {c:6d}  {reg}")


if __name__ == "__main__":
    main()
