"""Adjoint vs JVP fused SDF chain on the real TPU: fwd + full grad timing.

The round-2 profile put the SDF bwd (JVP mode) at ~50 ms/step and fwd at
~18 ms on the 163840-sample production slice. The adjoint mode runs one
reverse sweep instead of 3 tangent chains (~2x fewer matmuls) — this probe
measures both modes on the same eikonal-shaped workload.

nohup python scripts/adj_probe.py > adj_probe.log 2>&1 &
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
sys.path.insert(0, "/root/repo")

from multimodalstudio_tpu.ops.pallas.fused_mlp import fused_sdf_chain

N = 163840
HID = 256
LAYERS = 8
OUT = 257
FREQS = 6
SKIP = (4,)
BLOCK = 384


def make_params(key):
    d_in = 3 + 6 * FREQS
    dims = []
    d = d_in
    for l in range(LAYERS):
        d_out = OUT if l == LAYERS - 1 else HID
        k_in = d + d_in if l in SKIP else d
        dims.append((k_in, d_out))
        d = d_out
    ks = jax.random.split(key, LAYERS)
    ws = [jax.random.normal(k, s) * 0.05 for k, s in zip(ks, dims)]
    bs = [jnp.zeros((s[1],)) for s in dims]
    return ws, bs


def bench(fn, make_args, reps=5, inner=3):
    jax.block_until_ready(fn(*make_args(0)))
    ts = []
    for r in range(1, reps + 1):
        argsets = [make_args(r * 100 + i) for i in range(inner)]
        t0 = time.perf_counter()
        outs = [fn(*a) for a in argsets]
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ws, bs = make_params(jax.random.key(0))
    ws = [jax.device_put(w) for w in ws]
    bs = [jax.device_put(b) for b in bs]

    def make_x(i):
        return (jax.random.uniform(jax.random.key(i), (N, 3)) * 2 - 1,)

    results = {}
    for mode in ("adjoint", "jvp"):
        def fwd(x, _mode=mode):
            sdf, geo, grad = fused_sdf_chain(
                x, ws, bs, num_frequencies=FREQS, min_freq_exp=0.0,
                max_freq_exp=5.0, skip=SKIP, block=BLOCK, mode=_mode,
            )
            return sdf.sum() + geo.astype(jnp.float32).sum() + grad.sum()

        def loss(params, x, _mode=mode):
            w2, b2 = params
            sdf, geo, grad = fused_sdf_chain(
                x, w2, b2, num_frequencies=FREQS, min_freq_exp=0.0,
                max_freq_exp=5.0, skip=SKIP, block=BLOCK, mode=_mode,
            )
            eik = ((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2).mean()
            return sdf.mean() + 0.1 * eik + 1e-3 * geo.astype(jnp.float32).mean()

        jf = jax.jit(fwd)
        jg = jax.jit(jax.grad(loss))
        try:
            t_f = bench(jf, make_x)
            t_g = bench(lambda x: jg((ws, bs), x), make_x)
            results[mode] = {"fwd_ms": t_f * 1e3, "grad_ms": t_g * 1e3,
                             "fwd_msamples_s": N / t_f / 1e6,
                             "grad_msamples_s": N / t_g / 1e6}
            print(mode, json.dumps(results[mode]), flush=True)
        except Exception as e:  # noqa: BLE001
            results[mode] = {"error": str(e)[:500]}
            print(mode, "FAILED:", str(e)[:500], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
