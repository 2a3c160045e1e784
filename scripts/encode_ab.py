"""On-device A/B: hash-encode gather_mode 'rows' vs 'flat' (fwd and fwd+bwd).

nohup python scripts/encode_ab.py > encode_ab.log 2>&1 &
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
sys.path.insert(0, "/root/repo")


def bench(fn, make_args, reps=5, inner=4):
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
    from multimodalstudio_tpu.ops.encodings import HashGridSpec, hash_grid_lookup

    N = 65536
    key = jax.random.key(0)
    for mode in ("rows", "flat"):
        for log2T, L, F in ((19, 16, 2), (17, 8, 4)):
            spec = HashGridSpec(
                num_levels=L, features_per_level=F, log2_hashmap_size=log2T,
                max_res=1024, vjp_mode="custom", gather_mode=mode,
            )
            tab = jax.random.normal(jax.random.key(1), (L * spec.table_size, F)) * 0.1

            def mk(seed):
                k = jax.random.fold_in(key, seed)
                return (jax.random.uniform(k, (N, 3)),)

            fwd = jax.jit(lambda x, tab=tab, spec=spec: hash_grid_lookup(tab, x, spec))
            t_f = bench(fwd, mk)

            def loss(t, x, spec=spec):
                return jnp.sum(hash_grid_lookup(t, x, spec) ** 2)

            bwd = jax.jit(lambda x, tab=tab, loss=loss: jax.grad(loss, argnums=(0, 1))(tab, x))
            t_b = bench(bwd, mk)
            print(json.dumps({
                "mode": mode, "L": L, "F": F, "log2T": log2T,
                "fwd_ms": round(t_f * 1e3, 2), "fwdbwd_ms": round(t_b * 1e3, 2),
                "fwd_Mpts_s": round(N / t_f / 1e6, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
