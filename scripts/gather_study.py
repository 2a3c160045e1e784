"""On-device study of hash-grid gather strategies (round-2 kernel design).

Measures throughput of every plausible TPU formulation of the hash-encode
gather/scatter so the Pallas/XLA design is grounded in data, not guesses.
Fresh indices every rep (tunnel memoizes identical (executable, args) pairs).

Run detached:  nohup python scripts/gather_study.py > gather_study.log 2>&1 &
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")


def bench(fn, make_args, reps=5, inner=4):
    """median time of fn over fresh args; returns seconds/call."""
    # compile
    args = make_args(0)
    jax.block_until_ready(fn(*args))
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
    results = {}
    L, F = 16, 2
    N = 65536  # query points
    M = L * 8 * N  # gathered rows per feature (8.4M)

    def log(name, sec, elems, extra=""):
        rate = elems / sec
        results[name] = {"sec": sec, "elems_per_s": rate}
        print(json.dumps({"name": name, "sec": round(sec, 5),
                          "Melems_per_s": round(rate / 1e6, 2), "extra": extra}),
              flush=True)

    key = jax.random.key(0)

    for log2T in (19, 15):
        T = 2 ** log2T
        table = jax.random.normal(jax.random.key(1), (L * T, F), jnp.float32)
        tflat = table[:, 0]

        def idx_maker(seed):
            k = jax.random.fold_in(key, seed)
            return (jax.random.randint(k, (M,), 0, L * T, jnp.int32),)

        # 1. flat 1-D element take (current formulation, per feature)
        f1 = jax.jit(lambda i: jnp.take(tflat, i))
        log(f"take_1d_T2^{log2T}", bench(f1, idx_maker), M)

        # 2. row take from [LT, 2]
        f2 = jax.jit(lambda i: jnp.take(table, i, axis=0))
        log(f"take_rows_f2_T2^{log2T}", bench(f2, idx_maker), M)

        # 3. sorted indices (locality)
        def idx_sorted(seed):
            k = jax.random.fold_in(key, seed)
            i = jax.random.randint(k, (M,), 0, L * T, jnp.int32)
            return (jnp.sort(i),)
        log(f"take_1d_sorted_T2^{log2T}", bench(f1, idx_sorted), M,
            "sort excluded from timing")

        # 4. scatter-add (backward primitive)
        upd = jnp.ones((M,), jnp.float32)
        f4 = jax.jit(lambda i: jnp.zeros((L * T,), jnp.float32).at[i].add(upd))
        log(f"scatter_add_1d_T2^{log2T}", bench(f4, idx_maker), M)

    # 5. row take from a 128-wide table (padded rows)
    T = 2 ** 15
    table128 = jax.random.normal(jax.random.key(1), (T, 128), jnp.float32)
    M5 = 2 ** 20
    def idx5(seed):
        k = jax.random.fold_in(key, seed)
        return (jax.random.randint(k, (M5,), 0, T, jnp.int32),)
    f5 = jax.jit(lambda i: jnp.take(table128, i, axis=0))
    log("take_rows_f128_T2^15", bench(f5, idx5), M5, "128 f32 per row")

    # 6. one-hot matmul gathers at small T (bf16 MXU)
    for T in (1024, 2048, 8192):
        tab = jax.random.normal(jax.random.key(1), (T, 128), jnp.bfloat16)
        Nq = 2 ** 17
        def idx6(seed, T=T):
            k = jax.random.fold_in(key, seed)
            return (jax.random.randint(k, (Nq,), 0, T, jnp.int32),)
        def onehot_mm(i, tab=tab, T=T):
            oh = jax.nn.one_hot(i, T, dtype=jnp.bfloat16)
            return jax.lax.dot_general(oh, tab, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        f6 = jax.jit(onehot_mm)
        log(f"onehot_mm_T{T}", bench(f6, idx6), Nq, f"{Nq} queries x {T} rows x 128f bf16")

    # 7. full hash encode fwd / fwd+bwd at N points (the real op)
    from multimodalstudio_tpu.ops.encodings import HashGridSpec, hash_grid_lookup

    for log2T, vjp in ((19, "custom"), (19, "autodiff"), (15, "custom")):
        spec = HashGridSpec(log2_hashmap_size=log2T, max_res=1024, vjp_mode=vjp)
        tab = jax.random.normal(jax.random.key(1), (L * spec.table_size, F), jnp.float32) * 0.1
        def mk(seed):
            k = jax.random.fold_in(key, seed)
            return (jax.random.uniform(k, (N, 3)),)
        fwd = jax.jit(lambda x, tab=tab, spec=spec: hash_grid_lookup(tab, x, spec))
        log(f"encode_fwd_T2^{log2T}_{vjp}", bench(fwd, mk), N, f"{N} pts, 16 lvls")
        def loss(t, x, spec=spec):
            return jnp.sum(hash_grid_lookup(t, x, spec) ** 2)
        bwd = jax.jit(lambda x, tab=tab: jax.grad(loss, argnums=(0, 1))(tab, x))
        log(f"encode_fwdbwd_T2^{log2T}_{vjp}", bench(bwd, mk), N)

    with open("gather_study.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
