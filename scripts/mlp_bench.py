"""On-device MLP formulation study: where does the mlp-method step time go?

Benchmarks the SDF-field-shaped MLP (8 layers x 256, skip at 4, softplus)
under: plain XLA forward, XLA fwd+bwd, XLA vmap(jacfwd) fwd (+bwd), and
numerical-tap gradients — all bf16 compute.

nohup python scripts/mlp_bench.py > mlp_bench.log 2>&1 &
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
sys.path.insert(0, "/root/repo")

N = 327680  # samples per microbatch slice in the round-2 profile
HID = 256
LAYERS = 8
IN = 39  # posenc(6 freqs)+3
OUT = 257


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


def make_params(key):
    dims = []
    d_in = IN
    for l in range(LAYERS):
        d_out = OUT if l == LAYERS - 1 else HID
        k_in = d_in + IN if l == 4 else d_in
        dims.append((k_in, d_out))
        d_in = d_out
    ks = jax.random.split(key, LAYERS)
    return [
        (jax.random.normal(k, d) * 0.05, jnp.zeros((d[1],))) for k, d in zip(ks, dims)
    ]


def softplus(x, beta=100.0):
    return jax.nn.softplus(x * beta) / beta


def mlp(params, x):
    """x [*, IN] -> [*, OUT], bf16 matmuls, skip at layer 4."""
    h = x
    for l, (w, b) in enumerate(params):
        if l == 4:
            h = jnp.concatenate([h, x], axis=-1) / jnp.sqrt(2.0)
        h = jax.lax.dot_general(
            h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((h.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + b
        if l < LAYERS - 1:
            h = softplus(h)
    return h


FLOP_FWD = 2 * sum(
    (IN + (IN if l == 4 else 0) if l == 0 else HID + (IN if l == 4 else 0))
    * (OUT if l == LAYERS - 1 else HID)
    for l in range(LAYERS)
) * N


def main():
    params = make_params(jax.random.key(0))
    key = jax.random.key(1)

    def mk(seed):
        return (jax.random.normal(jax.random.fold_in(key, seed), (N, IN)),)

    results = {}

    def log(name, sec, flops):
        results[name] = {"ms": round(sec * 1e3, 2), "tflops": round(flops / sec / 1e12, 2)}
        print(json.dumps({"name": name, **results[name]}), flush=True)

    # 1. plain forward
    f_fwd = jax.jit(lambda x: mlp(params, x))
    log("xla_fwd", bench(f_fwd, mk), FLOP_FWD)

    # 2. fwd+bwd (value_and_grad wrt params and x)
    loss = lambda p, x: jnp.sum(mlp(p, x) ** 2)
    f_vjp = jax.jit(lambda x: jax.grad(loss, argnums=(0, 1))(params, x))
    log("xla_fwdbwd", bench(f_vjp, mk), 3 * FLOP_FWD)

    # 3. vmap(jacfwd) value+grad (the current SDF-gradient path). Input is
    # [N, 3] raw positions; encode inline so tangents are wrt 3 dims.
    def enc(p):
        freqs = 2.0 ** jnp.linspace(0.0, 5.0, 6)
        s = (p[..., None] * freqs).reshape(*p.shape[:-1], -1)
        return jnp.concatenate([p, jnp.sin(s), jnp.cos(s)], axis=-1)

    def f_single(p):
        out = mlp(params, enc(p)[None, :])[0]
        return out[0], out

    f_jac = jax.jit(lambda x: jax.vmap(jax.jacfwd(f_single, has_aux=True))(x))

    def mk3(seed):
        return (jax.random.normal(jax.random.fold_in(key, seed), (N, 3)),)

    log("xla_jacfwd_fwd", bench(f_jac, mk3), 4 * FLOP_FWD)

    # 4. jacfwd under outer grad (eikonal-style): grad wrt params of |grad|
    def loss_jac(p, x):
        def fs(q):
            out = mlp(p, enc(q)[None, :])[0]
            return out[0]
        g = jax.vmap(jax.jacfwd(fs))(x)
        return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2) + jnp.sum(
            jax.vmap(fs)(x) ** 2
        )

    f_jacbwd = jax.jit(lambda x: jax.grad(loss_jac)(params, x))
    log("xla_jacfwd_fwdbwd", bench(f_jacbwd, mk3), 12 * FLOP_FWD)

    # 5. numerical 4-tap gradients: 5 forward evals (center + 4 taps), then
    # outer grad — all plain VJPs
    TAPS = jnp.asarray(
        [[1.0, -1.0, -1.0], [-1.0, -1.0, 1.0], [-1.0, 1.0, -1.0], [1.0, 1.0, 1.0]]
    ) * (1e-3 / jnp.sqrt(3.0))

    def loss_taps(p, x):
        pts = jnp.concatenate([x[:, None, :] + TAPS, x[:, None, :]], axis=1)  # [N,5,3]
        vals = mlp(p, enc(pts.reshape(-1, 3)))[:, 0].reshape(-1, 5)
        g = (vals[:, :4, None] * (TAPS / (4.0 * (1e-3 / jnp.sqrt(3.0)) ** 2 * 3))).sum(1)
        return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2) + jnp.sum(vals[:, 4] ** 2)

    f_taps = jax.jit(lambda x: jax.grad(loss_taps)(params, x))
    log("xla_4tap_fwdbwd", bench(f_taps, mk3), 15 * FLOP_FWD)

    with open("mlp_bench.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
