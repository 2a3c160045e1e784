"""Activation/dtype A/B on the SDF-shaped MLP: where do the non-matmul
cycles go?

Hypothesis (round 2): the mlp-method step is VPU-bound on f32 softplus —
the isolated fwdbwd runs at ~29 TFLOPs vs a ~100 TFLOP matmul roofline.
Sweeps {softplus, squareplus, relu} x {f32, bf16 activations} under
fwd / fwdbwd / eikonal-style jacfwd-under-grad. squareplus
(x + sqrt(x^2 + 4/beta^2))/2 is the algebraic softplus stand-in (no
transcendentals; Barron 2021).

nohup python scripts/act_ab.py > act_ab.log 2>&1 &
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
sys.path.insert(0, "/root/repo")

N = 327680
HID = 256
LAYERS = 8
IN = 39
OUT = 257
BETA = 100.0


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


def make_act(kind):
    if kind == "softplus":
        return lambda x: jax.nn.softplus(x * BETA) / BETA
    if kind == "squareplus":
        b = 4.0 / (BETA * BETA)
        return lambda x: 0.5 * (x + jnp.sqrt(x * x + b))
    if kind == "relu":
        return jax.nn.relu
    raise ValueError(kind)


def make_mlp(act, bf16_act):
    def mlp(params, x):
        h = x.astype(jnp.bfloat16) if bf16_act else x
        x0 = h
        out_t = jnp.bfloat16 if bf16_act else jnp.float32
        for l, (w, b) in enumerate(params):
            if l == 4:
                h = jnp.concatenate([h, x0], axis=-1) / jnp.sqrt(2.0).astype(out_t)
            h = jax.lax.dot_general(
                h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((h.ndim - 1,), (0,)), ((), ())), preferred_element_type=out_t,
            ) + b.astype(out_t)
            if l < LAYERS - 1:
                h = act(h)
        return h.astype(jnp.float32)

    return mlp


FLOP_FWD = 2 * sum(
    (IN + (IN if l == 4 else 0) if l == 0 else HID + (IN if l == 4 else 0))
    * (OUT if l == LAYERS - 1 else HID)
    for l in range(LAYERS)
) * N


def enc(p):
    freqs = 2.0 ** jnp.linspace(0.0, 5.0, 6)
    s = (p[..., None] * freqs).reshape(*p.shape[:-1], -1)
    return jnp.concatenate([p, jnp.sin(s), jnp.cos(s)], axis=-1)


def main():
    params = make_params(jax.random.key(0))
    key = jax.random.key(1)

    def mk(seed):
        return (jax.random.normal(jax.random.fold_in(key, seed), (N, IN)),)

    def mk3(seed):
        return (jax.random.normal(jax.random.fold_in(key, seed), (N, 3)),)

    results = {}

    def log(name, sec, flops):
        results[name] = {"ms": round(sec * 1e3, 2), "tflops": round(flops / sec / 1e12, 2)}
        print(json.dumps({"name": name, **results[name]}), flush=True)

    for kind in ("softplus", "squareplus", "relu"):
        for bf16_act in (False, True):
            tag = f"{kind}_{'bf16' if bf16_act else 'f32'}"
            mlp = make_mlp(make_act(kind), bf16_act)

            f_fwd = jax.jit(lambda x, mlp=mlp: mlp(params, x))
            log(f"fwd_{tag}", bench(f_fwd, mk), FLOP_FWD)

            loss = lambda p, x, mlp=mlp: jnp.sum(mlp(p, x) ** 2)
            f_vjp = jax.jit(lambda x, loss=loss: jax.grad(loss, argnums=(0, 1))(params, x))
            log(f"fwdbwd_{tag}", bench(f_vjp, mk), 3 * FLOP_FWD)

            # eikonal-style: jacfwd gradients under the outer parameter grad
            def loss_jac(p, x, mlp=mlp):
                def fs(q):
                    out = mlp(p, enc(q)[None, :])[0]
                    return out[0]

                g = jax.vmap(jax.jacfwd(fs))(x)
                return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2) + jnp.sum(
                    jax.vmap(fs)(x) ** 2
                )

            f_eik = jax.jit(
                lambda x, loss_jac=loss_jac: jax.grad(loss_jac)(params, x)
            )
            # jacfwd: 4x fwd FLOPs; under grad: ~3x that
            log(f"eik_{tag}", bench(f_eik, mk3), 12 * FLOP_FWD)

    with open("act_ab.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
