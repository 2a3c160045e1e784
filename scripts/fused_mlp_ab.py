"""A/B: fused Pallas MLP chain vs XLA jacfwd for the eikonal workload.

Replicates the profiled hot region of the mlp_raw_tpu train step — parameter
gradients THROUGH the SDF field's value+spatial-gradient computation at one
microbatch slice (N = rays x modalities x samples) — in both formulations:

  xla:   jax.vmap(jax.jacfwd(mlp)) under jax.grad (today's production path)
  fused: ops/pallas/fused_mlp.fused_chain with 3 input tangents under grad

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_mlp_ab.py
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

import jax.numpy as jnp
import numpy as np

from multimodalstudio_tpu.ops.pallas.fused_mlp import fused_chain
from multimodalstudio_tpu.fields.mlp import make_activation

L, H, DIN, DOUT = 8, 256, 39, 257
SKIP = (4,)
N = 163840  # 512 rays x 5 modalities x 64 samples


def make_params(key):
    ws, bs = [], []
    din = DIN
    ks = jax.random.split(key, 2 * L)
    for l in range(L):
        if l in SKIP:
            din = H + DIN
        dout = DOUT if l == L - 1 else H
        ws.append(jax.random.normal(ks[l], (din, dout)) * (1.0 / np.sqrt(din)))
        bs.append(jnp.zeros((dout,)))
        din = H
    return tuple(ws), tuple(bs)


def xla_loss(ws, bs, x):
    act = make_activation("SoftplusQuad", 100.0)

    def mlp_single(p):  # [DIN] -> scalar-ish outputs
        h = p
        x0 = p
        for l in range(L):
            if l in SKIP:
                h = jnp.concatenate([h, x0], -1) / np.sqrt(2.0)
            w = ws[l].astype(jnp.bfloat16)
            h = jax.lax.dot_general(
                h.astype(jnp.bfloat16)[None], w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )[0] + bs[l].astype(jnp.bfloat16)
            if l < L - 1:
                h = act(h)
        return h[0].astype(jnp.float32), h.astype(jnp.float32)

    def f_single(p):
        s, full = mlp_single(p)
        return s, full

    grads, full = jax.vmap(jax.jacfwd(f_single, has_aux=True))(x)
    return jnp.sum(jnp.abs(full)) + jnp.sum((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)


def fused_loss(ws, bs, x):
    eye = jnp.eye(DIN, dtype=jnp.float32)
    tx = jnp.broadcast_to(eye[:3, None, :], (3, x.shape[0], DIN))
    y, ty = fused_chain(
        x, list(ws), list(bs), skip=SKIP, activation="SoftplusQuad", beta=100.0,
        tangents=tx,
    )
    y = y.astype(jnp.float32)
    grads = ty[:, :, 0].astype(jnp.float32).T  # [N, 3] d sdf / dx
    return jnp.sum(jnp.abs(y)) + jnp.sum((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)


def bench(name, loss_fn, ws, bs, key):
    g = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    x = jax.random.normal(key, (N, DIN))
    out = g(ws, bs, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    compile_s = 0.0
    reps = 6
    times = []
    for i in range(reps):
        x = jax.random.normal(jax.random.fold_in(key, i), (N, DIN))
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        out = g(ws, bs, x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name}: median {med*1e3:.1f} ms over {reps} (min {min(times)*1e3:.1f})")
    return med


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    ws, bs = make_params(jax.random.key(0))
    k = jax.random.key(1)
    tf = bench("fused", fused_loss, ws, bs, k)
    tx = bench("xla-jacfwd", xla_loss, ws, bs, k)
    print(f"speedup: {tx/tf:.2f}x")
