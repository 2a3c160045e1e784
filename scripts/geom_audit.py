"""Tight numeric audit of the in-kernel slot geometry fold.

Compares the fused kernels' position/table gradients against the
slot_grid_lookup + fused_chain_adjoint composition PER COMPONENT at many
points (interior, near cell faces, outside the radius) — the unit test's
2e-2 norm tolerance could hide a small systematic error that costs dB
over a training run. CPU interpret mode.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_cpu")
import jax.numpy as jnp
import numpy as np

from multimodalstudio_tpu.fields.fields import NeRFEncodingSpec
from multimodalstudio_tpu.ops.pallas.fused_mlp import fused_chain_adjoint
from multimodalstudio_tpu.ops.pallas.slot_fused import fused_slot_sdf_chain
from multimodalstudio_tpu.ops.pallas.slot_grid import (
    SlotGridSpec, make_table_init, slot_grid_lookup,
)

GSPEC = SlotGridSpec(num_levels=3, min_res=4, max_res=16, rows_per_level=64,
                     layout="cell")
PE = NeRFEncodingSpec(num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0,
                      include_input=True)
D_IN = 3 + 6 * PE.num_frequencies + GSPEC.out_dim
HID, D_OUT = 128, 65
R = 1.0

ks = jax.random.split(jax.random.key(0), 7)
ws = [jax.random.normal(ks[0], (D_IN, HID)) * 0.3,
      jax.random.normal(ks[1], (HID, HID)) * 0.3,
      jax.random.normal(ks[2], (HID, D_OUT)) * 0.3]
bs = [jax.random.normal(ks[3], (HID,)) * 0.1,
      jax.random.normal(ks[4], (HID,)) * 0.1,
      jax.random.normal(ks[5], (D_OUT,)) * 0.1]
table = make_table_init(GSPEC)(ks[6]) * 1e4

# point population: interior + near-face + outside
n = 160
p_int = jax.random.uniform(jax.random.key(1), (n, 3), minval=-0.9, maxval=0.9)
# points close to level-0 cell faces (res 4 -> faces at x = -1 + k/2)
faces = (jax.random.randint(jax.random.key(2), (n, 3), 0, 8).astype(jnp.float32) / 4.0
         - 1.0 + jax.random.uniform(jax.random.key(3), (n, 3), minval=-1e-3, maxval=1e-3))
p_out = jax.random.uniform(jax.random.key(4), (n, 3), minval=-1.4, maxval=1.4)
POPS = {"interior": p_int, "near-face": jnp.clip(faces, -0.999, 0.999), "wide": p_out}


def reference(ws, bs, table, pos):
    rescaled = jnp.clip((pos + R) / (2 * R), 0.0, 1.0 - 1e-6)
    enc_g, tenc_g = slot_grid_lookup(table, rescaled, GSPEC, with_tangents=True)
    tenc_g = tenc_g / (2 * R)
    enc_fn = lambda p: PE.apply(p)[:, 3:]
    tangs = []
    for k in range(3):
        e = jnp.zeros_like(pos).at[:, k].set(1.0)
        pe, t = jax.jvp(enc_fn, (pos,), (e,))
        tangs.append(t)
    x_in = jnp.concatenate([pos, pe, enc_g], axis=-1)
    tx = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3)[:, None, :], (3, pos.shape[0], 3)),
         jnp.stack(tangs), tenc_g], axis=-1)
    y, adj = fused_chain_adjoint(x_in, ws, bs, skip=(), activation="SoftplusQuad",
                                 beta=100.0, channel=0)
    grad = jnp.sum(adj[None] * tx.astype(jnp.float32), axis=-1)
    y = y.astype(jnp.float32)
    return y[:, 0], y[:, 1:], grad.T


def fused(ws, bs, table, pos):
    sdf, geo, grad = fused_slot_sdf_chain(
        pos, table, ws, bs, GSPEC, radius=R,
        num_frequencies=PE.num_frequencies, min_freq_exp=PE.min_freq_exp,
        max_freq_exp=PE.max_freq_exp, skip=(), activation="SoftplusQuad",
        beta=100.0, block=8)
    return sdf, geo.astype(jnp.float32), grad


def loss(fn, ws, bs, table, pos, c1, c3):
    s, g, d = fn(ws, bs, table, pos)
    return jnp.sum(c1 * s) + jnp.sum(c3 * d)


for name, pos in POPS.items():
    npts = pos.shape[0]
    c1 = jax.random.normal(jax.random.key(5), (npts,))
    c3 = jax.random.normal(jax.random.key(6), (npts, 3))
    g1 = jax.grad(lambda *a: loss(fused, *a, c1, c3), argnums=(2, 3))(ws, bs, table, pos)
    g2 = jax.grad(lambda *a: loss(reference, *a, c1, c3), argnums=(2, 3))(ws, bs, table, pos)
    # forward agreement
    s1, _, d1 = fused(ws, bs, table, pos)
    s2, _, d2 = reference(ws, bs, table, pos)
    for lbl, a, b in [("sdf", s1, s2), ("grad3", d1, d2),
                      ("d_table", g1[0], g2[0]), ("d_pos", g1[1], g2[1])]:
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(b) + 1e-3 * (np.abs(b).max() + 1e-12)
        relmax = np.max(np.abs(a - b) / denom)
        relnorm = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
        print(f"{name:9s} {lbl:8s} relnorm {relnorm:.2e}  relmax {relmax:.2e}")
print("AUDIT_DONE")
