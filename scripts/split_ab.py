"""A/B the split backward (MMS_SLOT_BWD_SPLIT) against the merged kernel.

CPU interpret mode; run twice in one process by rebuilding the op with the
env flag toggled (the spec carries bwd_split, so the lru_cache keys differ).
"""

import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from multimodalstudio_tpu.fields.fields import NeRFEncodingSpec
from multimodalstudio_tpu.ops.pallas.slot_fused import fused_slot_sdf_chain
from multimodalstudio_tpu.ops.pallas.slot_grid import SlotGridSpec, make_table_init

PE = NeRFEncodingSpec(num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0,
                      include_input=True)
R = 1.0
HID, D_OUT = 128, 65


def _rel(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def run(gspec, skip):
    d_in = 3 + 6 * PE.num_frequencies + gspec.out_dim
    key = jax.random.key(0)
    ks = jax.random.split(key, 7)
    hid_in = d_in + HID if False else HID
    ws = [
        jax.random.normal(ks[0], (d_in, HID)) * 0.3,
        jax.random.normal(ks[1], (HID + (d_in if 1 in skip else 0), HID)) * 0.3,
        jax.random.normal(ks[2], (HID + (d_in if 2 in skip else 0), D_OUT)) * 0.3,
    ]
    bs = [
        jax.random.normal(ks[3], (HID,)) * 0.1,
        jax.random.normal(ks[4], (HID,)) * 0.1,
        jax.random.normal(ks[5], (D_OUT,)) * 0.1,
    ]
    table = make_table_init(gspec)(ks[6]) * 1e4
    pos = jax.random.uniform(jax.random.split(key)[0], (29, 3),
                             minval=-0.9, maxval=0.9)

    def loss(p, t, w, b):
        sdf, geo, grad = fused_slot_sdf_chain(
            p, t, w, b, gspec, radius=R,
            num_frequencies=PE.num_frequencies, min_freq_exp=PE.min_freq_exp,
            max_freq_exp=PE.max_freq_exp, skip=skip,
            activation="SoftplusQuad", beta=100.0, block=8,
        )
        return (
            jnp.sum(sdf * jnp.cos(sdf))
            + jnp.sum(geo.astype(jnp.float32) ** 2) * 0.01
            + jnp.sum((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
        )

    grads = {}
    for mode in ("0", "1"):
        os.environ["MMS_SLOT_BWD_SPLIT"] = mode
        v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(pos, table, ws, bs)
        grads[mode] = (v, g)
    v0, g0 = grads["0"]
    v1, g1 = grads["1"]
    names = ["d_pos", "d_table", "d_ws", "d_bs"]
    print(f"  value: merged={float(v0):.6f} split={float(v1):.6f} rel={_rel(v1, v0):.2e}")
    ok = True
    for n, a, b in zip(names, g1, g0):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        r = max(_rel(x, y) for x, y in zip(la, lb))
        print(f"  {n}: rel={r:.2e}")
        ok &= r < (1e-2 if n == "d_bs" else 2e-3)  # gb sums the bf16 gz stack
    return ok


def run_value(gspec, skip, num_levels=None):
    from multimodalstudio_tpu.ops.pallas.slot_fused import fused_slot_sdf_value

    d_in = 3 + 6 * PE.num_frequencies + gspec.out_dim
    key = jax.random.key(1)
    ks = jax.random.split(key, 7)
    ws = [
        jax.random.normal(ks[0], (d_in, HID)) * 0.3,
        jax.random.normal(ks[1], (HID + (d_in if 1 in skip else 0), HID)) * 0.3,
        jax.random.normal(ks[2], (HID + (d_in if 2 in skip else 0), D_OUT)) * 0.3,
    ]
    bs = [
        jax.random.normal(ks[3], (HID,)) * 0.1,
        jax.random.normal(ks[4], (HID,)) * 0.1,
        jax.random.normal(ks[5], (D_OUT,)) * 0.1,
    ]
    table = make_table_init(gspec)(ks[6]) * 1e4
    pos = jax.random.uniform(jax.random.split(key)[0], (29, 3),
                             minval=-0.9, maxval=0.9)

    def loss(p, t, w, b):
        sdf = fused_slot_sdf_value(
            p, t, w, b, gspec, radius=R,
            num_frequencies=PE.num_frequencies, min_freq_exp=PE.min_freq_exp,
            max_freq_exp=PE.max_freq_exp, skip=skip,
            activation="SoftplusQuad", beta=100.0, block=8,
            num_levels=num_levels,
        )
        return jnp.sum(sdf * jnp.sin(sdf * 3.0))

    grads = {}
    for mode in ("0", "1"):
        os.environ["MMS_SLOT_BWD_SPLIT"] = mode
        grads[mode] = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(pos, table, ws, bs)
    v0, g0 = grads["0"]
    v1, g1 = grads["1"]
    print(f"  value: rel={_rel(v1, v0):.2e}")
    ok = True
    for n, a, b in zip(["d_pos", "d_table", "d_ws", "d_bs"], g1, g0):
        la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        r = max(_rel(x, y) for x, y in zip(la, lb))
        print(f"  {n}: rel={r:.2e}")
        ok &= r < (1e-2 if n == "d_bs" else 2e-3)  # gb sums the bf16 gz stack
    return ok


ok = True
for name, gspec in {
    "f16": SlotGridSpec(num_levels=3, min_res=4, max_res=16, rows_per_level=64,
                        layout="cell"),
    "p2_bf16": SlotGridSpec(num_levels=3, min_res=4, max_res=16,
                            rows_per_level=64, layout="cell", gather="onehot",
                            feats=2, table_dtype="bf16"),
}.items():
    for skip in ((), (1,)):
        print(f"=== {name} skip={skip} ===")
        ok &= run(gspec, skip)
        print(f"=== value {name} skip={skip} ===")
        ok &= run_value(gspec, skip)
        if name == "p2_bf16":
            print(f"=== value {name} skip={skip} truncated K=2 ===")
            ok &= run_value(gspec, skip, num_levels=2)
print("SPLIT_AB", "PASS" if ok else "FAIL")
