"""Trace the split fused op (fwd+bwd) and attribute device time per op.

nohup env MMS_SLOT_BWD_SPLIT=1 python scripts/split_profile.py > r5logs/split_profile.log 2>&1 &
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
sys.path.insert(0, "/root/repo")

from multimodalstudio_tpu.ops.pallas.slot_fused import fused_slot_sdf_chain
from multimodalstudio_tpu.ops.pallas.slot_grid import SlotGridSpec, make_table_init

N = int(os.environ.get("N", "65536"))
SPEC = SlotGridSpec(
    num_levels=6, min_res=16, max_res=512,
    rows_per_level=int(os.environ.get("ROWS", "4096")),
    layout="cell", gather="onehot", feats=2, table_dtype="bf16",
)
HID, NLAYERS, DOUT, PEF = 128, 3, 257, 6


def _params(key):
    d_in = 3 + 6 * PEF + SPEC.out_dim
    dims = [d_in] + [HID] * (NLAYERS - 1) + [DOUT]
    ks = jax.random.split(key, 2 * NLAYERS + 1)
    ws = [
        jax.random.normal(ks[i], (dims[i], dims[i + 1])) * (1.0 / np.sqrt(dims[i]))
        for i in range(NLAYERS)
    ]
    bs = [jax.random.normal(ks[NLAYERS + i], (dims[i + 1],)) * 0.01
          for i in range(NLAYERS)]
    table = make_table_init(SPEC)(ks[-1])
    return ws, bs, table


def main():
    ws, bs, table = _params(jax.random.key(0))
    pos0 = jax.random.uniform(jax.random.key(1), (N, 3), minval=-0.9, maxval=0.9)

    def loss(t, w, b, p):
        sdf, geo, grad = fused_slot_sdf_chain(
            p, t, w, b, SPEC, radius=1.0, num_frequencies=PEF,
            min_freq_exp=0.0, max_freq_exp=5.0, skip=(),
            activation="SoftplusQuad", beta=100.0,
        )
        eik = jnp.mean((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2)
        return jnp.mean(sdf**2) + 0.01 * jnp.mean(geo.astype(jnp.float32) ** 2) + eik

    @jax.jit
    def step(pos, t, w, b):
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(t, w, b, pos)
        newpos = pos + 1e-6 * grads[3][:, :3]
        # consume EVERY gradient so nothing is DCE'd out of the trace
        gsum = sum(jnp.vdot(g, g) for g in jax.tree_util.tree_leaves(grads[:3]))
        return newpos, val + 1e-30 * gsum

    pos = pos0
    for _ in range(3):
        pos, v = step(pos, table, ws, bs)
    jax.block_until_ready(pos)

    trace_dir = "/root/repo/prof_splitop"
    with jax.profiler.trace(trace_dir):
        for _ in range(4):
            pos, v = step(pos, table, ws, bs)
        jax.block_until_ready(pos)
    print("trace written", flush=True)

    import gzip, json, glob
    from collections import defaultdict
    hits = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(hits[0], "rt"))["traceEvents"]
    rows = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args", {}) or {}
        if not a:
            continue
        key = (e.get("name", "?")[:44], a.get("tf_op", "")[:80])
        rows[key] += e["dur"]
        cnt[key] += 1
    for (n, t), d in sorted(rows.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d/4000:8.3f} ms  x{cnt[(n,t)]//4:<3} {n:44} {t}")


if __name__ == "__main__":
    main()
