"""Device-time slope benchmark for the PRODUCTION fused slot+MLP SDF op.

The raw slot-op microbench (slot_grid_bench.py) stopped being predictive
once its XLA-side weight-cotangent fold began to dominate; this benches
`fused_slot_sdf_chain` exactly as the training step uses it (grads wrt
table + weights + positions, eikonal-style loss), with the chained-K
methodology (distinct inputs defeat the tunnel memoizer; slope over K
removes dispatch fixed costs).

Decomposition ladder (env knobs):
  ROWS    per-level ENTRY budget (gather cost ~ physical rows = ROWS*8F/128)
  FEATS   feats/entry (packing factor P = 128/(8F))
  TDT     f32 | bf16 table
  LEVELS / MAXRES   pyramid shape
  HID / NLAYERS / DOUT   chain shape (HID=16 isolates the gather+geometry)
  PEF     NeRF encoding frequencies (0 isolates the encoding phase)
  BLOCK   kernel block size
  MODE    fwd | fwdbwd (default both)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/slot_fused_bench.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

from multimodalstudio_tpu.ops.pallas.slot_fused import fused_slot_sdf_chain
from multimodalstudio_tpu.ops.pallas.slot_grid import SlotGridSpec, make_table_init

N = int(os.environ.get("N", "65536"))
SPEC = SlotGridSpec(
    num_levels=int(os.environ.get("LEVELS", "6")),
    min_res=16,
    max_res=int(os.environ.get("MAXRES", "512")),
    rows_per_level=int(os.environ.get("ROWS", "4096")),  # ENTRY budget
    layout="cell",
    gather="onehot",
    feats=int(os.environ.get("FEATS", "2")),
    table_dtype=os.environ.get("TDT", "bf16"),
)
BLOCK = int(os.environ.get("BLOCK", "0"))
HID = int(os.environ.get("HID", "128"))
NLAYERS = int(os.environ.get("NLAYERS", "3"))
DOUT = int(os.environ.get("DOUT", "257"))
PEF = int(os.environ.get("PEF", "6"))
MODE = os.environ.get("MODE", "both")


def _params(key):
    d_in = 3 + 6 * PEF + SPEC.out_dim
    dims = [d_in] + [HID] * (NLAYERS - 1) + [DOUT]
    ks = jax.random.split(key, 2 * NLAYERS + 1)
    ws = [
        jax.random.normal(ks[i], (dims[i], dims[i + 1])) * (1.0 / np.sqrt(dims[i]))
        for i in range(NLAYERS)
    ]
    bs = [jax.random.normal(ks[NLAYERS + i], (dims[i + 1],)) * 0.05 for i in range(NLAYERS)]
    table = make_table_init(SPEC)(ks[-1]) * 1e3
    return ws, bs, table


def _call(pos, table, ws, bs):
    return fused_slot_sdf_chain(
        pos, table, ws, bs, SPEC, radius=1.0,
        num_frequencies=PEF, min_freq_exp=0.0, max_freq_exp=5.0,
        skip=(), activation="SoftplusQuad", beta=100.0, block=BLOCK,
    )


def fwd(pos, table, ws, bs):
    sdf, geo, grad = _call(pos, table, ws, bs)
    npos = jnp.clip(pos + grad * 1e-9, -0.9, 0.9)
    return npos, jnp.sum(sdf) + jnp.sum(geo[0].astype(jnp.float32)) + jnp.sum(grad[0])


def fwdbwd(pos, table, ws, bs):
    def loss(t, w, b, p):
        sdf, geo, grad = _call(p, t, w, b)
        eik = jnp.mean((jnp.linalg.norm(grad + 1e-8, axis=-1) - 1.0) ** 2)
        return jnp.mean(sdf**2) + 1e-3 * jnp.mean(geo.astype(jnp.float32) ** 2) + eik

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(table, ws, bs, pos)
    npos = jnp.clip(pos + grads[3] * 1e-9, -0.9, 0.9)
    return npos, val + jnp.sum(grads[0][0].astype(jnp.float32)) + jnp.sum(grads[1][0][0])


def slope(step, tag):
    times = {}
    for K in (1, 5):
        @jax.jit
        def f(pos, table, ws, bs, _K=K):
            acc = jnp.float32(0)
            for _ in range(_K):
                pos, v = step(pos, table, ws, bs)
                acc = acc + v
            return pos, acc

        ws, bs, table = _params(jax.random.PRNGKey(0))
        k = jax.random.PRNGKey(K)
        pos = jax.random.uniform(k, (N, 3), minval=-0.9, maxval=0.9)
        r = f(pos, table, ws, bs); float(r[1])
        ts = []
        for rep in range(4):
            pos = jax.random.uniform(
                jax.random.fold_in(k, rep), (N, 3), minval=-0.9, maxval=0.9
            )
            t0 = time.perf_counter()
            r = f(pos, table, ws, bs)
            _ = float(r[1])
            ts.append(time.perf_counter() - t0)
        times[K] = float(np.median(ts))
        print(f"  {tag} K={K}: {times[K]*1e3:.2f} ms", flush=True)
    sl = (times[5] - times[1]) / 4
    print(f"{tag}: {sl*1e3:.3f} ms/op -> {N/sl/1e6:.2f} M samples/s", flush=True)


if __name__ == "__main__":
    prows = SPEC.total_rows
    print(
        f"entries/level={SPEC.rows_per_level} feats={SPEC.feats} "
        f"dtype={SPEC.table_dtype} physical rows total={prows} "
        f"levels={SPEC.num_levels} mlp={NLAYERS}x{HID}->{DOUT} pe={PEF} "
        f"block={BLOCK or 'default'} N={N}",
        flush=True,
    )
    if MODE in ("fwd", "both"):
        slope(fwd, "fused_fwd")
    if MODE in ("fwdbwd", "both"):
        slope(fwdbwd, "fused_fwdbwd")
