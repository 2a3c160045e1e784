"""Device-time slope benchmark for the production slot-grid op on v5e.

Chained-K methodology (the tunnel's block_until_ready is async — single
dispatch wall-times are meaningless): run K dependency-chained ops inside
one jit, fetch a scalar, and difference two K values.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/slot_grid_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

from multimodalstudio_tpu.ops.pallas.slot_grid import (
    SlotGridSpec,
    make_table_init,
    slot_grid_lookup,
)

import os

N = int(os.environ.get("N", "16384"))
SPEC = SlotGridSpec(
    num_levels=int(os.environ.get("LEVELS", "6")),
    min_res=16,
    max_res=int(os.environ.get("MAXRES", "512")),
    rows_per_level=int(os.environ.get("ROWS", "2048")),  # ENTRY budget
    layout=os.environ.get("LAYOUT", "vertex"),
    gather=os.environ.get("GATHER", "auto"),
    feats=int(os.environ.get("FEATS", "16")),
    table_dtype=os.environ.get("TDT", "f32"),
)
BLOCK = int(os.environ.get("BLOCK", "0"))


def slope(make_step, tag):
    times = {}
    for K in (1, 5):
        @jax.jit
        def f(x, table, _K=K):
            acc = jnp.float32(0)
            for _ in range(_K):
                x, v = make_step(x, table)
                acc = acc + v
            return x, acc

        k = jax.random.PRNGKey(K)
        table = make_table_init(SPEC)(jax.random.PRNGKey(0)) * 1e3
        x = jax.random.uniform(k, (N, 3), minval=0.01, maxval=0.97)
        r = f(x, table); float(r[1])
        ts = []
        for rep in range(4):
            x = jax.random.uniform(jax.random.fold_in(k, rep), (N, 3), minval=0.01, maxval=0.97)
            t0 = time.perf_counter()
            r = f(x, table)
            _ = float(r[1])
            ts.append(time.perf_counter() - t0)
        times[K] = float(np.median(ts))
        print(f"  {tag} K={K}: {times[K]*1e3:.2f} ms", flush=True)
    sl = (times[5] - times[1]) / 4
    print(f"{tag}: {sl*1e3:.3f} ms/op -> {N/sl/1e6:.2f} M samples/s", flush=True)


def fwd_tang(x, table):
    enc, tenc = slot_grid_lookup(table, x, SPEC, with_tangents=True, block=BLOCK)
    nx = jnp.clip(x + enc[:, :3] * 1e-6, 0.01, 0.97)
    return nx, jnp.sum(enc[0]) + jnp.sum(tenc[0, 0])


def fwd_plain(x, table):
    enc = slot_grid_lookup(table, x, SPEC, block=BLOCK)
    nx = jnp.clip(x + enc[:, :3] * 1e-6, 0.01, 0.97)
    return nx, jnp.sum(enc[0])


def fwd_bwd(x, table):
    def loss(t, q):
        enc, tenc = slot_grid_lookup(t, q, SPEC, with_tangents=True, block=BLOCK)
        return jnp.sum(enc * enc) + jnp.sum(tenc * tenc) * 1e-6

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(table, x)
    nx = jnp.clip(x + grads[1] * 1e-9, 0.01, 0.97)
    return nx, val + jnp.sum(grads[0][0])


if __name__ == "__main__":
    print(f"table rows={SPEC.total_rows} ({SPEC.total_rows*512/2**20:.1f} MB f32)",
          flush=True)
    slope(fwd_plain, "fwd_plain_L6")
    slope(fwd_tang, "fwd_tang_L6")
    slope(fwd_bwd, "fwd_bwd_tang_L6")
