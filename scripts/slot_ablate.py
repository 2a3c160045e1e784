"""Attribute slot-grid op time: XLA geometry vs Pallas kernel vs backward.

Chained-K device-time slopes (see slot_grid_bench.py for methodology).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/slot_ablate.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

from multimodalstudio_tpu.ops.pallas.slot_grid import (
    SlotGridSpec,
    _lookup_fn,
    make_table_init,
    slot_geometry,
)

N = 16384
SPEC = SlotGridSpec(num_levels=6, min_res=16, max_res=512, rows_per_level=2048)


def slope(make_step, tag, ks=(1, 5)):
    times = {}
    for K in ks:
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
            x = jax.random.uniform(
                jax.random.fold_in(k, rep), (N, 3), minval=0.01, maxval=0.97
            )
            t0 = time.perf_counter()
            r = f(x, table)
            _ = float(r[1])
            ts.append(time.perf_counter() - t0)
        times[K] = float(np.median(ts))
    sl = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    print(f"{tag}: {sl*1e3:.3f} ms/op -> {N/sl/1e6:.2f} M samples/s", flush=True)


def geometry_only(x, table):
    idx, w, dw = slot_geometry(x, SPEC)
    nx = jnp.clip(x + w[:, :3] * 1e-7 + idx[:, :3].astype(jnp.float32) * 1e-9,
                  0.01, 0.97)
    return nx, jnp.sum(w[0]) + jnp.sum(dw[0, 0])


def kernel_only_tang(x, table):
    idx, w, dw = slot_geometry(x, SPEC)
    idx = jax.lax.stop_gradient(idx)
    op = _lookup_fn(SPEC.num_levels, SPEC.total_rows, 128, False, 3)
    enc, tenc = op(table, idx, w, dw)
    nx = jnp.clip(x + enc[:, :3] * 1e-6, 0.01, 0.97)
    return nx, jnp.sum(enc[0]) + jnp.sum(tenc[0, 0])


def kernel_only_plain(x, table):
    idx, w, dw = slot_geometry(x, SPEC)
    op = _lookup_fn(SPEC.num_levels, SPEC.total_rows, 128, False, 0)
    enc = op(table, idx, w)
    nx = jnp.clip(x + enc[:, :3] * 1e-6, 0.01, 0.97)
    return nx, jnp.sum(enc[0])


def bwd_only(x, table):
    """Cost of the backward kernel body: call the bwd pallas_call directly."""
    from multimodalstudio_tpu.ops.pallas.slot_grid import _build_calls, _sum_matrices

    idx, w, dw = slot_geometry(x, SPEC)
    s1, s2 = _sum_matrices(SPEC.num_levels)
    _, bwd_call = _build_calls(SPEC.num_levels, 3, SPEC.total_rows, 128, N, False)
    genc = jnp.ones((N, SPEC.out_dim), jnp.float32)
    gtenc = jnp.ones((3, N, SPEC.out_dim), jnp.float32)
    d_table, d_w, d_dw = bwd_call(
        idx, w, dw, genc, gtenc, table, jnp.asarray(s1), jnp.asarray(s2)
    )
    nx = jnp.clip(x + d_w[:, :3] * 1e-7, 0.01, 0.97)
    return nx, jnp.sum(d_table[0]) + jnp.sum(d_w[0]) + jnp.sum(d_dw[0, 0])


if __name__ == "__main__":
    slope(geometry_only, "geometry_only")
    slope(kernel_only_plain, "geom+kernel_plain")
    slope(kernel_only_tang, "geom+kernel_tang")
    slope(bwd_only, "geom+bwd_kernel")
