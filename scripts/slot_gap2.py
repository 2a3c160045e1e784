"""Chained-slope re-measurement of slot_gap.py variants + correctness.

slot_gap.py per-call timing showed P0/P1 at 250M samples/s — impossible
(3 TB/s HBM). Chained carries (next call's w derives from this call's
output) force true serialization; K=1 vs K=5 slope removes fixed dispatch.
Also cross-checks P0's fat output against P2's compacted enc.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/slot_gap2.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

from multimodalstudio_tpu.ops.pallas.slot_grid import _sum_matrices  # noqa: E402
from scripts.slot_gap import (  # noqa: E402
    BLOCK,
    LEVELS,
    N,
    NT,
    ROWS,
    WCOLS,
    build,
)

LANE = 128


def slope(make_step, tag, ks=(1, 5)):
    times = {}
    key = jax.random.PRNGKey(7)
    tbl = jax.random.normal(jax.random.PRNGKey(1), (ROWS, LANE), jnp.float32)
    idx = jax.random.randint(key, (N, WCOLS), 0, ROWS, jnp.int32)
    dw = jax.random.normal(key, (3, N, WCOLS), jnp.float32)
    for K in ks:

        @jax.jit
        def f(w, idx, dw, tbl, _K=K):
            acc = jnp.float32(0)
            for _ in range(_K):
                w, v = make_step(w, idx, dw, tbl)
                acc = acc + v
            return w, acc

        w = jax.random.uniform(key, (N, WCOLS), jnp.float32)
        r = f(w, idx, dw, tbl)
        jax.block_until_ready(r)
        ts = []
        for rep in range(4):
            w = jax.random.uniform(
                jax.random.fold_in(key, rep), (N, WCOLS), jnp.float32
            )
            t0 = time.perf_counter()
            r = f(w, idx, dw, tbl)
            _ = float(r[1])
            ts.append(time.perf_counter() - t0)
        times[K] = float(np.median(ts))
        print(f"  {tag} K={K}: {times[K]*1e3:.2f} ms", flush=True)
    sl = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
    print(f"{tag}: {sl*1e3:.3f} ms/op -> {N/sl/1e6:.2f} M samples/s", flush=True)


def main():
    p0 = build("P0")
    p2 = build("P2")
    s1, _ = _sum_matrices(LEVELS)
    s1j = jnp.asarray(s1)

    def step_p0(w, idx, dw, tbl):
        out = p0(idx, w, dw, tbl)
        nw = w + out[:, :WCOLS] * 1e-12
        return nw, jnp.sum(out[0, :8])

    def step_p2(w, idx, dw, tbl):
        enc, tenc = p2(idx, w, dw, tbl, s1j)
        nw = w + enc[:, :WCOLS] * 1e-12
        return nw, jnp.sum(enc[0, :8]) + jnp.sum(tenc[0, 0, :8])

    # correctness: P0 fat -> compact == P2 enc/tenc
    key = jax.random.PRNGKey(3)
    tbl = jax.random.normal(jax.random.PRNGKey(1), (ROWS, LANE), jnp.float32)
    idx = jax.random.randint(key, (N, WCOLS), 0, ROWS, jnp.int32)
    w = jax.random.uniform(key, (N, WCOLS), jnp.float32)
    dw = jax.random.normal(key, (3, N, WCOLS), jnp.float32)
    fat = np.asarray(jax.jit(p0)(idx, w, dw, tbl))
    enc, tenc = jax.jit(lambda *a: p2(*a, s1j))(idx, w, dw, tbl)
    enc, tenc = np.asarray(enc), np.asarray(tenc)
    want_enc = fat[:, : LEVELS * LANE] @ s1
    errs = [np.abs(want_enc - enc).max()]
    for t in range(NT):
        sl_ = fat[:, (1 + t) * LEVELS * LANE : (2 + t) * LEVELS * LANE]
        errs.append(np.abs(sl_ @ s1 - tenc[t]).max())
    print(f"P0-vs-P2 max abs err: {max(errs):.3e}", flush=True)

    slope(step_p0, "P0_fat")
    slope(step_p2, "P2_prod")


if __name__ == "__main__":
    main()
