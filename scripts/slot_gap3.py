"""Attribute the lookup-vs-kernel gap: geometry, glue/layout, kernel.

slot_gap2 (chained slopes): production fwd kernel with 3 tangents on
pre-laid-out operands = 3.2 ms @ N=16K (5.1M samples/s).
slot_grid_bench: full slot_grid_lookup(with_tangents=True) = 11.5 ms.
slot_ablate: slot_geometry alone = 1.07 ms. Missing ~7 ms = the XLA
layout conversion of [N,48] w / [3,N,48] dw into Pallas operand tiles
(48-lane minor dims pad to 128; the [3,N,48] stack adds transposes).

Measures (chained slopes, K=1 vs 5):
  A  slot_geometry only (idx, w, dw out, scalar reduce)
  B  kernel only, device-resident pre-built operands   (expect ~3.2)
  C  geometry + kernel fused in one jit = production lookup path
  D  C but with dw flattened to 2D [N, 3*WCOLS] before the call and a
     kernel variant reading 2D dw + 2D tacc scratch + 2D tenc out
     (isolates the 3D-operand cost inside the same fused program)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/slot_gap3.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

from multimodalstudio_tpu.ops.pallas.slot_grid import (  # noqa: E402
    LANE,
    NSLOT,
    FEAT,
    SlotGridSpec,
    _build_calls,
    _gather_group,
    _slot_masks,
    _sum_matrices,
    slot_geometry,
)

SPEC = SlotGridSpec(num_levels=6, min_res=16, max_res=512, rows_per_level=2048)
N, BLOCK = 16384, 128
LEVELS, NT = 6, 3
ROWS = SPEC.total_rows
WCOLS = LEVELS * NSLOT


# ---- kernel variant with fully-2D refs (dw [block, 3*WCOLS], tacc 2D,
# tenc out [block, 3*enc_w]) --------------------------------------------

def _fwd_kernel_2d(levels, n_tang, idx_ref, w_ref, dw_ref, tbl_ref, s_ref,
                   enc_ref, tenc_ref, acc_scr, tacc_scr, g_scr):
    b = idx_ref.shape[0]
    masks = _slot_masks()
    wc = levels * NSLOT

    def body(g, _):
        s0 = g * 8
        _gather_group(levels, idx_ref, tbl_ref, g_scr, s0)
        rows_enc = []
        rows_t = [[] for _ in range(n_tang)]
        for l in range(levels):
            acc = jnp.zeros((8, LANE), jnp.float32)
            taccs = [jnp.zeros((8, LANE), jnp.float32) for _ in range(n_tang)]
            for p in range(NSLOT):
                tile8 = g_scr[pl.ds((l * NSLOT + p) * 8, 8), :]
                tile8 = jnp.where(masks[p], tile8, 0.0)
                wcol = w_ref[pl.ds(s0, 8), pl.ds(l * NSLOT + p, 1)]
                acc = acc + tile8 * wcol
                for t in range(n_tang):
                    dcol = dw_ref[pl.ds(s0, 8), pl.ds(t * wc + l * NSLOT + p, 1)]
                    taccs[t] = taccs[t] + tile8 * dcol
            rows_enc.append(acc)
            for t in range(n_tang):
                rows_t[t].append(taccs[t])
        acc_scr[pl.ds(s0, 8), :] = jnp.concatenate(rows_enc, axis=1)
        for t in range(n_tang):
            tacc_scr[pl.ds(s0, 8), pl.ds(t * levels * LANE, levels * LANE)] = (
                jnp.concatenate(rows_t[t], axis=1)
            )
        return 0

    jax.lax.fori_loop(0, b // 8, body, 0)
    s_mat = s_ref[:]
    enc_ref[:] = jnp.dot(acc_scr[:], s_mat, preferred_element_type=jnp.float32)
    ew = levels * FEAT
    for t in range(n_tang):
        tenc_ref[:, pl.ds(t * ew, ew)] = jnp.dot(
            tacc_scr[:, pl.ds(t * levels * LANE, levels * LANE)], s_mat,
            preferred_element_type=jnp.float32,
        )


@functools.lru_cache(maxsize=None)
def _build_2d():
    def blk(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    grid = (N // BLOCK,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_2d, LEVELS, NT),
        grid=grid,
        in_specs=[
            blk((BLOCK, WCOLS), lambda i: (i, 0)),
            blk((BLOCK, WCOLS), lambda i: (i, 0)),
            blk((BLOCK, NT * WCOLS), lambda i: (i, 0)),
            blk((ROWS, LANE), lambda i: (0, 0)),
            blk((LEVELS * LANE, LEVELS * FEAT), lambda i: (0, 0)),
        ],
        out_specs=[
            blk((BLOCK, LEVELS * FEAT), lambda i: (i, 0)),
            blk((BLOCK, NT * LEVELS * FEAT), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, LEVELS * FEAT), jnp.float32),
            jax.ShapeDtypeStruct((N, NT * LEVELS * FEAT), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK, LEVELS * LANE), jnp.float32),
            pltpu.VMEM((BLOCK, NT * LEVELS * LANE), jnp.float32),
            pltpu.VMEM((LEVELS * NSLOT * 8, LANE), jnp.float32),
        ],
    )


def slope(make_step, tag, init_x, extra):
    times = {}
    for K in (1, 5):
        @jax.jit
        def f(x, _K=K, _e=extra):
            acc = jnp.float32(0)
            for _ in range(_K):
                x, v = make_step(x, *_e)
                acc = acc + v
            return x, acc

        r = f(init_x); float(r[1])  # tunnel block_until_ready is async; fetch
        ts = []
        for rep in range(4):
            x2 = init_x + jnp.float32(1e-7 * (rep + 1))
            t0 = time.perf_counter()
            float(f(x2)[1])
            ts.append(time.perf_counter() - t0)
        times[K] = float(np.median(ts))
        print(f"  {tag} K={K}: {times[K]*1e3:.2f} ms", flush=True)
    sl = (times[5] - times[1]) / 4
    print(f"{tag}: {sl*1e3:.3f} ms/op -> {N/sl/1e6:.2f} M samples/s", flush=True)


def main():
    s1, _ = _sum_matrices(LEVELS)
    s1 = jnp.asarray(s1)
    tbl = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (ROWS, LANE), jnp.float32)
    )
    x0 = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(0), (N, 3), minval=0.01, maxval=0.97)
    )
    fwd_call, _ = _build_calls(LEVELS, NT, ROWS, BLOCK, N, False)

    # A: geometry only
    def step_a(x, tbl):
        idx, w, dw = slot_geometry(x, SPEC)
        # full reductions — partial-row sums let XLA DCE the geometry
        v = jnp.sum(w) + jnp.sum(dw) + jnp.sum(idx).astype(jnp.float32) * 0
        return jnp.clip(x + v * 1e-12, 0.01, 0.97), v

    slope(step_a, "A_geometry", x0, (tbl,))

    # B: kernel only on pre-built operands (carry via table bump)
    idx0, w0, dw0 = jax.jit(lambda x: slot_geometry(x, SPEC))(x0)
    idx0, w0, dw0 = jax.device_put(idx0), jax.device_put(w0), jax.device_put(dw0)

    def step_b(t, idx, w, dw):
        enc, tenc = fwd_call(idx, w, dw, t, s1)
        v = jnp.sum(enc[0]) + jnp.sum(tenc[0, 0])
        return t + v * 1e-12, v

    slope(step_b, "B_kernel3d", tbl, (idx0, w0, dw0))

    # B2: 2D-ref kernel on pre-built operands
    call2d = _build_2d()
    dw0_2d = jax.device_put(
        jnp.transpose(dw0, (1, 0, 2)).reshape(N, NT * WCOLS)
    )

    def step_b2(t, idx, w, dw2):
        enc, tenc = call2d(idx, w, dw2, t, s1)
        v = jnp.sum(enc[0]) + jnp.sum(tenc[0, :LEVELS * FEAT])
        return t + v * 1e-12, v

    slope(step_b2, "B2_kernel2d", tbl, (idx0, w0, dw0_2d))

    # C: geometry + 3D kernel in one jit (the production lookup body)
    def step_c(x, tbl):
        idx, w, dw = slot_geometry(x, SPEC)
        enc, tenc = fwd_call(idx, w, dw, tbl, s1)
        v = jnp.sum(enc[0]) + jnp.sum(tenc[0, 0])
        return jnp.clip(x + v * 1e-12, 0.01, 0.97), v

    slope(step_c, "C_geo+kernel3d", x0, (tbl,))

    # D: geometry + reshape + 2D kernel in one jit
    def step_d(x, tbl):
        idx, w, dw = slot_geometry(x, SPEC)
        dw2 = jnp.transpose(dw, (1, 0, 2)).reshape(N, NT * WCOLS)
        enc, tenc = call2d(idx, w, dw2, tbl, s1)
        v = jnp.sum(enc[0]) + jnp.sum(tenc[0, :LEVELS * FEAT])
        return jnp.clip(x + v * 1e-12, 0.01, 0.97), v

    slope(step_d, "D_geo+kernel2d", x0, (tbl,))

    # correctness: C vs D
    idx, w, dw = jax.jit(lambda x: slot_geometry(x, SPEC))(x0)
    enc3, tenc3 = jax.jit(lambda: fwd_call(idx0, w0, dw0, tbl, s1))()
    enc2, tenc2 = jax.jit(lambda: call2d(idx0, w0, dw0_2d, tbl, s1))()
    t2 = tenc2.reshape(N, NT, LEVELS * FEAT).transpose(1, 0, 2)
    print(f"enc err {float(jnp.abs(enc3-enc2).max()):.2e} "
          f"tenc err {float(jnp.abs(tenc3-t2).max()):.2e}", flush=True)


if __name__ == "__main__":
    main()
