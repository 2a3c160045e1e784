"""Isolate the production-slot-kernel vs probe-B gap on the real chip.

slot_probe.py variant B measures 5.16M samples/s (L=6, 3 tangents) but the
production fwd kernel (ops/pallas/slot_grid.py) measures 1.23M through
slot_ablate.py. Same inner loop — the structural deltas are:

  P0  probe-B shape: one fat [block, L*128*(1+T)] output, no scratch
      accumulators, no S compaction          (baseline)
  P1  + separate acc/tacc VMEM scratch, concat per level, copy to fat out
      (isolates the scratch indirection)
  P2  + S-matrix compaction matmuls and compact [n, L*16] outputs
      (isolates the MXU stage = production fwd)
  P3  production fwd_call itself via _build_calls (sanity: == P2)

Each timed with per-call block_until_ready on distinct inputs, median of 6.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/slot_gap.py
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
)

SPEC = SlotGridSpec(num_levels=6, min_res=16, max_res=512, rows_per_level=2048)
N, BLOCK = 16384, 128
LEVELS, NT = 6, 3
ROWS = SPEC.total_rows
WCOLS = LEVELS * NSLOT


def _vector_phase(levels, n_tang, idx_ref, w_ref, dw_ref, tbl_ref, g_scr, s0):
    masks = _slot_masks()
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
                dcol = dw_ref[t, pl.ds(s0, 8), pl.ds(l * NSLOT + p, 1)].reshape(8, 1)
                taccs[t] = taccs[t] + tile8 * dcol
        rows_enc.append(acc)
        for t in range(n_tang):
            rows_t[t].append(taccs[t])
    return rows_enc, rows_t


def _kernel_p0(levels, n_tang, idx_ref, w_ref, dw_ref, tbl_ref, out_ref, g_scr):
    b = idx_ref.shape[0]

    def body(g, _):
        s0 = g * 8
        _gather_group(levels, idx_ref, tbl_ref, g_scr, s0)
        rows_enc, rows_t = _vector_phase(
            levels, n_tang, idx_ref, w_ref, dw_ref, tbl_ref, g_scr, s0
        )
        parts = rows_enc + [t for tp in rows_t for t in tp]
        out_ref[pl.ds(s0, 8), :] = jnp.concatenate(parts, axis=1)
        return 0

    jax.lax.fori_loop(0, b // 8, body, 0)


def _kernel_p1(
    levels, n_tang, idx_ref, w_ref, dw_ref, tbl_ref, out_ref, acc_scr, tacc_scr, g_scr
):
    b = idx_ref.shape[0]

    def body(g, _):
        s0 = g * 8
        _gather_group(levels, idx_ref, tbl_ref, g_scr, s0)
        rows_enc, rows_t = _vector_phase(
            levels, n_tang, idx_ref, w_ref, dw_ref, tbl_ref, g_scr, s0
        )
        acc_scr[pl.ds(s0, 8), :] = jnp.concatenate(rows_enc, axis=1)
        for t in range(n_tang):
            tacc_scr[t, pl.ds(s0, 8), :] = jnp.concatenate(rows_t[t], axis=1)
        return 0

    jax.lax.fori_loop(0, b // 8, body, 0)
    parts = [acc_scr[:]] + [tacc_scr[t] for t in range(n_tang)]
    out_ref[:] = jnp.concatenate(parts, axis=1)


def _kernel_p2(
    levels,
    n_tang,
    idx_ref,
    w_ref,
    dw_ref,
    tbl_ref,
    s_ref,
    enc_ref,
    tenc_ref,
    acc_scr,
    tacc_scr,
    g_scr,
):
    b = idx_ref.shape[0]

    def body(g, _):
        s0 = g * 8
        _gather_group(levels, idx_ref, tbl_ref, g_scr, s0)
        rows_enc, rows_t = _vector_phase(
            levels, n_tang, idx_ref, w_ref, dw_ref, tbl_ref, g_scr, s0
        )
        acc_scr[pl.ds(s0, 8), :] = jnp.concatenate(rows_enc, axis=1)
        for t in range(n_tang):
            tacc_scr[t, pl.ds(s0, 8), :] = jnp.concatenate(rows_t[t], axis=1)
        return 0

    jax.lax.fori_loop(0, b // 8, body, 0)
    s_mat = s_ref[:]
    enc_ref[:] = jnp.dot(acc_scr[:], s_mat, preferred_element_type=jnp.float32)
    for t in range(n_tang):
        tenc_ref[t] = jnp.dot(tacc_scr[t], s_mat, preferred_element_type=jnp.float32)


def _specs():
    def blk(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    return {
        "idx": blk((BLOCK, WCOLS), lambda i: (i, 0)),
        "w": blk((BLOCK, WCOLS), lambda i: (i, 0)),
        "dw": blk((3, BLOCK, WCOLS), lambda i: (0, i, 0)),
        "tbl": blk((ROWS, LANE), lambda i: (0, 0)),
        "s": blk((LEVELS * LANE, LEVELS * FEAT), lambda i: (0, 0)),
        "fat": blk((BLOCK, LEVELS * LANE * (1 + NT)), lambda i: (i, 0)),
        "enc": blk((BLOCK, LEVELS * FEAT), lambda i: (i, 0)),
        "tenc": blk((3, BLOCK, LEVELS * FEAT), lambda i: (0, i, 0)),
    }


def build(tag):
    sp = _specs()
    grid = (N // BLOCK,)
    g_scratch = pltpu.VMEM((LEVELS * NSLOT * 8, LANE), jnp.float32)
    acc_scratch = pltpu.VMEM((BLOCK, LEVELS * LANE), jnp.float32)
    tacc_scratch = pltpu.VMEM((3, BLOCK, LEVELS * LANE), jnp.float32)
    fatw = LEVELS * LANE * (1 + NT)

    if tag == "P0":
        return pl.pallas_call(
            functools.partial(_kernel_p0, LEVELS, NT),
            grid=grid,
            in_specs=[sp["idx"], sp["w"], sp["dw"], sp["tbl"]],
            out_specs=sp["fat"],
            out_shape=jax.ShapeDtypeStruct((N, fatw), jnp.float32),
            scratch_shapes=[g_scratch],
        )
    if tag == "P1":
        return pl.pallas_call(
            functools.partial(_kernel_p1, LEVELS, NT),
            grid=grid,
            in_specs=[sp["idx"], sp["w"], sp["dw"], sp["tbl"]],
            out_specs=sp["fat"],
            out_shape=jax.ShapeDtypeStruct((N, fatw), jnp.float32),
            scratch_shapes=[acc_scratch, tacc_scratch, g_scratch],
        )
    if tag == "P2":
        return pl.pallas_call(
            functools.partial(_kernel_p2, LEVELS, NT),
            grid=grid,
            in_specs=[sp["idx"], sp["w"], sp["dw"], sp["tbl"], sp["s"]],
            out_specs=[sp["enc"], sp["tenc"]],
            out_shape=[
                jax.ShapeDtypeStruct((N, LEVELS * FEAT), jnp.float32),
                jax.ShapeDtypeStruct((3, N, LEVELS * FEAT), jnp.float32),
            ],
            scratch_shapes=[acc_scratch, tacc_scratch, g_scratch],
        )
    raise ValueError(tag)


def time_call(fn, argsets):
    out = fn(*argsets[0])
    jax.block_until_ready(out)
    ts = []
    for a in argsets:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(jax.random.PRNGKey(1), (ROWS, LANE), jnp.float32)
    s1, _ = _sum_matrices(LEVELS)
    s1 = jnp.asarray(s1)
    argsets = []
    for r in range(6):
        k = jax.random.fold_in(key, r)
        idx = jax.random.randint(k, (N, WCOLS), 0, ROWS, jnp.int32)
        w = jax.random.uniform(k, (N, WCOLS), jnp.float32)
        dw = jax.random.normal(k, (3, N, WCOLS), jnp.float32)
        argsets.append(tuple(jax.device_put(x) for x in (idx, w, dw, tbl)))

    for tag in ("P0", "P1", "P2"):
        call = build(tag)
        fn = jax.jit(lambda *a, _c=call, _t=tag: _c(*a, s1) if _t == "P2" else _c(*a))
        sec = time_call(fn, argsets)
        print(f"{tag}: {sec*1e3:.3f} ms -> {N/sec/1e6:.2f} M samples/s", flush=True)

    # P3: the production fwd_call
    fwd_call, _ = _build_calls(LEVELS, NT, ROWS, BLOCK, N, False)
    fn3 = jax.jit(lambda idx, w, dw, tbl: fwd_call(idx, w, dw, tbl, s1))
    sec = time_call(fn3, argsets)
    print(f"P3(prod): {sec*1e3:.3f} ms -> {N/sec/1e6:.2f} M samples/s", flush=True)


if __name__ == "__main__":
    main()
