"""Pallas TPU gather kernels for VMEM-resident tables.

v5e has no hardware big-table gather (no SparseCore); XLA lowers hash-table
gathers to ~4M rows/s serial loops. For tables that fit VMEM these kernels
do better:

* `vreg_scan_gather`: the table is replicated across the 128 lanes and
  scanned vreg-by-vreg; each scan step uses the hardware 8-sublane
  `tpu.dynamic_gather` (exposed as a same-shape `take_along_axis`) plus a
  predicated select — 1024 parallel lookups per step, O(T/8) steps per
  query block. Best for small per-level tables (T <= ~4096).

Status: prototype, validated in interpreter mode and on-device by tests;
not yet wired into the hash-grid encoding (see PLAN.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_gather_kernel(idx_ref, table_ref, out_ref, *, table_rows: int):
    """out[q] = table[idx[q]] for a [QS, 128] query block.

    table_ref: [T, 128] — value t replicated across all 128 lanes at row t.
    idx_ref/out_ref: [QS, 128] int32 / float32 (QS sublanes of queries).

    The hardware `tpu.dynamic_gather` (same-shape take_along_axis) shuffles
    within ONE 8-sublane vreg, so both the queries and the table are walked
    vreg-by-vreg: per (query-vreg, table-vreg) pair one gather + predicated
    select — 1024 parallel lookups per step.
    """
    qs = idx_ref.shape[0]
    n_chunks = table_rows // 8

    def q_body(q, _):
        idx = idx_ref[pl.ds(q * 8, 8), :]  # [8, 128]
        sub = idx & 7
        chunk_of = idx >> 3

        def c_body(c, acc):
            chunk = table_ref[pl.ds(c * 8, 8), :]  # [8, 128] one vreg
            # hardware sublane gather: cand[s, l] = chunk[sub[s, l], l]
            cand = jnp.take_along_axis(chunk, sub, axis=0)
            return jnp.where(chunk_of == c, cand, acc)

        acc = jax.lax.fori_loop(0, n_chunks, c_body, jnp.zeros((8, 128), jnp.float32))
        out_ref[pl.ds(q * 8, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, qs // 8, q_body, 0)


def vreg_scan_gather(table: jnp.ndarray, idx: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Gather table[idx] where table is [T] (T % 8 == 0, T*512B fits VMEM).

    idx: [N] int32, N % (block*128) == 0 after padding (handled here).
    Returns [N] float32.
    """
    t = table.shape[0]
    assert t % 8 == 0
    n = idx.shape[0]
    per_block = block * 128
    n_pad = (-n) % per_block
    idx_p = jnp.pad(idx, (0, n_pad))
    idx2 = idx_p.reshape(-1, block, 128).reshape(-1, 128)  # [(B*block), 128]

    table_rep = jnp.broadcast_to(table[:, None], (t, 128))

    out = pl.pallas_call(
        functools.partial(_scan_gather_kernel, table_rows=t),
        out_shape=jax.ShapeDtypeStruct(idx2.shape, jnp.float32),
        grid=(idx2.shape[0] // block,),
        in_specs=[
            pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx2, table_rep)
    return out.reshape(-1)[:n]
