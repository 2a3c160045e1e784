"""Phase attribution for the slot-grid fwd kernel: gather vs vector vs full.

Builds three variants of the production fwd kernel (ops/pallas/slot_grid.py
_fwd_kernel structure) that differ only in which phase runs:

  gather  — scalar row-copy loop only (table -> g_scr), vector phase
            replaced by a trivial g_scr passthrough sum
  vector  — gather replaced by static (compile-time) row copies so the
            scalar loop disappears; full masked-FMA + tangent phase
  full    — both phases (== production kernel shape)

Each timed with the chained-carry protocol (distinct inputs per rep defeat
the tunnel memoizer; slope over K removes dispatch fixed costs).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/slot_phase.py
Env: N (default 16384), LEVELS (6), NTANG (3), BLOCK (128)
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

LANE = 128
NSLOT = 8
N = int(os.environ.get("N", "16384"))
LEVELS = int(os.environ.get("LEVELS", "6"))
NTANG = int(os.environ.get("NTANG", "3"))
BLOCK = int(os.environ.get("BLOCK", "128"))
ROWS = 10976


def _slot_masks():
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    return [(lane % NSLOT) == p for p in range(NSLOT)]


def make_kernel(phase, levels, n_tang):
    def kern(idx_ref, w_ref, dw_ref, tbl_ref, out_ref, acc_scr, g_scr):
        b = idx_ref.shape[0]
        masks = _slot_masks()
        wc = levels * NSLOT

        def body(g, _):
            s0 = g * 8
            if phase in ("gather", "full"):
                for l in range(levels):
                    for p in range(NSLOT):
                        for s in range(8):
                            row = idx_ref[s0 + s, l * NSLOT + p]
                            g_scr[pl.ds((l * NSLOT + p) * 8 + s, 1), :] = tbl_ref[
                                pl.ds(row, 1), :
                            ]
            if phase == "gather":
                # touch g_scr cheaply so the loop isn't DCE'd
                acc_scr[pl.ds(s0, 8), :] = jnp.concatenate(
                    [g_scr[pl.ds(l * 64, 8), :] for l in range(levels)], axis=1
                )
            else:
                rows_enc = []
                rows_t = [[] for _ in range(n_tang)]
                for l in range(levels):
                    acc = jnp.zeros((8, LANE), jnp.float32)
                    taccs = [jnp.zeros((8, LANE), jnp.float32) for _ in range(n_tang)]
                    for p in range(NSLOT):
                        if phase == "vector":
                            # static rows: no scalar loop, same vector work
                            tile8 = g_scr[pl.ds(((l * NSLOT + p) * 8) % 64, 8), :]
                        else:
                            tile8 = g_scr[pl.ds((l * NSLOT + p) * 8, 8), :]
                        tile8 = jnp.where(masks[p], tile8, 0.0)
                        wcol = w_ref[pl.ds(s0, 8), pl.ds(l * NSLOT + p, 1)]
                        acc = acc + tile8 * wcol
                        for t in range(n_tang):
                            dcol = dw_ref[
                                pl.ds(s0, 8), pl.ds(t * wc + l * NSLOT + p, 1)
                            ]
                            taccs[t] = taccs[t] + tile8 * dcol
                    rows_enc.append(acc)
                    for t in range(n_tang):
                        rows_t[t].append(taccs[t])
                    del taccs
                row = jnp.concatenate(rows_enc, axis=1)
                for t in range(n_tang):
                    row = row + jnp.concatenate(rows_t[t], axis=1)
                acc_scr[pl.ds(s0, 8), :] = row
            return 0

        jax.lax.fori_loop(0, b // 8, body, 0)
        out_ref[:] = acc_scr[:]

    return kern


@functools.lru_cache(maxsize=None)
def build(phase):
    grid = (N // BLOCK,)

    def blk(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        make_kernel(phase, LEVELS, NTANG),
        grid=grid,
        in_specs=[
            blk((BLOCK, LEVELS * NSLOT), lambda i: (i, 0)),
            blk((BLOCK, LEVELS * NSLOT), lambda i: (i, 0)),
            blk((BLOCK, NTANG * LEVELS * NSLOT), lambda i: (i, 0)),
            blk((ROWS, LANE), lambda i: (0, 0)),
        ],
        out_specs=blk((BLOCK, LEVELS * LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, LEVELS * LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, LEVELS * LANE), jnp.float32),
            pltpu.VMEM((LEVELS * NSLOT * 8, LANE), jnp.float32),
        ],
    )
    return call


def chain(phase, k):
    call = build(phase)

    @jax.jit
    def run(idx, w, dw, tbl):
        acc = jnp.float32(0)
        for _ in range(k):
            out = call(idx, w, dw, tbl)
            v = out[0, 0] * 1e-9
            acc = acc + v
            idx = (idx + jnp.int32(1) + jnp.int32(v * 0)) % ROWS
        return acc

    return run


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N, LEVELS * NSLOT), 0, ROWS, dtype=jnp.int32)
    w = jax.random.uniform(key, (N, LEVELS * NSLOT))
    dw = jax.random.uniform(key, (N, NTANG * LEVELS * NSLOT))
    tbl = jax.random.uniform(key, (ROWS, LANE))

    for phase in ("gather", "vector", "full"):
        ts = {}
        for k in (1, 5):
            fn = chain(phase, k)
            float(fn(idx, w, dw, tbl))  # compile
            reps = []
            for r in range(3):
                t0 = time.perf_counter()
                float(fn(idx, w, dw, tbl))
                reps.append(time.perf_counter() - t0)
            ts[k] = min(reps)
            print(f"  {phase} K={k}: {ts[k]*1e3:.2f} ms", flush=True)
        per = (ts[5] - ts[1]) / 4
        print(
            f"{phase}: {per*1e3:.3f} ms/op -> {N/per/1e6:.2f} M samples/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
