"""Microbenchmark: VMEM-resident block-gather rates for the block-hash grid.

Round-3 design probe (VERDICT r2 next-round #1). The planned TPU-native
answer to tcnn's HashGrid is a *block-structured* grid: hash at the
granularity of 4x4x4-cell blocks (5x5x5 = 125 vertices padded to 128
lanes), so one sample's 8 trilerp corners live in ONE aligned [F, 128]
VMEM tile per level instead of 8 random HBM rows. This probe measures, on
the real chip, the three primitive rates that decide whether that design
can beat the ~95-141M rows/s XLA HBM-gather roofline (docs/performance.md
section 3):

  1. tile_load  — dynamic sublane-offset [8,128] f32 loads from a
                  VMEM-resident table, scalar-indexed in a fori_loop
  2. tile_rmw   — read-modify-write accumulation at dynamic offsets
                  (the table-gradient scatter path)
  3. trilerp    — vectorized weight-build + weighted lane reduction
                  (the interpolation math, VPU)
  4. xla_block  — jnp.take of [8,128] blocks (XLA baseline, HBM)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/block_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

LANE = 128


def timed(fn, args_list, inner):
    """Median seconds per call over fresh-argument reps (tunnel memoizes)."""
    outs = [fn(*a) for a in args_list[:1]]
    jax.block_until_ready(outs)  # compile
    times = []
    for a in args_list:
        t0 = time.perf_counter()
        o = fn(*a)
        jax.block_until_ready(o)
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


# ------------------------------------------------------------ 1. tile_load

def _load_kernel(n_iter, unroll, sub, idx_ref, tbl_ref, out_ref):
    mask = idx_ref.shape[0] - 1

    def body(i, accs):
        new = []
        for u in range(unroll):
            j = (i * unroll + u) & mask
            off = pl.multiple_of(idx_ref[j] * sub, sub)
            new.append(accs[u] + tbl_ref[pl.ds(off, sub), :])
        return tuple(new)

    accs = tuple(jnp.zeros((sub, LANE), jnp.float32) for _ in range(unroll))
    accs = jax.lax.fori_loop(0, n_iter // unroll, body, accs)
    out_ref[:] = sum(accs)


def make_tile_load(n_blocks, n_iter, unroll, sub=8):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_load_kernel, n_iter, unroll, sub)

    @jax.jit
    def run(idx, tbl):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((sub, LANE), jnp.float32),
        )(idx, tbl)

    return run


# ------------------------------------------------------------- 2. tile_rmw

def _rmw_kernel(n_iter, unroll, sub, idx_ref, tbl_ref, val_ref, out_ref):
    mask = idx_ref.shape[0] - 1
    v = val_ref[:]

    def body(i, _):
        for u in range(unroll):
            j = (i * unroll + u) & mask
            off = pl.multiple_of(idx_ref[j] * sub, sub)
            out_ref[pl.ds(off, sub), :] = out_ref[pl.ds(off, sub), :] + v
        return 0

    jax.lax.fori_loop(0, n_iter // unroll, body, 0)


def make_tile_rmw(n_blocks, n_iter, unroll, sub=8):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_rmw_kernel, n_iter, unroll, sub)

    @jax.jit
    def run(idx, tbl, val):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks * sub, LANE), jnp.float32),
            input_output_aliases={1: 0},
        )(idx, tbl, val)

    return run


# ------------------------------------------------------------- 3. trilerp

def _trilerp_kernel(reps, blocks_ref, cell_ref, frac_ref, out_ref):
    """blocks [S, 8, 128] f32 (gathered), cell [S, 4] f32 (bx,by,bz,_),
    frac [S, 4] f32 (tx,ty,tz,_) -> out [S, 4*F] (feat + 3 tangents)."""
    s = blocks_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    lx = (lane % 5).astype(jnp.float32)
    ly = ((lane // 5) % 5).astype(jnp.float32)
    lz = (lane // 25).astype(jnp.float32)

    def one(r, acc):
        b = blocks_ref[:]  # [S, 8, 128]
        cx, cy, cz = cell_ref[:, 0:1], cell_ref[:, 1:2], cell_ref[:, 2:3]
        tx, ty, tz = frac_ref[:, 0:1], frac_ref[:, 1:2], frac_ref[:, 2:3]
        # smoothstep per axis
        sx = tx * tx * (3.0 - 2.0 * tx)
        sy = ty * ty * (3.0 - 2.0 * ty)
        sz = tz * tz * (3.0 - 2.0 * tz)

        def axis_w(l, c, sfrac):
            is0 = (l == c).astype(jnp.float32)
            is1 = (l == c + 1.0).astype(jnp.float32)
            return is0 * (1.0 - sfrac) + is1 * sfrac, is1 - is0

        wx, dx = axis_w(lx, cx, sx)  # [S, 128]
        wy, dy = axis_w(ly, cy, sy)
        wz, dz = axis_w(lz, cz, sz)
        w = (wx * wy * wz)[:, None, :]  # [S, 1, 128]
        gx = (dx * wy * wz)[:, None, :]
        gy = (wx * dy * wz)[:, None, :]
        gz = (wx * wy * dz)[:, None, :]
        feat = jnp.sum(b * w, axis=2)  # [S, 8]
        tgx = jnp.sum(b * gx, axis=2)
        tgy = jnp.sum(b * gy, axis=2)
        tgz = jnp.sum(b * gz, axis=2)
        return acc + jnp.concatenate([feat, tgx, tgy, tgz], axis=1)

    out_ref[:] = jax.lax.fori_loop(0, reps, one, jnp.zeros((s, 32), jnp.float32))


def make_trilerp(s, reps):
    @jax.jit
    def run(blocks, cell, frac):
        return pl.pallas_call(
            functools.partial(_trilerp_kernel, reps),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s, 32), jnp.float32),
        )(blocks, cell, frac)

    return run


# -------------------------------------------------------------------- main

def main():
    results = {}
    key = jax.random.PRNGKey(0)
    n_reps = 8

    n_blocks = 1024  # 4 MB f32 table
    tbl = jax.random.normal(jax.random.PRNGKey(1), (n_blocks * 8, LANE), jnp.float32)
    n_iter = 65536

    for unroll in (1, 4, 8):
        run = make_tile_load(n_blocks, n_iter, unroll)
        idxs = [
            jax.device_put(
                jax.random.randint(jax.random.fold_in(key, r), (8192,), 0, n_blocks, jnp.int32)
            )
            for r in range(n_reps)
        ]
        sec = timed(run, [(i, tbl) for i in idxs], 1)
        rate = n_iter / sec
        results[f"tile_load_u{unroll}"] = rate
        print(f"tile_load  unroll={unroll}: {rate/1e6:.1f} M tiles/s "
              f"({rate*8/1e6:.0f} M rows-of-128/s equiv)", flush=True)

    for unroll in (1, 4):
        run = make_tile_rmw(n_blocks, n_iter, unroll)
        val = jnp.ones((8, LANE), jnp.float32)
        idxs = [
            jax.device_put(
                jax.random.randint(jax.random.fold_in(key, 100 + r), (8192,), 0, n_blocks, jnp.int32)
            )
            for r in range(n_reps)
        ]
        sec = timed(run, [(i, tbl, val) for i in idxs], 1)
        rate = n_iter / sec
        results[f"tile_rmw_u{unroll}"] = rate
        print(f"tile_rmw   unroll={unroll}: {rate/1e6:.1f} M RMW/s", flush=True)

    # -------- correctness checks (the RMW pipeline must not reorder
    # read-after-write hazards on colliding dynamic offsets)
    run1 = make_tile_load(n_blocks, 8192, 4)
    idx0 = jax.random.randint(jax.random.PRNGKey(7), (8192,), 0, n_blocks, jnp.int32)
    got = np.asarray(run1(idx0, tbl))
    t4 = np.asarray(tbl).reshape(n_blocks, 8, LANE)
    want = t4[np.asarray(idx0)].sum(axis=0)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"tile_load correctness: rel err {err:.2e}", flush=True)
    results["tile_load_relerr"] = float(err)

    runr = make_tile_rmw(n_blocks, 8192, 4)
    val = jnp.ones((8, LANE), jnp.float32)
    gotr = np.asarray(runr(idx0, jnp.zeros_like(tbl), val)).reshape(n_blocks, 8, LANE)
    counts = np.bincount(np.asarray(idx0), minlength=n_blocks).astype(np.float32)
    errr = np.abs(gotr - counts[:, None, None]).max()
    print(f"tile_rmw correctness: max abs err {errr:.2e} "
          f"(collisions present: max count {counts.max():.0f})", flush=True)
    results["tile_rmw_abserr"] = float(errr)

    s, reps = 256, 256
    run = make_trilerp(s, reps)
    args = []
    for r in range(n_reps):
        k = jax.random.fold_in(key, 200 + r)
        blocks = jax.random.normal(k, (s, 8, LANE), jnp.float32)
        cell = jnp.floor(jax.random.uniform(k, (s, 4), jnp.float32) * 4.0)
        frac = jax.random.uniform(k, (s, 4), jnp.float32)
        args.append((jax.device_put(blocks), jax.device_put(cell), jax.device_put(frac)))
    sec = timed(run, args, reps)
    rate = s / sec
    results["trilerp_tangent"] = rate
    print(f"trilerp+tangents (F=8): {rate/1e6:.1f} M samples/s per level", flush=True)

    # XLA baseline: block take from HBM
    tbl4 = tbl.reshape(n_blocks, 8, LANE)

    @jax.jit
    def xla_take(i):
        return jnp.take(tbl4, i, axis=0).sum(axis=0)

    idxs = [
        jax.device_put(
            jax.random.randint(jax.random.fold_in(key, 300 + r), (65536,), 0, n_blocks, jnp.int32)
        )
        for r in range(n_reps)
    ]
    sec = timed(xla_take, [(i,) for i in idxs], 1)
    rate = 65536 / sec
    results["xla_block_take"] = rate
    print(f"xla [8,128]-block take: {rate/1e6:.1f} M tiles/s", flush=True)

    with open("/root/repo/block_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote block_probe.json")


if __name__ == "__main__":
    main()
