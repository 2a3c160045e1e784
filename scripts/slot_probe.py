"""Probe the slot-hash-grid encode kernel's inner loop on the real chip.

Design under test (round-3 grid attack, VERDICT r2 #1): vertices are stored
in 2x2x2 parity groups — one [1, 128]-lane table row per group, vertex at
lane slot 16*parity. A cell's 8 trilerp corners occupy all 8 parity slots
exactly once, so corner extraction is a STATIC lane mask (no lane shuffles,
no lane reductions) and interpolation is 8 masked scalar-broadcast FMAs.

Two inner-loop variants measured end to end (gather + trilerp + 3 spatial
tangents, L levels), plus the scalar-index-read mechanism:

  A. per-sample: 8 row loads -> masked FMA with pltpu.repeat-expanded
     weights, all at [1, 128] width
  B. batched-8: 64 row loads into 8 [8, 128] scratch tiles (sample in
     sublane), then full-vreg masked FMAs with lane-broadcast weight columns

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/slot_probe.py
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
NSLOT = 8
FEAT = LANE // NSLOT  # 16


def _slot_masks():
    # INTERLEAVED slot lanes: slot p owns lanes where lane % 8 == p, so
    # pltpu.repeat (which TILES: w0..w7 w0..w7 ...) expands weights to
    # exactly w[lane % 8] per lane.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    return [(lane % NSLOT) == p for p in range(NSLOT)]


# --------------------------------------------------------- variant A kernel

def _kernel_a(levels, n_tang, idx_ref, w_ref, dw_ref, tbl_ref, out_ref):
    b = idx_ref.shape[0]
    masks = _slot_masks()

    def body(s, _):
        outs = []
        for l in range(levels):
            acc = jnp.zeros((1, LANE), jnp.float32)
            taccs = [jnp.zeros((1, LANE), jnp.float32) for _ in range(n_tang)]
            comp = jnp.zeros((1, LANE), jnp.float32)
            for p in range(NSLOT):
                row = idx_ref[s, l * NSLOT + p]
                tile = tbl_ref[pl.ds(row, 1), :]
                comp = comp + jnp.where(masks[p], tile, 0.0)
            w8 = w_ref[pl.ds(s, 1), pl.ds(l * NSLOT, NSLOT)]
            wexp = pltpu.repeat(w8, FEAT, axis=1)
            acc = comp * wexp
            for k in range(n_tang):
                d8 = dw_ref[k, pl.ds(s, 1), pl.ds(l * NSLOT, NSLOT)].reshape(1, NSLOT)
                taccs[k] = comp * pltpu.repeat(d8, FEAT, axis=1)
            outs.append((acc, taccs))
        row_parts = [o[0] for o in outs] + [t for o in outs for t in o[1]]
        out_ref[pl.ds(s, 1), :] = jnp.concatenate(row_parts, axis=1)
        return 0

    jax.lax.fori_loop(0, b, body, 0)


# --------------------------------------------------------- variant B kernel

def _kernel_b(levels, n_tang, idx_ref, w_ref, dw_ref, tbl_ref, out_ref, g_scr):
    b = idx_ref.shape[0]
    masks = _slot_masks()
    n_grp = b // 8

    def body(g, _):
        s0 = g * 8
        # scalar phase: 64 loads per level into slot tiles [8, 128]
        for l in range(levels):
            for p in range(NSLOT):
                for s in range(8):
                    row = idx_ref[s0 + s, l * NSLOT + p]
                    g_scr[pl.ds(l * NSLOT * 8 + p * 8 + s, 1), :] = tbl_ref[
                        pl.ds(row, 1), :
                    ]
        # vector phase: masked lane-broadcast FMAs at [8, 128]
        parts = []
        tparts = [[] for _ in range(n_tang)]
        for l in range(levels):
            acc = jnp.zeros((8, LANE), jnp.float32)
            taccs = [jnp.zeros((8, LANE), jnp.float32) for _ in range(n_tang)]
            for p in range(NSLOT):
                tile8 = g_scr[pl.ds(l * NSLOT * 8 + p * 8, 8), :]
                tile8 = jnp.where(masks[p], tile8, 0.0)
                wcol = w_ref[pl.ds(s0, 8), pl.ds(l * NSLOT + p, 1)]
                acc = acc + tile8 * wcol
                for k in range(n_tang):
                    dcol = dw_ref[k, pl.ds(s0, 8), pl.ds(l * NSLOT + p, 1)].reshape(8, 1)
                    taccs[k] = taccs[k] + tile8 * dcol
            parts.append(acc)
            for k in range(n_tang):
                tparts[k].append(taccs[k])
        row_parts = parts + [t for tp in tparts for t in tp]
        out_ref[pl.ds(s0, 8), :] = jnp.concatenate(row_parts, axis=1)
        return 0

    jax.lax.fori_loop(0, n_grp, body, 0)


def make_probe(variant, n, block, levels, n_tang, rows):
    width = levels * LANE * (1 + n_tang)
    kern = functools.partial(
        _kernel_a if variant == "a" else _kernel_b, levels, n_tang
    )
    in_specs = [
        pl.BlockSpec((block, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, block, 64), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    scratch = []
    if variant == "b":
        scratch.append(pltpu.VMEM((levels * NSLOT * 8, LANE), jnp.float32))

    @jax.jit
    def run(idx, w, dw, tbl):
        return pl.pallas_call(
            kern,
            grid=(n // block,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (block, width), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, width), jnp.float32),
            scratch_shapes=scratch,
        )(idx, w, dw, tbl)

    return run


def main():
    results = {}
    n, block, rows = 16384, 128, 8192  # 4 MB f32 table
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(jax.random.PRNGKey(1), (rows, LANE), jnp.float32)

    import os as _os
    sweep = ((6, 3, "sdf_L6"), (6, 0, "rad_L6"), (4, 3, "sdf_L4")) if not _os.environ.get("SLOT_PROBE_SKIP_SWEEP") else ()
    for levels, n_tang, tag in sweep:
        for variant in ("a", "b"):
            run = make_probe(variant, n, block, levels, n_tang, rows)
            args = []
            for r in range(6):
                k = jax.random.fold_in(key, r)
                idx = jax.random.randint(k, (n, 64), 0, rows, jnp.int32)
                w = jax.random.uniform(k, (n, 64), jnp.float32)
                dw = jax.random.normal(k, (3, n, 64), jnp.float32)
                args.append(tuple(jax.device_put(x) for x in (idx, w, dw, tbl)))
            outs = run(*args[0])
            jax.block_until_ready(outs)
            times = []
            for a in args:
                t0 = time.perf_counter()
                jax.block_until_ready(run(*a))
                times.append(time.perf_counter() - t0)
            sec = float(np.median(times))
            rate = n / sec
            results[f"{tag}_{variant}"] = rate
            print(f"{tag} variant {variant}: {rate/1e6:.2f} M samples/s", flush=True)

    # correctness: variant a vs host math
    levels, n_tang = 2, 3
    run = make_probe("a", 1024, 256, levels, n_tang, rows)
    k = jax.random.fold_in(key, 99)
    idx = jax.random.randint(k, (1024, 64), 0, rows, jnp.int32)
    w = jax.random.uniform(k, (1024, 64), jnp.float32)
    dw = jax.random.normal(k, (3, 1024, 64), jnp.float32)
    got = np.asarray(run(idx, w, dw, tbl))
    t_np, i_np, w_np, dw_np = map(np.asarray, (tbl, idx, w, dw))
    lane_slot = np.arange(LANE) % NSLOT
    want_parts = []
    for l in range(levels):
        acc = np.zeros((1024, LANE), np.float32)
        comp = np.zeros((1024, LANE), np.float32)
        for p in range(NSLOT):
            rowsv = t_np[i_np[:, l * NSLOT + p]]
            comp += np.where(lane_slot[None, :] == p, rowsv, 0.0)
        wexp = np.tile(w_np[:, l * NSLOT:(l + 1) * NSLOT], (1, FEAT))
        want_parts.append(comp * wexp)
    for kk in range(n_tang):
        for l in range(levels):
            comp = np.zeros((1024, LANE), np.float32)
            for p in range(NSLOT):
                rowsv = t_np[i_np[:, l * NSLOT + p]]
                comp += np.where(lane_slot[None, :] == p, rowsv, 0.0)
            dexp = np.tile(dw_np[kk, :, l * NSLOT:(l + 1) * NSLOT], (1, FEAT))
            want_parts.append(comp * dexp)
    want = np.concatenate(want_parts, axis=1)
    err = np.abs(got - want).max()
    print(f"variant a correctness: max abs err {err:.2e}", flush=True)
    results["correct_abs_err"] = float(err)

    with open("/root/repo/slot_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote slot_probe.json")


if __name__ == "__main__" and __import__("sys").argv[-1] != "chain":
    main()


def chained_check():
    """Serialized-dependency timing: each call's indices derive from the
    previous call's output, defeating any pipelining/memoization artifact."""
    n, block, rows = 16384, 128, 8192
    levels, n_tang = 6, 3
    run = make_probe("a", n, block, levels, n_tang, rows)
    key = jax.random.PRNGKey(5)
    tbl = jax.random.normal(key, (rows, LANE), jnp.float32)
    idx = jax.random.randint(key, (n, 64), 0, rows, jnp.int32)
    w = jax.random.uniform(key, (n, 64), jnp.float32)
    dw = jax.random.normal(key, (3, n, 64), jnp.float32)

    @jax.jit
    def step(idx, w, dw, tbl):
        out = pl.pallas_call(
            functools.partial(_kernel_a, levels, n_tang),
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((block, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block, 64), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, block, 64), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block, levels * LANE * 4), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, levels * LANE * 4), jnp.float32),
        )(idx, w, dw, tbl)
        nidx = (idx + out[:, :64].astype(jnp.int32)) % rows
        return nidx, out[0, 0]

    nidx, v = step(idx, w, dw, tbl)
    jax.block_until_ready(nidx)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        nidx, v = step(nidx, w, dw, tbl)
    jax.block_until_ready(nidx)
    sec = (time.perf_counter() - t0) / reps
    print(f"chained sdf_L6 variant a: {n/sec/1e6:.2f} M samples/s "
          f"({sec*1e6:.0f} us/call)", flush=True)


if __name__ == "__main__" and __import__("sys").argv[-1] == "chain":
    chained_check()
