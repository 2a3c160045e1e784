"""Slot-hash grid: a VMEM-resident multiresolution feature grid for TPU.

The TPU-native answer to tiny-cuda-nn's CUDA HashGrid (reference
src/field_components/encodings.py:184-310) for the production grid method.
The XLA-gather hash grid (ops/encodings.py) runs at the HBM gather-issue
roofline (~95-141M rows/s, docs/performance.md section 3), which pins the
grid method at ~1-2K rays/s. This module replaces random HBM row gathers
with dynamic sublane-offset loads from a VMEM-RESIDENT table, measured at
~1.2-1.5G tile-loads/s (scripts/block_probe.py) — two orders of magnitude
above the XLA gather rate.

Layout ("parity slots"):
  - Vertices are grouped 2x2x2 by coordinate parity. One table ROW
    ([1, 128] lanes) holds one group: the vertex with parity bits
    p = (x&1) + 2*(y&1) + 4*(z&1) owns the INTERLEAVED lane set
    {lane : lane % 8 == p}, i.e. feature f of parity p sits at lane f*8+p
    (interleaved so pltpu.repeat, which tiles, expands per-slot weights to
    w[lane % 8] directly).
  - A trilerp cell's 8 corners have all 8 parities exactly once, so corner
    extraction is a STATIC lane mask — no lane shuffles, no lane
    reductions — and interpolation is 8 masked row FMAs.
  - Row index = dense product indexing over group coords when the level's
    group grid fits its row budget, else the Instant-NGP XOR hash on group
    coords (same primes as ops/encodings.py, applied at 2x coarser
    granularity). Vertices are stored exactly once -> C^0 continuity,
    matching tcnn semantics.

Differentiation strategy: the Pallas op  enc_l = sum_p w_p * T[idx_p]  is
BILINEAR in (w, table), and the spatial-tangent output reuses the same
composed rows with tangent weights dw. The custom VJP therefore only
produces (d_table [in-kernel scatter-RMW, measured ~1G RMW/s],
d_w, d_dw); the trilerp weights w(x), dw(x) stay ordinary XLA math, so
gradients w.r.t. positions — including the second-order terms that
grad-of-output-tangents needs — fall out of XLA autodiff with no
hand-derived Hessian code.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NSLOT = 8
FEAT = LANE // NSLOT  # 16 features per vertex

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class SlotGridSpec:
    """Static geometry of a slot-hash grid.

    Row budget: `rows_per_level` (power of two) for hashed levels; levels
    whose (res//2+1)^3 group grid is <= `rows_per_level` are indexed
    densely (collision-free) with exactly that many rows.
    """

    num_levels: int = 6
    min_res: int = 16
    max_res: int = 512
    rows_per_level: int = 2048
    hash_init_scale: float = 1e-4
    interpolation: str = "Smoothstep"  # Smoothstep | Linear

    def __post_init__(self):
        if self.rows_per_level & (self.rows_per_level - 1):
            raise ValueError("rows_per_level must be a power of two")

    @property
    def features_per_level(self) -> int:
        return FEAT

    @property
    def growth_factor(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp((np.log(self.max_res) - np.log(self.min_res)) / (self.num_levels - 1))
        )

    @property
    def resolutions(self) -> np.ndarray:
        levels = np.arange(self.num_levels)
        return np.floor(self.min_res * self.growth_factor ** levels).astype(np.int32)

    @property
    def level_rows(self) -> np.ndarray:
        gdims = self.resolutions // 2 + 1
        dense = gdims.astype(np.int64) ** 3
        return np.where(dense <= self.rows_per_level, dense, self.rows_per_level).astype(
            np.int64
        )

    @property
    def level_offsets(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.level_rows)[:-1]]).astype(np.int64)

    @property
    def total_rows(self) -> int:
        total = int(self.level_rows.sum())
        return ((total + 7) // 8) * 8  # sublane-tile multiple

    @property
    def out_dim(self) -> int:
        return self.num_levels * FEAT


# ---------------------------------------------------------- host geometry

def slot_geometry(
    x: jnp.ndarray, spec: SlotGridSpec, num_levels: Optional[int] = None
):
    """Row indices and (differentiable) trilerp weights for all slots.

    x: [N, 3] in [0, 1]. Returns (idx [N, K*8] int32, w [N, K*8] f32,
    dw [3, N, K*8] f32) with K = effective levels. idx is constant in x;
    w/dw are plain XLA functions of x (autodiff carries position
    gradients, including second order, through them).
    """
    k = min(num_levels, spec.num_levels) if num_levels is not None else spec.num_levels
    res = spec.resolutions[:k]
    rows = spec.level_rows[:k]
    offs = spec.level_offsets[:k]
    gdims = (res // 2 + 1).astype(np.int64)
    dense_level = gdims ** 3 <= spec.rows_per_level

    idx_cols, w_cols, dw_cols = [], [], []
    for l in range(k):
        r = float(res[l])
        scaled = x * r
        base = jnp.floor(scaled)
        t = scaled - base
        if spec.interpolation == "Smoothstep":
            s = t * t * (3.0 - 2.0 * t)
            ds = 6.0 * t * (1.0 - t) * r  # d s / d x (chain rule through x*r)
        elif spec.interpolation == "Linear":
            s = t
            ds = jnp.full_like(t, r)
        else:
            raise ValueError(f"unknown interpolation {spec.interpolation}")
        b = jnp.clip(base.astype(jnp.int32), 0, int(res[l]) - 1)
        par = b & 1
        gb = b >> 1
        for p in range(NSLOT):
            pb = np.array([p & 1, (p >> 1) & 1, (p >> 2) & 1], dtype=np.int32)
            d = jnp.bitwise_xor(par, pb[None, :])  # [N, 3] corner offset 0/1
            g = gb + (par & d)  # group coord of this corner (carry when both 1)
            if dense_level[l]:
                gd = int(gdims[l])
                row = g[:, 0] + g[:, 1] * gd + g[:, 2] * gd * gd
            else:
                gu = g.astype(jnp.uint32)
                h = gu[:, 0] * _PRIMES[0]
                h = jnp.bitwise_xor(h, gu[:, 1] * _PRIMES[1])
                h = jnp.bitwise_xor(h, gu[:, 2] * _PRIMES[2])
                row = (h & np.uint32(int(rows[l]) - 1)).astype(jnp.int32)
            idx_cols.append((row + np.int32(offs[l])).astype(jnp.int32))

            df = d.astype(x.dtype)
            wa = df * s + (1.0 - df) * (1.0 - s)  # [N, 3] per-axis weight
            dwa = (2.0 * df - 1.0) * ds  # d wa / d x
            w_cols.append(wa[:, 0] * wa[:, 1] * wa[:, 2])
            dw_cols.append(
                jnp.stack(
                    [
                        dwa[:, 0] * wa[:, 1] * wa[:, 2],
                        wa[:, 0] * dwa[:, 1] * wa[:, 2],
                        wa[:, 0] * wa[:, 1] * dwa[:, 2],
                    ]
                )
            )  # [3, N]
    idx = jnp.stack(idx_cols, axis=-1)  # [N, K*8]
    w = jnp.stack(w_cols, axis=-1)
    dw = jnp.stack(dw_cols, axis=-1)  # [3, N, K*8]
    return idx, w, dw


@functools.lru_cache(maxsize=None)
def _sum_matrices(levels: int):
    """S  [levels*128, levels*FEAT]: slot-sum (lane l*128 + f*8 + p -> out
    l*FEAT + f); S2 [levels*128, levels*8]: per-slot sum (-> out l*8 + p)."""
    c = np.arange(levels * LANE)
    lev = c // LANE
    lane = c % LANE
    f = lane // NSLOT
    p = lane % NSLOT
    o1 = np.arange(levels * FEAT)
    s1 = ((lev[:, None] == o1[None] // FEAT) & (f[:, None] == o1[None] % FEAT))
    o2 = np.arange(levels * NSLOT)
    s2 = ((lev[:, None] == o2[None] // NSLOT) & (p[:, None] == o2[None] % NSLOT))
    return s1.astype(np.float32), s2.astype(np.float32)


def _slot_masks():
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    return [(lane % NSLOT) == p for p in range(NSLOT)]


# ------------------------------------------------------------ fwd kernel
#
# Inner-loop structure (variant B of scripts/slot_probe.py, measured ~2x
# over the per-sample variant): process 8 samples per group — the scalar
# phase loads each (slot, sample) row into an [8, 128] scratch tile with
# the SAMPLE in the sublane dim, so the interpolation FMAs run at full
# vreg width with per-sample weights as lane-broadcast [8, 1] columns.

def _compose_group(levels, idx_ref, tbl_ref, g_scr, s0, masks):
    """Scalar phase: gather this group's 8x8xL rows into slot tiles, then
    return the slot-composed [8, LANE] tile per level."""
    for l in range(levels):
        for p in range(NSLOT):
            for s in range(8):
                row = idx_ref[s0 + s, l * NSLOT + p]
                g_scr[pl.ds((l * NSLOT + p) * 8 + s, 1), :] = tbl_ref[
                    pl.ds(row, 1), :
                ]
    comps = []
    for l in range(levels):
        comp = jnp.zeros((8, LANE), jnp.float32)
        for p in range(NSLOT):
            tile8 = g_scr[pl.ds((l * NSLOT + p) * 8, 8), :]
            comp = comp + jnp.where(masks[p], tile8, 0.0)
        comps.append(comp)
    return comps


def _fwd_kernel(levels, n_tang, *refs):
    q = 0
    idx_ref = refs[q]; q += 1
    w_ref = refs[q]; q += 1
    dw_ref = None
    if n_tang:
        dw_ref = refs[q]; q += 1
    tbl_ref = refs[q]; q += 1
    s_ref = refs[q]; q += 1
    enc_ref = refs[q]; q += 1
    tenc_ref = None
    if n_tang:
        tenc_ref = refs[q]; q += 1
    acc_scr = refs[q]; q += 1
    tacc_scr = None
    if n_tang:
        tacc_scr = refs[q]; q += 1
    g_scr = refs[q]

    b = idx_ref.shape[0]
    masks = _slot_masks()

    def body(g, _):
        s0 = g * 8
        comps = _compose_group(levels, idx_ref, tbl_ref, g_scr, s0, masks)
        rows_enc = []
        rows_t = [[] for _ in range(n_tang)]
        for l in range(levels):
            w88 = w_ref[pl.ds(s0, 8), pl.ds(l * NSLOT, NSLOT)]  # [8, 8]
            rows_enc.append(comps[l] * pltpu.repeat(w88, FEAT, axis=1))
            for t in range(n_tang):
                d88 = dw_ref[t, pl.ds(s0, 8), pl.ds(l * NSLOT, NSLOT)].reshape(
                    8, NSLOT
                )
                rows_t[t].append(comps[l] * pltpu.repeat(d88, FEAT, axis=1))
        acc_scr[pl.ds(s0, 8), :] = jnp.concatenate(rows_enc, axis=1)
        for t in range(n_tang):
            tacc_scr[t, pl.ds(s0, 8), :] = jnp.concatenate(rows_t[t], axis=1)
        return 0

    jax.lax.fori_loop(0, b // 8, body, 0)

    s_mat = s_ref[:]
    enc_ref[:] = jnp.dot(acc_scr[:], s_mat, preferred_element_type=jnp.float32)
    for t in range(n_tang):
        tenc_ref[t] = jnp.dot(tacc_scr[t], s_mat, preferred_element_type=jnp.float32)


# ------------------------------------------------------------ bwd kernel

def _bwd_kernel(levels, n_tang, *refs):
    q = 0
    idx_ref = refs[q]; q += 1
    w_ref = refs[q]; q += 1
    dw_ref = None
    if n_tang:
        dw_ref = refs[q]; q += 1
    genc_ref = refs[q]; q += 1
    gtenc_ref = None
    if n_tang:
        gtenc_ref = refs[q]; q += 1
    tbl_ref = refs[q]; q += 1
    s_ref = refs[q]; q += 1
    s2_ref = refs[q]; q += 1
    dtbl_ref = refs[q]; q += 1
    dw_out = refs[q]; q += 1
    ddw_out = None
    if n_tang:
        ddw_out = refs[q]; q += 1
    gt_scr = refs[q]; q += 1
    gtk_scr = None
    if n_tang:
        gtk_scr = refs[q]; q += 1
    comp_scr = refs[q]; q += 1
    g_scr = refs[q]

    b = idx_ref.shape[0]
    masks = _slot_masks()
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

    # tile the incoming cotangents back to slot-lane layout: Gt = g @ S^T
    s_mat = s_ref[:]
    gt_scr[:] = jax.lax.dot_general(
        genc_ref[:], s_mat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for t in range(n_tang):
        gtk_scr[t] = jax.lax.dot_general(
            gtenc_ref[t], s_mat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def body(g, _):
        s0 = g * 8
        comps = _compose_group(levels, idx_ref, tbl_ref, g_scr, s0, masks)
        for l in range(levels):
            # scatter value for this level's rows, all 8 samples at once
            w88 = w_ref[pl.ds(s0, 8), pl.ds(l * NSLOT, NSLOT)]
            v = gt_scr[pl.ds(s0, 8), pl.ds(l * LANE, LANE)] * pltpu.repeat(
                w88, FEAT, axis=1
            )
            for t in range(n_tang):
                d88 = dw_ref[t, pl.ds(s0, 8), pl.ds(l * NSLOT, NSLOT)].reshape(
                    8, NSLOT
                )
                v = v + gtk_scr[t, pl.ds(s0, 8), pl.ds(l * LANE, LANE)] * pltpu.repeat(
                    d88, FEAT, axis=1
                )
            for p in range(NSLOT):
                vm = jnp.where(masks[p], v, 0.0)
                for s in range(8):
                    row = idx_ref[s0 + s, l * NSLOT + p]
                    dtbl_ref[pl.ds(row, 1), :] = (
                        dtbl_ref[pl.ds(row, 1), :] + vm[s : s + 1, :]
                    )
        comp_scr[pl.ds(s0, 8), :] = jnp.concatenate(comps, axis=1)
        return 0

    jax.lax.fori_loop(0, b // 8, body, 0)

    s2 = s2_ref[:]
    dw_out[:] = jnp.dot(comp_scr[:] * gt_scr[:], s2, preferred_element_type=jnp.float32)
    for t in range(n_tang):
        ddw_out[t] = jnp.dot(
            comp_scr[:] * gtk_scr[t], s2, preferred_element_type=jnp.float32
        )


# ------------------------------------------------------------- pallas glue

@functools.lru_cache(maxsize=None)
def _build_calls(levels, n_tang, rows, block, n_total, interpret):
    w_cols = levels * NSLOT
    enc_w = levels * FEAT
    grid = (n_total // block,)

    def blk(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    idx_spec = blk((block, w_cols), lambda i: (i, 0))
    w_spec = blk((block, w_cols), lambda i: (i, 0))
    dw_spec = blk((3, block, w_cols), lambda i: (0, i, 0))
    tbl_spec = blk((rows, LANE), lambda i: (0, 0))
    s_spec = blk((levels * LANE, enc_w), lambda i: (0, 0))
    s2_spec = blk((levels * LANE, w_cols), lambda i: (0, 0))
    enc_spec = blk((block, enc_w), lambda i: (i, 0))
    tenc_spec = blk((3, block, enc_w), lambda i: (0, i, 0))

    fwd_in = [idx_spec, w_spec] + ([dw_spec] if n_tang else []) + [tbl_spec, s_spec]
    fwd_out = [enc_spec] + ([tenc_spec] if n_tang else [])
    fwd_shapes = [jax.ShapeDtypeStruct((n_total, enc_w), jnp.float32)] + (
        [jax.ShapeDtypeStruct((3, n_total, enc_w), jnp.float32)] if n_tang else []
    )
    fwd_scratch = [pltpu.VMEM((block, levels * LANE), jnp.float32)] + (
        [pltpu.VMEM((3, block, levels * LANE), jnp.float32)] if n_tang else []
    ) + [pltpu.VMEM((levels * NSLOT * 8, LANE), jnp.float32)]
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, levels, n_tang),
        grid=grid,
        in_specs=fwd_in,
        out_specs=fwd_out,
        out_shape=fwd_shapes,
        scratch_shapes=fwd_scratch,
        interpret=interpret,
    )

    bwd_in = (
        [idx_spec, w_spec]
        + ([dw_spec] if n_tang else [])
        + [enc_spec]
        + ([tenc_spec] if n_tang else [])
        + [tbl_spec, s_spec, s2_spec]
    )
    bwd_out = [tbl_spec, blk((block, w_cols), lambda i: (i, 0))] + (
        [blk((3, block, w_cols), lambda i: (0, i, 0))] if n_tang else []
    )
    bwd_shapes = [
        jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_total, w_cols), jnp.float32),
    ] + ([jax.ShapeDtypeStruct((3, n_total, w_cols), jnp.float32)] if n_tang else [])
    bwd_scratch = [pltpu.VMEM((block, levels * LANE), jnp.float32)] + (
        [pltpu.VMEM((3, block, levels * LANE), jnp.float32)] if n_tang else []
    ) + [
        pltpu.VMEM((block, levels * LANE), jnp.float32),
        pltpu.VMEM((levels * NSLOT * 8, LANE), jnp.float32),
    ]
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, levels, n_tang),
        grid=grid,
        in_specs=bwd_in,
        out_specs=bwd_out,
        out_shape=bwd_shapes,
        scratch_shapes=bwd_scratch,
        interpret=interpret,
    )
    return fwd_call, bwd_call


@functools.lru_cache(maxsize=None)
def _lookup_fn(levels, rows, block, interpret, n_tang):
    """custom_vjp op over padded arrays: (table, idx, w[, dw]) -> enc[, tenc]."""
    s1, s2 = _sum_matrices(levels)

    if n_tang:

        @jax.custom_vjp
        def op(table, idx, w, dw):
            n_total = idx.shape[0]
            fwd_call, _ = _build_calls(levels, n_tang, rows, block, n_total, interpret)
            enc, tenc = fwd_call(idx, w, dw, table, jnp.asarray(s1))
            return enc, tenc

        def op_fwd(table, idx, w, dw):
            return op(table, idx, w, dw), (table, idx, w, dw)

        def op_bwd(res, g):
            table, idx, w, dw = res
            genc, gtenc = g
            n_total = idx.shape[0]
            _, bwd_call = _build_calls(levels, n_tang, rows, block, n_total, interpret)
            d_table, d_w, d_dw = bwd_call(
                idx, w, dw, genc.astype(jnp.float32), gtenc.astype(jnp.float32),
                table, jnp.asarray(s1), jnp.asarray(s2),
            )
            d_idx = np.zeros(idx.shape, jax.dtypes.float0)
            return d_table, d_idx, d_w, d_dw

        op.defvjp(op_fwd, op_bwd)
        return op

    @jax.custom_vjp
    def op0(table, idx, w):
        n_total = idx.shape[0]
        fwd_call, _ = _build_calls(levels, 0, rows, block, n_total, interpret)
        return fwd_call(idx, w, table, jnp.asarray(s1))[0]

    def op0_fwd(table, idx, w):
        return op0(table, idx, w), (table, idx, w)

    def op0_bwd(res, genc):
        table, idx, w = res
        n_total = idx.shape[0]
        _, bwd_call = _build_calls(levels, 0, rows, block, n_total, interpret)
        d_table, d_w = bwd_call(
            idx, w, genc.astype(jnp.float32), table, jnp.asarray(s1), jnp.asarray(s2)
        )
        d_idx = np.zeros(idx.shape, jax.dtypes.float0)
        return d_table, d_idx, d_w

    op0.defvjp(op0_fwd, op0_bwd)
    return op0


DEFAULT_BLOCK = 128


def slot_grid_lookup(
    table: jnp.ndarray,
    x: jnp.ndarray,
    spec: SlotGridSpec,
    num_levels: Optional[int] = None,
    with_tangents: bool = False,
    block: int = 0,
    interpret: Optional[bool] = None,
):
    """Slot-grid encoding (and optionally its spatial tangents).

    table: [spec.total_rows, 128] parameters. x: [N, 3] in [0, 1].
    Returns enc [N, out_dim] (zero-padded on truncated fine levels), and
    tenc [3, N, out_dim] = d enc / d x when with_tangents.

    Gradients w.r.t. table flow through the in-kernel scatter; gradients
    w.r.t. x flow through the XLA trilerp weights (second order included).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not block:
        block = DEFAULT_BLOCK
    k = min(num_levels, spec.num_levels) if num_levels is not None else spec.num_levels
    n = x.shape[0]
    idx, w, dw = slot_geometry(x, spec, k)

    n_pad = ((n + block - 1) // block) * block
    pad = n_pad - n
    if pad:
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
        dw = jnp.pad(dw, ((0, 0), (0, pad), (0, 0)))

    op = _lookup_fn(k, spec.total_rows, block, interpret, 3 if with_tangents else 0)
    if with_tangents:
        enc, tenc = op(table, idx, w, dw)
        enc, tenc = enc[:n], tenc[:, :n]
    else:
        enc = op(table, idx, w)[:n]
        tenc = None

    if k < spec.num_levels:
        padf = (spec.num_levels - k) * FEAT
        enc = jnp.pad(enc, ((0, 0), (0, padf)))
        if tenc is not None:
            tenc = jnp.pad(tenc, ((0, 0), (0, 0), (0, padf)))
    return (enc, tenc) if with_tangents else enc


class SlotEncoding:
    """Flax-free init helper mirroring HashEncoding's param contract."""


def make_table_init(spec: SlotGridSpec):
    def init(key, shape=None, dtype=jnp.float32):
        return (
            jax.random.uniform(
                key, (spec.total_rows, LANE), dtype, minval=-1.0, maxval=1.0
            )
            * spec.hash_init_scale
        )

    return init
