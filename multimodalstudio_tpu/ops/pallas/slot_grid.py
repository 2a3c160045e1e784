"""Slot-hash grid: a VMEM-resident multiresolution feature grid for TPU.

The TPU-native answer to tiny-cuda-nn's CUDA HashGrid (reference
src/field_components/encodings.py:184-310) for the production grid method.
The XLA-gather hash grid (ops/encodings.py) runs at the HBM gather-issue
roofline (~95-141M rows/s, docs/performance.md section 3), which pins the
grid method at ~1-2K rays/s. This module replaces random HBM row gathers
with dynamic sublane-offset loads from a VMEM-RESIDENT table, measured at
~1.2-1.5G tile-loads/s (scripts/block_probe.py) — two orders of magnitude
above the XLA gather rate.

Two layouts (SlotGridSpec.layout):

"vertex" (exact tcnn semantics):
  - Vertices are grouped 2x2x2 by coordinate parity. One table ROW
    ([1, 128] lanes) holds one group: the vertex with parity bits
    p = (x&1) + 2*(y&1) + 4*(z&1) owns the INTERLEAVED lane set
    {lane : lane % 8 == p}, i.e. feature f of parity p sits at lane f*8+p.
  - A trilerp cell's 8 corners have all 8 parities exactly once, so corner
    extraction is a STATIC lane mask — no lane shuffles, no lane
    reductions.
  - Row index = dense product indexing over group coords when the level's
    group grid fits its row budget, else the Instant-NGP XOR hash on group
    coords (same primes as ops/encodings.py, applied at 2x coarser
    granularity). Vertices are stored exactly once -> C^0 continuity,
    matching tcnn semantics. Cost: 8 row copies per (sample, level) — and
    the scalar core's copy-issue rate (~354M row-copies/s measured,
    scripts/slot_phase.py) is the roofline that pins this layout at
    ~7M samples/s forward, ~2M samples/s with backward.

"cell" (TPU-native, 8x fewer copies):
  - One row per (CELL, level): lane f*8+p holds feature f of the cell's
    corner p (corner offset bits p = dx + 2*dy + 4*dz). A lookup is ONE
    row copy per (sample, level); the backward is ONE scatter-add.
  - Row index = dense cell indexing when res^3 fits the row budget, else
    the XOR hash on the cell coordinate.
  - PACKED ENTRIES (round 4, `feats` < 16): with F features per entry a
    whole trilerp neighbourhood needs only 8*F lanes, so one 128-lane
    physical row packs P = 128/(8F) independent ENTRIES (tcnn's default is
    F=2 -> P=8). The one-hot matmul gathers the PHYSICAL row (entries/P
    rows per level -> P-fold fewer MACs per entry at equal capacity); the
    per-sample entry-within-row selection is a lane mask (iota compare
    against the entry-group id) multiplied into the composed rows — no
    extra matmuls, no lane shuffles. Entry index e = hash & (entries-1);
    physical row = e >> log2(P); group = e & (P-1).
  - Corner values are per-cell parameters: the field is trilinear INSIDE
    each cell but not C^0 across cell faces (adjacent cells own separate
    copies of their shared corners, and hashed levels alias whole cells).
    The training losses (data + eikonal + curvature taps straddling faces)
    drive neighbouring rows toward consistency; the quality cost vs the
    exact layout is measured on the 1500-step harness
    (scripts/quality_check.py) — this is the deliberate TPU trade: tcnn's
    per-vertex HBM gathers are free on GPU (thousands of threads), while
    on TPU the scalar-issue roofline makes copy COUNT the only lever.

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

from multimodalstudio_tpu.ops.pallas.fused_mlp import _compiler_params

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
    rows_per_level: int = 2048  # ENTRY budget per level (power of two)
    hash_init_scale: float = 1e-4
    interpolation: str = "Smoothstep"  # Smoothstep | Linear
    layout: str = "vertex"  # vertex (exact C^0) | cell (1 copy/sample-level)
    # Features per entry (tcnn n_features_per_level, reference
    # encodings.py:48-67 default 2). feats < 16 packs P = 128/(8*feats)
    # entries per physical row (cell+onehot only): the one-hot matmul cost
    # per entry drops P-fold at equal capacity.
    feats: int = FEAT
    # "f32": table split bf16 hi+lo per MXU dot (~f32-exact, 2 matmuls).
    # "bf16": single bf16 dot per gather/scatter — half the MACs; matches
    # tcnn's fp16 tables (master params stay f32, gradients accumulate f32).
    table_dtype: str = "f32"
    # Row-access strategy for the cell layout:
    #   "copy"   — scalar-core row copies / scatter-RMWs (one per
    #              sample-level). Bound by the v5e copy-issue rate.
    #   "onehot" — gather = onehot(idx) @ table and scatter-add =
    #              onehot(idx)^T @ u on the MXU, with the table split into
    #              bf16 hi + lo halves (error ~2^-16 relative, vs exact
    #              f32 copies). Turns the row access into dense matmul
    #              work — the in-VMEM regime where one-hot WINS (the
    #              docs/performance.md §3 one-hot-loses measurement was
    #              an HBM-resident XLA one-hot).
    #   "auto"   — onehot for the cell layout, copy for vertex.
    gather: str = "auto"

    def __post_init__(self):
        if self.rows_per_level & (self.rows_per_level - 1):
            raise ValueError("rows_per_level must be a power of two")
        if self.layout not in ("vertex", "cell"):
            raise ValueError(f"unknown slot-grid layout {self.layout!r}")
        if self.gather not in ("auto", "copy", "onehot"):
            raise ValueError(f"unknown slot-grid gather {self.gather!r}")
        if self.gather == "onehot" and self.layout != "cell":
            raise ValueError("gather='onehot' requires layout='cell'")
        if self.feats not in (2, 4, 8, 16):
            raise ValueError("feats must be one of 2, 4, 8, 16")
        if self.feats != FEAT and (
            self.layout != "cell" or self.resolved_gather != "onehot"
        ):
            raise ValueError("packed entries (feats<16) need layout='cell' onehot")
        if self.table_dtype not in ("f32", "bf16"):
            raise ValueError(f"unknown table_dtype {self.table_dtype!r}")
        if self.table_dtype == "bf16" and self.resolved_gather != "onehot":
            raise ValueError("table_dtype='bf16' requires the onehot gather")
        if self.rows_per_level < self.entries_per_row:
            raise ValueError("rows_per_level must be >= entries per row")

    @property
    def resolved_gather(self) -> str:
        if self.gather == "auto":
            return "onehot" if self.layout == "cell" else "copy"
        return self.gather

    @property
    def entries_per_row(self) -> int:
        """Independent hash entries packed into one 128-lane physical row."""
        return LANE // (NSLOT * self.feats)

    @property
    def features_per_level(self) -> int:
        return self.feats

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
    def level_entries(self) -> np.ndarray:
        """ENTRY count per level (dense when the grid fits the budget)."""
        if self.layout == "cell":
            dense = self.resolutions.astype(np.int64) ** 3
        else:
            gdims = self.resolutions // 2 + 1
            dense = gdims.astype(np.int64) ** 3
        return np.where(dense <= self.rows_per_level, dense, self.rows_per_level).astype(
            np.int64
        )

    @property
    def level_rows(self) -> np.ndarray:
        """PHYSICAL 128-lane row count per level (= entries / entries_per_row)."""
        p = self.entries_per_row
        return (self.level_entries + p - 1) // p

    @property
    def level_offsets(self) -> np.ndarray:
        # each level starts on an 8-row sublane-tile boundary so the
        # kernels can take static per-level table slices
        aligned = ((self.level_rows + 7) // 8) * 8
        return np.concatenate([[0], np.cumsum(aligned)[:-1]]).astype(np.int64)

    @property
    def total_rows(self) -> int:
        aligned = ((self.level_rows + 7) // 8) * 8
        return int(aligned.sum())

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.feats


# ---------------------------------------------------------- host geometry

def slot_geometry(
    x: jnp.ndarray, spec: SlotGridSpec, num_levels: Optional[int] = None
):
    """Row indices and (differentiable) trilerp weights for all slots.

    x: [N, 3] in [0, 1]. Returns (idx, w [N, K*8] f32, dw [N, 3*K*8] f32)
    with K = effective levels; idx is [N, K*8] int32 for the vertex layout
    (one row per corner) and [N, K] for the cell layout (one row per
    sample-level). dw column t*K*8 + c is d w[:, c] / d x[:, t]. idx is
    constant in x; w/dw are plain XLA functions of x (autodiff carries
    position gradients, including second order, through them). dw is 2D
    with the tangent axis FOLDED INTO LANES: a leading [3, N, K*8] axis
    makes both the XLA->Pallas operand layout conversion and the in-kernel
    3D-ref slices ~2.2x slower (measured, scripts/slot_gap3.py C-vs-D).
    """
    k = min(num_levels, spec.num_levels) if num_levels is not None else spec.num_levels
    n = x.shape[0]
    res = spec.resolutions[:k]
    ents = spec.level_entries[:k]
    offs = spec.level_offsets[:k]  # physical-row offsets
    pk = spec.entries_per_row
    cell = spec.layout == "cell"
    gdims = (res // 2 + 1).astype(np.int64)
    dense_level = (
        res.astype(np.int64) ** 3 <= spec.rows_per_level
        if cell
        else gdims ** 3 <= spec.rows_per_level
    )

    # all-corner offset bits [8, 3] (slot-vectorized: per-column [N] loops
    # stack 48 lane-to-sublane relayouts — measured as most of the op's
    # XLA-side overhead)
    pb_all = np.stack(
        [[p & 1, (p >> 1) & 1, (p >> 2) & 1] for p in range(NSLOT)]
    ).astype(np.int32)

    # LEVEL-VECTORIZED: one set of [N, K, ...] ops regardless of K (the
    # per-level Python loop was ~30 eqns x K x callsite of the grid
    # program's jaxpr — a large slice of both compile time and the
    # XLA-side glue). Per-level constants become [K]-vectors; the
    # dense-vs-hashed row formula is computed both ways and selected by
    # the static dense_level mask.
    resf = jnp.asarray(res.astype(np.float32))  # [K]
    scaled = x[:, None, :] * resf[None, :, None]  # [N, K, 3]
    base = jnp.floor(scaled)
    t = scaled - base
    if spec.interpolation == "Smoothstep":
        s = t * t * (3.0 - 2.0 * t)
        ds = 6.0 * t * (1.0 - t) * resf[None, :, None]  # chain rule through x*r
    elif spec.interpolation == "Linear":
        s = t
        ds = jnp.broadcast_to(resf[None, :, None], t.shape)
    else:
        raise ValueError(f"unknown interpolation {spec.interpolation}")
    b = jnp.clip(
        base.astype(jnp.int32), 0, jnp.asarray((res - 1).astype(np.int32))[None, :, None]
    )  # [N, K, 3]
    hash_mask = jnp.asarray((ents - 1).astype(np.uint32))  # [K] entry mask
    dense_sel = jnp.asarray(dense_level)  # [K] bool

    def _hash(coord):  # coord [..., K, 3] uint32 -> [..., K]
        h = coord[..., 0] * _PRIMES[0]
        h = jnp.bitwise_xor(h, coord[..., 1] * _PRIMES[1])
        h = jnp.bitwise_xor(h, coord[..., 2] * _PRIMES[2])
        return h

    if cell:
        # one ENTRY per cell; lane slot p = corner offset bits. idx is the
        # ABSOLUTE entry index (physical_row_offset * entries_per_row + e):
        # kernels derive physical row (>> log2 P) and entry group (& P-1).
        rr = jnp.asarray(res.astype(np.int32))  # [K]
        row_dense = b[..., 0] + (b[..., 1] + b[..., 2] * rr[None, :]) * rr[None, :]
        row_hash = (_hash(b.astype(jnp.uint32)) & hash_mask[None, :]).astype(jnp.int32)
        row = jnp.where(dense_sel[None, :], row_dense, row_hash)
        idx = row + jnp.asarray((offs * pk).astype(np.int32))[None, :]  # [N, K]
        d8 = jnp.broadcast_to(pb_all[None, None], (n, k, NSLOT, 3))  # [N, K, 8, 3]
    else:
        par = b & 1
        gb = b >> 1
        d8 = jnp.bitwise_xor(par[:, :, None, :], pb_all[None, None])  # [N, K, 8, 3]
        g8 = gb[:, :, None, :] + (par[:, :, None, :] & d8)
        gd = jnp.asarray(gdims.astype(np.int32))  # [K]
        row_dense = (
            g8[..., 0] + (g8[..., 1] + g8[..., 2] * gd[None, :, None]) * gd[None, :, None]
        )  # [N, K, 8]
        row_hash = (
            _hash(g8.astype(jnp.uint32)) & hash_mask[None, :, None]
        ).astype(jnp.int32)
        row8 = jnp.where(dense_sel[None, :, None], row_dense, row_hash)
        idx = (row8 + jnp.asarray(offs.astype(np.int32))[None, :, None]).reshape(
            n, k * NSLOT
        )

    df = d8.astype(x.dtype)  # [N, K, 8, 3]
    s4 = s[:, :, None, :]
    wa = df * s4 + (1.0 - df) * (1.0 - s4)  # [N, K, 8, 3]
    dwa = (2.0 * df - 1.0) * ds[:, :, None, :]
    w = (wa[..., 0] * wa[..., 1] * wa[..., 2]).reshape(n, k * NSLOT)
    # t-major column blocks: col t*(K*8) + c with c = level*8 + slot
    dw = jnp.concatenate(
        [
            (dwa[..., 0] * wa[..., 1] * wa[..., 2]).reshape(n, k * NSLOT),
            (wa[..., 0] * dwa[..., 1] * wa[..., 2]).reshape(n, k * NSLOT),
            (wa[..., 0] * wa[..., 1] * dwa[..., 2]).reshape(n, k * NSLOT),
        ],
        axis=-1,
    )  # [N, 3*K*8]
    return idx, w, dw


@functools.lru_cache(maxsize=None)
def _sum_matrices(levels: int, feats: int = FEAT):
    """S  [levels*128, levels*feats]: slot-sum (lane l*128 + e*8F + f*8 + p
    -> out l*feats + f, for EVERY packed entry e — the per-sample entry
    selection happens via the lane gate on the composed rows);
    S2 [levels*128, levels*8]: per-slot sum (-> out l*8 + p)."""
    c = np.arange(levels * LANE)
    lev = c // LANE
    lane = c % LANE
    f = (lane % (NSLOT * feats)) // NSLOT
    p = lane % NSLOT
    o1 = np.arange(levels * feats)
    s1 = ((lev[:, None] == o1[None] // feats) & (f[:, None] == o1[None] % feats))
    o2 = np.arange(levels * NSLOT)
    s2 = ((lev[:, None] == o2[None] // NSLOT) & (p[:, None] == o2[None] % NSLOT))
    return s1.astype(np.float32), s2.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _expand_matrix(levels: int, feats: int = FEAT):
    """P [levels*8, levels*128]: lane-expands per-slot weight columns
    (col l*8+p spreads to lanes l*128 + e*8F + f*8 + p for every packed
    entry e and feature f), so the whole block's weight expansion is ONE
    small MXU matmul instead of per-group pltpu.repeat (measured ~4x
    slower from [8, 8] sub-vreg sources) or 8 lane-broadcast FMAs per
    (group, level)."""
    r = np.arange(levels * NSLOT)
    c = np.arange(levels * LANE)
    return (
        ((r // NSLOT)[:, None] == c[None] // LANE)
        & ((r % NSLOT)[:, None] == (c % LANE) % NSLOT)
    ).astype(np.float32)


def _slot_masks():
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    return [(lane % NSLOT) == p for p in range(NSLOT)]


# ------------------------------------------------------------ fwd kernel
#
# Structure: a scalar gather loop fills comp_scr [block, levels*128] with
# per-sample "composed" rows (vertex: masked-sum of the 8 parity-slot rows,
# grouped 8 samples at a time — variant B of scripts/slot_probe.py; cell:
# the row itself, copied straight in). EVERYTHING else is whole-block
# dense math: per-slot weights lane-expand via one small MXU matmul
# (w @ P), interpolation is one elementwise multiply per output, and the
# slot reduction is the S matmul. No per-group vector work remains.

def _hi_lo(x):
    """Split f32 -> (bf16 hi, bf16 lo) with x ~= hi + lo to ~2^-16 relative.

    Exact 0/1 matrices (one-hot, S, P) contract bf16 operands losslessly,
    so hi/lo-splitting the VALUE operand of each MXU dot keeps the onehot
    path numerically equivalent to the f32 copy path at 2x the matmuls."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_hl(x, m):
    """x (f32) @ m (exact 0/1 bf16) via the hi/lo split, f32 accumulate."""
    hi, lo = _hi_lo(x)
    kw = dict(preferred_element_type=jnp.float32)
    return jnp.dot(hi, m, **kw) + jnp.dot(lo, m, **kw)


def _dot_b(x, m):
    """Single-bf16 dot (table_dtype='bf16'): half the MACs of _dot_hl."""
    return jnp.dot(
        x.astype(jnp.bfloat16), m, preferred_element_type=jnp.float32
    )


def _dotg_b(x, m, dn):
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), m,
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )


def _split_entry(idx, pk):
    """Absolute entry index -> (physical row, entry group within row)."""
    if pk == 1:
        return idx, None
    shift = pk.bit_length() - 1
    return jax.lax.shift_right_logical(idx, shift), jnp.bitwise_and(idx, pk - 1)


def _entry_iota(b):
    return jax.lax.broadcasted_iota(jnp.int32, (b, LANE), 1)


def _fwd_kernel(levels, n_tang, want_comp, cell, lv, onehot, pk, tdt, *refs):
    q = 0
    idx_ref = refs[q]; q += 1
    w_ref = refs[q]; q += 1
    dw_ref = None
    if n_tang:
        dw_ref = refs[q]; q += 1
    if onehot:
        tblh_ref = refs[q]; q += 1
        tbll_ref = None
        if not tdt:
            tbll_ref = refs[q]; q += 1
    else:
        tbl_ref = refs[q]; q += 1
    s_ref = refs[q]; q += 1
    p_ref = refs[q]; q += 1
    enc_ref = refs[q]; q += 1
    tenc_ref = None
    if n_tang:
        tenc_ref = refs[q]; q += 1
    comp_ref = None
    if want_comp:
        comp_ref = refs[q]; q += 1
    comp_scr = refs[q]; q += 1
    g_scr = None
    if not onehot:
        g_scr = refs[q]; q += 1

    b = idx_ref.shape[0]
    wc = levels * NSLOT
    ll = levels * LANE
    # when the comp residual is an output, gather straight into it
    cdst = comp_ref if want_comp else comp_scr

    if onehot:
        # MXU gather: comp_l = onehot(phys_l) @ T_l over PHYSICAL rows
        # (pk entries packed per row -> pk-fold fewer MACs per entry); the
        # per-sample entry group gates the lanes at write time, so the
        # composed-row residual is already entry-selected. f32 tables are
        # hi/lo-split per dot (exact 0/1 one-hot); bf16 tables use one dot.
        phys, grp = _split_entry(idx_ref[:], pk)
        iotas = {
            rl: jax.lax.broadcasted_iota(jnp.int32, (b, rl), 1)
            for rl in {rl for _, rl in lv}
        }  # shared across levels (usually one distinct row budget)
        ent = _entry_iota(b) // (LANE // pk) if pk > 1 else None
        for l, (off, rl) in enumerate(lv):
            rel = phys[:, l : l + 1] - off  # [b, 1]
            oh = (iotas[rl] == rel).astype(jnp.bfloat16)
            th = tblh_ref[pl.ds(off, rl), :]
            row = jnp.dot(oh, th, preferred_element_type=jnp.float32)
            if not tdt:
                tl = tbll_ref[pl.ds(off, rl), :]
                row = row + jnp.dot(oh, tl, preferred_element_type=jnp.float32)
            if pk > 1:
                row = row * (ent == grp[:, l : l + 1]).astype(jnp.float32)
            cdst[:, pl.ds(l * LANE, LANE)] = row
    elif cell:
        # stage each 8-sample group through g_scr: Mosaic supports [1, 128]
        # stores at dynamic sublanes only at lane offset 0, and [8, 128]
        # moves at 8-aligned dynamic sublanes with static lane offsets
        def body(g, _):
            s0 = g * 8
            for l in range(levels):
                for s in range(8):
                    row = idx_ref[s0 + s, l]
                    g_scr[pl.ds(l * 8 + s, 1), :] = tbl_ref[pl.ds(row, 1), :]
            for l in range(levels):
                cdst[pl.ds(s0, 8), pl.ds(l * LANE, LANE)] = g_scr[pl.ds(l * 8, 8), :]
            return 0

        jax.lax.fori_loop(0, b // 8, body, 0)
    else:
        masks = _slot_masks()

        def body(g, _):
            s0 = g * 8
            for l in range(levels):
                for p in range(NSLOT):
                    for s in range(8):
                        row = idx_ref[s0 + s, l * NSLOT + p]
                        g_scr[pl.ds((l * NSLOT + p) * 8 + s, 1), :] = tbl_ref[
                            pl.ds(row, 1), :
                        ]
            for l in range(levels):
                comp = jnp.zeros((8, LANE), jnp.float32)
                for p in range(NSLOT):
                    tile8 = g_scr[pl.ds((l * NSLOT + p) * 8, 8), :]
                    comp = comp + jnp.where(masks[p], tile8, 0.0)
                cdst[pl.ds(s0, 8), pl.ds(l * LANE, LANE)] = comp
            return 0

        jax.lax.fori_loop(0, b // 8, body, 0)

    comp = cdst[:]
    s_mat = s_ref[:]
    p_mat = p_ref[:]
    ew = s_mat.shape[1]  # levels * feats
    # S and P are exact 0/1 matrices; under the onehot path every dot runs
    # bf16 with the value operand hi/lo-split (numerically ~f32-exact) or,
    # in bf16 table mode, a single bf16 dot (tcnn fp16-table parity)
    dot = ((_dot_b if tdt else _dot_hl) if onehot else functools.partial(
        jnp.dot, preferred_element_type=jnp.float32
    ))
    wexp = dot(w_ref[:], p_mat)
    enc_ref[:] = dot(comp * wexp, s_mat)
    for t in range(n_tang):
        dwexp = dot(dw_ref[:, pl.ds(t * wc, wc)], p_mat)
        tenc_ref[:, pl.ds(t * ew, ew)] = dot(comp * dwexp, s_mat)


# ------------------------------------------------------------ bwd kernel

def _dotg_hl(x, m, dn):
    """dot_general with the f32 operand hi/lo-split against an exact-0/1
    bf16 matrix m."""
    hi, lo = _hi_lo(x)
    kw = dict(dimension_numbers=dn, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(hi, m, **kw) + jax.lax.dot_general(lo, m, **kw)


def _bwd_kernel(levels, n_tang, cell, lv, onehot, pk, tdt, *refs):
    """Backward: no table access at all — the fwd's residual `comp`
    carries everything the weight gradients need, and the scatter values
    are pure functions of the cotangents and trilerp weights. Dense phase
    first (cotangent expansion + the full U = gt*wexp + sum_t gtk*dwexp
    block), then a scatter-only scalar loop: one row RMW per (sample,
    level) for the cell layout, 8 masked RMWs for the vertex layout."""
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
    comp_ref = refs[q]; q += 1
    s_ref = refs[q]; q += 1
    s2_ref = refs[q]; q += 1
    p_ref = refs[q]; q += 1
    dtbl_ref = refs[q]; q += 1
    dw_out = refs[q]; q += 1
    ddw_out = None
    if n_tang:
        ddw_out = refs[q]; q += 1
    u_scr = None
    if not onehot:
        u_scr = refs[q]; q += 1

    b = idx_ref.shape[0]
    wc = levels * NSLOT
    ll = levels * LANE
    ew = s_ref.shape[1]  # levels * feats
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

    # dense phase: cotangents back to slot-lane layout (Gt = g @ S^T), the
    # weight-gradient contractions, and the full scatter-value block U
    s_mat = s_ref[:]
    p_mat = p_ref[:]
    s2 = s2_ref[:]
    comp = comp_ref[:]
    dn_t = (((1,), (1,)), ((), ()))
    if onehot:
        dot = _dot_b if tdt else _dot_hl
        dotg = _dotg_b if tdt else _dotg_hl
    else:
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        dotg = functools.partial(
            jax.lax.dot_general, preferred_element_type=jnp.float32
        )
    gt = dotg(genc_ref[:], s_mat, dn_t)
    dw_out[:] = dot(comp * gt, s2)
    u = gt * dot(w_ref[:], p_mat)
    for t in range(n_tang):
        gtk = dotg(gtenc_ref[:, pl.ds(t * ew, ew)], s_mat, dn_t)
        ddw_out[:, pl.ds(t * wc, wc)] = dot(comp * gtk, s2)
        u = u + gtk * dot(dw_ref[:, pl.ds(t * wc, wc)], p_mat)

    if onehot:
        # MXU scatter-add: d_tbl_l += onehot(phys_l)^T-contraction with U_l
        # (dot_general over the sample dim — no transpose materialized).
        # U is gated to the sample's entry-group lanes so packed neighbours
        # in the same physical row receive nothing.
        phys, grp = _split_entry(idx_ref[:], pk)
        dn0 = (((0,), (0,)), ((), ()))
        iotas = {
            rl: jax.lax.broadcasted_iota(jnp.int32, (b, rl), 1)
            for rl in {rl for _, rl in lv}
        }
        ent = _entry_iota(b) // (LANE // pk) if pk > 1 else None
        for l, (off, rl) in enumerate(lv):
            rel = phys[:, l : l + 1] - off
            oh = (iotas[rl] == rel).astype(jnp.bfloat16)
            u_l = u[:, l * LANE : (l + 1) * LANE]
            if pk > 1:
                u_l = u_l * (ent == grp[:, l : l + 1]).astype(jnp.float32)
            if tdt:
                d = jax.lax.dot_general(
                    oh, u_l.astype(jnp.bfloat16),
                    dimension_numbers=dn0, preferred_element_type=jnp.float32,
                )
            else:
                uh, ul = _hi_lo(u_l)
                d = jax.lax.dot_general(
                    oh, uh, dimension_numbers=dn0, preferred_element_type=jnp.float32
                ) + jax.lax.dot_general(
                    oh, ul, dimension_numbers=dn0, preferred_element_type=jnp.float32
                )
            dtbl_ref[pl.ds(off, rl), :] = dtbl_ref[pl.ds(off, rl), :] + d
    elif cell:
        u_scr[:] = u

        def body(g, _):
            s0 = g * 8
            for l in range(levels):
                u_l = u_scr[pl.ds(s0, 8), pl.ds(l * LANE, LANE)]
                for s in range(8):
                    row = idx_ref[s0 + s, l]
                    dtbl_ref[pl.ds(row, 1), :] = (
                        dtbl_ref[pl.ds(row, 1), :] + u_l[s : s + 1, :]
                    )
            return 0

        jax.lax.fori_loop(0, b // 8, body, 0)
    else:
        masks = _slot_masks()
        u_scr[:] = u

        def body(g, _):
            s0 = g * 8
            for l in range(levels):
                u_l = u_scr[pl.ds(s0, 8), pl.ds(l * LANE, LANE)]
                for p in range(NSLOT):
                    vm = jnp.where(masks[p], u_l, 0.0)
                    for s in range(8):
                        row = idx_ref[s0 + s, l * NSLOT + p]
                        dtbl_ref[pl.ds(row, 1), :] = (
                            dtbl_ref[pl.ds(row, 1), :] + vm[s : s + 1, :]
                        )
            return 0

        jax.lax.fori_loop(0, b // 8, body, 0)


# ------------------------------------------------------------- pallas glue

@functools.lru_cache(maxsize=None)
def _build_calls(
    levels, n_tang, rows, block, n_total, interpret, cell, lv, onehot,
    feats=FEAT, pk=1, tdt=False, want_comp=False,
):
    w_cols = levels * NSLOT
    enc_w = levels * feats
    idx_cols = levels if cell else w_cols
    grid = (n_total // block,)

    def blk(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    idx_spec = blk((block, idx_cols), lambda i: (i, 0))
    w_spec = blk((block, w_cols), lambda i: (i, 0))
    dw_spec = blk((block, n_tang * w_cols), lambda i: (i, 0))
    tbl_spec = blk((rows, LANE), lambda i: (0, 0))
    s_spec = blk((levels * LANE, enc_w), lambda i: (0, 0))
    s2_spec = blk((levels * LANE, w_cols), lambda i: (0, 0))
    p_spec = blk((w_cols, levels * LANE), lambda i: (0, 0))
    enc_spec = blk((block, enc_w), lambda i: (i, 0))
    tenc_spec = blk((block, n_tang * enc_w), lambda i: (i, 0))
    comp_spec = blk((block, levels * LANE), lambda i: (i, 0))

    fwd_in = (
        [idx_spec, w_spec]
        + ([dw_spec] if n_tang else [])
        + ([tbl_spec, tbl_spec] if onehot and not tdt else [tbl_spec])
        + [s_spec, p_spec]
    )
    fwd_out = (
        [enc_spec]
        + ([tenc_spec] if n_tang else [])
        + ([comp_spec] if want_comp else [])
    )
    fwd_shapes = (
        [jax.ShapeDtypeStruct((n_total, enc_w), jnp.float32)]
        + (
            [jax.ShapeDtypeStruct((n_total, n_tang * enc_w), jnp.float32)]
            if n_tang
            else []
        )
        + (
            [jax.ShapeDtypeStruct((n_total, levels * LANE), jnp.float32)]
            if want_comp
            else []
        )
    )
    # comp scratch (unused when comp is an output ref) + group staging tiles
    fwd_scratch = [pltpu.VMEM((block, levels * LANE), jnp.float32)] + (
        []
        if onehot
        else [pltpu.VMEM((levels * (8 if cell else NSLOT * 8), LANE), jnp.float32)]
    )
    fwd_call = pl.pallas_call(
        functools.partial(
            _fwd_kernel, levels, n_tang, want_comp, cell, lv, onehot, pk, tdt
        ),
        grid=grid,
        in_specs=fwd_in,
        out_specs=fwd_out,
        out_shape=fwd_shapes,
        scratch_shapes=fwd_scratch,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    bwd_in = (
        [idx_spec, w_spec]
        + ([dw_spec] if n_tang else [])
        + [enc_spec]
        + ([tenc_spec] if n_tang else [])
        + [comp_spec, s_spec, s2_spec, p_spec]
    )
    bwd_out = [tbl_spec, blk((block, w_cols), lambda i: (i, 0))] + (
        [blk((block, n_tang * w_cols), lambda i: (i, 0))] if n_tang else []
    )
    bwd_shapes = [
        jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_total, w_cols), jnp.float32),
    ] + (
        [jax.ShapeDtypeStruct((n_total, n_tang * w_cols), jnp.float32)]
        if n_tang
        else []
    )
    bwd_scratch = (
        [] if onehot else [pltpu.VMEM((block, levels * LANE), jnp.float32)]
    )
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, levels, n_tang, cell, lv, onehot, pk, tdt),
        grid=grid,
        in_specs=bwd_in,
        out_specs=bwd_out,
        out_shape=bwd_shapes,
        scratch_shapes=bwd_scratch,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )
    return fwd_call, bwd_call


@functools.lru_cache(maxsize=None)
def _lookup_fn(
    levels, rows, block, interpret, n_tang, cell, lv, onehot,
    feats=FEAT, pk=1, tdt=False,
):
    """custom_vjp op over padded arrays: (table, idx, w[, dw]) -> enc[, tenc]."""
    mat_dt = jnp.bfloat16 if onehot else jnp.float32
    s1, s2 = (m.astype(mat_dt) for m in _sum_matrices(levels, feats))
    pm = _expand_matrix(levels, feats).astype(mat_dt)

    # all onehot-path dots run bf16 operands (hi/lo-split values against
    # exact 0/1 matrices); the Trainer's global f32 matmul precision would
    # otherwise leak into kernel tracing and Mosaic rejects
    # contract_precision<fp32> on bf16 (round-2 fused_mlp lesson)
    def prec():
        return (
            jax.default_matmul_precision("bfloat16")
            if onehot
            else jax.default_matmul_precision("float32")
        )

    def tbl_args(table):
        if not onehot:
            return (table,)
        hi = table.astype(jnp.bfloat16)
        if tdt:
            return (hi,)
        lo = (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (hi, lo)

    if n_tang:

        @jax.custom_vjp
        def op(table, idx, w, dw):
            n_total = idx.shape[0]
            fwd_call, _ = _build_calls(
                levels, n_tang, rows, block, n_total, interpret, cell, lv, onehot,
                feats, pk, tdt,
            )
            with prec():
                enc, tenc = fwd_call(
                    idx, w, dw, *tbl_args(table), jnp.asarray(s1), jnp.asarray(pm)
                )
            return enc, tenc

        def op_fwd(table, idx, w, dw):
            # AD pass: the comp-emitting forward variant; comp replaces the
            # table in the residuals so the backward never re-gathers
            n_total = idx.shape[0]
            fwd_call, _ = _build_calls(
                levels, n_tang, rows, block, n_total, interpret, cell, lv, onehot,
                feats, pk, tdt, want_comp=True,
            )
            with prec():
                enc, tenc, comp = fwd_call(
                    idx, w, dw, *tbl_args(table), jnp.asarray(s1), jnp.asarray(pm)
                )
            return (enc, tenc), (comp, idx, w, dw)

        def op_bwd(res, g):
            comp, idx, w, dw = res
            genc, gtenc = g
            n_total = idx.shape[0]
            _, bwd_call = _build_calls(
                levels, n_tang, rows, block, n_total, interpret, cell, lv, onehot,
                feats, pk, tdt,
            )
            with prec():
                d_table, d_w, d_dw = bwd_call(
                    idx, w, dw, genc.astype(jnp.float32), gtenc.astype(jnp.float32),
                    comp, jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(pm),
                )
            d_idx = np.zeros(idx.shape, jax.dtypes.float0)
            return d_table, d_idx, d_w, d_dw

        op.defvjp(op_fwd, op_bwd)
        return op

    @jax.custom_vjp
    def op0(table, idx, w):
        n_total = idx.shape[0]
        fwd_call, _ = _build_calls(
            levels, 0, rows, block, n_total, interpret, cell, lv, onehot, feats, pk, tdt
        )
        with prec():
            return fwd_call(
                idx, w, *tbl_args(table), jnp.asarray(s1), jnp.asarray(pm)
            )[0]

    def op0_fwd(table, idx, w):
        n_total = idx.shape[0]
        fwd_call, _ = _build_calls(
            levels, 0, rows, block, n_total, interpret, cell, lv, onehot, feats, pk, tdt,
            want_comp=True,
        )
        with prec():
            enc, comp = fwd_call(
                idx, w, *tbl_args(table), jnp.asarray(s1), jnp.asarray(pm)
            )
        return enc, (comp, idx, w)

    def op0_bwd(res, genc):
        comp, idx, w = res
        n_total = idx.shape[0]
        _, bwd_call = _build_calls(
            levels, 0, rows, block, n_total, interpret, cell, lv, onehot, feats, pk, tdt
        )
        with prec():
            d_table, d_w = bwd_call(
                idx, w, genc.astype(jnp.float32), comp,
                jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(pm),
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
        dw = jnp.pad(dw, ((0, pad), (0, 0)))

    lv = tuple(
        (int(o), int(r))
        for o, r in zip(spec.level_offsets[:k], spec.level_rows[:k])
    )
    op = _lookup_fn(
        k, spec.total_rows, block, interpret,
        3 if with_tangents else 0, spec.layout == "cell", lv,
        spec.resolved_gather == "onehot",
        spec.feats, spec.entries_per_row, spec.table_dtype == "bf16",
    )
    if with_tangents:
        enc, tenc2 = op(table, idx, w, dw)
        # kernel emits tangents lane-folded [N, 3*k*feats] (2D layouts are
        # ~2.2x faster through the operand path); unfold OUTSIDE the
        # custom_vjp so its transpose stays plain XLA
        enc = enc[:n]
        tenc = tenc2[:n].reshape(n, 3, k * spec.feats).transpose(1, 0, 2)
    else:
        enc = op(table, idx, w)[:n]
        tenc = None

    if k < spec.num_levels:
        padf = (spec.num_levels - k) * spec.feats
        enc = jnp.pad(enc, ((0, 0), (0, padf)))
        if tenc is not None:
            tenc = jnp.pad(tenc, ((0, 0), (0, 0), (0, padf)))
    return (enc, tenc) if with_tangents else enc


def make_table_init(spec: SlotGridSpec):
    def init(key, shape=None, dtype=jnp.float32):
        return (
            jax.random.uniform(
                key, (spec.total_rows, LANE), dtype, minval=-1.0, maxval=1.0
            )
            * spec.hash_init_scale
        )

    return init
