"""Fully-fused slot-grid + MLP SDF kernel: the NetworkWithInputEncoding
answer (reference src/field_components/mlp.py:246-293 — tcnn couples its
HashGrid encoding and FullyFusedMLP into one kernel for exactly this path).

One pallas_call runs, for a block of samples, entirely in VMEM:

  slot geometry (hash rows + trilerp weights from raw positions)
  -> one-hot MXU slot-grid gather -> trilerp (+ its 3 spatial tangents)
  -> NeRF frequency encoding (+ Jacobian) -> dense chain -> one
  reverse-mode adjoint sweep -> d sdf / d x.

vs the two-kernel composition (ops/pallas/slot_grid.py lookup feeding
ops/pallas/fused_mlp.py::fused_chain_adjoint) this removes the HBM
round-trip of enc [N, K*F] + tenc [N, 3*K*F] + the XLA-side concat /
tangent-contraction glue between them, and the backward fuses the chain's
reverse-over-reverse with the slot scatter in one pass over the residuals.

GEOMETRY IS IN-KERNEL: per-level row indices and trilerp weights are
computed from raw positions inside the kernel (SlotGeom), so the XLA-side
slot_geometry() call and its idx [N, K] / w [N, K*8] / dw [N, 3*K*8]
operands (plus the d_w / d_dw backward outputs) never touch HBM — each was
lane-padded to >=128 lanes per sample. The backward hand-folds the trilerp
weight derivatives into the position cotangent:

  gpos_t = cs * gate_t * [ sum_c d_w_c * D_tc
                           + cs * sum_k sum_c d_dw_kc * dD_kc/dx_t ]

with cs = 1/(2*radius), gate the clip derivative of x = clip((pos+r)/2r),
D_kc = dwa_k * prod_{u!=k} wa_u (the trilerp tangent factorization), and
dD_kc/dx_t = ddwa_k * prod wa_u (t==k) or dwa_k * dwa_t * prod wa_u (t!=k)
— exactly what XLA autodiff produced through the old w(x), dw(x) operands
(verified by tests/test_slot_fused.py grad-vs-composition). The forward
tangents carry no clip gate, matching the composition's tenc semantics.

Differentiation contract: the op is linear in the table and nonlinear only
through the trilerp weights and the chain; the custom VJP hand-computes
(d_positions, d_table, d_weights, d_biases) in one backward kernel.

Residuals: the composed rows `comp` [N, K*128] (the backward never touches
the table), plus the raw kernel inputs. Numerics: all value operands of
MXU dots are bf16 hi+lo split against exact 0/1 matrices (~f32-exact),
matching slot_grid.py's one-hot mode.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalstudio_tpu.ops.pallas.fused_mlp import (
    LANE,
    ChainSpec,
    DEFAULT_BLOCK,
    _act_triple,
    _adj_sweep,
    _chain_geometry,
    _compiler_params,
    _const_spec,
    _enc_consts,
    _enc_fwd,
    _enc_jt,
    _pad_operand,
    _pad_weight,
    _rup,
)
from multimodalstudio_tpu.ops.pallas.slot_grid import (
    FEAT,
    NSLOT,
    SlotGridSpec,
    _dot_b,
    _dot_hl,
    _dotg_b,
    _dotg_hl,
    _expand_matrix,
    _hi_lo,
    _sum_matrices,
)

# Forward-kernel block default; 0 = follow the backward block. Overridable
# per call (fwd_block=) or globally (MMS_SLOT_FWD_BLOCK).
DEFAULT_FWD_BLOCK = 0


@dataclasses.dataclass(frozen=True)
class SlotGeom:
    """Static description of the in-kernel slot geometry (cell layout)."""

    res: Tuple[int, ...]  # per-level resolution
    dense: Tuple[bool, ...]  # per-level dense (collision-free) indexing
    interp: str  # Smoothstep | Linear
    radius: float  # grid half-extent: x = clip((pos + r) / 2r, 0, 1-1e-6)
    ents: Tuple[int, ...] = ()  # per-level ENTRY count (hash mask = ents-1)
    feats: int = FEAT  # features per entry; P = 128/(8*feats) entries/row
    bf16: bool = False  # single-bf16 table dots (vs f32 hi/lo split)

    @property
    def pk(self) -> int:
        return LANE // (NSLOT * self.feats)


def _make_geom(gspec: SlotGridSpec, k: int, radius: float) -> SlotGeom:
    if gspec.layout != "cell":
        raise ValueError("fused slot kernels require layout='cell'")
    res = [int(r) for r in gspec.resolutions[:k]]
    return SlotGeom(
        res=tuple(res),
        dense=tuple(r ** 3 <= gspec.rows_per_level for r in res),
        interp=gspec.interpolation,
        radius=float(radius),
        ents=tuple(int(e) for e in gspec.level_entries[:k]),
        feats=gspec.feats,
        bf16=gspec.table_dtype == "bf16",
    )


@dataclasses.dataclass(frozen=True)
class SlotChainSpec:
    """Static geometry of the fused slot+chain kernel."""

    inner: ChainSpec  # chain over x0 = [pos3, pe, grid, pad]
    encspec: ChainSpec  # same, with in_dims[0] = exact 3+6F (for _enc_*)
    levels: int
    lv: Tuple[Tuple[int, int], ...]  # (offset, rows) per level
    rows: int  # total table rows
    pe_width: int  # 3 + 6F
    geom: SlotGeom  # in-kernel geometry
    # Forward-kernel block size; 0 = inner.block. The fwd and bwd
    # pallas_calls have independent grids over the same HBM layout, and
    # their VMEM working sets differ ~3x — the r4 ladder measured the fwd
    # 1.9x faster at block 256 while the bwd prefers 512 (the per-block
    # full-table scatter accumulation penalizes small bwd blocks).
    fwd_block: int = 0
    # MEASUREMENT ONLY (MMS_SLOT_ABLATE=sec,sec): statically drop backward
    # sections to attribute kernel time. Sections: adj (zero the adjoint
    # residual input — folds its consumers), grid3 (grad3-output grid
    # cotangents), gafwd (ga-forward chain), rev (reverse sweep), scatter
    # (one-hot table scatter), fold (position-cotangent fold + enc
    # hessian). Zeros constant-fold downstream, so sections overlap —
    # interpret deltas as cluster sizes. Never set in production.
    ablate: Tuple[str, ...] = ()
    # r5 backward restructure: split the monolithic backward into a
    # per-sample cotangent kernel (no accumulators, no table — lean VMEM
    # live set) + XLA weight-grad dots over lane-aligned stacks + a
    # scatter-only kernel. The r4 ablation measured the merged kernel
    # "diffusely bound": its accumulator outputs (dtbl + 2L weight grads,
    # revisited every grid step) plus the full live set wedge Mosaic's
    # pipeline — zeroing one small cluster (ablate='adj') recovered 4.4x.
    bwd_split: bool = False
    # scatter-kernel block size in split mode; 0 = inner.block. The scatter
    # revisits the whole table every grid step, so bigger blocks = fewer
    # full-table accumulation passes.
    scatter_block: int = 0


def _split_entry(idx, pk):
    """Absolute/relative ENTRY index -> (physical row, entry group)."""
    if pk == 1:
        return idx, None
    shift = pk.bit_length() - 1
    return jax.lax.shift_right_logical(idx, shift), jnp.bitwise_and(idx, pk - 1)


def _entry_iota(b, pk):
    """[b, 128] entry-group id of each lane (128/pk lanes per entry)."""
    return jax.lax.broadcasted_iota(jnp.int32, (b, LANE), 1) // (LANE // pk)


def _gather_onehot(idx, lv, tblh_ref, tbll_ref, b, pk=1):
    """One-hot MXU gather: GATED comp [B, K*128] f32. idx columns are
    per-level RELATIVE entry indices (in-kernel geometry emits them
    offset-free); the one-hot runs over PHYSICAL rows (pk entries packed
    per row) and each sample's entry group gates the lanes, so packed
    neighbours never leak into the trilerp. tbll_ref None = bf16 table."""
    phys, grp = _split_entry(idx, pk)
    iotas = {
        rl: jax.lax.broadcasted_iota(jnp.int32, (b, rl), 1)
        for rl in {rl for _, rl in lv}
    }
    ent = _entry_iota(b, pk) if pk > 1 else None
    cols = []
    for l, (off, rl) in enumerate(lv):
        oh = (iotas[rl] == phys[:, l : l + 1]).astype(jnp.bfloat16)
        th = tblh_ref[pl.ds(off, rl), :]
        row = jnp.dot(oh, th, preferred_element_type=jnp.float32)
        if tbll_ref is not None:
            tl = tbll_ref[pl.ds(off, rl), :]
            row = row + jnp.dot(oh, tl, preferred_element_type=jnp.float32)
        if pk > 1:
            row = row * (ent == grp[:, l : l + 1]).astype(jnp.float32)
        cols.append(row)
    return jnp.concatenate(cols, axis=-1)


def _scatter_onehot(idx, lv, dtbl_ref, d_comp, b, first, pk=1, bf16=False):
    """MXU scatter-add of d_comp [B, K*128] into dtbl_ref [R, 128]
    (idx per-level relative ENTRY indices). d_comp is expected gated to
    each sample's entry-group lanes (the gated comp residual and gated
    weight expansions keep it so); gate again here only when pk > 1 to
    stay safe against ungated terms."""

    @pl.when(first)
    def _():
        dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

    phys, grp = _split_entry(idx, pk)
    dn0 = (((0,), (0,)), ((), ()))
    iotas = {
        rl: jax.lax.broadcasted_iota(jnp.int32, (b, rl), 1)
        for rl in {rl for _, rl in lv}
    }
    ent = _entry_iota(b, pk) if pk > 1 else None
    for l, (off, rl) in enumerate(lv):
        oh = (iotas[rl] == phys[:, l : l + 1]).astype(jnp.bfloat16)
        u_l = d_comp[:, l * LANE : (l + 1) * LANE]
        if pk > 1:
            u_l = u_l * (ent == grp[:, l : l + 1]).astype(jnp.float32)
        if bf16:
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


# ------------------------------------------------- in-kernel slot geometry
#
# Mirrors slot_grid.py::slot_geometry (cell layout) with all per-level
# constants built from iota (Pallas kernels may not capture array
# constants): one [1, K]-row select chain per constant — K is ~6, so this
# is a handful of whole-block VPU ops evaluated once per grid block.

_P1 = int(np.uint32(2654435761).view(np.int32))  # hash primes as wrapped
_P2 = int(np.uint32(805459861).view(np.int32))  # int32 (same bits)


def _const_row(vals, col, dtype=jnp.float32):
    """[1, len-of-col] row with vals[l] at columns where col == l."""
    out = jnp.zeros(col.shape, dtype)
    for l, v in enumerate(vals):
        out = jnp.where(col == l, jnp.asarray(v, dtype), out)
    return out


def _geom_rows(geom: SlotGeom, lv, pos):
    """Per-level table ENTRY indices from raw positions: idx [B, K] int32
    in [0, entries_l) (RELATIVE — no level offset; the gather splits into
    physical row >> log2(P) and entry group & P-1), plus per-axis grid
    coords g [3][B, 1] f32 (clipped) and clip gates gate [3][B, 1] f32 for
    the backward chain rule. int32 multiply wraps mod 2^32, so the XOR
    hash matches slot_geometry's uint32 math bit for bit."""
    K = len(geom.res)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    res_row = _const_row([float(r) for r in geom.res], col)
    resi_row = _const_row(list(geom.res), col, jnp.int32)
    mask_row = _const_row([e - 1 for e in geom.ents], col, jnp.int32)
    dense_row = _const_row([1 if d else 0 for d in geom.dense], col, jnp.int32)

    r = geom.radius
    eps = 1.0 - 1e-6
    g, gate = [], []
    for t in range(3):
        graw = (pos[:, t : t + 1] + r) / (2.0 * r)  # [B, 1]
        g.append(jnp.clip(graw, 0.0, eps))
        gate.append(((graw > 0.0) & (graw < eps)).astype(jnp.float32))

    bi = [jnp.floor(g[t] * res_row).astype(jnp.int32) for t in range(3)]  # [B, K]
    h = bi[0]
    h = jnp.bitwise_xor(h, bi[1] * _P1)
    h = jnp.bitwise_xor(h, bi[2] * _P2)
    row_hash = jnp.bitwise_and(h, mask_row)
    row_dense = bi[0] + (bi[1] + bi[2] * resi_row) * resi_row
    idx = jnp.where(dense_row > 0, row_dense, row_hash)
    return idx, g, gate


def _geom_weights(geom: SlotGeom, g, order=0):
    """Trilerp weights on the lane-folded slot axis (column c = l*8 + p).

    Returns w [B, K*8] f32 (= prod_t wa_t). order>=1 adds the per-axis
    factors wa [3][B, K*8] and derivative factors dwa [3][B, K*8] with
    dwa_t = d wa_t / d g_t (resolution chain rule included); order>=2 adds
    ddwa [3][B, K*8] = d^2 wa_t / d g_t^2 — everything the backward needs
    to form dw/dg and d(dw)/dg without any operands."""
    K = len(geom.res)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (1, K * NSLOT), 1)
    res8 = _const_row([float(r) for r in geom.res], col8 // NSLOT)
    slot = col8 % NSLOT

    wa, dwa, ddwa = [], [], []
    for t in range(3):
        bit = ((slot >> t) & 1).astype(jnp.float32)  # corner offset bit
        sgn = 2.0 * bit - 1.0
        scaled = g[t] * res8  # [B, K*8]
        frac = scaled - jnp.floor(scaled)
        if geom.interp == "Smoothstep":
            s = frac * frac * (3.0 - 2.0 * frac)
            ds = 6.0 * frac * (1.0 - frac) * res8
            dds = (6.0 - 12.0 * frac) * res8 * res8
        else:  # Linear
            s = frac
            ds = res8
            dds = None
        wa.append(bit * (2.0 * s - 1.0) + (1.0 - s))  # bit ? s : 1-s
        if order >= 1:
            dwa.append(sgn * ds)
        if order >= 2:
            ddwa.append(sgn * dds if dds is not None else jnp.zeros_like(res8))
    w = wa[0] * wa[1] * wa[2]
    if order >= 2:
        return w, wa, dwa, ddwa
    if order >= 1:
        return w, wa, dwa
    return w


def _fold_pos_cotangent(geom, g, gate, wa, dwa, ddwa, d_w, d_dws):
    """Hand-derived chain rule of the trilerp geometry: the cotangents on
    the trilerp weights (d_w [B, wc]) and, optionally, on the 3 tangent
    weight rows (d_dws [3][B, wc] or None) fold into d loss / d pos
    [3][B, 1]. Mirrors what XLA autodiff computed through the old
    w(x)/dw(x) operands, clip gate included."""
    cs = 1.0 / (2.0 * geom.radius)
    cols = []
    for t in range(3):
        u, v = (t + 1) % 3, (t + 2) % 3
        acc = d_w * (dwa[t] * wa[u] * wa[v])  # d_w_c * D_tc
        if d_dws is not None:
            for k in range(3):
                if k == t:
                    dD = ddwa[k] * wa[u] * wa[v]
                else:
                    o = 3 - k - t  # the remaining axis
                    dD = dwa[k] * dwa[t] * wa[o]
                acc = acc + cs * (d_dws[k] * dD)
        cols.append(jnp.sum(acc, axis=-1, keepdims=True) * (gate[t] * cs))
    return cols  # [3][B, 1]


def _fused_fwd_kernel(spec: SlotChainSpec, resid: bool, *refs):
    """Forward; with resid=True also emits the backward's residual stacks
    (pre-activations z, adjoint-sweep rows s, and the adjoint adj) so the
    backward kernel never rebuilds the chain or re-runs the sweep — the
    r4 ablation ladder measured the in-backward rebuild at ~3.4 of 4.3
    ms/op while the identical ops run in this kernel at ~0.4 ms: the big
    backward scheduled them serially, so they moved here (HBM cost of the
    stacks is ~0.25 ms/65K samples)."""
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    geom = spec.geom
    kf = K * geom.feats
    pw = spec.pe_width
    f, _, _ = _act_triple(inner)
    dotv = _dot_b if geom.bf16 else _dot_hl
    dotgv = _dotg_b if geom.bf16 else _dotg_hl

    p = 0
    pos_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1  # coarse-to-fine mask [1, K*F]
    tblh_ref = refs[p]; p += 1
    tbll_ref = None
    if not geom.bf16:
        tbll_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; bs = refs[p + L : p + 2 * L]; p += 2 * L
    sg_ref = refs[p]; p += 1
    geo_ref = refs[p]; p += 1
    comp_ref = refs[p]; p += 1
    zs_ref = ss_ref = adj_ref = x0_ref = None
    if resid:
        if L > 1:
            zs_ref = refs[p]; p += 1
            ss_ref = refs[p]; p += 1
        adj_ref = refs[p]; p += 1
        if spec.bwd_split:
            x0_ref = refs[p]

    b = pos_ref.shape[0]
    cs = 1.0 / (2.0 * geom.radius)

    # grid: in-kernel geometry + gather + trilerp (comp is entry-gated).
    # bf16 tables make the gathered rows bf16-exact, so the comp residual
    # is stored bf16 (halves its HBM round-trip); f32 hi/lo tables keep f32.
    idx, g, _ = _geom_rows(geom, spec.lv, pos_ref[:])
    w, wa, dwa = _geom_weights(geom, g, order=1)
    comp = _gather_onehot(idx, spec.lv, tblh_ref, tbll_ref, b, geom.pk)
    comp_ref[:] = comp.astype(comp_ref.dtype)
    s_mat = s_ref[:]
    p_mat = p_ref[:]
    m = m_ref[:]
    wexp = dotv(w, p_mat)
    encg = dotv(comp * wexp, s_mat) * m  # [B, K*F]

    # NeRF encoding (exact-width via encspec: no pad inside)
    h0pe, _, sin_p, cos_p = _enc_fwd(spec.encspec, pos_ref[:], want_t0=False)
    pad = inner.in_dims[0] - pw - kf
    x0 = jnp.concatenate(
        [h0pe, encg.astype(jnp.bfloat16)]
        + ([jnp.zeros((b, pad), jnp.bfloat16)] if pad else []),
        axis=-1,
    )

    # chain forward
    wl = [ws[l][:] for l in range(L)]
    h = x0
    zs = []
    for l in range(L):
        if l in inner.skip:
            h = (jnp.concatenate([h, x0], axis=-1) / np.sqrt(2.0)).astype(jnp.bfloat16)
        z = jnp.dot(h, wl[l], preferred_element_type=jnp.float32) + bs[l][:]
        if l < L - 1:
            zs.append(z.astype(jnp.bfloat16))
            h = f(z).astype(jnp.bfloat16)
        else:
            h = z

    if resid:
        H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]
        s_rows = [None] * max(L - 1, 0)
        adj = _adj_sweep(inner, wl, zs, b, s_store=s_rows)  # [B, P0] f32
        for l in range(L - 1):
            zs_ref[:, l * H : (l + 1) * H] = zs[l]
            ss_ref[:, l * H : (l + 1) * H] = s_rows[l]
        adj_ref[:] = adj
        if x0_ref is not None:
            x0_ref[:] = x0
    else:
        adj = _adj_sweep(inner, wl, zs, b)  # [B, P0] f32

    # d sdf / d x: PE part through the encoding Jacobian, grid part through
    # the trilerp tangents: grad_k = <adj_g, tenc_k> computed lane-wise as
    # sum(comp * dwexp_k * (adj_g @ S^T)) — tenc itself never materializes
    grad3 = _enc_jt(spec.encspec, sin_p, cos_p, adj[:, :pw])[:, :3]
    adjg = adj[:, pw : pw + kf] * m  # fold the c2f mask into the adjoint
    dn_t = (((1,), (1,)), ((), ()))
    adjS = dotgv(adjg, s_mat, dn_t)  # [B, K*128]
    gcols = []
    for k in range(3):
        u, v = (k + 1) % 3, (k + 2) % 3
        dw_k = (dwa[k] * wa[u] * wa[v]) * cs  # [B, wc] (no clip gate: tenc semantics)
        dwexp_k = dotv(dw_k, p_mat)
        gcols.append(jnp.sum(comp * dwexp_k * adjS, axis=-1, keepdims=True))
    grad3 = grad3 + jnp.concatenate(gcols, axis=-1)

    ch = inner.tangent_out_channel
    sg_ref[:] = jnp.concatenate(
        [h[:, ch : ch + 1], grad3, jnp.zeros((b, LANE - 4), jnp.float32)], axis=-1
    )
    G = geo_ref.shape[1]
    gw_avail = min(G, h.shape[1] - 1)
    geo = h[:, 1 : 1 + gw_avail].astype(jnp.bfloat16)
    if gw_avail < G:
        geo = jnp.concatenate(
            [geo, jnp.zeros((b, G - gw_avail), jnp.bfloat16)], axis=-1
        )
    geo_ref[:] = geo


def _fused_bwd_kernel(spec: SlotChainSpec, *refs):
    """Backward of (sdf, geo, grad3) wrt (pos, table, W_l, b_l).

    Reverse-over-reverse for the chain (fused_mlp._bwd_adj_kernel math)
    with the grid coupled in four places: the adjoint cotangent ga picks
    up the grid tangents (ga_g = sum_k g3_k * tenc_k), the grad3 output's
    direct dependence on (comp, dw) adds gck = (g3_k*adj_g) @ S^T terms,
    the chain-input cotangent's grid slice drives the slot backward
    (d_comp -> one-hot scatter), and the trilerp-weight cotangents fold
    into the position cotangent via _fold_pos_cotangent (the second-order
    trilerp terms XLA used to own when w/dw were operands)."""
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    geom = spec.geom
    kf = K * geom.feats
    pw = spec.pe_width
    P0 = inner.in_dims[0]
    DL = inner.out_dims[-1]
    c = inner.tangent_out_channel
    f, df, ddf = _act_triple(inner)
    dotv = _dot_b if geom.bf16 else _dot_hl
    dotgv = _dotg_b if geom.bf16 else _dotg_hl
    first = pl.program_id(0) == 0
    ab = spec.ablate

    p = 0
    pos_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1
    comp_ref = refs[p]; p += 1
    gsg_ref = refs[p]; p += 1
    ggeo_ref = refs[p]; p += 1
    zs_ref = ss_ref = None
    if L > 1:
        zs_ref = refs[p]; p += 1
        ss_ref = refs[p]; p += 1
    adj_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    s2_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; bs = refs[p + L : p + 2 * L]; p += 2 * L
    gx_ref = refs[p]; p += 1
    dtbl_ref = refs[p]; p += 1
    gw_refs = refs[p : p + L]; gb_refs = refs[p + L : p + 2 * L]; p += 2 * L
    e_scr = refs[p]

    H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]

    def zl(l):
        return zs_ref[:, l * H : (l + 1) * H]

    def sl(l):
        return ss_ref[:, l * H : (l + 1) * H]

    b = pos_ref.shape[0]
    cs = 1.0 / (2.0 * geom.radius)
    comp = comp_ref[:].astype(jnp.float32)
    s_mat = s_ref[:]
    s2 = s2_ref[:]
    p_mat = p_ref[:]
    m = m_ref[:]
    dn_t = (((1,), (1,)), ((), ()))

    # ---- geometry + x0 (grid features from the comp residual; the chain's
    # z/s/adj residuals come from the forward kernel — no rebuild here)
    idx, g, gate = _geom_rows(geom, spec.lv, pos_ref[:])
    w, wa, dwa, ddwa = _geom_weights(geom, g, order=2)
    dw_rows = []
    for k in range(3):
        u, v = (k + 1) % 3, (k + 2) % 3
        dw_rows.append((dwa[k] * wa[u] * wa[v]) * cs)
    wexp = dotv(w, p_mat)
    encg = dotv(comp * wexp, s_mat) * m
    h0pe, t0pe, sin_p, cos_p = _enc_fwd(spec.encspec, pos_ref[:])
    pad = P0 - pw - kf
    x0 = jnp.concatenate(
        [h0pe, encg.astype(jnp.bfloat16)]
        + ([jnp.zeros((b, pad), jnp.bfloat16)] if pad else []),
        axis=-1,
    )
    wl = [ws[l][:] for l in range(L)]
    if "adj" in ab:
        adj = jnp.zeros((b, P0), jnp.float32)
    else:
        adj = adj_ref[:]
    adjg = adj[:, pw : pw + kf] * m

    # ---- incoming cotangents
    gsg = gsg_ref[:]  # [B, LANE] f32: col 0 -> sdf, 1..3 -> grad3
    ggeo = ggeo_ref[:].astype(jnp.float32)
    gcols_geo = min(ggeo.shape[1], DL - 1)
    tail = DL - 1 - gcols_geo
    gy = jnp.concatenate(
        [gsg[:, :1], ggeo[:, :gcols_geo]]
        + ([jnp.zeros((b, tail), jnp.float32)] if tail > 0 else []),
        axis=-1,
    )
    g3 = gsg[:, 1:4]

    # ---- ga (cotangent on adj) + the grad3 output's direct grid terms.
    #
    # The naive form is a k-loop of 4 dots each (dwexp_k, tenc_k, gck,
    # d_dws_k) plus ~9 elementwise passes over [B, K*128]. But g3_k is a
    # per-SAMPLE scalar, so it factors out of every lane contraction:
    #   gck      = dotg(g3_k*adjg, S^T)        = g3_k * gc0,  gc0 = dotg(adjg, S^T)
    #   d_dws_k  = dot(comp*gck, s2)           = g3_k * dd0,  dd0 = dot(comp*gc0, s2)
    #   sum_k gck*dwexp_k                      = gc0 * dwg
    # and dot linearity merges the k-sum BEFORE the expansion dot:
    #   dwg = sum_k g3_k*dwexp_k = dot(sum_k g3_k*dw_rows_k, P)
    #   ga_g = sum_k g3_k*tenc_k = dot(comp*dwg, S) * m
    # -> 4 dots + 3 [B, K*8] FMAs total (was 12 dots; measured 2x on the
    # whole backward, r4 ablation ladder in docs/performance.md §3e).
    ga_pe = sum(g3[:, k : k + 1] * t0pe[k].astype(jnp.float32) for k in range(3))
    if "grid3" in ab:
        ga_g = jnp.zeros((b, kf), jnp.float32)
        d_comp = jnp.zeros((b, K * LANE), jnp.float32)
        dd0 = jnp.zeros((b, K * NSLOT), jnp.float32)
    else:
        dwsum = sum(g3[:, k : k + 1] * dw_rows[k] for k in range(3))  # [B, K*8]
        dwg = dotv(dwsum, p_mat)  # [B, K*128]
        ga_g = dotv(comp * dwg, s_mat) * m  # [B, K*F]
        gc0 = dotgv(adjg, s_mat, dn_t)  # [B, K*128]
        d_comp = gc0 * dwg
        dd0 = dotv(comp * gc0, s2)  # [B, K*8]
    d_dws = [g3[:, k : k + 1] * dd0 for k in range(3)]
    ga = jnp.concatenate(
        [ga_pe, ga_g] + ([jnp.zeros((b, pad), jnp.float32)] if pad else []), axis=-1
    )

    # ---- ga-forward chain: adjoint-path weight grads + act'' injections
    q = ga
    for l in range(L if "gafwd" not in ab else 0):
        qin = (
            (jnp.concatenate([q, ga], axis=-1) / np.sqrt(2.0))
            if l in inner.skip
            else q
        )
        if l == L - 1:
            colv = jax.lax.broadcasted_iota(jnp.int32, (b, DL), 1)
            v_l = (colv == c).astype(jnp.float32)
        else:
            v_l = sl(l).astype(jnp.float32) * df(zl(l))
        gwd = jax.lax.dot_general(
            qin.astype(jnp.bfloat16), v_l.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gw_ref = gw_refs[l]

        @pl.when(first)
        def _():
            gw_ref[:] = gwd

        @pl.when(jnp.logical_not(first))
        def _():
            gw_ref[:] = gw_ref[:] + gwd

        if l < L - 1:
            mq = jnp.dot(qin.astype(jnp.bfloat16), wl[l],
                         preferred_element_type=jnp.float32)
            if ddf is not None:
                e_scr[l] = (mq * sl(l).astype(jnp.float32) * ddf(zl(l))).astype(
                    jnp.bfloat16
                )
            q = mq * df(zl(l))

    def layer_input(l):
        hin = x0 if l == 0 else f(zl(l - 1).astype(jnp.float32)).astype(jnp.bfloat16)
        if l in inner.skip:
            hin = (jnp.concatenate([hin, x0], axis=-1) / np.sqrt(2.0)).astype(
                jnp.bfloat16
            )
        return hin

    # ---- standard reverse sweep with the e_l injections
    gx0 = jnp.zeros((b, P0), jnp.float32)
    gh = gy
    for l in reversed(range(L if "rev" not in ab else 0)):
        if l == L - 1:
            gz = gh
        else:
            gz = gh * df(zl(l))
            if ddf is not None and "gafwd" not in ab:
                gz = gz + e_scr[l].astype(jnp.float32)
        gzb = gz.astype(jnp.bfloat16)
        gw = jax.lax.dot_general(
            layer_input(l), gzb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gb = jnp.sum(gz, axis=0, keepdims=True)
        gw_ref, gb_ref = gw_refs[l], gb_refs[l]
        if "gafwd" in ab:
            @pl.when(first)
            def _():
                gw_ref[:] = gw

            @pl.when(jnp.logical_not(first))
            def _():
                gw_ref[:] = gw_ref[:] + gw
        else:
            gw_ref[:] = gw_ref[:] + gw

        @pl.when(first)
        def _():
            gb_ref[:] = gb

        @pl.when(jnp.logical_not(first))
        def _():
            gb_ref[:] = gb_ref[:] + gb

        ghp = jax.lax.dot_general(
            gzb, wl[l], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l in inner.skip:
            hw = inner.in_dims[l] - P0
            gh = ghp[:, :hw] / np.sqrt(2.0)
            gx0 = gx0 + ghp[:, hw:] / np.sqrt(2.0)
        else:
            gh = ghp
    ghin = (gh + gx0) if "rev" not in ab else gx0  # [B, P0] cotangent on x0

    # ---- grid slice of the input cotangent -> slot backward
    g_enc = ghin[:, pw : pw + kf] * m
    gt0 = dotgv(g_enc, s_mat, dn_t)  # [B, K*128]
    d_comp = d_comp + gt0 * wexp
    d_w = dotv(comp * gt0, s2)  # [B, K*8] cotangent on w
    if "scatter" in ab:
        @pl.when(first)
        def _():
            dtbl_ref[:] = jnp.zeros_like(dtbl_ref)
    else:
        _scatter_onehot(
            idx, spec.lv, dtbl_ref, d_comp, b, first, geom.pk, geom.bf16
        )

    # ---- position cotangent: PE Jacobian transpose + the encoding-Hessian
    # term of the grad3 output (g3_k * <adj_pe, enc''_k>) + the trilerp
    # geometry fold (first- and second-order weight terms)
    if "fold" in ab:
        gx_ref[:] = jnp.zeros((b, LANE), jnp.float32)
        return
    gx = _enc_jt(spec.encspec, sin_p, cos_p, ghin[:, :pw])
    F, _, _ = spec.encspec.enc
    svec, masks = _enc_consts(spec.encspec)
    s1c, s2c = 3, 3 + 3 * F
    d2sin = -sin_p * svec * svec
    d2cos = -cos_p * svec * svec
    a_s = adj[:, s1c:s2c]
    a_c = adj[:, s2c : s2c + 3 * F]
    gpos = _fold_pos_cotangent(geom, g, gate, wa, dwa, ddwa, d_w, d_dws)
    sec = jnp.concatenate(
        [
            g3[:, k : k + 1]
            * jnp.sum((a_s * d2sin + a_c * d2cos) * masks[k], axis=-1, keepdims=True)
            + gpos[k]
            for k in range(3)
        ]
        + [jnp.zeros((b, LANE - 3), jnp.float32)],
        axis=-1,
    )
    gx_ref[:] = gx + sec


# -------------------------------------------------- split backward (r5)
#
# The merged backward carries 2L+1 accumulator outputs (weight/bias grads
# + the whole table) that every grid step revisits, plus the full
# cotangent live set — the r4 ablation measured it 4.4x off its own
# cluster-free rate with no sensitivity to block size or table rows
# (VMEM/pipeline bound, not FLOP bound). The split factors it into:
#
#   B1 _bwd_sample_kernel: ALL per-sample math (adjoint-cotangent cluster,
#      ga-forward chain, reverse sweep, grid cotangents, position fold) —
#      no accumulators, no table operand. Emits gx, d_comp and the
#      lane-aligned stacks (ga, q_l, gz_l) the weight grads contract.
#   XLA weight grads (in op_bwd): gw_l = qin_l^T v_l + hin_l^T gz_l over
#      [N, H] bf16 stacks — big lane-aligned dense matmuls XLA runs at
#      full MXU rate (the old slow XLA fold was over lane-PADDED [N, K*8]
#      arrays; these are exact multiples of 128).
#   B2 _bwd_scatter_kernel: recomputes row indices (cheap iota math) and
#      scatters d_comp into the table — the only accumulator kernel.


def _bwd_sample_kernel(spec: SlotChainSpec, *refs):
    """Per-sample backward: everything except weight grads + table scatter.

    Same math as _fused_bwd_kernel minus the gw/gb/dtbl accumulation; the
    ga-forward chain stores q_l and the reverse sweep stores gz_l so the
    XLA-side weight-grad dots reproduce the merged kernel's contributions
    exactly (bf16 operands, f32 accumulation)."""
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    geom = spec.geom
    kf = K * geom.feats
    pw = spec.pe_width
    P0 = inner.in_dims[0]
    DL = inner.out_dims[-1]
    f, df, ddf = _act_triple(inner)
    dotv = _dot_b if geom.bf16 else _dot_hl
    dotgv = _dotg_b if geom.bf16 else _dotg_hl

    p = 0
    pos_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1
    comp_ref = refs[p]; p += 1
    gsg_ref = refs[p]; p += 1
    ggeo_ref = refs[p]; p += 1
    zs_ref = refs[p]; p += 1
    ss_ref = refs[p]; p += 1
    adj_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    s2_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; p += L
    gx_ref = refs[p]; p += 1
    dcomp_ref = refs[p]; p += 1
    ga_ref = refs[p]; p += 1
    qs_ref = refs[p]; p += 1
    gzs_ref = refs[p]; p += 1
    e_scr = refs[p]

    H = inner.out_dims[0]

    def zl(l):
        return zs_ref[:, l * H : (l + 1) * H]

    def sl(l):
        return ss_ref[:, l * H : (l + 1) * H]

    b = pos_ref.shape[0]
    cs = 1.0 / (2.0 * geom.radius)
    comp = comp_ref[:].astype(jnp.float32)
    s_mat = s_ref[:]
    s2 = s2_ref[:]
    p_mat = p_ref[:]
    m = m_ref[:]
    dn_t = (((1,), (1,)), ((), ()))

    # geometry (no idx — the scatter kernel owns the table)
    _, g, gate = _geom_rows(geom, spec.lv, pos_ref[:])
    w, wa, dwa, ddwa = _geom_weights(geom, g, order=2)
    dw_rows = []
    for k in range(3):
        u, v = (k + 1) % 3, (k + 2) % 3
        dw_rows.append((dwa[k] * wa[u] * wa[v]) * cs)
    wexp = dotv(w, p_mat)
    _, t0pe, sin_p, cos_p = _enc_fwd(spec.encspec, pos_ref[:])
    wl = [ws[l][:] for l in range(L)]
    adj = adj_ref[:]
    adjg = adj[:, pw : pw + kf] * m

    # incoming cotangents
    gsg = gsg_ref[:]
    ggeo = ggeo_ref[:].astype(jnp.float32)
    gcols_geo = min(ggeo.shape[1], DL - 1)
    tail = DL - 1 - gcols_geo
    gy = jnp.concatenate(
        [gsg[:, :1], ggeo[:, :gcols_geo]]
        + ([jnp.zeros((b, tail), jnp.float32)] if tail > 0 else []),
        axis=-1,
    )
    g3 = gsg[:, 1:4]

    # adjoint-cotangent cluster (see _fused_bwd_kernel for the algebra)
    ga_pe = sum(g3[:, k : k + 1] * t0pe[k].astype(jnp.float32) for k in range(3))
    dwsum = sum(g3[:, k : k + 1] * dw_rows[k] for k in range(3))
    dwg = dotv(dwsum, p_mat)
    ga_g = dotv(comp * dwg, s_mat) * m
    gc0 = dotgv(adjg, s_mat, dn_t)
    d_comp = gc0 * dwg
    dd0 = dotv(comp * gc0, s2)
    d_dws = [g3[:, k : k + 1] * dd0 for k in range(3)]
    pad = P0 - pw - kf
    ga = jnp.concatenate(
        [ga_pe, ga_g] + ([jnp.zeros((b, pad), jnp.float32)] if pad else []), axis=-1
    )
    ga_ref[:] = ga.astype(jnp.bfloat16)

    # ga-forward chain: store q_l (the layer-(l+1) input), e_l injections
    q = ga
    for l in range(L - 1):
        qin = (
            (jnp.concatenate([q, ga], axis=-1) / np.sqrt(2.0))
            if l in inner.skip
            else q
        )
        mq = jnp.dot(qin.astype(jnp.bfloat16), wl[l],
                     preferred_element_type=jnp.float32)
        if ddf is not None:
            e_scr[l] = (mq * sl(l).astype(jnp.float32) * ddf(zl(l))).astype(
                jnp.bfloat16
            )
        q = mq * df(zl(l))
        qs_ref[:, l * H : (l + 1) * H] = q.astype(jnp.bfloat16)

    # reverse sweep: store gz_l, emit ghin (no weight-grad dots)
    gx0 = jnp.zeros((b, P0), jnp.float32)
    gh = gy
    for l in reversed(range(L)):
        if l == L - 1:
            gz = gh
        else:
            gz = gh * df(zl(l))
            if ddf is not None:
                gz = gz + e_scr[l].astype(jnp.float32)
            gzs_ref[:, l * H : (l + 1) * H] = gz.astype(jnp.bfloat16)
        gzb = gz.astype(jnp.bfloat16)
        ghp = jax.lax.dot_general(
            gzb, wl[l], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l in inner.skip:
            hw = inner.in_dims[l] - P0
            gh = ghp[:, :hw] / np.sqrt(2.0)
            gx0 = gx0 + ghp[:, hw:] / np.sqrt(2.0)
        else:
            gh = ghp
    ghin = gh + gx0

    # grid slice of the input cotangent
    g_enc = ghin[:, pw : pw + kf] * m
    gt0 = dotgv(g_enc, s_mat, dn_t)
    d_comp = d_comp + gt0 * wexp
    d_w = dotv(comp * gt0, s2)
    dcomp_ref[:] = d_comp.astype(dcomp_ref.dtype)

    # position cotangent
    gx = _enc_jt(spec.encspec, sin_p, cos_p, ghin[:, :pw])
    F, _, _ = spec.encspec.enc
    svec, masks = _enc_consts(spec.encspec)
    s1c, s2c = 3, 3 + 3 * F
    d2sin = -sin_p * svec * svec
    d2cos = -cos_p * svec * svec
    a_s = adj[:, s1c:s2c]
    a_c = adj[:, s2c : s2c + 3 * F]
    gpos = _fold_pos_cotangent(geom, g, gate, wa, dwa, ddwa, d_w, d_dws)
    sec = jnp.concatenate(
        [
            g3[:, k : k + 1]
            * jnp.sum((a_s * d2sin + a_c * d2cos) * masks[k], axis=-1, keepdims=True)
            + gpos[k]
            for k in range(3)
        ]
        + [jnp.zeros((b, LANE - 3), jnp.float32)],
        axis=-1,
    )
    gx_ref[:] = gx + sec


def _bwd_scatter_kernel(spec: SlotChainSpec, *refs):
    """Accumulate d_comp into the table: the only revisited-output kernel."""
    geom = spec.geom
    pos_ref, dcomp_ref, dtbl_ref = refs
    b = pos_ref.shape[0]
    first = pl.program_id(0) == 0
    idx, _, _ = _geom_rows(geom, spec.lv, pos_ref[:])
    _scatter_onehot(
        idx, spec.lv, dtbl_ref, dcomp_ref[:].astype(jnp.float32), b, first,
        geom.pk, geom.bf16,
    )


def _wgrads_xla(inner: ChainSpec, c: int, x0, zs, ss, gy, ga, qs, gzs):
    """Weight/bias grads from the B1 stacks: gw_l = qin_l^T v_l + hin_l^T
    gz_l, gb_l = colsum(gz_l) — the merged kernel's two accumulation
    families as XLA dense matmuls over [N, H]-aligned bf16 arrays."""
    L = inner.n_layers
    H = inner.out_dims[0]
    DL = inner.out_dims[-1]
    P0 = inner.in_dims[0]
    f, df, _ = _act_triple(inner)
    dn_acc = (((0,), (0,)), ((), ()))
    inv_s2 = 1.0 / np.sqrt(2.0)

    def col(stack, l):
        return stack[:, l * H : (l + 1) * H]

    gws, gbs = [], []
    for l in range(L):
        q = ga if l == 0 else col(qs, l - 1)
        qin = (
            jnp.concatenate([q, ga], axis=-1) * inv_s2 if l in inner.skip else q
        ).astype(jnp.bfloat16)
        h = x0 if l == 0 else f(col(zs, l - 1).astype(jnp.float32)).astype(jnp.bfloat16)
        hin = (
            jnp.concatenate([h, x0], axis=-1) * inv_s2 if l in inner.skip else h
        ).astype(jnp.bfloat16)
        gz = gy if l == L - 1 else col(gzs, l).astype(jnp.float32)
        gw = jax.lax.dot_general(
            hin, gz.astype(jnp.bfloat16), dimension_numbers=dn_acc,
            preferred_element_type=jnp.float32,
        )
        if l == L - 1:
            # v_{L-1} = onehot(c): the adjoint-path grad is rank-1
            gw = gw.at[:, c].add(jnp.sum(qin.astype(jnp.float32), axis=0))
        else:
            v = (col(ss, l).astype(jnp.float32) * df(col(zs, l))).astype(jnp.bfloat16)
            gw = gw + jax.lax.dot_general(
                qin, v, dimension_numbers=dn_acc,
                preferred_element_type=jnp.float32,
            )
        gws.append(gw)
        gbs.append(jnp.sum(gz, axis=0, keepdims=True))
    return tuple(gws), tuple(gbs)


# ------------------------------------------------------------- pallas glue

@functools.lru_cache(maxsize=None)
def _build_fused(spec: SlotChainSpec, n_total: int, interpret: bool):
    inner = spec.inner
    L, B = inner.n_layers, inner.block
    Bf = spec.fwd_block or B
    assert n_total % B == 0 and n_total % Bf == 0
    grid = (n_total // B,)
    K = spec.levels
    bf16 = spec.geom.bf16
    kf = K * spec.geom.feats
    G = inner.geo_width

    def blk(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM)

    pos_spec = blk((B, LANE))
    m_spec = _const_spec((1, kf))
    tbl_spec = _const_spec((spec.rows, LANE))
    tbl_specs = [tbl_spec] if bf16 else [tbl_spec, tbl_spec]
    s_spec = _const_spec((K * LANE, kf))
    s2_spec = _const_spec((K * LANE, K * NSLOT))
    p_spec = _const_spec((K * NSLOT, K * LANE))
    w_specs = [_const_spec((din, dout)) for din, dout in zip(inner.in_dims, inner.out_dims)]
    b_specs = [_const_spec((1, dout)) for dout in inner.out_dims]
    sg_spec = blk((B, LANE))
    geo_spec = blk((B, G))
    comp_spec = blk((B, K * LANE))

    comp_dtype = jnp.bfloat16 if bf16 else jnp.float32
    H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]
    P0 = inner.in_dims[0]
    # residual stacks (z pre-activations, adjoint-sweep s rows, adjoint):
    # emitted by the grad-path forward so the backward never rebuilds the
    # chain (only when L > 1 for z/s; adj always; x0 for the split
    # backward's XLA weight-grad dots)
    split = spec.bwd_split
    if split and L < 2:
        raise ValueError("bwd_split requires a multi-layer chain")
    resid_specs = ([blk((Bf, (L - 1) * H))] * 2 if L > 1 else []) + [blk((Bf, P0))]
    resid_shapes = (
        [jax.ShapeDtypeStruct((n_total, (L - 1) * H), jnp.bfloat16)] * 2
        if L > 1
        else []
    ) + [jax.ShapeDtypeStruct((n_total, P0), jnp.float32)]
    if split:
        resid_specs = resid_specs + [blk((Bf, P0))]
        resid_shapes = resid_shapes + [
            jax.ShapeDtypeStruct((n_total, P0), jnp.bfloat16)
        ]

    def make_fwd(resid):
        return pl.pallas_call(
            functools.partial(_fused_fwd_kernel, spec, resid),
            grid=(n_total // Bf,),
            in_specs=[blk((Bf, LANE)), m_spec] + tbl_specs + [s_spec, p_spec]
            + w_specs + b_specs,
            out_specs=[blk((Bf, LANE)), blk((Bf, G)), blk((Bf, K * LANE))]
            + (resid_specs if resid else []),
            out_shape=[
                jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_total, G), jnp.bfloat16),
                jax.ShapeDtypeStruct((n_total, K * LANE), comp_dtype),
            ]
            + (resid_shapes if resid else []),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )

    fwd_lite, fwd_call = make_fwd(False), make_fwd(True)

    if split:
        dcomp_dtype = jnp.bfloat16 if bf16 else jnp.float32
        b1_call = pl.pallas_call(
            functools.partial(_bwd_sample_kernel, spec),
            grid=grid,
            in_specs=[pos_spec, m_spec, comp_spec, sg_spec, geo_spec]
            + [blk((B, (L - 1) * H))] * 2 + [blk((B, P0))]
            + [s_spec, s2_spec, p_spec] + w_specs,
            out_specs=[
                blk((B, LANE)),  # gx
                blk((B, K * LANE)),  # d_comp
                blk((B, P0)),  # ga
                blk((B, (L - 1) * H)),  # q stack
                blk((B, (L - 1) * H)),  # gz stack
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_total, K * LANE), dcomp_dtype),
                jax.ShapeDtypeStruct((n_total, P0), jnp.bfloat16),
                jax.ShapeDtypeStruct((n_total, (L - 1) * H), jnp.bfloat16),
                jax.ShapeDtypeStruct((n_total, (L - 1) * H), jnp.bfloat16),
            ],
            scratch_shapes=[pltpu.VMEM((max(L - 1, 1), B, H), jnp.bfloat16)],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )
        Bs = spec.scatter_block or B
        assert n_total % Bs == 0
        scat_call = pl.pallas_call(
            functools.partial(_bwd_scatter_kernel, spec),
            grid=(n_total // Bs,),
            in_specs=[blk((Bs, LANE)), blk((Bs, K * LANE))],
            out_specs=[tbl_spec],
            out_shape=[jax.ShapeDtypeStruct((spec.rows, LANE), jnp.float32)],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )

    bwd_resid_specs = (
        [blk((B, (L - 1) * H))] * 2 if L > 1 else []
    ) + [blk((B, P0))]
    bwd_call = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, spec),
        grid=grid,
        in_specs=[pos_spec, m_spec, comp_spec, sg_spec, geo_spec]
        + bwd_resid_specs
        + [s_spec, s2_spec, p_spec] + w_specs + b_specs,
        out_specs=[
            blk((B, LANE)),  # gx
            tbl_spec,  # d_table (accumulates over the grid)
        ]
        + [_const_spec((din, dout)) for din, dout in zip(inner.in_dims, inner.out_dims)]
        + [_const_spec((1, dout)) for dout in inner.out_dims],
        out_shape=[
            jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
            jax.ShapeDtypeStruct((spec.rows, LANE), jnp.float32),
        ]
        + [
            jax.ShapeDtypeStruct((din, dout), jnp.float32)
            for din, dout in zip(inner.in_dims, inner.out_dims)
        ]
        + [jax.ShapeDtypeStruct((1, dout), jnp.float32) for dout in inner.out_dims],
        scratch_shapes=[pltpu.VMEM((max(L - 1, 1), B, H), jnp.bfloat16)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    s1m, s2m = (x.astype(jnp.bfloat16) for x in _sum_matrices(K, spec.geom.feats))
    pm = _expand_matrix(K, spec.geom.feats).astype(jnp.bfloat16)

    def _tbl_ops(table):
        hi = table.astype(jnp.bfloat16)
        if bf16:
            return (hi,)
        return hi, (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    @jax.custom_vjp
    def op(pos, mask, table, wps, bps):
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            sg, geo, _ = fwd_lite(
                pos, mask, *_tbl_ops(table), jnp.asarray(s1m), jnp.asarray(pm),
                *wbs, *bps,
            )
        return sg, geo

    def op_fwd(pos, mask, table, wps, bps):
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            sg, geo, comp, *resid = fwd_call(
                pos, mask, *_tbl_ops(table), jnp.asarray(s1m), jnp.asarray(pm),
                *wbs, *bps,
            )
        return (sg, geo), (pos, mask, comp, tuple(resid), wps, bps)

    def op_bwd(res, g):
        pos, mask, comp, resid, wps, bps = res
        gsg, ggeo = g
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        L = inner.n_layers
        gsg32 = gsg.astype(jnp.float32)
        ggeo16 = ggeo.astype(jnp.bfloat16)
        with jax.default_matmul_precision("bfloat16"):
            if split:
                zs, ss, adj, x0 = resid
                gx, d_comp, ga, qs, gzs = b1_call(
                    pos, mask, comp, gsg32, ggeo16, zs, ss, adj,
                    jnp.asarray(s1m), jnp.asarray(s2m), jnp.asarray(pm), *wbs,
                )
                (d_tbl,) = scat_call(pos, d_comp)
                DL = inner.out_dims[-1]
                gcols = min(ggeo.shape[1], DL - 1)
                tail = DL - 1 - gcols
                gy = jnp.concatenate(
                    [gsg32[:, :1], ggeo16[:, :gcols].astype(jnp.float32)]
                    + (
                        [jnp.zeros((gsg.shape[0], tail), jnp.float32)]
                        if tail > 0
                        else []
                    ),
                    axis=-1,
                )
                gws, gbs = _wgrads_xla(
                    inner, inner.tangent_out_channel, x0, zs, ss, gy, ga, qs, gzs
                )
            else:
                outs = bwd_call(
                    pos, mask, comp, gsg32, ggeo16, *resid,
                    jnp.asarray(s1m), jnp.asarray(s2m), jnp.asarray(pm),
                    *wbs, *bps,
                )
                gx, d_tbl = outs[0], outs[1]
                gws = tuple(outs[2 : 2 + L])
                gbs = tuple(outs[2 + L : 2 + 2 * L])
        # the coarse-to-fine mask is a schedule, never a trainable — its
        # (nonzero) cotangent is deliberately dropped
        d_mask = jnp.zeros((1, kf), jnp.float32)
        return gx, d_mask, d_tbl, gws, gbs

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_slot_sdf_chain(
    positions: jnp.ndarray,
    table: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    gspec: SlotGridSpec,
    *,
    radius: float,
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    skip: Tuple[int, ...] = (),
    activation: str = "SoftplusQuad",
    beta: float = 100.0,
    level_mask: Optional[jnp.ndarray] = None,
    block: int = 0,
    fwd_block: int = 0,
    interpret: Optional[bool] = None,
):
    """Fused slot-grid + NeRF-encoding + chain + adjoint SDF evaluation.

    positions [N, 3]: raw field coordinates. The kernel derives the table
    coordinates x = clip((pos + radius) / 2*radius, 0, 1-1e-6) and the
    trilerp geometry in-kernel (no idx/w/dw operands).
    level_mask: optional [K*F] multiplier (coarse-to-fine), traced.
    Returns (sdf [N], geo [N, D_out-1] bf16, grad [N, 3] f32).
    MMS_SLOT_BLOCK / MMS_SLOT_FWD_BLOCK override the backward/forward
    block sizes (perf experiments); fwd_block 0 = DEFAULT_FWD_BLOCK.
    """
    import os as _os

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not block:
        block = int(_os.environ.get("MMS_SLOT_BLOCK", "0")) or DEFAULT_BLOCK
    if not fwd_block:
        fwd_block = (
            int(_os.environ.get("MMS_SLOT_FWD_BLOCK", "0")) or DEFAULT_FWD_BLOCK or block
        )
    sblock = int(_os.environ.get("MMS_SLOT_SCATTER_BLOCK", "0")) or block
    n = positions.shape[0]
    K = gspec.num_levels
    kf = K * gspec.feats
    pw = 3 + 6 * num_frequencies
    d_in = pw + kf
    d_out = weights[-1].shape[1]
    in_dims, out_dims, p0, hidden = _chain_geometry(d_in, weights, skip)

    n_pad = _rup(n, max(block, fwd_block, sblock))
    posp = _pad_operand(positions, n_pad, LANE, jnp.float32)
    mask = (
        jnp.ones((1, kf), jnp.float32)
        if level_mask is None
        else level_mask.astype(jnp.float32).reshape(1, kf)
    )

    inner = ChainSpec(
        in_dims=in_dims, out_dims=out_dims, skip=tuple(sorted(skip)),
        activation=activation, beta=beta, n_tangents=0, block=block,
        tangent_out_channel=0,
        enc=(num_frequencies, float(min_freq_exp), float(max_freq_exp)),
        sdf_split=True, geo_width=_rup(d_out - 1), adjoint=True,
    )
    encspec = dataclasses.replace(inner, in_dims=(pw,) + in_dims[1:])
    lv = tuple(
        (int(o), int(r))
        for o, r in zip(gspec.level_offsets[:K], gspec.level_rows[:K])
    )
    spec = SlotChainSpec(
        inner=inner, encspec=encspec, levels=K, lv=lv,
        rows=gspec.total_rows, pe_width=pw,
        geom=_make_geom(gspec, K, radius),
        fwd_block=fwd_block if fwd_block != block else 0,
        scatter_block=sblock if sblock != block else 0,
        ablate=tuple(
            s for s in _os.environ.get("MMS_SLOT_ABLATE", "").split(",") if s
        ),
        bwd_split=_os.environ.get("MMS_SLOT_BWD_SPLIT", "0") == "1"
        and len(out_dims) > 1,
    )

    wps = tuple(
        _pad_weight(wt, l, din, dout, d_in, hidden, skip)
        for l, (wt, din, dout) in enumerate(zip(weights, in_dims, out_dims))
    )
    bps = tuple(
        jnp.zeros((1, dout), jnp.float32).at[0, : bb.shape[0]].set(bb.astype(jnp.float32))
        for bb, dout in zip(biases, out_dims)
    )

    op = _build_fused(spec, n_pad, interpret)
    sg, geo = op(posp, mask, table, wps, bps)
    return sg[:n, 0], geo[:n, : d_out - 1], sg[:n, 1:4]


# --------------------------------------------------- value-only fused kernel
#
# Sampler SDF queries (stop-grad) and curvature hessian taps need only the
# sdf VALUE — no spatial gradient, no geo feature. Routing them through the
# two-kernel composition (slot_grid_lookup -> XLA trilerp glue -> chain)
# cost ~115 ms of the 331 ms grid step at 2048x5 rays (r3 trace
# prof_grid_raw_tpu_2048_512: 40 ms lookup fwd + 27 ms lookup bwd + ~50 ms
# XLA mul/reduce_sum/concat glue). This op runs geometry -> gather ->
# trilerp -> NeRF encoding -> chain -> sdf in ONE kernel; its backward is
# one standard reverse sweep (first-order only — the curvature loss
# consumes plain sdf values) plus the slot scatter and the trilerp weight
# fold into the position cotangent. Mirrors tcnn's NetworkWithInputEncoding
# value path (reference src/field_components/mlp.py:246-293).


def _value_fwd_kernel(spec: SlotChainSpec, resid: bool, *refs):
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    geom = spec.geom
    kf = K * geom.feats
    pw = spec.pe_width
    f, _, _ = _act_triple(inner)
    dotv = _dot_b if geom.bf16 else _dot_hl

    p = 0
    pos_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1
    tblh_ref = refs[p]; p += 1
    tbll_ref = None
    if not geom.bf16:
        tbll_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; bs = refs[p + L : p + 2 * L]; p += 2 * L
    sdf_ref = refs[p]; p += 1
    comp_ref = refs[p]; p += 1
    zs_ref = x0_ref = None
    if resid:
        if L > 1:
            zs_ref = refs[p]; p += 1
        if spec.bwd_split:
            x0_ref = refs[p]

    b = pos_ref.shape[0]
    idx, g, _ = _geom_rows(geom, spec.lv, pos_ref[:])
    w = _geom_weights(geom, g)
    comp = _gather_onehot(idx, spec.lv, tblh_ref, tbll_ref, b, geom.pk)
    comp_ref[:] = comp.astype(comp_ref.dtype)
    wexp = dotv(w, p_ref[:])
    encg = dotv(comp * wexp, s_ref[:]) * m_ref[:]

    h0pe, _, _, _ = _enc_fwd(spec.encspec, pos_ref[:], want_t0=False)
    pad = inner.in_dims[0] - pw - kf
    x0 = jnp.concatenate(
        [h0pe, encg.astype(jnp.bfloat16)]
        + ([jnp.zeros((b, pad), jnp.bfloat16)] if pad else []),
        axis=-1,
    )
    H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]
    if x0_ref is not None:
        x0_ref[:] = x0
    h = x0
    for l in range(L):
        if l in inner.skip:
            h = (jnp.concatenate([h, x0], axis=-1) / np.sqrt(2.0)).astype(jnp.bfloat16)
        z = jnp.dot(h, ws[l][:], preferred_element_type=jnp.float32) + bs[l][:]
        if l < L - 1:
            if zs_ref is not None:
                zs_ref[:, l * H : (l + 1) * H] = z.astype(jnp.bfloat16)
            h = f(z).astype(jnp.bfloat16)
        else:
            h = z
    sdf_ref[:] = jnp.concatenate(
        [h[:, :1], jnp.zeros((b, LANE - 1), jnp.float32)], axis=-1
    )


def _value_bwd_kernel(spec: SlotChainSpec, *refs):
    """First-order backward of sdf wrt (pos, table, W_l, b_l)."""
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    geom = spec.geom
    kf = K * geom.feats
    pw = spec.pe_width
    P0 = inner.in_dims[0]
    DL = inner.out_dims[-1]
    f, df, _ = _act_triple(inner)
    dotv = _dot_b if geom.bf16 else _dot_hl
    dotgv = _dotg_b if geom.bf16 else _dotg_hl
    first = pl.program_id(0) == 0

    p = 0
    pos_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1
    comp_ref = refs[p]; p += 1
    gs_ref = refs[p]; p += 1
    zs_ref = None
    if L > 1:
        zs_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    s2_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; bs = refs[p + L : p + 2 * L]; p += 2 * L
    gx_ref = refs[p]; p += 1
    dtbl_ref = refs[p]; p += 1
    gw_refs = refs[p : p + L]; gb_refs = refs[p + L : p + 2 * L]

    H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]

    def zl(l):
        return zs_ref[:, l * H : (l + 1) * H]

    b = pos_ref.shape[0]
    comp = comp_ref[:].astype(jnp.float32)
    s_mat = s_ref[:]
    p_mat = p_ref[:]
    m = m_ref[:]
    dn_t = (((1,), (1,)), ((), ()))

    # geometry + x0 (z residuals come from the forward kernel — no rebuild)
    idx, g, gate = _geom_rows(geom, spec.lv, pos_ref[:])
    w, wa, dwa = _geom_weights(geom, g, order=1)
    wexp = dotv(w, p_mat)
    encg = dotv(comp * wexp, s_mat) * m
    h0pe, _, sin_p, cos_p = _enc_fwd(spec.encspec, pos_ref[:], want_t0=False)
    pad = P0 - pw - kf
    x0 = jnp.concatenate(
        [h0pe, encg.astype(jnp.bfloat16)]
        + ([jnp.zeros((b, pad), jnp.bfloat16)] if pad else []),
        axis=-1,
    )
    wl = [ws[l][:] for l in range(L)]

    gsdf = gs_ref[:]  # [B, LANE] f32, col 0 = d loss / d sdf
    gy = jnp.concatenate([gsdf[:, :1], jnp.zeros((b, DL - 1), jnp.float32)], axis=-1)

    def layer_input(l):
        hin = x0 if l == 0 else f(zl(l - 1).astype(jnp.float32)).astype(jnp.bfloat16)
        if l in inner.skip:
            hin = (jnp.concatenate([hin, x0], axis=-1) / np.sqrt(2.0)).astype(
                jnp.bfloat16
            )
        return hin

    gx0 = jnp.zeros((b, P0), jnp.float32)
    gh = gy
    for l in reversed(range(L)):
        gz = gh if l == L - 1 else gh * df(zl(l))
        gzb = gz.astype(jnp.bfloat16)
        gw = jax.lax.dot_general(
            layer_input(l), gzb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gb = jnp.sum(gz, axis=0, keepdims=True)
        gw_ref, gb_ref = gw_refs[l], gb_refs[l]

        @pl.when(first)
        def _():
            gw_ref[:] = gw
            gb_ref[:] = gb

        @pl.when(jnp.logical_not(first))
        def _():
            gw_ref[:] = gw_ref[:] + gw
            gb_ref[:] = gb_ref[:] + gb

        ghp = jax.lax.dot_general(
            gzb, wl[l], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l in inner.skip:
            hw = inner.in_dims[l] - P0
            gh = ghp[:, :hw] / np.sqrt(2.0)
            gx0 = gx0 + ghp[:, hw:] / np.sqrt(2.0)
        else:
            gh = ghp
    ghin = gh + gx0  # [B, P0] cotangent on x0

    g_enc = ghin[:, pw : pw + kf] * m
    gt0 = dotgv(g_enc, s_mat, dn_t)  # [B, K*128]
    d_comp = gt0 * wexp
    d_w = dotv(comp * gt0, s2_ref[:])  # [B, K*8] cotangent on w
    _scatter_onehot(
        idx, spec.lv, dtbl_ref, d_comp, b, first, geom.pk, geom.bf16
    )
    gpos = _fold_pos_cotangent(geom, g, gate, wa, dwa, None, d_w, None)
    gx_ref[:] = _enc_jt(spec.encspec, sin_p, cos_p, ghin[:, :pw]) + jnp.concatenate(
        gpos + [jnp.zeros((b, LANE - 3), jnp.float32)], axis=-1
    )


def _value_bwd_sample_kernel(spec: SlotChainSpec, *refs):
    """Per-sample half of the value backward (split mode): reverse sweep
    without weight-grad/table accumulation; emits gx, d_comp and the gz
    stack for the XLA weight-grad dots."""
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    geom = spec.geom
    kf = K * geom.feats
    pw = spec.pe_width
    P0 = inner.in_dims[0]
    DL = inner.out_dims[-1]
    f, df, _ = _act_triple(inner)
    dotv = _dot_b if geom.bf16 else _dot_hl
    dotgv = _dotg_b if geom.bf16 else _dotg_hl

    p = 0
    pos_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1
    comp_ref = refs[p]; p += 1
    gs_ref = refs[p]; p += 1
    zs_ref = None
    if L > 1:
        zs_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    s2_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; p += L
    gx_ref = refs[p]; p += 1
    dcomp_ref = refs[p]; p += 1
    gzs_ref = refs[p]

    H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]

    def zl(l):
        return zs_ref[:, l * H : (l + 1) * H]

    b = pos_ref.shape[0]
    comp = comp_ref[:].astype(jnp.float32)
    s_mat = s_ref[:]
    p_mat = p_ref[:]
    m = m_ref[:]
    dn_t = (((1,), (1,)), ((), ()))

    _, g, gate = _geom_rows(geom, spec.lv, pos_ref[:])
    w, wa, dwa = _geom_weights(geom, g, order=1)
    wexp = dotv(w, p_mat)
    _, _, sin_p, cos_p = _enc_fwd(spec.encspec, pos_ref[:], want_t0=False)
    wl = [ws[l][:] for l in range(L)]

    gsdf = gs_ref[:]
    gy = jnp.concatenate([gsdf[:, :1], jnp.zeros((b, DL - 1), jnp.float32)], axis=-1)

    gx0 = jnp.zeros((b, P0), jnp.float32)
    gh = gy
    for l in reversed(range(L)):
        gz = gh if l == L - 1 else gh * df(zl(l))
        if l < L - 1:
            gzs_ref[:, l * H : (l + 1) * H] = gz.astype(jnp.bfloat16)
        gzb = gz.astype(jnp.bfloat16)
        ghp = jax.lax.dot_general(
            gzb, wl[l], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l in inner.skip:
            hw = inner.in_dims[l] - P0
            gh = ghp[:, :hw] / np.sqrt(2.0)
            gx0 = gx0 + ghp[:, hw:] / np.sqrt(2.0)
        else:
            gh = ghp
    ghin = gh + gx0

    g_enc = ghin[:, pw : pw + kf] * m
    gt0 = dotgv(g_enc, s_mat, dn_t)
    dcomp_ref[:] = (gt0 * wexp).astype(dcomp_ref.dtype)
    d_w = dotv(comp * gt0, s2_ref[:])
    gpos = _fold_pos_cotangent(geom, g, gate, wa, dwa, None, d_w, None)
    gx_ref[:] = _enc_jt(spec.encspec, sin_p, cos_p, ghin[:, :pw]) + jnp.concatenate(
        gpos + [jnp.zeros((b, LANE - 3), jnp.float32)], axis=-1
    )


def _value_wgrads_xla(inner: ChainSpec, x0, zs, gy, gzs):
    """First-order weight/bias grads from the value-kernel stacks."""
    L = inner.n_layers
    H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]
    f, _, _ = _act_triple(inner)
    dn_acc = (((0,), (0,)), ((), ()))
    inv_s2 = 1.0 / np.sqrt(2.0)
    gws, gbs = [], []
    for l in range(L):
        h = x0 if l == 0 else f(
            zs[:, (l - 1) * H : l * H].astype(jnp.float32)
        ).astype(jnp.bfloat16)
        hin = (
            jnp.concatenate([h, x0], axis=-1) * inv_s2 if l in inner.skip else h
        ).astype(jnp.bfloat16)
        gz = gy if l == L - 1 else gzs[:, l * H : (l + 1) * H].astype(jnp.float32)
        gw = jax.lax.dot_general(
            hin, gz.astype(jnp.bfloat16), dimension_numbers=dn_acc,
            preferred_element_type=jnp.float32,
        )
        gws.append(gw)
        gbs.append(jnp.sum(gz, axis=0, keepdims=True))
    return tuple(gws), tuple(gbs)


@functools.lru_cache(maxsize=None)
def _build_value(spec: SlotChainSpec, n_total: int, interpret: bool):
    inner = spec.inner
    L, B = inner.n_layers, inner.block
    Bf = spec.fwd_block or B
    assert n_total % B == 0 and n_total % Bf == 0
    grid = (n_total // B,)
    K = spec.levels
    bf16 = spec.geom.bf16
    kf = K * spec.geom.feats

    def blk(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM)

    pos_spec = blk((B, LANE))
    m_spec = _const_spec((1, kf))
    tbl_spec = _const_spec((spec.rows, LANE))
    tbl_specs = [tbl_spec] if bf16 else [tbl_spec, tbl_spec]
    s_spec = _const_spec((K * LANE, kf))
    s2_spec = _const_spec((K * LANE, K * NSLOT))
    p_spec = _const_spec((K * NSLOT, K * LANE))
    w_specs = [_const_spec((din, dout)) for din, dout in zip(inner.in_dims, inner.out_dims)]
    b_specs = [_const_spec((1, dout)) for dout in inner.out_dims]
    sdf_spec = blk((B, LANE))
    comp_spec = blk((B, K * LANE))

    comp_dtype = jnp.bfloat16 if bf16 else jnp.float32
    H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]
    P0 = inner.in_dims[0]
    split = spec.bwd_split and L > 1
    resid_specs = [blk((Bf, (L - 1) * H))] if L > 1 else []
    resid_shapes = (
        [jax.ShapeDtypeStruct((n_total, (L - 1) * H), jnp.bfloat16)] if L > 1 else []
    )
    if split:
        resid_specs = resid_specs + [blk((Bf, P0))]
        resid_shapes = resid_shapes + [
            jax.ShapeDtypeStruct((n_total, P0), jnp.bfloat16)
        ]

    def make_fwd(resid):
        return pl.pallas_call(
            functools.partial(_value_fwd_kernel, spec, resid),
            grid=(n_total // Bf,),
            in_specs=[blk((Bf, LANE)), m_spec] + tbl_specs + [s_spec, p_spec]
            + w_specs + b_specs,
            out_specs=[blk((Bf, LANE)), blk((Bf, K * LANE))]
            + (resid_specs if resid else []),
            out_shape=[
                jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_total, K * LANE), comp_dtype),
            ]
            + (resid_shapes if resid else []),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )

    fwd_lite, fwd_call = make_fwd(False), make_fwd(True)

    if split:
        dcomp_dtype = jnp.bfloat16 if bf16 else jnp.float32
        b1_call = pl.pallas_call(
            functools.partial(_value_bwd_sample_kernel, spec),
            grid=grid,
            in_specs=[pos_spec, m_spec, comp_spec, sdf_spec]
            + [blk((B, (L - 1) * H))]
            + [s_spec, s2_spec, p_spec] + w_specs,
            out_specs=[
                blk((B, LANE)),
                blk((B, K * LANE)),
                blk((B, (L - 1) * H)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_total, K * LANE), dcomp_dtype),
                jax.ShapeDtypeStruct((n_total, (L - 1) * H), jnp.bfloat16),
            ],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )
        Bs = spec.scatter_block or B
        assert n_total % Bs == 0
        scat_call = pl.pallas_call(
            functools.partial(_bwd_scatter_kernel, spec),
            grid=(n_total // Bs,),
            in_specs=[blk((Bs, LANE)), blk((Bs, K * LANE))],
            out_specs=[tbl_spec],
            out_shape=[jax.ShapeDtypeStruct((spec.rows, LANE), jnp.float32)],
            compiler_params=_compiler_params(),
            interpret=interpret,
        )

    bwd_call = pl.pallas_call(
        functools.partial(_value_bwd_kernel, spec),
        grid=grid,
        in_specs=[pos_spec, m_spec, comp_spec, sdf_spec]
        + ([blk((B, (L - 1) * H))] if L > 1 else [])
        + [s_spec, s2_spec, p_spec] + w_specs + b_specs,
        out_specs=[
            blk((B, LANE)),  # gx
            tbl_spec,  # d_table (accumulates over the grid)
        ]
        + [_const_spec((din, dout)) for din, dout in zip(inner.in_dims, inner.out_dims)]
        + [_const_spec((1, dout)) for dout in inner.out_dims],
        out_shape=[
            jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
            jax.ShapeDtypeStruct((spec.rows, LANE), jnp.float32),
        ]
        + [
            jax.ShapeDtypeStruct((din, dout), jnp.float32)
            for din, dout in zip(inner.in_dims, inner.out_dims)
        ]
        + [jax.ShapeDtypeStruct((1, dout), jnp.float32) for dout in inner.out_dims],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    s1m, s2m = (x.astype(jnp.bfloat16) for x in _sum_matrices(K, spec.geom.feats))
    pm = _expand_matrix(K, spec.geom.feats).astype(jnp.bfloat16)

    def _tbl_ops(table):
        hi = table.astype(jnp.bfloat16)
        if bf16:
            return (hi,)
        return hi, (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    @jax.custom_vjp
    def op(pos, mask, table, wps, bps):
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            sdf, _ = fwd_lite(
                pos, mask, *_tbl_ops(table), jnp.asarray(s1m), jnp.asarray(pm),
                *wbs, *bps,
            )
        return sdf

    def op_fwd(pos, mask, table, wps, bps):
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            sdf, comp, *resid = fwd_call(
                pos, mask, *_tbl_ops(table), jnp.asarray(s1m), jnp.asarray(pm),
                *wbs, *bps,
            )
        return sdf, (pos, mask, comp, tuple(resid), wps, bps)

    def op_bwd(res, gsdf):
        pos, mask, comp, resid, wps, bps = res
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        L = inner.n_layers
        gsdf32 = gsdf.astype(jnp.float32)
        with jax.default_matmul_precision("bfloat16"):
            if split:
                zs, x0 = resid
                gx, d_comp, gzs = b1_call(
                    pos, mask, comp, gsdf32, zs,
                    jnp.asarray(s1m), jnp.asarray(s2m), jnp.asarray(pm), *wbs,
                )
                (d_tbl,) = scat_call(pos, d_comp)
                DL = inner.out_dims[-1]
                gy = jnp.concatenate(
                    [gsdf32[:, :1], jnp.zeros((gsdf.shape[0], DL - 1), jnp.float32)],
                    axis=-1,
                )
                gws, gbs = _value_wgrads_xla(inner, x0, zs, gy, gzs)
            else:
                outs = bwd_call(
                    pos, mask, comp, gsdf32, *resid,
                    jnp.asarray(s1m), jnp.asarray(s2m), jnp.asarray(pm),
                    *wbs, *bps,
                )
                gx, d_tbl = outs[0], outs[1]
                gws = tuple(outs[2 : 2 + L])
                gbs = tuple(outs[2 + L : 2 + 2 * L])
        d_mask = jnp.zeros((1, kf), jnp.float32)
        return gx, d_mask, d_tbl, gws, gbs

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_slot_sdf_value(
    positions: jnp.ndarray,
    table: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    gspec: SlotGridSpec,
    *,
    radius: float,
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    skip: Tuple[int, ...] = (),
    activation: str = "SoftplusQuad",
    beta: float = 100.0,
    level_mask: Optional[jnp.ndarray] = None,
    num_levels: Optional[int] = None,
    block: int = 0,
    fwd_block: int = 0,
    interpret: Optional[bool] = None,
):
    """Fused slot-grid + NeRF-encoding + chain SDF **value** evaluation.

    Like fused_slot_sdf_chain but emits only sdf [N] f32: no spatial
    tangents, no adjoint sweep, no geo output — the sampler/curvature-tap
    workload. num_levels statically truncates the gather to the first k
    levels (sampler coarse queries); truncated feature columns enter the
    chain as zeros, matching slot_grid_lookup's padding. level_mask is the
    traced coarse-to-fine mask over the ACTIVE k*F feature columns.
    First-order gradients only (positions/table/weights/biases) — the
    hessian-of-sdf path must use fused_slot_sdf_chain.
    MMS_SLOT_BLOCK overrides the block size (perf experiments).
    """
    import os as _os

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not block:
        block = int(_os.environ.get("MMS_SLOT_BLOCK", "0")) or DEFAULT_BLOCK
    if not fwd_block:
        fwd_block = (
            int(_os.environ.get("MMS_SLOT_FWD_BLOCK", "0")) or DEFAULT_FWD_BLOCK or block
        )
    sblock = int(_os.environ.get("MMS_SLOT_SCATTER_BLOCK", "0")) or block
    n = positions.shape[0]
    K = (
        gspec.num_levels
        if num_levels is None
        else min(int(num_levels), gspec.num_levels)
    )
    kf = K * gspec.feats
    pw = 3 + 6 * num_frequencies
    d_in = pw + gspec.num_levels * gspec.feats  # full MLP input width (all levels)
    in_dims, out_dims, p0, hidden = _chain_geometry(d_in, weights, skip)

    n_pad = _rup(n, max(block, fwd_block, sblock))
    posp = _pad_operand(positions, n_pad, LANE, jnp.float32)
    mask = (
        jnp.ones((1, kf), jnp.float32)
        if level_mask is None
        else level_mask.astype(jnp.float32).reshape(1, kf)
    )

    inner = ChainSpec(
        in_dims=in_dims, out_dims=out_dims, skip=tuple(sorted(skip)),
        activation=activation, beta=beta, n_tangents=0, block=block,
        tangent_out_channel=0,
        enc=(num_frequencies, float(min_freq_exp), float(max_freq_exp)),
    )
    encspec = dataclasses.replace(inner, in_dims=(pw,) + in_dims[1:])
    lv = tuple(
        (int(o), int(r))
        for o, r in zip(gspec.level_offsets[:K], gspec.level_rows[:K])
    )
    spec = SlotChainSpec(
        inner=inner, encspec=encspec, levels=K, lv=lv,
        rows=gspec.total_rows, pe_width=pw,
        geom=_make_geom(gspec, K, radius),
        fwd_block=fwd_block if fwd_block != block else 0,
        scatter_block=sblock if sblock != block else 0,
        bwd_split=_os.environ.get("MMS_SLOT_BWD_SPLIT", "0") == "1"
        and len(out_dims) > 1,
    )

    wps = tuple(
        _pad_weight(wt, l, din, dout, d_in, hidden, skip)
        for l, (wt, din, dout) in enumerate(zip(weights, in_dims, out_dims))
    )
    bps = tuple(
        jnp.zeros((1, dout), jnp.float32).at[0, : bb.shape[0]].set(bb.astype(jnp.float32))
        for bb, dout in zip(biases, out_dims)
    )

    op = _build_value(spec, n_pad, interpret)
    sdf = op(posp, mask, table, wps, bps)
    return sdf[:n, 0]
