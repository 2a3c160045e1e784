"""Fully-fused slot-grid + MLP SDF kernel: the NetworkWithInputEncoding
answer (reference src/field_components/mlp.py:246-293 — tcnn couples its
HashGrid encoding and FullyFusedMLP into one kernel for exactly this path).

One pallas_call runs, for a block of samples, entirely in VMEM:

  one-hot MXU slot-grid gather -> trilerp (+ its 3 spatial tangents)
  -> NeRF frequency encoding (+ Jacobian) -> dense chain -> one
  reverse-mode adjoint sweep -> d sdf / d x.

vs the two-kernel composition (ops/pallas/slot_grid.py lookup feeding
ops/pallas/fused_mlp.py::fused_chain_adjoint) this removes the HBM
round-trip of enc [N, K*F] + tenc [N, 3*K*F] + the XLA-side concat /
tangent-contraction glue between them, and the backward fuses the chain's
reverse-over-reverse with the slot scatter in one pass over the residuals.

Differentiation contract (mirrors slot_grid.py): the op is linear in
(table, w, dw) and nonlinear only through the chain; the custom VJP
hand-computes (d_table, d_w, d_dw, d_positions, d_weights, d_biases), and
the trilerp weights w(x), dw(x) remain plain XLA functions of x outside,
so position gradients — including the second-order terms the grad-of-grad
training objective needs — compose with XLA autodiff.

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
    _pad_weight,
    _rup,
)
from multimodalstudio_tpu.ops.pallas.slot_grid import (
    FEAT,
    NSLOT,
    SlotGridSpec,
    _dot_hl,
    _dotg_hl,
    _expand_matrix,
    _hi_lo,
    _sum_matrices,
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


def _gather_onehot(idx, lv, tblh_ref, tbll_ref, b):
    """One-hot MXU gather: comp [B, K*128] f32."""
    iotas = {
        rl: jax.lax.broadcasted_iota(jnp.int32, (b, rl), 1)
        for rl in {rl for _, rl in lv}
    }
    cols = []
    for l, (off, rl) in enumerate(lv):
        rel = idx[:, l : l + 1] - off
        oh = (iotas[rl] == rel).astype(jnp.bfloat16)
        th = tblh_ref[pl.ds(off, rl), :]
        tl = tbll_ref[pl.ds(off, rl), :]
        cols.append(
            jnp.dot(oh, th, preferred_element_type=jnp.float32)
            + jnp.dot(oh, tl, preferred_element_type=jnp.float32)
        )
    return jnp.concatenate(cols, axis=-1)


def _scatter_onehot(idx, lv, dtbl_ref, d_comp, b, first):
    """MXU scatter-add of d_comp [B, K*128] into dtbl_ref [R, 128]."""

    @pl.when(first)
    def _():
        dtbl_ref[:] = jnp.zeros_like(dtbl_ref)

    dn0 = (((0,), (0,)), ((), ()))
    iotas = {
        rl: jax.lax.broadcasted_iota(jnp.int32, (b, rl), 1)
        for rl in {rl for _, rl in lv}
    }
    for l, (off, rl) in enumerate(lv):
        rel = idx[:, l : l + 1] - off
        oh = (iotas[rl] == rel).astype(jnp.bfloat16)
        uh, ul = _hi_lo(d_comp[:, l * LANE : (l + 1) * LANE])
        d = jax.lax.dot_general(
            oh, uh, dimension_numbers=dn0, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            oh, ul, dimension_numbers=dn0, preferred_element_type=jnp.float32
        )
        dtbl_ref[pl.ds(off, rl), :] = dtbl_ref[pl.ds(off, rl), :] + d


def _fused_fwd_kernel(spec: SlotChainSpec, *refs):
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    kf = K * FEAT
    pw = spec.pe_width
    f, _, _ = _act_triple(inner)

    p = 0
    pos_ref = refs[p]; p += 1
    idx_ref = refs[p]; p += 1
    w_ref = refs[p]; p += 1
    dw_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1  # coarse-to-fine mask [1, K*F]
    tblh_ref = refs[p]; p += 1
    tbll_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; bs = refs[p + L : p + 2 * L]; p += 2 * L
    sg_ref = refs[p]; p += 1
    geo_ref = refs[p]; p += 1
    comp_ref = refs[p]

    b = pos_ref.shape[0]
    wc = K * NSLOT

    # grid: gather + trilerp
    comp_ref[:] = _gather_onehot(idx_ref[:], spec.lv, tblh_ref, tbll_ref, b)
    comp = comp_ref[:]
    s_mat = s_ref[:]
    p_mat = p_ref[:]
    m = m_ref[:]
    wexp = _dot_hl(w_ref[:], p_mat)
    encg = _dot_hl(comp * wexp, s_mat) * m  # [B, K*F]

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

    adj = _adj_sweep(inner, wl, zs, b)  # [B, P0] f32

    # d sdf / d x: PE part through the encoding Jacobian, grid part through
    # the trilerp tangents: grad_k = <adj_g, tenc_k> computed lane-wise as
    # sum(comp * dwexp_k * (adj_g @ S^T)) — tenc itself never materializes
    grad3 = _enc_jt(spec.encspec, sin_p, cos_p, adj[:, :pw])[:, :3]
    adjg = adj[:, pw : pw + kf] * m  # fold the c2f mask into the adjoint
    dn_t = (((1,), (1,)), ((), ()))
    adjS = _dotg_hl(adjg, s_mat, dn_t)  # [B, K*128]
    gcols = []
    for k in range(3):
        dwexp_k = _dot_hl(dw_ref[:, pl.ds(k * wc, wc)], p_mat)
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
    """Backward of (sdf, geo, grad3) wrt (pos, table, w, dw, W_l, b_l).

    Reverse-over-reverse for the chain (fused_mlp._bwd_adj_kernel math)
    with the grid coupled in three places: the adjoint cotangent ga picks
    up the grid tangents (ga_g = sum_k g3_k * tenc_k), the grad3 output's
    direct dependence on (comp, dw) adds gck = (g3_k*adj_g) @ S^T terms,
    and the chain-input cotangent's grid slice drives the slot backward
    (d_comp -> one-hot scatter, d_w, d_dw)."""
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    kf = K * FEAT
    pw = spec.pe_width
    P0 = inner.in_dims[0]
    DL = inner.out_dims[-1]
    c = inner.tangent_out_channel
    f, df, ddf = _act_triple(inner)
    first = pl.program_id(0) == 0

    p = 0
    pos_ref = refs[p]; p += 1
    idx_ref = refs[p]; p += 1
    w_ref = refs[p]; p += 1
    dw_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1
    comp_ref = refs[p]; p += 1
    gsg_ref = refs[p]; p += 1
    ggeo_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    s2_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; bs = refs[p + L : p + 2 * L]; p += 2 * L
    gx_ref = refs[p]; p += 1
    dw_out = refs[p]; p += 1
    ddw_out = refs[p]; p += 1
    dtbl_ref = refs[p]; p += 1
    gw_refs = refs[p : p + L]; gb_refs = refs[p + L : p + 2 * L]; p += 2 * L
    z_scr = refs[p]; p += 1
    s_scr = refs[p]; p += 1
    e_scr = refs[p]

    b = pos_ref.shape[0]
    wc = K * NSLOT
    comp = comp_ref[:]
    s_mat = s_ref[:]
    s2 = s2_ref[:]
    p_mat = p_ref[:]
    m = m_ref[:]
    dn_t = (((1,), (1,)), ((), ()))

    # ---- rebuild x0 (grid features from the comp residual) + primal chain
    wexp = _dot_hl(w_ref[:], p_mat)
    encg = _dot_hl(comp * wexp, s_mat) * m
    h0pe, t0pe, sin_p, cos_p = _enc_fwd(spec.encspec, pos_ref[:])
    pad = P0 - pw - kf
    x0 = jnp.concatenate(
        [h0pe, encg.astype(jnp.bfloat16)]
        + ([jnp.zeros((b, pad), jnp.bfloat16)] if pad else []),
        axis=-1,
    )
    wl = [ws[l][:] for l in range(L)]
    h = x0
    for l in range(L - 1):
        if l in inner.skip:
            h = (jnp.concatenate([h, x0], axis=-1) / np.sqrt(2.0)).astype(jnp.bfloat16)
        z = jnp.dot(h, wl[l], preferred_element_type=jnp.float32) + bs[l][:]
        z_scr[l] = z.astype(jnp.bfloat16)
        h = f(z).astype(jnp.bfloat16)
    adj = _adj_sweep(inner, wl, z_scr, b, s_store=s_scr)
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

    # ---- ga (cotangent on adj) + the grad3 output's direct grid terms
    ga_pe = sum(g3[:, k : k + 1] * t0pe[k].astype(jnp.float32) for k in range(3))
    ga_g = jnp.zeros((b, kf), jnp.float32)
    d_comp = jnp.zeros((b, K * LANE), jnp.float32)
    ddw_cols = []
    for k in range(3):
        dwexp_k = _dot_hl(dw_ref[:, pl.ds(k * wc, wc)], p_mat)
        tenc_k = _dot_hl(comp * dwexp_k, s_mat) * m
        ga_g = ga_g + g3[:, k : k + 1] * tenc_k
        # d/d(comp o dwexp_k) of <g3_k * adj_g, tenc_k>
        gck = _dotg_hl(g3[:, k : k + 1] * adjg, s_mat, dn_t)  # [B, K*128]
        d_comp = d_comp + gck * dwexp_k
        ddw_cols.append(_dot_hl(comp * gck, s2))  # [B, K*8]
    ga = jnp.concatenate(
        [ga_pe, ga_g] + ([jnp.zeros((b, pad), jnp.float32)] if pad else []), axis=-1
    )

    # ---- ga-forward chain: adjoint-path weight grads + act'' injections
    q = ga
    for l in range(L):
        qin = (
            (jnp.concatenate([q, ga], axis=-1) / np.sqrt(2.0))
            if l in inner.skip
            else q
        )
        if l == L - 1:
            colv = jax.lax.broadcasted_iota(jnp.int32, (b, DL), 1)
            v_l = (colv == c).astype(jnp.float32)
        else:
            v_l = s_scr[l].astype(jnp.float32) * df(z_scr[l])
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
                e_scr[l] = (mq * s_scr[l].astype(jnp.float32) * ddf(z_scr[l])).astype(
                    jnp.bfloat16
                )
            q = mq * df(z_scr[l])

    def layer_input(l):
        hin = x0 if l == 0 else f(z_scr[l - 1].astype(jnp.float32)).astype(jnp.bfloat16)
        if l in inner.skip:
            hin = (jnp.concatenate([hin, x0], axis=-1) / np.sqrt(2.0)).astype(
                jnp.bfloat16
            )
        return hin

    # ---- standard reverse sweep with the e_l injections
    gx0 = jnp.zeros((b, P0), jnp.float32)
    gh = gy
    for l in reversed(range(L)):
        if l == L - 1:
            gz = gh
        else:
            gz = gh * df(z_scr[l])
            if ddf is not None:
                gz = gz + e_scr[l].astype(jnp.float32)
        gzb = gz.astype(jnp.bfloat16)
        gw = jax.lax.dot_general(
            layer_input(l), gzb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gb = jnp.sum(gz, axis=0, keepdims=True)
        gw_ref, gb_ref = gw_refs[l], gb_refs[l]
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
    ghin = gh + gx0  # [B, P0] cotangent on x0

    # ---- grid slice of the input cotangent -> slot backward
    g_enc = ghin[:, pw : pw + kf] * m
    gt0 = _dotg_hl(g_enc, s_mat, dn_t)  # [B, K*128]
    d_comp = d_comp + gt0 * wexp
    dw_out[:] = _dot_hl(comp * gt0, s2)
    ddw_out[:] = jnp.concatenate(ddw_cols, axis=-1)
    _scatter_onehot(idx_ref[:], spec.lv, dtbl_ref, d_comp, b, first)

    # ---- position cotangent: PE Jacobian transpose + the encoding-Hessian
    # term of the grad3 output (g3_k * <adj_pe, enc''_k>)
    gx = _enc_jt(spec.encspec, sin_p, cos_p, ghin[:, :pw])
    F, _, _ = spec.encspec.enc
    svec, masks = _enc_consts(spec.encspec)
    s1c, s2c = 3, 3 + 3 * F
    d2sin = -sin_p * svec * svec
    d2cos = -cos_p * svec * svec
    a_s = adj[:, s1c:s2c]
    a_c = adj[:, s2c : s2c + 3 * F]
    sec = jnp.concatenate(
        [
            g3[:, k : k + 1]
            * jnp.sum((a_s * d2sin + a_c * d2cos) * masks[k], axis=-1, keepdims=True)
            for k in range(3)
        ]
        + [jnp.zeros((b, LANE - 3), jnp.float32)],
        axis=-1,
    )
    gx_ref[:] = gx + sec


# ------------------------------------------------------------- pallas glue

@functools.lru_cache(maxsize=None)
def _build_fused(spec: SlotChainSpec, n_total: int, interpret: bool):
    inner = spec.inner
    L, B = inner.n_layers, inner.block
    assert n_total % B == 0
    grid = (n_total // B,)
    K = spec.levels
    kf = K * FEAT
    wc = K * NSLOT
    G = inner.geo_width

    def blk(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM)

    pos_spec = blk((B, LANE))
    idx_spec = blk((B, K))
    w_spec = blk((B, wc))
    dw_spec = blk((B, 3 * wc))
    m_spec = _const_spec((1, kf))
    tbl_spec = _const_spec((spec.rows, LANE))
    s_spec = _const_spec((K * LANE, kf))
    s2_spec = _const_spec((K * LANE, wc))
    p_spec = _const_spec((wc, K * LANE))
    w_specs = [_const_spec((din, dout)) for din, dout in zip(inner.in_dims, inner.out_dims)]
    b_specs = [_const_spec((1, dout)) for dout in inner.out_dims]
    sg_spec = blk((B, LANE))
    geo_spec = blk((B, G))
    comp_spec = blk((B, K * LANE))

    fwd_call = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, spec),
        grid=grid,
        in_specs=[pos_spec, idx_spec, w_spec, dw_spec, m_spec, tbl_spec, tbl_spec,
                  s_spec, p_spec] + w_specs + b_specs,
        out_specs=[sg_spec, geo_spec, comp_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_total, G), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_total, K * LANE), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]
    scratch = [
        pltpu.VMEM((max(L - 1, 1), B, H), jnp.bfloat16),
        pltpu.VMEM((max(L - 1, 1), B, H), jnp.bfloat16),
        pltpu.VMEM((max(L - 1, 1), B, H), jnp.bfloat16),
    ]
    bwd_call = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, spec),
        grid=grid,
        in_specs=[pos_spec, idx_spec, w_spec, dw_spec, m_spec, comp_spec,
                  sg_spec, geo_spec, s_spec, s2_spec, p_spec] + w_specs + b_specs,
        out_specs=[
            blk((B, LANE)),  # gx
            blk((B, wc)),  # d_w
            blk((B, 3 * wc)),  # d_dw
            tbl_spec,  # d_table (accumulates over the grid)
        ]
        + [_const_spec((din, dout)) for din, dout in zip(inner.in_dims, inner.out_dims)]
        + [_const_spec((1, dout)) for dout in inner.out_dims],
        out_shape=[
            jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_total, wc), jnp.float32),
            jax.ShapeDtypeStruct((n_total, 3 * wc), jnp.float32),
            jax.ShapeDtypeStruct((spec.rows, LANE), jnp.float32),
        ]
        + [
            jax.ShapeDtypeStruct((din, dout), jnp.float32)
            for din, dout in zip(inner.in_dims, inner.out_dims)
        ]
        + [jax.ShapeDtypeStruct((1, dout), jnp.float32) for dout in inner.out_dims],
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    s1m, s2m = (x.astype(jnp.bfloat16) for x in _sum_matrices(K))
    pm = _expand_matrix(K).astype(jnp.bfloat16)

    @jax.custom_vjp
    def op(pos, idx, w, dw, mask, table, wps, bps):
        hi = table.astype(jnp.bfloat16)
        lo = (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            sg, geo, _ = fwd_call(
                pos, idx, w, dw, mask, hi, lo, jnp.asarray(s1m), jnp.asarray(pm),
                *wbs, *bps,
            )
        return sg, geo

    def op_fwd(pos, idx, w, dw, mask, table, wps, bps):
        hi = table.astype(jnp.bfloat16)
        lo = (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            sg, geo, comp = fwd_call(
                pos, idx, w, dw, mask, hi, lo, jnp.asarray(s1m), jnp.asarray(pm),
                *wbs, *bps,
            )
        return (sg, geo), (pos, idx, w, dw, mask, comp, wps, bps)

    def op_bwd(res, g):
        pos, idx, w, dw, mask, comp, wps, bps = res
        gsg, ggeo = g
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            outs = bwd_call(
                pos, idx, w, dw, mask, comp,
                gsg.astype(jnp.float32), ggeo.astype(jnp.bfloat16),
                jnp.asarray(s1m), jnp.asarray(s2m), jnp.asarray(pm),
                *wbs, *bps,
            )
        L = inner.n_layers
        gx, d_w, d_dw, d_tbl = outs[0], outs[1], outs[2], outs[3]
        gws = tuple(outs[4 : 4 + L])
        gbs = tuple(outs[4 + L : 4 + 2 * L])
        d_idx = np.zeros(idx.shape, jax.dtypes.float0)
        # the coarse-to-fine mask is a schedule, never a trainable — its
        # (nonzero) cotangent is deliberately dropped
        d_mask = jnp.zeros((1, kf), jnp.float32)
        return gx, d_idx, d_w, d_dw, d_mask, d_tbl, gws, gbs

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_slot_sdf_chain(
    positions: jnp.ndarray,
    grid_coords: jnp.ndarray,
    table: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    gspec: SlotGridSpec,
    *,
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    skip: Tuple[int, ...] = (),
    activation: str = "SoftplusQuad",
    beta: float = 100.0,
    level_mask: Optional[jnp.ndarray] = None,
    coord_scale: float = 1.0,
    block: int = 0,
    interpret: Optional[bool] = None,
):
    """Fused slot-grid + NeRF-encoding + chain + adjoint SDF evaluation.

    positions [N, 3]: raw field coordinates (PE operates on these).
    grid_coords [N, 3] in [0, 1]: table coordinates (e.g. (x+r)/2r).
    coord_scale: d grid_coords / d positions (1/(2r)) — folds the rescale
    chain rule into the spatial tangents.
    level_mask: optional [K*F] multiplier (coarse-to-fine), traced.
    Returns (sdf [N], geo [N, D_out-1] bf16, grad [N, 3] f32).
    """
    from multimodalstudio_tpu.ops.pallas.slot_grid import slot_geometry

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not block:
        block = DEFAULT_BLOCK
    n = positions.shape[0]
    K = gspec.num_levels
    kf = K * FEAT
    pw = 3 + 6 * num_frequencies
    d_in = pw + kf
    d_out = weights[-1].shape[1]
    in_dims, out_dims, p0, hidden = _chain_geometry(d_in, weights, skip)

    idx, w, dw = slot_geometry(grid_coords, gspec)
    dw = dw * coord_scale

    n_pad = _rup(n, block)
    padn = n_pad - n
    posp = (
        jnp.zeros((n_pad, LANE), jnp.float32)
        .at[:n, :3]
        .set(positions.astype(jnp.float32))
    )
    if padn:
        idx = jnp.pad(idx, ((0, padn), (0, 0)))
        w = jnp.pad(w, ((0, padn), (0, 0)))
        dw = jnp.pad(dw, ((0, padn), (0, 0)))
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
    sg, geo = op(posp, idx, w, dw, mask, table, wps, bps)
    return sg[:n, 0], geo[:n, : d_out - 1], sg[:n, 1:4]


# --------------------------------------------------- value-only fused kernel
#
# Sampler SDF queries (stop-grad) and curvature hessian taps need only the
# sdf VALUE — no spatial gradient, no geo feature. Routing them through the
# two-kernel composition (slot_grid_lookup -> XLA trilerp glue -> chain)
# cost ~115 ms of the 331 ms grid step at 2048x5 rays (r3 trace
# prof_grid_raw_tpu_2048_512: 40 ms lookup fwd + 27 ms lookup bwd + ~50 ms
# XLA mul/reduce_sum/concat glue). This op runs gather -> trilerp -> NeRF
# encoding -> chain -> sdf in ONE kernel; its backward is one standard
# reverse sweep (first-order only — the curvature loss consumes plain sdf
# values) plus the slot scatter. Mirrors tcnn's NetworkWithInputEncoding
# value path (reference src/field_components/mlp.py:246-293).


def _value_fwd_kernel(spec: SlotChainSpec, *refs):
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    kf = K * FEAT
    pw = spec.pe_width
    f, _, _ = _act_triple(inner)

    p = 0
    pos_ref = refs[p]; p += 1
    idx_ref = refs[p]; p += 1
    w_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1
    tblh_ref = refs[p]; p += 1
    tbll_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; bs = refs[p + L : p + 2 * L]; p += 2 * L
    sdf_ref = refs[p]; p += 1
    comp_ref = refs[p]

    b = pos_ref.shape[0]
    comp_ref[:] = _gather_onehot(idx_ref[:], spec.lv, tblh_ref, tbll_ref, b)
    comp = comp_ref[:]
    wexp = _dot_hl(w_ref[:], p_ref[:])
    encg = _dot_hl(comp * wexp, s_ref[:]) * m_ref[:]

    h0pe, _, _, _ = _enc_fwd(spec.encspec, pos_ref[:], want_t0=False)
    pad = inner.in_dims[0] - pw - kf
    x0 = jnp.concatenate(
        [h0pe, encg.astype(jnp.bfloat16)]
        + ([jnp.zeros((b, pad), jnp.bfloat16)] if pad else []),
        axis=-1,
    )
    h = x0
    for l in range(L):
        if l in inner.skip:
            h = (jnp.concatenate([h, x0], axis=-1) / np.sqrt(2.0)).astype(jnp.bfloat16)
        z = jnp.dot(h, ws[l][:], preferred_element_type=jnp.float32) + bs[l][:]
        h = f(z).astype(jnp.bfloat16) if l < L - 1 else z
    sdf_ref[:] = jnp.concatenate(
        [h[:, :1], jnp.zeros((b, LANE - 1), jnp.float32)], axis=-1
    )


def _value_bwd_kernel(spec: SlotChainSpec, *refs):
    """First-order backward of sdf wrt (pos, table, w, W_l, b_l)."""
    inner = spec.inner
    L = inner.n_layers
    K = spec.levels
    kf = K * FEAT
    pw = spec.pe_width
    P0 = inner.in_dims[0]
    DL = inner.out_dims[-1]
    f, df, _ = _act_triple(inner)
    first = pl.program_id(0) == 0

    p = 0
    pos_ref = refs[p]; p += 1
    idx_ref = refs[p]; p += 1
    w_ref = refs[p]; p += 1
    m_ref = refs[p]; p += 1
    comp_ref = refs[p]; p += 1
    gs_ref = refs[p]; p += 1
    s_ref = refs[p]; p += 1
    s2_ref = refs[p]; p += 1
    p_ref = refs[p]; p += 1
    ws = refs[p : p + L]; bs = refs[p + L : p + 2 * L]; p += 2 * L
    gx_ref = refs[p]; p += 1
    dw_out = refs[p]; p += 1
    dtbl_ref = refs[p]; p += 1
    gw_refs = refs[p : p + L]; gb_refs = refs[p + L : p + 2 * L]; p += 2 * L
    z_scr = refs[p]

    b = pos_ref.shape[0]
    comp = comp_ref[:]
    s_mat = s_ref[:]
    p_mat = p_ref[:]
    m = m_ref[:]
    dn_t = (((1,), (1,)), ((), ()))

    # rebuild x0 + primal chain (z residuals in scratch)
    wexp = _dot_hl(w_ref[:], p_mat)
    encg = _dot_hl(comp * wexp, s_mat) * m
    h0pe, _, sin_p, cos_p = _enc_fwd(spec.encspec, pos_ref[:], want_t0=False)
    pad = P0 - pw - kf
    x0 = jnp.concatenate(
        [h0pe, encg.astype(jnp.bfloat16)]
        + ([jnp.zeros((b, pad), jnp.bfloat16)] if pad else []),
        axis=-1,
    )
    wl = [ws[l][:] for l in range(L)]
    h = x0
    for l in range(L - 1):
        if l in inner.skip:
            h = (jnp.concatenate([h, x0], axis=-1) / np.sqrt(2.0)).astype(jnp.bfloat16)
        z = jnp.dot(h, wl[l], preferred_element_type=jnp.float32) + bs[l][:]
        z_scr[l] = z.astype(jnp.bfloat16)
        h = f(z).astype(jnp.bfloat16)

    gsdf = gs_ref[:]  # [B, LANE] f32, col 0 = d loss / d sdf
    gy = jnp.concatenate([gsdf[:, :1], jnp.zeros((b, DL - 1), jnp.float32)], axis=-1)

    def layer_input(l):
        hin = x0 if l == 0 else f(z_scr[l - 1].astype(jnp.float32)).astype(jnp.bfloat16)
        if l in inner.skip:
            hin = (jnp.concatenate([hin, x0], axis=-1) / np.sqrt(2.0)).astype(
                jnp.bfloat16
            )
        return hin

    gx0 = jnp.zeros((b, P0), jnp.float32)
    gh = gy
    for l in reversed(range(L)):
        gz = gh if l == L - 1 else gh * df(z_scr[l])
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
    gt0 = _dotg_hl(g_enc, s_mat, dn_t)  # [B, K*128]
    d_comp = gt0 * wexp
    dw_out[:] = _dot_hl(comp * gt0, s2_ref[:])
    _scatter_onehot(idx_ref[:], spec.lv, dtbl_ref, d_comp, b, first)
    gx_ref[:] = _enc_jt(spec.encspec, sin_p, cos_p, ghin[:, :pw])


@functools.lru_cache(maxsize=None)
def _build_value(spec: SlotChainSpec, n_total: int, interpret: bool):
    inner = spec.inner
    L, B = inner.n_layers, inner.block
    assert n_total % B == 0
    grid = (n_total // B,)
    K = spec.levels
    kf = K * FEAT
    wc = K * NSLOT

    def blk(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM)

    pos_spec = blk((B, LANE))
    idx_spec = blk((B, K))
    w_spec = blk((B, wc))
    m_spec = _const_spec((1, kf))
    tbl_spec = _const_spec((spec.rows, LANE))
    s_spec = _const_spec((K * LANE, kf))
    s2_spec = _const_spec((K * LANE, wc))
    p_spec = _const_spec((wc, K * LANE))
    w_specs = [_const_spec((din, dout)) for din, dout in zip(inner.in_dims, inner.out_dims)]
    b_specs = [_const_spec((1, dout)) for dout in inner.out_dims]
    sdf_spec = blk((B, LANE))
    comp_spec = blk((B, K * LANE))

    fwd_call = pl.pallas_call(
        functools.partial(_value_fwd_kernel, spec),
        grid=grid,
        in_specs=[pos_spec, idx_spec, w_spec, m_spec, tbl_spec, tbl_spec,
                  s_spec, p_spec] + w_specs + b_specs,
        out_specs=[sdf_spec, comp_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_total, K * LANE), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    H = inner.out_dims[0] if L > 1 else inner.out_dims[-1]
    bwd_call = pl.pallas_call(
        functools.partial(_value_bwd_kernel, spec),
        grid=grid,
        in_specs=[pos_spec, idx_spec, w_spec, m_spec, comp_spec, sdf_spec,
                  s_spec, s2_spec, p_spec] + w_specs + b_specs,
        out_specs=[
            blk((B, LANE)),  # gx
            blk((B, wc)),  # d_w
            tbl_spec,  # d_table (accumulates over the grid)
        ]
        + [_const_spec((din, dout)) for din, dout in zip(inner.in_dims, inner.out_dims)]
        + [_const_spec((1, dout)) for dout in inner.out_dims],
        out_shape=[
            jax.ShapeDtypeStruct((n_total, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_total, wc), jnp.float32),
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

    s1m, s2m = (x.astype(jnp.bfloat16) for x in _sum_matrices(K))
    pm = _expand_matrix(K).astype(jnp.bfloat16)

    @jax.custom_vjp
    def op(pos, idx, w, mask, table, wps, bps):
        hi = table.astype(jnp.bfloat16)
        lo = (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            sdf, _ = fwd_call(
                pos, idx, w, mask, hi, lo, jnp.asarray(s1m), jnp.asarray(pm),
                *wbs, *bps,
            )
        return sdf

    def op_fwd(pos, idx, w, mask, table, wps, bps):
        hi = table.astype(jnp.bfloat16)
        lo = (table - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            sdf, comp = fwd_call(
                pos, idx, w, mask, hi, lo, jnp.asarray(s1m), jnp.asarray(pm),
                *wbs, *bps,
            )
        return sdf, (pos, idx, w, mask, comp, wps, bps)

    def op_bwd(res, gsdf):
        pos, idx, w, mask, comp, wps, bps = res
        wbs = [x.astype(jnp.bfloat16) for x in wps]
        with jax.default_matmul_precision("bfloat16"):
            outs = bwd_call(
                pos, idx, w, mask, comp, gsdf.astype(jnp.float32),
                jnp.asarray(s1m), jnp.asarray(s2m), jnp.asarray(pm),
                *wbs, *bps,
            )
        L = inner.n_layers
        gx, d_w, d_tbl = outs[0], outs[1], outs[2]
        gws = tuple(outs[3 : 3 + L])
        gbs = tuple(outs[3 + L : 3 + 2 * L])
        d_idx = np.zeros(idx.shape, jax.dtypes.float0)
        d_mask = jnp.zeros((1, spec.levels * FEAT), jnp.float32)
        return gx, d_idx, d_w, d_mask, d_tbl, gws, gbs

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_slot_sdf_value(
    positions: jnp.ndarray,
    grid_coords: jnp.ndarray,
    table: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    gspec: SlotGridSpec,
    *,
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    skip: Tuple[int, ...] = (),
    activation: str = "SoftplusQuad",
    beta: float = 100.0,
    level_mask: Optional[jnp.ndarray] = None,
    num_levels: Optional[int] = None,
    block: int = 0,
    interpret: Optional[bool] = None,
):
    """Fused slot-grid + NeRF-encoding + chain SDF **value** evaluation.

    Like fused_slot_sdf_chain but emits only sdf [N] f32: no spatial
    tangents, no adjoint sweep, no geo output — the sampler/curvature-tap
    workload. num_levels statically truncates the gather to the first k
    levels (sampler coarse queries); truncated feature columns enter the
    chain as zeros, matching slot_grid_lookup's padding. level_mask is the
    traced coarse-to-fine mask over the ACTIVE k*F feature columns.
    First-order gradients only (positions/table/w/weights/biases) — the
    hessian-of-sdf path must use fused_slot_sdf_chain.
    """
    from multimodalstudio_tpu.ops.pallas.slot_grid import slot_geometry

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not block:
        block = DEFAULT_BLOCK
    n = positions.shape[0]
    K = (
        gspec.num_levels
        if num_levels is None
        else min(int(num_levels), gspec.num_levels)
    )
    kf = K * FEAT
    pw = 3 + 6 * num_frequencies
    d_in = pw + gspec.num_levels * FEAT  # full MLP input width (all levels)
    in_dims, out_dims, p0, hidden = _chain_geometry(d_in, weights, skip)

    idx, w, _dw_unused = slot_geometry(grid_coords, gspec, K)  # dw is DCE'd

    n_pad = _rup(n, block)
    padn = n_pad - n
    posp = (
        jnp.zeros((n_pad, LANE), jnp.float32)
        .at[:n, :3]
        .set(positions.astype(jnp.float32))
    )
    if padn:
        idx = jnp.pad(idx, ((0, padn), (0, 0)))
        w = jnp.pad(w, ((0, padn), (0, 0)))
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
    sdf = op(posp, idx, w, mask, table, wps, bps)
    return sdf[:n, 0]
