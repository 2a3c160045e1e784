"""Fully-fused dense-chain (MLP) Pallas TPU kernels.

The TPU answer to tiny-cuda-nn's FullyFusedMLP (reference
src/field_components/mlp.py:223-293). XLA fuses elementwise ops *into*
matmuls but materializes every layer's activations in HBM between layers —
and under forward-mode SDF gradients every tangent tensor too: one
[163840, 3, 256] bf16 tangent activation is ~250 MB, and the profiled
train step runs at ~680 GB/s HBM-bound with the MXU ~6% busy. These
kernels run the whole layer chain for a block of samples out of VMEM, so
inter-layer activations (and tangents) never touch HBM: per block the
kernel reads the input once and writes the output once.

Primitives (each a custom_vjp whose forward AND backward are Pallas):

  fused_chain(x, weights, biases, ...)                 -> y
  fused_chain(x, weights, biases, tangents=tx, ...)    -> (y, ty)

The K-tangent variant propagates forward-mode directional derivatives
through the chain alongside the primal (t_l = (t_{l-1} @ W_l) * act'(z_l))
— replacing `jax.jacfwd` over the field for NeuS SDF spatial gradients
(models/model.py::sdf_gradients). Its hand-derived backward transposes the
linearized tangent chain, including the second-order act''(z) term that
grad-of-jacfwd requires.

Compute layout: matmul inputs bf16, MXU accumulation f32, inter-layer
activations stored bf16 (the validated `mlp_raw_tpu` recipe); weight/bias
gradients accumulate in f32 VMEM across the sample grid. Hidden layers all
share one width; one optional concat-skip re-feeds the (padded) network
input scaled by 1/sqrt(2), matching fields/mlp.py::MLP semantics
(reference mlp.py:115-171).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_SKIP_SCALE = 1.0 / np.sqrt(2.0)
# samples per kernel grid step. r2 (tangent-chain backward): 384 best, 512
# OOM'd scoped VMEM. r3: the adjoint-mode backward's smaller residual set
# fits 512, and 512 measures best for BOTH flagships (r3logs/bench_*:
# mlp 72.4K -> 74.1K rays/s, slot-grid 57.2K -> 60.6K at slot block 512;
# 768 regresses to 56.9K). Sweepable via MMS_FUSED_BLOCK / MMS_SLOT_BLOCK.
DEFAULT_BLOCK = int(os.environ.get("MMS_FUSED_BLOCK", "512"))

# Mosaic's default scoped-VMEM limit is 16 MB — far below v5e's 128 MB
# physical VMEM. The fused backwards' live temporaries legitimately need
# more (24.4 MB at block 384 with the slot grid coupled in), so every
# fused call raises the cap; actual usage stays well under the chip.
VMEM_LIMIT_BYTES = int(os.environ.get("MMS_VMEM_LIMIT", str(96 * 1024 * 1024)))


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def _rup(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ChainSpec:
    """Static (padded) geometry of one fused chain."""

    in_dims: Tuple[int, ...]  # padded input width per layer
    out_dims: Tuple[int, ...]  # padded output width per layer
    skip: Tuple[int, ...]  # layers whose input is concat(h, x0)/sqrt(2)
    activation: str  # hidden activation: 'ReLU' | 'SoftplusQuad' | 'None'
    beta: float
    n_tangents: int  # 0 (plain chain) or K forward tangents
    block: int  # samples per grid step
    # When set, the JVP variant emits only output-channel `c`'s tangents,
    # as a lane-aligned [N, LANE] f32 buffer (cols 0..K-1 = dy_c/dt_k) —
    # a full [K, N, D_out] ty in HBM invites pathological K-minor layouts
    # (observed: 42.7x pad expansion = 15 GB on the train step).
    tangent_out_channel: Optional[int] = None
    # NeRF frequency encoding fused in-kernel: (F, min_exp, max_exp) with
    # include_input=True over 3-D positions. The kernel input becomes raw
    # positions [N, LANE] f32; enc, its Jacobian (the 3 basis tangents) and
    # the Hessian diagonal (enc'' = -s^2 enc, needed by the backward) are
    # computed in VMEM — no [3, N, P0] tangent tensors in HBM at all.
    enc: Optional[Tuple[int, float, float]] = None
    # SDF output split: emit (sdf+grad [N, LANE] f32: col 0 = y[:, 0],
    # cols 1..K = d y[:,0]/dx, and geo [N, rup(D_out-1)] bf16) instead of
    # one padded [N, DL] y — downstream consumers read y[:, 0] and
    # y[:, 1:] separately, and slicing a fat padded tensor was measured to
    # cost ~26 ms/step in re-read cotangent fusions.
    sdf_split: bool = False
    geo_width: int = 0  # padded geo-feature width for sdf_split mode
    # Reverse-mode spatial gradient: compute d y[:, tangent_out_channel]/dx
    # with ONE in-kernel adjoint sweep instead of K=3 forward tangent
    # chains — the sdf output is scalar, so reverse mode costs ~1 extra
    # chain (2 matmuls/layer fwd vs 4; 6 vs ~14 in the outer backward).
    # The outer backward is hand-derived reverse-over-reverse: the
    # adjoint-path weight gradient is qin_l^T v_l from a ga-forward chain
    # m_l, plus a ddf injection e_l = m_l * s_{l+1} * act''(z_l) folded
    # into the standard cotangent sweep. Answers tcnn's fused backward
    # (reference src/field_components/mlp.py:223-244) one better.
    adjoint: bool = False

    @property
    def n_layers(self) -> int:
        return len(self.out_dims)


def _f32(fn):
    # Mosaic (v5e) rejects vector comparisons on packed bf16 — every
    # activation/derivative upcasts to f32 at entry so bf16-stored
    # pre-activations are safe at all call sites.
    return lambda z: fn(z.astype(jnp.float32))


def _act_triple(spec: ChainSpec):
    """(act, act', act'') for the hidden activation. act'' is None when 0."""
    if spec.activation == "None":
        return (lambda z: z.astype(jnp.float32)), _f32(jnp.ones_like), None
    if spec.activation == "ReLU":
        return (
            _f32(lambda z: jnp.maximum(z, 0.0)),
            _f32(lambda z: (z > 0).astype(z.dtype)),
            None,
        )
    if spec.activation == "SoftplusQuad":
        # C^1 piecewise-quadratic softplus(beta z)/beta stand-in; matches
        # fields/mlp.py::make_activation('SoftplusQuad').
        a = 2.0 / spec.beta

        def f(z):
            return jnp.where(jnp.abs(z) < a, (z + a) * (z + a) * (0.25 / a), jnp.maximum(z, 0.0))

        def df(z):
            return jnp.where(jnp.abs(z) < a, (z + a) * (0.5 / a), (z > 0).astype(z.dtype))

        def ddf(z):
            return jnp.where(jnp.abs(z) < a, jnp.full_like(z, 0.5 / a), jnp.zeros_like(z))

        return _f32(f), _f32(df), _f32(ddf)
    raise ValueError(f"unsupported fused activation {spec.activation}")


def _tdot(t, w):
    """[K, B, Din] @ [Din, D] -> [K, B, D] f32 via one row-collapsed MXU dot."""
    k, b, din = t.shape
    out = jax.lax.dot_general(
        t.reshape(k * b, din), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return out.reshape(k, b, w.shape[1])


# ------------------------------------------------- in-kernel NeRF encoding

def _enc_consts(spec: ChainSpec):
    """(freq row [1, 3F], coord masks 3x[1, 3F]) built in-kernel from iota
    (Pallas kernels may not capture array constants).

    Column order matches ops/encodings.py::nerf_encoding for D=3 with
    include_input: [x(3), sin(scaled)(3F, d-major), sin(scaled+pi/2)(3F)].
    """
    F, mn, mx = spec.enc
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * F), 1)
    fidx = (col % F).astype(jnp.float32)
    coord = col // F
    step = 0.0 if F == 1 else (mx - mn) / (F - 1)
    svec = jnp.exp2(mn + fidx * step)  # [1, 3F] frequency scale per column
    masks = [(coord == k).astype(jnp.float32) for k in range(3)]
    return svec, masks


def _enc_fwd(spec: ChainSpec, pos, want_t0: bool = True):
    """pos [B, LANE] f32 (cols 0..2 used) -> (h0 bf16 [B, P0],
    t0 bf16 [3, B, P0] (None unless want_t0), sin/cos parts f32 for the
    backward)."""
    F, _, _ = spec.enc
    p0 = spec.in_dims[0]
    b = pos.shape[0]
    svec, masks = _enc_consts(spec)
    x3 = pos[:, :3]
    # scaled[b, c] = x_{coord(c)} * s_c, d-major columns
    scaled = sum(pos[:, d:d + 1] * masks[d] for d in range(3)) * svec
    sin_p = jnp.sin(scaled)
    cos_p = jnp.cos(scaled)
    pad = p0 - 3 - 6 * F
    zpad = [jnp.zeros((b, pad), jnp.float32)] if pad else []
    h0 = jnp.concatenate([x3, sin_p, cos_p] + zpad, axis=-1).astype(jnp.bfloat16)
    if not want_t0:
        return h0, None, sin_p, cos_p
    dsin = cos_p * svec
    dcos = -sin_p * svec
    eye3 = jax.lax.broadcasted_iota(jnp.int32, (b, 3), 1)
    t0 = jnp.stack(
        [
            jnp.concatenate(
                [(eye3 == k).astype(jnp.float32),
                 dsin * masks[k], dcos * masks[k]] + zpad,
                axis=-1,
            )
            for k in range(3)
        ]
    ).astype(jnp.bfloat16)
    return h0, t0, sin_p, cos_p


def _enc_bwd(spec: ChainSpec, sin_p, cos_p, gh0, gt0):
    """Transpose of (enc, J_enc) wrt positions: gh0 [B, P0] f32 cotangent of
    enc, gt0 [3, B, P0] f32 cotangent of the basis tangents -> [B, LANE]
    f32 position cotangent (cols 0..2). Uses enc'' = -s^2 enc."""
    F, _, _ = spec.enc
    svec, masks = _enc_consts(spec)
    b = gh0.shape[0]
    s1, s2 = 3, 3 + 3 * F
    dsin = cos_p * svec
    dcos = -sin_p * svec
    d2sin = -sin_p * svec * svec
    d2cos = -cos_p * svec * svec
    gs = gh0[:, s1:s2]
    gc = gh0[:, s2:s2 + 3 * F]
    cols = []
    for k in range(3):
        gts = gt0[k][:, s1:s2]
        gtc = gt0[k][:, s2:s2 + 3 * F]
        gk = gh0[:, k:k + 1]
        gk = gk + jnp.sum((gs * dsin + gts * d2sin) * masks[k], axis=-1, keepdims=True)
        gk = gk + jnp.sum((gc * dcos + gtc * d2cos) * masks[k], axis=-1, keepdims=True)
        cols.append(gk)
    return jnp.concatenate(
        cols + [jnp.zeros((b, LANE - 3), jnp.float32)], axis=-1
    )


def _enc_jt(spec: ChainSpec, sin_p, cos_p, a):
    """First-order transpose J_enc(x)^T a -> [B, LANE] f32 (cols 0..2).

    The gh0-only half of _enc_bwd: contracts an enc-level cotangent (or
    adjoint) with the encoding Jacobian."""
    F, _, _ = spec.enc
    svec, masks = _enc_consts(spec)
    b = a.shape[0]
    s1, s2 = 3, 3 + 3 * F
    dsin = cos_p * svec
    dcos = -sin_p * svec
    gs = a[:, s1:s2]
    gc = a[:, s2:s2 + 3 * F]
    cols = []
    for k in range(3):
        gk = a[:, k:k + 1]
        gk = gk + jnp.sum((gs * dsin + gc * dcos) * masks[k], axis=-1, keepdims=True)
        cols.append(gk)
    return jnp.concatenate(cols + [jnp.zeros((b, LANE - 3), jnp.float32)], axis=-1)


# --------------------------------------------------------------- forward

def _fwd_kernel(spec: ChainSpec, *refs):
    L, K = spec.n_layers, spec.n_tangents
    p = 0
    x_ref = refs[p]; p += 1
    tx_ref = None
    if K and spec.enc is None:
        tx_ref = refs[p]; p += 1
    ws = refs[p:p + L]; bs = refs[p + L:p + 2 * L]
    y_ref = refs[p + 2 * L]
    ty_ref = refs[p + 2 * L + 1] if K else None

    f, df, _ = _act_triple(spec)
    if spec.enc is not None:
        x0, t0, _, _ = _enc_fwd(spec, x_ref[:])
    else:
        x0 = x_ref[:]  # [B, P0] bf16
        t0 = tx_ref[:] if K else None  # [K, B, P0] bf16
    h = x0
    t = t0
    for l in range(L):
        if l in spec.skip:
            h = (jnp.concatenate([h, x0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
            if K:
                t = (jnp.concatenate([t, t0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
        w = ws[l][:]  # bf16 (cast once per step outside the kernel)
        z = jnp.dot(h, w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) + bs[l][:]  # [B, D] f32
        if K:
            u = _tdot(t, w)  # [K, B, D] f32
        if l < L - 1:
            h = f(z).astype(jnp.bfloat16)
            if K:
                t = (u * df(z)[None]).astype(jnp.bfloat16)
        else:
            h = z  # last layer kept f32 (pre-cast)
            if K:
                t = u  # last-layer tangents kept f32 (pre-cast)
    if spec.sdf_split:
        # y_ref: sdf+grad [B, LANE] f32; ty_ref: geo [B, G] bf16
        ch = spec.tangent_out_channel
        b = h.shape[0]
        g = t[:, :, ch].T  # [B, K] f32
        y_ref[:] = jnp.concatenate(
            [h[:, ch:ch + 1], g, jnp.zeros((b, LANE - K - 1), jnp.float32)], axis=-1
        )
        geo = h[:, 1:1 + ty_ref.shape[1]]
        ty_ref[:] = geo.astype(jnp.bfloat16)
        return
    y_ref[:] = h.astype(jnp.bfloat16)
    if K:
        if spec.tangent_out_channel is not None:
            g = t[:, :, spec.tangent_out_channel].T  # [B, K] f32
            b = g.shape[0]
            ty_ref[:] = jnp.concatenate(
                [g, jnp.zeros((b, LANE - K), jnp.float32)], axis=-1
            )
        else:
            ty_ref[:] = t.astype(jnp.bfloat16)


# ------------------------------------------------- adjoint (reverse-mode)

def _adj_sweep(spec: ChainSpec, wl, zs, b, s_store=None):
    """In-kernel reverse sweep: adj = d y[:, c] / d chain-input [B, P0] f32.

    zs: the stored pre-activations z_0..z_{L-2} (bf16 values). When
    s_store is a list, fills the post-skip h-part s_l rows (what
    multiplies df(z_{l-1})) at s_store[l-1] — the outer backward's
    residuals."""
    L = spec.n_layers
    c = spec.tangent_out_channel
    P0 = spec.in_dims[0]
    _, df, _ = _act_triple(spec)
    dl = spec.out_dims[-1]
    colv = jax.lax.broadcasted_iota(jnp.int32, (b, dl), 1)
    v = (colv == c).astype(jnp.float32)
    adj = jnp.zeros((b, P0), jnp.float32)
    for l in reversed(range(L)):
        s = jax.lax.dot_general(
            v.astype(jnp.bfloat16), wl[l],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [B, Din_l]
        if l in spec.skip:
            hw = spec.in_dims[l] - P0
            adj = adj + s[:, hw:] * _SKIP_SCALE
            s = s[:, :hw] * _SKIP_SCALE
        if l == 0:
            adj = adj + s
        else:
            if s_store is not None:
                s_store[l - 1] = s.astype(jnp.bfloat16)  # residual: bf16
            v = s * df(zs[l - 1])
    return adj


def _fwd_adj_kernel(spec: ChainSpec, *refs):
    """Forward + one reverse sweep: y and d y[:, c]/d input in one kernel.

    2 matmuls/layer (primal z + adjoint s) vs 4 for the 3-tangent JVP
    variant; z's stay in VMEM scratch for the sweep."""
    L = spec.n_layers
    p = 0
    x_ref = refs[p]; p += 1
    ws = refs[p:p + L]; bs = refs[p + L:p + 2 * L]; p += 2 * L
    y_ref = refs[p]; p += 1
    a_ref = refs[p]  # geo (sdf_split) | adj [B, P0] (plain)

    f, df, _ = _act_triple(spec)
    enc = spec.enc is not None
    if enc:
        x0, _, sin_p, cos_p = _enc_fwd(spec, x_ref[:], want_t0=False)
    else:
        x0 = x_ref[:]
    wl = [ws[l][:] for l in range(L)]

    h = x0
    zs = []
    for l in range(L):
        if l in spec.skip:
            h = (jnp.concatenate([h, x0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
        z = jnp.dot(h, wl[l], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) + bs[l][:]
        if l < L - 1:
            zs.append(z.astype(jnp.bfloat16))
            h = f(z).astype(jnp.bfloat16)
        else:
            h = z  # last layer f32

    adj = _adj_sweep(spec, wl, zs, h.shape[0])

    if spec.sdf_split:
        ch = spec.tangent_out_channel
        b = h.shape[0]
        grad3 = _enc_jt(spec, sin_p, cos_p, adj)[:, :3] if enc else adj[:, :3]
        y_ref[:] = jnp.concatenate(
            [h[:, ch:ch + 1], grad3, jnp.zeros((b, LANE - 4), jnp.float32)], axis=-1
        )
        a_ref[:] = h[:, 1:1 + a_ref.shape[1]].astype(jnp.bfloat16)
        return
    y_ref[:] = h.astype(jnp.bfloat16)
    a_ref[:] = adj


def _bwd_adj_kernel(spec: ChainSpec, *refs):
    """Hand-derived backward of (y, adj) — reverse-over-reverse.

    With Phi = <gy, y> + <ga, adj> and the adjoint chain
    v_{L-1} = e_c, s_l = v_l W_l^T (skip-split), v_{l-1} = s_l * df(z_{l-1}):

      d Phi/d W_l = hin_l^T gz_l  +  qin_l^T v_l
      d Phi/d b_l = sum_B gz_l

    where the ga-forward chain is qin_0 = ga, m_l = qin_l @ W_l,
    qin_{l+1} = m_l * df(z_l) (ga re-injected at skips like x0), and the
    standard cotangent sweep gz carries an extra act'' injection
    e_l = m_l * s_{l+1} * act''(z_l) — the second-order term the adjoint
    output induces. In enc mode ga = sum_k g3_k t0_k and gx picks up the
    encoding-Hessian term g3_k <adj, enc''_k> (enc'' = -s^2 enc)."""
    L = spec.n_layers
    enc = spec.enc is not None
    p = 0
    x_ref = refs[p]; p += 1
    gy_ref = refs[p]; p += 1
    ga_ref = refs[p]; p += 1  # geo cotangent (sdf_split) | adj cotangent
    ws = refs[p:p + L]; bs = refs[p + L:p + 2 * L]; p += 2 * L
    gx_ref = refs[p]; p += 1
    gw_refs = refs[p:p + L]; gb_refs = refs[p + L:p + 2 * L]; p += 2 * L
    # residual stacks in explicit scratch (live SSA values blew the 16M
    # scoped-VMEM stack at block 384)
    z_scr = refs[p]; p += 1
    s_scr = refs[p]; p += 1
    e_scr = refs[p]

    f, df, ddf = _act_triple(spec)
    first = pl.program_id(0) == 0
    P0 = spec.in_dims[0]
    c = spec.tangent_out_channel
    DL = spec.out_dims[-1]

    if enc:
        x0, t0, sin_p, cos_p = _enc_fwd(spec, x_ref[:])
    else:
        x0 = x_ref[:]
    wl = [ws[l][:] for l in range(L)]
    b = x0.shape[0]

    # ---- recompute primal (z stack) and adjoint chain (s stack + adj);
    # stacks live in explicit VMEM scratch and are re-read at use sites
    # (the list-of-SSA-values form blew the 16M scoped-VMEM stack)
    h = x0
    for l in range(L - 1):
        if l in spec.skip:
            h = (jnp.concatenate([h, x0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
        z = jnp.dot(h, wl[l], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT) + bs[l][:]
        z_scr[l] = z.astype(jnp.bfloat16)
        h = f(z).astype(jnp.bfloat16)
    adj = _adj_sweep(spec, wl, z_scr, b, s_store=s_scr)

    # ---- incoming cotangents (gy on y, ga on the adjoint/grad output)
    if spec.sdf_split:
        gsg = gy_ref[:]  # [B, LANE] f32: col 0 -> y_c, cols 1..3 -> grad3
        ggeo = ga_ref[:].astype(jnp.float32)
        gcols = ggeo.shape[1]
        tail = DL - 1 - gcols
        parts = [gsg[:, :1], ggeo]
        if tail > 0:
            parts.append(jnp.zeros((b, tail), jnp.float32))
        gy = jnp.concatenate(parts, axis=-1)
        g3 = gsg[:, 1:4]  # cotangent on the 3-dim position gradient
        # transpose of grad3 = J_enc^T adj: cotangent on adj rides the
        # encoding Jacobian rows (the basis tangents)
        ga = sum(g3[:, k:k + 1] * t0[k].astype(jnp.float32) for k in range(3))
    else:
        gy = gy_ref[:].astype(jnp.float32)
        g3 = None
        ga = ga_ref[:].astype(jnp.float32)

    # ---- ga-forward chain: qin_l, m_l; adjoint-path weight gradients
    # (accumulated straight into gw_refs — keeping L live [Din, D] values
    # plus the residual stacks blew the 16M scoped-VMEM stack at block
    # 384) and the act'' injections e_l (bf16 scratch, like the JVP u_stack)
    q = ga
    for l in range(L):
        if l in spec.skip:
            qin = (jnp.concatenate([q, ga], axis=-1) * _SKIP_SCALE)
        else:
            qin = q
        if l == L - 1:
            colv = jax.lax.broadcasted_iota(jnp.int32, (b, DL), 1)
            v_l = (colv == c).astype(jnp.float32)
        else:
            v_l = s_scr[l].astype(jnp.float32) * df(z_scr[l])
        gwd = jax.lax.dot_general(
            qin.astype(jnp.bfloat16), v_l.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        gw_ref = gw_refs[l]

        @pl.when(first)
        def _():
            gw_ref[:] = gwd

        @pl.when(jnp.logical_not(first))
        def _():
            gw_ref[:] = gw_ref[:] + gwd

        if l < L - 1:
            m = jnp.dot(qin.astype(jnp.bfloat16), wl[l],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            if ddf is not None:
                e_scr[l] = (m * s_scr[l].astype(jnp.float32) * ddf(z_scr[l])).astype(
                    jnp.bfloat16
                )
            q = m * df(z_scr[l])

    def layer_input(l):
        if l == 0:
            hin = x0
        else:
            hin = f(z_scr[l - 1].astype(jnp.float32)).astype(jnp.bfloat16)
        if l in spec.skip:
            hin = (jnp.concatenate([hin, x0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
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
            precision=jax.lax.Precision.DEFAULT,
        )
        gb = jnp.sum(gz, axis=0, keepdims=True)
        gw_ref, gb_ref = gw_refs[l], gb_refs[l]
        # gw_ref already holds this grid step's adjoint-path term (set in
        # the m-loop above) — always accumulate here
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
            precision=jax.lax.Precision.DEFAULT,
        )
        if l in spec.skip:
            hw = spec.in_dims[l] - P0
            gh = ghp[:, :hw] * _SKIP_SCALE
            gx0 = gx0 + ghp[:, hw:] * _SKIP_SCALE
        else:
            gh = ghp

    ghin = gh + gx0
    if enc:
        gx = _enc_jt(spec, sin_p, cos_p, ghin)
        if g3 is not None:
            # encoding-Hessian term of the grad3 output: enc'' is diagonal
            # per coordinate (d2sin/d2cos), weighted by the adjoint
            F, _, _ = spec.enc
            svec, masks = _enc_consts(spec)
            s1, s2 = 3, 3 + 3 * F
            d2sin = -sin_p * svec * svec
            d2cos = -cos_p * svec * svec
            a_s = adj[:, s1:s2]
            a_c = adj[:, s2:s2 + 3 * F]
            sec = jnp.concatenate(
                [
                    g3[:, k:k + 1]
                    * jnp.sum((a_s * d2sin + a_c * d2cos) * masks[k], axis=-1, keepdims=True)
                    for k in range(3)
                ]
                + [jnp.zeros((b, LANE - 3), jnp.float32)],
                axis=-1,
            )
            gx = gx + sec
        gx_ref[:] = gx
    else:
        gx_ref[:] = ghin.astype(gx_ref.dtype)


# -------------------------------------------------------------- backward

def _bwd_kernel(spec: ChainSpec, *refs):
    """Transposed chain: recompute forward (stacks in VMEM), reverse sweep.

    Inputs:  x, (tx), gy, (gty), W_0..L-1, b_0..L-1
    Outputs: gx, (gtx), gW_0..L-1, gb_0..L-1   (gW/gb accumulate over grid)
    Scratch: z_stack [L-1, B, H], (u_stack [L-1, K, B, H])
    """
    L, K = spec.n_layers, spec.n_tangents
    enc = spec.enc is not None
    p = 0
    x_ref = refs[p]; p += 1
    tx_ref = None
    if K and not enc:
        tx_ref = refs[p]; p += 1
    gy_ref = refs[p]; p += 1
    gty_ref = None
    if K:
        gty_ref = refs[p]; p += 1
    ws = refs[p:p + L]; bs = refs[p + L:p + 2 * L]; p += 2 * L
    gx_ref = refs[p]; p += 1
    gtx_ref = None
    if K and not enc:
        gtx_ref = refs[p]; p += 1
    gw_refs = refs[p:p + L]; gb_refs = refs[p + L:p + 2 * L]; p += 2 * L
    z_stack = refs[p]; p += 1
    u_stack = refs[p] if K else None

    f, df, ddf = _act_triple(spec)
    first = pl.program_id(0) == 0
    P0 = spec.in_dims[0]

    if enc:
        x0, t0, sin_p, cos_p = _enc_fwd(spec, x_ref[:])
    else:
        x0 = x_ref[:]
        t0 = tx_ref[:] if K else None
    wl = [ws[l][:] for l in range(L)]  # bf16 (cast outside the kernel)

    # ---- forward recompute, storing pre-activations (and tangent pre-acts)
    h = x0
    t = t0
    for l in range(L - 1):
        if l in spec.skip:
            h = (jnp.concatenate([h, x0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
            if K:
                t = (jnp.concatenate([t, t0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
        z = jnp.dot(h, wl[l], preferred_element_type=jnp.float32) + bs[l][:]
        zb = z.astype(jnp.bfloat16)
        z_stack[l] = zb
        if K:
            u = _tdot(t, wl[l])
            ub = u.astype(jnp.bfloat16)
            u_stack[l] = ub
            t = (ub * df(zb)[None]).astype(jnp.bfloat16)
        h = f(z).astype(jnp.bfloat16)

    def layer_input(l):
        """(hin, tin) as fed to layer l's matmul (bf16)."""
        if l == 0:
            hin, tin = x0, t0
        else:
            zp = z_stack[l - 1]
            hin = f(zp.astype(jnp.float32)).astype(jnp.bfloat16)
            tin = (u_stack[l - 1][:] * df(zp)[None]).astype(jnp.bfloat16) if K else None
        if l in spec.skip:
            hin = (jnp.concatenate([hin, x0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
            if K:
                tin = (jnp.concatenate([tin, t0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
        return hin, tin

    # ---- reverse sweep
    if spec.sdf_split:
        # gy_ref: sdf+grad cotangent [B, LANE] f32; gty_ref: geo [B, G] bf16
        gsg = gy_ref[:]
        ggeo = gty_ref[:].astype(jnp.float32)
        b = gsg.shape[0]
        dl = spec.out_dims[-1]
        gcols = ggeo.shape[1]
        tail = dl - 1 - gcols
        parts = [gsg[:, :1], ggeo]
        if tail > 0:
            parts.append(jnp.zeros((b, tail), jnp.float32))
        gh = jnp.concatenate(parts, axis=-1)
        gg = gsg[:, 1:1 + K].T[:, :, None]  # [K, B, 1]
        gt = jnp.concatenate(
            [gg, jnp.zeros((K, b, dl - 1), jnp.float32)], axis=-1
        )
    else:
        gh = gy_ref[:].astype(jnp.float32)  # [B, D_L]
        gt = None
    if K and not spec.sdf_split:
        if spec.tangent_out_channel is not None:
            # gty arrives as [B, LANE] f32 (cols 0..K-1); scatter it back
            # into the (sparse) last-layer tangent cotangent [K, B, D_L]
            gg = gty_ref[:][:, :K].T[:, :, None]  # [K, B, 1]
            b, dl = gh.shape
            ch = spec.tangent_out_channel
            parts = []
            if ch > 0:
                parts.append(jnp.zeros((K, b, ch), jnp.float32))
            parts.append(gg)
            if dl - ch - 1 > 0:
                parts.append(jnp.zeros((K, b, dl - ch - 1), jnp.float32))
            gt = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else gg
        else:
            gt = gty_ref[:].astype(jnp.float32)
    gx0 = jnp.zeros((x0.shape[0], P0), jnp.float32)
    gtx0 = jnp.zeros((K, x0.shape[0], P0), jnp.float32) if K else None

    for l in reversed(range(L)):
        if l == L - 1:
            gz = gh
            gu = gt
        else:
            zb = z_stack[l]
            d1 = df(zb).astype(jnp.float32)
            gz = gh * d1
            if K:
                gu = gt * d1[None]
                if ddf is not None:
                    u = u_stack[l][:].astype(jnp.float32)
                    gz = gz + jnp.sum(gt * u, axis=0) * ddf(zb.astype(jnp.float32))
        hin, tin = layer_input(l)
        gzb = gz.astype(jnp.bfloat16)
        # weight/bias grads, f32-accumulated across the sample grid
        gw = jax.lax.dot_general(
            hin, gzb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
        )
        if K:
            kb = K * tin.shape[1]
            gub = gu.astype(jnp.bfloat16)
            gw = gw + jax.lax.dot_general(
                tin.reshape(kb, tin.shape[2]), gub.reshape(kb, gub.shape[2]),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
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

        # propagate to the layer input
        ghp = jax.lax.dot_general(
            gzb, wl[l], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
        )
        if K:
            kb = K * gu.shape[1]
            gub2 = gu.astype(jnp.bfloat16).reshape(kb, gu.shape[2])
            gtp = jax.lax.dot_general(
                gub2, wl[l], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
            ).reshape(K, gu.shape[1], -1)
        if l in spec.skip:
            hwidth = spec.in_dims[l] - P0
            gh = ghp[:, :hwidth] * _SKIP_SCALE
            gx0 = gx0 + ghp[:, hwidth:] * _SKIP_SCALE
            if K:
                gt = gtp[:, :, :hwidth] * _SKIP_SCALE
                gtx0 = gtx0 + gtp[:, :, hwidth:] * _SKIP_SCALE
        else:
            gh = ghp
            if K:
                gt = gtp

    if enc:
        gx_ref[:] = _enc_bwd(spec, sin_p, cos_p, gh + gx0, gt + gtx0)
    else:
        gx_ref[:] = (gh + gx0).astype(gx_ref.dtype)
        if K:
            gtx_ref[:] = (gt + gtx0).astype(gtx_ref.dtype)


# ------------------------------------------------------------ pallas glue

def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _build_chain(spec: ChainSpec, n_total: int, interpret: bool):
    """custom_vjp fused chain over padded arrays.

    Signature: chain(xp [N,P0] bf16, txp [K,N,P0] bf16 | None,
                     wps tuple of f32 [din,dout], bps tuple of f32 [1,dout])
    -> (y [N,DL] bf16, ty [K,N,DL] bf16 | None)
    """
    L, K, B = spec.n_layers, spec.n_tangents, spec.block
    assert n_total % B == 0
    grid = (n_total // B,)
    P0, DL = spec.in_dims[0], spec.out_dims[-1]
    H = spec.out_dims[0] if L > 1 else DL

    enc = spec.enc is not None
    has_tx = K > 0 and not enc  # enc mode computes tangents in-kernel
    w_specs = [_const_spec((din, dout)) for din, dout in zip(spec.in_dims, spec.out_dims)]
    b_specs = [_const_spec((1, dout)) for dout in spec.out_dims]
    xw = LANE if enc else P0  # enc mode: raw positions [N, LANE] f32
    x_spec = pl.BlockSpec((B, xw), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tx_spec = pl.BlockSpec((K, B, P0), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((B, DL), lambda i: (i, 0), memory_space=pltpu.VMEM)
    chan = spec.tangent_out_channel is not None
    split = spec.sdf_split
    if split:
        # sdf+grad [N, LANE] f32 and geo [N, G] bf16
        y_spec = pl.BlockSpec((B, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((n_total, LANE), jnp.float32)
        ty_spec = pl.BlockSpec(
            (B, spec.geo_width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        ty_shape = jax.ShapeDtypeStruct((n_total, spec.geo_width), jnp.bfloat16)
    elif chan:
        y_shape = jax.ShapeDtypeStruct((n_total, DL), jnp.bfloat16)
        ty_spec = pl.BlockSpec((B, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ty_shape = jax.ShapeDtypeStruct((n_total, LANE), jnp.float32)
    else:
        y_shape = jax.ShapeDtypeStruct((n_total, DL), jnp.bfloat16)
        ty_spec = pl.BlockSpec((K, B, DL), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        ty_shape = jax.ShapeDtypeStruct((K, n_total, DL), jnp.bfloat16)

    fwd_in = [x_spec] + ([tx_spec] if has_tx else []) + w_specs + b_specs
    fwd_out = [y_spec] + ([ty_spec] if K else [])
    fwd_shapes = [y_shape] + ([ty_shape] if K else [])
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=grid,
        in_specs=fwd_in,
        out_specs=fwd_out,
        out_shape=fwd_shapes,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    bwd_in = (
        [x_spec] + ([tx_spec] if has_tx else []) + [y_spec] + ([ty_spec] if K else [])
        + w_specs + b_specs
    )
    bwd_out = (
        [pl.BlockSpec((B, xw), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + ([pl.BlockSpec((K, B, P0), lambda i: (0, i, 0), memory_space=pltpu.VMEM)] if has_tx else [])
        + [_const_spec((din, dout)) for din, dout in zip(spec.in_dims, spec.out_dims)]
        + [_const_spec((1, dout)) for dout in spec.out_dims]
    )
    # cotangent dtypes match the primals: bf16 for bf16 chain inputs
    # (halves the HBM traffic of downstream cotangent adds — head-chain
    # gx tensors measured ~26 ms/step of f32 add fusions), f32 for raw
    # positions in enc mode
    gx_dt = jnp.float32 if enc else jnp.bfloat16
    bwd_shapes = (
        [jax.ShapeDtypeStruct((n_total, xw), gx_dt)]
        + ([jax.ShapeDtypeStruct((K, n_total, P0), jnp.bfloat16)] if has_tx else [])
        + [jax.ShapeDtypeStruct((din, dout), jnp.float32)
           for din, dout in zip(spec.in_dims, spec.out_dims)]
        + [jax.ShapeDtypeStruct((1, dout), jnp.float32) for dout in spec.out_dims]
    )
    scratch = [pltpu.VMEM((max(L - 1, 1), B, H), jnp.bfloat16)]
    if K:
        scratch.append(pltpu.VMEM((max(L - 1, 1), K, B, H), jnp.bfloat16))
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        grid=grid,
        in_specs=bwd_in,
        out_specs=bwd_out,
        out_shape=bwd_shapes,
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    @jax.custom_vjp
    def chain(xp, txp, wps, bps):
        wbs = [w.astype(jnp.bfloat16) for w in wps]
        # the kernels' bf16 dots must not inherit an f32 global matmul
        # precision (Trainer sets jax_default_matmul_precision=float32):
        # Mosaic rejects contract_precision<fp32> on bf16 vectors
        with jax.default_matmul_precision("bfloat16"):
            outs = fwd_call(*([xp] + ([txp] if has_tx else []) + wbs + list(bps)))
        return (outs[0], outs[1] if K else None)

    def chain_fwd(xp, txp, wps, bps):
        return chain(xp, txp, wps, bps), (xp, txp, wps, bps)

    def chain_bwd(res, g):
        xp, txp, wps, bps = res
        gy, gty = g
        gyb = gy.astype(jnp.float32) if split else gy.astype(jnp.bfloat16)
        args = [xp] + ([txp] if has_tx else []) + [gyb]
        if K:
            if split:
                args.append(gty.astype(jnp.bfloat16))
            else:
                args.append(gty.astype(jnp.float32) if chan else gty.astype(jnp.bfloat16))
        args += [w.astype(jnp.bfloat16) for w in wps] + list(bps)
        with jax.default_matmul_precision("bfloat16"):
            outs = bwd_call(*args)
        q = 0
        gx = outs[q]; q += 1
        gtx = None
        if has_tx:
            gtx = outs[q]; q += 1
        gws = tuple(outs[q:q + L]); gbs = tuple(outs[q + L:q + 2 * L])
        return gx, gtx, gws, gbs

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


@functools.lru_cache(maxsize=None)
def _build_adj_chain(spec: ChainSpec, n_total: int, interpret: bool):
    """custom_vjp fused adjoint chain over padded arrays.

    chain(xp, wps, bps) -> (y, a): sdf_split mode emits (sdf+grad [N, LANE]
    f32, geo [N, G] bf16) like the JVP split; plain mode emits
    (y [N, DL] bf16, adj [N, P0] f32 = d y[:, c]/d input)."""
    L, B = spec.n_layers, spec.block
    assert n_total % B == 0
    grid = (n_total // B,)
    P0, DL = spec.in_dims[0], spec.out_dims[-1]

    enc = spec.enc is not None
    split = spec.sdf_split
    w_specs = [_const_spec((din, dout)) for din, dout in zip(spec.in_dims, spec.out_dims)]
    b_specs = [_const_spec((1, dout)) for dout in spec.out_dims]
    xw = LANE if enc else P0
    x_spec = pl.BlockSpec((B, xw), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if split:
        y_spec = pl.BlockSpec((B, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((n_total, LANE), jnp.float32)
        a_spec = pl.BlockSpec((B, spec.geo_width), lambda i: (i, 0), memory_space=pltpu.VMEM)
        a_shape = jax.ShapeDtypeStruct((n_total, spec.geo_width), jnp.bfloat16)
    else:
        y_spec = pl.BlockSpec((B, DL), lambda i: (i, 0), memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((n_total, DL), jnp.bfloat16)
        a_spec = pl.BlockSpec((B, P0), lambda i: (i, 0), memory_space=pltpu.VMEM)
        a_shape = jax.ShapeDtypeStruct((n_total, P0), jnp.float32)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_adj_kernel, spec),
        grid=grid,
        in_specs=[x_spec] + w_specs + b_specs,
        out_specs=[y_spec, a_spec],
        out_shape=[y_shape, a_shape],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    gx_dt = jnp.float32 if enc else jnp.bfloat16
    H = spec.out_dims[0] if L > 1 else DL
    # residual stacks (z, s, act''-injection e) in explicit VMEM scratch —
    # as live SSA values they blew the 16M scoped-VMEM stack at block 384
    adj_scratch = [
        pltpu.VMEM((max(L - 1, 1), B, H), jnp.bfloat16),
        pltpu.VMEM((max(L - 1, 1), B, H), jnp.bfloat16),
        pltpu.VMEM((max(L - 1, 1), B, H), jnp.bfloat16),
    ]
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_adj_kernel, spec),
        grid=grid,
        in_specs=[x_spec, y_spec, a_spec] + w_specs + b_specs,
        out_specs=(
            [pl.BlockSpec((B, xw), lambda i: (i, 0), memory_space=pltpu.VMEM)]
            + [_const_spec((din, dout)) for din, dout in zip(spec.in_dims, spec.out_dims)]
            + [_const_spec((1, dout)) for dout in spec.out_dims]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((n_total, xw), gx_dt)]
            + [jax.ShapeDtypeStruct((din, dout), jnp.float32)
               for din, dout in zip(spec.in_dims, spec.out_dims)]
            + [jax.ShapeDtypeStruct((1, dout), jnp.float32) for dout in spec.out_dims]
        ),
        scratch_shapes=adj_scratch,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )

    @jax.custom_vjp
    def chain(xp, wps, bps):
        wbs = [w.astype(jnp.bfloat16) for w in wps]
        with jax.default_matmul_precision("bfloat16"):
            outs = fwd_call(*([xp] + wbs + list(bps)))
        return (outs[0], outs[1])

    def chain_fwd(xp, wps, bps):
        return chain(xp, wps, bps), (xp, wps, bps)

    def chain_bwd(res, g):
        xp, wps, bps = res
        gy, ga = g
        if split:
            gy = gy.astype(jnp.float32)
            ga = ga.astype(jnp.bfloat16)
        else:
            gy = gy.astype(jnp.bfloat16)
            ga = ga.astype(jnp.float32)
        args = [xp, gy, ga] + [w.astype(jnp.bfloat16) for w in wps] + list(bps)
        with jax.default_matmul_precision("bfloat16"):
            outs = bwd_call(*args)
        gx = outs[0]
        gws = tuple(outs[1:1 + L])
        gbs = tuple(outs[1 + L:1 + 2 * L])
        return gx, gws, gbs

    chain.defvjp(chain_fwd, chain_bwd)
    return chain


# ------------------------------------------------------------- public API

def _chain_geometry(d_in: int, weights: Sequence[jnp.ndarray], skip: Tuple[int, ...]):
    """Padded per-layer (in, out) dims; validates uniform hidden width."""
    L = len(weights)
    p0 = _rup(d_in)
    hidden = weights[0].shape[1]  # layer-0 output is the hidden width (L > 1)
    if hidden % LANE != 0:
        raise ValueError(f"hidden width {hidden} must be a multiple of {LANE}")
    in_dims, out_dims = [], []
    for l, w in enumerate(weights):
        if l == 0:
            if w.shape[0] != d_in:
                raise ValueError("layer 0 input width mismatch")
            din = p0
        elif l in skip:
            if w.shape[0] != hidden + d_in:
                raise ValueError("skip layer input width mismatch")
            din = hidden + p0
        else:
            if w.shape[0] != hidden:
                raise ValueError(f"layer {l} input width {w.shape[0]} != hidden {hidden}")
            din = hidden
        in_dims.append(din)
        out_dims.append(_rup(w.shape[1]))
    return tuple(in_dims), tuple(out_dims), p0, hidden


def _pad_operand(x, rows, cols, dtype):
    """Zero-pad a [n, d] array to (rows, cols) with an XLA Pad op.

    The `zeros().at[:n, :d].set(x)` idiom lowers to scatter /
    dynamic-update-slice — the r5 packed trace shows ~4 ms/step of such
    scatters across the kernel-operand builds (r5logs/attrib_r5b.txt,
    jvp(*)/scatter rows). lax.pad is the cheap, fusible lowering."""
    x = x.astype(dtype)
    pr, pc = rows - x.shape[0], cols - x.shape[1]
    if pr == 0 and pc == 0:
        return x
    return jnp.pad(x, ((0, pr), (0, pc)))


def _pad_weight(w, l, din, dout, d_in, hidden, skip):
    wp = jnp.zeros((din, dout), jnp.float32)
    if l in skip:
        wp = wp.at[:hidden, : w.shape[1]].set(w[:hidden].astype(jnp.float32))
        wp = wp.at[hidden:hidden + d_in, : w.shape[1]].set(w[hidden:].astype(jnp.float32))
    else:
        wp = wp.at[: w.shape[0], : w.shape[1]].set(w.astype(jnp.float32))
    return wp


def fused_chain(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    *,
    skip: Tuple[int, ...] = (),
    activation: str = "ReLU",
    beta: float = 100.0,
    tangents: Optional[jnp.ndarray] = None,
    tangent_out_channel: Optional[int] = None,
    block: int = 0,
    interpret: Optional[bool] = None,
):
    """Run the fused dense chain; returns y (and ty when tangents given).

    x: [N, D_in] (any float dtype; cast to bf16). weights[l]: [din_l, dout_l]
    effective (weight-norm applied) f32 matrices; biases[l]: [dout_l].
    tangents: [K, N, D_in] forward-mode input tangents or None.
    Returns y [N, D_out] bf16 pre-output-activation (and ty [K, N, D_out]
    bf16 — or, with tangent_out_channel=c, just dy_c/dt as [N, K] f32).
    Callers apply the output activation / f32 cast, matching
    fields/mlp.py::MLP.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not block:
        block = DEFAULT_BLOCK
    L = len(weights)
    n, d_in = x.shape
    d_out = weights[-1].shape[1]
    in_dims, out_dims, p0, hidden = _chain_geometry(d_in, weights, skip)
    k = 0 if tangents is None else tangents.shape[0]

    n_pad = _rup(n, block)
    xp = _pad_operand(x, n_pad, p0, jnp.bfloat16)
    txp = None
    if k:
        txp = jnp.pad(
            tangents.astype(jnp.bfloat16),
            ((0, 0), (0, n_pad - n), (0, p0 - d_in)),
        )
    wps = tuple(
        _pad_weight(w, l, din, dout, d_in, hidden, skip)
        for l, (w, din, dout) in enumerate(zip(weights, in_dims, out_dims))
    )
    bps = tuple(
        jnp.zeros((1, dout), jnp.float32).at[0, : b.shape[0]].set(b.astype(jnp.float32))
        for b, dout in zip(biases, out_dims)
    )

    spec = ChainSpec(
        in_dims=in_dims, out_dims=out_dims, skip=tuple(sorted(skip)),
        activation=activation, beta=beta, n_tangents=k, block=block,
        tangent_out_channel=tangent_out_channel,
    )
    chain = _build_chain(spec, n_pad, interpret)
    y, ty = chain(xp, txp, wps, bps)
    y = y[:n, :d_out]
    if k:
        if tangent_out_channel is not None:
            return y, ty[:n, :k]
        return y, ty[:, :n, :d_out]
    return y


def fused_sdf_chain(
    positions: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    *,
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    skip: Tuple[int, ...] = (),
    activation: str = "SoftplusQuad",
    beta: float = 100.0,
    tangent_out_channel: int = 0,
    block: int = 0,
    interpret: Optional[bool] = None,
    mode: str = "adjoint",
):
    """Fused NeRF-encoding + MLP chain + spatial gradient of one output.

    positions [N, 3] f32 -> (y [N, D_out] bf16, grad [N, 3] f32 =
    d y[:, channel] / d positions). The frequency encoding (include_input
    layout, ops/encodings.py::nerf_encoding), its Jacobian (3 basis
    tangents) and Hessian diagonal all evaluate inside the kernel — raw
    positions in, sdf+features+gradient out, nothing else touches HBM.

    mode: 'adjoint' (default) computes the gradient with one in-kernel
    reverse sweep — ~2x fewer matmuls than 'jvp' (3 forward tangent
    chains); both have hand-derived Pallas backwards and agree to bf16
    noise (tests/test_fused_mlp.py). MMS_SDF_CHAIN_MODE overrides (A/B
    experiments on the quality harness).
    """
    import os as _os

    mode = _os.environ.get("MMS_SDF_CHAIN_MODE", mode)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not block:
        block = DEFAULT_BLOCK
    n = positions.shape[0]
    d_in = 3 + 6 * num_frequencies
    d_out = weights[-1].shape[1]
    in_dims, out_dims, p0, hidden = _chain_geometry(d_in, weights, skip)
    n_pad = _rup(n, block)
    xp = _pad_operand(positions, n_pad, LANE, jnp.float32)
    wps = tuple(
        _pad_weight(w, l, din, dout, d_in, hidden, skip)
        for l, (w, din, dout) in enumerate(zip(weights, in_dims, out_dims))
    )
    bps = tuple(
        jnp.zeros((1, dout), jnp.float32).at[0, : b.shape[0]].set(b.astype(jnp.float32))
        for b, dout in zip(biases, out_dims)
    )
    assert tangent_out_channel == 0, "sdf_split assumes the sdf channel is 0"
    spec = ChainSpec(
        in_dims=in_dims, out_dims=out_dims, skip=tuple(sorted(skip)),
        activation=activation, beta=beta,
        n_tangents=0 if mode == "adjoint" else 3, block=block,
        tangent_out_channel=tangent_out_channel,
        enc=(num_frequencies, float(min_freq_exp), float(max_freq_exp)),
        sdf_split=True, geo_width=_rup(d_out - 1),
        adjoint=mode == "adjoint",
    )
    if mode == "adjoint":
        chain = _build_adj_chain(spec, n_pad, interpret)
        sg, geo = chain(xp, wps, bps)
    else:
        chain = _build_chain(spec, n_pad, interpret)
        sg, geo = chain(xp, None, wps, bps)
    return sg[:n, 0], geo[:n, : d_out - 1], sg[:n, 1:4]


def fused_chain_adjoint(
    x: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    *,
    skip: Tuple[int, ...] = (),
    activation: str = "SoftplusQuad",
    beta: float = 100.0,
    channel: int = 0,
    block: int = 0,
    interpret: Optional[bool] = None,
):
    """Fused chain + reverse-mode input gradient of one output channel.

    x [N, D_in] -> (y [N, D_out] bf16, adj [N, D_in] f32 =
    d y[:, channel]/d x). For externally-encoded inputs (e.g. the slot
    grid), contract adj with the input tangents OUTSIDE:
    grad_k = sum_j adj_j * tx[k, :, j] — one reverse sweep replaces the
    3-tangent JVP chain."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not block:
        block = DEFAULT_BLOCK
    n, d_in = x.shape
    d_out = weights[-1].shape[1]
    in_dims, out_dims, p0, hidden = _chain_geometry(d_in, weights, skip)
    n_pad = _rup(n, block)
    xp = _pad_operand(x, n_pad, p0, jnp.bfloat16)
    wps = tuple(
        _pad_weight(w, l, din, dout, d_in, hidden, skip)
        for l, (w, din, dout) in enumerate(zip(weights, in_dims, out_dims))
    )
    bps = tuple(
        jnp.zeros((1, dout), jnp.float32).at[0, : b.shape[0]].set(b.astype(jnp.float32))
        for b, dout in zip(biases, out_dims)
    )
    spec = ChainSpec(
        in_dims=in_dims, out_dims=out_dims, skip=tuple(sorted(skip)),
        activation=activation, beta=beta, n_tangents=0, block=block,
        tangent_out_channel=channel, adjoint=True,
    )
    chain = _build_adj_chain(spec, n_pad, interpret)
    y, adj = chain(xp, wps, bps)
    return y[:n, :d_out], adj[:n, :d_in]


# ---------------------------------------------------- reference (testing)

def chain_reference(
    x, weights, biases, *, skip=(), activation="ReLU", beta=100.0, tangents=None
):
    """Pure-XLA mirror of the kernel math (same bf16 cast points)."""
    spec = ChainSpec((), (), tuple(skip), activation, beta, 0, 0)
    f, df, _ = _act_triple(spec)
    L = len(weights)
    x0 = x.astype(jnp.bfloat16)
    h = x0
    t = t0 = None if tangents is None else tangents.astype(jnp.bfloat16)
    for l in range(L):
        if l in skip:
            h = (jnp.concatenate([h, x0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
            if t is not None:
                t = (jnp.concatenate([t, t0], axis=-1) * _SKIP_SCALE).astype(jnp.bfloat16)
        w = weights[l].astype(jnp.bfloat16)
        z = jax.lax.dot_general(
            h, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
        ) + biases[l].astype(jnp.float32)
        if t is not None:
            k, nn_, din = t.shape
            u = jax.lax.dot_general(
                t.reshape(k * nn_, din), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
            ).reshape(k, nn_, w.shape[1])
        if l < L - 1:
            h = f(z).astype(jnp.bfloat16)
            if t is not None:
                t = (u * df(z)[None]).astype(jnp.bfloat16)
        else:
            h = z.astype(jnp.bfloat16)
            if t is not None:
                t = u.astype(jnp.bfloat16)
    if tangents is None:
        return h
    return h, t
