"""Fused slot-grid+MLP SDF kernel (ops/pallas/slot_fused) vs the two-kernel
composition it replaces (slot_grid_lookup -> concat -> fused_chain_adjoint,
the models/model.py::_slot_sdf_gradients math) — values and full gradients.

Interpret mode on CPU (tests/conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodalstudio_tpu.fields.fields import NeRFEncodingSpec
from multimodalstudio_tpu.ops.pallas.fused_mlp import fused_chain_adjoint
from multimodalstudio_tpu.ops.pallas.slot_fused import fused_slot_sdf_chain
from multimodalstudio_tpu.ops.pallas.slot_grid import (
    SlotGridSpec,
    make_table_init,
    slot_grid_lookup,
)

GSPEC = SlotGridSpec(num_levels=3, min_res=4, max_res=16, rows_per_level=64,
                     layout="cell")
# round-4 packed-entry (feats<16) and bf16-table modes of the same geometry
GSPEC_P2 = SlotGridSpec(num_levels=3, min_res=4, max_res=16, rows_per_level=64,
                        layout="cell", gather="onehot", feats=2)
GSPEC_P2B = SlotGridSpec(num_levels=3, min_res=4, max_res=16, rows_per_level=64,
                         layout="cell", gather="onehot", feats=2,
                         table_dtype="bf16")
GSPECS = {"f16": GSPEC, "p2": GSPEC_P2, "p2_bf16": GSPEC_P2B}
PE = NeRFEncodingSpec(num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0,
                      include_input=True)
HID, D_OUT = 128, 65
R = 1.0

import pytest


def _params(key, gspec=GSPEC):
    d_in = 3 + 6 * PE.num_frequencies + gspec.out_dim
    ks = jax.random.split(key, 7)
    ws = [
        jax.random.normal(ks[0], (d_in, HID)) * 0.3,
        jax.random.normal(ks[1], (HID, HID)) * 0.3,
        jax.random.normal(ks[2], (HID, D_OUT)) * 0.3,
    ]
    bs = [
        jax.random.normal(ks[3], (HID,)) * 0.1,
        jax.random.normal(ks[4], (HID,)) * 0.1,
        jax.random.normal(ks[5], (D_OUT,)) * 0.1,
    ]
    table = make_table_init(gspec)(ks[6]) * 1e4
    pos = jax.random.uniform(jax.random.split(key)[0], (29, 3),
                             minval=-0.9, maxval=0.9)
    return ws, bs, table, pos


def _mask(active=None, gspec=GSPEC):
    if active is None:
        return None
    fpl = gspec.features_per_level
    lof = jnp.arange(gspec.out_dim) // fpl
    return (lof < active).astype(jnp.float32)


def reference(ws, bs, table, pos, active=None, gspec=GSPEC):
    """The production composition (models/model.py::_slot_sdf_gradients)."""
    rescaled = jnp.clip((pos + R) / (2 * R), 0.0, 1.0 - 1e-6)
    enc_g, tenc_g = slot_grid_lookup(table, rescaled, gspec, with_tangents=True)
    tenc_g = tenc_g / (2 * R)
    m = _mask(active, gspec)
    if m is not None:
        enc_g = enc_g * m
        tenc_g = tenc_g * m
    enc_fn = lambda p: PE.apply(p)[:, 3:]
    tangs = []
    for k in range(3):
        e = jnp.zeros_like(pos).at[:, k].set(1.0)
        pe, t = jax.jvp(enc_fn, (pos,), (e,))
        tangs.append(t)
    x_in = jnp.concatenate([pos, pe, enc_g], axis=-1)
    tx = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3)[:, None, :], (3, pos.shape[0], 3)),
         jnp.stack(tangs), tenc_g], axis=-1)
    y, adj = fused_chain_adjoint(
        x_in, ws, bs, skip=(), activation="SoftplusQuad", beta=100.0, channel=0,
    )
    grad = jnp.sum(adj[None] * tx.astype(jnp.float32), axis=-1)  # [3, N]
    y = y.astype(jnp.float32)
    return y[:, 0], y[:, 1:].astype(jnp.float32), grad.T


def fused(ws, bs, table, pos, active=None, gspec=GSPEC):
    sdf, geo, grad = fused_slot_sdf_chain(
        pos, table, ws, bs, gspec, radius=R,
        num_frequencies=PE.num_frequencies, min_freq_exp=PE.min_freq_exp,
        max_freq_exp=PE.max_freq_exp, skip=(), activation="SoftplusQuad",
        beta=100.0, level_mask=_mask(active, gspec),
        block=8,
    )
    return sdf, geo.astype(jnp.float32), grad


def _rel(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


@pytest.mark.parametrize("gname", list(GSPECS), ids=list(GSPECS))
class TestFusedSlotSDF:
    def test_forward_matches_composition(self, gname):
        gspec = GSPECS[gname]
        ws, bs, table, pos = _params(jax.random.key(0), gspec)
        s1, g1, d1 = fused(ws, bs, table, pos, gspec=gspec)
        s2, g2, d2 = reference(ws, bs, table, pos, gspec=gspec)
        assert _rel(s1, s2) < 3e-3, "sdf"
        assert _rel(g1, g2) < 3e-2, "geo (bf16 noise)"
        assert _rel(d1, d2) < 3e-3, "grad"

    def test_forward_with_level_mask(self, gname):
        gspec = GSPECS[gname]
        ws, bs, table, pos = _params(jax.random.key(2), gspec)
        s1, g1, d1 = fused(ws, bs, table, pos, active=2, gspec=gspec)
        s2, g2, d2 = reference(ws, bs, table, pos, active=2, gspec=gspec)
        assert _rel(s1, s2) < 3e-3
        assert _rel(d1, d2) < 3e-3

    def test_grads_match_composition(self, gname):
        """Full training-style gradients: loss over (sdf, geo, grad) back to
        table, positions, weights and biases."""
        gspec = GSPECS[gname]
        ws, bs, table, pos = _params(jax.random.key(4), gspec)

        def loss(fn, ws, bs, table, pos):
            s, g, d = fn(ws, bs, table, pos, gspec=gspec)
            return (
                jnp.sum(jnp.sin(3.0 * s))
                + jnp.sum(jnp.cos(d) * 0.7)
                + jnp.sum(jnp.sin(g[:, :32])) * 0.1
            )

        g1 = jax.grad(lambda *a: loss(fused, *a), argnums=(0, 1, 2, 3))(
            ws, bs, table, pos
        )
        g2 = jax.grad(lambda *a: loss(reference, *a), argnums=(0, 1, 2, 3))(
            ws, bs, table, pos
        )
        # bf16 table mode: fused and composition round at different points
        # (the composition materializes enc/tenc once; the fused kernel
        # re-forms them per dot) and the nonlinear loss amplifies that value
        # noise into the cotangents. The p2/f16 modes pin the structure at
        # 2e-2; bf16 only checks rounding-level agreement.
        tol = 8e-2 if gspec.table_dtype == "bf16" else 2e-2
        for i, name in enumerate(["d_ws", "d_bs", "d_table", "d_pos"]):
            r = _rel(
                jnp.concatenate([x.ravel() for x in jax.tree.leaves(g1[i])]),
                jnp.concatenate([x.ravel() for x in jax.tree.leaves(g2[i])]),
            )
            assert r < tol, f"{name}: rel {r}"


# ------------------------------------------- split-backward equivalence
#
# MMS_SLOT_BWD_SPLIT=1 factors the merged backward into a per-sample
# cotangent kernel + XLA weight-grad dots + a scatter-only table kernel
# (r5, VERDICT r4 #2). Same math, different kernel structure: d_pos and
# d_table come from identical per-sample ops (exact); d_ws/d_bs become
# bf16-operand XLA dots (bf16 rounding noise vs the in-kernel f32 path).


def _cat(t):
    return jnp.concatenate([x.ravel() for x in jax.tree.leaves(t)])


@pytest.mark.parametrize("gname", ["f16", "p2_bf16"])
def test_split_backward_matches_merged(gname, monkeypatch):
    gspec = GSPECS[gname]
    ws, bs, table, pos = _params(jax.random.key(9), gspec)

    def loss(ws, bs, table, pos):
        s, g, d = fused(ws, bs, table, pos, gspec=gspec)
        return (
            jnp.sum(jnp.sin(3.0 * s))
            + jnp.sum(jnp.cos(d) * 0.7)
            + jnp.sum(jnp.sin(g[:, :32])) * 0.1
        )

    monkeypatch.delenv("MMS_SLOT_BWD_SPLIT", raising=False)
    g_m = jax.grad(loss, argnums=(0, 1, 2, 3))(ws, bs, table, pos)
    monkeypatch.setenv("MMS_SLOT_BWD_SPLIT", "1")
    g_s = jax.grad(loss, argnums=(0, 1, 2, 3))(ws, bs, table, pos)
    assert _rel(_cat(g_s[2]), _cat(g_m[2])) < 1e-5, "d_table"
    assert _rel(_cat(g_s[3]), _cat(g_m[3])) < 1e-5, "d_pos"
    assert _rel(_cat(g_s[0]), _cat(g_m[0])) < 2e-2, "d_ws"
    assert _rel(_cat(g_s[1]), _cat(g_m[1])) < 2e-2, "d_bs"


# ------------------------------------------------- value-only kernel tests

from multimodalstudio_tpu.ops.pallas.slot_fused import fused_slot_sdf_value


def _softplus_quad(z, beta=100.0):
    a = 2.0 / beta
    return jnp.where(jnp.abs(z) < a, (z + a) * (z + a) * (0.25 / a), jnp.maximum(z, 0.0))


def reference_value_f32(ws, bs, table, pos, active=None, k=None, gspec=GSPEC):
    """slot_grid_lookup + pure-jnp f32 MLP (the flax sdf_only composition)."""
    rescaled = jnp.clip((pos + R) / (2 * R), 0.0, 1.0 - 1e-6)
    enc_g = slot_grid_lookup(table, rescaled, gspec, num_levels=k)
    m = _mask(active, gspec)
    if m is not None:
        enc_g = enc_g * m
    x = jnp.concatenate([PE.apply(pos), enc_g], axis=-1)
    h = x
    for l, (w, b) in enumerate(zip(ws, bs)):
        z = h @ w + b
        h = _softplus_quad(z) if l < len(ws) - 1 else z
    return h[:, 0]


def reference_value(ws, bs, table, pos, active=None, k=None, gspec=GSPEC):
    """Same-precision composition (slot_grid_lookup -> fused_chain_adjoint):
    identical bf16 matmul rounding as the fused value kernel, so gradient
    comparisons aren't swamped by SoftplusQuad's tiny quadratic window
    (|z| < 0.02) flipping derivative masks under f32-vs-bf16 z noise."""
    rescaled = jnp.clip((pos + R) / (2 * R), 0.0, 1.0 - 1e-6)
    enc_g = slot_grid_lookup(table, rescaled, gspec, num_levels=k)
    m = _mask(active, gspec)
    if m is not None:
        enc_g = enc_g * m
    x = jnp.concatenate([pos, PE.apply(pos)[:, 3:], enc_g], axis=-1)
    y, _ = fused_chain_adjoint(
        x, ws, bs, skip=(), activation="SoftplusQuad", beta=100.0, channel=0,
    )
    return y.astype(jnp.float32)[:, 0]


def fused_value(ws, bs, table, pos, active=None, k=None, gspec=GSPEC):
    mask = _mask(active, gspec)
    if mask is not None and k is not None:
        mask = mask[: k * gspec.features_per_level]
    return fused_slot_sdf_value(
        pos, table, ws, bs, gspec, radius=R,
        num_frequencies=PE.num_frequencies, min_freq_exp=PE.min_freq_exp,
        max_freq_exp=PE.max_freq_exp, skip=(), activation="SoftplusQuad",
        beta=100.0, level_mask=mask, num_levels=k, block=8,
    )


@pytest.mark.parametrize("gname", list(GSPECS), ids=list(GSPECS))
class TestFusedSlotValue:
    def test_forward_matches_composition(self, gname):
        gspec = GSPECS[gname]
        ws, bs, table, pos = _params(jax.random.key(1), gspec)
        s1 = fused_value(ws, bs, table, pos, gspec=gspec)
        assert _rel(s1, reference_value_f32(ws, bs, table, pos, gspec=gspec)) < (
            2e-2 if gspec.table_dtype == "bf16" else 6e-3
        )
        assert _rel(s1, reference_value(ws, bs, table, pos, gspec=gspec)) < 3e-3

    def test_forward_level_truncation_and_mask(self, gname):
        gspec = GSPECS[gname]
        ws, bs, table, pos = _params(jax.random.key(3), gspec)
        s1 = fused_value(ws, bs, table, pos, active=2, k=2, gspec=gspec)
        assert _rel(
            s1, reference_value(ws, bs, table, pos, active=2, k=2, gspec=gspec)
        ) < 3e-3
        # static truncation alone
        s1 = fused_value(ws, bs, table, pos, k=1, gspec=gspec)
        s2 = reference_value(ws, bs, table, pos, k=1, gspec=gspec)
        assert _rel(s1, s2) < 3e-3

    def test_grads_match_composition(self, gname):
        # cotangent fixed (loss linear in sdf): the kernel computes sdf in
        # bf16 while the jnp reference is f32, so a nonlinear loss would
        # amplify ~3e-3 value noise into the cotangents and swamp the
        # comparison; a fixed random weighting tests the whole backward
        # structure without that chaos
        gspec = GSPECS[gname]
        ws, bs, table, pos = _params(jax.random.key(5), gspec)
        c = jax.random.normal(jax.random.key(7), (pos.shape[0],))

        def loss(fn, ws, bs, table, pos):
            return jnp.sum(c * fn(ws, bs, table, pos, gspec=gspec))

        g1 = jax.grad(lambda *a: loss(fused_value, *a), argnums=(0, 1, 2, 3))(
            ws, bs, table, pos
        )
        g2 = jax.grad(lambda *a: loss(reference_value, *a), argnums=(0, 1, 2, 3))(
            ws, bs, table, pos
        )
        for i, name in enumerate(["d_ws", "d_bs", "d_table", "d_pos"]):
            r = _rel(
                jnp.concatenate([x.ravel() for x in jax.tree.leaves(g1[i])]),
                jnp.concatenate([x.ravel() for x in jax.tree.leaves(g2[i])]),
            )
            assert r < 2e-2, f"{name}: rel {r}"

    def test_split_backward_matches_merged(self, gname, monkeypatch):
        gspec = GSPECS[gname]
        ws, bs, table, pos = _params(jax.random.key(10), gspec)
        c = jax.random.normal(jax.random.key(11), (pos.shape[0],))

        def loss(ws, bs, table, pos):
            return jnp.sum(c * fused_value(ws, bs, table, pos, gspec=gspec))

        monkeypatch.delenv("MMS_SLOT_BWD_SPLIT", raising=False)
        g_m = jax.grad(loss, argnums=(0, 1, 2, 3))(ws, bs, table, pos)
        monkeypatch.setenv("MMS_SLOT_BWD_SPLIT", "1")
        g_s = jax.grad(loss, argnums=(0, 1, 2, 3))(ws, bs, table, pos)
        assert _rel(_cat(g_s[2]), _cat(g_m[2])) < 1e-5, "d_table"
        assert _rel(_cat(g_s[3]), _cat(g_m[3])) < 1e-5, "d_pos"
        assert _rel(_cat(g_s[0]), _cat(g_m[0])) < 2e-2, "d_ws"
        assert _rel(_cat(g_s[1]), _cat(g_m[1])) < 2e-2, "d_bs"

    def test_grads_with_mask_and_truncation(self, gname):
        gspec = GSPECS[gname]
        ws, bs, table, pos = _params(jax.random.key(6), gspec)

        c = jax.random.normal(jax.random.key(8), (pos.shape[0],))

        def loss(fn, ws, bs, table, pos):
            return jnp.sum(c * fn(ws, bs, table, pos, active=2, k=2, gspec=gspec))

        g1 = jax.grad(lambda *a: loss(fused_value, *a), argnums=(2, 3))(
            ws, bs, table, pos
        )
        g2 = jax.grad(lambda *a: loss(reference_value, *a), argnums=(2, 3))(
            ws, bs, table, pos
        )
        for i, name in enumerate(["d_table", "d_pos"]):
            r = _rel(g1[i], g2[i])
            assert r < 2e-2, f"{name}: rel {r}"
