"""Fused Pallas MLP chain (ops/pallas/fused_mlp) vs the XLA layer loop.

Runs in interpreter mode on CPU (tests/conftest.py). Golden checks:
forward/JVP equality against the bf16 reference mirror, gradient agreement
(incl. the second-order act'' terms the grad-of-jacfwd backward needs), and
end-to-end equivalence of MMSModel.sdf_gradients between the fused path and
the vmap(jacfwd) path.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodalstudio_tpu.ops.pallas.fused_mlp import chain_reference, fused_chain


def _make_chain(key, L=4, H=128, d_in=39, d_out=129, skip=(2,)):
    ks = jax.random.split(key, 2 * L)
    ws, bs = [], []
    din = d_in
    for l in range(L):
        if l in skip:
            din = H + d_in
        dout = d_out if l == L - 1 else H
        ws.append(jax.random.normal(ks[l], (din, dout)) * (1.0 / np.sqrt(din)))
        bs.append(jax.random.normal(ks[L + l], (dout,)) * 0.01)
        din = H
    return ws, bs


@pytest.mark.parametrize("activation", ["ReLU", "SoftplusQuad"])
def test_forward_matches_reference(activation):
    ws, bs = _make_chain(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (300, 39))
    kw = dict(skip=(2,), activation=activation, beta=100.0)
    y = fused_chain(x, ws, bs, **kw)
    y_ref = chain_reference(x, ws, bs, **kw)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), atol=2e-2
    )


def test_jvp_matches_reference():
    ws, bs = _make_chain(jax.random.key(2))
    n = 200
    x = jax.random.normal(jax.random.key(3), (n, 39))
    tx = jax.random.normal(jax.random.key(4), (3, n, 39))
    kw = dict(skip=(2,), activation="SoftplusQuad", beta=100.0)
    y, ty = fused_chain(x, ws, bs, tangents=tx, **kw)
    y_ref, ty_ref = chain_reference(x, ws, bs, tangents=tx, **kw)
    np.testing.assert_allclose(
        np.asarray(ty, np.float32), np.asarray(ty_ref, np.float32), atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), atol=2e-2
    )


def _rel(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_grads_match_reference_autodiff():
    """custom_vjp backward (incl. sigma'' second-order terms) vs XLA
    autodiff of the mirrored math: agreement within bf16 rounding noise."""
    ws, bs = _make_chain(jax.random.key(5))
    n = 160
    x = jax.random.normal(jax.random.key(6), (n, 39))
    tx = jax.random.normal(jax.random.key(7), (3, n, 39))
    kw = dict(skip=(2,), activation="SoftplusQuad", beta=100.0)

    def loss(fn, x, tx, ws, bs):
        y, ty = fn(x, list(ws), list(bs), tangents=tx, **kw)
        return (
            jnp.sum(jnp.sin(y.astype(jnp.float32)))
            + jnp.sum(jnp.cos(ty.astype(jnp.float32)))
        )

    g1 = jax.grad(lambda *a: loss(fused_chain, *a), argnums=(0, 1, 2, 3))(
        x, tx, tuple(ws), tuple(bs)
    )
    g2 = jax.grad(lambda *a: loss(chain_reference, *a), argnums=(0, 1, 2, 3))(
        x, tx, tuple(ws), tuple(bs)
    )
    assert _rel(g1[0], g2[0]) < 0.08  # gx
    assert _rel(g1[1], g2[1]) < 0.08  # gtx
    for l in range(len(ws)):
        assert _rel(g1[2][l], g2[2][l]) < 0.08, f"gW{l}"
        assert _rel(g1[3][l], g2[3][l]) < 0.08, f"gb{l}"


def test_k0_grads_match():
    ws, bs = _make_chain(jax.random.key(8), d_in=60, d_out=128)
    x = jax.random.normal(jax.random.key(9), (100, 60))
    kw = dict(skip=(2,), activation="ReLU")

    def loss(fn, x, ws, bs):
        return jnp.sum(jnp.sin(fn(x, list(ws), list(bs), **kw).astype(jnp.float32)))

    g1 = jax.grad(lambda *a: loss(fused_chain, *a), argnums=(0, 1, 2))(
        x, tuple(ws), tuple(bs)
    )
    g2 = jax.grad(lambda *a: loss(chain_reference, *a), argnums=(0, 1, 2))(
        x, tuple(ws), tuple(bs)
    )
    assert _rel(g1[0], g2[0]) < 0.05
    for l in range(len(ws)):
        assert _rel(g1[1][l], g2[1][l]) < 0.05
        assert _rel(g1[2][l], g2[2][l]) < 0.05


@pytest.mark.parametrize("mode", ["jvp", "adjoint"])
def test_fused_sdf_chain_grads_match_reference(mode):
    """jax.grad THROUGH fused_sdf_chain (the enc+sdf_split custom-vjp path
    the mlp_raw_tpu training step uses) vs XLA autodiff of
    nerf_encoding + jvp + chain_reference (ADVICE r2 item 3). The adjoint
    mode additionally validates the hand-derived reverse-over-reverse
    backward (q-chain weight terms + act'' injections + enc'' terms)."""
    from multimodalstudio_tpu.ops.encodings import nerf_encoding
    from multimodalstudio_tpu.ops.pallas.fused_mlp import fused_sdf_chain

    F, mn, mx = 6, 0.0, 5.0
    d_in = 3 + 6 * F
    ws, bs = _make_chain(jax.random.key(10), L=4, H=128, d_in=d_in, d_out=129)
    pos = jax.random.uniform(jax.random.key(11), (96, 3), minval=-0.9, maxval=0.9)
    kw = dict(skip=(2,), activation="SoftplusQuad", beta=100.0)

    def loss_fused(pos, ws, bs):
        sdf, geo, grad = fused_sdf_chain(
            pos, list(ws), list(bs), num_frequencies=F, min_freq_exp=mn,
            max_freq_exp=mx, mode=mode, **kw,
        )
        return (
            jnp.sum(jnp.sin(sdf))
            + jnp.sum(jnp.cos(geo.astype(jnp.float32)))
            + jnp.sum(jnp.sin(2.0 * grad))
        )

    def loss_ref(pos, ws, bs):
        enc_fn = lambda p: nerf_encoding(p, F, mn, mx, include_input=True)
        enc = enc_fn(pos)
        eye = jnp.eye(3)
        tenc = jnp.stack(
            [jax.jvp(enc_fn, (pos,), (jnp.broadcast_to(eye[k], pos.shape),))[1]
             for k in range(3)]
        )
        y, ty = chain_reference(enc, list(ws), list(bs), tangents=tenc, **kw)
        sdf = y[:, 0].astype(jnp.float32)
        geo = y[:, 1:]
        grad = ty[:, :, 0].T.astype(jnp.float32)
        return (
            jnp.sum(jnp.sin(sdf))
            + jnp.sum(jnp.cos(geo.astype(jnp.float32)))
            + jnp.sum(jnp.sin(2.0 * grad))
        )

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(pos, tuple(ws), tuple(bs))
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(pos, tuple(ws), tuple(bs))
    assert _rel(g1[0], g2[0]) < 0.08  # d/d positions (through enc'' terms)
    for l in range(len(ws)):
        assert _rel(g1[1][l], g2[1][l]) < 0.08, f"gW{l}"
        assert _rel(g1[2][l], g2[2][l]) < 0.08, f"gb{l}"


def test_tangent_out_channel_grads_match_reference():
    """jax.grad through fused_chain(tangent_out_channel=0) — the sparse
    last-layer tangent cotangent scatter path (ADVICE r2 item 3)."""
    ws, bs = _make_chain(jax.random.key(12), L=3, H=128, d_in=39, d_out=129, skip=())
    n = 120
    x = jax.random.normal(jax.random.key(13), (n, 39))
    tx = jax.random.normal(jax.random.key(14), (3, n, 39))
    kw = dict(skip=(), activation="SoftplusQuad", beta=100.0)

    def loss_fused(x, tx, ws, bs):
        y, g = fused_chain(
            x, list(ws), list(bs), tangents=tx, tangent_out_channel=0, **kw
        )
        return jnp.sum(jnp.sin(y.astype(jnp.float32))) + jnp.sum(jnp.cos(g))

    def loss_ref(x, tx, ws, bs):
        y, ty = chain_reference(x, list(ws), list(bs), tangents=tx, **kw)
        g = ty[:, :, 0].T.astype(jnp.float32)
        return jnp.sum(jnp.sin(y.astype(jnp.float32))) + jnp.sum(jnp.cos(g))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, tx, tuple(ws), tuple(bs))
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, tx, tuple(ws), tuple(bs))
    assert _rel(g1[0], g2[0]) < 0.08
    assert _rel(g1[1], g2[1]) < 0.08
    for l in range(len(ws)):
        assert _rel(g1[2][l], g2[2][l]) < 0.08, f"gW{l}"
        assert _rel(g1[3][l], g2[3][l]) < 0.08, f"gb{l}"


def test_sdf_gradients_fused_matches_jacfwd():
    """MMSModel.sdf_gradients: fused path vs vmap(jacfwd) path end to end."""
    from multimodalstudio_tpu.configs.methods import method_configs
    from multimodalstudio_tpu.models.model import MMSModel, ScheduleState

    cfg = method_configs()["mlp_raw_tpu"]
    model = MMSModel(cfg.model)
    params = model.init(jax.random.key(0))
    sched = ScheduleState(
        cos_anneal_ratio=jnp.asarray(0.5),
        active_level=jnp.asarray(1),
        numerical_delta=jnp.asarray(1e-3),
    )

    def unfuse(spec):
        def walk(obj):
            import dataclasses as dc
            from multimodalstudio_tpu.fields.mlp import MLPSpec

            if isinstance(obj, MLPSpec):
                return dc.replace(obj, fused=False)
            if dc.is_dataclass(obj) and not isinstance(obj, type):
                return dc.replace(
                    obj, **{f.name: walk(getattr(obj, f.name)) for f in dc.fields(obj)}
                )
            if isinstance(obj, tuple):
                return tuple(walk(v) for v in obj)
            return obj

        return walk(spec)

    model_ref = MMSModel(unfuse(cfg.model))
    pos = jax.random.uniform(jax.random.key(1), (64, 3), minval=-0.8, maxval=0.8)
    sdf_f, geo_f, grad_f, _ = model.sdf_gradients(params, pos, sched, train=True)
    sdf_r, geo_r, grad_r, _ = model_ref.sdf_gradients(params, pos, sched, train=True)
    np.testing.assert_allclose(np.asarray(sdf_f), np.asarray(sdf_r), atol=3e-2)
    assert _rel(grad_f, grad_r) < 0.05
    assert _rel(geo_f, geo_r) < 0.05


def test_fused_chain_adjoint_matches_jvp():
    """fused_chain_adjoint (one reverse sweep) vs fused_chain with basis
    tangents: y identical, adj[:, j] == d y_c/d x_j, and outer gradients
    through (y, adj) agree with XLA autodiff of the reference mirror."""
    from multimodalstudio_tpu.ops.pallas.fused_mlp import fused_chain_adjoint

    ws, bs = _make_chain(jax.random.key(20), L=4, H=128, d_in=50, d_out=129)
    x = jax.random.normal(jax.random.key(21), (64, 50)) * 0.5
    kw = dict(skip=(2,), activation="SoftplusQuad", beta=100.0)

    y_a, adj = fused_chain_adjoint(x, list(ws), list(bs), channel=0, **kw)
    eye = jnp.eye(50)
    tx = jnp.broadcast_to(eye[:3][:, None, :], (3, 64, 50))
    y_j, ty = fused_chain(x, list(ws), list(bs), tangents=tx, **kw)
    np.testing.assert_allclose(
        np.asarray(y_a, np.float32), np.asarray(y_j, np.float32), atol=1e-5
    )
    assert _rel(adj[:, :3], ty[:, :, 0].T) < 0.05

    def loss_adj(x, ws, bs):
        y, adj = fused_chain_adjoint(x, list(ws), list(bs), channel=0, **kw)
        return jnp.sum(jnp.sin(y.astype(jnp.float32))) + jnp.sum(jnp.cos(2.0 * adj))

    def loss_ref(x, ws, bs):
        y = chain_reference(x, list(ws), list(bs), **kw)
        adj = jax.grad(
            lambda q: jnp.sum(
                chain_reference(q, list(ws), list(bs), **kw)[:, 0].astype(jnp.float32)
            )
        )(x)
        return jnp.sum(jnp.sin(y.astype(jnp.float32))) + jnp.sum(jnp.cos(2.0 * adj))

    g1 = jax.grad(loss_adj, argnums=(0, 1, 2))(x, tuple(ws), tuple(bs))
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, tuple(ws), tuple(bs))
    assert _rel(g1[0], g2[0]) < 0.08  # gx
    for l in range(len(ws)):
        assert _rel(g1[1][l], g2[1][l]) < 0.08, f"gW{l}"
        assert _rel(g1[2][l], g2[2][l]) < 0.08, f"gb{l}"
