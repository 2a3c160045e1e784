"""Slot-hash grid kernel (ops/pallas/slot_grid) vs a pure-XLA gather mirror.

Interpret mode on CPU (tests/conftest.py). Golden checks: forward features,
spatial tangents, and full gradients (table + positions, including the
second-order terms flowing through the tangent outputs) against XLA
autodiff of the gather-based mirror.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multimodalstudio_tpu.ops.pallas.slot_grid import (
    FEAT,
    LANE,
    NSLOT,
    SlotGridSpec,
    make_table_init,
    slot_geometry,
    slot_grid_lookup,
)

SPEC = SlotGridSpec(num_levels=3, min_res=4, max_res=16, rows_per_level=64)
SPEC_CELL = SlotGridSpec(
    num_levels=3, min_res=4, max_res=16, rows_per_level=64, layout="cell",
    gather="copy",
)
SPEC_CELL_OH = SlotGridSpec(
    num_levels=3, min_res=4, max_res=16, rows_per_level=64, layout="cell",
    gather="onehot",
)
# packed entries: feats < 16 packs 128/(8*feats) hash entries per physical
# row (the round-4 gather-FLOP cut); bf16: single-dot table mode
SPEC_PACKED2 = SlotGridSpec(
    num_levels=3, min_res=4, max_res=16, rows_per_level=64, layout="cell",
    gather="onehot", feats=2,
)
SPEC_PACKED4 = SlotGridSpec(
    num_levels=3, min_res=4, max_res=16, rows_per_level=64, layout="cell",
    gather="onehot", feats=4,
)


def reference_lookup(table, x, spec, num_levels=None):
    """Gather-based mirror of the slot-grid semantics (differentiable)."""
    k = min(num_levels, spec.num_levels) if num_levels is not None else spec.num_levels
    idx, w, _ = slot_geometry(x, spec, k)
    F = spec.feats
    pk = spec.entries_per_row
    if spec.layout == "cell" and pk > 1:
        # idx is the absolute ENTRY index: pk entries pack per physical row
        rows = table[idx // pk]  # [N, K, 128]
        grp = idx % pk  # [N, K] entry group within the row
    else:
        rows = table[idx]  # [N, K*8, 128] (vertex) | [N, K, 128] (cell)
        grp = None
    outs = []
    for l in range(k):
        feats = []
        for f in range(F):
            acc = 0.0
            for p in range(NSLOT):
                col = l * NSLOT + p
                row_col = l if spec.layout == "cell" else col
                if grp is None:
                    v = rows[:, row_col, f * NSLOT + p]
                else:
                    lanes = grp[:, l] * (NSLOT * F) + f * NSLOT + p  # [N]
                    v = jnp.take_along_axis(
                        rows[:, row_col, :], lanes[:, None], axis=1
                    )[:, 0]
                acc = acc + w[:, col] * v
            feats.append(acc)
        outs.append(jnp.stack(feats, axis=-1))
    enc = jnp.concatenate(outs, axis=-1)
    if k < spec.num_levels:
        enc = jnp.pad(enc, ((0, 0), (0, (spec.num_levels - k) * F)))
    return enc


def _setup(n=37, key=0, spec=SPEC):
    table = make_table_init(spec)(jax.random.key(key))
    # amplify so signals are O(1)
    table = table * 1e4
    x = jax.random.uniform(jax.random.key(key + 1), (n, 3), minval=0.01, maxval=0.97)
    return table, x


def _rel(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


import pytest


@pytest.mark.parametrize(
    "spec",
    [SPEC, SPEC_CELL, SPEC_CELL_OH, SPEC_PACKED2, SPEC_PACKED4],
    ids=["vertex", "cell", "cell_onehot", "packed_f2", "packed_f4"],
)
class TestSlotGridLayouts:
    def test_forward_matches_reference(self, spec):
        table, x = _setup(spec=spec)
        enc = slot_grid_lookup(table, x, spec)
        ref = reference_lookup(table, x, spec)
        np.testing.assert_allclose(np.asarray(enc), np.asarray(ref), atol=1e-5)

    def test_forward_truncated_levels(self, spec):
        table, x = _setup(key=3, spec=spec)
        enc = slot_grid_lookup(table, x, spec, num_levels=2)
        ref = reference_lookup(table, x, spec, num_levels=2)
        np.testing.assert_allclose(np.asarray(enc), np.asarray(ref), atol=1e-5)
        assert np.abs(np.asarray(enc)[:, 2 * spec.feats:]).max() == 0.0

    def test_tangents_match_jacfwd_of_reference(self, spec):
        table, x = _setup(key=5, spec=spec)
        enc, tenc = slot_grid_lookup(table, x, spec, with_tangents=True)
        ref = reference_lookup(table, x, spec)
        np.testing.assert_allclose(np.asarray(enc), np.asarray(ref), atol=1e-5)
        for k in range(3):
            e = jnp.zeros_like(x).at[:, k].set(1.0)
            _, t_ref = jax.jvp(lambda q: reference_lookup(table, q, spec), (x,), (e,))
            assert _rel(tenc[k], t_ref) < 1e-4, f"tangent {k}"

    def test_grads_match_reference_autodiff(self, spec):
        """Reverse mode through (enc, tenc): d table and d x, including the
        second-order smoothstep terms that the tangent outputs induce."""
        table, x = _setup(n=29, key=7, spec=spec)

        def loss_kernel(table, x):
            enc, tenc = slot_grid_lookup(table, x, spec, with_tangents=True)
            return jnp.sum(jnp.sin(enc)) + jnp.sum(jnp.cos(tenc))

        def loss_ref(table, x):
            enc = reference_lookup(table, x, spec)
            tangs = []
            for k in range(3):
                e = jnp.zeros_like(x).at[:, k].set(1.0)
                tangs.append(
                    jax.jvp(lambda q: reference_lookup(table, q, spec), (x,), (e,))[1]
                )
            tenc = jnp.stack(tangs)
            return jnp.sum(jnp.sin(enc)) + jnp.sum(jnp.cos(tenc))

        g1 = jax.grad(loss_kernel, argnums=(0, 1))(table, x)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(table, x)
        assert _rel(g1[0], g2[0]) < 1e-4, "d table"
        assert _rel(g1[1], g2[1]) < 1e-4, "d x"

    def test_grads_no_tangent_path(self, spec):
        table, x = _setup(n=21, key=9, spec=spec)

        def loss_kernel(table, x):
            return jnp.sum(jnp.sin(slot_grid_lookup(table, x, spec)))

        def loss_ref(table, x):
            return jnp.sum(jnp.sin(reference_lookup(table, x, spec)))

        g1 = jax.grad(loss_kernel, argnums=(0, 1))(table, x)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(table, x)
        assert _rel(g1[0], g2[0]) < 1e-4
        assert _rel(g1[1], g2[1]) < 1e-4


class TestSlotGrid:

    def test_production_spec_forward_and_grads(self):
        """Production-scale geometry (6 levels, 16..512, 2048 rows/level,
        cell+onehot) against the gather mirror — exercises
        hashed levels, level offsets and the bf16 hi/lo split at real
        table sizes (tiny N keeps interpret mode fast)."""
        spec = SlotGridSpec(
            num_levels=6, min_res=16, max_res=512, rows_per_level=2048,
            layout="cell",
        )
        assert spec.resolved_gather == "onehot"
        table, x = _setup(n=24, key=11, spec=spec)
        enc, tenc = slot_grid_lookup(table, x, spec, with_tangents=True, block=8)
        ref = reference_lookup(table, x, spec)
        np.testing.assert_allclose(np.asarray(enc), np.asarray(ref), atol=2e-4, rtol=2e-4)
        e = jnp.zeros_like(x).at[:, 1].set(1.0)
        _, t_ref = jax.jvp(lambda q: reference_lookup(table, q, spec), (x,), (e,))
        assert _rel(tenc[1], t_ref) < 1e-3

        def loss_kernel(t):
            enc, tenc = slot_grid_lookup(t, x, spec, with_tangents=True, block=8)
            return jnp.sum(jnp.sin(enc)) + jnp.sum(jnp.cos(tenc))

        def loss_ref(t):
            enc = reference_lookup(t, x, spec)
            tangs = [
                jax.jvp(
                    lambda q: reference_lookup(t, q, spec),
                    (x,),
                    (jnp.zeros_like(x).at[:, k].set(1.0),),
                )[1]
                for k in range(3)
            ]
            return jnp.sum(jnp.sin(enc)) + jnp.sum(jnp.cos(jnp.stack(tangs)))

        g1 = jax.grad(loss_kernel)(table)
        g2 = jax.grad(loss_ref)(table)
        # hi/lo-split one-hot scatter: ~2^-16 per value, accumulating to
        # ~1e-3 relative over the summed table gradient at this scale
        assert _rel(g1, g2) < 5e-3

    def test_onehot_matches_copy(self):
        """The one-hot MXU path is numerically equivalent to the exact f32
        copy path (hi/lo split against exact 0/1 matrices)."""
        table, x = _setup(n=53, key=13, spec=SPEC_CELL)
        enc_c, tenc_c = slot_grid_lookup(table, x, SPEC_CELL, with_tangents=True)
        enc_o, tenc_o = slot_grid_lookup(table, x, SPEC_CELL_OH, with_tangents=True)
        assert _rel(enc_o, enc_c) < 3e-5
        assert _rel(tenc_o, tenc_c) < 3e-5

        def loss(t, q, spec):
            enc, tenc = slot_grid_lookup(t, q, spec, with_tangents=True)
            return jnp.sum(jnp.sin(enc)) + jnp.sum(jnp.cos(tenc))

        gc = jax.grad(loss, argnums=(0, 1))(table, x, SPEC_CELL)
        go = jax.grad(loss, argnums=(0, 1))(table, x, SPEC_CELL_OH)
        assert _rel(go[0], gc[0]) < 3e-4
        assert _rel(go[1], gc[1]) < 3e-4

    def test_bf16_table_mode(self):
        """table_dtype='bf16' (single-dot, tcnn fp16-table parity): forward
        tracks the f32 reference at bf16 resolution; gradients stay
        directionally exact (the one-hot/S/P matrices are exact in bf16,
        only value rounding differs)."""
        spec = SlotGridSpec(
            num_levels=3, min_res=4, max_res=16, rows_per_level=64,
            layout="cell", gather="onehot", feats=2, table_dtype="bf16",
        )
        table, x = _setup(n=41, key=17, spec=spec)
        enc, tenc = slot_grid_lookup(table, x, spec, with_tangents=True)
        # reference with the table pre-rounded to bf16 (what the kernel sees)
        tb = table.astype(jnp.bfloat16).astype(jnp.float32)
        ref = reference_lookup(tb, x, spec)
        assert _rel(enc, ref) < 2e-2
        e = jnp.zeros_like(x).at[:, 0].set(1.0)
        _, t_ref = jax.jvp(lambda q: reference_lookup(tb, q, spec), (x,), (e,))
        assert _rel(tenc[0], t_ref) < 3e-2

        def loss_kernel(t, q):
            enc, tenc = slot_grid_lookup(t, q, spec, with_tangents=True)
            return jnp.sum(jnp.sin(enc)) + jnp.sum(jnp.cos(tenc))

        def loss_ref(t, q):
            enc = reference_lookup(t, q, spec)
            tangs = [
                jax.jvp(
                    lambda p: reference_lookup(t, p, spec),
                    (q,),
                    (jnp.zeros_like(q).at[:, k].set(1.0),),
                )[1]
                for k in range(3)
            ]
            return jnp.sum(jnp.sin(enc)) + jnp.sum(jnp.cos(jnp.stack(tangs)))

        g1 = jax.grad(loss_kernel, argnums=(0, 1))(table, x)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(tb, x)
        assert _rel(g1[0], g2[0]) < 5e-2
        assert _rel(g1[1], g2[1]) < 5e-2

    def test_vertex_sharing_continuity(self):
        """The same logical vertex reached from neighbouring cells maps to
        the same (row, slot): enc is continuous across cell borders."""
        table, _ = _setup()
        res = SPEC.resolutions[-1]
        # straddle a cell border at the finest level
        eps = 1e-4
        xa = jnp.array([[0.5 - eps, 0.3, 0.7]])
        xb = jnp.array([[0.5 + eps, 0.3, 0.7]])
        ea = slot_grid_lookup(table, xa, SPEC)
        eb = slot_grid_lookup(table, xb, SPEC)
        assert float(jnp.abs(ea - eb).max()) < 1e-2

    def test_model_slot_sdf_gradients(self):
        """grid_raw_tpu end to end: the fused slot-grid SDF gradient path
        (slot kernel tangents + fused MLP chain) agrees with reverse-mode
        autodiff of the flax apply path on values and spatial gradients."""
        import dataclasses as dc

        import jax

        from multimodalstudio_tpu.configs.methods import method_configs
        from multimodalstudio_tpu.models.model import MMSModel, ScheduleState

        cfg = method_configs()["grid_raw_tpu"]
        # shrink the grid for CPU interpret mode
        sf = cfg.model.surface.surface_field
        small = SlotGridSpec(
            num_levels=3, min_res=4, max_res=16, rows_per_level=64, layout="cell"
        )
        grid = dc.replace(sf.field.grid, encoding=small)
        surface = dc.replace(
            cfg.model.surface,
            surface_field=dc.replace(sf, field=dc.replace(sf.field, grid=grid)),
        )
        model = MMSModel(dc.replace(cfg.model, surface=surface))
        params = model.init(jax.random.key(0))
        sched = ScheduleState(
            cos_anneal_ratio=jnp.asarray(1.0),
            active_level=jnp.asarray(small.num_levels),
            numerical_delta=jnp.asarray(1e-3),
        )
        pos = jax.random.uniform(jax.random.key(1), (40, 3), minval=-0.7, maxval=0.7)

        sdf_f, geo_f, grad_f, hess_f = model.sdf_gradients(params, pos, sched, train=True)
        assert hess_f is not None  # curvature hessian proxy present

        sdf_r, geo_r = model.sdf_geo(params, pos, sched.active_level)
        np.testing.assert_allclose(
            np.asarray(sdf_f), np.asarray(sdf_r), atol=3e-2
        )
        assert _rel(geo_f, geo_r) < 0.05

        grad_ref = jax.grad(
            lambda p: jnp.sum(model.sdf_only(params, p, sched.active_level))
        )(pos)
        assert _rel(grad_f, grad_ref) < 0.08

    def test_curvature_tap_stride(self):
        """Strided curvature taps: hessians cover every stride-th sample and
        match the dense taps at those positions (unbiased subset of the
        reference's unweighted curvature mean, losses.py:143-150)."""
        import dataclasses as dc

        from multimodalstudio_tpu.configs.methods import method_configs
        from multimodalstudio_tpu.models.model import MMSModel, ScheduleState

        cfg = method_configs()["grid_raw_tpu"]
        sf = cfg.model.surface.surface_field
        small = SlotGridSpec(
            num_levels=3, min_res=4, max_res=16, rows_per_level=64, layout="cell"
        )
        grid = dc.replace(sf.field.grid, encoding=small)

        def make(stride):
            surface = dc.replace(
                cfg.model.surface,
                curvature_tap_stride=stride,
                # pin the 4-tap tetrahedron: the 2-tap estimator's rotating
                # direction is keyed on the strided sample index, so dense
                # and strided runs measure different directions at the same
                # position (both unbiased; this test checks STRIDE semantics)
                curvature_taps=4,
                surface_field=dc.replace(sf, field=dc.replace(sf.field, grid=grid)),
            )
            return MMSModel(dc.replace(cfg.model, surface=surface))

        m1, m4 = make(1), make(4)
        params = m1.init(jax.random.key(0))
        sched = ScheduleState(
            cos_anneal_ratio=jnp.asarray(1.0),
            active_level=jnp.asarray(small.num_levels),
            numerical_delta=jnp.asarray(1e-3),
        )
        pos = jax.random.uniform(jax.random.key(1), (6, 8, 3), minval=-0.7, maxval=0.7)
        *_, h1 = m1.sdf_gradients(params, pos, sched, train=True)
        *_, h4 = m4.sdf_gradients(params, pos, sched, train=True)
        assert h1.shape == (6, 8, 3) and h4.shape == (6, 2, 3)
        np.testing.assert_allclose(
            np.asarray(h4), np.asarray(h1[:, ::4]), rtol=1e-5, atol=1e-5
        )

    def test_curvature_two_tap_estimator(self):
        """2-tap antipodal estimator (flagship): on a quadratic SDF the
        4-sample cycle average equals the 4-tap tetrahedron's trace(H)/3
        exactly, and each sample measures k_j^T H k_j / 3."""
        from multimodalstudio_tpu.models.model import curvature_hessian_taps

        A = jnp.asarray(
            [[2.0, 0.3, -0.1], [0.3, -1.0, 0.5], [-0.1, 0.5, 4.0]]
        )

        def sdf_fn(q):  # exactly quadratic: hessian == A everywhere
            return 0.5 * jnp.einsum("...i,ij,...j->...", q, A, q)

        pos = jax.random.uniform(jax.random.key(3), (2, 8, 3), minval=-0.5, maxval=0.5)
        base = sdf_fn(pos)
        delta = 1e-2
        h4 = curvature_hessian_taps(sdf_fn, pos, base, delta, 4)
        h2 = curvature_hessian_taps(sdf_fn, pos, base, delta, 2)
        tr9 = float(jnp.trace(A)) / 9.0  # hxx = tr(H)/3, stacked / 3
        # 4-tap: trace(H)/9 per component, exactly (quadratic, no O(d^3))
        np.testing.assert_allclose(np.asarray(h4[..., 0]), tr9, rtol=5e-3)
        # 2-tap: k_j^T A k_j / 3 per sample j%4...
        k = np.asarray(
            [[1.0, -1.0, -1.0], [-1.0, -1.0, 1.0], [-1.0, 1.0, -1.0], [1.0, 1.0, 1.0]]
        )
        expected = np.asarray(
            [k[j % 4] @ np.asarray(A) @ k[j % 4] / 9.0 for j in range(8)]
        )
        np.testing.assert_allclose(
            np.asarray(h2[..., 0]), np.broadcast_to(expected, (2, 8)), rtol=5e-3
        )
        # ...and the 4-cycle average recovers trace(H)/3 = the 4-tap value
        np.testing.assert_allclose(
            float(h2[..., 0].mean()), tr9, rtol=5e-3
        )
        # all three axis slots carry the shared proxy, like the 4-tap form
        np.testing.assert_allclose(np.asarray(h2[..., 1]), np.asarray(h2[..., 0]))

    def test_dense_vs_hashed_levels(self):
        rows = SPEC.level_rows
        gdims = SPEC.resolutions // 2 + 1
        for l in range(SPEC.num_levels):
            if gdims[l] ** 3 <= SPEC.rows_per_level:
                assert rows[l] == gdims[l] ** 3
            else:
                assert rows[l] == SPEC.rows_per_level
