"""Unit tests for math ops: lie groups, distortion, polarization, SH,
contraction, encodings. The reference has no tests (SURVEY §4); the expected
values here are independent numpy implementations of the documented math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodalstudio_tpu.ops import distortion, lie_groups, polarization
from multimodalstudio_tpu.ops.encodings import (
    HashGridSpec,
    hash_grid_lookup,
    nerf_encoding,
    sh_encoding,
)
from multimodalstudio_tpu.ops.math import (
    components_from_spherical_harmonics,
    psnr,
    scene_contraction,
    ssim,
)


class TestLieGroups:
    def test_zero_tangent_is_identity(self):
        t = jnp.zeros((4, 6))
        for exp in (lie_groups.exp_map_SO3xR3, lie_groups.exp_map_SE3):
            mat = exp(t)
            np.testing.assert_allclose(mat[:, :3, :3], np.eye(3)[None].repeat(4, 0), atol=1e-5)
            np.testing.assert_allclose(mat[:, :, 3], 0.0, atol=1e-5)

    def test_so3_rotation_angle(self):
        # rotation of pi/2 about z
        t = jnp.asarray([[0, 0, 0, 0, 0, np.pi / 2]])
        mat = lie_groups.exp_map_SO3xR3(t)[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(mat[:3, :3], expected, atol=1e-5)

    def test_so3xr3_translation_passthrough(self):
        t = jnp.asarray([[1.0, 2.0, 3.0, 0.1, -0.2, 0.3]])
        mat = lie_groups.exp_map_SO3xR3(t)[0]
        np.testing.assert_allclose(mat[:, 3], [1.0, 2.0, 3.0], atol=1e-6)

    def test_se3_matches_so3_for_small_translation_coupling(self):
        rng = np.random.default_rng(0)
        t = jnp.asarray(rng.normal(size=(8, 6)) * 0.1)
        se3 = lie_groups.exp_map_SE3(t)
        so3 = lie_groups.exp_map_SO3xR3(t)
        np.testing.assert_allclose(se3[:, :3, :3], so3[:, :3, :3], atol=1e-4)

    def test_se3_screw_motion(self):
        # pure rotation: translation should be zero
        t = jnp.asarray([[0, 0, 0, 0.3, 0.1, -0.2]])
        mat = lie_groups.exp_map_SE3(t)[0]
        r = np.asarray(mat[:3, :3])
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(mat[:, 3], 0.0, atol=1e-6)

    def test_pose_multiply(self):
        rng = np.random.default_rng(1)
        a = lie_groups.exp_map_SE3(jnp.asarray(rng.normal(size=(1, 6)) * 0.2))
        b = lie_groups.exp_map_SE3(jnp.asarray(rng.normal(size=(1, 6)) * 0.2))
        ab = lie_groups.pose_multiply(a, b)[0]
        a4 = np.vstack([np.asarray(a[0]), [0, 0, 0, 1]])
        b4 = np.vstack([np.asarray(b[0]), [0, 0, 0, 1]])
        np.testing.assert_allclose(ab, (a4 @ b4)[:3], atol=1e-5)


class TestDistortion:
    def test_undistort_inverts_distort(self):
        rng = np.random.default_rng(2)
        coords = jnp.asarray(rng.uniform(-0.3, 0.3, size=(64, 2)).astype(np.float32))
        params = jnp.asarray([0.05, -0.01, 0.001, 0.0, 0.002, -0.001])
        params_b = jnp.broadcast_to(params, (64, 6))
        distorted = distortion.distort(coords, params_b)
        recovered = distortion.radial_and_tangential_undistort(distorted, params_b)
        np.testing.assert_allclose(recovered, coords, atol=1e-5)

    def test_zero_distortion_identity(self):
        coords = jnp.asarray([[0.1, -0.2], [0.0, 0.0]])
        params = jnp.zeros((2, 6))
        out = distortion.radial_and_tangential_undistort(coords, params)
        np.testing.assert_allclose(out, coords, atol=1e-6)


class TestPolarization:
    def test_stokes_to_intensity_unpolarized(self):
        stokes = jnp.asarray([[1.0, 0.0, 0.0]])
        chans, coeffs = polarization.stokes_to_intensity(stokes)
        np.testing.assert_allclose(chans, 0.5, atol=1e-6)
        np.testing.assert_allclose(coeffs, 0.5, atol=1e-5)

    def test_dop_aop_roundtrip(self):
        # fully polarized at 30 degrees
        theta = np.pi / 6
        stokes = jnp.asarray([[1.0, np.cos(2 * theta), np.sin(2 * theta)]])
        chans, _ = polarization.stokes_to_intensity(stokes)
        dop = polarization.to_dop(data=chans)
        aop = polarization.to_aop(data=chans)
        np.testing.assert_allclose(dop, 1.0, atol=1e-5)
        np.testing.assert_allclose(aop, theta, atol=1e-5)

    def test_mueller_rotate_preserves_s0_and_dop(self):
        stokes = jnp.asarray([[0.8, 0.3, -0.2]])
        rotated = polarization.mueller_rotate(jnp.asarray([0.7])) @ stokes[..., None]
        rotated = rotated[..., 0]
        np.testing.assert_allclose(rotated[:, 0], stokes[:, 0], atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(rotated[:, 1:]), np.linalg.norm(stokes[:, 1:]), atol=1e-5
        )

    def test_align_rotation_only(self):
        dirs = jnp.asarray([[1.0, 0.0, 0.0]])
        ups = jnp.asarray([[0.0, 0.0, 1.0]])
        stokes = jnp.asarray([[1.0, 0.5, 0.0]])
        aligned = polarization.align_polarization_filters(stokes, dirs, ups)
        np.testing.assert_allclose(aligned[:, 0], 1.0, atol=1e-5)


class TestSphericalHarmonics:
    def test_l0_constant(self):
        dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        sh = components_from_spherical_harmonics(1, dirs)
        np.testing.assert_allclose(sh, 0.28209479, atol=1e-6)

    def test_orthonormality_montecarlo(self):
        # integral over sphere of Y_i * Y_j ~ delta_ij
        rng = np.random.default_rng(3)
        v = rng.normal(size=(20000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        sh = np.asarray(components_from_spherical_harmonics(4, jnp.asarray(v)))
        gram = sh.T @ sh / v.shape[0] * 4 * np.pi
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)

    def test_sh_encoding_degree(self):
        dirs = jnp.asarray([[0.0, 1.0, 0.0]])
        assert sh_encoding(dirs, 4).shape == (1, 25)


class TestNeRFEncoding:
    def test_shapes_and_values(self):
        x = jnp.asarray([[0.5, -0.5, 0.25]])
        out = nerf_encoding(x, 2, 0.0, 1.0, include_input=True)
        assert out.shape == (1, 3 + 3 * 2 * 2)
        np.testing.assert_allclose(out[0, :3], x[0], atol=1e-6)
        # first frequency block: sin(x * 2^0)
        np.testing.assert_allclose(out[0, 3], np.sin(0.5), atol=1e-6)
        # cos block (sin(x + pi/2))
        np.testing.assert_allclose(out[0, 9], np.cos(0.5), atol=1e-6)


class TestSceneContraction:
    def test_identity_inside(self):
        x = jnp.asarray([[0.5, 0.0, 0.0]])
        np.testing.assert_allclose(scene_contraction(x, None), x, atol=1e-6)

    def test_l2_contracts_to_radius_2(self):
        x = jnp.asarray([[100.0, 0.0, 0.0]])
        out = scene_contraction(x, None)
        np.testing.assert_allclose(out, [[1.99, 0.0, 0.0]], atol=1e-6)

    def test_linf_cube(self):
        x = jnp.asarray([[0.0, 0.0, 1000.0]])
        out = scene_contraction(x, float("inf"))
        assert abs(float(out[0, 2]) - 2.0) < 1e-2


def _numpy_hash_reference(table, x, spec):
    """Independent numpy mirror of the hash-grid semantics (linear interp
    variant mirrors reference encodings.py:263-304)."""
    res = spec.resolutions
    outs = []
    for level in range(spec.num_levels):
        scaled = np.asarray(x) * res[level]
        f = np.floor(scaled).astype(np.int64)
        off = scaled - f
        feats = np.zeros((x.shape[0], spec.features_per_level))
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    corner = f + np.array([cx, cy, cz])
                    cu = corner.astype(np.uint32)
                    if (res[level] + 1) ** 3 <= spec.table_size:
                        idx = cu[:, 0] + cu[:, 1] * (res[level] + 1) + cu[:, 2] * (res[level] + 1) ** 2
                    else:
                        idx = (
                            cu[:, 0] * np.uint32(1)
                            ^ cu[:, 1] * np.uint32(2654435761)
                            ^ cu[:, 2] * np.uint32(805459861)
                        ) & np.uint32(spec.table_size - 1)
                    w = off * off * (3 - 2 * off) if spec.interpolation == "Smoothstep" else off
                    weight = (
                        (w[:, 0] if cx else 1 - w[:, 0])
                        * (w[:, 1] if cy else 1 - w[:, 1])
                        * (w[:, 2] if cz else 1 - w[:, 2])
                    )
                    feats += weight[:, None] * np.asarray(table)[idx + level * spec.table_size]
        outs.append(feats)
    return np.concatenate(outs, axis=-1)


class TestHashGrid:
    def test_matches_numpy_reference(self):
        spec = HashGridSpec(num_levels=4, min_res=4, max_res=64, log2_hashmap_size=9)
        table = jax.random.normal(jax.random.key(0), (4 * spec.table_size, 2))
        x = jax.random.uniform(jax.random.key(1), (50, 3))
        out = hash_grid_lookup(table, x, spec)
        ref = _numpy_hash_reference(table, x, spec)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_custom_vjp_matches_autodiff(self):
        from multimodalstudio_tpu.ops import encodings as E

        spec = HashGridSpec(num_levels=3, min_res=4, max_res=32, log2_hashmap_size=8)
        table = jax.random.normal(jax.random.key(0), (3 * spec.table_size, 2)) * 0.01
        x = jax.random.uniform(jax.random.key(1), (40, 3))
        f1 = lambda t, p: jnp.sum(jnp.sin(hash_grid_lookup(t, p, spec) * 3))
        f2 = lambda t, p: jnp.sum(jnp.sin(E._hash_lookup_impl(t, p, spec) * 3))
        g1 = jax.grad(f1, argnums=(0, 1))(table, x)
        g2 = jax.grad(f2, argnums=(0, 1))(table, x)
        np.testing.assert_allclose(g1[0], g2[0], atol=1e-5)
        np.testing.assert_allclose(g1[1], g2[1], atol=1e-4)

    def test_gather_modes_agree(self):
        """'rows' (one [M,F] row take) and 'flat' (per-feature 1-D takes)
        formulations are numerically identical, values and grads."""
        import dataclasses as dc

        base = HashGridSpec(num_levels=3, min_res=4, max_res=32, log2_hashmap_size=8)
        table = jax.random.normal(jax.random.key(0), (3 * base.table_size, 2)) * 0.01
        x = jax.random.uniform(jax.random.key(1), (40, 3))
        outs, grads = [], []
        for mode in ("rows", "flat"):
            spec = dc.replace(base, gather_mode=mode)
            outs.append(hash_grid_lookup(table, x, spec))
            f = lambda t, p, s=spec: jnp.sum(jnp.cos(hash_grid_lookup(t, p, s)))
            grads.append(jax.grad(f, argnums=(0, 1))(table, x))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
        np.testing.assert_allclose(grads[0][0], grads[1][0], atol=1e-6)
        np.testing.assert_allclose(grads[0][1], grads[1][1], atol=1e-5)

    def test_smoothstep_is_c1_at_cell_boundary(self):
        spec = HashGridSpec(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=8)
        table = jax.random.normal(jax.random.key(0), (2 * spec.table_size, 2)) * 0.01
        g = jax.grad(lambda p: jnp.sum(hash_grid_lookup(table, p[None], spec)))
        eps = 1e-5
        boundary = jnp.asarray([0.25, 0.3, 0.4])  # x=0.25*4=1.0 cell edge
        g_lo = g(boundary - eps)
        g_hi = g(boundary + eps)
        # gradient continuous across the cell edge (up to local curvature * eps)
        np.testing.assert_allclose(g_lo, g_hi, atol=2e-4)


class TestImageMetrics:
    def test_psnr_identical(self):
        img = jnp.ones((8, 8, 3)) * 0.5
        assert float(psnr(img, img)) > 100

    def test_ssim_identical(self):
        img = jax.random.uniform(jax.random.key(0), (32, 32, 3))
        np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-5)

    def test_ssim_degrades_with_noise(self):
        img = jax.random.uniform(jax.random.key(0), (32, 32, 3))
        noisy = jnp.clip(img + 0.2 * jax.random.normal(jax.random.key(1), img.shape), 0, 1)
        assert float(ssim(img, noisy)) < 0.9

    def test_masked_ssim_full_image_protocol(self):
        # reference protocol (evaluate_average_metrics.py:154-168): SSIM over
        # the FULL images, map averaged over the mask. If the images agree
        # inside the mask but differ outside, masked_ssim must be < 1 only
        # through window bleed near the border — while zero-then-SSIM would
        # score the pair differently. Check mask=None == plain mean, and that
        # in-mask-identical images score near 1 even with garbage outside.
        from multimodalstudio_tpu.ops.math import masked_ssim, ssim_map

        img = jax.random.uniform(jax.random.key(2), (40, 40, 1))
        other = img.at[:10].set(0.0)  # differs only in the top strip
        mask = jnp.zeros((40, 40, 1)).at[20:].set(1.0)  # bottom half
        val = float(masked_ssim(img, other, mask))
        np.testing.assert_allclose(val, 1.0, atol=1e-5)
        np.testing.assert_allclose(
            float(masked_ssim(img, other, None)),
            float(jnp.mean(ssim_map(img, other))),
            atol=1e-6,
        )


def test_neus_s_density_formula():
    # phi_s(x) = s e^{-sx} / (1 + e^{-sx})^2: the derivative of the
    # logistic sigmoid(s x) — checked against numerical differentiation
    # (reference volume_rendering.py:101-112)
    from multimodalstudio_tpu.models.volume_rendering import neus_s_density

    s = 12.0
    x = jnp.linspace(-0.5, 0.5, 101)
    sig = lambda v: 1.0 / (1.0 + jnp.exp(-s * v))
    eps = 1e-4
    numeric = (sig(x + eps) - sig(x - eps)) / (2 * eps)
    np.testing.assert_allclose(
        np.asarray(neus_s_density(x, s)), np.asarray(numeric), rtol=2e-2
    )
