"""Unit tests for rendering math: samplers, colliders, volume rendering,
weights, schedules, MLP init semantics."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodalstudio_tpu.core.rays import (
    RayBundle,
    alphas_from_densities,
    weights_from_alphas,
    weights_from_densities,
)
from multimodalstudio_tpu.engine import schedules as sched
from multimodalstudio_tpu.fields.components import FeatureGridSpec
from multimodalstudio_tpu.fields.mlp import MLP, MLPSpec, finalize_weight_norm
from multimodalstudio_tpu.models import samplers as S
from multimodalstudio_tpu.models.colliders import background_bounds, sphere_collide
from multimodalstudio_tpu.models.volume_rendering import neus_alphas
from multimodalstudio_tpu.ops.encodings import HashGridSpec


def make_rays(n=8, origin_dist=3.0):
    origins = np.zeros((n, 3))
    origins[:, 0] = origin_dist
    dirs = np.zeros((n, 3))
    dirs[:, 0] = -1.0
    return RayBundle(
        origins=jnp.asarray(origins, jnp.float32),
        directions=jnp.asarray(dirs, jnp.float32),
        up_directions=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        pixel_area=jnp.ones((n, 1)),
        camera_indices=jnp.zeros((n,), jnp.int32),
        directions_norm=jnp.ones((n, 1)),
    )


class TestCollider:
    def test_sphere_hit_near_far(self):
        rays, mask = sphere_collide(make_rays(4, 3.0), radius=1.0)
        np.testing.assert_allclose(mask, 1.0)
        np.testing.assert_allclose(rays.nears[:, 0], 2.0, atol=1e-5)
        np.testing.assert_allclose(rays.fars[:, 0], 4.0, atol=1e-5)

    def test_miss_gets_masked_and_clamped(self):
        bundle = make_rays(2, 3.0)
        bundle = bundle.replace(directions=jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (2, 1)))
        rays, mask = sphere_collide(bundle, radius=1.0)
        np.testing.assert_allclose(mask, 0.0)
        assert float(rays.nears.min()) >= 0.0099

    def test_background_bounds(self):
        bundle = make_rays(2, 3.0)
        _, mask = sphere_collide(bundle, 1.0)
        bg = background_bounds(bundle, mask, 1.0)
        np.testing.assert_allclose(bg.nears[:, 0], 4.0, atol=1e-5)  # = far of ROI
        np.testing.assert_allclose(bg.fars[:, 0], 7.0, atol=1e-5)  # far + 3


class TestSpacedSampler:
    def test_uniform_eval_bins(self):
        rays, _ = sphere_collide(make_rays(3), 1.0)
        s = S.spaced_sampling(rays, S.SpacedSamplerSpec(num_samples=4), None, train=False)
        np.testing.assert_allclose(s.starts[0], [2.0, 2.5, 3.0, 3.5], atol=1e-5)
        np.testing.assert_allclose(s.deltas, 0.5, atol=1e-5)

    def test_stratified_within_bins(self):
        rays, _ = sphere_collide(make_rays(100), 1.0)
        s = S.spaced_sampling(
            rays,
            S.SpacedSamplerSpec(num_samples=16, single_jitter=False),
            jax.random.key(0),
            train=True,
        )
        assert float(jnp.min(s.deltas)) > 0  # bins stay sorted
        assert float(jnp.std(s.starts[:, 0])) > 0  # actually jittered

    def test_lin_disparity_spacing(self):
        rays = make_rays(2).replace(nears=jnp.full((2, 1), 1.0), fars=jnp.full((2, 1), 4.0))
        s = S.spaced_sampling(
            rays, S.SpacedSamplerSpec(num_samples=3, spacing="lin_disparity"), None, False
        )
        # uniform in 1/x: edges 1/(1 - x*(1-1/4))
        expected = 1.0 / (1.0 - np.array([0, 1 / 3, 2 / 3]) * 0.75)
        np.testing.assert_allclose(s.starts[0], expected, atol=1e-5)


class TestPDFSampler:
    def test_uniform_weights_give_uniform_bins(self):
        bins = jnp.tile(jnp.linspace(0, 1, 9)[None], (4, 1))
        weights = jnp.ones((4, 8))
        new = S.pdf_sample_bins(bins, weights, 8, None, train=False)
        np.testing.assert_allclose(new[0], np.linspace(1 / 18, 1 - 1 / 18, 9), atol=1e-4)

    def test_concentrated_weights(self):
        bins = jnp.tile(jnp.linspace(0, 1, 9)[None], (1, 1))
        weights = jnp.zeros((1, 8)).at[0, 3].set(1.0)
        new = S.pdf_sample_bins(bins, weights, 8, None, train=False, histogram_padding=0.0)
        inside = jnp.mean(((new >= 3 / 8 - 1e-3) & (new <= 4 / 8 + 1e-3)).astype(jnp.float32))
        assert float(inside) > 0.9

    def test_output_sorted(self):
        bins = jnp.tile(jnp.linspace(0, 1, 17)[None], (8, 1))
        weights = jax.random.uniform(jax.random.key(0), (8, 16))
        new = S.pdf_sample_bins(bins, weights, 8, jax.random.key(1), train=True)
        assert bool(jnp.all(jnp.diff(new, axis=-1) >= -1e-6))


class TestNeuSSampler:
    def test_sample_counts_and_sorting(self):
        rays, _ = sphere_collide(make_rays(6), 1.0)
        spec = S.NeuSSamplerSpec(num_samples=8, num_samples_importance=8, num_upsample_steps=4)
        sdf_fn = lambda pos: jnp.linalg.norm(pos, axis=-1) - 0.5
        s = S.neus_sampling(rays, sdf_fn, spec, jax.random.key(0), train=True)
        assert s.num_samples == 16  # 8 + 8
        assert bool(jnp.all(s.deltas >= -1e-6))
        assert bool(jnp.all(jnp.diff(s.spacing_starts, axis=-1) >= -1e-6))

    def test_importance_concentrates_near_surface(self):
        rays, _ = sphere_collide(make_rays(16), 1.0)
        spec = S.NeuSSamplerSpec(num_samples=16, num_samples_importance=16, num_upsample_steps=4)
        sdf_fn = lambda pos: jnp.linalg.norm(pos, axis=-1) - 0.5
        s = S.neus_sampling(rays, sdf_fn, spec, None, train=False)
        # surface at euclidean t = 2.5 (front of sphere r=0.5 from x=3)
        starts = np.asarray(s.starts)
        near_surface = np.abs(starts - 2.5) < 0.15
        uniform_frac = 0.3 / 2.0  # fraction of [2,4] within the band
        assert near_surface.mean() > 1.5 * uniform_frac

    def test_fixed_inv_s_alpha_formula(self):
        # single ray, linear sdf crossing zero
        euclid = jnp.linspace(0.0, 1.0, 5)[None]
        sdf = jnp.asarray([[0.2, 0.1, -0.1, -0.2]])
        alphas = S.rendering_sdf_with_fixed_inv_s(euclid, sdf, inv_s=64.0)
        assert alphas.shape == (1, 3)
        # the zero crossing between samples 1,2 must dominate
        assert float(alphas[0, 1]) > float(alphas[0, 0])
        assert float(alphas[0, 1]) > 0.9


class TestVolumeRendering:
    def test_weights_from_alphas_sum_below_one(self):
        alphas = jax.random.uniform(jax.random.key(0), (16, 32))
        w = weights_from_alphas(alphas)
        assert float(jnp.max(jnp.sum(w, -1))) <= 1.0 + 1e-4

    def test_opaque_first_sample(self):
        alphas = jnp.zeros((1, 4)).at[0, 0].set(1.0)
        w = weights_from_alphas(alphas)
        np.testing.assert_allclose(w[0], [1.0, 0.0, 0.0, 0.0], atol=1e-5)

    def test_density_weights_match_alpha_weights(self):
        deltas = jnp.full((4, 16), 0.1)
        density = jax.random.uniform(jax.random.key(0), (4, 16)) * 5
        w1 = weights_from_densities(deltas, density)
        alphas = alphas_from_densities(deltas, density)
        w2 = weights_from_alphas(alphas)
        np.testing.assert_allclose(w1, w2, atol=1e-4)

    def test_neus_alpha_zero_far_from_surface(self):
        from multimodalstudio_tpu.core.rays import samples_from_bins

        rays, _ = sphere_collide(make_rays(2), 1.0)
        bins = jnp.tile(jnp.linspace(0, 1, 9)[None], (2, 1))
        euclid = 2.0 + 2.0 * bins
        s = samples_from_bins(rays, euclid, bins)
        sdf = jnp.full((2, 8), 5.0)  # far outside
        grads = jnp.tile(jnp.asarray([[-1.0, 0, 0]]), (2, 8, 1))[..., :]
        a = neus_alphas(s, sdf, grads.reshape(2, 8, 3), jnp.asarray(64.0), jnp.asarray(1.0))
        np.testing.assert_allclose(a, 0.0, atol=1e-3)


class TestSchedules:
    def test_cos_anneal(self):
        assert float(sched.cos_anneal_ratio(jnp.asarray(0), 1000, 0.05)) == 0.0
        assert float(sched.cos_anneal_ratio(jnp.asarray(50), 1000, 0.05)) == 1.0
        assert float(sched.cos_anneal_ratio(jnp.asarray(25), 1000, 0.05)) == 0.5

    def test_multistep_warmup(self):
        spec = sched.MultiStepWarmupSpec(0.1, (0.5, 0.75, 0.9), 0.4)
        f = lambda s: float(spec.factor(jnp.asarray(s), 1000))
        assert abs(f(50) - 0.5) < 1e-5
        assert abs(f(200) - 1.0) < 1e-6
        assert abs(f(600) - 0.4) < 1e-6
        assert abs(f(800) - 0.16) < 1e-6
        assert abs(f(950) - 0.064) < 1e-6

    def test_active_level_progression(self):
        grid = FeatureGridSpec(
            encoding=HashGridSpec(num_levels=8), steps_per_level_ratio=0.1, level_init=2
        )
        lvl = lambda s: int(sched.active_level(jnp.asarray(s), 1000, grid))
        assert lvl(0) == 2  # level_init
        assert lvl(350) == 4  # step/spl + 1 with spl=100
        assert lvl(999) == 8  # capped

    def test_numerical_delta_anneals_down(self):
        grid = FeatureGridSpec(encoding=HashGridSpec(num_levels=8, min_res=16, max_res=512))
        d0 = float(sched.numerical_gradients_delta(jnp.asarray(0), 1000, grid))
        d9 = float(sched.numerical_gradients_delta(jnp.asarray(900), 1000, grid))
        assert d0 > d9
        assert d9 >= 2.0 / 512 - 1e-6


class TestMLP:
    def test_weight_norm_finalize_preserves_init_forward(self):
        spec = MLPSpec(num_layers=3, hidden_dim=32, weight_norm=True, out_activation="None")
        mlp = MLP(spec, output_dim=4)
        x = jax.random.normal(jax.random.key(1), (5, 8))
        params = mlp.init(jax.random.key(0), x)["params"]
        raw_spec = dataclasses.replace(spec, weight_norm=False)
        raw = MLP(raw_spec, output_dim=4)
        out_raw = raw.apply({"params": jax.tree.map(lambda x: x, params)}, x)
        fixed = finalize_weight_norm(params)
        out_wn = mlp.apply({"params": fixed}, x)
        np.testing.assert_allclose(out_wn, out_raw, atol=1e-5)

    def test_geometric_init_approximates_sphere_sdf(self):
        # geometric init + positional encoding: sdf(x) ~ |x| - bias
        from multimodalstudio_tpu.fields.fields import NeRFEncodingSpec, SDFField, SDFFieldSpec
        from multimodalstudio_tpu.fields.fields import FieldComponentSpec

        spec = SDFFieldSpec(
            field=FieldComponentSpec(
                mlp=MLPSpec(
                    num_layers=8, hidden_dim=256, activation="Softplus",
                    activation_beta=100.0, out_activation="None",
                    skip_connections=(4,), geometric_init=True,
                    geometric_init_bias=0.5, weight_norm=True,
                )
            ),
            use_position_encoding=True,
            position_encoding=NeRFEncodingSpec(6, 0.0, 5.0, True),
            geo_feature_dim=32,
        )
        field = SDFField(spec)
        x = jax.random.normal(jax.random.key(2), (200, 3)) * 0.8
        params = finalize_weight_norm(field.init(jax.random.key(0), x, None)["params"])
        sdf, _ = field.apply({"params": params}, x, None)
        expected = jnp.linalg.norm(x, axis=-1) - 0.5
        corr = np.corrcoef(np.asarray(sdf).reshape(-1), np.asarray(expected))[0, 1]
        assert corr > 0.95, f"geometric init not sphere-like, corr={corr}"

    def test_skip_connection_shapes(self):
        spec = MLPSpec(num_layers=4, hidden_dim=16, skip_connections=(2,), out_activation="None")
        mlp = MLP(spec, output_dim=2)
        x = jnp.ones((3, 7))
        params = mlp.init(jax.random.key(0), x)["params"]
        assert mlp.apply({"params": params}, x).shape == (3, 2)
        # skip layer input widened by the network input dim
        assert params["layer_2"]["kernel"].shape[0] == 16 + 7


class TestMergeSorted:
    def test_matches_stable_argsort(self):
        from multimodalstudio_tpu.models.samplers import merge_sorted

        rng = np.random.default_rng(0)
        a = np.sort(rng.random((16, 24)), -1)
        b = np.sort(rng.random((16, 8)), -1)
        va = rng.random((16, 24))
        vb = rng.random((16, 8))
        m, mv = merge_sorted(jnp.asarray(a), jnp.asarray(b), (jnp.asarray(va), jnp.asarray(vb)))
        cat = np.concatenate([a, b], -1)
        order = np.argsort(cat, -1, kind="stable")
        np.testing.assert_allclose(m, np.take_along_axis(cat, order, -1), atol=1e-6)
        np.testing.assert_allclose(
            mv, np.take_along_axis(np.concatenate([va, vb], -1), order, -1), atol=1e-6
        )

    def test_with_duplicates(self):
        from multimodalstudio_tpu.models.samplers import merge_sorted

        a = jnp.asarray([[0.0, 0.5, 0.5, 1.0]])
        b = jnp.asarray([[0.5, 0.5]])
        m = merge_sorted(a, b)
        np.testing.assert_allclose(m[0], [0.0, 0.5, 0.5, 0.5, 0.5, 1.0])


class TestStackedCameras:
    def test_stacked_matches_per_modality(self):
        from multimodalstudio_tpu.cameras.cameras import generate_rays
        from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset
        from multimodalstudio_tpu.engine.train import stack_cameras

        ds = make_synthetic_dataset(("rgb", "mono"), num_views=3, height=16, width=16)
        cams = {m: ds.data[m].cameras for m in ("rgb", "mono")}
        stacked, offsets = stack_cameras(cams, ("rgb", "mono"))
        assert offsets == {"rgb": 0, "mono": 3}
        idx = jnp.asarray([0, 2], jnp.int32)
        coords = jnp.asarray([[4.5, 8.5], [10.5, 3.5]])
        per_mod = generate_rays(cams["mono"], idx, coords)
        via_stack = generate_rays(stacked, idx + 3, coords)
        np.testing.assert_allclose(per_mod.directions, via_stack.directions, atol=1e-6)
        np.testing.assert_allclose(per_mod.origins, via_stack.origins, atol=1e-6)
