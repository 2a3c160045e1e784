"""LPIPS-JAX metric tests (utils/lpips_jax.py).

Reference protocol: scripts/evaluate_average_metrics.py:173-191 (AlexNet
LPIPS on mask-zeroed [-1,1] images).
"""

import numpy as np
import pytest

from multimodalstudio_tpu.utils.lpips_jax import (
    _ALEX,
    _rand_params,
    lpips,
    load_params,
    weight_source,
)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.RandomState(3)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    return x


def test_identity_is_zero(imgs):
    d = np.asarray(lpips(imgs, imgs))
    assert d.shape == (2,)
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_orders_perturbation_strength(imgs):
    rng = np.random.RandomState(0)
    noise = rng.standard_normal(imgs.shape).astype(np.float32)
    d_small = np.asarray(lpips(imgs, np.clip(imgs + 0.05 * noise, -1, 1)))
    d_large = np.asarray(lpips(imgs, np.clip(imgs + 0.5 * noise, -1, 1)))
    assert np.all(d_small > 0)
    assert np.all(d_large > d_small)


def test_deterministic_across_loads(imgs):
    a = _rand_params(0)
    b = _rand_params(0)
    for i in range(len(_ALEX)):
        np.testing.assert_array_equal(a[f"conv{i}_w"], b[f"conv{i}_w"])
    d1 = np.asarray(lpips(imgs[:1], -imgs[:1]))
    d2 = np.asarray(lpips(imgs[:1], -imgs[:1]))
    np.testing.assert_array_equal(d1, d2)


def test_weight_source_reported():
    assert weight_source() in ("trained", "randinit")
    assert load_params()["source"] == weight_source()


def test_single_image_rank_promotes(imgs):
    d = np.asarray(lpips(imgs[0], imgs[1]))
    assert d.shape == (1,)


def test_blur_cheaper_than_noise(imgs):
    """Perceptual ordering sanity: iid noise must cost more than a local
    blur at matched L2 — the core property LPIPS exists for (holds for
    untrained feature stacks too, Zhang et al. Table 5). Needs a STRUCTURED
    base image (blurring an iid-noise image destroys everything)."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 63.0
    x = np.stack(
        [np.sin(8 * xx) * yy, np.cos(6 * yy) * xx, (xx - yy) ** 2], axis=-1
    )[None].astype(np.float32)
    blurred = (
        x
        + np.roll(x, 1, axis=1)
        + np.roll(x, -1, axis=1)
        + np.roll(x, 1, axis=2)
        + np.roll(x, -1, axis=2)
    ) / 5.0
    l2_blur = float(np.mean((blurred - x) ** 2))
    rng = np.random.RandomState(1)
    noise = rng.standard_normal(x.shape).astype(np.float32)
    noise *= np.sqrt(l2_blur / np.mean(noise**2))
    noisy = x + noise
    assert float(lpips(x, noisy)[0]) > float(lpips(x, blurred)[0])
