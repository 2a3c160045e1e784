"""Volume rendering: NeuS sigmoid-CDF alphas and VolSDF Laplace density.

TPU-native counterpart of reference src/model_components/volume_rendering.py.
The cosine anneal ratio is a traced scalar computed from the step (see
engine/schedules.py) rather than callback-mutated module state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodalstudio_tpu.core.rays import RaySamples, weights_from_alphas


def neus_alphas(
    ray_samples: RaySamples,
    sdf: jnp.ndarray,
    gradients: jnp.ndarray,
    inv_s: jnp.ndarray,
    cos_anneal_ratio: jnp.ndarray,
) -> jnp.ndarray:
    """Per-sample NeuS alpha from section-estimated SDFs.

    Mirrors NeuSVolumeRendering.get_alphas (volume_rendering.py:185-213):
    the true cos(view, grad) is annealed from an always-alive relaxation to
    its exact value over the first anneal_end fraction of training.

    Args:
        ray_samples: [N, S] samples.
        sdf: [N, S] SDF at the sample start points.
        gradients: [N, S, 3] SDF spatial gradients.
        inv_s: scalar inverse standard deviation (traced).
        cos_anneal_ratio: traced scalar in [0, 1].
    Returns:
        alphas [N, S].
    """
    true_cos = jnp.sum(ray_samples.directions[:, None, :] * gradients, axis=-1)  # [N, S]

    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )  # always non-positive

    est_next = sdf + iter_cos * ray_samples.deltas * 0.5
    est_prev = sdf - iter_cos * ray_samples.deltas * 0.5

    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)

    p = prev_cdf - next_cdf
    c = prev_cdf
    return jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)


def neus_weights(
    ray_samples: RaySamples,
    sdf: jnp.ndarray,
    gradients: jnp.ndarray,
    inv_s: jnp.ndarray,
    cos_anneal_ratio: jnp.ndarray,
) -> jnp.ndarray:
    """NeuS compositing weights [N, S] (volume_rendering.py:171-183)."""
    alphas = neus_alphas(ray_samples, sdf, gradients, inv_s, cos_anneal_ratio)
    return weights_from_alphas(alphas)


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray, beta_min: float = 1e-4) -> jnp.ndarray:
    """VolSDF Laplace-CDF density (volume_rendering.py:114-130)."""
    b = jnp.abs(beta) + beta_min
    return (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / b)) / b


def neus_s_density(sdf: jnp.ndarray, inv_s: jnp.ndarray) -> jnp.ndarray:
    """NeuS logistic density phi_s(x) = s e^{-sx} / (1 + e^{-sx})^2
    (reference volume_rendering.py:101-112)."""
    e = jnp.exp(-sdf * inv_s)
    return (inv_s * e) / (1.0 + e) ** 2
