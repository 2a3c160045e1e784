"""Math ops: spherical harmonics, scene contraction, image metrics.

Spherical harmonics are the closed-form real basis through degree 4 —
reference src/utils/math.py:21-82 (the reference's default path uses the tcnn
CUDA SH; this is the TPU-native equivalent, pure elementwise VPU work).
"""

from __future__ import annotations

import jax.numpy as jnp


def components_from_spherical_harmonics(levels: int, directions: jnp.ndarray) -> jnp.ndarray:
    """Real SH basis values, [..., 3] unit directions -> [..., levels**2].

    levels in [1, 5] (degree = levels - 1). Matches reference
    src/utils/math.py:21-82 coefficient-for-coefficient.
    """
    assert 1 <= levels <= 5, f"SH levels must be in [1,5], got {levels}"
    x = directions[..., 0]
    y = directions[..., 1]
    z = directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z

    comps = [jnp.full_like(x, 0.28209479177387814)]
    if levels > 1:
        comps += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels > 2:
        comps += [
            1.0925484305920792 * x * y,
            1.0925484305920792 * y * z,
            0.9461746957575601 * zz - 0.31539156525251999,
            1.0925484305920792 * x * z,
            0.5462742152960396 * (xx - yy),
        ]
    if levels > 3:
        comps += [
            0.5900435899266435 * y * (3 * xx - yy),
            2.890611442640554 * x * y * z,
            0.4570457994644658 * y * (5 * zz - 1),
            0.3731763325901154 * z * (5 * zz - 3),
            0.4570457994644658 * x * (5 * zz - 1),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3 * yy),
        ]
    if levels > 4:
        comps += [
            2.5033429417967046 * x * y * (xx - yy),
            1.7701307697799304 * y * z * (3 * xx - yy),
            0.9461746957575601 * x * y * (7 * zz - 1),
            0.6690465435572892 * y * (7 * zz - 3),
            0.10578554691520431 * (35 * zz * zz - 30 * zz + 3),
            0.6690465435572892 * x * z * (7 * zz - 3),
            0.47308734787878004 * (xx - yy) * (7 * zz - 1),
            1.7701307697799304 * x * z * (xx - 3 * yy),
            0.4425326924449826 * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(comps, axis=-1)


def scene_contraction(positions: jnp.ndarray, order: float | None = None) -> jnp.ndarray:
    """MipNeRF-360 contraction: identity inside the unit ball, 2 - 1/||x||
    radially outside (reference src/field_components/spatial_distortions.py).

    order=None -> L2 norm; order=inf -> L_inf (cube of side 4).
    Implemented densely with jnp.where (no boolean indexing).
    """
    if order is None:
        mag = jnp.linalg.norm(positions, axis=-1, keepdims=True)
    elif order == float("inf"):
        mag = jnp.max(jnp.abs(positions), axis=-1, keepdims=True)
    else:
        mag = jnp.linalg.norm(positions, ord=order, axis=-1, keepdims=True)
    mag_safe = jnp.maximum(mag, 1e-12)
    contracted = (2.0 - 1.0 / mag_safe) * (positions / mag_safe)
    return jnp.where(mag >= 1.0, contracted, positions)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB for [0,1]-ranged images/batches."""
    err = (pred - target) ** 2
    if mask is not None:
        mse = jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask) * err.shape[-1], 1.0) \
            if mask.shape != err.shape else jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        mse = jnp.mean(err)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] image pair (Gaussian-window variant).

    TPU-native replacement for the torchmetrics SSIM used by the reference's
    offline metrics (scripts/evaluate_average_metrics.py:154-191).
    """
    return jnp.mean(
        ssim_map(pred, target, max_val, filter_size, filter_sigma, k1, k2)
    )


def ssim_map(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Per-pixel SSIM map [H, W, C] (same math as `ssim` without the mean).

    The reference's masked-SSIM protocol computes SSIM on the FULL images
    and averages the map over the ROI mask afterwards
    (evaluate_average_metrics.py:154-168) — masking-then-SSIM inflates
    scores near mask borders; use this map for the parity protocol."""
    radius = filter_size // 2
    kernel = _gaussian_kernel1d(filter_sigma, radius)

    def blur(img):
        img = jnp.pad(img, ((radius, radius), (radius, radius), (0, 0)), mode="edge")
        img = jnp.moveaxis(img, 0, -1)
        img = _conv_last(img, kernel)
        img = jnp.moveaxis(img, -1, 0)
        img = jnp.moveaxis(img, 1, -1)
        img = _conv_last(img, kernel)
        return jnp.moveaxis(img, -1, 1)

    mu_p = blur(pred)
    mu_t = blur(target)
    mu_pp = blur(pred * pred) - mu_p * mu_p
    mu_tt = blur(target * target) - mu_t * mu_t
    mu_pt = blur(pred * target) - mu_p * mu_t

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    num = (2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (mu_pp + mu_tt + c2)
    return num / den


def masked_ssim(pred: jnp.ndarray, target: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Reference masked-SSIM protocol (evaluate_average_metrics.py:154-168):
    SSIM map over the full [H, W, C] images, averaged over the [H, W, 1]
    mask (all pixels when mask is None)."""
    smap = ssim_map(pred, target)
    if mask is None:
        return jnp.mean(smap)
    m = jnp.broadcast_to(mask, smap.shape)
    return jnp.sum(smap * m) / jnp.maximum(jnp.sum(m), 1.0)


def _conv_last(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid 1-D convolution along the last axis of [..., L]."""
    length = img.shape[-1] - kernel.shape[0] + 1
    idx = jnp.arange(length)[:, None] + jnp.arange(kernel.shape[0])[None, :]
    windows = img[..., idx]  # [..., L_out, K]
    return jnp.tensordot(windows, kernel, axes=([-1], [0]))
