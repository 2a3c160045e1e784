"""Lie-group exponential maps for pose optimization.

JAX counterparts of reference src/cameras/lie_groups.py:28-120. All branching
is expressed as jnp.where so the maps are jit/vmap/grad friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _skew(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrices."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_map_SO3xR3(tangent: jnp.ndarray) -> jnp.ndarray:
    """exp of the direct product SO(3) x R^3: [..., 6] -> [..., 3, 4].

    Tangent layout: [tx, ty, tz, wx, wy, wz] (translation first), matching the
    reference (lie_groups.py:28-63). Rotation by Rodrigues with the same
    1e-4 angle clamp.
    """
    log_rot = tangent[..., 3:]
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    rot_angles = jnp.sqrt(jnp.clip(nrms, min=1e-4))
    inv = 1.0 / rot_angles
    fac1 = inv * jnp.sin(rot_angles)
    fac2 = inv * inv * (1.0 - jnp.cos(rot_angles))
    skews = _skew(log_rot)
    # f32 contract precision regardless of the global default (bf16 on the
    # TPU flagships): pose math must stay f32-exact
    with jax.default_matmul_precision("float32"):
        skews_sq = skews @ skews
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), skews.shape)
    rot = fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq + eye
    return jnp.concatenate([rot, tangent[..., :3, None]], axis=-1)


def exp_map_SE3(tangent: jnp.ndarray) -> jnp.ndarray:
    """exp: se(3) -> SE(3), [..., 6] -> [..., 3, 4].

    Same Taylor-switch structure as the reference (lie_groups.py:66-120),
    near_zero threshold theta < 1e-2.
    """
    lin = tangent[..., :3]
    ang = tangent[..., 3:]

    theta = jnp.linalg.norm(ang, axis=-1, keepdims=True)  # [..., 1]
    theta2 = theta**2
    theta3 = theta**3
    near_zero = theta < 1e-2
    one = jnp.ones_like(theta)
    theta_nz = jnp.where(near_zero, one, theta)
    theta2_nz = jnp.where(near_zero, one, theta2)
    theta3_nz = jnp.where(near_zero, one, theta3)

    sine = jnp.sin(theta)
    cosine = jnp.where(near_zero, 8.0 / (4.0 + theta2) - 1.0, jnp.cos(theta))
    sine_by_theta = jnp.where(near_zero, 0.5 * cosine + 0.5, sine / theta_nz)
    one_minus_cos_by_theta2 = jnp.where(
        near_zero, 0.5 * sine_by_theta, (1.0 - cosine) / theta2_nz
    )

    outer = ang[..., :, None] * ang[..., None, :]
    rot = one_minus_cos_by_theta2[..., None] * outer
    rot = rot + cosine[..., None] * jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), rot.shape)
    rot = rot + sine_by_theta[..., None] * _skew(ang)

    sine_by_theta_t = jnp.where(near_zero, 1.0 - theta2 / 6.0, sine_by_theta)
    one_minus_cos_by_theta2_t = jnp.where(
        near_zero, 0.5 - theta2 / 24.0, one_minus_cos_by_theta2
    )
    theta_minus_sine_by_theta3 = jnp.where(
        near_zero, 1.0 / 6.0 - theta2 / 120.0, (theta - sine) / theta3_nz
    )

    trans = (
        sine_by_theta_t * lin
        + one_minus_cos_by_theta2_t * jnp.cross(ang, lin)
        + theta_minus_sine_by_theta3 * ang * jnp.sum(ang * lin, axis=-1, keepdims=True)
    )
    return jnp.concatenate([rot, trans[..., :, None]], axis=-1)


def pose_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose [..., 3, 4] rigid transforms: a then b in a's frame (a @ b).

    Counterpart of reference src/utils/poses.py multiply used at
    cameras.py:659-660.
    """
    with jax.default_matmul_precision("float32"):
        rot = a[..., :3, :3] @ b[..., :3, :3]
        trans = (a[..., :3, :3] @ b[..., :3, 3:]) + a[..., :3, 3:]
    return jnp.concatenate([rot, trans], axis=-1)
