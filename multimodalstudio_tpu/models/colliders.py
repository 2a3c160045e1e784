"""Scene colliders: assign near/far bounds and a region-of-interest mask.

TPU-native counterpart of reference src/model_components/scene_colliders.py.
The reference filters the ray batch with a boolean mask (dynamic shape); here
all rays are kept and the hit mask travels as a float vector used by the
renderer and losses (masked dense compute).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from multimodalstudio_tpu.core.rays import RayBundle


def near_far_collide(
    rays: RayBundle, near: float, far: float
) -> Tuple[RayBundle, jnp.ndarray]:
    """Constant near/far bounds; every ray hits (SceneBox collider_type
    'near_far', reference data/scene_box.py)."""
    n = rays.origins.shape[0]
    nears = jnp.full((n, 1), near, rays.origins.dtype)
    fars = jnp.full((n, 1), far, rays.origins.dtype)
    return rays.replace(nears=nears, fars=fars), jnp.ones((n,), rays.origins.dtype)


def box_collide(rays: RayBundle, aabb) -> Tuple[RayBundle, jnp.ndarray]:
    """Axis-aligned box intersection (SceneBox collider_type 'box')."""
    lo = jnp.asarray(aabb[0], rays.origins.dtype)
    hi = jnp.asarray(aabb[1], rays.origins.dtype)
    inv = 1.0 / jnp.where(jnp.abs(rays.directions) < 1e-9, 1e-9, rays.directions)
    t0 = (lo - rays.origins) * inv
    t1 = (hi - rays.origins) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)
    mask = ((tmax > tmin) & (tmax > 0.0))[:, 0].astype(rays.origins.dtype)
    nears = jnp.maximum(tmin, 0.01)
    fars = jnp.maximum(tmax, nears + 0.01)
    return rays.replace(nears=nears, fars=fars), mask


def sphere_collide(rays: RayBundle, radius: float = 1.0) -> Tuple[RayBundle, jnp.ndarray]:
    """Ray-sphere intersection near/far + hit mask (scene_colliders.py:60-80).

    Returns rays with nears/fars set (clamped to >= 0.01) and a float mask
    [N] of rays whose discriminant exceeds 0.01.
    """
    ray_cam_dot = jnp.sum(rays.directions * rays.origins, axis=-1, keepdims=True)
    norm_sq = jnp.sum(rays.origins * rays.origins, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot**2 - (norm_sq - radius**2)

    mask = (under_sqrt[:, 0] > 0.01).astype(rays.origins.dtype)
    under_sqrt = jnp.maximum(under_sqrt, 0.01)
    half = jnp.sqrt(under_sqrt)
    nears = jnp.maximum(-half - ray_cam_dot, 0.01)
    fars = jnp.maximum(half - ray_cam_dot, 0.01)
    return rays.replace(nears=nears, fars=fars), mask


def background_bounds(
    rays: RayBundle, mask: jnp.ndarray, radius: float = 1.0
) -> RayBundle:
    """Near/far for background sampling behind the ROI sphere.

    Mirrors ColliderInstancer.update_ray_bundles_for_background
    (scene_colliders.py:107-113): hit rays start at their ROI far; all rays
    extend 3 units beyond their far.
    """
    collided, _ = sphere_collide(rays, radius)
    m = mask[:, None]
    nears = m * collided.fars + (1.0 - m) * collided.nears
    fars = collided.fars + 3.0
    return rays.replace(nears=nears, fars=fars)
