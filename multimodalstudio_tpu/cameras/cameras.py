"""Cameras and in-jit ray generation.

TPU-native counterpart of reference src/cameras/cameras.py:308-703 and
src/model_components/ray_generators.py. Ray generation for a sampled pixel
batch — intrinsics lookup, Newton undistortion, per-type direction math,
pose-delta composition, up-directions, pixel area — runs entirely inside the
jitted training step (the reference runs it per-step in torch on GPU).

Only PERSPECTIVE and FISHEYE types carry distortion; EQUIRECTANGULAR skips it
(reference cameras.py:597-605). Camera type is static per modality here
(MMS-DATA cameras are all PINHOLE/OPENCV), which removes the reference's
runtime type masking.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from multimodalstudio_tpu.core.rays import RayBundle
from multimodalstudio_tpu.ops.distortion import radial_and_tangential_undistort
from multimodalstudio_tpu.ops.lie_groups import pose_multiply

PERSPECTIVE = 1
FISHEYE = 2
EQUIRECTANGULAR = 3


@struct.dataclass
class Cameras:
    """A batch of cameras for one modality (one entry per frame).

    fx/fy/cx/cy: [F]; camera_to_worlds: [F, 3, 4]; distortion_params: [F, 6]
    (k1 k2 k3 k4 p1 p2) or None; width/height/pixel_offset/camera_type static.
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    camera_to_worlds: jnp.ndarray
    distortion_params: Optional[jnp.ndarray] = None
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    pixel_offset: float = struct.field(pytree_node=False, default=0.5)
    camera_type: int = struct.field(pytree_node=False, default=PERSPECTIVE)

    @property
    def num_cameras(self) -> int:
        return self.fx.shape[0]

    def rescaled(self, scale: float) -> "Cameras":
        """Rescale intrinsics for a different output resolution
        (reference cameras.py:740-778)."""
        return self.replace(
            fx=self.fx * scale,
            fy=self.fy * scale,
            cx=self.cx * scale,
            cy=self.cy * scale,
            width=int(self.width * scale),
            height=int(self.height * scale),
        )


def generate_rays(
    cameras: Cameras,
    camera_indices: jnp.ndarray,
    pixel_coords: jnp.ndarray,
    camera_opt_to_camera: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """Generate world-space rays for pixel coordinates.

    Args:
        cameras: per-frame camera batch.
        camera_indices: [N] int frame index per ray.
        pixel_coords: [N, 2] float (y, x) pixel coordinates (pixel_offset
            already applied by the caller, reference cameras.py:280-306).
        camera_opt_to_camera: optional [N, 3, 4] learned pose correction.

    Mirrors reference cameras.py:460-703: a 3-way coordinate stack (coord,
    +1x, +1y) feeds Newton undistortion and adjacent-ray divergence for the
    pixel area.
    """
    idx = camera_indices
    fx = cameras.fx[idx]
    fy = cameras.fy[idx]
    cx = cameras.cx[idx]
    cy = cameras.cy[idx]
    y = pixel_coords[..., 0]
    x = pixel_coords[..., 1]

    coord = jnp.stack([(x - cx) / fx, -(y - cy) / fy], -1)
    coord_x = jnp.stack([(x - cx + 1) / fx, -(y - cy) / fy], -1)
    coord_y = jnp.stack([(x - cx) / fx, -(y - cy + 1) / fy], -1)
    coord_stack = jnp.stack([coord, coord_x, coord_y], axis=0)  # [3, N, 2]

    if cameras.distortion_params is not None and cameras.camera_type != EQUIRECTANGULAR:
        dist = cameras.distortion_params[idx]  # [N, 6]
        coord_stack = radial_and_tangential_undistort(coord_stack, dist[None])

    if cameras.camera_type == PERSPECTIVE:
        dirs_stack = jnp.concatenate(
            [coord_stack, -jnp.ones_like(coord_stack[..., :1])], axis=-1
        )
    elif cameras.camera_type == FISHEYE:
        theta = jnp.sqrt(jnp.sum(coord_stack**2, axis=-1))
        theta = jnp.clip(theta, 0.0, jnp.pi)
        sin_over = jnp.sin(theta) / jnp.maximum(theta, 1e-12)
        dirs_stack = jnp.stack(
            [
                coord_stack[..., 0] * sin_over,
                coord_stack[..., 1] * sin_over,
                -jnp.cos(theta),
            ],
            axis=-1,
        )
    elif cameras.camera_type == EQUIRECTANGULAR:
        theta = -jnp.pi * coord_stack[..., 0]
        phi = jnp.pi * (0.5 - coord_stack[..., 1])
        dirs_stack = jnp.stack(
            [
                -jnp.sin(theta) * jnp.sin(phi),
                jnp.cos(phi),
                -jnp.cos(theta) * jnp.sin(phi),
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"camera type {cameras.camera_type} not supported")

    c2w = cameras.camera_to_worlds[idx]  # [N, 3, 4]
    if camera_opt_to_camera is not None:
        c2w = pose_multiply(c2w, camera_opt_to_camera)
    rotation = c2w[..., :3, :3]

    # rotate to world: sum over camera axes (reference cameras.py:664-666)
    dirs_world = jnp.sum(dirs_stack[..., None, :] * rotation[None], axis=-1)  # [3, N, 3]

    directions_norm = jnp.linalg.norm(dirs_world[0], axis=-1, keepdims=True)
    dirs_world = dirs_world / jnp.maximum(
        jnp.linalg.norm(dirs_world, axis=-1, keepdims=True), 1e-12
    )

    origins = c2w[..., :3, 3]
    directions = dirs_world[0]

    up_directions = rotation[..., :, 1]  # R @ [0,1,0] (reference cameras.py:680-683)

    dx = jnp.sqrt(jnp.sum((directions - dirs_world[1]) ** 2, axis=-1))
    dy = jnp.sqrt(jnp.sum((directions - dirs_world[2]) ** 2, axis=-1))
    pixel_area = (dx * dy)[..., None]

    return RayBundle(
        origins=origins,
        directions=directions,
        up_directions=up_directions,
        pixel_area=pixel_area,
        camera_indices=idx,
        directions_norm=directions_norm,
    )
