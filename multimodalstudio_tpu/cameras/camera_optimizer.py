"""Learnable per-modality camera pose corrections.

TPU-native counterpart of reference src/cameras/camera_optimizers.py:73-119.
Pose deltas are ordinary parameters in the train state's `camera_poses`
branch (their own optimizer group, reference method_configs.py:265-268);
the exp map runs inside the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodalstudio_tpu.ops.lie_groups import exp_map_SE3, exp_map_SO3xR3


@dataclasses.dataclass(frozen=True)
class CameraOptimizerSpec:
    """Reference CameraOptimizerConfig."""

    mode: str = "off"  # off | SO3xR3 | SE3
    shared_optimization: bool = False
    # (modality, optimize?) pairs; missing modalities default to True
    modalities_to_optimize: Tuple[Tuple[str, bool], ...] = ()

    def optimize(self, mod: str) -> bool:
        for name, flag in self.modalities_to_optimize:
            if name == mod:
                return flag
        return True


def init_camera_poses(
    spec: CameraOptimizerSpec, modalities: Tuple[str, ...], num_cameras: Dict[str, int]
) -> Dict[str, jnp.ndarray]:
    """Zero-initialized tangent vectors per modality ([1, 6] when shared)."""
    if spec.mode == "off":
        return {}
    return {
        mod: jnp.zeros((1 if spec.shared_optimization else num_cameras[mod], 6))
        for mod in modalities
    }


def camera_opt_transform(
    spec: CameraOptimizerSpec,
    camera_poses: Dict[str, jnp.ndarray],
    mod: str,
    camera_indices: jnp.ndarray,
) -> Optional[jnp.ndarray]:
    """[N] frame indices -> [N, 3, 4] camera_opt_to_camera transforms (or None).

    Mirrors reference camera_optimizers.py:86-119 including the stop-gradient
    on modalities excluded from optimization.
    """
    if spec.mode == "off" or mod not in camera_poses:
        return None
    mat = tangent_transform(spec, camera_poses[mod], camera_indices)
    if not spec.optimize(mod):
        mat = jax.lax.stop_gradient(mat)
    return mat


def tangent_transform(
    spec: CameraOptimizerSpec, tangent: jnp.ndarray, camera_indices: jnp.ndarray
) -> jnp.ndarray:
    """Modality-free core of `camera_opt_transform`: tangents -> [N, 3, 4]
    exp-map transforms. Lets eval-time chunk fns take the tangent table as a
    jit argument so one executable serves every modality."""
    if spec.shared_optimization:
        params = jnp.broadcast_to(tangent, (camera_indices.shape[0], 6))
    else:
        params = tangent[camera_indices]
    exp_map = exp_map_SO3xR3 if spec.mode == "SO3xR3" else exp_map_SE3
    return exp_map(params)
