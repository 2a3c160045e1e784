"""Mueller-calculus polarization optics.

JAX counterparts of reference src/model_components/polarizer.py:23-134. A
predicted Stokes vector (s0, s1, s2) is rotated into the camera frame (using
the reflection-plane normal defined by ray direction x world-z and the camera
up direction) and projected to four linear-polarizer intensities at
0/45/90/135 degrees.
"""

from __future__ import annotations

import jax.numpy as jnp

_WORLD_Z = jnp.array([0.0, 0.0, 1.0])

# Rows of the 4-filter projection: 0.5 * [1, cos(2a), sin(2a)] for
# a in (0, 45, 90, 135) degrees (reference polarizer.py:94-97).
_POLARIZER_ROWS = 0.5 * jnp.array(
    [
        [1.0, 1.0, 0.0],
        [1.0, 0.0, 1.0],
        [1.0, -1.0, 0.0],
        [1.0, 0.0, -1.0],
    ]
)

# Pseudo-inverse used to recover Stokes from 4 intensities
# (reference polarizer.py:108-111).
_DATA_TO_STOKES = jnp.array(
    [
        [0.5, 0.5, 0.5, 0.5],
        [1.0, 0.0, -1.0, 0.0],
        [0.0, 1.0, 0.0, -1.0],
    ]
)


def mueller_rotate(theta: jnp.ndarray) -> jnp.ndarray:
    """Mueller rotation matrix, [...,] -> [..., 3, 3] (polarizer.py:39-52)."""
    c = jnp.cos(2.0 * theta)
    s = jnp.sin(2.0 * theta)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    rows = jnp.stack([one, zero, zero, zero, c, s, zero, -s, c], axis=-1)
    return rows.reshape(*theta.shape, 3, 3)


def mueller_linear_polarizer(theta: jnp.ndarray) -> jnp.ndarray:
    """Mueller matrix of a linear polarizer at angle theta (polarizer.py:23-37)."""
    c = jnp.cos(2.0 * theta)
    s = jnp.sin(2.0 * theta)
    rows = 0.5 * jnp.stack(
        [jnp.ones_like(c), c, s, c, c * c, c * s, s, c * s, s * s], axis=-1
    )
    return rows.reshape(*theta.shape, 3, 3)


def align_polarization_filters(
    stokes: jnp.ndarray, directions: jnp.ndarray, up_directions: jnp.ndarray
) -> jnp.ndarray:
    """Rotate Stokes vectors into the camera polarizer frame.

    [..., 3] x [..., 3] x [..., 3] -> [..., 3] (polarizer.py:54-82).
    """
    normal = jnp.cross(directions, jnp.broadcast_to(_WORLD_Z, directions.shape))
    normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-12)
    cos_theta = jnp.clip(
        jnp.sum(normal * up_directions, axis=-1), -1.0 + 1e-4, 1.0 - 1e-4
    )
    theta = jnp.arccos(cos_theta) - jnp.pi / 2.0
    rotated = mueller_rotate(theta) @ stokes[..., None]
    return rotated[..., 0]


def stokes_to_intensity(stokes: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project Stokes [..., 3] to 4 polarizer intensities (polarizer.py:84-101)."""
    channels = stokes @ _POLARIZER_ROWS.T  # [..., 4]
    total = 0.5 * jnp.sum(channels, axis=-1, keepdims=True)
    coefficients = channels / (total + 1e-10)
    return channels, coefficients


def _stokes_from(data: jnp.ndarray | None, stokes: jnp.ndarray | None) -> jnp.ndarray:
    if stokes is not None:
        return stokes
    assert data is not None, "either data (4ch) or stokes (3ch) must be given"
    return data @ _DATA_TO_STOKES.T


def to_dop(data: jnp.ndarray | None = None, stokes: jnp.ndarray | None = None) -> jnp.ndarray:
    """Degree of linear polarization, [..., 4|3] -> [...] (polarizer.py:103-116)."""
    s = _stokes_from(data, stokes)
    return jnp.linalg.norm(s[..., 1:], axis=-1) / s[..., 0]


def to_aop(data: jnp.ndarray | None = None, stokes: jnp.ndarray | None = None) -> jnp.ndarray:
    """Angle of linear polarization in [0, pi] (polarizer.py:118-134)."""
    s = _stokes_from(data, stokes)
    aop = 0.5 * jnp.arctan2(s[..., 2], s[..., 1] + 1e-7)
    aop = jnp.where(aop < 0, aop + jnp.pi, aop)
    return jnp.clip(aop, 0.0, jnp.pi)
