"""Lens distortion: Newton undistortion on the camera plane.

JAX counterpart of reference src/cameras/camera_utils.py:279-383 (itself from
MultiNeRF). The 10-iteration Newton solve is a `lax.fori_loop`, fully inside
jit; the distortion parameter layout is OpenCV-style [k1, k2, k3, k4, p1, p2].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _residual_and_jacobian(x, y, xd, yd, params):
    """Residuals and Jacobian of the distortion fixed-point equation.

    Mirrors reference camera_utils.py:279-342.
    """
    k1, k2, k3, k4 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    p1, p2 = params[..., 4], params[..., 5]

    r = x * x + y * y
    d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))

    fx = d * x + 2.0 * p1 * x * y + p2 * (r + 2.0 * x * x) - xd
    fy = d * y + 2.0 * p2 * x * y + p1 * (r + 2.0 * y * y) - yd

    d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r

    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def radial_and_tangential_undistort(
    coords: jnp.ndarray,
    distortion_params: jnp.ndarray,
    eps: float = 1e-3,
    max_iterations: int = 10,
) -> jnp.ndarray:
    """Undistort camera-plane coords [..., 2] given params [..., 6].

    Newton iterations with step gating on |det(J)| > eps, identical update
    rule to reference camera_utils.py:345-383.
    """
    xd = coords[..., 0]
    yd = coords[..., 1]

    def body(_, xy):
        x, y = xy
        fx, fy, fx_x, fx_y, fy_x, fy_y = _residual_and_jacobian(
            x, y, xd, yd, distortion_params
        )
        denom = fy_x * fx_y - fx_x * fy_y
        x_num = fx * fy_y - fy * fx_y
        y_num = fy * fx_x - fx * fy_x
        ok = jnp.abs(denom) > eps
        step_x = jnp.where(ok, x_num / denom, jnp.zeros_like(denom))
        step_y = jnp.where(ok, y_num / denom, jnp.zeros_like(denom))
        return (x + step_x, y + step_y)

    x, y = jax.lax.fori_loop(0, max_iterations, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


def distort(coords: jnp.ndarray, distortion_params: jnp.ndarray) -> jnp.ndarray:
    """Forward OpenCV distortion model — used for tests as the inverse check."""
    x = coords[..., 0]
    y = coords[..., 1]
    k1, k2, k3, k4 = (
        distortion_params[..., 0],
        distortion_params[..., 1],
        distortion_params[..., 2],
        distortion_params[..., 3],
    )
    p1, p2 = distortion_params[..., 4], distortion_params[..., 5]
    r = x * x + y * y
    d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
    xd = d * x + 2.0 * p1 * x * y + p2 * (r + 2.0 * x * x)
    yd = d * y + 2.0 * p2 * x * y + p1 * (r + 2.0 * y * y)
    return jnp.stack([xd, yd], axis=-1)
