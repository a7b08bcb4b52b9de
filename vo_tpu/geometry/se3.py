"""SE(3) / SO(3) utilities (fp32, TPU-friendly batched forms).

Angle-axis (Rodrigues) conversions match Ceres/OpenCV conventions — these
are the pose parametrization of the reference's BA
(with_bundle_adjustment.cpp:616-630 uses 6-DoF [angle-axis | translation]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], -1),
            jnp.stack([wz, zero, -wx], -1),
            jnp.stack([-wy, wx, zero], -1),
        ],
        -2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (..., 3) -> rotation matrix (..., 3, 3), Rodrigues."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = theta[..., None]  # (..., 1, 1)
    K = hat(w / jnp.maximum(theta[..., 0], 1e-12))
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    R = I + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)
    # small-angle: R ~ I + hat(w)
    small = theta < 1e-6
    return jnp.where(small, I + hat(w), R)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> angle-axis (..., 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    sin_t = jnp.sin(theta)
    scale = jnp.where(
        theta[..., None] < 1e-6,
        0.5 + theta[..., None] ** 2 / 12.0,  # series of theta/(2 sin theta)
        theta[..., None] / jnp.maximum(2.0 * sin_t[..., None], 1e-12),
    )
    return v * scale


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4) homogeneous transform."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T.at[..., 3, 3].set(1.0)


def inv_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 4, 4) rigid transforms."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (4, 4) to (..., 3) points."""
    return pts @ T[:3, :3].T + T[:3, 3]


def project(K: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection of camera-frame points (..., 3) -> (..., 2) px."""
    z = pts_cam[..., 2:3]
    uv = pts_cam[..., :2] / jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    return jnp.stack(
        [
            uv[..., 0] * K[0, 0] + K[0, 2],
            uv[..., 1] * K[1, 1] + K[1, 2],
        ],
        -1,
    )
