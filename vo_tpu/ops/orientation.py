"""Intensity-centroid keypoint orientations.

Re-expression of src/cuda/Orientations.cu:23-62: the per-keypoint patch loop
(m10 = sum dx*I, m01 = sum dy*I over a square patch, angle = atan2(m01, m10))
becomes two dense separable moment maps (ones x ramp convolutions) gathered
at keypoint indices. Keypoints whose patch leaves the image get angle 0
(Orientations.cu:43-47).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .conv import separable_conv_same


@functools.partial(jax.jit, static_argnames=("patch_size",))
def moment_maps(img: jnp.ndarray, patch_size: int = 31):
    """Dense (m10, m01) maps: m10(y,x) = sum_{dy,dx} dx * I(y+dy, x+dx).

    Separable: m10 = (column-of-ones) * (row-ramp); m01 transposed.
    Uses zero padding — border values are wrong there, but those keypoints
    are masked to angle 0 anyway, matching the reference's border rule.
    """
    r = patch_size // 2
    ones = np.ones(patch_size)
    ramp = np.arange(-r, r + 1).astype(np.float64)
    pad = [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)]
    padded = jnp.pad(img, pad)
    from .conv import conv2d_valid

    m10 = conv2d_valid(conv2d_valid(padded, ramp.reshape(1, -1)), ones.reshape(-1, 1))
    m01 = conv2d_valid(conv2d_valid(padded, ones.reshape(1, -1)), ramp.reshape(-1, 1))
    return m10, m01


@functools.partial(jax.jit, static_argnames=("patch_size",))
def orientations_at(
    img: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    patch_size: int = 31,
    rect=None,
) -> jnp.ndarray:
    """Per-keypoint orientation angle (radians); 0 if patch out of bounds.

    `rect` (optional) = per-keypoint bounds (x0, y0, x1, y1) arrays for
    canvas-packed pyramids (ops/canvas.py): the border rule is applied
    against the keypoint's LEVEL rectangle instead of the image edge."""
    H, W = img.shape[-2:]
    r = patch_size // 2
    m10, m01 = moment_maps(img, patch_size)
    yi = ys.astype(jnp.int32)
    xi = xs.astype(jnp.int32)
    ang = jnp.arctan2(m01[yi, xi], m10[yi, xi])
    x0, y0, x1, y1 = (0, 0, W, H) if rect is None else rect
    in_bounds = (
        (xi >= x0 + r) & (xi < x1 - r) & (yi >= y0 + r) & (yi < y1 - r)
    )
    return jnp.where(in_bounds, ang, 0.0)
