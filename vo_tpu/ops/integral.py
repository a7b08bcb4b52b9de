"""Integral images and box sums.

The reference computes `cv::integral` on the host and box-filters via 4
gathers in the BRIEF kernel (Brief.cu:26-38, sum5x5). On TPU an integral
image is just two cumsums, and fixed-size box sums are cheaper still as a
separable uniform conv — both formulations are provided; BRIEF uses the
dense smoothed image directly (one fused op instead of 4 gathers per tap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .conv import separable_conv_same


@jax.jit
def integral_image(img: jnp.ndarray) -> jnp.ndarray:
    """(H+1, W+1) zero-leading integral image (cv::integral layout)."""
    s = jnp.cumsum(jnp.cumsum(img, axis=-2), axis=-1)
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 0), (1, 0)]
    return jnp.pad(s, pad)


def box_sum_from_integral(ii: jnp.ndarray, ys, xs, r: int) -> jnp.ndarray:
    """Sum of the (2r+1)^2 window centered at integer (ys, xs) via 4 gathers.

    Matches Brief.cu's sum5x5 (r=2) fetch: window [y-r, y+r] x [x-r, x+r].
    Coordinates must have the full window in-bounds.
    """
    y0, y1 = ys - r, ys + r + 1
    x0, x1 = xs - r, xs + r + 1
    return ii[..., y1, x1] - ii[..., y0, x1] - ii[..., y1, x0] + ii[..., y0, x0]


@jax.jit
def box_filter5(img: jnp.ndarray) -> jnp.ndarray:
    """Dense 5x5 box *sum* (not mean) with zero borders — the dense
    equivalent of sum5x5 for every pixel, as a separable conv."""
    from .conv import conv2d_valid

    pad = [(0, 0)] * (img.ndim - 2) + [(2, 2), (2, 2)]
    padded = jnp.pad(img, pad)  # zero pad: OOB contributes 0, like integral
    # NumPy (host-side) kernels, NOT jnp: inside jit a jnp.ones kernel is
    # a Tracer, which silently routed past conv2d_valid's shifted-add
    # fast path into lax.conv_general_dilated (~50x off roofline on TPU;
    # measured 21 ms of a 44 ms detect program for the two box passes).
    out = conv2d_valid(padded, np.ones((1, 5)))
    return conv2d_valid(out, np.ones((5, 1)))
