"""Harris corner response.

Re-expression of src/cuda/HarrisScore.cu with its three bugs fixed
(SURVEY.md §2c): (1) Sxy is blurred from Ixy, not Iy² (HarrisScore.cu:57);
(2) k is a float, 0.04, not an int-truncated 0 (:23, :42); (3) no buffer
over-allocation hack. The structure tensor is computed densely (Sobel →
products → Gaussian window) and the response gathered at keypoint indices —
the reference's per-sub-call H2D/D2H ping-pong disappears into one fused
XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .conv import gaussian_blur, sobel


@functools.partial(jax.jit, static_argnames=("block_size",))
def harris_response(
    img: jnp.ndarray, block_size: int = 7, k: float = 0.04
) -> jnp.ndarray:
    """Dense (H, W) Harris response det(M) - k*trace(M)^2."""
    ix, iy = sobel(img)
    sxx = gaussian_blur(ix * ix, block_size)
    syy = gaussian_blur(iy * iy, block_size)
    sxy = gaussian_blur(ix * iy, block_size)
    det = sxx * syy - sxy * sxy
    trace = sxx + syy
    return det - k * trace * trace


def harris_at(
    img: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    block_size: int = 7,
    k: float = 0.04,
) -> jnp.ndarray:
    """Harris score gathered at integer keypoint coordinates
    (the d_HarrisScore gather, HarrisScore.cu:23-40)."""
    resp = harris_response(img, block_size, k)
    return resp[ys.astype(jnp.int32), xs.astype(jnp.int32)]
