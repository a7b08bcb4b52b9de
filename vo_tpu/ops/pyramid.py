"""Image pyramids with bilinear (half-pixel-center) resampling.

Replaces the reference's per-level `cv::resize(..., INTER_LINEAR)` pyramid
(orb.cpp:111-127, scaleFactor 1.2, 8 levels). Each level has a static shape,
so every level compiles once; `jax.image.resize(method="linear")` uses the
same half-pixel sampling convention as OpenCV's INTER_LINEAR.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pyramid_shapes(
    shape: tuple[int, int], n_levels: int = 8, scale_factor: float = 1.2
) -> list[tuple[int, int]]:
    """Static per-level (H, W): level l is round(dim / scale_factor**l)."""
    H, W = shape
    return [
        (max(8, round(H / scale_factor**l)), max(8, round(W / scale_factor**l)))
        for l in range(n_levels)
    ]


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_out: int, n_in: int) -> tuple:
    """Dense (n_out, n_in) half-pixel bilinear sampling matrix.

    Pure point-sampled bilinear (cv2 INTER_LINEAR convention, no
    anti-aliasing — unlike jax.image.resize): src = (dst + 0.5)*s - 0.5,
    clamped. Returned as a hashable tuple-wrapped numpy array."""
    import numpy as np

    s = n_in / n_out
    src = (np.arange(n_out) + 0.5) * s - 0.5
    src = np.clip(src, 0.0, n_in - 1.0)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w1 = src - i0
    M = np.zeros((n_out, n_in), dtype=np.float32)
    M[np.arange(n_out), i0] += 1.0 - w1
    M[np.arange(n_out), i1] += w1
    return (M,)


@functools.partial(jax.jit, static_argnames=("shape",))
def resize_bilinear(img: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize as two banded-matrix matmuls (MXU-friendly), using
    cv2 INTER_LINEAR's point-sampled convention (no anti-alias filter)."""
    H_out, W_out = shape
    H_in, W_in = img.shape[-2:]
    My = jnp.asarray(_interp_matrix(H_out, H_in)[0], img.dtype)
    Mx = jnp.asarray(_interp_matrix(W_out, W_in)[0], img.dtype)
    out = jnp.einsum(
        "oh,...hw->...ow", My, img, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "pw,...hw->...hp", Mx, out, precision=jax.lax.Precision.HIGHEST
    )


def build_pyramid(
    img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2
) -> list[jnp.ndarray]:
    """List of n_levels images, level 0 = input. Every level is resampled
    from level 0 (as cv::resize(pyramid[0], ...), orb.cpp:116-119)."""
    shapes = pyramid_shapes(img.shape[-2:], n_levels, scale_factor)
    return [img] + [resize_bilinear(img, s) for s in shapes[1:]]


@functools.lru_cache(maxsize=None)
def _down2_matrix(n_out: int, n_in: int) -> tuple:
    """Dense (n_out, n_in) banded matrix fusing a 5-tap binomial blur
    (reflect-101 borders) with 2x decimation: out[i] = sum_k
    taps[k] * x[reflect(2i + k - 2)]."""
    import numpy as np

    taps = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
    M = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        for k in range(5):
            j = 2 * i + k - 2
            if j < 0:
                j = -j  # reflect-101
            elif j > n_in - 1:
                j = 2 * (n_in - 1) - j
            M[i, j] += taps[k]
    return (M,)


def _binomial_down2(img: jnp.ndarray) -> jnp.ndarray:
    """Fused 5-tap binomial blur + 2x decimation as two banded matmuls
    (exactly `binomial_blur5(img)[..., ::2, ::2]`, reflect-101 borders).

    Replaces the blur-then-strided-slice pyramid step: the lane-dimension
    stride-2 slice lowered to a gather that measured ~1.5 ms/step in the
    tracking profile (pyramid.py 'gather' fusions — ~100x the HBM
    roofline for this stage); banded matmuls ride the MXU and skip the
    full-resolution intermediate entirely."""
    H, W = img.shape[-2:]
    Ho, Wo = -(-H // 2), -(-W // 2)
    My = jnp.asarray(_down2_matrix(Ho, H)[0])
    Mx = jnp.asarray(_down2_matrix(Wo, W)[0])
    acc = jnp.einsum(
        "oh,...hw->...ow", My, img.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.einsum(
        "pw,...hw->...hp", Mx, acc, precision=jax.lax.Precision.HIGHEST
    )
    return out.astype(img.dtype)


def build_halving_pyramid(
    img: jnp.ndarray, n_levels: int, dtype=None
) -> list[jnp.ndarray]:
    """Power-of-2 pyramid for pyramidal LK (cv::buildOpticalFlowPyramid
    semantics): each level is a 5-tap binomial blur + 2x decimation
    (fused into banded MXU matmuls, `_binomial_down2`).

    Level 0 is the input unchanged (detectors read it at full precision);
    `dtype` (e.g. bfloat16) applies to levels 1+ only — their sole consumer
    is the bf16 LK window path, so halving the conv/storage cost there is
    free accuracy-wise."""
    import os as _os

    if _os.environ.get("VO_TPU_PYR") == "slice":
        # A/B reference path: blur then lane-strided slice (the slice
        # lowers to a slow gather — see _binomial_down2's docstring).
        from .conv import binomial_blur5

        levels = [img]
        cur = img if dtype is None else img.astype(dtype)
        for _ in range(n_levels - 1):
            cur = binomial_blur5(cur)[..., ::2, ::2]
            levels.append(cur)
        return levels

    levels = [img]
    cur = img if dtype is None else img.astype(dtype)
    for _ in range(n_levels - 1):
        cur = _binomial_down2(cur)
        levels.append(cur)
    return levels
