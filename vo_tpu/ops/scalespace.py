"""Gaussian scale space + DoG pyramid for SIFT (Lowe 2004 / OpenCV layout).

The reference uses cv::SIFT for its matching_sift / tracking_sift /
tracking_sift_ba configs (feature_matching.cpp:27, with_bundle_adjustment
.cpp:142) — an opaque OpenCV call. This is a from-scratch TPU-native scale
space with OpenCV's structure so downstream constants (contrast 0.04, edge
10, sigma 1.6, 3 layers/octave) keep their published meaning:

- optional initial 2x upsample (OpenCV firstOctave=-1) with the base blur
  sqrt(sigma^2 - 4*0.5^2);
- each octave holds n_layers+3 Gaussian images; incremental blurs
  sig_i = sigma*2^(i/n) applied separably (the HBM-friendly formulation,
  cf. GaussianBlur1D.cu separable design);
- next octave seeded by exact 2x decimation of layer n_layers;
- DoG = adjacent differences, n_layers+2 per octave.

Everything is static-shaped: octave count derives from the (static) image
shape at trace time.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .conv import gaussian_kernel_1d, separable_conv_same
from .pyramid import resize_bilinear


def blur_sigma(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with OpenCV's kernel-size rule
    (ksize = 2*round(4*sigma)+1 for f32 images)."""
    if sigma <= 0:
        return img
    ksize = 2 * int(round(4.0 * sigma)) + 1
    k = gaussian_kernel_1d(ksize, sigma).astype(np.float32)
    return separable_conv_same(img, k, k)


def n_octaves_for(shape: tuple[int, int], upsample: bool) -> int:
    """OpenCV: actualNOctaves up to log2(min dim) - 2 (keeps the smallest
    octave >= ~8 px)."""
    h, w = shape
    if upsample:
        h, w = h * 2, w * 2
    return max(1, int(round(math.log2(min(h, w)))) - 2)


def build_scale_space(
    img: jnp.ndarray,
    n_layers: int = 3,
    sigma: float = 1.6,
    upsample: bool = True,
    assumed_blur: float = 0.5,
):
    """Returns (gauss, dogs): lists over octaves of (n_layers+3, Ho, Wo)
    and (n_layers+2, Ho, Wo) stacks, plus nothing else — deterministic,
    fully jit-compatible (shapes static)."""
    if upsample:
        H, W = img.shape
        base = resize_bilinear(img, (2 * H, 2 * W))
        sig_diff = math.sqrt(
            max(sigma * sigma - (2.0 * assumed_blur) ** 2, 0.01)
        )
    else:
        base = img
        sig_diff = math.sqrt(
            max(sigma * sigma - assumed_blur * assumed_blur, 0.01)
        )
    base = blur_sigma(base, sig_diff)

    n_oct = n_octaves_for(img.shape, upsample)
    k = 2.0 ** (1.0 / n_layers)
    # incremental sigmas between successive layers (OpenCV sig[] array)
    sig_prev = sigma
    inc = []
    for i in range(1, n_layers + 3):
        sig_total = sigma * (k**i)
        inc.append(math.sqrt(sig_total**2 - sig_prev**2))
        sig_prev = sig_total

    gauss, dogs = [], []
    cur = base
    for o in range(n_oct):
        layers = [cur]
        for i in range(n_layers + 2):
            layers.append(blur_sigma(layers[-1], inc[i]))
        g = jnp.stack(layers)  # (n_layers+3, Ho, Wo)
        gauss.append(g)
        dogs.append(g[1:] - g[:-1])
        # seed next octave: decimate layer n_layers (sigma doubled)
        cur = layers[n_layers][::2, ::2]
    return gauss, dogs


@functools.lru_cache(maxsize=None)
def octave_meta(shape: tuple[int, int], upsample: bool):
    """(octave index -> (scale to input coords)) helper table."""
    n_oct = n_octaves_for(shape, upsample)
    base = 0.5 if upsample else 1.0
    return [base * (2.0**o) for o in range(n_oct)]
