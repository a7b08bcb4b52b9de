"""Pyramidal Lucas-Kanade optical flow (Bouguet-style).

TPU-native replacement for cv::calcOpticalFlowPyrLK as used by the tracking
drivers (feature_tracking.cpp:174-180: 21x21 window, maxLevel 3, 30
iterations, eps 0.01). All N keypoints iterate together as batched (N, w, w)
patch tensors: bilinear patch gathers, a 2x2 normal-matrix solve per point,
and fixed-trip-count Gauss-Newton loops with per-point convergence freezing
(`lax.fori_loop` — no data-dependent control flow under jit).

Template gradients are central differences of the level-(L) source patch,
and the coarse-to-fine guess doubling follows the standard pyramidal scheme.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .pyramid import build_halving_pyramid


class LKConfig(NamedTuple):
    win: int = 21  # window size (feature_tracking.cpp:174)
    max_level: int = 3  # cv2 maxLevel semantics: levels 0..3
    iters: int = 30
    eps: float = 0.01
    min_eig_threshold: float = 1e-4  # cv2 default minEigThreshold


def _bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W) at float coords arrays (clamped)."""
    H, W = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def _sample_patches(img: jnp.ndarray, centers: jnp.ndarray, win: int) -> jnp.ndarray:
    """(N, win, win) bilinear patches centered at centers (N, 2) [x, y]."""
    r = (win - 1) / 2.0
    offs = jnp.arange(win, dtype=jnp.float32) - r
    ys = centers[:, 1][:, None, None] + offs[None, :, None]
    xs = centers[:, 0][:, None, None] + offs[None, None, :]
    return _bilinear(img, ys, xs)


@functools.partial(jax.jit, static_argnames=("config",))
def lk_pyramid_track(
    pyr1: tuple,
    pyr2: tuple,
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    config: LKConfig = LKConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Track pts (N, 2) [x, y] from pyramid pyr1 to pyr2.

    Returns (new_pts (N, 2), status (N,) bool). Pyramids are tuples of
    (H/2^l, W/2^l) images (build_halving_pyramid). Failed/invalid points
    keep their input position with status False.
    """
    win = config.win
    wp = win + 2  # sample one-pixel ring for central-difference gradients
    n_levels = min(config.max_level + 1, len(pyr1))
    N = pts.shape[0]
    H0, W0 = pyr1[0].shape

    flow = jnp.zeros((N, 2), jnp.float32)
    ok = valid
    min_eig_final = jnp.zeros((N,), jnp.float32)

    for L in reversed(range(n_levels)):
        img1, img2 = pyr1[L], pyr2[L]
        Hl, Wl = img1.shape
        p = pts / (2.0**L)

        big = _sample_patches(img1, p, wp)  # (N, wp, wp)
        T = big[:, 1:-1, 1:-1]
        Tx = (big[:, 1:-1, 2:] - big[:, 1:-1, :-2]) * 0.5
        Ty = (big[:, 2:, 1:-1] - big[:, :-2, 1:-1]) * 0.5

        gxx = jnp.sum(Tx * Tx, axis=(1, 2))
        gxy = jnp.sum(Tx * Ty, axis=(1, 2))
        gyy = jnp.sum(Ty * Ty, axis=(1, 2))
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        # smaller eigenvalue of G, normalized per-pixel as in cv2
        min_eig = (trace - jnp.sqrt(trace * trace - 4 * det + 1e-12)) / 2.0
        min_eig = min_eig / (win * win)
        solvable = (det > 1e-7) & (min_eig > config.min_eig_threshold)

        inv_det = 1.0 / jnp.where(det > 1e-7, det, 1.0)

        def body(_, carry):
            v, converged = carry
            c2 = p + v  # current position in this level
            big2 = _sample_patches(img2, c2, wp)
            I = big2[:, 1:-1, 1:-1]
            dI = I - T
            bx = jnp.sum(dI * Tx, axis=(1, 2))
            by = jnp.sum(dI * Ty, axis=(1, 2))
            # solve G dv = -b
            dvx = -(gyy * bx - gxy * by) * inv_det
            dvy = -(-gxy * bx + gxx * by) * inv_det
            step = jnp.stack([dvx, dvy], axis=1)
            move = solvable & ~converged
            v_new = jnp.where(move[:, None], v + step, v)
            now_conv = jnp.sum(step * step, axis=1) < config.eps**2
            return v_new, converged | now_conv

        v0 = flow  # guess from coarser level, already in this level's scale
        v, _ = lax.fori_loop(
            0, config.iters, body, (v0, jnp.zeros((N,), bool))
        )

        # position must stay trackable at this level
        c = p + v
        inside = (
            (c[:, 0] >= 0) & (c[:, 0] <= Wl - 1) & (c[:, 1] >= 0) & (c[:, 1] <= Hl - 1)
        )
        ok = ok & solvable & inside
        min_eig_final = min_eig
        flow = v * 2.0 if L > 0 else v  # propagate guess to next finer level

    new_pts = pts + flow
    inside0 = (
        (new_pts[:, 0] >= 0)
        & (new_pts[:, 0] <= W0 - 1)
        & (new_pts[:, 1] >= 0)
        & (new_pts[:, 1] <= H0 - 1)
    )
    status = ok & inside0
    out = jnp.where(status[:, None], new_pts, pts)
    return out, status


def track(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    config: LKConfig = LKConfig(),
):
    """Convenience: build both pyramids and track (one jitted program when
    called under jit; pipelines cache the previous frame's pyramid)."""
    n = config.max_level + 1
    pyr1 = tuple(build_halving_pyramid(img1, n))
    pyr2 = tuple(build_halving_pyramid(img2, n))
    return lk_pyramid_track(pyr1, pyr2, pts, valid, config)
