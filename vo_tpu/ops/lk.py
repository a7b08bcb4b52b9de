"""Pyramidal Lucas-Kanade feature tracking — MXU formulation.

Replaces cv::calcOpticalFlowPyrLK (feature_tracking.cpp:174-180: 21x21
window, 3 pyramid levels + base, 30 iterations, eps 0.01) with a batched
inverse-compositional-style Gauss-Newton solver over all keypoints at
once.

TPU-critical design (profiled on TPU v5e): sampling arbitrary patches by
gather is the classic TPU trap — the naive version spent 7.5 s/frame in
4 while-loops of bilinear gathers (~100 M gathered elements/s). Instead:

1. ONE integer window crop per keypoint per level ((N, S, S) gather, done
   once, not per iteration) — each keypoint gets a fixed S x S local
   window around its initial position;
2. every subsequent (sub-pixel) patch sample is expressed as two small
   dense matmuls with bilinear "tent" matrices:
       patch = A_y(q) @ window @ A_x(q)^T
   where A[i, k] = max(0, 1 - |q + i - k|) has exactly the two nonzeros
   of bilinear interpolation per row. The 30-iteration refinement loop
   therefore runs entirely on the MXU with zero gathers — the moral
   equivalent of the CUDA shared-memory patch cache, with the systolic
   array doing the interpolation arithmetic.

The local window bounds the per-level search radius to `window_margin`
pixels (coarse-to-fine propagation keeps per-level corrections small);
points that wander outside their window are reported lost — the
tracking pipelines treat them exactly like cv2's status=0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .pyramid import build_halving_pyramid


def lk_build_pyramid(img, config: "LKConfig"):
    """Halving pyramid with levels 1+ in the LK compute dtype (level 0
    stays the raw image for the detectors)."""
    dt = jnp.bfloat16 if config.precision == "bf16" else None
    return tuple(build_halving_pyramid(img, config.max_level + 1, dtype=dt))


class LKConfig(NamedTuple):
    win: int = 21  # feature_tracking.cpp:174 (21, 21)
    max_level: int = 3  # maxLevel 3 -> 4 levels
    iters: int = 30  # TermCriteria 30, 0.01 (feature_tracking.cpp:178)
    eps: float = 0.01
    min_eig_threshold: float = 1e-4  # cv2 minEigThreshold default
    # matmul precision for window crops + tent resampling: "bf16" doubles
    # MXU throughput; intensity rounding (+-0.25 at 128) perturbs tracks
    # by ~0.01-0.05 px, inside LK's own noise floor. "f32" for exactness.
    precision: str = "bf16"
    # per-level search radius beyond the patch (TPU window bound): after
    # coarse-to-fine propagation each level only refines a few pixels...
    window_margin: int = 6
    # ...except the coarsest level, which must absorb the full frame
    # motion at that scale (KITTI near-field: ~150 px at level 0 -> ~20 px
    # at level 3)
    coarse_margin: int = 24
    # mesh axis the keypoint batch is sharded over (set by
    # parallel.tracking): the early-exit convergence counts are psum'ed
    # over it so sharded runs take the SAME iteration counts as dense ones
    # (bitwise equality at any scale, not just <100 active points/shard)
    axis_name: str | None = None


class LKCache(NamedTuple):
    """Per-level cropped windows around each point (the tracked frame's
    search windows become the next frame's template windows — crops are
    paid once per frame instead of twice)."""

    wins: tuple  # per level: (N, S_L, S_L) float32
    origins: tuple  # per level: (N, 2) float32 window origins [x, y]


def lk_level_geometry(shapes, config: LKConfig):
    """Static per-level window geometry: list over levels of
    (S, full_margin, skip)."""
    wp = config.win + 2
    n_levels = min(config.max_level + 1, len(shapes))
    out = []
    for L in range(n_levels):
        Hl, Wl = shapes[L]
        if Hl < wp or Wl < wp:
            out.append((1, False, True))
            continue
        margin = (
            config.coarse_margin if L == n_levels - 1 else config.window_margin
        )
        S = min(wp + 2 * margin, Hl, Wl)
        out.append((S, S == wp + 2 * margin, False))
    return out


def _window_origins(c, S, Hl, Wl):
    ox = jnp.clip(jnp.round(c[:, 0]).astype(jnp.int32) - S // 2, 0, Wl - S)
    oy = jnp.clip(jnp.round(c[:, 1]).astype(jnp.int32) - S // 2, 0, Hl - S)
    return ox, oy


def lk_make_cache(pyr, pts, config: LKConfig = LKConfig()) -> LKCache:
    """Crop per-level windows around pts from a pyramid (used at init and
    after re-detects; tracking steps refresh the cache for free)."""
    geo = lk_level_geometry([im.shape for im in pyr], config)
    N = pts.shape[0]
    wins, origins = [], []
    for L, (S, _, skip) in enumerate(geo):
        if skip:
            wins.append(jnp.zeros(
                (N, 1, 1),
                jnp.bfloat16 if config.precision == "bf16" else jnp.float32,
            ))
            origins.append(jnp.zeros((N, 2), jnp.float32))
            continue
        Hl, Wl = pyr[L].shape
        p = pts / (2.0**L)
        ox, oy = _window_origins(p, S, Hl, Wl)
        wins.append(_crop_windows(pyr[L], ox, oy, S, config.precision))
        origins.append(jnp.stack([ox, oy], 1).astype(jnp.float32))
    return LKCache(wins=tuple(wins), origins=tuple(origins))


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
    """(N, win, win) bilinear patches centered at centers (N, 2) [x, y].

    Gather-based; used by the frontend for one-shot patch extraction.
    The LK loop below deliberately avoids this."""
    r = (win - 1) / 2.0
    offs = jnp.arange(win, dtype=jnp.float32) - r
    ys = centers[:, 1][:, None, None] + offs[None, :, None]
    xs = centers[:, 0][:, None, None] + offs[None, None, :]
    return _bilinear(img, ys, xs)


def _tent_matrix(q: jnp.ndarray, wp: int, S: int) -> jnp.ndarray:
    """(N, wp, S) bilinear interpolation matrices for patch rows/cols
    centered at local coordinate q (N,): row i samples position
    q - (wp-1)/2 + i from an S-length axis."""
    i = jnp.arange(wp, dtype=jnp.float32) - (wp - 1) / 2.0
    k = jnp.arange(S, dtype=jnp.float32)
    pos = q[:, None] + i[None, :]  # (N, wp)
    d = pos[:, :, None] - k[None, None, :]  # (N, wp, S)
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _sample_windows(
    win_img: jnp.ndarray, qx, qy, wp: int, precision: str = "f32"
) -> jnp.ndarray:
    """Sub-pixel (N, wp, wp) patches from per-point windows (N, S, S) at
    local centers (qx, qy) — two batched matmuls, no gathers."""
    S = win_img.shape[-1]
    Ay = _tent_matrix(qy, wp, S)  # (N, wp, S)
    Ax = _tent_matrix(qx, wp, S)
    if precision == "bf16":
        Ay, Ax = Ay.astype(jnp.bfloat16), Ax.astype(jnp.bfloat16)
        win_img = win_img.astype(jnp.bfloat16)
    tmp = jax.lax.dot_general(
        Ay, win_img, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (N, wp, S)
    if precision == "bf16":
        tmp = tmp.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        tmp, Ax, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _crop_windows(
    img: jnp.ndarray,
    ox: jnp.ndarray,
    oy: jnp.ndarray,
    S: int,
    precision: str = "f32",
):
    """(N, S, S) integer crops at per-point origins.

    TPU formulation (profiled): a direct (N, S, S) advanced-index gather
    runs at ~130 M elements/s and dominated the whole step. Instead:
    rows by an axis-0 gather (contiguous lanes, bandwidth-bound), then
    column selection as a batched one-hot matmul on the MXU. bf16 halves
    the row-gather traffic and doubles the matmul rate (windows are then
    bf16 throughout the LK solve — see LKConfig.precision)."""
    N = ox.shape[0]
    if precision == "bf16":
        img = img.astype(jnp.bfloat16)
    H, W = img.shape
    ar = jnp.arange(S)
    rows = img[(oy[:, None] + ar[None, :]).reshape(-1)]  # (N*S, W)
    rows = rows.reshape(N, S, W)
    cols = ox[:, None] + ar[None, :]  # (N, S) target column ids
    onehot = (
        jnp.arange(W)[None, :, None] == cols[:, None, :]
    ).astype(img.dtype)  # (N, W, S)
    return jax.lax.dot_general(
        rows, onehot, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=img.dtype,
    )


def _refine_level(
    win1, origin1, win2, origin2, p, flow, ok, S, full_margin,
    config: LKConfig,
    Hl, Wl,
):
    """Shared per-level Gauss-Newton refinement over cached windows.

    Returns (v, ok) — flow at this level and updated validity."""
    win = config.win
    wp = win + 2
    N = p.shape[0]

    # Template patch + gradients at the TEMPLATE position p. A template
    # partially outside its window (point near the level border, or window
    # center drifted beyond the margin) cannot be refined at this level:
    # such points keep their propagated flow — the analogue of cv2's
    # border-replicate degradation, without killing the track.
    q1 = p - origin1
    half = (wp - 1) / 2.0
    lo = half - 1.0
    hi = S - half
    tmpl_out = (
        (q1[:, 0] < lo) | (q1[:, 0] > hi)
        | (q1[:, 1] < lo) | (q1[:, 1] > hi)
    )
    big = _sample_windows(win1, q1[:, 0], q1[:, 1], wp, config.precision)
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
    active0 = solvable & ~tmpl_out & ok

    def _gsum(x):
        # global count when the keypoint batch is sharded (see LKConfig)
        return lax.psum(x, config.axis_name) if config.axis_name else x

    n_active0 = jnp.maximum(_gsum(jnp.sum(active0)), 1)

    def cond(carry):
        # early exit once (almost) every active point converged or froze
        # — the slowest 1% are usually divergent tracks not worth gating
        # the whole batch on; data-dependent trip count, gather-free trips
        _, converged, it = carry
        remaining = _gsum(jnp.sum(active0 & ~converged))
        return (it < config.iters) & (remaining * 100 > n_active0)

    def body(carry):
        v, converged, it = carry
        q2 = p + v - origin2
        out_w = (
            (q2[:, 0] < lo) | (q2[:, 0] > hi)
            | (q2[:, 1] < lo) | (q2[:, 1] > hi)
        )
        I = _sample_windows(
            win2, q2[:, 0], q2[:, 1], wp, config.precision
        )[:, 1:-1, 1:-1]
        dI = I - T
        bx = jnp.sum(dI * Tx, axis=(1, 2))
        by = jnp.sum(dI * Ty, axis=(1, 2))
        dvx = -(gyy * bx - gxy * by) * inv_det
        dvy = -(-gxy * bx + gxx * by) * inv_det
        step = jnp.stack([dvx, dvy], axis=1)
        move = active0 & ~converged & ~out_w
        v_new = jnp.where(move[:, None], v + step, v)
        now_conv = (jnp.sum(step * step, axis=1) < config.eps**2) | out_w
        return v_new, converged | now_conv, it + 1

    v, _, _ = lax.while_loop(
        cond,
        body,
        (flow, jnp.zeros((N,), bool), jnp.asarray(0, jnp.int32)),
    )

    c = p + v
    inside = (
        (c[:, 0] >= 0) & (c[:, 0] <= Wl - 1)
        & (c[:, 1] >= 0) & (c[:, 1] <= Hl - 1)
    )
    # tmpl_out points were never refined here: their (garbage) template
    # must not decide solvability — they pass through to finer levels.
    ok = ok & jnp.where(tmpl_out, True, solvable) & inside
    if full_margin:
        # a point that ENDS outside its search window exceeded the level's
        # search radius: divergent -> lost (skipped on levels too small to
        # host the full margin, where the box degenerates)
        q2f = c - origin2
        ended_out = (
            (q2f[:, 0] < lo) | (q2f[:, 0] > hi)
            | (q2f[:, 1] < lo) | (q2f[:, 1] > hi)
        )
        ok = ok & (tmpl_out | ~ended_out)
    return v, ok


def _track_over_levels(get_win1, pyr2, pts, valid, config: LKConfig):
    """Core coarse-to-fine loop. `get_win1(L, S, Hl, Wl, p)` supplies the
    template window + origin for level L. Returns
    (new_pts, status, cache2) with cache2 = this frame's search windows."""
    geo = lk_level_geometry([im.shape for im in pyr2], config)
    n_levels = len(geo)
    N = pts.shape[0]
    H0, W0 = pyr2[0].shape

    flow = jnp.zeros((N, 2), jnp.float32)
    ok = valid
    wins2 = [None] * n_levels
    origins2 = [None] * n_levels

    for L in reversed(range(n_levels)):
        S, full_margin, skip = geo[L]
        Hl, Wl = pyr2[L].shape
        if skip:
            wins2[L] = jnp.zeros(
                (N, 1, 1),
                jnp.bfloat16 if config.precision == "bf16" else jnp.float32,
            )
            origins2[L] = jnp.zeros((N, 2), jnp.float32)
            continue
        p = pts / (2.0**L)
        c0 = p + flow
        ox2, oy2 = _window_origins(c0, S, Hl, Wl)
        win2 = _crop_windows(pyr2[L], ox2, oy2, S, config.precision)
        origin2 = jnp.stack([ox2, oy2], 1).astype(jnp.float32)
        wins2[L] = win2
        origins2[L] = origin2

        win1, origin1 = get_win1(L, S, Hl, Wl, p)
        v, ok = _refine_level(
            win1, origin1, win2, origin2, p, flow, ok, S, full_margin,
            config, Hl, Wl,
        )
        flow = v * 2.0 if L > 0 else v

    new_pts = pts + flow
    inside0 = (
        (new_pts[:, 0] >= 0)
        & (new_pts[:, 0] <= W0 - 1)
        & (new_pts[:, 1] >= 0)
        & (new_pts[:, 1] <= H0 - 1)
    )
    status = ok & inside0
    out = jnp.where(status[:, None], new_pts, pts)
    cache2 = LKCache(wins=tuple(wins2), origins=tuple(origins2))
    return out, status, cache2


@functools.partial(jax.jit, static_argnames=("config",))
def lk_pyramid_track(
    pyr1: tuple,
    pyr2: tuple,
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    config: LKConfig = LKConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Track pts (N, 2) [x, y] from pyramid pyr1 to pyr2.

    Returns (new_pts (N, 2), status (N,) bool). Crops template windows
    from pyr1 itself; the pipelines use lk_pyramid_track_cached to reuse
    the previous step's search windows instead."""

    def get_win1(L, S, Hl, Wl, p):
        ox1, oy1 = _window_origins(p, S, Hl, Wl)
        win1 = _crop_windows(pyr1[L], ox1, oy1, S)
        return win1, jnp.stack([ox1, oy1], 1).astype(jnp.float32)

    out, status, _ = _track_over_levels(get_win1, pyr2, pts, valid, config)
    return out, status


@functools.partial(jax.jit, static_argnames=("config",))
def lk_pyramid_track_cached(
    cache: LKCache,
    pyr2: tuple,
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    config: LKConfig = LKConfig(),
):
    """Like lk_pyramid_track but the template windows come from `cache`
    (the previous step's search windows over the same image): halves the
    per-step crop cost. Returns (new_pts, status, cache2) where cache2
    feeds the next step."""

    def get_win1(L, S, Hl, Wl, p):
        return cache.wins[L], cache.origins[L]

    return _track_over_levels(get_win1, pyr2, pts, valid, config)


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
