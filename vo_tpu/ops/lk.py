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
    # block early exit: stop iterating a level once fewer than
    # 1/exit_mult of the initially-active points are unconverged (the
    # tail is dominated by divergent tracks). 25 = exit at <4%
    # remaining; raising the fraction exits earlier at some endpoint
    # cost — A/B with scripts/bench_lk_knobs.py + the hard-seq ATE.
    exit_mult: int = 25
    # mesh axis the keypoint batch is sharded over (set by
    # parallel.tracking): the early-exit convergence counts are psum'ed
    # over it so sharded runs take the SAME iteration counts as dense ones
    # (bitwise equality at any scale, not just <100 active points/shard)
    axis_name: str | None = None
    # window memory layout: "lanes" stores windows as (S+10, S+10, N)
    # with keypoints on the TPU lane dimension — every solver op is a
    # full-width VPU op (measured 2.8x over the batched tent-matmul
    # sampling at level-0 geometry). "pallas" keeps the lanes storage but
    # runs the whole per-level iteration loop as one fused kernel with
    # the window stacks VMEM-resident and a cached integer guard patch
    # (ops/lk_pallas.py) — the XLA lanes path re-streams the stacks from
    # HBM and re-runs the full aligned-select sampler every iteration.
    # DEFAULT = pallas since the round-5 guard-patch kernel first beat
    # lanes on silicon: 6.46 vs 6.86 ms/full-step (A/B
    # scripts/bench_lk_ab.py 100, KITTI shape; guard G=3 measured 6.85 —
    # the wider tent costs more than the saved rebases). "batch" keeps
    # the (N, S, S) batched MXU form (comparison / small-N CPU tests).
    layout: str = "pallas"


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


def _lanes_width(N: int, config: LKConfig) -> int:
    """Stored lane count. The pallas layout rounds up to the 128-lane
    grid so the kernel call never re-pads the stacks (a jnp.pad there
    is two full-stack HBM copies per level per step; pre-padding here
    fuses into the crop/transpose producer). The lanes layout keeps the
    exact count — every aligned-select pass scales with lane width."""
    if config.layout == "pallas":
        return (N + 127) // 128 * 128
    return N


def _to_layout(win_nss: jnp.ndarray, config: LKConfig) -> jnp.ndarray:
    """(N, S, S) crop -> storage layout (lanes stacks are pre-padded so
    the per-iteration sampler never pads)."""
    if config.layout != "batch":
        win = _pad_lanes(jnp.transpose(win_nss, (1, 2, 0)), config)
        pad = _lanes_width(win.shape[2], config) - win.shape[2]
        if pad:
            win = jnp.pad(win, ((0, 0), (0, 0), (0, pad)))
        return win
    return win_nss


def _zero_win(N: int, config: LKConfig) -> jnp.ndarray:
    dt = jnp.bfloat16 if config.precision == "bf16" else jnp.float32
    if config.layout != "batch":
        return jnp.zeros((1, 1, _lanes_width(N, config)), dt)
    return jnp.zeros((N, 1, 1), dt)


def lk_make_cache(pyr, pts, config: LKConfig = LKConfig()) -> LKCache:
    """Crop per-level windows around pts from a pyramid (used at init and
    after re-detects; tracking steps refresh the cache for free)."""
    geo = lk_level_geometry([im.shape for im in pyr], config)
    N = pts.shape[0]
    wins, origins = [], []
    for L, (S, _, skip) in enumerate(geo):
        if skip:
            wins.append(_zero_win(N, config))
            origins.append(jnp.zeros((N, 2), jnp.float32))
            continue
        Hl, Wl = pyr[L].shape
        p = pts / (2.0**L)
        ox, oy = _window_origins(p, S, Hl, Wl)
        wins.append(
            _to_layout(_crop_windows(pyr[L], ox, oy, S, config.precision),
                       config)
        )
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


# Panel stride; each panel carries an S-column halo. The crop's gather
# traffic scales with N*S*(PANEL_W + S), so small panels cut it ~4x; the
# floor is panel-build overhead + halo duplication. Silicon A/B
# (scripts/bench_lk_knobs.py, 100 full tracking steps, KITTI shape):
# PW=256 8.53 ms/step, 128 7.66, 64 6.79, 32 6.94 — PW is bit-exact
# (pure crop layout), so 64 is a free 1.7 ms/step on the flagship.
_PANEL_W = 64


def _crop_windows(
    img: jnp.ndarray,
    ox: jnp.ndarray,
    oy: jnp.ndarray,
    S: int,
    precision: str = "f32",
):
    """(N, S, S) integer crops at per-point origins.

    TPU formulation (profiled, round 2): a direct (N, S, S)
    advanced-index gather runs at ~130 M elements/s; a full-width rows
    gather + one-hot contraction over W costs ~2.6 ms at level 0 because
    both the gather traffic and the contraction scale with W. Instead the
    image is cut into overlapped column panels of stride _PANEL_W (halo
    S, so every window lies inside exactly one panel): rows are gathered
    from the point's panel (narrow rows — ~4x less traffic) and columns
    selected by a one-hot contraction over only _PANEL_W + S lanes
    (~0.9 ms measured, 2.9x). bf16 halves traffic and doubles the matmul
    rate (windows stay bf16 through the LK solve — LKConfig.precision)."""
    N = ox.shape[0]
    if precision == "bf16":
        img = img.astype(jnp.bfloat16)
    H, W = img.shape
    PW = _PANEL_W
    P = (W + PW - 1) // PW
    pad = P * PW + S - W
    imgp = jnp.pad(img, ((0, 0), (0, pad)))
    panels = jnp.concatenate(
        [imgp[:, p * PW : p * PW + PW + S] for p in range(P)], axis=0
    )  # (P*H, PW+S)
    pid = ox // PW
    oxl = ox - pid * PW  # in [0, PW)
    ar = jnp.arange(S)
    rows = panels[(pid[:, None] * H + oy[:, None] + ar[None, :]).reshape(-1)]
    rows = rows.reshape(N, S, PW + S)
    cols = oxl[:, None] + ar[None, :]  # (N, S) target column ids
    onehot = (
        jnp.arange(PW + S)[None, :, None] == cols[:, None, :]
    ).astype(img.dtype)  # (N, PW+S, S)
    return jax.lax.dot_general(
        rows, onehot, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=img.dtype,
    )


def _sample_windows_lanes(
    winp: jnp.ndarray, qx, qy, wp: int, S: int
) -> jnp.ndarray:
    """Points-on-lanes sub-pixel sampling: winp is the zero-padded
    (S + 10, S + 10, N) window stack (_pad_lanes), and the result is the
    (wp, wp, N) bilinear patch at local centers (qx, qy) in UNPADDED
    window coordinates.

    TPU rationale (profiled): the batched tent-matmul form puts N on the
    MXU batch dim with tiny (wp, S) matrices — ~5% utilization. With
    keypoints on LANES every op is a full-width VPU op: integer row/col
    alignment is a static-slice mask-accumulate over the S - wp + 3
    possible offsets (two-level 8-blocked when that range is wide, i.e.
    the coarse level), and the fractional blend is two FMAs. Measured
    2.8x faster than the matmul form at level-0 geometry."""
    f32 = jnp.float32
    half = (wp - 1) // 2
    by = jnp.floor(qy)
    bx = jnp.floor(qx)
    fy = (qy - by).astype(f32)[None, None, :]
    fx = (qx - bx).astype(f32)[None, None, :]
    oy = by.astype(jnp.int32) - half  # in [-1, S - wp + 1] when in range
    ox = bx.astype(jnp.int32) - half

    def aligned(x, o_idx, rows_out, axis):
        """Σ_o (o_idx == o) * x[o + 1 : o + 1 + rows_out] along `axis`,
        o in [-1, S - wp + 1]; two-level 8-blocked when the range > 16."""
        n_off = S - wp + 3

        def sl(arr, start, size):
            return lax.slice_in_dim(arr, start, start + size, axis=axis)

        if n_off <= 16:
            acc = None
            for o in range(-1, S - wp + 2):
                m = (o_idx == o).astype(f32)
                m = m[None, None, :]
                term = m * sl(x, o + 1, rows_out).astype(f32)
                acc = term if acc is None else acc + term
            return acc
        # two-level: o + 1 = 8 * blk + fine, fine in [0, 8) — cuts the
        # select to ~n_off/8 + 8 terms (the coarse level's n_off, e.g. 51,
        # would otherwise cost 51 full-window passes)
        blk_idx = (o_idx + 1) // 8
        fine_idx = (o_idx + 1) - 8 * blk_idx
        n_blk = (n_off - 1) // 8 + 1  # blk of max o fits by _pad_lanes
        mid = None
        for b in range(n_blk):
            m = (blk_idx == b).astype(f32)[None, None, :]
            term = m * sl(x, 8 * b, rows_out + 7).astype(f32)
            mid = term if mid is None else mid + term
        acc = None
        for f in range(8):
            m = (fine_idx == f).astype(f32)[None, None, :]
            term = m * sl(mid, f, rows_out)
            acc = term if acc is None else acc + term
        return acc

    rows_al = aligned(winp, oy, wp + 1, 0)  # (wp+1, S+3, N) f32
    rows_i = (
        lax.slice_in_dim(rows_al, 0, wp, axis=0) * (1.0 - fy)
        + lax.slice_in_dim(rows_al, 1, wp + 1, axis=0) * fy
    )  # (wp, S+3, N)
    cols_al = aligned(rows_i, ox, wp + 1, 1)  # (wp, wp+1, N)
    return (
        lax.slice_in_dim(cols_al, 0, wp, axis=1) * (1.0 - fx)
        + lax.slice_in_dim(cols_al, 1, wp + 1, axis=1) * fx
    )


def _lanes_pad_after(config: LKConfig | None = None) -> int:
    """Trailing zero-pad rows of the lanes stacks: nine covers the
    o in [-1, S - wp + 1] alignment range, the +1 blend lookahead, and
    the two-level 8-blocked select's up-to-7-row overshoot (block
    starts are 8-aligned). The pallas layout's GUARD patch extraction
    reads 2*_GUARD further (ops/lk_pallas.py _extract_guard_patch)."""
    if config is not None and config.layout == "pallas":
        from .lk_pallas import _GUARD

        return 9 + 2 * _GUARD
    return 9


def _pad_lanes(
    win: jnp.ndarray, config: LKConfig | None = None
) -> jnp.ndarray:
    """(S, S, N) -> (S + 1 + pad_after, ..., N) zero-padded stack (one
    row/col before; see _lanes_pad_after)."""
    pa = _lanes_pad_after(config)
    return jnp.pad(win, ((1, pa), (1, pa), (0, 0)))


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

    def _finish(v, solvable):
        c = p + v
        inside = (
            (c[:, 0] >= 0) & (c[:, 0] <= Wl - 1)
            & (c[:, 1] >= 0) & (c[:, 1] <= Hl - 1)
        )
        # tmpl_out points were never refined here: their (garbage)
        # template must not decide solvability — they pass through to
        # finer levels.
        okf = ok & jnp.where(tmpl_out, True, solvable) & inside
        if full_margin:
            # a point that ENDS outside its search window exceeded the
            # level's search radius: divergent -> lost (skipped on levels
            # too small to host the full margin, where the box
            # degenerates)
            q2f = c - origin2
            ended_out = (
                (q2f[:, 0] < lo) | (q2f[:, 0] > hi)
                | (q2f[:, 1] < lo) | (q2f[:, 1] > hi)
            )
            okf = okf & (tmpl_out | ~ended_out)
        return v, okf

    if config.layout == "pallas" and config.axis_name is None:
        # fused VMEM-resident iteration loop (ops/lk_pallas.py); storage
        # layout identical to "lanes". Sharded tracking (axis_name set)
        # stays on the lanes path: its early-exit counts must be psum'd
        # across the mesh for dense/sharded bitwise equality.
        from .lk_pallas import refine_level_pallas

        v, solvable = refine_level_pallas(
            win1, win2, q1, p - origin2, flow, ok & ~tmpl_out, S, config
        )
        return _finish(v, solvable)

    lanes = config.layout == "lanes"
    if lanes:
        # windows are (S+10, S+10, N) zero-padded lanes stacks
        sample = lambda w, q: _sample_windows_lanes(w, q[:, 0], q[:, 1], wp, S)
        interior = lambda b: b[1:-1, 1:-1]
        red = lambda a: jnp.sum(a, axis=(0, 1))
        bc = lambda m: m[None, None, :]
        big = sample(win1, q1)
        T = interior(big)
        Tx = (big[1:-1, 2:] - big[1:-1, :-2]) * 0.5
        Ty = (big[2:, 1:-1] - big[:-2, 1:-1]) * 0.5
    else:
        sample = lambda w, q: _sample_windows(
            w, q[:, 0], q[:, 1], wp, config.precision
        )
        interior = lambda b: b[:, 1:-1, 1:-1]
        red = lambda a: jnp.sum(a, axis=(1, 2))
        bc = lambda m: m[:, None]
        big = sample(win1, q1)
        T = interior(big)
        Tx = (big[:, 1:-1, 2:] - big[:, 1:-1, :-2]) * 0.5
        Ty = (big[:, 2:, 1:-1] - big[:, :-2, 1:-1]) * 0.5

    gxx = red(Tx * Tx)
    gxy = red(Tx * Ty)
    gyy = red(Ty * Ty)
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
        # early exit once ~96% of active points converged or froze — the
        # slow tail is dominated by divergent tracks not worth gating the
        # whole batch on (measured: 1% -> 4% saves iterations with no
        # change in cv2 endpoint parity); data-dependent trip count
        _, converged, it = carry
        remaining = _gsum(jnp.sum(active0 & ~converged))
        return (it < config.iters) & (remaining * config.exit_mult > n_active0)

    def body(carry):
        v, converged, it = carry
        q2 = p + v - origin2
        out_w = (
            (q2[:, 0] < lo) | (q2[:, 0] > hi)
            | (q2[:, 1] < lo) | (q2[:, 1] > hi)
        )
        I = interior(sample(win2, q2))
        dI = I - T
        bx = red(dI * Tx)
        by = red(dI * Ty)
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

    return _finish(v, solvable)


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
            wins2[L] = _zero_win(N, config)
            origins2[L] = jnp.zeros((N, 2), jnp.float32)
            continue
        p = pts / (2.0**L)
        c0 = p + flow
        ox2, oy2 = _window_origins(c0, S, Hl, Wl)
        win2 = _to_layout(
            _crop_windows(pyr2[L], ox2, oy2, S, config.precision), config
        )
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
        win1 = _to_layout(
            _crop_windows(pyr1[L], ox1, oy1, S, config.precision), config
        )
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
