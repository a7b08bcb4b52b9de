"""SIFT detect-and-compute — from-scratch TPU-native implementation.

The reference's SIFT configs (matching_sift, tracking_sift, tracking_sift_ba)
call cv::SIFT::create() with defaults (feature_matching.cpp:27,
with_bundle_adjustment.cpp:142): nOctaveLayers=3, contrastThreshold=0.04,
edgeThreshold=10, sigma=1.6, 2x initial upsample. This module re-expresses
the whole detector as one fused jitted program over fixed-capacity masked
arrays (like the ORB frontend):

- DoG extrema: dense 26-neighbor max/min masks per octave (no scalar
  scanning), |response| top-k per octave to a static budget;
- subpixel refinement: iterated 3x3x3 Newton steps with integer
  re-localization when any |offset| >= 0.5 (OpenCV adjustLocalExtrema,
  up to 5 steps; we unroll _REFINE_STEPS with the same convergence
  test |offset| < 0.5), Lowe contrast + edge-ratio gates;
- orientation: gradients gathered on a fixed grid scaled by the
  keypoint's sigma, 36-bin histogram built with dense tent weights
  (einsum — a matmul, not a scatter), circular [1,4,6,4,1] smoothing,
  parabolic peak. Each candidate is emitted twice — dominant peak plus
  the best secondary local max >= 0.8*max (cv::SIFT duplicates
  keypoints per peak; the fixed capacity doubles per octave and the
  global top-k trims);
- descriptor: 16x16 rotated sample grid, gradients gathered from per-layer
  Sobel-style maps, trilinear (row, col, orientation) binning as a dense
  einsum over tent weights -> (4, 4, 8) = 128-D, normalize / clip 0.2 /
  renormalize (Lowe).

Descriptors are float32 (128,) rows matched with the exact L2 knn
(vo_tpu.ops.hamming.l2_table) instead of FLANN KDTree.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..geometry.linalg3 import solve3x3

# A/B formulation switch, snapshotted at IMPORT time (the callers are
# jitted once, so the path is baked in at first trace regardless — set
# the env var before importing vo_tpu; flipping it later is a no-op).
_SIFT_IMPL = os.environ.get("VO_TPU_SIFT", "")
from ..ops.lk import _bilinear
from ..ops.scalespace import build_scale_space, n_octaves_for


class SiftConfig(NamedTuple):
    nfeatures: int = 3000  # static output capacity
    n_layers: int = 3  # nOctaveLayers
    contrast_threshold: float = 0.04
    edge_threshold: float = 10.0
    sigma: float = 1.6
    upsample: bool = True  # OpenCV firstOctave = -1
    max_image_octaves: int = 8  # hard cap on octave count
    # orientation sampling grid (per axis): 13 gives 169 Gaussian-weighted
    # gradient samples over the +-4.5 sigma window — the histogram is
    # 36-bin, so denser grids only add gather cost (measured: grid 25 put
    # ~45% of SIFT's runtime into orientation gathers with no change in
    # matched inliers)
    ori_grid: int = 13
    desc_grid: int = 16  # descriptor sampling grid (per axis)
    # Canvas packing (ops/canvas.py): octaves share the layer count and
    # per-layer blur sigmas, so after the (inherently sequential)
    # cross-octave blur chain, every downstream dense stage — DoG,
    # extrema mask, gradient maps, refine gathers, orientation and
    # descriptor sampling — runs ONCE over all octaves packed into one
    # gutters-separated canvas instead of once per octave (the ~8x
    # per-octave dispatch tail the round-2 profile showed). Per-octave
    # border rules apply via interior masks and per-candidate octave
    # rectangles. False keeps the per-octave path for comparison.
    canvas: bool = True


class SiftFeatures(NamedTuple):
    xs: jnp.ndarray  # (K,) input-image coordinates
    ys: jnp.ndarray  # (K,)
    sizes: jnp.ndarray  # (K,) keypoint diameter (OpenCV size semantics)
    scores: jnp.ndarray  # (K,) |DoG| response
    angles: jnp.ndarray  # (K,) radians
    desc: jnp.ndarray  # (K, 128) float32, L2-normalized*512
    valid: jnp.ndarray  # (K,) bool

    @property
    def capacity(self) -> int:
        return self.xs.shape[-1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def octave_budgets(config: SiftConfig, n_oct: int) -> list[int]:
    """Static per-octave candidate budgets.

    Measured on KITTI frame 000000 vs cv2.SIFT: surviving keypoints decay
    ~3.2x per octave (2241/693/191/58/15 from the upsampled octave down),
    so a 0.5-geometric split budget-starves the upsampled octave (48% of
    its cv2 keypoints were missed at budget nfeatures/2). The 0.32
    geometric with a full-nfeatures first octave covers the measured
    distribution with ~1.3x headroom for gate kills."""
    inv = 0.32
    return [
        max(16, int(round(config.nfeatures * inv**o))) for o in range(n_oct)
    ]


def _shift2(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift the last two axes (wraps; borders masked downstream)."""
    return jnp.roll(jnp.roll(x, dy, axis=-2), dx, axis=-1)


def _extrema_mask(dog: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """(L+2, H, W) DoG stack -> (L, H, W) bool: layers 1..L are 26-neighbor
    extrema with |value| above the prefilter threshold.

    Two fused 3-D reduce_windows instead of 26 shifted-buffer compares
    (~1 GB of traffic per octave at the 2x-upsampled resolution).
    Plateau ties pass here (c == window max) where the shifted form
    required strict dominance — degenerate plateau candidates are culled
    by the Newton-step convergence and contrast gates anyway."""
    pooled_max = lax.reduce_window(
        dog, -jnp.inf, lax.max,
        window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )
    pooled_min = lax.reduce_window(
        dog, jnp.inf, lax.min,
        window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
    )
    c = dog[1:-1]
    is_ext = (c == pooled_max) | (c == pooled_min)
    return is_ext & (jnp.abs(c) > threshold)


def _gather3(dog: jnp.ndarray, ls, ys, xs, dl, dy, dx):
    return dog[ls + dl, ys + dy, xs + dx]


def _refine_once(dog: jnp.ndarray, ls, ys, xs):
    """One Newton step on the 3x3x3 neighborhood of each candidate.

    Returns (off (N,3) [dx,dy,ds] UNclamped, grad, contr-at-offset parts,
    tr, det)."""
    g = functools.partial(_gather3, dog, ls, ys, xs)
    v = g(0, 0, 0)
    dx_ = 0.5 * (g(0, 0, 1) - g(0, 0, -1))
    dy_ = 0.5 * (g(0, 1, 0) - g(0, -1, 0))
    ds_ = 0.5 * (g(1, 0, 0) - g(-1, 0, 0))
    dxx = g(0, 0, 1) + g(0, 0, -1) - 2 * v
    dyy = g(0, 1, 0) + g(0, -1, 0) - 2 * v
    dss = g(1, 0, 0) + g(-1, 0, 0) - 2 * v
    dxy = 0.25 * (g(0, 1, 1) - g(0, 1, -1) - g(0, -1, 1) + g(0, -1, -1))
    dxs = 0.25 * (g(1, 0, 1) - g(1, 0, -1) - g(-1, 0, 1) + g(-1, 0, -1))
    dys = 0.25 * (g(1, 1, 0) - g(1, -1, 0) - g(-1, 1, 0) + g(-1, -1, 0))

    Hm = jnp.stack(
        [
            jnp.stack([dxx, dxy, dxs], -1),
            jnp.stack([dxy, dyy, dys], -1),
            jnp.stack([dxs, dys, dss], -1),
        ],
        -2,
    )  # (N, 3, 3)
    grad = jnp.stack([dx_, dy_, ds_], -1)  # (N, 3)
    # Regularize singular Hessians; those points fail the offset gate.
    Hm = Hm + 1e-6 * jnp.eye(3, dtype=dog.dtype)
    off = -solve3x3(Hm, grad, eps=1e-18)
    contr = v + 0.5 * jnp.sum(grad * off, axis=-1)

    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    return off, contr, tr, det


_REFINE_STEPS = 4  # OpenCV SIFT_MAX_INTERP_STEPS = 5; 4 recovers ~all


def _refine(dog: jnp.ndarray, ls, ys, xs, border: int, rect=None):
    """Iterative subpixel refinement (OpenCV adjustLocalExtrema semantics:
    Newton step; while any |offset| > 0.5, re-localize to the rounded
    neighboring sample and repeat, up to _REFINE_STEPS). Candidates still
    unconverged after the last step are rejected.

    `rect` (optional) = per-candidate (x0, y0, x1, y1) octave bounds for
    canvas-packed scale spaces (ops/canvas.py): re-localization clips
    against the candidate's octave rectangle, not the image edge.

    Returns (ls, ys, xs updated ints, off (N,3) clamped, contr, converged,
    tr, det)."""
    L_total, Hn, Wn = dog.shape
    x0, y0, x1, y1 = (0, 0, Wn, Hn) if rect is None else rect
    off = contr = tr = det = None
    for it in range(_REFINE_STEPS):
        off, contr, tr, det = _refine_once(dog, ls, ys, xs)
        if it == _REFINE_STEPS - 1:
            break
        move = jnp.any(jnp.abs(off) >= 0.5, axis=-1)
        step = jnp.round(off).astype(jnp.int32)
        xs = jnp.where(
            move, jnp.clip(xs + step[:, 0], x0 + border, x1 - 1 - border), xs
        )
        ys = jnp.where(
            move, jnp.clip(ys + step[:, 1], y0 + border, y1 - 1 - border), ys
        )
        ls = jnp.where(move, jnp.clip(ls + step[:, 2], 1, L_total - 2), ls)
    converged = jnp.all(jnp.abs(off) < 0.5, axis=-1)
    off = jnp.clip(off, -0.5, 0.5)
    contr = jnp.where(converged, contr, 0.0)
    return ls, ys, xs, off, contr, converged, tr, det


def _dense_hist(weights, pos, n_bins, circular):
    """Dense tent-weight histogram: weights (N, S), positions (N, S) in bin
    units -> (N, n_bins). A matmul-style einsum instead of scatter-add."""
    bins = jnp.arange(n_bins, dtype=weights.dtype)
    d = pos[..., None] - bins  # (N, S, B)
    if circular:
        d = d - n_bins * jnp.round(d / n_bins)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    return jnp.einsum("ns,nsb->nb", weights, tent)


def _grad_maps(g: jnp.ndarray):
    """Central-difference gradients of a (L, H, W) Gaussian stack.

    Routed through the Pallas band-stencil kernel on TPU as 3-tap
    separable convs over the layer-flattened (L*H, W) image: the
    jnp.roll formulation lowered to lane rotates at ~19 GB/s and was the
    dominant SIFT fusion pair in the round-2 trace. Layer-boundary rows
    see a neighbor layer instead of a reflected row (2 rows per
    boundary) — same class of border artifact as the old wrap, outside
    the detection border either way."""
    from ..ops.pallas_blur import pallas_separable_blur

    L, H, W = g.shape
    flat = g.reshape(L * H, W)
    diff = (-0.5, 0.0, 0.5)
    gx = pallas_separable_blur(flat, (1.0,), diff).reshape(L, H, W)
    gy = pallas_separable_blur(flat, diff, (1.0,)).reshape(L, H, W)
    return gx, gy


def _sample_grad(gx, gy, ls, ys, xs, rect=None):
    """Bilinear gradient samples from per-layer maps at float positions;
    nearest in layer. gx/gy: (L, H, W); ls int (N, S); ys/xs float (N, S).

    Nearest-pixel sampling, one gather per map over the layer-flattened
    (L*H, W) arrays: OpenCV's orientation/descriptor accumulators iterate
    INTEGER pixels of the support region (no interpolation), so rounding
    the sample grid to the nearest pixel matches its character while
    costing 1 gather instead of 4 bilinear corners. (An earlier
    loop-over-layers bilinear form did 4 x L x this work and dominated
    SIFT's runtime.)

    `rect` (optional) = per-keypoint (x0, y0, x1, y1) octave bounds for
    canvas-packed maps: samples clamp to the keypoint's octave (the
    edge-clamp the standalone image applies at its own border)."""
    L, H, W = gx.shape
    if rect is None:
        bx0, by0, bx1, by1 = 0, 0, W, H
    else:
        bx0, by0, bx1, by1 = (jnp.asarray(b)[:, None] for b in rect)
    gxf = gx.reshape(L * H, W)
    gyf = gy.reshape(L * H, W)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), by0, by1 - 1)
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), bx0, bx1 - 1)
    rows = jnp.clip(ls, 0, L - 1) * H + yi
    return gxf[rows, xi], gyf[rows, xi]


def _sample_grad_win(gx, gy, ls0, cy, cx, ys, xs, rpad: int, rect=None):
    """Windowed _sample_grad: same values, ~10x the throughput.

    The scattered-gather formulation above runs at ~87 M elements/s on
    the TPU (its four gathers were 61 ms of the 93 ms SIFT detect).
    Here every keypoint's samples stay within a static radius `rpad` of
    its center (the orientation/descriptor support radii are bounded by
    the max refined sigma), so: crop one (S, S) window per keypoint
    around its rounded center with the LK panel crop (row gathers ride
    full tiles), then pick each rounded sample with one-hot row/column
    contractions on the MXU. The octave-rect clamp is applied to sample
    coordinates BEFORE windowing, exactly as _sample_grad does; interval
    clamping is 1-Lipschitz, so a clamped sample stays within rpad of
    the clamped center and every one-hot pick reads exactly the value
    the gather would. ls0/cy/cx: (N,) keypoint layer + float center;
    ys/xs: (N, P) float sample positions."""
    from ..ops.lk import _crop_windows

    L, H, W = gx.shape
    if rect is None:
        bx0 = by0 = 0
        bx1, by1 = W, H
        bx0s, by0s, bx1s, by1s = bx0, by0, bx1, by1
    else:
        bx0s, by0s, bx1s, by1s = (jnp.asarray(b) for b in rect)
        bx0, by0, bx1, by1 = (b[:, None] for b in (bx0s, by0s, bx1s, by1s))
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), by0, by1 - 1)
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), bx0, bx1 - 1)
    cyi = jnp.clip(jnp.round(cy).astype(jnp.int32), by0s, by1s - 1)
    cxi = jnp.clip(jnp.round(cx).astype(jnp.int32), bx0s, bx1s - 1)

    S = 2 * rpad + 1
    pad = [(rpad, rpad + 1), (rpad, rpad + 1)]
    lsc = jnp.clip(ls0, 0, L - 1)
    # window (k, r, c) = flat[lsc*H + cyi - rpad + r, cxi - rpad + c]:
    # in padded coords the crop origin is exactly (lsc*H + cyi, cxi).
    oy = lsc * H + cyi
    wgx = _crop_windows(jnp.pad(gx.reshape(L * H, W), pad), cxi, oy, S)
    wgy = _crop_windows(jnp.pad(gy.reshape(L * H, W), pad), cxi, oy, S)

    rely = jnp.clip(yi - cyi[:, None] + rpad, 0, S - 1)
    relx = jnp.clip(xi - cxi[:, None] + rpad, 0, S - 1)
    ar = jnp.arange(S, dtype=jnp.int32)
    rowsel = (rely[:, :, None] == ar).astype(gx.dtype)  # (N, P, S)
    colsel = (relx[:, :, None] == ar).astype(gx.dtype)
    pick = lambda win: jnp.sum(
        jax.lax.dot_general(
            rowsel, win, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=gx.dtype,
        ) * colsel,
        axis=-1,
    )
    return pick(wgx), pick(wgy)


def _max_sigma(cfg: SiftConfig, n_dog_layers: int) -> float:
    """Static upper bound on the refined octave-local sigma: refine
    clamps ls <= L-2 and |off_s| <= 0.5 (see _refine)."""
    fl_max = (n_dog_layers - 2) + 0.5
    return cfg.sigma * 2.0 ** (fl_max / cfg.n_layers)


# Sample-grid half-extents, shared between the grids themselves and the
# _sample_grad_win window radius (rpad) derivations below. The windowed
# sampler silently CLAMPS out-of-window samples to the window edge, so a
# grid widened without widening rpad would corrupt samples rather than
# fail — keep both derived from these constants only (ADVICE r4 #3).
_ORI_RADIUS_SIG = 4.5  # orientation grid half-extent, in keypoint sigmas
_DESC_D = 4  # descriptor spatial bins per axis (Lowe 4x4)
_DESC_HALF_BINS = _DESC_D / 2 + 0.45  # descriptor grid half-extent, bins


def _orientations(gx, gy, ls, ys, xs, sig, valid, cfg: SiftConfig,
                  rect=None):
    """Dominant gradient orientation per keypoint (radians)."""
    S = cfg.ori_grid
    u = jnp.linspace(
        -_ORI_RADIUS_SIG, _ORI_RADIUS_SIG, S, dtype=jnp.float32
    )
    uu, vv = jnp.meshgrid(u, u, indexing="xy")  # (S, S)
    uu, vv = uu.reshape(-1), vv.reshape(-1)  # (S*S,)

    px = xs[:, None] + uu[None] * sig[:, None]
    py = ys[:, None] + vv[None] * sig[:, None]
    if _SIFT_IMPL == "gather":
        sgx, sgy = _sample_grad(
            gx, gy, ls[:, None] * jnp.ones_like(px, jnp.int32), py, px, rect
        )
    else:
        rpad = int(np.ceil(
            _ORI_RADIUS_SIG * _max_sigma(cfg, gx.shape[0] - 1)
        )) + 1
        sgx, sgy = _sample_grad_win(gx, gy, ls, ys, xs, py, px, rpad, rect)
    mag = jnp.sqrt(sgx * sgx + sgy * sgy)
    ang = jnp.arctan2(sgy, sgx)  # (-pi, pi]
    r2 = (uu * uu + vv * vv)[None]
    w = jnp.exp(-r2 / (2.0 * 1.5 * 1.5)) * mag
    w = jnp.where(r2 <= _ORI_RADIUS_SIG**2, w, 0.0)

    pos = (ang / (2 * jnp.pi) * 36.0) % 36.0
    hist = _dense_hist(w, pos, 36, circular=True)
    # circular smoothing [1,4,6,4,1]/16 (OpenCV calcOrientationHist)
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    idx = (jnp.arange(36)[None, :] + jnp.arange(-2, 3)[:, None]) % 36
    hist = jnp.einsum("k,nkb->nb", k, hist[:, idx])

    def _peak_angle(peak):
        hp = jnp.take_along_axis(hist, peak[:, None], 1)[:, 0]
        hl = jnp.take_along_axis(hist, ((peak - 1) % 36)[:, None], 1)[:, 0]
        hr = jnp.take_along_axis(hist, ((peak + 1) % 36)[:, None], 1)[:, 0]
        denom = hl - 2.0 * hp + hr
        interp = jnp.where(
            jnp.abs(denom) > 1e-9, 0.5 * (hl - hr) / denom, 0.0
        )
        bin_f = (
            peak.astype(jnp.float32) + jnp.clip(interp, -0.5, 0.5)
        ) % 36.0
        return bin_f / 36.0 * 2.0 * jnp.pi, hp

    peak = jnp.argmax(hist, axis=1)
    ang1, hmax = _peak_angle(peak)

    # Secondary orientation peak (OpenCV: every local max >= 0.8 * global
    # max spawns a duplicate keypoint, sift.cpp calcOrientationHist
    # caller). We emit the single best secondary — ties beyond two peaks
    # are rare and the capacity stays static.
    is_local_max = (hist >= jnp.roll(hist, 1, axis=1)) & (
        hist >= jnp.roll(hist, -1, axis=1)
    )
    cols = jnp.arange(36)[None, :]
    cand = jnp.where(
        is_local_max & (cols != peak[:, None]), hist, -jnp.inf
    )
    peak2 = jnp.argmax(cand, axis=1)
    h2 = jnp.take_along_axis(cand, peak2[:, None], 1)[:, 0]
    has2 = h2 >= 0.8 * hmax
    ang2, _ = _peak_angle(peak2)
    return ang1, ang2, has2


def _descriptors(gx, gy, ls, ys, xs, sig, theta, cfg: SiftConfig,
                 rect=None):
    """(N, 128) Lowe descriptors via dense trilinear einsum binning."""
    D = _DESC_D  # spatial bins per axis
    S = cfg.desc_grid
    # sample grid in bin units, covering the d x d histogram support
    u = jnp.linspace(
        -_DESC_HALF_BINS, _DESC_HALF_BINS, S, dtype=jnp.float32
    )
    uu, vv = jnp.meshgrid(u, u, indexing="xy")
    uu, vv = uu.reshape(-1), vv.reshape(-1)  # (S*S,) in bin units

    hist_w = 3.0 * sig  # pixels per spatial bin (OpenCV SIFT_DESCR_SCL_FCTR)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # rotate grid into image coords
    dx = (ct[:, None] * uu[None] - st[:, None] * vv[None]) * hist_w[:, None]
    dy = (st[:, None] * uu[None] + ct[:, None] * vv[None]) * hist_w[:, None]
    px, py = xs[:, None] + dx, ys[:, None] + dy

    if _SIFT_IMPL == "gather":
        sgx, sgy = _sample_grad(
            gx, gy, ls[:, None] * jnp.ones_like(px, jnp.int32), py, px, rect
        )
    else:
        rpad = int(np.ceil(
            _DESC_HALF_BINS * np.sqrt(2.0) * 3.0
            * _max_sigma(cfg, gx.shape[0] - 1)
        )) + 1
        sgx, sgy = _sample_grad_win(gx, gy, ls, ys, xs, py, px, rpad, rect)
    mag = jnp.sqrt(sgx * sgx + sgy * sgy)
    ang = jnp.arctan2(sgy, sgx) - theta[:, None]

    r2 = (uu * uu + vv * vv)[None]
    w = jnp.exp(-r2 / (2.0 * (D / 2.0) ** 2)) * mag

    rbin = vv[None] + (D / 2 - 0.5)  # (N-bcast, S*S) in [ -0.? , 3.? ]
    cbin = uu[None] + (D / 2 - 0.5)
    obin = (ang / (2 * jnp.pi) * 8.0) % 8.0

    rows = jnp.arange(D, dtype=jnp.float32)
    tent = lambda p: jnp.maximum(0.0, 1.0 - jnp.abs(p[..., None] - rows))
    wr = tent(jnp.broadcast_to(rbin, w.shape))  # (N, S*S, 4)
    wc = tent(jnp.broadcast_to(cbin, w.shape))
    ob = jnp.arange(8, dtype=jnp.float32)
    do = obin[..., None] - ob
    do = do - 8.0 * jnp.round(do / 8.0)
    wo = jnp.maximum(0.0, 1.0 - jnp.abs(do))  # (N, S*S, 8)

    desc = jnp.einsum("ns,nsr,nsc,nso->nrco", w, wr, wc, wo)
    desc = desc.reshape(desc.shape[0], -1)  # (N, 128)

    # Lowe normalization: L2 -> clip 0.2 -> L2, scaled like OpenCV (512).
    nrm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    desc = desc / jnp.maximum(nrm, 1e-12)
    desc = jnp.minimum(desc, 0.2)
    nrm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    return 512.0 * desc / jnp.maximum(nrm, 1e-12)


def _detect_octave(dog, gauss, budget: int, o: int, cfg: SiftConfig):
    """All keypoints of one octave, masked fixed shape `budget`."""
    Hn, Wn = dog.shape[-2:]
    n_layers = cfg.n_layers
    # prefilter threshold (image range 0..255, OpenCV scales by 255)
    prefilter = 0.5 * cfg.contrast_threshold / n_layers * 255.0

    ext = _extrema_mask(dog, prefilter)  # (L, H, W)
    border = 5
    ys_i = lax.broadcasted_iota(jnp.int32, ext.shape, 1)
    xs_i = lax.broadcasted_iota(jnp.int32, ext.shape, 2)
    inb = (
        (ys_i >= border)
        & (ys_i < Hn - border)
        & (xs_i >= border)
        & (xs_i < Wn - border)
    )
    resp = jnp.where(ext & inb, jnp.abs(dog[1:-1]), 0.0)

    # 2x2-blocked top-k (ops/nms.py): the 26-neighbor extrema mask allows
    # at most one (strict) survivor per same-layer 2x2 block, so the sort
    # runs on a 4x smaller map — measured ~11 ms of the octave-0 pass.
    from ..ops.nms import blocked_topk_2d

    top, ys, xs, lb = blocked_topk_2d(resp, budget)
    sel_valid = top > 0.0
    ls = lb + 1  # layer in 1..L

    ls, ys, xs, off, contr, converged, tr, det = _refine(
        dog, ls, ys, xs, border
    )
    contrast_ok = (
        jnp.abs(contr) * n_layers >= cfg.contrast_threshold * 255.0
    )
    r = cfg.edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) * (r + 1) * det)
    ok = sel_valid & converged & contrast_ok & edge_ok

    fx = xs.astype(jnp.float32) + off[:, 0]
    fy = ys.astype(jnp.float32) + off[:, 1]
    fl = ls.astype(jnp.float32) + off[:, 2]
    sig_local = cfg.sigma * (2.0 ** (fl / n_layers))  # octave-local px

    gx, gy = _grad_maps(gauss)
    ang1, ang2, has2 = _orientations(gx, gy, ls, fy, fx, sig_local, ok, cfg)
    # Duplicate candidates for their secondary orientation peaks
    # (cv::SIFT emits a separate keypoint per peak >= 0.8 * max), but
    # COMPACT first: only ~20-30% of candidates have one, so the
    # secondary rows gather into a budget/2 capacity before the
    # descriptor pass (per-candidate gathers are SIFT's dominant cost;
    # outputs are identical while the secondary count fits).
    sec_cap = max(16, budget // 2)
    sec_score = jnp.where(ok & has2, jnp.abs(contr), -jnp.inf)
    top2, idx2 = lax.top_k(sec_score, sec_cap)
    sec_ok = top2 > -jnp.inf
    two = lambda a: jnp.concatenate([a, a[idx2]], axis=0)
    ang = jnp.concatenate([ang1, ang2[idx2]], axis=0)
    ok2 = jnp.concatenate([ok, sec_ok], axis=0)
    desc = _descriptors(
        gx, gy, two(ls), two(fy), two(fx), two(sig_local), ang, cfg
    )

    oct_scale = (0.5 if cfg.upsample else 1.0) * (2.0**o)
    size = sig_local * oct_scale * 2.0
    return (
        two(fx * oct_scale),
        two(fy * oct_scale),
        two(size),
        two(jnp.abs(contr)),
        ang,
        desc,
        ok2,
    )


def _detect_canvas(dogs, gauss, budgets, cfg: SiftConfig):
    """Canvas-packed detection (see SiftConfig.canvas): one extrema mask,
    one refine pass, one gradient-map build, one orientation/descriptor
    pass over ALL octaves. Returns the same concatenated 7-tuple the
    per-octave path produces."""
    from ..ops.canvas import interior_mask, pack_canvas
    from ..ops.nms import blocked_topk_2d

    n_layers = cfg.n_layers
    shapes = tuple(tuple(d.shape[-2:]) for d in dogs)
    apron = 4
    cg, origins = pack_canvas(list(gauss), apron)  # (L+3, Hc, Wc)
    cd, _ = pack_canvas(list(dogs), apron)  # (L+2, Hc, Wc)
    Hc, Wc = cd.shape[-2:]

    prefilter = 0.5 * cfg.contrast_threshold / n_layers * 255.0
    ext = _extrema_mask(cd, prefilter)  # (L, Hc, Wc)
    border = 5
    inb = interior_mask((Hc, Wc), shapes, origins, border=border) > 0
    resp = jnp.where(ext & inb[None], jnp.abs(cd[1:-1]), 0.0)

    # Per octave: slice the masked response, top-(budget) candidates.
    c_ys, c_xs, c_ls, c_top = [], [], [], []
    rect_np, oct_np = [], []
    for o, ((Hl, Wl), (oy, ox), budget) in enumerate(
        zip(shapes, origins, budgets)
    ):
        sub = lax.slice(resp, (0, oy, ox), (resp.shape[0], oy + Hl, ox + Wl))
        top, ys_l, xs_l, lb = blocked_topk_2d(sub, budget)
        c_ys.append(ys_l + oy)
        c_xs.append(xs_l + ox)
        c_ls.append(lb + 1)  # layer in 1..L
        c_top.append(top)
        rect_np.append(
            np.broadcast_to(
                np.array([ox, oy, ox + Wl, oy + Hl], np.int32), (budget, 4)
            )
        )
        oct_np.append(np.full(budget, o, np.int32))

    ys = jnp.concatenate(c_ys)
    xs = jnp.concatenate(c_xs)
    ls = jnp.concatenate(c_ls)
    sel_valid = jnp.concatenate(c_top) > 0.0
    rect_all = np.concatenate(rect_np, axis=0)
    rect = tuple(jnp.asarray(rect_all[:, i]) for i in range(4))
    oct_idx = np.concatenate(oct_np)

    ls, ys, xs, off, contr, converged, tr, det = _refine(
        cd, ls, ys, xs, border, rect=rect
    )
    contrast_ok = (
        jnp.abs(contr) * n_layers >= cfg.contrast_threshold * 255.0
    )
    r = cfg.edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) * (r + 1) * det)
    ok = sel_valid & converged & contrast_ok & edge_ok

    fx = xs.astype(jnp.float32) + off[:, 0]
    fy = ys.astype(jnp.float32) + off[:, 1]
    fl = ls.astype(jnp.float32) + off[:, 2]
    sig_local = cfg.sigma * (2.0 ** (fl / n_layers))

    gx, gy = _grad_maps(cg)
    ang1, ang2, has2 = _orientations(
        gx, gy, ls, fy, fx, sig_local, ok, cfg, rect=rect
    )
    # Secondary-peak duplication, compacted GLOBALLY across octaves (the
    # per-octave path compacts per octave; a single global top-k is the
    # same semantics with one pass)
    sec_cap = max(16, sum(budgets) // 2)
    sec_score = jnp.where(ok & has2, jnp.abs(contr), -jnp.inf)
    top2, idx2 = lax.top_k(sec_score, sec_cap)
    sec_ok = top2 > -jnp.inf
    two = lambda a: jnp.concatenate([a, a[idx2]], axis=0)
    rect2 = tuple(two(b) for b in rect)
    ang = jnp.concatenate([ang1, ang2[idx2]], axis=0)
    ok2 = jnp.concatenate([ok, sec_ok], axis=0)
    desc = _descriptors(
        gx, gy, two(ls), two(fy), two(fx), two(sig_local), ang, cfg,
        rect=rect2,
    )

    oct_scale_np = (0.5 if cfg.upsample else 1.0) * (2.0 ** oct_idx)
    oct_scale = two(jnp.asarray(oct_scale_np, jnp.float32))
    ox_pc = two(jnp.asarray(rect_all[:, 0], jnp.float32))
    oy_pc = two(jnp.asarray(rect_all[:, 1], jnp.float32))
    size = two(sig_local) * oct_scale * 2.0
    return (
        (two(fx) - ox_pc) * oct_scale,
        (two(fy) - oy_pc) * oct_scale,
        size,
        two(jnp.abs(contr)),
        ang,
        desc,
        ok2,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def sift_detect_and_compute(
    img: jnp.ndarray, config: SiftConfig = SiftConfig()
) -> SiftFeatures:
    """SIFT features for one (H, W) float32 [0,255] image. Output capacity
    = config.nfeatures, globally top-k by response across octaves."""
    n_oct = min(
        n_octaves_for(img.shape, config.upsample), config.max_image_octaves
    )
    budgets = octave_budgets(config, n_oct)
    gauss, dogs = build_scale_space(
        img,
        n_layers=config.n_layers,
        sigma=config.sigma,
        upsample=config.upsample,
    )

    if config.canvas:
        xs, ys, sizes, scores, angles, desc, valid = _detect_canvas(
            dogs, gauss, budgets, config
        )
    else:
        outs = []
        for o in range(n_oct):
            outs.append(
                _detect_octave(dogs[o], gauss[o], budgets[o], o, config)
            )
        cat = lambda i: jnp.concatenate([out[i] for out in outs], axis=0)
        xs, ys, sizes, scores, angles, desc, valid = (
            cat(i) for i in range(7)
        )

    # Global top-nfeatures by response (OpenCV retainBest).
    masked = jnp.where(valid, scores, -1.0)
    k = min(config.nfeatures, int(masked.shape[0]))
    top, idx = lax.top_k(masked, k)
    keep = top > 0.0
    # Canonical RASTER output order (invalid slots last): selection is by
    # response, but emission order follows scan order like cv::SIFT's
    # de-facto ordering. This matters beyond parity: the UNMATCHED-cloud
    # scale estimator pairs triangulated points BY INDEX across two
    # independently compacted clouds (feature_matching.cpp:251-254,
    # SURVEY.md §7 hard-part 4), which is only meaningful when index
    # order is spatially coherent — a response-sorted order made
    # matching_sift's scale pairing garbage (measured: 3.5x the cv2
    # anchor's ATE on the eval sequence). The MATCHED estimator is the
    # opposite: coherent order makes its consecutive-pair distances
    # adjacent and depth-noise-dominated (a measured -16% scale bias),
    # so geometry/scale.py scatters its pairing with a fixed
    # permutation; raster emission stays correct for both.
    # int32 key: a float key (ry * 16384 + rx) loses sub-pixel x once
    # ry * 16384 exceeds 2^24 (images taller than ~1024 px). A
    # quarter-pixel int key orders nearby refinements stably up to
    # H < 8192, W < 16384 — far beyond the frontend's pyramid limits.
    ry = jnp.round(ys[idx] * 4.0).astype(jnp.int32)
    rx = jnp.round(xs[idx] * 4.0).astype(jnp.int32)
    W4 = 4 * 16384
    rast = jnp.where(keep, ry * W4 + rx, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(rast)
    idx = idx[order]
    keep = keep[order]
    vz = lambda a: jnp.where(keep, a[idx], jnp.zeros_like(a[idx]))
    return SiftFeatures(
        xs=vz(xs),
        ys=vz(ys),
        sizes=vz(sizes),
        scores=vz(scores),
        angles=vz(angles),
        desc=desc[idx] * keep[:, None].astype(desc.dtype),
        valid=keep,
    )
