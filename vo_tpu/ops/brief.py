"""Rotated BRIEF descriptors.

Re-expression of src/cuda/Brief.cu:40-94: per keypoint, all 256 sampling
pairs of the standard learned pattern (`bit_pattern_31_`, OpenCV's public
constant — see scripts/gen_brief_pattern.py) are rotated by the keypoint's
orientation with round-to-nearest, compared on the 5x5-box-smoothed image,
and packed LSB-first into 32 bytes. Differences from the reference:

- the smoothed image is a dense separable box filter (one fused conv)
  instead of 4 integral-image gathers per tap;
- out-of-bounds is the *correct* full-window bound [2, dim-3] — the
  reference compares against the integral image width W+1 (Brief.cu:81-83),
  allowing a 2-pixel out-of-row read at the right/bottom edges;
- descriptors come out both bit-packed ((K, 32) uint8, reference layout)
  and as (K, 256) bit planes for MXU-based Hamming matching.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .integral import box_filter5

# A/B formulation switch, snapshotted at IMPORT time: brief_bits is
# wrapped in a module-level jit, so the chosen path is baked in at first
# trace anyway — reading the env once makes that explicit (flipping it
# later in the same process is a documented no-op; set it before import).
_BRIEF_IMPL = os.environ.get("VO_TPU_BRIEF", "")

_PATTERN_PATH = os.path.join(os.path.dirname(__file__), "brief_pattern.npy")
BRIEF_PATTERN = np.load(_PATTERN_PATH)  # (256, 4) int32: x1, y1, x2, y2
_PACK_WEIGHTS = (1 << np.arange(8)).astype(np.uint8)  # LSB-first, Brief.cu:88-92


@functools.partial(jax.jit, static_argnames=())
def brief_bits(
    smoothed: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    angles: jnp.ndarray,
    rect=None,
) -> jnp.ndarray:
    """(K, 256) uint8 bit planes; bit i = 1 iff smoothed(p1_i) < smoothed(p2_i).

    `smoothed` is the dense 5x5 box-sum image (box_filter5). Coordinates are
    integer level-image pixels. OOB pairs produce bit 0 (Brief.cu:81-83).
    `rect` (optional) = per-keypoint (x0, y0, x1, y1) level bounds for
    canvas-packed pyramids (ops/canvas.py)."""
    H, W = smoothed.shape[-2:]
    rx0, ry0, rx1, ry1 = (0, 0, W, H) if rect is None else rect
    pat = jnp.asarray(BRIEF_PATTERN, jnp.float32)  # (256, 4)
    px1, py1, px2, py2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]

    cos = jnp.cos(angles)[:, None]  # (K, 1)
    sin = jnp.sin(angles)[:, None]

    # Rotate the pattern per keypoint with round-to-nearest-even
    # (__float2int_rn, Brief.cu:69-73).
    dx1 = jnp.round(cos * px1 - sin * py1).astype(jnp.int32)
    dy1 = jnp.round(sin * px1 + cos * py1).astype(jnp.int32)
    dx2 = jnp.round(cos * px2 - sin * py2).astype(jnp.int32)
    dy2 = jnp.round(sin * px2 + cos * py2).astype(jnp.int32)

    xi = xs.astype(jnp.int32)[:, None]
    yi = ys.astype(jnp.int32)[:, None]
    cx1, cy1 = xi + dx1, yi + dy1
    cx2, cy2 = xi + dx2, yi + dy2

    bx0 = jnp.asarray(rx0)[..., None]
    by0 = jnp.asarray(ry0)[..., None]
    bx1 = jnp.asarray(rx1)[..., None]
    by1 = jnp.asarray(ry1)[..., None]

    def inb(cx, cy):
        return (
            (cx >= bx0 + 2) & (cx <= bx1 - 3)
            & (cy >= by0 + 2) & (cy <= by1 - 3)
        )

    ok = inb(cx1, cy1) & inb(cx2, cy2)

    if _BRIEF_IMPL == "gather":
        # Direct advanced-index gather: 2 x K*256 scattered elements.
        # Profiled at ~87 M elements/s on the TPU (8.8 ms each at the
        # matching capacity) — kept as the A/B reference formulation.
        cx1c, cy1c = jnp.clip(cx1, 0, W - 1), jnp.clip(cy1, 0, H - 1)
        cx2c, cy2c = jnp.clip(cx2, 0, W - 1), jnp.clip(cy2, 0, H - 1)
        s1 = smoothed[cy1c, cx1c]
        s2 = smoothed[cy2c, cx2c]
        return (ok & (s1 < s2)).astype(jnp.uint8)

    # Windowed sampling (default): crop one (S, S) window per keypoint
    # with the LK panel-crop (ops/lk.py _crop_windows — row gathers ride
    # full tiles), then pick each rotated sample with one-hot row/column
    # contractions on the MXU. Every output element is a single f32
    # window value (one-hot weights), so this is bit-exact vs the gather
    # formulation at ~10x the throughput.
    s1, s2 = _sample_windows(smoothed, xi[:, 0], yi[:, 0],
                             (cx1, cy1), (cx2, cy2))
    return (ok & (s1 < s2)).astype(jnp.uint8)


# Rotated bit_pattern_31 offsets stay within this radius (max pattern
# radius 18.39 px); window size = 2 * _BRIEF_RPAD + 1.
_BRIEF_RPAD = 19
assert np.hypot(BRIEF_PATTERN[:, [0, 2]], BRIEF_PATTERN[:, [1, 3]]).max() \
    <= _BRIEF_RPAD - 0.5


def _sample_windows(smoothed, xi, yi, pt1, pt2):
    """Sample the two (K, 256) integer coordinate sets from per-keypoint
    windows. Coordinates outside the window (only possible for pairs the
    caller's bounds mask already kills) clip to the window edge."""
    from .lk import _crop_windows

    S = 2 * _BRIEF_RPAD + 1
    K = xi.shape[0]
    pad = [(_BRIEF_RPAD, _BRIEF_RPAD + 1)] * 2
    padded = jnp.pad(smoothed, pad)
    # window (k, r, c) = smoothed[yi[k] - RPAD + r, xi[k] - RPAD + c]:
    # in padded coords the origin is exactly (yi, xi), never clamped.
    win = _crop_windows(padded, xi, yi, S)  # (K, S, S)

    cx = jnp.concatenate([pt1[0], pt2[0]], axis=1)  # (K, 512)
    cy = jnp.concatenate([pt1[1], pt2[1]], axis=1)
    rely = jnp.clip(cy - yi[:, None] + _BRIEF_RPAD, 0, S - 1)
    relx = jnp.clip(cx - xi[:, None] + _BRIEF_RPAD, 0, S - 1)
    ar = jnp.arange(S, dtype=jnp.int32)
    rowsel = (rely[:, :, None] == ar).astype(smoothed.dtype)  # (K, 512, S)
    colsel = (relx[:, :, None] == ar).astype(smoothed.dtype)
    rows = jax.lax.dot_general(
        rowsel, win, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=smoothed.dtype,
    )  # (K, 512, S)
    vals = jnp.sum(rows * colsel, axis=-1)  # (K, 512)
    return vals[:, :256], vals[:, 256:]


@jax.jit
def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(K, 256) {0,1} -> (K, 32) uint8, LSB-first within each byte."""
    k = bits.shape[0]
    w = jnp.asarray(_PACK_WEIGHTS)
    return jnp.sum(bits.reshape(k, 32, 8) * w, axis=-1).astype(jnp.uint8)


def brief_descriptors(
    img: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    angles: jnp.ndarray,
    rect=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper: smooth + bits + packed. Returns (bits, packed)."""
    smoothed = box_filter5(img)
    bits = brief_bits(smoothed, ys, xs, angles, rect)
    return bits, pack_bits(bits)
