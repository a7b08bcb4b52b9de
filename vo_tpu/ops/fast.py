"""Dense FAST-9 corner scoring.

TPU-native re-expression of the reference's d_Fast kernel
(src/cuda/Fast.cu:38-209): instead of 16x16 shared-memory tiles with halo
loads and per-pixel scalar loops, the 16 Bresenham-circle samples become 16
shifted views of the image and the early-reject / contiguity tests become
dense boolean masks — one fused XLA program over the whole (H, W) plane.

Semantics preserved exactly:
- circle offsets (Fast.cu:23-28), >= / <= threshold comparisons,
- early reject: >= 3 of circle pixels {0, 4, 8, 12} brighter or darker
  (Fast.cu:164-176) — applied even where full contiguity would pass,
- contiguity: some window of n consecutive circle pixels (mod 16) all
  brighter or all darker (Fast.cu:178-199),
- score: sum over all 16 of |Ip - circle_i| (Fast.cu:203-205),
- 3-pixel border excluded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# (offx, offy) pairs, Fast.cu:23-28 order (12 o'clock, clockwise).
CIRCLE_OFFSETS = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1),
        (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1),
        (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)
RADIUS = 3
CHECK_IDX = (0, 4, 8, 12)


def _circle_views(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W): circle sample i at every pixel (border garbage-free via
    edge padding; border rows are masked out downstream anyway)."""
    H, W = img.shape[-2:]
    padded = jnp.pad(
        img,
        [(0, 0)] * (img.ndim - 2) + [(RADIUS, RADIUS), (RADIUS, RADIUS)],
        mode="edge",
    )
    views = [
        jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(padded, RADIUS + int(oy), H, axis=-2),
            RADIUS + int(ox),
            W,
            axis=-1,
        )
        for ox, oy in CIRCLE_OFFSETS
    ]
    return jnp.stack(views, axis=0)


@functools.partial(jax.jit, static_argnames=("n",))
def fast_score(img: jnp.ndarray, threshold: float = 20.0, n: int = 9) -> jnp.ndarray:
    """(H, W) FAST corner score map; 0 where not a corner."""
    H, W = img.shape[-2:]
    circ = _circle_views(img)  # (16, ..., H, W)

    bright = circ >= img[None] + threshold
    dark = circ <= img[None] - threshold

    # Early reject (Fast.cu:164-176): count over cardinal indices.
    card = list(CHECK_IDX)
    n_bright = sum(bright[i].astype(jnp.int32) for i in card)
    n_dark = sum(dark[i].astype(jnp.int32) for i in card)
    early_ok = jnp.maximum(n_bright, n_dark) >= 3

    # Contiguity: window-of-n all-true over the circular axis.
    def has_run(mask):
        m = jnp.concatenate([mask, mask[: n - 1]], axis=0).astype(jnp.int32)
        c = jnp.cumsum(m, axis=0)
        c = jnp.concatenate([jnp.zeros_like(c[:1]), c], axis=0)
        window = c[n:] - c[:-n]  # (16, H, W): sum of each length-n window
        return jnp.any(window == n, axis=0)

    is_corner = early_ok & (has_run(bright) | has_run(dark))

    score = jnp.sum(jnp.abs(img[None] - circ), axis=0)

    # Exclude the 3-pixel border (Fast.cu:160).
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (
        (ys >= RADIUS) & (ys < H - RADIUS) & (xs >= RADIUS) & (xs < W - RADIUS)
    )

    return jnp.where(is_corner & interior, score, 0.0)
