"""Non-max suppression + deterministic keypoint compaction.

Replaces the reference's d_NMS kernel (src/cuda/NMS.cu:32-127): the 3x3
window max test becomes a dense max-pool compare, and the `atomicAdd`
keypoint compaction — whose output order is nondeterministic (SURVEY.md §5
race note) — becomes a score-descending `lax.top_k` into a fixed-capacity
masked array. Keypoint order is therefore canonical and reproducible:
descending score, ties broken by ascending raster index.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set. Invalid slots have valid=False and
    coordinates/scores zeroed."""

    xs: jnp.ndarray  # (K,) float32 — level-0 pixel x
    ys: jnp.ndarray  # (K,) float32
    scores: jnp.ndarray  # (K,) float32
    valid: jnp.ndarray  # (K,) bool

    @property
    def capacity(self) -> int:
        return self.xs.shape[-1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


@functools.partial(jax.jit, static_argnames=("radius",))
def nms_mask(score: jnp.ndarray, radius: int = 1, threshold: float = 0.0):
    """Keep pixels whose score exceeds `threshold` and is >= every neighbor
    in the (2r+1)^2 window (strictly-greater neighbors suppress, ties
    survive — NMS.cu:108-118 semantics), excluding an r-pixel border."""
    H, W = score.shape[-2:]
    pooled = lax.reduce_window(
        score,
        -jnp.inf,
        lax.max,
        window_dimensions=(2 * radius + 1,) * 2,
        window_strides=(1, 1),
        padding="SAME",
    )
    ys = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (
        (ys >= radius) & (ys < H - radius) & (xs >= radius) & (xs < W - radius)
    )
    return (score > threshold) & (score >= pooled) & interior


@functools.partial(jax.jit, static_argnames=("k",))
def topk_keypoints(score: jnp.ndarray, mask: jnp.ndarray, k: int) -> Keypoints:
    """Deterministic compaction: the k highest-scoring masked pixels."""
    H, W = score.shape[-2:]
    flat = jnp.where(mask, score, -jnp.inf).reshape(-1)
    top_scores, top_idx = lax.top_k(flat, k)
    valid = top_scores > -jnp.inf
    ys = (top_idx // W).astype(jnp.float32)
    xs = (top_idx % W).astype(jnp.float32)
    zero = jnp.zeros_like(top_scores)
    return Keypoints(
        xs=jnp.where(valid, xs, 0.0),
        ys=jnp.where(valid, ys, 0.0),
        scores=jnp.where(valid, top_scores, zero),
        valid=valid,
    )


@functools.partial(jax.jit, static_argnames=("k", "radius"))
def detect_keypoints(
    score: jnp.ndarray, k: int, radius: int = 1, threshold: float = 0.0
) -> Keypoints:
    """NMS + top-k in one jitted program (the d_Fast → d_NMS → compaction
    chain of Fast.cu:211-270, made deterministic)."""
    return topk_keypoints(score, nms_mask(score, radius, threshold), k)
