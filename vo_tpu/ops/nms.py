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
import numpy as np
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
def blocked_topk_2d(resp: jnp.ndarray, k: int):
    """Top-k of an NMS-masked response stack (..., H, W) via 2x2 spatial
    block reduction — 4x less sort work.

    Exact for STRICT survivors: after a 3x3 (or larger) NMS, a block can
    hold two survivors only when they have exactly EQUAL scores (nms_mask
    uses `>= pooled`, so ties survive pairwise). In that case the block
    max keeps one of them deterministically (argmax = first in raster
    order) and the other is dropped. Measured deviation vs a flat top_k
    (tests/test_detector.py::test_blocked_topk_tie_loss_bounded): zero in
    the budget-limited regime k << survivors (the ORB operating point),
    0.2% of survivors at k >= survivors on real FAST scores; adversarially
    quantized score maps can lose up to ~10% of equal-tie survivors at
    k >= survivors. Zero/negative responses mean "not a candidate".

    Returns (vals (k,), ys (k,), xs (k,), batch_idx (k,)) with
    batch_idx = flattened leading-dims index (0 when resp is 2-D)."""
    H, W = resp.shape[-2:]
    B = int(np.prod(resp.shape[:-2], dtype=np.int64)) if resp.ndim > 2 else 1
    Hp, Wp = H - (H % 2), W - (W % 2)
    r = resp.reshape((B, H, W))[:, :Hp, :Wp]
    blk = r.reshape(B, Hp // 2, 2, Wp // 2, 2)
    bmax = blk.max(axis=(2, 4))  # (B, Hp/2, Wp/2)
    top, bidx = lax.top_k(bmax.reshape(-1), k)
    nb = (Hp // 2) * (Wp // 2)
    b = bidx // nb
    rem = bidx % nb
    by = rem // (Wp // 2)
    bx = rem % (Wp // 2)
    quad = blk[b, by, :, bx, :].reshape(-1, 4)  # (k, 4)
    sub = jnp.argmax(quad, axis=1).astype(jnp.int32)
    ys = by * 2 + sub // 2
    xs = bx * 2 + sub % 2
    return top, ys, xs, b


@functools.partial(jax.jit, static_argnames=("k",))
def topk_keypoints(score: jnp.ndarray, mask: jnp.ndarray, k: int) -> Keypoints:
    """Deterministic compaction: the k highest-scoring masked pixels via
    the 2x2-blocked top-k (exact up to same-block equal-score ties — see
    blocked_topk_2d)."""
    resp = jnp.where(mask & (score > 0), score, 0.0)
    top_scores, ys, xs, _ = blocked_topk_2d(resp, k)
    valid = top_scores > 0.0
    zero = jnp.zeros_like(top_scores)
    return Keypoints(
        xs=jnp.where(valid, xs.astype(jnp.float32), 0.0),
        ys=jnp.where(valid, ys.astype(jnp.float32), 0.0),
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
