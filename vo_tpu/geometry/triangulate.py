"""Batched linear (DLT) triangulation.

Replaces cv::triangulatePoints as used by every driver's get_scale
(feature_tracking.cpp:269; linear DLT also hand-rolled at
with_bundle_adjustment.cpp:97-131): per point, the 4x4 homogeneous system
is solved via the smallest eigenvector of A^T A (batched symmetric eigh —
TPU-supported), all N points in one program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def triangulate_dlt(
    P1: jnp.ndarray, P2: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray
) -> jnp.ndarray:
    """Triangulate (N, 3) world points from (N, 2) pixel observations under
    projection matrices P1, P2 (3, 4)."""
    u1, v1 = pts1[:, 0:1], pts1[:, 1:2]
    u2, v2 = pts2[:, 0:1], pts2[:, 1:2]
    A = jnp.stack(
        [
            u1 * P1[2] - P1[0],
            v1 * P1[2] - P1[1],
            u2 * P2[2] - P2[0],
            v2 * P2[2] - P2[1],
        ],
        axis=1,
    )  # (N, 4, 4)
    # Smallest eigenvector of A^T A; row-normalize A first for conditioning.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=2, keepdims=True), 1e-12)
    AtA = jnp.einsum("nij,nik->njk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[:, :, 0]  # eigenvector of smallest eigenvalue
    w = X[:, 3:4]
    w = jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
    return X[:, :3] / w


def triangulate_normalized(
    R: jnp.ndarray, t: jnp.ndarray, pts1n: jnp.ndarray, pts2n: jnp.ndarray
) -> jnp.ndarray:
    """Triangulate from *normalized* image coords with P1 = [I|0],
    P2 = [R|t] (frame of camera 1)."""
    P1 = jnp.concatenate([jnp.eye(3, dtype=R.dtype), jnp.zeros((3, 1), R.dtype)], 1)
    P2 = jnp.concatenate([R, t.reshape(3, 1)], 1)
    return triangulate_dlt(P1, P2, pts1n, pts2n)


@jax.jit
def triangulate_depths(
    R: jnp.ndarray, t: jnp.ndarray, pts1n: jnp.ndarray, pts2n: jnp.ndarray
):
    """Closed-form two-view depths: (z1, z2) minimizing
    ||z1 R x1 + t - z2 x2||^2 for bearing vectors x_i = [u, v, 1].

    Pure arithmetic (one 2x2 solve per point) — the TPU fast path that
    replaces the batched 4x4 eigendecomposition of the DLT for uses that
    only need depths / points (cheirality voting, scale clouds). On
    noise-free rays it is exact; under noise it minimizes 3D ray distance
    instead of the DLT's algebraic error."""
    ones = jnp.ones_like(pts1n[:, :1])
    x1 = jnp.concatenate([pts1n, ones], axis=1)  # (N, 3)
    x2 = jnp.concatenate([pts2n, ones], axis=1)
    a = x1 @ R.T  # (N, 3) = R x1
    aa = jnp.sum(a * a, axis=1)
    bb = jnp.sum(x2 * x2, axis=1)
    ab = jnp.sum(a * x2, axis=1)
    at = a @ t
    bt = x2 @ t
    det = aa * bb - ab * ab
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    # [aa -ab][z1] = [-at]
    # [-ab bb][z2]   [-bt] ... solving d/dz of ||z1 a + t - z2 b||^2 = 0
    z1 = (-at * bb + ab * bt) / det
    z2 = (-ab * at + aa * bt) / det
    return z1, z2


def triangulate_fast(
    R: jnp.ndarray, t: jnp.ndarray, pts1n: jnp.ndarray, pts2n: jnp.ndarray
) -> jnp.ndarray:
    """(N, 3) frame-1 points from the closed-form depths (z1 * x1)."""
    z1, _ = triangulate_depths(R, t, pts1n, pts2n)
    ones = jnp.ones_like(pts1n[:, :1])
    x1 = jnp.concatenate([pts1n, ones], axis=1)
    return z1[:, None] * x1
