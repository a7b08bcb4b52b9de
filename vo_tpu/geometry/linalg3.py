"""Closed-form batched 3x3 linear algebra.

jnp.linalg.inv/solve on (..., 3, 3) batches lower to LAPACK-style custom
calls on TPU — serialized and slow for the thousands of tiny systems in
the Schur BA (per-landmark V blocks) and SIFT's subpixel refinement. The
adjugate form is pure VPU arithmetic and fuses with its consumers.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv3x3(M: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """(..., 3, 3) inverse via the adjugate; caller guarantees (or damps
    toward) invertibility. `eps` guards the determinant's reciprocal."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    if eps:
        det = jnp.where(jnp.abs(det) > eps, det, jnp.where(det >= 0, eps, -eps))
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A, D, G], -1),
            jnp.stack([B, E, H], -1),
            jnp.stack([C, F, I], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]


def solve3x3(M: jnp.ndarray, b: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Solve (..., 3, 3) @ x = (..., 3) in closed form."""
    return jnp.einsum("...ij,...j->...i", inv3x3(M, eps), b)
