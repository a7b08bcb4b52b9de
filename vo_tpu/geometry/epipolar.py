"""Essential-matrix estimation: batched RANSAC + pose recovery.

Replaces cv::findEssentialMat(RANSAC, prob=0.999, thr=1.0) + cv::recoverPose
(feature_tracking.cpp:229-241). The TPU formulation scores *all* RANSAC
hypotheses in parallel: S minimal samples are drawn with masked Gumbel
top-k, each yields an essential matrix candidate (least-squares 8-point via
batched eigh), all candidates are Sampson-scored against all N points in one
(S, N) tensor, and the winner is least-squares refit on its inliers.

recoverPose's 4-way decomposition + cheirality vote triangulates every
candidate for every inlier in parallel (4 batched DLT solves) and picks the
decomposition with the most points in front of both cameras.

Convention: E satisfies p2^T E p1 = 0 in normalized coords; the recovered
(R, t) map camera-1 coordinates to camera-2: x2 = R x1 + t (OpenCV's).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def normalize_pixels(pts: jnp.ndarray, K) -> jnp.ndarray:
    """(..., 2) pixel -> normalized camera coordinates."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack(
        [(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], -1
    )


def _epipolar_rows(pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 9) rows a s.t. a . vec(E) = p2^T E p1."""
    x1, y1 = pts1[..., 0], pts1[..., 1]
    x2, y2 = pts2[..., 0], pts2[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], -1
    )


def _nullspace(A: jnp.ndarray) -> jnp.ndarray:
    """(..., m, 9) -> (..., 9) right-singular vector of smallest singular
    value, via batched one-sided Jacobi (linalg3.nullspace_jacobi): pure
    VPU arithmetic across all RANSAC hypotheses at once, replacing the
    serialized QR+SVD custom calls. Works on A directly, so it keeps
    direct-SVD conditioning (the old eigh(A^T A) was ~100x less accurate
    in fp32; Jacobi measures within ~3x of LAPACK SVD residuals)."""
    from .linalg3 import nullspace_jacobi

    return nullspace_jacobi(A)


def project_to_essential(F: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) onto the essential manifold: sv -> (1, 1, 0)."""
    from .linalg3 import svd3x3

    U, s, Vt = svd3x3(F)
    d = jnp.asarray([1.0, 1.0, 0.0], F.dtype)
    return (U * d[..., None, :]) @ Vt


def _hartley(pts: jnp.ndarray, weights: jnp.ndarray):
    """Weighted Hartley normalization: returns (normalized points, T (3,3))
    with weighted centroid 0 and weighted mean radius sqrt(2)."""
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    mu = jnp.sum(pts * w, axis=-2, keepdims=True) / wsum
    d = jnp.sum(
        jnp.linalg.norm(pts - mu, axis=-1, keepdims=True) * w,
        axis=-2,
        keepdims=True,
    ) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
    q = (pts - mu) * s
    batch = pts.shape[:-2]
    T = jnp.zeros(batch + (3, 3), pts.dtype)
    s0 = s[..., 0, 0]
    T = T.at[..., 0, 0].set(s0)
    T = T.at[..., 1, 1].set(s0)
    T = T.at[..., 0, 2].set(-s0 * mu[..., 0, 0])
    T = T.at[..., 1, 2].set(-s0 * mu[..., 0, 1])
    T = T.at[..., 2, 2].set(1.0)
    return q, T


def fit_essential_ls(
    pts1: jnp.ndarray, pts2: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted least-squares essential fit over (..., N) weighted points.

    Hartley-normalizes both point sets (balances the design-matrix columns;
    substantially debiases the algebraic fit), solves the nullspace via QR +
    SVD, denormalizes, then projects onto the essential manifold — the
    projection must happen in the original coordinates where the (1, 1, 0)
    spectrum constraint holds."""
    q1, T1 = _hartley(pts1, weights)
    q2, T2 = _hartley(pts2, weights)
    A = _epipolar_rows(q1, q2) * weights[..., None]
    e = _nullspace(A)
    F = e.reshape(e.shape[:-1] + (3, 3))
    E = jnp.swapaxes(T2, -1, -2) @ F @ T1
    return project_to_essential(E)


def sampson_sq(E: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray):
    """Squared Sampson distance, batched over leading dims of E.

    E (..., 3, 3); pts (N, 2); returns (..., N)."""
    p1 = jnp.concatenate([pts1, jnp.ones_like(pts1[:, :1])], -1)  # (N, 3)
    p2 = jnp.concatenate([pts2, jnp.ones_like(pts2[:, :1])], -1)
    Ep1 = jnp.einsum("...ij,nj->...ni", E, p1)
    Etp2 = jnp.einsum("...ji,nj->...ni", E, p2)
    num = jnp.einsum("ni,...ni->...n", p2, Ep1) ** 2
    den = (
        Ep1[..., 0] ** 2 + Ep1[..., 1] ** 2 + Etp2[..., 0] ** 2 + Etp2[..., 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12)


class EssentialResult(NamedTuple):
    E: jnp.ndarray  # (3, 3)
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32


@functools.partial(jax.jit, static_argnames=("n_iters", "solver"))
def ransac_essential(
    key: jax.Array,
    pts1n: jnp.ndarray,
    pts2n: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float,
    n_iters: int = 512,
    solver: str = "5pt",
) -> EssentialResult:
    """Fully-batched RANSAC over normalized correspondences.

    `threshold` is the Sampson distance bound in normalized coords (pass
    pixel_threshold / fx for cv::findEssentialMat parity). `solver` picks
    the minimal hypothesis generator: "5pt" (Nistér — up to 10 candidate
    matrices per sample, markedly more accurate under noise) or "8pt"."""
    N = pts1n.shape[0]
    min_samples = 5 if solver == "5pt" else 8
    # masked sampling: compact the valid indices once, then draw uniform
    # slots from the valid prefix. (A Gumbel top-k over (S, N) cost ~1 ms
    # of the 13 ms step; this is (S, m) ints + small gathers. Duplicate
    # indices within one minimal sample are ~0.5% likely and only yield a
    # degenerate candidate that MSAC scores away — cv2's RANSAC tolerates
    # the same class of sample.)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), min_samples)
    order = jnp.argsort(~valid)  # valid indices first, stable
    slot = jax.random.randint(key, (n_iters, min_samples), 0, n_valid)
    idx = order[slot]  # (S, m)

    s1 = pts1n[idx]  # (S, m, 2)
    s2 = pts2n[idx]
    if solver == "5pt":
        from .fivepoint import five_point_essential

        E_all, ok = five_point_essential(s1, s2)  # (S, 10, 3, 3), (S, 10)
        E_cand = E_all.reshape(-1, 3, 3)
        cand_ok = ok.reshape(-1)
    else:
        w = jnp.ones(idx.shape, pts1n.dtype)
        E_cand = fit_essential_ls(s1, s2, w)  # (S, 3, 3)
        cand_ok = jnp.ones(E_cand.shape[0], bool)

    errs = sampson_sq(E_cand, pts1n, pts2n)  # (C, N)
    errs = jnp.where(jnp.isfinite(errs), errs, jnp.inf)
    thr2 = jnp.asarray(threshold, pts1n.dtype) ** 2
    # MSAC scoring: truncated residual sum (more discriminative than counts)
    msac = jnp.sum(
        jnp.where(valid[None, :], jnp.minimum(errs, thr2), thr2), axis=1
    )
    msac = jnp.where(cand_ok, msac, jnp.inf)
    best = jnp.argmin(msac)

    # Local optimization (LO-RANSAC): minimal-sample fits under noise are
    # wobbly — refit on annealed-threshold inlier sets (wide first to
    # gather the consensus, then tighten), keeping the best final-threshold
    # consensus seen.
    def classify(E):
        return (sampson_sq(E, pts1n, pts2n) < thr2) & valid

    E_best = E_cand[best]
    inl_best = classify(E_best)
    n_best = jnp.sum(inl_best)
    # two refits (wide gather, then final threshold): the 3rd/4th rounds
    # measurably never changed the consensus but cost a QR each (~0.4 ms)
    for mult in (2.0, 1.0):
        gather = (sampson_sq(E_best, pts1n, pts2n) < mult * thr2) & valid
        E_new = fit_essential_ls(pts1n, pts2n, gather.astype(pts1n.dtype))
        inl_new = classify(E_new)
        n_new = jnp.sum(inl_new)
        better = n_new >= n_best
        E_best = jnp.where(better, E_new, E_best)
        inl_best = jnp.where(better, inl_new, inl_best)
        n_best = jnp.maximum(n_new, n_best)
    return EssentialResult(E=E_best, inliers=inl_best, n_inliers=n_best)


class PoseResult(NamedTuple):
    R: jnp.ndarray  # (3, 3) x2 = R x1 + t
    t: jnp.ndarray  # (3,) unit norm
    mask: jnp.ndarray  # (N,) bool: inliers passing cheirality
    votes: jnp.ndarray  # () int32


@functools.partial(jax.jit, static_argnames=("max_depth",))
def recover_pose(
    E: jnp.ndarray,
    pts1n: jnp.ndarray,
    pts2n: jnp.ndarray,
    valid: jnp.ndarray,
    max_depth: float = 1e6,
) -> PoseResult:
    """4-way decomposition + cheirality vote (cv::recoverPose).

    `max_depth` bounds accepted depths relative to the unit baseline;
    the default is effectively unbounded — a hard 50x gate (OpenCV's
    default distanceThresh) disenfranchises most voters in far-field
    scenes and can flip the decomposition choice."""
    from .linalg3 import svd3x3
    from .triangulate import triangulate_depths

    U, s, Vt = svd3x3(E)
    # force proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[:, 2]

    Rs = jnp.stack([Ra, Ra, Rb, Rb])  # (4, 3, 3)
    ts = jnp.stack([t, -t, t, -t])  # (4, 3)

    def cheirality(R, tvec):
        # closed-form two-view depths (no eigendecomposition): the vote
        # only needs depth signs/magnitudes, not 3D points
        z1, z2 = triangulate_depths(R, tvec, pts1n, pts2n)
        finite = jnp.isfinite(z1) & jnp.isfinite(z2)
        good = (
            (z1 > 0) & (z2 > 0)
            & (z1 < max_depth) & (z2 < max_depth)
            & finite & valid
        )
        return good

    masks = jax.vmap(cheirality)(Rs, ts)  # (4, N)
    votes = jnp.sum(masks, axis=1)
    k = jnp.argmax(votes)
    return PoseResult(R=Rs[k], t=ts[k], mask=masks[k], votes=votes[k])
