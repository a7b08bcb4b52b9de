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


def eigh3x3(S: jnp.ndarray):
    """Closed-form symmetric (..., 3, 3) eigendecomposition — pure VPU
    arithmetic; replaces the serialized LAPACK-style eigh custom call.

    Returns (w, V): eigenvalues ASCENDING (matching jnp.linalg.eigh) and
    orthonormal columns. Uses the trigonometric (Cardano) eigenvalue
    form, cross-product eigenvector extraction with largest-pivot
    selection, and explicit re-orthogonalization so near-degenerate
    pairs still return an orthonormal basis (the degenerate subspace's
    internal orientation is arbitrary, as with any eigensolver)."""
    dt = S.dtype
    q = jnp.trace(S, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=dt)
    Sq = S - q[..., None, None] * I
    p2 = jnp.sum(Sq * Sq, axis=(-2, -1))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    B = Sq / p[..., None, None]
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)                          # largest
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)     # smallest
    w1 = 3.0 * q - w0 - w2

    def eigvec(w):
        # v spans null(S - w I): cross products of two rows; pick the
        # largest (the two rows most linearly independent of the null
        # direction), normalize
        M = S - w[..., None, None] * I
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c12 = jnp.cross(r1, r2)
        c20 = jnp.cross(r2, r0)
        n01 = jnp.sum(c01 * c01, -1)
        n12 = jnp.sum(c12 * c12, -1)
        n20 = jnp.sum(c20 * c20, -1)
        best = jnp.argmax(jnp.stack([n01, n12, n20], -1), axis=-1)
        v = jnp.take_along_axis(
            jnp.stack([c01, c12, c20], -2), best[..., None, None], axis=-2
        )[..., 0, :]
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # fully degenerate (S ~ w I): every cross vanishes; any unit
        # vector is an eigenvector — use e0 / e1 (orthogonalized below)
        e = jnp.zeros_like(v).at[..., 0].set(1.0)
        v = jnp.where(n > 1e-20, v / jnp.maximum(n, 1e-30), e)
        return v

    v0 = eigvec(w0)
    v2 = eigvec(w2)
    # orthogonalize the extreme pair (guards repeated eigenvalues), then
    # complete the right-handed basis. If v2 collapses onto v0 (triple
    # eigenvalue), substitute a canonical direction orthogonal to v0.
    v2 = v2 - jnp.sum(v2 * v0, -1, keepdims=True) * v0
    n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    alt = jnp.cross(v0, jnp.zeros_like(v0).at[..., 1].set(1.0))
    alt2 = jnp.cross(v0, jnp.zeros_like(v0).at[..., 2].set(1.0))
    alt = jnp.where(
        jnp.linalg.norm(alt, axis=-1, keepdims=True) > 0.1, alt, alt2
    )
    v2 = jnp.where(n2 > 1e-20, v2 / jnp.maximum(n2, 1e-30),
                   alt / jnp.maximum(
                       jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-30))
    v1 = jnp.cross(v2, v0)
    w = jnp.stack([w0, w1, w2], -1)
    V = jnp.stack([v0, v1, v2], -1)  # columns
    return w, V


def svd3x3(M: jnp.ndarray):
    """Closed-form (..., 3, 3) SVD via eigh3x3(M^T M) — pure VPU.

    Returns (U, s, Vt) with s DESCENDING (matching jnp.linalg.svd).
    U columns are M v / sigma, with the last column completed by cross
    product (right-handed up to the sign needed for orthogonality), so
    rank-2 inputs (essential matrices) are handled exactly."""
    MtM = jnp.einsum("...ji,...jk->...ik", M, M)
    w, V = eigh3x3(MtM)
    # descending singular values
    s = jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))
    V = V[..., ::-1]
    u0 = jnp.einsum("...ij,...j->...i", M, V[..., 0])
    u1 = jnp.einsum("...ij,...j->...i", M, V[..., 1])
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0, axis=-1, keepdims=True), 1e-30)
    u1 = u1 - jnp.sum(u1 * u0, -1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-30)
    u2 = jnp.cross(u0, u1)
    # sign: u2 must satisfy M v2 = s2 u2 when s2 > 0; cross gives +/- u2.
    # Cheap fix: flip u2 (and v2's sign pairing) toward M v2 when it is
    # non-negligible; for rank-2 inputs s2 = 0 and the sign is free.
    mv2 = jnp.einsum("...ij,...j->...i", M, V[..., 2])
    flip = jnp.where(jnp.sum(mv2 * u2, -1) < 0.0, -1.0, 1.0)
    u2 = u2 * flip[..., None]
    U = jnp.stack([u0, u1, u2], -1)
    return U, s, jnp.swapaxes(V, -1, -2)


def nullspace_jacobi(A: jnp.ndarray, sweeps: int = 8) -> jnp.ndarray:
    """(..., m, k) -> (..., k) right-singular vector of the SMALLEST
    singular value, via one-sided Jacobi.

    Rotations orthogonalize the columns of A directly (never forming
    A^T A, so fp32 accuracy does not pay the squared condition number
    that made eigh(A^T A) ~100x worse than SVD for the 8-point fit —
    see epipolar._nullspace). Every rotation is a batched length-m
    vector op: the whole solve is VPU arithmetic that batches over
    RANSAC hypotheses, replacing the serialized QR+SVD custom calls.

    The sweep driver (`_jacobi_sweeps`) uses a round-robin (tournament)
    parallel ordering: disjoint pairs rotate simultaneously, cutting the
    sequential depth from C(k,2) rotations per sweep to k rounds of
    floor(k/2) concurrent rotations each — the solve is latency-bound,
    so this is a ~4x wall-clock cut at k=9. Classic circle method (dummy
    element for odd k); every unordered pair meets exactly once per
    sweep."""
    B, V = _jacobi_sweeps(A, sweeps)
    sv2 = jnp.sum(B * B, axis=-2)  # squared singular values, (..., k)
    i = jnp.argmin(sv2, axis=-1)
    return jnp.take_along_axis(V, i[..., None, None], axis=-1)[..., 0]


def null_basis_jacobi(
    A: jnp.ndarray, nb: int, sweeps: int = 8
) -> jnp.ndarray:
    """(..., m, k) -> (..., nb, k) orthonormal right-singular vectors of
    the `nb` SMALLEST singular values, ordered by DESCENDING singular
    value (matching `jnp.linalg.svd(...)[2][..., k-nb:, :]`, the LAPACK
    Vt tail the 5-point solver used to take).

    Same one-sided Jacobi as `nullspace_jacobi`; V is a product of exact
    rotations, so the returned basis is orthonormal to machine precision
    even for the degenerate singular values of an exact nullspace. On TPU
    this replaces jnp.linalg.svd's QR+eigh+Cholesky custom-call chain —
    measured ~4 ms/step inside RANSAC's batched 5-point solve — with
    pure batched VPU arithmetic."""
    from jax import lax

    k = A.shape[-1]
    B, V = _jacobi_sweeps(A, sweeps)
    sv2 = jnp.sum(B * B, axis=-2)  # (..., k)
    # nb smallest, then flip so the LARGEST of those comes first (the
    # LAPACK Vt[k-nb:] row order).
    _, idx = lax.top_k(-sv2, nb)  # ascending sv2
    idx = jnp.flip(idx, axis=-1)  # descending sv2
    # gather columns idx of V -> rows of the output basis
    Vt = jnp.swapaxes(V, -1, -2)  # (..., k, k) rows = right-singular vecs
    return jnp.take_along_axis(Vt, idx[..., :, None], axis=-2)


def _jacobi_sweeps(A: jnp.ndarray, sweeps: int):
    """Shared one-sided-Jacobi driver: returns (B, V) with B = A @ V,
    columns of B orthogonal after `sweeps` round-robin sweeps."""
    import numpy as np
    from jax import lax

    k = A.shape[-1]
    ke = k + (k % 2)
    circle = list(range(ke))
    rounds = []
    for _ in range(ke - 1):
        pair = [
            (min(circle[i], circle[ke - 1 - i]),
             max(circle[i], circle[ke - 1 - i]))
            for i in range(ke // 2)
        ]
        rounds.append([(p, q) for p, q in pair if q < k])
        circle = [circle[0]] + [circle[-1]] + circle[1:-1]
    V0 = jnp.broadcast_to(jnp.eye(k, dtype=A.dtype), A.shape[:-2] + (k, k))

    def rotate_round(B, V, prs):
        ip = np.array([p for p, _ in prs])
        iq = np.array([q for _, q in prs])
        Bp, Bq = B[..., :, ip], B[..., :, iq]
        gpp = jnp.sum(Bp * Bp, -2)
        gqq = jnp.sum(Bq * Bq, -2)
        gpq = jnp.sum(Bp * Bq, -2)
        th = 0.5 * jnp.arctan2(2.0 * gpq, gqq - gpp)
        c = jnp.cos(th)[..., None, :]
        s = jnp.sin(th)[..., None, :]
        B = (
            B.at[..., :, ip].set(c * Bp - s * Bq)
            .at[..., :, iq].set(s * Bp + c * Bq)
        )
        Vp, Vq = V[..., :, ip], V[..., :, iq]
        V = (
            V.at[..., :, ip].set(c * Vp - s * Vq)
            .at[..., :, iq].set(s * Vp + c * Vq)
        )
        return B, V

    # Unrolled sweeps (no lax.scan): the sweep loop lowers to a `while`
    # whose per-iteration carry round-trips and sequencing overhead
    # dominate for the small/batch-1 problems this serves (profiled:
    # RANSAC's two batch-1 LO-refit 9x9 Jacobis cost 0.25 ms EACH as
    # scans — pure latency, not arithmetic). Static unrolling lets XLA
    # fuse across rounds; k <= 9 and sweeps <= 8 keep the program small.
    B, V = A, V0
    for _ in range(sweeps):
        for prs in rounds:
            B, V = rotate_round(B, V, prs)
    return B, V


def gauss_jordan_solve(
    A: jnp.ndarray, B: jnp.ndarray, eps: float = 1e-12
):
    """Batched dense solve A @ X = B via Gauss-Jordan with partial
    pivoting: (..., n, n), (..., n, m) -> (X (..., n, m), ok (...,)).

    n static-unrolled elimination steps of full-width batched vector ops —
    replaces jnp.linalg.solve's LuDecompositionBlock custom-call chain
    (serialized, ~0.6 ms/step for RANSAC's (S, 10, 10) Nistér
    Gauss-Jordan reduction) with fused VPU arithmetic. `ok` is False
    where some pivot magnitude fell below `eps` (singular system; the
    jnp.linalg.solve path returned inf/nan there)."""
    n = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)  # (..., n, n+m)
    idx = jnp.arange(n)
    ok = jnp.ones(A.shape[:-2], bool)
    for kk in range(n):
        col = M[..., :, kk]  # (..., n)
        score = jnp.where(idx >= kk, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(score, axis=-1)  # (...,)
        prow = jnp.take_along_axis(
            M, p[..., None, None], axis=-2
        )  # (..., 1, n+m)
        piv = prow[..., 0, kk]
        ok = ok & (jnp.abs(piv) > eps)
        prow = prow / jnp.where(jnp.abs(piv) > eps, piv, 1.0)[..., None, None]
        is_k = idx == kk  # (n,)
        is_p = idx == p[..., None]  # (..., n)
        # swap: row p inherits old row k (when p != k), row k = pivot row
        M = jnp.where(
            (is_p & ~is_k)[..., None], M[..., kk : kk + 1, :], M
        )
        M = jnp.where(is_k[:, None], prow, M)
        # eliminate column kk from every other row
        f = jnp.where(is_k, 0.0, M[..., :, kk])  # (..., n)
        M = M - f[..., None] * prow
    return M[..., :, n:], ok
