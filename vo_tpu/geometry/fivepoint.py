"""Nistér 5-point minimal essential-matrix solver, fully batched for TPU.

The reference relies on cv::findEssentialMat's 5-point solver
(feature_tracking.cpp:229). Classic implementations reduce the problem to a
10th-degree polynomial whose roots come from a nonsymmetric eigensolver —
unavailable on TPU. This implementation keeps everything batched and
compiler-friendly:

1. nullspace basis (X, Y, Z, W) of the 5x9 epipolar system via batched SVD;
   E(x, y, z) = x X + y Y + z Z + W.
2. the 10 cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
   are expanded over the 20 degree-<=3 monomials *numerically*: evaluate
   the constraints at 20 fixed generic (x, y, z) samples and multiply by a
   precomputed (numpy f64) inverse monomial matrix — no symbolic algebra.
3. Gauss-Jordan reduction of the 10x20 system is one batched
   `linalg.solve`.
4. Nistér's <e>, <f>, <g> rows give a 3x3 polynomial matrix B(z) whose
   determinant (degree 10, via 1-D convolutions) must vanish.
5. roots by Durand-Kerner iteration in complex64 — a fixed-trip-count,
   embarrassingly parallel root finder; real roots are masked, complex ones
   discarded.
6. back-substitution x(z), y(z) from B(z) gives up to 10 essential matrix
   candidates per sample, returned with a validity mask.

Reference for the math: Nistér, "An efficient solution to the five-point
relative pose problem", PAMI 2004 (re-derived; no code ported).
"""

from __future__ import annotations

import functools

import os

import jax
import jax.numpy as jnp
import numpy as np

# A/B solver switch (jacobi | lapack), snapshotted at import — see below.
_FIVEPT_IMPL = os.environ.get("VO_TPU_5PT", "jacobi")

# ---------------------------------------------------------------------------
# Monomial machinery (host-side constants, fp64)
# ---------------------------------------------------------------------------

# 20 monomials of total degree <= 3 in (x, y, z), Nistér's ordering:
# leading block (eliminated): x^3, y^3, x^2 y, x y^2, x^2 z, x^2,
#                             y^2 z, y^2, x y z, x y
# trailing block (kept):      x z^2, x z, x, y z^2, y z, y, z^3, z^2, z, 1
MONOMIALS = [
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1), (2, 0, 0),
    (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1), (0, 1, 0),
    (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]


def _sample_points() -> np.ndarray:
    """20 fixed generic (x, y, z) evaluation points (well-conditioned)."""
    rng = np.random.default_rng(12345)
    # points on a sphere of radius ~1.3 — keeps the 20x20 monomial matrix
    # far from singular (condition ~1e3, fine in f64)
    p = rng.normal(size=(20, 3))
    p = p / np.linalg.norm(p, axis=1, keepdims=True)
    r = 0.7 + 0.6 * rng.random((20, 1))
    return p * r


_PTS = _sample_points()
_MONO_MAT = np.stack(
    [
        np.prod(_PTS ** np.array(m, dtype=np.float64), axis=1)
        for m in MONOMIALS
    ],
    axis=1,
)  # (20 points, 20 monomials)
_MONO_INV = np.linalg.inv(_MONO_MAT)  # fp64 host constant


def _constraints(E: jnp.ndarray) -> jnp.ndarray:
    """The 10 cubic scalar constraints for a (..., 3, 3) matrix:
    [det(E)] ++ flatten(2 E E^T E - tr(E E^T) E)."""
    det = jnp.linalg.det(E)
    EEt = E @ jnp.swapaxes(E, -1, -2)
    tr = EEt[..., 0, 0] + EEt[..., 1, 1] + EEt[..., 2, 2]
    C = 2.0 * (EEt @ E) - tr[..., None, None] * E
    return jnp.concatenate(
        [det[..., None], C.reshape(C.shape[:-2] + (9,))], axis=-1
    )  # (..., 10)


def _constraint_coeffs(basis: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 3, 3) nullspace basis (X, Y, Z, W) -> (..., 10, 20)
    polynomial coefficients over MONOMIALS (w is fixed to 1)."""
    X, Y, Z, W = (basis[..., i, :, :] for i in range(4))
    pts = jnp.asarray(_PTS, basis.dtype)  # (20, 3)
    # E at each sample point: (..., 20, 3, 3)
    E = (
        pts[:, 0, None, None] * X[..., None, :, :]
        + pts[:, 1, None, None] * Y[..., None, :, :]
        + pts[:, 2, None, None] * Z[..., None, :, :]
        + W[..., None, :, :]
    )
    vals = _constraints(E)  # (..., 20 points, 10 constraints)
    Minv = jnp.asarray(_MONO_INV, basis.dtype)  # (20, 20)
    # coeffs[c, m] solves vals[p, c] = sum_m coeffs[c, m] * mono[p, m]
    return jnp.einsum("mp,...pc->...cm", Minv, vals)


# ---------------------------------------------------------------------------
# Polynomial helpers (ascending-power coefficient vectors)
# ---------------------------------------------------------------------------


def _polymul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 1-D polynomial product over the last axis."""
    la, lb = a.shape[-1], b.shape[-1]
    out = jnp.zeros(a.shape[:-1] + (la + lb - 1,), a.dtype)
    for i in range(la):
        out = out.at[..., i : i + lb].add(a[..., i : i + 1] * b)
    return out


def _pad_to(p: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.pad(p, [(0, 0)] * (p.ndim - 1) + [(0, n - p.shape[-1])])


def durand_kerner(
    coeffs: jnp.ndarray, iters: int = 80
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All complex roots of batched real polynomials (ascending coeffs,
    degree = coeffs.shape[-1] - 1). Fixed-iteration Durand-Kerner with
    explicit (re, im) float arithmetic — complex dtypes are poorly
    supported on the TPU backend — and a Cauchy-bound rescale so roots land
    near the unit circle regardless of magnitude.

    Returns (roots_re (..., deg), roots_im (..., deg), ok (...,) mask)."""
    deg = coeffs.shape[-1] - 1
    lead = coeffs[..., -1:]
    ok = jnp.abs(lead[..., 0]) > 1e-12
    monic = coeffs / jnp.where(jnp.abs(lead) > 1e-12, lead, 1.0)

    # Cauchy-style scale: s ~ max |c_k|^(1/(deg-k)) puts roots of z = s*u
    # near |u| <= ~2.
    mags = jnp.stack(
        [
            jnp.abs(monic[..., k]) ** (1.0 / (deg - k))
            for k in range(deg)
        ],
        axis=-1,
    )
    s = jnp.maximum(jnp.max(mags, axis=-1), 1e-6)  # (...,)
    # substitute z = s*u: b_k = c_k * s^(k - deg) keeps the u-poly monic
    powers_scale = s[..., None] ** jnp.arange(deg + 1)
    b = monic * powers_scale / (s[..., None] ** deg)

    # init on a circle of radius 1.2 with an irrational-ish angle offset
    ang = 2.0 * np.pi * np.arange(deg) / deg + 0.39
    r_re = jnp.broadcast_to(
        jnp.asarray(1.2 * np.cos(ang), coeffs.dtype), b.shape[:-1] + (deg,)
    )
    r_im = jnp.broadcast_to(
        jnp.asarray(1.2 * np.sin(ang), coeffs.dtype), b.shape[:-1] + (deg,)
    )

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def horner(xr, xi):
        """Evaluate the monic u-poly at (..., deg) points via Horner."""
        pr = jnp.ones_like(xr)
        pi = jnp.zeros_like(xi)
        for k in range(deg - 1, -1, -1):
            pr, pi = cmul(pr, pi, xr, xi)
            ck = b[..., k][..., None]
            pr = pr + ck
        return pr, pi

    def body(_, carry):
        xr, xi = carry
        pr, pi = horner(xr, xi)
        # denominator: prod over j != i of (x_i - x_j)
        dr = xr[..., :, None] - xr[..., None, :]
        di = xi[..., :, None] - xi[..., None, :]
        eye = jnp.eye(deg, dtype=coeffs.dtype)
        dr = dr + eye  # diagonal -> 1 + 0i
        qr = jnp.ones_like(xr)
        qi = jnp.zeros_like(xi)
        for j in range(deg):
            qr, qi = cmul(qr, qi, dr[..., j], di[..., j])
        # step = p / q
        q2 = jnp.maximum(qr * qr + qi * qi, 1e-20)
        sr = (pr * qr + pi * qi) / q2
        si = (pi * qr - pr * qi) / q2
        return xr - sr, xi - si

    r_re, r_im = jax.lax.fori_loop(0, iters, body, (r_re, r_im))
    return r_re * s[..., None], r_im * s[..., None], ok


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------


@jax.jit
def five_point_essential(
    pts1: jnp.ndarray, pts2: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Minimal 5-point solve, batched over leading dims.

    pts1, pts2: (..., 5, 2) normalized correspondences.
    Returns (E (..., 10, 3, 3), valid (..., 10)) — up to 10 real solutions
    per sample, masked."""
    from .epipolar import _epipolar_rows, project_to_essential
    from .linalg3 import gauss_jordan_solve, null_basis_jacobi

    # snapshotted at import time (module constant): the callers are jitted
    # once, so the path bakes in at first trace — flipping the env var
    # mid-process is a documented no-op; set it before importing vo_tpu
    _impl = _FIVEPT_IMPL
    A = _epipolar_rows(pts1, pts2)  # (..., 5, 9)
    if _impl == "lapack":
        # LAPACK custom-call path (A/B reference): ~3 ms/step slower in
        # the tracking RANSAC but the conditioning gold standard.
        _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
        basis = Vt[..., 5:9, :].reshape(Vt.shape[:-2] + (4, 3, 3))
    else:
        # 4-dim right nullspace of A via one-sided Jacobi (linalg3): pure
        # batched VPU arithmetic. jnp.linalg.svd on TPU lowers to a
        # QR+eigh+Cholesky+LU custom-call chain that measured ~3 ms/step
        # inside the tracking RANSAC (profiler: EighTpu 1.6 ms + Cholesky
        # + QrDecompositionBlock whiles); any orthonormal nullspace basis
        # is equivalent for the Nistér construction below.
        basis9 = null_basis_jacobi(A, 4)  # (..., 4, 9), Vt[5:9] row order
        basis = basis9.reshape(basis9.shape[:-2] + (4, 3, 3))  # X, Y, Z, W

    coeffs = _constraint_coeffs(basis)  # (..., 10, 20)

    # Gauss-Jordan: reduced B s.t. leading monomials = -B @ trailing
    # (batched in-graph elimination, linalg3.gauss_jordan_solve — the
    # LuDecompositionBlock custom call measured ~0.6 ms/step here)
    lead_blk = coeffs[..., :, :10]
    trail_blk = coeffs[..., :, 10:]
    if _impl == "lapack":
        B = jnp.linalg.solve(lead_blk, trail_blk)  # (..., 10, 10)
        gj_ok = jnp.all(jnp.isfinite(B), axis=(-1, -2))
    else:
        B, gj_ok = gauss_jordan_solve(lead_blk, trail_blk)  # (..., 10, 10)
        gj_ok = gj_ok & jnp.all(jnp.isfinite(B), axis=(-1, -2))

    # Nistér rows: <e> = row(x^2 z) - z*row(x^2)   (indices 4, 5)
    #              <f> = row(y^2 z) - z*row(y^2)   (indices 6, 7)
    #              <g> = row(x y z) - z*row(x y)   (indices 8, 9)
    # Each is  px(z)*x + py(z)*y + p1(z) = 0 with trailing monomial order
    # [xz^2, xz, x, yz^2, yz, y, z^3, z^2, z, 1].
    def efg_row(rz, r1):
        """rz = B row of the *z multiplied* monomial, r1 = B row of the
        plain monomial. Ascending z-power coefficient vectors."""
        # leading = -sum B[j] T_j; constraint:  (-rz + z*r1) . T = 0 sign-
        # flipped is fine (homogeneous). Use  q(z) = z*r1 - rz per column.
        def col(j0, degs):
            # combine columns j0..j0+len(degs)-1 whose monomial z-degree is
            # degs[k]; produce ascending coeffs of (z*r1 - rz) terms.
            n = max(degs) + 2
            out = jnp.zeros(rz.shape[:-1] + (n,), rz.dtype)
            for k, d in enumerate(degs):
                j = j0 + k
                out = out.at[..., d].add(-rz[..., j])
                out = out.at[..., d + 1].add(r1[..., j])
            return out

        px = col(0, [2, 1, 0])  # xz^2, xz, x  -> degree <= 3
        py = col(3, [2, 1, 0])
        p1 = col(6, [3, 2, 1, 0])  # z^3, z^2, z, 1 -> degree <= 4
        return px, py, p1

    e = efg_row(B[..., 4, :], B[..., 5, :])
    f = efg_row(B[..., 6, :], B[..., 7, :])
    g = efg_row(B[..., 8, :], B[..., 9, :])

    # det of [[ex, ey, e1], [fx, fy, f1], [gx, gy, g1]] -> degree 10 in z
    def det3(r0, r1, r2):
        t0 = _polymul(r0[0], _polymul(r1[1], r2[2]))
        t1 = _polymul(r0[0], _polymul(r1[2], r2[1]))
        t2 = _polymul(r0[1], _polymul(r1[0], r2[2]))
        t3 = _polymul(r0[1], _polymul(r1[2], r2[0]))
        t4 = _polymul(r0[2], _polymul(r1[0], r2[1]))
        t5 = _polymul(r0[2], _polymul(r1[1], r2[0]))
        n = 11
        return (
            _pad_to(t0, n) - _pad_to(t1, n) - _pad_to(t2, n)
            + _pad_to(t3, n) + _pad_to(t4, n) - _pad_to(t5, n)
        )

    poly = det3(e, f, g)  # (..., 11)
    z, z_im, dk_ok = durand_kerner(poly)  # (..., 10) re/im

    real = jnp.abs(z_im) < 1e-3 * (1.0 + jnp.abs(z))

    # back-substitute x(z), y(z): solve the 2x2 from rows e, f
    def poly_at(p, zv):
        # p (..., n) ascending; zv (..., 10)
        n = p.shape[-1]
        zp = zv[..., None] ** jnp.arange(n)  # (..., 10, n)
        return jnp.sum(zp * p[..., None, :], axis=-1)

    ex, ey, e1 = (poly_at(p, z) for p in e)
    fx, fy, f1 = (poly_at(p, z) for p in f)
    det2 = ex * fy - ey * fx
    safe = jnp.abs(det2) > 1e-12
    inv = 1.0 / jnp.where(safe, det2, 1.0)
    x = (-e1 * fy + ey * f1) * inv
    y = (-ex * f1 + e1 * fx) * inv

    X, Y, Z, W = (basis[..., i, :, :] for i in range(4))
    E = (
        x[..., None, None] * X[..., None, :, :]
        + y[..., None, None] * Y[..., None, :, :]
        + z[..., None, None] * Z[..., None, :, :]
        + W[..., None, :, :]
    )  # (..., 10, 3, 3)
    norm = jnp.linalg.norm(E, axis=(-1, -2), keepdims=True)
    E = E / jnp.maximum(norm, 1e-12)

    valid = real & safe & gj_ok[..., None] & dk_ok[..., None]
    valid = valid & jnp.all(jnp.isfinite(E), axis=(-1, -2))
    return E, valid
