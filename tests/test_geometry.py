"""Geometry: SE(3), essential RANSAC, recoverPose, triangulation, scale."""

import jax
import numpy as np
import pytest

from vo_tpu.geometry.epipolar import (
    fit_essential_ls,
    normalize_pixels,
    ransac_essential,
    recover_pose,
    sampson_sq,
)
from vo_tpu.geometry.scale import (
    masked_median,
    relative_scale_matched,
    relative_scale_unmatched,
)
from vo_tpu.geometry.se3 import exp_so3, inv_se3, log_so3, make_se3, project
from vo_tpu.geometry.triangulate import triangulate_dlt, triangulate_normalized


def random_rt(rng, max_angle=0.3):
    w = rng.normal(size=3)
    w = w / np.linalg.norm(w) * rng.uniform(0.05, max_angle)
    R = np.asarray(exp_so3(w.astype(np.float32)))
    t = rng.normal(size=3)
    t = (t / np.linalg.norm(t)).astype(np.float32)
    return R, t


def synth_correspondences(rng, R, t, n=200, noise=0.0, outliers=0):
    """Normalized-coordinate correspondences of random 3D points."""
    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1, 1, n), rng.uniform(4, 20, n)], 1
    ).astype(np.float32)
    x1 = X[:, :2] / X[:, 2:3]
    X2 = X @ R.T + t
    x2 = X2[:, :2] / X2[:, 2:3]
    if noise:
        x1 = x1 + rng.normal(scale=noise, size=x1.shape).astype(np.float32)
        x2 = x2 + rng.normal(scale=noise, size=x2.shape).astype(np.float32)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        x2[idx] = rng.uniform(-0.5, 0.5, (outliers, 2)).astype(np.float32)
    return x1.astype(np.float32), x2.astype(np.float32), X


def essential_from_rt(R, t):
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]], np.float32
    )
    return tx @ R


def test_so3_roundtrip(rng):
    w = rng.normal(size=(10, 3)).astype(np.float32) * 0.5
    R = np.asarray(exp_so3(w))
    w2 = np.asarray(log_so3(R))
    np.testing.assert_allclose(w, w2, atol=1e-5)
    # orthonormality
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)


def test_se3_inverse(rng):
    R, t = random_rt(rng)
    T = np.asarray(make_se3(R, t))
    Ti = np.asarray(inv_se3(T))
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-6)


def test_fit_essential_exact(rng):
    R, t = random_rt(rng)
    x1, x2, _ = synth_correspondences(rng, R, t, n=50)
    E = np.asarray(fit_essential_ls(x1, x2, np.ones(50, np.float32)))
    E_true = essential_from_rt(R, t)
    # E defined up to scale/sign
    E_true = E_true / np.linalg.norm(E_true)
    E_n = E / np.linalg.norm(E)
    err = min(np.abs(E_n - E_true).max(), np.abs(E_n + E_true).max())
    assert err < 1e-3
    s = np.asarray(sampson_sq(E, x1, x2))
    assert s.max() < 1e-8


def test_ransac_with_outliers(rng):
    R, t = random_rt(rng)
    x1, x2, _ = synth_correspondences(rng, R, t, n=300, noise=5e-4, outliers=90)
    valid = np.ones(300, bool)
    res = ransac_essential(
        jax.random.PRNGKey(0), x1, x2, valid, threshold=2e-3, n_iters=256
    )
    inl = np.asarray(res.inliers)
    # 210 true inliers; 5pt + LO should recover the bulk of them
    assert int(res.n_inliers) > 150
    s = np.asarray(sampson_sq(np.asarray(res.E), x1, x2))
    assert np.median(s[inl]) < 4e-6
    # the recovered pose direction must match ground truth
    pose = recover_pose(np.asarray(res.E), x1, x2, inl)
    cos = abs(np.dot(np.asarray(pose.t), t))
    assert cos > 0.99


def test_ransac_8pt_solver(rng):
    R, t = random_rt(rng)
    x1, x2, _ = synth_correspondences(rng, R, t, n=300, noise=1e-4, outliers=30)
    res = ransac_essential(
        jax.random.PRNGKey(1), x1, x2, np.ones(300, bool),
        threshold=2e-3, n_iters=256, solver="8pt",
    )
    assert int(res.n_inliers) > 200


def test_five_point_exact(rng):
    from vo_tpu.geometry.fivepoint import five_point_essential

    R, t = random_rt(rng)
    x1, x2, _ = synth_correspondences(rng, R, t, n=5)
    E, valid = five_point_essential(x1, x2)
    E, valid = np.asarray(E), np.asarray(valid)
    assert valid.sum() >= 1
    best = np.inf
    for k in range(10):
        if not valid[k]:
            continue
        s = np.asarray(sampson_sq(E[k], x1, x2))
        best = min(best, s.max())
    assert best < 1e-6  # one real solution interpolates the 5 points


def test_five_point_batched(rng):
    from vo_tpu.geometry.fivepoint import five_point_essential

    R, t = random_rt(rng)
    x1, x2, _ = synth_correspondences(rng, R, t, n=40)
    s1 = x1.reshape(8, 5, 2)
    s2 = x2.reshape(8, 5, 2)
    E, valid = five_point_essential(s1, s2)
    assert E.shape == (8, 10, 3, 3)
    assert valid.shape == (8, 10)
    assert np.asarray(valid).any(axis=1).all()  # every sample has a solution


def test_recover_pose(rng):
    R, t = random_rt(rng)
    x1, x2, _ = synth_correspondences(rng, R, t, n=120, noise=2e-4)
    E = np.asarray(fit_essential_ls(x1, x2, np.ones(120, np.float32)))
    pose = recover_pose(E, x1, x2, np.ones(120, bool))
    R_est, t_est = np.asarray(pose.R), np.asarray(pose.t)
    np.testing.assert_allclose(R_est, R, atol=5e-3)
    cos = abs(np.dot(t_est, t) / np.linalg.norm(t))
    assert cos > 0.999
    assert int(pose.votes) > 100


def test_triangulate_dlt(rng):
    R, t = random_rt(rng)
    K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]], np.float32)
    X = np.stack(
        [rng.uniform(-3, 3, 40), rng.uniform(-2, 2, 40), rng.uniform(5, 30, 40)], 1
    ).astype(np.float32)
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
    P2 = K @ np.hstack([R, t.reshape(3, 1)]).astype(np.float32)
    uv1 = np.asarray(project(K, X))
    uv2 = np.asarray(project(K, (X @ R.T + t)))
    Xh = np.asarray(triangulate_dlt(P1, P2, uv1, uv2))
    np.testing.assert_allclose(Xh, X, rtol=2e-3, atol=2e-2)


def test_triangulate_normalized_matches_pixel(rng):
    R, t = random_rt(rng)
    x1, x2, X = synth_correspondences(rng, R, t, n=30)
    Xh = np.asarray(triangulate_normalized(R, t, x1, x2))
    np.testing.assert_allclose(Xh, X, rtol=2e-3, atol=2e-2)


def test_masked_median():
    x = np.array([5.0, 1.0, 9.0, 3.0, 7.0], np.float32)
    m = np.ones(5, bool)
    # ascending: 1 3 5 7 9, count//2 = 2 -> 5
    assert float(masked_median(x, m)) == 5.0
    m2 = np.array([True, True, False, True, False])
    # valid: 5 1 3 -> sorted 1 3 5, idx 1 -> 3
    assert float(masked_median(x, m2)) == 3.0
    assert float(masked_median(x, np.zeros(5, bool))) == 1.0


def test_relative_scale_matched(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32) * 5.0
    valid = rng.random(50) > 0.2
    s = 0.37
    # cur cloud is prev shrunk by s -> dist ratio prev/cur = 1/s
    out = float(relative_scale_matched(pts, pts * s, valid))
    assert out == pytest.approx(1.0 / s, rel=1e-3)
    # empty clouds -> 1.0
    assert float(relative_scale_matched(pts, pts * s, np.zeros(50, bool))) == 1.0
    # clipping
    tiny = float(relative_scale_matched(pts, pts * 100.0, valid))
    assert tiny == pytest.approx(0.1)


def test_relative_scale_matched_unbiased_under_raster_order(rng):
    """Sanity in the adjacent-pair regime: raster-ordered clouds (SIFT
    slot order) make naive consecutive pairs spatially adjacent, with
    depth-noise-dominated separations. In the live pipeline (where the
    two clouds' noise is asymmetric: different image pairs, LK-search
    correlations) that pairing ran ~16% low — the tracking_sift
    failure-trajectory root cause, fixed by the scattered pairing
    (geometry/scale.py _scatter_perm; measured 13.7 -> 3.1 m drift at
    frame 50 of the hard sequence). This test pins the scattered
    estimator's accuracy in the raster regime; the trajectory-level
    regression guard is the eval (RESULTS.md)."""
    n_side = 24
    g = np.stack(
        np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)
    # raster order, small lateral spacing, depth-dominated noise
    base = np.concatenate(
        [g.astype(np.float32) * 0.08, np.full((len(g), 1), 20.0)], axis=1
    )
    est = []
    for trial in range(8):
        zn1 = rng.normal(0, 0.6, (len(g), 1)).astype(np.float32)
        zn2 = rng.normal(0, 0.6, (len(g), 1)).astype(np.float32)
        prev = base + np.concatenate([np.zeros((len(g), 2)), zn1], 1)
        cur = (base + np.concatenate([np.zeros((len(g), 2)), zn2], 1)) / 1.0
        valid = np.ones(len(g), bool)
        est.append(float(relative_scale_matched(prev, cur, valid)))
    # true relative scale is 1.0; require small bias despite the noise
    assert abs(np.median(est) - 1.0) < 0.05, est


def test_relative_scale_unmatched(rng):
    pts = rng.normal(size=(60, 3)).astype(np.float32) * 4.0
    v1 = np.ones(60, bool)
    v2 = np.ones(60, bool)
    out = float(relative_scale_unmatched(pts, v1, pts * 0.5, v2))
    assert out == pytest.approx(2.0, rel=1e-3)


class TestLinalg3ClosedForm:
    """Closed-form small-matrix solvers (geometry/linalg3.py) vs LAPACK."""

    def test_eigh3x3_random_symmetric(self, rng):
        X = rng.normal(size=(500, 3, 3)).astype(np.float32)
        S = X @ X.transpose(0, 2, 1)
        w, V = jax.jit(__import__(
            "vo_tpu.geometry.linalg3", fromlist=["eigh3x3"]).eigh3x3)(S)
        wr = np.linalg.eigvalsh(S)
        scale = np.abs(wr).max()
        assert np.abs(np.asarray(w) - wr).max() / scale < 1e-5
        R = np.einsum("bij,bj,bkj->bik", np.asarray(V), np.asarray(w),
                      np.asarray(V))
        assert np.abs(R - S).max() / scale < 1e-5
        orth = np.einsum("bij,bik->bjk", np.asarray(V), np.asarray(V))
        assert np.abs(orth - np.eye(3)).max() < 1e-5

    def test_svd3x3_essential_manifold(self, rng):
        from vo_tpu.geometry.linalg3 import svd3x3

        A = rng.normal(size=(500, 3, 3)).astype(np.float32)
        U0, _, Vt0 = np.linalg.svd(A)
        E = U0 @ np.diag([1.0, 1.0, 0.0]).astype(np.float32) @ Vt0
        U, s, Vt = jax.jit(svd3x3)(E)
        assert np.abs(np.asarray(s) - np.array([1, 1, 0])).max() < 2e-3
        rec = np.einsum("bij,bj,bjk->bik", np.asarray(U), np.asarray(s),
                        np.asarray(Vt))
        assert np.abs(rec - E).max() < 2e-3
        for M in (U, np.swapaxes(np.asarray(Vt), 1, 2)):
            orth = np.einsum("bij,bik->bjk", np.asarray(M), np.asarray(M))
            assert np.abs(orth - np.eye(3)).max() < 1e-5

    def test_nullspace_jacobi_vs_svd(self, rng):
        from vo_tpu.geometry.linalg3 import nullspace_jacobi

        # minimal-sample shape and the tall weighted refit shape
        for shape in ((256, 8, 9), (4, 1500, 9)):
            A = rng.normal(size=shape).astype(np.float32)
            v = jax.jit(nullspace_jacobi)(A)
            _, _, Vt = np.linalg.svd(A)
            dot = np.abs(np.sum(np.asarray(v) * Vt[..., -1, :], -1))
            assert dot.min() > 1 - 1e-5, shape
