"""Windowed bundle adjustment tests.

The reference has no BA tests (Ceres was trusted); we validate our LM+Schur
solver on synthetic problems with exact ground truth, then the full vo_ba
pipeline on a rendered sequence (SURVEY.md §4 strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.ba.schur import BAConfig, bundle_adjust, reprojection_rmse
from vo_tpu.ba.window import (
    WindowConfig,
    run_window_ba,
    window_init,
    window_push,
    window_reset,
)
from vo_tpu.geometry.se3 import exp_so3


def make_ba_problem(
    W=5, L=60, noise_px=1.0, pose_noise=0.02, point_noise=0.5, seed=0
):
    """Ground-truth window: camera moving along +z, points ahead of it."""
    rng = np.random.default_rng(seed)
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    X = np.stack(
        [
            rng.uniform(-20, 20, L),
            rng.uniform(-5, 5, L),
            rng.uniform(15, 60, L),
        ],
        1,
    )
    # world->cam: camera at z = -i (so points stay in front), tiny yaw
    poses = np.zeros((W, 6))
    for i in range(W):
        poses[i, :3] = [0, 0.01 * i, 0]
        poses[i, 3:] = [0.1 * i, 0, float(i)]

    def project(pose6, Xw):
        R = np.asarray(exp_so3(jnp.asarray(pose6[:3], jnp.float32)))
        pc = Xw @ R.T + pose6[3:]
        return (
            pc[:, :2] / pc[:, 2:3] * np.array([K[0, 0], K[1, 1]])
            + np.array([K[0, 2], K[1, 2]])
        )

    obs = np.stack([project(poses[i], X) for i in range(W)])  # (W,L,2)
    obs_noisy = obs + rng.normal(0, noise_px, obs.shape)

    poses0 = poses.copy()
    poses0[1:] += rng.normal(0, pose_noise, (W - 1, 6))  # keep gauge pose
    X0 = X + rng.normal(0, point_noise, X.shape)
    return (
        jnp.asarray(poses0, jnp.float32),
        jnp.asarray(X0, jnp.float32),
        jnp.asarray(obs_noisy, jnp.float32),
        jnp.asarray(K, jnp.float32),
        poses,
        X,
    )


class TestBundleAdjust:
    def test_cost_decreases_and_poses_recover(self):
        p0, X0, obs, K, p_gt, X_gt = make_ba_problem(noise_px=0.3)
        W, L = obs.shape[:2]
        res = bundle_adjust(
            p0, X0, obs,
            jnp.ones((W, L), bool), jnp.ones((L,), bool), K,
            BAConfig(max_iters=25),
        )
        assert float(res.cost) < float(res.cost0) * 0.05
        # Monocular BA with only pose 0 gauge-fixed (like the reference,
        # with_bundle_adjustment.cpp:669) leaves global scale free: align
        # by one scalar before comparing translations.
        t_est = np.asarray(res.poses)[:, 3:]
        t_gt = p_gt[:, 3:]
        s = float((t_gt * t_est).sum() / np.maximum((t_est * t_est).sum(), 1e-12))
        t_err = np.abs(s * t_est - t_gt).max()
        assert t_err < 0.05, (t_err, s)
        r_err = np.abs(np.asarray(res.poses)[:, :3] - p_gt[:, :3]).max()
        assert r_err < 0.01, r_err

    def test_gauge_pose_fixed(self):
        p0, X0, obs, K, _, _ = make_ba_problem()
        W, L = obs.shape[:2]
        res = bundle_adjust(
            p0, X0, obs, jnp.ones((W, L), bool), jnp.ones((L,), bool), K
        )
        np.testing.assert_array_equal(np.asarray(res.poses[0]), np.asarray(p0[0]))

    def test_masked_padding_is_inert(self):
        """Adding padded landmark rows must not change the solution."""
        p0, X0, obs, K, _, _ = make_ba_problem(L=40)
        W, L = obs.shape[:2]
        res_a = bundle_adjust(
            p0, X0, obs, jnp.ones((W, L), bool), jnp.ones((L,), bool), K
        )
        pad = 17
        X0p = jnp.concatenate([X0, jnp.zeros((pad, 3), jnp.float32)])
        obsp = jnp.concatenate(
            [obs, jnp.zeros((W, pad, 2), jnp.float32)], axis=1
        )
        pmask = jnp.concatenate([jnp.ones(L, bool), jnp.zeros(pad, bool)])
        res_b = bundle_adjust(
            p0, X0p, obsp, jnp.ones((W, L + pad), bool), pmask, K
        )
        # fp32 summation reorder across LM iterations bounds agreement
        np.testing.assert_allclose(
            np.asarray(res_a.poses), np.asarray(res_b.poses),
            rtol=1e-3, atol=1e-3,
        )

    def test_huber_rejects_outliers(self):
        p0, X0, obs, K, p_gt, _ = make_ba_problem(noise_px=0.2, seed=3)
        W, L = obs.shape[:2]
        # corrupt 10% of observations badly
        rng = np.random.default_rng(7)
        obs_c = np.asarray(obs).copy()
        bad = rng.choice(L, L // 10, replace=False)
        obs_c[:, bad] += rng.uniform(30, 80, (W, len(bad), 2))
        res = bundle_adjust(
            p0, X0, jnp.asarray(obs_c),
            jnp.ones((W, L), bool), jnp.ones((L,), bool), K,
            BAConfig(max_iters=25),
        )
        t_est = np.asarray(res.poses)[:, 3:]
        t_gt = p_gt[:, 3:]
        s = float((t_gt * t_est).sum() / np.maximum((t_est * t_est).sum(), 1e-12))
        t_err = np.abs(s * t_est - t_gt).max()
        assert t_err < 0.15, (t_err, s)

    def test_reprojection_rmse_drops(self):
        p0, X0, obs, K, _, _ = make_ba_problem(noise_px=0.0, seed=5)
        W, L = obs.shape[:2]
        om = jnp.ones((W, L), bool)
        pm = jnp.ones((L,), bool)
        before = float(reprojection_rmse(p0, X0, obs, om, pm, K))
        res = bundle_adjust(p0, X0, obs, om, pm, K, BAConfig(max_iters=25))
        after = float(reprojection_rmse(res.poses, res.points, obs, om, pm, K))
        assert after < before * 0.05
        assert after < 0.1


class TestWindow:
    def test_push_shift_and_reset(self):
        st = window_init(3, 4)
        for i in range(5):
            st = window_push(
                st,
                jnp.eye(4) * (i + 1.0),
                jnp.full((4, 2), float(i)),
                jnp.ones((4,), bool),
            )
        assert int(st.count) == 3
        # newest at -1, chronological order
        np.testing.assert_allclose(np.asarray(st.obs[-1, 0]), [4.0, 4.0])
        np.testing.assert_allclose(np.asarray(st.obs[0, 0]), [2.0, 2.0])
        st = window_reset(st)
        assert int(st.count) == 0
        assert not bool(st.valid.any())

    def test_run_window_ba_refines_poses(self):
        """Perturbed window poses move toward GT after BA; baseline and
        count gates respected."""
        p0, X0, obs, K, p_gt, X_gt = make_ba_problem(
            noise_px=0.0, pose_noise=0.0, point_noise=0.0
        )
        W, L = obs.shape[:2]
        # Build cam->world poses from world->cam gt, perturb the middle ones
        from vo_tpu.geometry.se3 import inv_se3, make_se3

        T_wc = make_se3(
            exp_so3(jnp.asarray(p_gt[:, :3], jnp.float32)),
            jnp.asarray(p_gt[:, 3:], jnp.float32),
        )
        T_cw = inv_se3(T_wc)
        T_cw_noisy = np.asarray(T_cw).copy()
        T_cw_noisy[2:, :3, 3] += np.array([0.2, -0.1, 0.3])

        st = window_init(W, L)
        for i in range(W):
            st = window_push(
                st, jnp.asarray(T_cw_noisy[i], jnp.float32),
                obs[i], jnp.ones((L,), bool),
            )
        cfg = WindowConfig(window_size=W, min_landmarks=10)
        new_poses, pose_ok, info = run_window_ba(st, K, cfg)
        assert bool(info["ba_ran"])
        assert int(info["ba_accepted"]) >= W - 1
        # BA recovers the window up to the scale gauge (pinned to the
        # corrupted init's trajectory length): scale-align camera centers
        # relative to the gauge-fixed pose 0 before comparing.
        c_gt = np.asarray(T_cw)[:, :3, 3]
        c0 = c_gt[0]

        def aligned_err(centers):
            rel, rel_gt = centers - c0, c_gt - c0
            s = float(
                (rel_gt * rel).sum() / np.maximum((rel * rel).sum(), 1e-12)
            )
            return np.abs(s * rel - rel_gt).max()

        err_before = aligned_err(T_cw_noisy[:, :3, 3])
        err_after = aligned_err(np.asarray(new_poses)[:, :3, 3])
        assert err_after < err_before * 0.3, (err_before, err_after)

    def test_ba_gated_off_when_window_not_full(self):
        st = window_init(5, 16)
        st = window_push(
            st, jnp.eye(4), jnp.zeros((16, 2)), jnp.ones((16,), bool)
        )
        K = jnp.asarray(np.diag([300.0, 300.0, 1.0]), jnp.float32)
        new_poses, pose_ok, info = run_window_ba(st, K, WindowConfig())
        assert not bool(info["ba_ran"])
        np.testing.assert_array_equal(np.asarray(new_poses), np.asarray(st.poses))


@pytest.mark.slow
class TestBAPipeline:
    def test_tracking_ba_vo_runs_and_improves_or_holds(self):
        from vo_tpu.data.synthetic import SyntheticSequence
        from vo_tpu.frontend.orb import OrbConfig
        from vo_tpu.models.vo import VOConfig
        from vo_tpu.models.vo_ba import TrackingBAVO, run_vo_ba
        from vo_tpu.utils.metrics import compute_ate

        seq = SyntheticSequence.generate(n_frames=24, shape=(240, 320))
        cfg = VOConfig(orb=OrbConfig(nfeatures=500, n_levels=4))
        vo = TrackingBAVO(seq.K, cfg, WindowConfig(window_size=4, ba_every=8))
        est, gt, scales, stats = run_vo_ba(seq, vo)
        assert est.shape == gt.shape
        ate, _ = compute_ate(gt, est)
        path_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
        assert np.isfinite(ate)
        assert ate < 0.25 * path_len, (ate, path_len)
        assert any(s.get("ba_ran") for s in stats[1:])


def test_analytic_jacobians_match_autodiff():
    """The hand-derived (R, dR) chain-rule Jacobians must equal jacfwd of
    the scalar residual."""
    import jax

    from vo_tpu.ba.schur import _res_and_jac, _residual

    rng = np.random.default_rng(11)
    W, L = 3, 7
    poses = jnp.asarray(rng.normal(0, 0.3, (W, 6)), jnp.float32)
    points = jnp.asarray(
        np.stack([rng.uniform(-5, 5, L), rng.uniform(-5, 5, L),
                  rng.uniform(5, 20, L)], 1), jnp.float32)
    obs = jnp.asarray(rng.uniform(0, 300, (W, L, 2)), jnp.float32)
    K = jnp.asarray([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]],
                    jnp.float32)

    r, Jc, Jp = _res_and_jac(poses, points, obs, K)

    def rj(pose6, X, ob):
        return (
            _residual(pose6, X, ob, K),
            jax.jacfwd(_residual, 0)(pose6, X, ob, K),
            jax.jacfwd(_residual, 1)(pose6, X, ob, K),
        )

    ref = jax.vmap(jax.vmap(rj, (None, 0, 0)), (0, None, 0))(
        poses, points, obs
    )
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(ref[1]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Jp), np.asarray(ref[2]),
                               rtol=1e-3, atol=1e-3)
