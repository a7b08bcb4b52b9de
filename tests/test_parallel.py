"""Multi-chip parity tests on the 8-device virtual CPU mesh (SURVEY.md §4:
sharded logic must run in CI without TPUs; single-chip vs sharded must be
tolerance-bounded or exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.ba.schur import BAConfig, bundle_adjust
from vo_tpu.ops.conv import binomial_blur5
from vo_tpu.ops.fast import fast_score
from vo_tpu.ops.hamming import match_descriptors
from vo_tpu.parallel import (
    batched_orb,
    make_mesh,
    make_mesh_2d,
    pad_to_multiple,
    sharded_bundle_adjust,
    sharded_fast_score,
    sharded_gaussian_blur,
    sharded_match_descriptors,
)

from test_ba import make_ba_problem


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_mesh(8, axis="kp")


class TestShardedMatching:
    def test_matches_dense_exactly(self, mesh8, rng):
        n1, n2 = 64, 128  # divisible by 8
        b1 = rng.integers(0, 2, (n1, 256)).astype(np.uint8)
        base = rng.integers(0, 2, (n2, 256)).astype(np.uint8)
        base[:n1] = np.where(rng.random((n1, 256)) < 0.1, 1 - b1, b1)
        v1 = rng.random(n1) > 0.1
        v2 = rng.random(n2) > 0.1
        args = (jnp.asarray(b1), jnp.asarray(base),
                jnp.asarray(v1), jnp.asarray(v2))
        dense = match_descriptors(*args)
        shard = sharded_match_descriptors(mesh8, *args)
        np.testing.assert_array_equal(np.asarray(dense.idx), np.asarray(shard.idx))
        np.testing.assert_array_equal(np.asarray(dense.valid), np.asarray(shard.valid))
        np.testing.assert_allclose(np.asarray(dense.dist), np.asarray(shard.dist))
        assert int(shard.count()) > 0

    def test_l2_path(self, mesh8, rng):
        d1 = jnp.asarray(rng.normal(size=(32, 128)), jnp.float32)
        d2 = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
        v1, v2 = jnp.ones(32, bool), jnp.ones(64, bool)
        from vo_tpu.ops.hamming import knn2_ratio_match, l2_table

        ref = knn2_ratio_match(l2_table(d1, d2), v1, v2, 0.9)
        shard = sharded_match_descriptors(
            mesh8, d1, d2, v1, v2, ratio=0.9, binary=False
        )
        np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(shard.idx))

    def test_pad_to_multiple(self):
        a = jnp.ones((13, 4))
        p, n = pad_to_multiple(a, 8)
        assert p.shape == (16, 4) and n == 3
        p2, n2 = pad_to_multiple(p, 8)
        assert p2.shape == (16, 4) and n2 == 0


class TestShardedStencils:
    def test_blur_matches_dense(self, mesh8, rng):
        img = jnp.asarray(rng.uniform(0, 255, (64, 48)), jnp.float32)
        dense = binomial_blur5(img)
        shard = sharded_gaussian_blur(make_mesh(8, axis="row"))(img)
        np.testing.assert_allclose(
            np.asarray(dense), np.asarray(shard), rtol=1e-5, atol=1e-3
        )

    def test_fast_matches_dense(self, mesh8, rng):
        img = jnp.asarray(rng.uniform(0, 255, (64, 48)), jnp.float32)
        dense = fast_score(img)
        shard = sharded_fast_score(make_mesh(8, axis="row"))(img)
        np.testing.assert_allclose(
            np.asarray(dense), np.asarray(shard), rtol=1e-5, atol=1e-3
        )


class TestShardedBA:
    def test_matches_single_device(self, mesh8):
        p0, X0, obs, K, _, _ = make_ba_problem(L=64)
        W, L = obs.shape[:2]
        om = jnp.ones((W, L), bool)
        pm = jnp.ones((L,), bool)
        cfg = BAConfig(max_iters=8)
        single = bundle_adjust(p0, X0, obs, om, pm, K, cfg)
        shard = sharded_bundle_adjust(mesh8, p0, X0, obs, om, pm, K, cfg)
        # Shard-order summation changes fp32 rounding; bound the drift.
        np.testing.assert_allclose(
            np.asarray(single.poses), np.asarray(shard.poses),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            float(single.cost), float(shard.cost), rtol=2e-2
        )

    def test_masked_padding_inert_sharded(self, mesh8):
        p0, X0, obs, K, _, _ = make_ba_problem(L=56)
        W, L = obs.shape[:2]
        pad = 8
        X0p = jnp.concatenate([X0, jnp.zeros((pad, 3), jnp.float32)])
        obsp = jnp.concatenate([obs, jnp.zeros((W, pad, 2), jnp.float32)], 1)
        pm = jnp.concatenate([jnp.ones(L, bool), jnp.zeros(pad, bool)])
        res = sharded_bundle_adjust(
            mesh8, p0, X0p, obsp, jnp.ones((W, L + pad), bool), pm, K,
            BAConfig(max_iters=8),
        )
        assert np.isfinite(np.asarray(res.poses)).all()
        assert float(res.cost) < float(res.cost0)


class TestShardedWindowBA:
    """The FULL vo_ba window step (gates + holdout accept + solve) under
    the mesh must match the single-device run (VERDICT r4 item 8)."""

    def _window(self, L=64):
        from vo_tpu.ba.window import window_init, window_push
        from vo_tpu.geometry.se3 import exp_so3, inv_se3, make_se3

        p0, X0, obs, K, p_gt, X_gt = make_ba_problem(
            L=L, noise_px=0.0, pose_noise=0.0, point_noise=0.0
        )
        W = obs.shape[0]
        T_wc = make_se3(
            exp_so3(jnp.asarray(p_gt[:, :3], jnp.float32)),
            jnp.asarray(p_gt[:, 3:], jnp.float32),
        )
        T_cw_noisy = np.asarray(inv_se3(T_wc)).copy()
        T_cw_noisy[2:, :3, 3] += np.array([0.2, -0.1, 0.3])
        st = window_init(W, L)
        for i in range(W):
            st = window_push(
                st, jnp.asarray(T_cw_noisy[i], jnp.float32),
                obs[i], jnp.ones((L,), bool),
            )
        return st, K, W

    def test_window_matches_single_device(self, mesh8):
        from vo_tpu.ba.window import WindowConfig, run_window_ba
        from vo_tpu.parallel.ba import sharded_window_ba

        st, K, W = self._window()
        cfg = WindowConfig(window_size=W, min_landmarks=10)
        poses_s, ok_s, info_s = run_window_ba(st, K, cfg)
        poses_d, ok_d, info_d = sharded_window_ba(mesh8, st, K, cfg)
        assert bool(info_s["ba_ran"]) and bool(info_d["ba_ran"])
        # global-index holdout selection must match exactly
        assert int(info_s["ba_holdout_n"]) == int(info_d["ba_holdout_n"])
        assert int(info_s["ba_landmarks"]) == int(info_d["ba_landmarks"])
        np.testing.assert_allclose(
            np.asarray(poses_s), np.asarray(poses_d), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            float(info_s["ba_holdout_cost"]),
            float(info_d["ba_holdout_cost"]), rtol=2e-2, atol=1e-3,
        )

    def test_window_with_map_matches_single_device(self, mesh8):
        from vo_tpu.ba.window import WindowConfig, run_window_ba
        from vo_tpu.parallel.ba import sharded_window_ba

        st, K, W = self._window()
        L = st.obs.shape[1]
        cfg = WindowConfig(window_size=W, min_landmarks=10)
        lmap = (jnp.zeros((L, 3), jnp.float32), jnp.zeros((L,), bool))
        poses_s, ok_s, info_s, map_s = run_window_ba(st, K, cfg, lmap=lmap)
        poses_d, ok_d, info_d, map_d = sharded_window_ba(
            mesh8, st, K, cfg, lmap=lmap
        )
        np.testing.assert_allclose(
            np.asarray(poses_s), np.asarray(poses_d), rtol=2e-3, atol=2e-3
        )
        assert int(info_s["ba_reused"]) == int(info_d["ba_reused"]) == 0
        np.testing.assert_array_equal(
            np.asarray(map_s[1]), np.asarray(map_d[1])
        )


class TestBatchedFrontend:
    def test_dp_detect_matches_single(self, mesh8, rng):
        from vo_tpu.frontend.orb import OrbConfig, orb_detect_and_compute

        mesh = make_mesh(8, axis="frame")
        cfg = OrbConfig(nfeatures=64, n_levels=2, patch_size=15)
        frames = jnp.asarray(rng.uniform(0, 255, (8, 64, 96)), jnp.float32)
        batched = batched_orb(mesh, cfg)(frames)
        single = orb_detect_and_compute(frames[3], cfg)
        np.testing.assert_allclose(
            np.asarray(batched.xs[3]), np.asarray(single.xs), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(batched.valid[3]), np.asarray(single.valid)
        )

    def test_2d_mesh(self, rng):
        from vo_tpu.frontend.orb import OrbConfig

        mesh = make_mesh_2d((2, 4))
        cfg = OrbConfig(nfeatures=32, n_levels=2, patch_size=15)
        frames = jnp.asarray(rng.uniform(0, 255, (2, 64, 96)), jnp.float32)
        feats = batched_orb(mesh, cfg)(frames)
        assert feats.xs.shape[0] == 2


class TestWatchdog:
    def test_fires_on_timeout_and_not_on_fast_steps(self):
        import time as _time

        from vo_tpu.parallel.watchdog import StepWatchdog

        events = []
        wd = StepWatchdog(
            timeout_s=0.05, on_timeout=lambda tag, dt: events.append(tag)
        )
        with wd.watch("fast"):
            pass
        _time.sleep(0.1)
        assert events == []

        with wd.watch("slow"):
            _time.sleep(0.15)
        assert events == ["slow"]
        assert wd.fired == ["slow"]


class TestShardedLK:
    def test_matches_dense_tracker(self, mesh8, rng):
        """Keypoint-sharded LK == dense LK, bitwise (same per-point code).

        Pinned to layout="lanes" — the sharded wrapper normalizes the
        pallas layout to lanes (parallel/tracking.py _normalize), so the
        bitwise guarantee is lanes-vs-lanes; pallas-vs-lanes endpoint
        parity is tolerance-bounded in tests/test_lk_pallas.py."""
        from vo_tpu.ops.lk import (
            LKConfig,
            lk_make_cache,
            lk_pyramid_track_cached,
        )
        from vo_tpu.ops.pyramid import build_halving_pyramid
        from vo_tpu.parallel.tracking import (
            sharded_lk_make_cache,
            sharded_lk_track,
        )
        from vo_tpu.parallel.mesh import make_mesh

        cfg = LKConfig(win=9, max_level=1, iters=10, window_margin=4,
                       coarse_margin=6, layout="lanes")
        H, W, N = 64, 96, 32  # N divisible by 8
        img1 = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
        img2 = jnp.roll(img1, 2, axis=1) + 0.5
        pyr1 = tuple(build_halving_pyramid(img1, cfg.max_level + 1,
                                           dtype=jnp.bfloat16))
        pyr2 = tuple(build_halving_pyramid(img2, cfg.max_level + 1,
                                           dtype=jnp.bfloat16))
        pts = jnp.asarray(
            np.stack([rng.uniform(15, W - 15, N), rng.uniform(15, H - 15, N)], 1),
            jnp.float32,
        )
        valid = jnp.asarray(rng.random(N) > 0.2)

        cache_d = lk_make_cache(pyr1, pts, cfg)
        out_d, st_d, cache2_d = lk_pyramid_track_cached(
            cache_d, pyr2, pts, valid, cfg
        )

        mesh = make_mesh(8, axis="kp")
        cache_s = sharded_lk_make_cache(mesh, pyr1, pts, cfg)
        out_s, st_s, cache2_s = sharded_lk_track(
            mesh, cache_s, pyr2, pts, valid, cfg
        )
        np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))
        np.testing.assert_array_equal(np.asarray(st_d), np.asarray(st_s))
        for a, b in zip(cache2_d.wins, cache2_s.wins):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFusedShardedStep:
    """Whole-pipeline GSPMD step (parallel/vo_step.py): the FULL tracking
    step jitted over the mesh with keypoint-axis shardings, parity-bounded
    against the single-device step (SURVEY §2e / VERDICT r2 item 5)."""

    def test_fused_tracking_step_parity(self):
        from vo_tpu.data.synthetic import SyntheticSequence
        from vo_tpu.frontend.orb import OrbConfig
        from vo_tpu.models.vo import TrackingVO, VOConfig
        from vo_tpu.parallel.mesh import make_mesh
        from vo_tpu.parallel.vo_step import parity_vs_single_device

        seq = SyntheticSequence.generate(n_frames=3, shape=(240, 320))
        cfg = VOConfig(
            orb=OrbConfig(nfeatures=512, n_levels=3), ransac_iters=128
        )
        vo = TrackingVO(seq.K, cfg)
        state = vo.init(seq.frame(0))
        state, _ = vo.step(state, seq.frame(1))  # populate prev3d
        mesh = make_mesh(8, axis="kp")
        res = parity_vs_single_device(
            mesh, cfg, state,
            jnp.asarray(seq.frame(2), jnp.float32),
            jnp.asarray(seq.K, jnp.float32),
        )
        # raises on tolerance breach; also pin the structural invariant:
        # sharded LK tracking is bitwise-identical, so association counts
        # match exactly. Inlier counts may flip by a near-threshold point
        # or two: the in-graph 5-point solver (Jacobi nullspace + GJ,
        # round 4) is fused differently by XLA in the sharded vs dense
        # programs, unlike the layout-independent LAPACK custom calls it
        # replaced, so fp32 rounding at the Sampson threshold differs.
        assert res["n_assoc_delta"] == 0
        assert res["n_inlier_delta"] <= 2
