"""End-to-end VO pipeline tests on synthetic sequences with exact GT."""

import numpy as np
import pytest

from vo_tpu.data.synthetic import SyntheticSequence
from vo_tpu.frontend.orb import OrbConfig
from vo_tpu.models.vo import MatchingVO, TrackingVO, VOConfig, run_vo
from vo_tpu.utils.metrics import compute_ate, compute_rpe


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence.generate(
        n_frames=15, shape=(240, 320), n_points=1200, speed=1.0, seed=0
    )


@pytest.fixture(scope="module")
def cfg():
    return VOConfig(orb=OrbConfig(nfeatures=600, n_levels=4), ransac_iters=256)


def test_tracking_vo_end_to_end(seq, cfg):
    vo = TrackingVO(seq.K, cfg)
    est, gt, scales, stats = run_vo(seq, vo)
    assert est.shape == gt.shape == (15, 2)
    path_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    ate, _ = compute_ate(gt, est)
    rpe, _ = compute_rpe(gt, est)
    # ~14 m path; keep a healthy margin over observed ~0.5/0.25
    assert ate < 0.1 * path_len
    assert rpe < 0.6
    # association stays healthy, no fallback triggered on this easy sequence
    assert all(s["n_assoc"] > 300 for s in stats[1:])
    assert not any(s["fallback"] for s in stats[1:])
    # scales stay off the clip rails
    assert all(0.11 < s["scale"] < 4.9 for s in stats[2:])


def test_matching_vo_end_to_end(cfg):
    # matching + truncation-paired scale is the reference's noisiest
    # config: single-seed ATE on this 15-frame sequence spans
    # 0.18-0.73x path length under float-level solver perturbations
    # (measured across 6 seeds for two numerically equivalent 5-point
    # backends), so the bound is on the MEDIAN over 3 seeds.
    mcfg = cfg._replace(scale_mode="unmatched")
    ratios = []
    for seed in range(3):
        s = SyntheticSequence.generate(
            n_frames=15, shape=(240, 320), n_points=1200, speed=1.0,
            seed=seed,
        )
        vo = MatchingVO(s.K, mcfg)
        est, gt, _, stats = run_vo(s, vo)
        path_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
        ate, _ = compute_ate(gt, est)
        ratios.append(ate / path_len)
        assert all(st["n_assoc"] > 150 for st in stats[1:])
    assert np.median(ratios) < 0.5


def test_tracking_vo_is_deterministic(seq, cfg):
    vo = TrackingVO(seq.K, cfg)
    sub = SyntheticSequence.generate(
        n_frames=4, shape=(240, 320), n_points=1200, speed=1.0, seed=0
    )
    est1, _, _, _ = run_vo(sub, vo)
    est2, _, _, _ = run_vo(sub, vo)
    np.testing.assert_array_equal(est1, est2)
