"""Metrics harness regression: reproduce the baseline table (SURVEY.md §6)
from the reference's shipped golden path dumps."""

import os

import numpy as np
import pytest

from vo_tpu.utils.io import load_path, load_scales, save_results
from vo_tpu.utils.metrics import (
    compute_ate,
    compute_rpe,
    compute_scale_drift,
    evaluate_paths,
    kitti_drift,
)

# config -> (ATE RMSE m, RPE RMSE m, drift@100m %) from SURVEY.md §6 / BASELINE.md
GOLDEN = {
    "matching_sift": (79.25, 0.384, 31.1),
    "matching_orb": (114.61, 0.886, 45.4),
    "tracking_sift": (99.49, 0.681, 38.2),
    "tracking_orb": (93.13, 1.177, 48.7),
    "matching_orb_3d_correspond": (119.08, 0.984, 48.0),
    "matching_orb_3d_no_correspond": (114.37, 0.885, 45.3),
    "tracking_sift_ba": (34.69, 1.173, 25.4),
}


@pytest.mark.parametrize("config", sorted(GOLDEN))
def test_golden_metrics(reference_results_dir, config):
    folder = os.path.join(reference_results_dir, config)
    gt = load_path(os.path.join(folder, "gt_path.txt"))
    est = load_path(os.path.join(folder, "est_path.txt"))
    ate, _ = compute_ate(gt, est)
    rpe, _ = compute_rpe(gt, est)
    drift = kitti_drift(gt, est, (100,))[100]
    exp_ate, exp_rpe, exp_drift = GOLDEN[config]
    assert ate == pytest.approx(exp_ate, abs=0.01)
    assert rpe == pytest.approx(exp_rpe, abs=0.001)
    assert drift == pytest.approx(exp_drift, abs=0.1)


def test_scale_drift(reference_results_dir):
    scales = load_scales(
        os.path.join(reference_results_dir, "tracking_orb", "scale.txt")
    )
    mean_ratio, ratios = compute_scale_drift(scales)
    assert ratios.shape[0] == scales.shape[0]
    assert 0.1 < mean_ratio < 5.0


def test_perfect_trajectory_is_zero_error():
    t = np.linspace(0, 10, 50)
    path = np.stack([np.sin(t), t], axis=1)
    assert compute_ate(path, path)[0] == 0.0
    assert compute_rpe(path, path)[0] == 0.0
    assert kitti_drift(path, path, (5,))[5] == 0.0


def test_evaluate_paths_bundle():
    t = np.linspace(0, 200, 400)
    gt = np.stack([np.zeros_like(t), t], axis=1)
    est = gt + 0.5
    out = evaluate_paths(gt, est, scale=np.ones((400, 2)))
    assert out["ate_rmse"] == pytest.approx(np.sqrt(0.5), abs=1e-9)
    assert out["rpe_rmse"] == pytest.approx(0.0, abs=1e-12)
    assert out["scale_drift"] == pytest.approx(1.0)


def test_save_load_roundtrip(tmp_path):
    gt = np.random.default_rng(0).normal(size=(20, 2))
    est = gt + 0.1
    save_results(str(tmp_path / "run"), gt, est, scales=np.ones((20, 2)))
    assert np.allclose(load_path(str(tmp_path / "run" / "gt_path.txt")), gt)
    assert np.allclose(load_path(str(tmp_path / "run" / "est_path.txt")), est)
