"""Presets / CLI / 3-frame model tests."""

import json
import os

import numpy as np
import pytest

from vo_tpu.frontend.orb import OrbConfig
from vo_tpu.models.vo import VOConfig
from vo_tpu.runtime.presets import PRESETS, Preset, get_preset


REFERENCE_CONFIGS = [
    # every row of the BASELINE.md table must have a preset
    "matching_sift",
    "matching_orb",
    "tracking_sift",
    "tracking_orb",
    "matching_orb_3d_correspond",
    "matching_orb_3d_no_correspond",
    "tracking_sift_ba",
]


def small_cfg(**kw):
    return VOConfig(
        orb=OrbConfig(nfeatures=400, n_levels=3), ransac_iters=128, **kw
    )


class TestPresets:
    def test_all_reference_configs_present(self):
        for name in REFERENCE_CONFIGS:
            p = get_preset(name)
            assert p.name == name and p.description

    def test_unknown_preset_raises(self):
        with pytest.raises(KeyError):
            get_preset("nope")

    def test_detector_assignment(self):
        assert get_preset("matching_sift").config.detector == "sift"
        assert get_preset("tracking_orb").config.detector == "orb"
        assert get_preset("tracking_sift_ba").window is not None
        assert (
            get_preset("matching_orb").config.scale_mode == "unmatched"
        )
        assert (
            get_preset("matching_orb_3d_correspond").config.scale_mode
            == "matched"
        )


@pytest.mark.slow
class TestThreeFrameVO:
    def test_runs_on_synthetic(self):
        from vo_tpu.data.synthetic import SyntheticSequence
        from vo_tpu.models.vo import run_vo
        from vo_tpu.models.vo_3frame import ThreeFrameVO
        from vo_tpu.utils.metrics import compute_ate

        seq = SyntheticSequence.generate(n_frames=16, shape=(240, 320))
        vo = ThreeFrameVO(seq.K, small_cfg())
        est, gt, scales, stats = run_vo(seq, vo)
        ate, _ = compute_ate(gt, est)
        path_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
        assert np.isfinite(ate)
        assert ate < 0.5 * path_len, (ate, path_len)
        # triplets exist from frame 2 onward
        assert all(s["n_assoc"] > 50 for s in stats[2:])


@pytest.mark.slow
class TestCLI:
    def test_synthetic_run_writes_bundle(self, tmp_path, monkeypatch):
        from vo_tpu.models.vo import TrackingVO
        from vo_tpu.runtime import cli

        small = Preset(
            "tracking_orb", "small test variant", TrackingVO, small_cfg()
        )
        monkeypatch.setitem(PRESETS, "tracking_orb", small)
        report = cli.main(
            [
                "--preset", "tracking_orb",
                "--synthetic", "8",
                "--out", str(tmp_path),
            ]
        )
        assert report["n_frames"] == 8
        assert np.isfinite(report["ate_rmse"])
        out = tmp_path / "tracking_orb"
        for f in [
            "gt_path.txt", "est_path.txt", "scale.txt",
            "metrics.json", "metrics.png", "path_visualization.png",
        ]:
            assert (out / f).exists(), f
        est = np.loadtxt(out / "est_path.txt")
        assert est.shape == (8, 2)
        rep2 = json.loads((out / "metrics.json").read_text())
        assert rep2["preset"] == "tracking_orb"
