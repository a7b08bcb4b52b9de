"""SIFT frontend tests: scale-space structure, detection on known blobs,
descriptor invariances, and the two-real-frame geometry check (the same
health bar as the ORB path; reference parity = the matching_sift /
tracking_sift configs, feature_matching.cpp:27)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.frontend.sift import (
    SiftConfig,
    octave_budgets,
    sift_detect_and_compute,
)
from vo_tpu.ops.scalespace import build_scale_space, n_octaves_for


def gaussian_blob_image(h=128, w=128, centers=((64, 64),), sigma=4.0, amp=120.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.full((h, w), 30.0)
    for cy, cx in centers:
        img += amp * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2)))
    return img.astype(np.float32)


class TestScaleSpace:
    def test_structure(self):
        img = jnp.asarray(gaussian_blob_image())
        gauss, dogs = build_scale_space(img, n_layers=3, upsample=False)
        assert len(gauss) == n_octaves_for((128, 128), False)
        assert gauss[0].shape == (6, 128, 128)
        assert dogs[0].shape == (5, 128, 128)
        assert gauss[1].shape == (6, 64, 64)
        # DoG really is the difference of adjacent Gaussians
        np.testing.assert_allclose(
            np.asarray(dogs[0][2]),
            np.asarray(gauss[0][3] - gauss[0][2]),
            atol=1e-5,
        )

    def test_upsample_doubles(self):
        img = jnp.asarray(gaussian_blob_image(64, 96))
        gauss, _ = build_scale_space(img, upsample=True)
        assert gauss[0].shape[-2:] == (128, 192)


class TestSiftDetect:
    def test_blob_detected_at_center_and_scale(self):
        # A blob of sigma s is a DoG extremum near scale ~s; location must
        # be recovered to subpixel accuracy.
        img = gaussian_blob_image(96, 96, centers=((48, 48),), sigma=3.0)
        cfg = SiftConfig(nfeatures=32, upsample=False, max_image_octaves=3)
        f = sift_detect_and_compute(jnp.asarray(img), cfg)
        v = np.asarray(f.valid)
        assert v.sum() >= 1
        xs, ys = np.asarray(f.xs)[v], np.asarray(f.ys)[v]
        d = np.hypot(xs - 48, ys - 48)
        assert d.min() < 1.0, (xs, ys)
        # dominant detection's size tracks the blob scale (loose bound)
        sizes = np.asarray(f.sizes)[v]
        assert 2.0 < sizes[np.argmin(d)] < 16.0

    def test_plain_image_no_detections(self):
        img = jnp.asarray(np.full((96, 96), 77.0, np.float32))
        cfg = SiftConfig(nfeatures=16, upsample=False, max_image_octaves=3)
        f = sift_detect_and_compute(img, cfg)
        assert int(f.count()) == 0

    def test_budgets_static(self):
        cfg = SiftConfig(nfeatures=1000)
        b = octave_budgets(cfg, 5)
        assert len(b) == 5 and all(x >= 8 for x in b)
        assert b[0] > b[1] > b[2]

    def test_descriptor_norm_and_determinism(self):
        img = jnp.asarray(gaussian_blob_image(
            96, 96, centers=((30, 40), (60, 20), (70, 70)), sigma=2.5
        ))
        cfg = SiftConfig(nfeatures=32, upsample=False, max_image_octaves=3)
        f1 = sift_detect_and_compute(img, cfg)
        f2 = sift_detect_and_compute(img, cfg)
        np.testing.assert_array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
        v = np.asarray(f1.valid)
        norms = np.linalg.norm(np.asarray(f1.desc)[v], axis=1)
        np.testing.assert_allclose(norms, 512.0, rtol=1e-3)

    def test_canvas_matches_per_octave(self):
        """The canvas-packed detection path (SiftConfig.canvas — one
        extrema/refine/ori/desc pass over all octaves packed into one
        gutters-separated canvas) must agree with the per-octave path on
        keypoint locations and descriptors. Exact order may differ (the
        canvas path compacts secondary peaks globally), so compare as
        sets via nearest-neighbour pairing."""
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
        from vo_tpu.ops.conv import gaussian_blur

        img = np.asarray(gaussian_blur(jnp.asarray(img), 5, 1.2))
        cfg_kw = dict(nfeatures=48, upsample=False, max_image_octaves=3)
        fa = sift_detect_and_compute(
            jnp.asarray(img), SiftConfig(canvas=True, **cfg_kw)
        )
        fb = sift_detect_and_compute(
            jnp.asarray(img), SiftConfig(canvas=False, **cfg_kw)
        )
        va, vb = np.asarray(fa.valid), np.asarray(fb.valid)
        assert abs(int(va.sum()) - int(vb.sum())) <= 2, (va.sum(), vb.sum())
        pa = np.stack([np.asarray(fa.xs)[va], np.asarray(fa.ys)[va]], -1)
        pb = np.stack([np.asarray(fb.xs)[vb], np.asarray(fb.ys)[vb]], -1)
        da = np.asarray(fa.desc)[va]
        db = np.asarray(fb.desc)[vb]
        # every canvas keypoint has a per-octave twin at the same spot
        # with (near-)identical descriptor. Dual-orientation keypoints
        # put TWO entries at one location (ordering differs between the
        # paths), so pair by location THEN take the best descriptor
        # match among the co-located candidates.
        dist = np.linalg.norm(pa[:, None] - pb[None], axis=-1)
        frac_loc = (dist.min(axis=1) < 0.25).mean()
        assert frac_loc > 0.9, frac_loc
        dd = np.linalg.norm(da[:, None] - db[None], axis=-1)
        dd_min = np.where(dist < 0.25, dd, np.inf).min(axis=1)
        near = dist.min(axis=1) < 0.25
        # The bound is 0.75, not 1.0: on a noise image many keypoints
        # have two near-tied orientation peaks, and the two paths keep
        # different secondary-copy SETS (global vs per-octave cap), so a
        # canvas secondary copy can lack a twin. Absolute correctness of
        # the default path is covered by tests/test_cv2_parity.py.
        assert (dd_min[near] < 0.05 * 512).mean() >= 0.75, dd_min[near]

    def test_rotation_changes_angle_not_descriptor(self):
        """A corner-like pattern rotated 90 deg must match its own
        descriptor (rotation invariance via orientation assignment)."""
        rng = np.random.default_rng(0)
        patch = rng.uniform(0, 255, (40, 40)).astype(np.float32)
        # smooth it so gradients are stable
        from vo_tpu.ops.conv import gaussian_blur

        patch = np.asarray(gaussian_blur(jnp.asarray(patch), 5, 1.5))
        base = np.full((96, 96), 100.0, np.float32)
        img1 = base.copy()
        img1[28:68, 28:68] = patch
        img2 = base.copy()
        img2[28:68, 28:68] = np.rot90(patch)

        cfg = SiftConfig(nfeatures=64, upsample=False, max_image_octaves=2)
        f1 = sift_detect_and_compute(jnp.asarray(img1), cfg)
        f2 = sift_detect_and_compute(jnp.asarray(img2), cfg)
        v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
        assert v1.sum() >= 2 and v2.sum() >= 2
        d1 = np.asarray(f1.desc)[v1]
        d2 = np.asarray(f2.desc)[v2]
        # best-match L2 distance must be far below the descriptor norm
        dist = np.linalg.norm(d1[:, None] - d2[None], axis=-1)
        frac_matched = (dist.min(axis=1) < 0.35 * 512).mean()
        assert frac_matched > 0.5, frac_matched


class TestSiftRealFrames:
    def test_two_frame_geometry(self, sample_image_pair):
        from vo_tpu.geometry.epipolar import (
            normalize_pixels,
            ransac_essential,
            recover_pose,
        )
        from vo_tpu.ops.hamming import knn2_ratio_match, l2_table

        cfg = SiftConfig(nfeatures=2000, upsample=False, max_image_octaves=6)
        f1 = sift_detect_and_compute(jnp.asarray(sample_image_pair[0]), cfg)
        f2 = sift_detect_and_compute(jnp.asarray(sample_image_pair[1]), cfg)
        assert int(f1.count()) > 500
        m = knn2_ratio_match(l2_table(f1.desc, f2.desc), f1.valid, f2.valid, 0.8)
        assert int(m.count()) > 300

        K = jnp.asarray(
            [[707.0912, 0, 601.8873], [0, 707.0912, 183.1104], [0, 0, 1]],
            jnp.float32,
        )
        p1 = normalize_pixels(jnp.stack([f1.xs, f1.ys], 1), K)
        p2 = normalize_pixels(
            jnp.stack([f2.xs[m.idx], f2.ys[m.idx]], 1), K
        )
        res = ransac_essential(
            jax.random.PRNGKey(0), p1, p2, m.valid,
            threshold=1.0 / 707.0, n_iters=512,
        )
        pr = recover_pose(res.E, p1, p2, res.inliers)
        assert int(res.inliers.sum()) > 200
        t = np.asarray(pr.t)
        assert t[2] < -0.95  # forward motion dominates
        ang = np.degrees(
            np.arccos(np.clip((np.trace(np.asarray(pr.R)) - 1) / 2, -1, 1))
        )
        assert ang < 1.0
