"""Differential tests against OpenCV — the reference's actual frontends.

The reference pipelines call cv::SIFT / cv::ORB / cv::FlannBasedMatcher /
cv::calcOpticalFlowPyrLK (src/feature_matching.cpp:27-35,
src/feature_tracking.cpp:174-180); cv2 on this machine is therefore the
closest available ground truth for frontend parity. These tests quantify
agreement on the two KITTI frames shipped with the reference
(000000.png / 000001.png) with bounds set just under measured values, so
regressions in detection/tracking parity fail loudly.

Notes on expected disagreement:
- our ORB implements the REFERENCE's custom ORB (orb.cpp semantics with
  its bugs fixed), not cv2's (different budget rounding, FAST impl) —
  mutual position recall ~0.85 @3px is the measured agreement level;
- SIFT emits secondary orientation peaks and iterates refinement like
  cv2; measured agreement: ours->cv2 position recall 0.995 @2px, cv2
  unique-position coverage 0.93.
"""

from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

FRAME1 = "/root/reference/000000.png"
FRAME2 = "/root/reference/000001.png"


@pytest.fixture(scope="module")
def frames():
    import os

    if not (os.path.exists(FRAME1) and os.path.exists(FRAME2)):
        pytest.skip("reference KITTI frames not available")
    img1 = cv2.imread(FRAME1, cv2.IMREAD_GRAYSCALE)
    img2 = cv2.imread(FRAME2, cv2.IMREAD_GRAYSCALE)
    return img1, img2


def _recall(a: np.ndarray, b: np.ndarray, tol: float) -> float:
    """Fraction of rows of `a` with a row of `b` within `tol` px."""
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=2)
    return float((d.min(axis=1) < tol).mean())


def test_orb_keypoint_recall_vs_cv2(frames):
    from vo_tpu.frontend.orb import OrbConfig, orb_detect_and_compute

    img1, _ = frames
    o = orb_detect_and_compute(jnp.asarray(img1, jnp.float32),
                               OrbConfig(nfeatures=3000))
    ours = np.stack([np.asarray(o.xs), np.asarray(o.ys)], 1)[
        np.asarray(o.valid)
    ]
    cv_pts = np.array(
        [k.pt for k in cv2.ORB_create(nfeatures=3000).detect(img1, None)]
    )
    assert len(ours) > 2500 and len(cv_pts) > 2500
    # measured 2026-08: cv2->ours 0.845 / ours->cv2 0.860 @3px
    assert _recall(cv_pts, ours, 3.0) > 0.78
    assert _recall(ours, cv_pts, 3.0) > 0.78


def test_sift_keypoint_recall_vs_cv2(frames):
    from vo_tpu.frontend.sift import SiftConfig, sift_detect_and_compute

    img1, _ = frames
    s = sift_detect_and_compute(jnp.asarray(img1, jnp.float32), SiftConfig())
    ours = np.stack([np.asarray(s.xs), np.asarray(s.ys)], 1)[
        np.asarray(s.valid)
    ]
    kps = cv2.SIFT_create().detect(img1, None)
    cv_pts = np.array([k.pt for k in kps])
    # ours must be a (near-)subset of cv2's detections...
    assert _recall(ours, cv_pts, 2.0) > 0.97  # measured 0.995
    # ...and must cover nearly all of cv2's (measured 0.93 after the
    # iterated refinement + measured octave budget redistribution)
    assert _recall(np.unique(cv_pts.round(1), axis=0), ours, 2.0) > 0.88
    assert len(ours) > 2500


def test_lk_track_endpoints_vs_cv2(frames):
    from vo_tpu.frontend.orb import OrbConfig, orb_detect_and_compute
    from vo_tpu.ops.lk import LKConfig, track

    img1, img2 = frames
    o = orb_detect_and_compute(jnp.asarray(img1, jnp.float32),
                               OrbConfig(nfeatures=3000))
    pts0 = np.stack([np.asarray(o.xs), np.asarray(o.ys)], 1)[
        np.asarray(o.valid)
    ][:500].astype(np.float32)
    p_cv, st, _ = cv2.calcOpticalFlowPyrLK(
        img1, img2, pts0.reshape(-1, 1, 2), None,
        winSize=(21, 21), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    p_cv = p_cv.reshape(-1, 2)
    st = st.reshape(-1).astype(bool)
    ours_p, ours_st = track(
        jnp.asarray(img1, jnp.float32), jnp.asarray(img2, jnp.float32),
        jnp.asarray(pts0), jnp.ones(len(pts0), bool), LKConfig()
    )
    ours_p, ours_st = np.asarray(ours_p), np.asarray(ours_st)
    both = st & ours_st
    # we may kill more divergent tracks than cv2 (window-margin bound),
    # but must keep the vast majority (measured 425 vs 492)
    assert ours_st.sum() > 0.75 * st.sum()
    d = np.linalg.norm(p_cv - ours_p, axis=1)[both]
    # measured: median 0.014 px, 91% < 1 px
    assert np.median(d) < 0.1
    assert (d < 1.0).mean() > 0.85


def test_orb_match_pair_overlap_vs_cv2(frames):
    """Matched-pair overlap: the associations feeding pose estimation
    should substantially agree with cv2's ORB+BF-Hamming knn2 pipeline
    (the reference's FLANN-LSH is an approximation of the same metric)."""
    from vo_tpu.frontend.orb import OrbConfig, orb_detect_and_compute
    from vo_tpu.ops.hamming import match_descriptors

    img1, img2 = frames
    cfg = OrbConfig(nfeatures=3000)
    o1 = orb_detect_and_compute(jnp.asarray(img1, jnp.float32), cfg)
    o2 = orb_detect_and_compute(jnp.asarray(img2, jnp.float32), cfg)
    m = match_descriptors(o1.bits, o2.bits, o1.valid, o2.valid, ratio=0.8)
    sel = np.asarray(m.valid)
    ours1 = np.stack([np.asarray(o1.xs), np.asarray(o1.ys)], 1)[sel]
    ours2 = np.stack([np.asarray(o2.xs), np.asarray(o2.ys)], 1)[
        np.asarray(m.idx)[sel]
    ]

    orb = cv2.ORB_create(nfeatures=3000)
    k1, d1 = orb.detectAndCompute(img1, None)
    k2, d2 = orb.detectAndCompute(img2, None)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    good = [
        mm[0]
        for mm in bf.knnMatch(d1, d2, k=2)
        if len(mm) == 2 and mm[0].distance < 0.8 * mm[1].distance
    ]
    cva = np.array([k1[g.queryIdx].pt for g in good])
    cvb = np.array([k2[g.trainIdx].pt for g in good])

    assert len(ours1) > 500 and len(cva) > 500
    # a cv2 pair is covered if we match (near) the same two endpoints
    d_a = np.linalg.norm(cva[:, None] - ours1[None], axis=2)
    d_b = np.linalg.norm(cvb[:, None] - ours2[None], axis=2)
    covered = ((d_a < 3.0) & (d_b < 3.0)).any(axis=1)
    frac = float(covered.mean())
    assert frac > 0.45, f"pair overlap {frac:.3f}"
