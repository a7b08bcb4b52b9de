"""Hamming/L2 matching + pyramidal LK tracking tests."""

import numpy as np
import pytest

from vo_tpu.ops.hamming import (
    hamming_table,
    knn2_ratio_match,
    l2_table,
    match_descriptors,
)
from vo_tpu.ops.lk import LKConfig, track


def test_hamming_table_exact(rng):
    b1 = rng.integers(0, 2, size=(37, 256)).astype(np.uint8)
    b2 = rng.integers(0, 2, size=(53, 256)).astype(np.uint8)
    table = np.asarray(hamming_table(b1, b2))
    ref = (b1[:, None, :] != b2[None, :, :]).sum(-1)
    np.testing.assert_array_equal(table, ref)


def test_knn2_ratio_match(rng):
    # Train set: two near-duplicates of query 0 -> fails ratio test;
    # a unique match for query 1 -> passes.
    q = rng.integers(0, 2, size=(2, 256)).astype(np.uint8)
    t = np.zeros((3, 256), np.uint8)
    t[0] = q[0]
    t[0, :4] ^= 1  # distance 4 from q0
    t[1] = q[0]
    t[1, 4:8] ^= 1  # also distance 4 -> tie, fails 0.8 ratio
    t[2] = q[1]  # exact match for q1; other rows random-far
    m = match_descriptors(q, t, np.ones(2, bool), np.ones(3, bool), ratio=0.8)
    valid = np.asarray(m.valid)
    idx = np.asarray(m.idx)
    assert not valid[0]  # ambiguous
    assert valid[1] and idx[1] == 2


def test_match_respects_masks(rng):
    q = rng.integers(0, 2, size=(4, 256)).astype(np.uint8)
    t = np.vstack([q, rng.integers(0, 2, size=(4, 256))]).astype(np.uint8)
    valid2 = np.ones(8, bool)
    valid2[:4] = False  # exact matches are masked out
    m = match_descriptors(q, t, np.ones(4, bool), valid2, ratio=1.1)
    assert (np.asarray(m.idx) >= 4).all()
    m2 = match_descriptors(q, t, np.zeros(4, bool), valid2)
    assert not np.asarray(m2.valid).any()


def test_l2_table(rng):
    a = rng.normal(size=(5, 8)).astype(np.float32)
    b = rng.normal(size=(7, 8)).astype(np.float32)
    table = np.asarray(l2_table(a, b))
    ref = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(table, ref, atol=1e-4)


def test_l2_ratio_is_euclidean(rng):
    # l2_table is SQUARED distances; squared=True must gate on the
    # Euclidean ratio (OpenCV FlannBasedMatcher semantics): best/second
    # Euclidean = 0.85 > 0.8 should FAIL even though 0.85^2 = 0.7225 < 0.8.
    q = np.zeros((1, 4), np.float32)
    t = np.zeros((2, 4), np.float32)
    t[0, 0] = 0.85  # best Euclidean dist 0.85
    t[1, 0] = 1.0  # second best 1.0
    table = l2_table(q, t)
    ones = np.ones(1, bool), np.ones(2, bool)
    m_sq = knn2_ratio_match(table, ones[0], ones[1], ratio=0.8, squared=True)
    assert not bool(np.asarray(m_sq.valid)[0])
    # ...and a true-ratio 0.75 pair should still pass.
    t[0, 0] = 0.75
    m_ok = knn2_ratio_match(l2_table(q, t), ones[0], ones[1], 0.8, squared=True)
    assert bool(np.asarray(m_ok.valid)[0])


def _textured_image(shape, rng, smooth=3):
    import cv2

    img = rng.normal(scale=60.0, size=shape) + 128.0
    img = cv2.GaussianBlur(img, (0, 0), smooth)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return img.astype(np.float32)


def test_lk_tracks_pure_translation(rng):
    img1 = _textured_image((96, 128), rng)
    shift = (3.0, 2.0)  # (dx, dy) integer-ish translation
    img2 = np.roll(np.roll(img1, int(shift[1]), axis=0), int(shift[0]), axis=1)
    pts = np.array(
        [[40.0, 40.0], [60.0, 30.0], [80.0, 60.0], [30.0, 70.0]], np.float32
    )
    new_pts, status = track(img1, img2, pts, np.ones(len(pts), bool))
    new_pts, status = np.asarray(new_pts), np.asarray(status)
    assert status.all()
    np.testing.assert_allclose(new_pts, pts + np.array(shift), atol=0.25)


def test_lk_subpixel_translation(rng):
    import cv2

    img1 = _textured_image((96, 128), rng)
    M = np.float32([[1, 0, 1.3], [0, 1, -0.7]])
    img2 = cv2.warpAffine(img1, M, (128, 96))
    pts = np.array([[50.0, 50.0], [70.0, 40.0], [90.0, 55.0]], np.float32)
    new_pts, status = track(img1, img2, pts, np.ones(len(pts), bool))
    new_pts, status = np.asarray(new_pts), np.asarray(status)
    assert status.all()
    np.testing.assert_allclose(new_pts, pts + np.array([1.3, -0.7]), atol=0.25)


def test_lk_matches_opencv(rng):
    import cv2

    img1 = _textured_image((120, 160), rng)
    M = np.float32([[1, 0, 4.2], [0, 1, 3.1]])
    img2 = cv2.warpAffine(img1, M, (160, 120))
    pts = np.stack(
        [rng.uniform(25, 135, 20), rng.uniform(25, 95, 20)], axis=1
    ).astype(np.float32)
    cv_new, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img1.astype(np.uint8),
        img2.astype(np.uint8),
        pts.reshape(-1, 1, 2),
        None,
        winSize=(21, 21),
        maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    ours, st = track(img1, img2, pts, np.ones(len(pts), bool))
    ours, st = np.asarray(ours), np.asarray(st)
    both = st & (cv_st.reshape(-1) == 1)
    assert both.sum() >= 15
    err = np.linalg.norm(ours[both] - cv_new.reshape(-1, 2)[both], axis=1)
    assert np.median(err) < 0.5


def test_lk_rejects_flat_regions():
    img = np.full((64, 64), 100.0, np.float32)
    pts = np.array([[32.0, 32.0]], np.float32)
    _, status = track(img, img, pts, np.ones(1, bool))
    assert not np.asarray(status)[0]  # no gradient -> untrackable


def test_lk_invalid_stays_invalid(rng):
    img = _textured_image((64, 64), rng)
    pts = np.array([[32.0, 32.0]], np.float32)
    _, status = track(img, img, pts, np.zeros(1, bool))
    assert not np.asarray(status)[0]
