"""cv2 re-implementation of the reference VO pipelines — accuracy anchor.

KITTI seq 05 is not available on this machine, so trajectory parity is
demonstrated on a shared synthetic sequence instead (VERDICT item 4
fallback): this module re-creates the REFERENCE pipelines with the exact
OpenCV calls the C++ drivers make, so running it on the same frames as
the TPU pipelines gives an apples-to-apples ATE anchor.

Semantics mirrored (by behavior, from SURVEY.md §3 call stacks — not a
code translation):
- tracking_*: detect on frame 0, cv2.calcOpticalFlowPyrLK (21x21, 3
  levels, 30 iters / 0.01) frame-to-frame, re-detect + knn2(0.8) match
  when survivors < 150 (feature_tracking.cpp:69-71, :174-180)
- matching_*: detect+describe every frame, knn2(0.8) ratio match
  (feature_matching.cpp:155-183)
- pose: cv2.findEssentialMat(RANSAC, prob 0.999, thr 1.0) +
  cv2.recoverPose (feature_tracking.cpp:222-242)
- scale: cv2.triangulatePoints under [K|0] / K[R|t], median ratio of
  consecutive-cloud pairwise distances, clip [0.1, 5], 1e-6 guard
  (feature_tracking.cpp:244-310); "unmatched" mode truncates clouds to
  common length like feature_matching.cpp:251-254
- chain: T = [R|s*t], cur = prev @ inv(T) (feature_tracking.cpp:85-93)
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _detector(kind: str):
    if kind == "orb":
        return cv2.ORB_create(nfeatures=3000)
    return cv2.SIFT_create()


def _matcher(kind: str):
    if kind == "orb":
        return cv2.BFMatcher(cv2.NORM_HAMMING)
    return cv2.BFMatcher(cv2.NORM_L2)


def _knn2_ratio(matcher, d1, d2, ratio=0.8):
    out = []
    for m in matcher.knnMatch(d1, d2, k=2):
        if len(m) == 2 and m[0].distance < ratio * m[1].distance:
            out.append(m[0])
    return out


def _pose(pts1, pts2, K):
    E, mask = cv2.findEssentialMat(
        pts1, pts2, K, cv2.RANSAC, 0.999, 1.0
    )
    if E is None or E.shape != (3, 3):
        return None
    n, R, t, mask = cv2.recoverPose(E, pts1, pts2, K, mask=mask)
    return R, t.reshape(3), int(n)


def _triangulate(R, t, pts1, pts2, K):
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t.reshape(3, 1)])
    X = cv2.triangulatePoints(P1, P2, pts1.T, pts2.T)
    return (X[:3] / np.where(np.abs(X[3]) > 1e-12, X[3], 1e-12)).T


def _median_ratio_scale(prev3d, cur3d):
    n = min(len(prev3d), len(cur3d))
    if n < 2:
        return 1.0
    p, c = prev3d[:n], cur3d[:n]
    num = np.linalg.norm(p[:-1] - p[1:], axis=1)
    den = np.linalg.norm(c[:-1] - c[1:], axis=1) + 1e-6
    r = num / den
    if len(r) == 0:
        return 1.0
    return float(np.clip(np.median(r), 0.1, 5.0))


def run_cv2_three_frame(seq, feature: str = "orb", verbose: bool = False):
    """cv2 re-creation of the reference's 3-frame Python driver
    (feature_tracking_scale.py, SURVEY.md §3.5): knn2(0.8) match frames
    (1,2) and (2,3), intersect on the frame-2 indices, pose from the
    RANSAC-inlier (pts2, pts3), triangulate both pairs, transform the
    (1,2) cloud into frame 2 by (R12, t12), matched-pair scale median."""
    det = _detector(feature)
    bf = _matcher(feature)
    K = np.asarray(seq.K, np.float64)

    def to8(img):
        return np.clip(np.asarray(img), 0, 255).astype(np.uint8)

    feats = [det.detectAndCompute(to8(seq.frame(i)), None) for i in (0, 1)]
    cur = np.eye(4)
    est = [np.zeros(2), np.zeros(2)]
    gt = [seq.poses[0][[0, 2], 3], seq.poses[1][[0, 2], 3]]
    scales = [(1.0, 1.0), (1.0, 1.0)]

    for i in range(2, len(seq)):
        feats.append(det.detectAndCompute(to8(seq.frame(i)), None))
        (k1, d1), (k2, d2), (k3, d3) = feats[-3:]
        s = 1.0
        ok = False
        m12 = _knn2_ratio(bf, d1, d2)
        m23 = _knn2_ratio(bf, d2, d3)
        map12 = {g.trainIdx: g.queryIdx for g in m12}
        trip = [
            (map12[g.queryIdx], g.queryIdx, g.trainIdx)
            for g in m23 if g.queryIdx in map12
        ]
        if len(trip) >= 8:
            p1 = np.array([k1[a].pt for a, _, _ in trip], np.float32)
            p2 = np.array([k2[b].pt for _, b, _ in trip], np.float32)
            p3 = np.array([k3[c].pt for _, _, c in trip], np.float32)
            r12 = _pose(p1, p2, K)
            E, mask = cv2.findEssentialMat(p2, p3, K, cv2.RANSAC, 0.999, 1.0)
            if r12 is not None and E is not None and E.shape == (3, 3):
                _, R23, t23, mask = cv2.recoverPose(E, p2, p3, K, mask=mask)
                inl = mask.reshape(-1).astype(bool)
                R12, t12, _ = r12
                X12 = _triangulate(R12, t12, p1, p2, K)
                X12_in2 = X12 @ R12.T + t12  # cloud into frame 2
                X23 = _triangulate(R23, t23.reshape(3), p2, p3, K)
                sel = inl if inl.sum() >= 2 else np.ones(len(p2), bool)
                s = _median_ratio_scale(X12_in2[sel], X23[sel])
                T = np.eye(4)
                T[:3, :3] = R23
                T[:3, 3] = s * t23.reshape(3)
                cur = cur @ np.linalg.inv(T)
                ok = True
        est.append(cur[[0, 2], 3].copy())
        gt.append(seq.poses[i][[0, 2], 3])
        gt_s = float(
            np.linalg.norm(seq.poses[i][:3, 3] - seq.poses[i - 1][:3, 3])
        )
        scales.append((max(gt_s, 1e-9), s if ok else 1.0))
        feats.pop(0)
        if verbose and i % 100 == 0:
            print(f"cv2 3frame_{feature}: frame {i}, triplets {len(trip)}")

    return np.asarray(est), np.asarray(gt), np.asarray(scales)


def run_cv2_vo(seq, mode: str = "tracking", feature: str = "orb",
               min_tracked: int = 150, verbose: bool = False):
    """Run the cv2 reference pipeline over a sequence object.

    Returns (est_path (N, 2) x/z, gt_path (N, 2), scales (N, 2))."""
    det = _detector(feature)
    bf = _matcher(feature)
    K = np.asarray(seq.K, np.float64)

    def to8(img):
        return np.clip(np.asarray(img), 0, 255).astype(np.uint8)

    cur = np.eye(4)
    est = [np.zeros(2)]
    gt = [seq.poses[0][[0, 2], 3]]
    scales = [(1.0, 1.0)]
    prev3d = None

    img1 = to8(seq.frame(0))
    if mode == "tracking":
        kps = det.detect(img1, None)
        pts1 = np.array([k.pt for k in kps], np.float32)
    else:
        k1, d1 = det.detectAndCompute(img1, None)

    lk_params = dict(
        winSize=(21, 21), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )

    for i in range(1, len(seq)):
        img2 = to8(seq.frame(i))
        ok_pair = True
        if mode == "tracking":
            if len(pts1) > 0:
                p2, st, _ = cv2.calcOpticalFlowPyrLK(
                    img1, img2, pts1.reshape(-1, 1, 2), None, **lk_params
                )
                st = st.reshape(-1).astype(bool)
                a, b = pts1[st], p2.reshape(-1, 2)[st]
            else:
                a = b = np.zeros((0, 2), np.float32)
            if len(b) < min_tracked:  # re-detect (feature_tracking.cpp:69)
                ka, da = det.detectAndCompute(img1, None)
                kb, db = det.detectAndCompute(img2, None)
                good = _knn2_ratio(bf, da, db)
                a = np.array([ka[g.queryIdx].pt for g in good], np.float32)
                b = np.array([kb[g.trainIdx].pt for g in good], np.float32)
        else:
            k2, d2 = det.detectAndCompute(img2, None)
            good = _knn2_ratio(bf, d1, d2)
            a = np.array([k1[g.queryIdx].pt for g in good], np.float32)
            b = np.array([k2[g.trainIdx].pt for g in good], np.float32)

        s = 1.0
        if len(a) >= 8:
            res = _pose(a, b, K)
            if res is not None:
                R, t, _ = res
                cur3d = _triangulate(R, t, a, b, K)
                if prev3d is not None:
                    s = _median_ratio_scale(prev3d, cur3d)
                prev3d = cur3d
                T = np.eye(4)
                T[:3, :3] = R
                T[:3, 3] = s * t
                cur = cur @ np.linalg.inv(T)
            else:
                ok_pair = False
        else:
            ok_pair = False

        est.append(cur[[0, 2], 3].copy())
        gt.append(seq.poses[i][[0, 2], 3])
        gt_s = float(
            np.linalg.norm(seq.poses[i][:3, 3] - seq.poses[i - 1][:3, 3])
        )
        scales.append((max(gt_s, 1e-9), s if ok_pair else 1.0))

        img1 = img2
        if mode == "tracking":
            pts1 = b if ok_pair or len(b) else np.zeros((0, 2), np.float32)
        else:
            k1, d1 = k2, d2
        if verbose and i % 100 == 0:
            print(f"cv2 {mode}_{feature}: frame {i}, assoc {len(b)}")

    return np.asarray(est), np.asarray(gt), np.asarray(scales)
