"""Three-frame correspondence VO (matching_orb_3d_correspond config).

Reference: feature_tracking_scale.py — knn-match frame pairs (t-2, t-1)
and (t-1, t), intersect on the middle frame's keypoint indices to build
(pts1, pts2, pts3) triplets (:38-74), recover the (t-1, t) pose with the
RANSAC inlier mask applied (:110-125, unlike the C++ drivers), triangulate
both pairs, transform the (1,2) cloud into frame 2 via (R_12, t_12)
(:158-159), and take the matched-pair median distance-ratio scale
(:140-151).

TPU re-design: the reference re-detects and re-matches all three frames
every step (3x detectAndCompute + 2x knn per frame). Here features and the
(t-2, t-1) match are carried in the state, so each step costs ONE detect
and ONE knn table — and slot composition (a->b->c) is two gathers instead
of Python dict intersection (:57-67)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.epipolar import normalize_pixels, ransac_essential, recover_pose
from ..geometry.scale import relative_scale_matched
from ..geometry.se3 import inv_se3, make_se3
from ..geometry.triangulate import triangulate_fast
from .vo import FrameOutput, VOConfig, _feature_capacity, detect_and_describe, match_features


class ThreeFrameState(NamedTuple):
    pts_a: jnp.ndarray  # frame t-2 keypoints (K, 2)
    pts_b: jnp.ndarray  # frame t-1
    desc_b: jnp.ndarray
    valid_b: jnp.ndarray
    m_ab_idx: jnp.ndarray  # (K,) a-slot -> b-slot
    m_ab_valid: jnp.ndarray
    R_ab: jnp.ndarray  # (3, 3) relative pose a->b (x_b = R x_a + t)
    t_ab: jnp.ndarray  # (3,) unit translation
    pose: jnp.ndarray  # (4, 4) chained cam->world
    key: jax.Array
    n_frames: jnp.ndarray  # () frames seen so far


class ThreeFrameVO:
    """feature_tracking_scale.py-equivalent pipeline."""

    def __init__(self, K: np.ndarray, config: VOConfig = VOConfig()):
        self.cfg = config._replace(scale_mode="matched")
        self.K = jnp.asarray(K, jnp.float32)
        self.capacity = _feature_capacity(config)
        self._detect_jit = jax.jit(
            functools.partial(detect_and_describe, cfg=self.cfg)
        )
        self._init_jit = jax.jit(functools.partial(_tf_init, cfg=self.cfg))
        self._core_jit = jax.jit(functools.partial(_tf_core, cfg=self.cfg))

    def init(self, img0: np.ndarray, seed: int = 0) -> ThreeFrameState:
        feats = self._detect_jit(jnp.asarray(img0, jnp.float32))
        return self._init_jit(feats, jax.random.PRNGKey(seed))

    def step(self, state: ThreeFrameState, img: np.ndarray):
        feats = self._detect_jit(jnp.asarray(img, jnp.float32))
        return self._core_jit(state, feats, self.K)


def _tf_init(feats, key, cfg: VOConfig):
    pts, desc, valid = feats
    Kcap = pts.shape[0]
    return ThreeFrameState(
        pts_a=pts,
        pts_b=pts,
        desc_b=desc,
        valid_b=valid,
        # identity self-match (a = b = frame 0): step 1 then estimates a
        # plain 2-frame pose through the same triplet code path
        m_ab_idx=jnp.arange(Kcap, dtype=jnp.int32),
        m_ab_valid=valid,
        R_ab=jnp.eye(3, dtype=jnp.float32),
        t_ab=jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        pose=jnp.eye(4, dtype=jnp.float32),
        key=key,
        n_frames=jnp.asarray(1, jnp.int32),
    )


def _tf_core(state: ThreeFrameState, feats, K, cfg: VOConfig):
    pts_c, desc_c, valid_c = feats
    m_bc = match_features(state.desc_b, desc_c, state.valid_b, valid_c, cfg)

    # Triplets over a-slots: a -> b (cached) -> c (fresh); the gather-based
    # index intersection (feature_tracking_scale.py:57-67).
    j = state.m_ab_idx  # a -> b
    k = m_bc.idx[j]  # b -> c
    trip_valid = state.m_ab_valid & m_bc.valid[j]
    p1 = state.pts_a
    p2 = state.pts_b[j]
    p3 = pts_c[k]

    fx = K[0, 0]
    p1n = normalize_pixels(p1, K)
    p2n = normalize_pixels(p2, K)
    p3n = normalize_pixels(p3, K)

    key, sub = jax.random.split(state.key)
    res = ransac_essential(
        sub, p2n, p3n, trip_valid,
        threshold=cfg.ransac_px_threshold / fx,
        n_iters=cfg.ransac_iters,
    )
    # RANSAC inlier mask applied to pose estimation (reference :113-115)
    pr = recover_pose(res.E, p2n, p3n, res.inliers)
    R23, t23 = pr.R, pr.t

    # 3-frame scale: cloud_12 triangulated in frame 1, moved into frame 2
    # (:158-159); cloud_23 in frame 2; matched median ratio (:140-151).
    X12 = triangulate_fast(state.R_ab, state.t_ab, p1n, p2n)
    X12_b = X12 @ state.R_ab.T + state.t_ab
    X23 = triangulate_fast(R23, t23, p2n, p3n)
    cloud_valid = (
        trip_valid
        & jnp.all(jnp.isfinite(X12_b), axis=1)
        & jnp.all(jnp.isfinite(X23), axis=1)
    )
    s = relative_scale_matched(X12_b, X23, cloud_valid)

    # Two-frame warmup: with fewer than three frames there is no prior
    # cloud, so the pose applies with unit scale (reference starts the
    # 3-frame scale at i >= 2).
    have3 = state.n_frames >= 2
    enough = trip_valid.sum() >= cfg.min_pose_points
    s = jnp.where(have3 & enough, s, 1.0)
    T = make_se3(R23, s * t23)
    new_pose = jnp.where(enough, state.pose @ inv_se3(T), state.pose)

    new_state = ThreeFrameState(
        pts_a=state.pts_b,
        pts_b=pts_c,
        desc_b=desc_c,
        valid_b=valid_c,
        m_ab_idx=m_bc.idx,
        m_ab_valid=m_bc.valid,
        R_ab=R23,
        t_ab=t23,
        pose=new_pose,
        key=key,
        n_frames=state.n_frames + 1,
    )
    n_assoc = jnp.sum(trip_valid).astype(jnp.int32)
    out = FrameOutput(
        pose=new_pose,
        scale=s,
        n_assoc=n_assoc,
        n_inliers=res.inliers.sum(),
        fallback=jnp.asarray(False),
        health=jnp.where(enough, n_assoc, 0),
        # no re-detect gate in the 3-frame driver; per-frame dip flag
        gate=jnp.stack([
            (jnp.where(enough, n_assoc, 0) < cfg.min_tracked
             ).astype(jnp.int32),
            jnp.where(enough, n_assoc, 0).astype(jnp.int32),
        ]),
    )
    return new_state, out


def _tf_step(state, img, K, cfg: VOConfig):
    """Fused single-program form (compat / CPU tests)."""
    return _tf_core(state, detect_and_describe(img, cfg), K, cfg)
