"""End-to-end monocular VO pipelines.

TPU re-design of the reference's drivers:

- `TrackingVO` = vo_tracking (feature_tracking.cpp): ORB detect on frame 0,
  pyramidal-LK tracking frame to frame, in-graph re-detect + Hamming-match
  fallback when tracked survivors drop below `min_tracked` (the reference's
  `< 150` rule, feature_tracking.cpp:69-71), 5-point... -> batched RANSAC
  essential pose, triangulation scale, pose chaining `cur = prev @ T^-1`.
- `MatchingVO` = vo_matching (feature_matching.cpp): detect + describe every
  frame, knn(2) ratio matching against the previous frame, same geometry.

Everything per frame is ONE jitted program over fixed-capacity masked
arrays, including the data-dependent fallback (lax.cond — XLA executes only
the taken branch). The host loop only decodes images and logs poses.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..frontend.orb import OrbConfig, level_budgets, orb_detect_and_compute
from ..geometry.epipolar import normalize_pixels, ransac_essential, recover_pose
from ..geometry.scale import relative_scale_matched, relative_scale_unmatched
from ..geometry.se3 import inv_se3, make_se3
from ..geometry.triangulate import triangulate_normalized
from ..ops.hamming import match_descriptors
from ..ops.lk import LKConfig, lk_pyramid_track
from ..ops.pyramid import build_halving_pyramid


class VOConfig(NamedTuple):
    """Static pipeline parameters; defaults = the reference's tracking_orb
    configuration (ORB-3000, LK 21x21x(4 levels)x30, RANSAC prob 0.999
    thr 1 px, fallback <150)."""

    orb: OrbConfig = OrbConfig(nfeatures=3000, fast_threshold=20.0)
    lk: LKConfig = LKConfig()
    ransac_iters: int = 512
    ransac_px_threshold: float = 1.0
    min_tracked: int = 150
    match_ratio: float = 0.8
    min_pose_points: int = 8
    # "matched": pair prev/cur 3D points by index identity (valid for the
    # tracking pipeline, where LK preserves slot identity frame to frame).
    # "unmatched": compaction-order pairing of independent clouds — the
    # matching drivers' truncation semantics (feature_matching.cpp:251-263).
    scale_mode: str = "matched"


class FrameOutput(NamedTuple):
    pose: jnp.ndarray  # (4, 4) cam->world, chained
    scale: jnp.ndarray  # ()
    n_assoc: jnp.ndarray  # () tracked/matched count used for the pose
    n_inliers: jnp.ndarray  # () RANSAC inliers
    fallback: jnp.ndarray  # () bool — tracking pipeline re-detected


def _feature_capacity(orb_cfg: OrbConfig) -> int:
    return sum(level_budgets(orb_cfg))


def _pose_scale_chain(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    prev3d: jnp.ndarray,
    prev3d_valid: jnp.ndarray,
    pose: jnp.ndarray,
    key: jax.Array,
    cfg: VOConfig,
):
    """Shared L3 geometry: RANSAC pose + triangulation scale + chaining.

    Returns (new_pose, cur3d, cur3d_valid, scale, n_inliers). Degrades to
    identity motion when fewer than `min_pose_points` associations survive
    (the reference would abort; we keep the previous pose)."""
    fx = K[0, 0]
    p1n = normalize_pixels(pts1, K)
    p2n = normalize_pixels(pts2, K)
    thr = cfg.ransac_px_threshold / fx

    res = ransac_essential(
        key, p1n, p2n, valid, threshold=thr, n_iters=cfg.ransac_iters
    )
    pose_res = recover_pose(res.E, p1n, p2n, res.inliers)
    R, t = pose_res.R, pose_res.t

    # Triangulate ALL associated points under the recovered pose (the
    # reference's get_scale triangulates the full pts arrays,
    # feature_tracking.cpp:262-281) and estimate scale against the previous
    # frame-pair's cloud by compacted index pairing (SURVEY.md §3.2).
    X = triangulate_normalized(R, t, p1n, p2n)
    cur_valid = valid & jnp.all(jnp.isfinite(X), axis=1)
    if cfg.scale_mode == "matched":
        s = relative_scale_matched(prev3d, X, prev3d_valid & cur_valid)
    else:
        s = relative_scale_unmatched(prev3d, prev3d_valid, X, cur_valid)

    n_ok = jnp.sum(valid)
    enough = n_ok >= cfg.min_pose_points
    T = make_se3(R, s * t)
    new_pose = jnp.where(enough, pose @ inv_se3(T), pose)
    s = jnp.where(enough, s, 1.0)
    return new_pose, X, cur_valid & enough, s, pose_res.mask.sum()


# ---------------------------------------------------------------- tracking


class TrackingState(NamedTuple):
    pyramid: tuple  # prev frame halving pyramid (LK source)
    pts: jnp.ndarray  # (K, 2) tracked point positions in prev frame
    pts_valid: jnp.ndarray  # (K,)
    prev3d: jnp.ndarray  # (K, 3) previous frame-pair cloud
    prev3d_valid: jnp.ndarray
    pose: jnp.ndarray  # (4, 4)
    key: jax.Array


class TrackingVO:
    """vo_tracking-equivalent pipeline. Use `init(img0)` then `step(...)`."""

    def __init__(self, K: np.ndarray, config: VOConfig = VOConfig()):
        self.cfg = config
        self.K = jnp.asarray(K, jnp.float32)
        self.capacity = _feature_capacity(config.orb)
        self._init_jit = jax.jit(
            functools.partial(_tracking_init, cfg=config), static_argnames=()
        )
        self._step_jit = jax.jit(functools.partial(_tracking_step, cfg=config))

    def init(self, img0: np.ndarray, seed: int = 0) -> TrackingState:
        return self._init_jit(
            jnp.asarray(img0, jnp.float32), jax.random.PRNGKey(seed)
        )

    def step(self, state: TrackingState, img: np.ndarray):
        return self._step_jit(state, jnp.asarray(img, jnp.float32), self.K)


def _tracking_init(img0: jnp.ndarray, key: jax.Array, cfg: VOConfig):
    feats = orb_detect_and_compute(img0, cfg.orb)
    pts = jnp.stack([feats.xs, feats.ys], axis=1)
    K_cap = pts.shape[0]
    pyr = tuple(build_halving_pyramid(img0, cfg.lk.max_level + 1))
    return TrackingState(
        pyramid=pyr,
        pts=pts,
        pts_valid=feats.valid,
        prev3d=jnp.zeros((K_cap, 3), jnp.float32),
        prev3d_valid=jnp.zeros((K_cap,), bool),
        pose=jnp.eye(4, dtype=jnp.float32),
        key=key,
    )


def _tracking_step(
    state: TrackingState, img: jnp.ndarray, K: jnp.ndarray, cfg: VOConfig
):
    pyr2 = tuple(build_halving_pyramid(img, cfg.lk.max_level + 1))

    tracked, status = lk_pyramid_track(
        state.pyramid, pyr2, state.pts, state.pts_valid, cfg.lk
    )
    n_tracked = jnp.sum(status)
    need_fallback = n_tracked < cfg.min_tracked

    def fallback(_):
        # re-detect on both frames + Hamming knn matching
        # (feature_tracking.cpp:195-220)
        f1 = orb_detect_and_compute(state.pyramid[0], cfg.orb)
        f2 = orb_detect_and_compute(img, cfg.orb)
        m = match_descriptors(
            f1.bits, f2.bits, f1.valid, f2.valid, cfg.match_ratio
        )
        p1 = jnp.stack([f1.xs, f1.ys], axis=1)
        p2 = jnp.stack([f2.xs[m.idx], f2.ys[m.idx]], axis=1)
        return p1, p2, m.valid

    def keep_tracking(_):
        return state.pts, tracked, status

    pts1, pts2, valid = lax.cond(need_fallback, fallback, keep_tracking, None)

    key, sub = jax.random.split(state.key)
    new_pose, cur3d, cur3d_valid, s, n_inl = _pose_scale_chain(
        pts1, pts2, valid, K,
        state.prev3d, state.prev3d_valid, state.pose, sub, cfg,
    )

    new_state = TrackingState(
        pyramid=pyr2,
        pts=pts2,
        pts_valid=valid,
        prev3d=cur3d,
        prev3d_valid=cur3d_valid,
        pose=new_pose,
        key=key,
    )
    out = FrameOutput(
        pose=new_pose,
        scale=s,
        n_assoc=jnp.sum(valid),
        n_inliers=n_inl,
        fallback=need_fallback,
    )
    return new_state, out


# ---------------------------------------------------------------- matching


class MatchingState(NamedTuple):
    xs: jnp.ndarray  # prev frame features
    ys: jnp.ndarray
    bits: jnp.ndarray
    valid: jnp.ndarray
    prev3d: jnp.ndarray
    prev3d_valid: jnp.ndarray
    pose: jnp.ndarray
    key: jax.Array


class MatchingVO:
    """vo_matching-equivalent pipeline (detect + knn-match every frame)."""

    def __init__(self, K: np.ndarray, config: VOConfig = VOConfig()):
        self.cfg = config
        self.K = jnp.asarray(K, jnp.float32)
        self.capacity = _feature_capacity(config.orb)
        self._init_jit = jax.jit(functools.partial(_matching_init, cfg=config))
        self._step_jit = jax.jit(functools.partial(_matching_step, cfg=config))

    def init(self, img0: np.ndarray, seed: int = 0) -> MatchingState:
        return self._init_jit(
            jnp.asarray(img0, jnp.float32), jax.random.PRNGKey(seed)
        )

    def step(self, state: MatchingState, img: np.ndarray):
        return self._step_jit(state, jnp.asarray(img, jnp.float32), self.K)


def _matching_init(img0: jnp.ndarray, key: jax.Array, cfg: VOConfig):
    f = orb_detect_and_compute(img0, cfg.orb)
    K_cap = f.xs.shape[0]
    return MatchingState(
        xs=f.xs, ys=f.ys, bits=f.bits, valid=f.valid,
        prev3d=jnp.zeros((K_cap, 3), jnp.float32),
        prev3d_valid=jnp.zeros((K_cap,), bool),
        pose=jnp.eye(4, dtype=jnp.float32),
        key=key,
    )


def _matching_step(
    state: MatchingState, img: jnp.ndarray, K: jnp.ndarray, cfg: VOConfig
):
    f2 = orb_detect_and_compute(img, cfg.orb)
    m = match_descriptors(
        state.bits, f2.bits, state.valid, f2.valid, cfg.match_ratio
    )
    pts1 = jnp.stack([state.xs, state.ys], axis=1)
    pts2 = jnp.stack([f2.xs[m.idx], f2.ys[m.idx]], axis=1)

    key, sub = jax.random.split(state.key)
    new_pose, cur3d, cur3d_valid, s, n_inl = _pose_scale_chain(
        pts1, pts2, m.valid, K,
        state.prev3d, state.prev3d_valid, state.pose, sub, cfg,
    )

    new_state = MatchingState(
        xs=f2.xs, ys=f2.ys, bits=f2.bits, valid=f2.valid,
        prev3d=cur3d, prev3d_valid=cur3d_valid, pose=new_pose, key=key,
    )
    out = FrameOutput(
        pose=new_pose,
        scale=s,
        n_assoc=m.count(),
        n_inliers=n_inl,
        fallback=jnp.asarray(False),
    )
    return new_state, out


# ---------------------------------------------------------------- driver


def run_vo(seq, pipeline, verbose: bool = False):
    """Host loop over a sequence object (KittiSequence / SyntheticSequence).

    Returns (est_path (N, 2) x/z, gt_path (N, 2), scales (N, 2) [gt, est],
    stats list of per-frame dicts)."""
    gt_poses = seq.poses
    state = pipeline.init(seq.frame(0))
    est_path = [np.asarray(state.pose)[np.ix_([0, 2], [3, 3])][:, 0]]
    gt_path = [gt_poses[0][[0, 2], 3]]
    scales, stats = [(1.0, 1.0)], [{}]

    for i in range(1, len(seq)):
        state, out = pipeline.step(state, seq.frame(i))
        pose = np.asarray(out.pose)
        est_path.append(pose[[0, 2], 3])
        gt_path.append(gt_poses[i][[0, 2], 3])
        gt_scale = float(
            np.linalg.norm(gt_poses[i][:3, 3] - gt_poses[i - 1][:3, 3])
        )
        est_prev = est_path[-2]
        est_scale = float(np.linalg.norm(est_path[-1] - est_prev))
        scales.append((max(gt_scale, 1e-9), max(est_scale, 1e-9)))
        stats.append(
            {
                "n_assoc": int(out.n_assoc),
                "n_inliers": int(out.n_inliers),
                "scale": float(out.scale),
                "fallback": bool(out.fallback),
            }
        )
        if verbose and i % 50 == 0:
            print(f"frame {i}: assoc={stats[-1]['n_assoc']} "
                  f"inl={stats[-1]['n_inliers']} s={stats[-1]['scale']:.3f}")

    return (
        np.asarray(est_path),
        np.asarray(gt_path),
        np.asarray(scales),
        stats,
    )
