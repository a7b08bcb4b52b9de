"""Tracking VO with sliding-window bundle adjustment (vo_ba equivalent).

Reference: src/with_bundle_adjustment.cpp — the tracking pipeline (SIFT
there, ORB here by default; the frontend is a config knob) plus a 5-frame
window refined by BA every 10 frames, and the estimated path of the window
frames rewritten from the BA result (:237-247).

TPU re-design: one jitted step; the BA solve is a lax.cond branch taken on
trigger frames, operating on the fixed-shape window pytree carried in the
state (no stored images, no re-tracking — see vo_tpu/ba/window.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ba.window import (
    WindowConfig,
    WindowState,
    run_window_ba,
    window_init,
    window_push,
    window_reset,
)
from ..frontend.orb import orb_detect_and_compute
from ..ops.hamming import match_descriptors
from ..ops.lk import lk_pyramid_track
from ..ops.pyramid import build_halving_pyramid
from .vo import FrameOutput, VOConfig, _feature_capacity, _pose_scale_chain


class BAFrameOutput(NamedTuple):
    frame: FrameOutput
    window_poses: jnp.ndarray  # (W, 4, 4) BA-refined window poses
    window_count: jnp.ndarray  # () frames in window
    ba_ran: jnp.ndarray  # () bool
    ba_cost0: jnp.ndarray
    ba_cost: jnp.ndarray
    ba_landmarks: jnp.ndarray
    ba_accepted: jnp.ndarray


class TrackingBAState(NamedTuple):
    pyramid: tuple
    pts: jnp.ndarray
    pts_valid: jnp.ndarray
    prev3d: jnp.ndarray
    prev3d_valid: jnp.ndarray
    pose: jnp.ndarray
    window: WindowState
    frame_idx: jnp.ndarray  # () int32
    key: jax.Array


class TrackingBAVO:
    """vo_ba-equivalent pipeline: `init(img0)` then `step(state, img)`."""

    def __init__(
        self,
        K: np.ndarray,
        config: VOConfig = VOConfig(),
        window: WindowConfig = WindowConfig(),
    ):
        self.cfg = config
        self.wcfg = window
        self.K = jnp.asarray(K, jnp.float32)
        self.capacity = _feature_capacity(config.orb)
        self._init_jit = jax.jit(
            functools.partial(_ba_init, cfg=config, wcfg=window)
        )
        self._step_jit = jax.jit(
            functools.partial(_ba_step, cfg=config, wcfg=window)
        )

    def init(self, img0: np.ndarray, seed: int = 0) -> TrackingBAState:
        return self._init_jit(
            jnp.asarray(img0, jnp.float32), jax.random.PRNGKey(seed)
        )

    def step(self, state: TrackingBAState, img: np.ndarray):
        return self._step_jit(state, jnp.asarray(img, jnp.float32), self.K)


def _ba_init(img0, key, cfg: VOConfig, wcfg: WindowConfig):
    feats = orb_detect_and_compute(img0, cfg.orb)
    pts = jnp.stack([feats.xs, feats.ys], axis=1)
    Kcap = pts.shape[0]
    pyr = tuple(build_halving_pyramid(img0, cfg.lk.max_level + 1))
    win = window_init(wcfg.window_size, Kcap)
    win = window_push(win, jnp.eye(4, dtype=jnp.float32), pts, feats.valid)
    return TrackingBAState(
        pyramid=pyr,
        pts=pts,
        pts_valid=feats.valid,
        prev3d=jnp.zeros((Kcap, 3), jnp.float32),
        prev3d_valid=jnp.zeros((Kcap,), bool),
        pose=jnp.eye(4, dtype=jnp.float32),
        window=win,
        frame_idx=jnp.asarray(0, jnp.int32),
        key=key,
    )


def _ba_step(
    state: TrackingBAState, img, K, cfg: VOConfig, wcfg: WindowConfig
):
    pyr2 = tuple(build_halving_pyramid(img, cfg.lk.max_level + 1))
    tracked, status = lk_pyramid_track(
        state.pyramid, pyr2, state.pts, state.pts_valid, cfg.lk
    )
    need_fallback = jnp.sum(status) < cfg.min_tracked

    def fallback(_):
        f1 = orb_detect_and_compute(state.pyramid[0], cfg.orb)
        f2 = orb_detect_and_compute(img, cfg.orb)
        m = match_descriptors(
            f1.bits, f2.bits, f1.valid, f2.valid, cfg.match_ratio
        )
        p1 = jnp.stack([f1.xs, f1.ys], axis=1)
        p2 = jnp.stack([f2.xs[m.idx], f2.ys[m.idx]], axis=1)
        return p1, p2, m.valid

    def keep(_):
        return state.pts, tracked, status

    pts1, pts2, valid = lax.cond(need_fallback, fallback, keep, None)

    key, sub = jax.random.split(state.key)
    new_pose, cur3d, cur3d_valid, s, n_inl = _pose_scale_chain(
        pts1, pts2, valid, K,
        state.prev3d, state.prev3d_valid, state.pose, sub, cfg,
    )

    # Window upkeep: slot identity breaks on re-detect -> reset (the
    # reference instead re-tracks across stored window images; our tracks
    # are only consistent between re-detects).
    win = lax.cond(
        need_fallback,
        lambda w: window_reset(w),
        lambda w: w,
        state.window,
    )
    win = window_push(win, new_pose, pts2, valid)

    frame_idx = state.frame_idx + 1
    trigger = (frame_idx % wcfg.ba_every == 0) & (
        win.count >= wcfg.window_size
    )

    def do_ba(w):
        return run_window_ba(w, K, wcfg)

    def no_ba(w):
        info = {
            "ba_ran": jnp.asarray(False),
            "ba_cost0": jnp.asarray(0.0, jnp.float32),
            "ba_cost": jnp.asarray(0.0, jnp.float32),
            "ba_landmarks": jnp.asarray(0, jnp.int32),
            "ba_accepted": jnp.asarray(0, jnp.int32),
        }
        return w.poses, jnp.zeros((w.poses.shape[0],), bool), info

    new_win_poses, pose_ok, info = lax.cond(trigger, do_ba, no_ba, win)
    win = win._replace(poses=new_win_poses)
    # Pipeline pose follows the (possibly refined) newest window pose.
    new_pose = new_win_poses[-1]

    new_state = TrackingBAState(
        pyramid=pyr2,
        pts=pts2,
        pts_valid=valid,
        prev3d=cur3d,
        prev3d_valid=cur3d_valid,
        pose=new_pose,
        window=win,
        frame_idx=frame_idx,
        key=key,
    )
    out = BAFrameOutput(
        frame=FrameOutput(
            pose=new_pose,
            scale=s,
            n_assoc=jnp.sum(valid),
            n_inliers=n_inl,
            fallback=need_fallback,
        ),
        window_poses=new_win_poses,
        window_count=win.count,
        ba_ran=info["ba_ran"],
        ba_cost0=info["ba_cost0"],
        ba_cost=info["ba_cost"],
        ba_landmarks=info["ba_landmarks"],
        ba_accepted=info["ba_accepted"],
    )
    return new_state, out


def run_vo_ba(seq, pipeline: TrackingBAVO, verbose: bool = False):
    """Host loop with the reference's est-path rewrite on BA frames
    (with_bundle_adjustment.cpp:237-247)."""
    gt_poses = seq.poses
    state = pipeline.init(seq.frame(0))
    est_path = [np.zeros(2)]
    gt_path = [gt_poses[0][[0, 2], 3]]
    scales, stats = [(1.0, 1.0)], [{}]
    Wn = pipeline.wcfg.window_size

    for i in range(1, len(seq)):
        state, out = pipeline.step(state, seq.frame(i))
        pose = np.asarray(out.frame.pose)
        est_path.append(pose[[0, 2], 3])
        if bool(out.ba_ran):
            wp = np.asarray(out.window_poses)  # last Wn frames incl. i
            for j in range(Wn):
                est_path[i - Wn + 1 + j] = wp[j][[0, 2], 3]
        gt_path.append(gt_poses[i][[0, 2], 3])
        gt_scale = float(
            np.linalg.norm(gt_poses[i][:3, 3] - gt_poses[i - 1][:3, 3])
        )
        est_scale = float(np.linalg.norm(est_path[-1] - est_path[-2]))
        scales.append((max(gt_scale, 1e-9), max(est_scale, 1e-9)))
        stats.append(
            {
                "n_assoc": int(out.frame.n_assoc),
                "n_inliers": int(out.frame.n_inliers),
                "scale": float(out.frame.scale),
                "fallback": bool(out.frame.fallback),
                "ba_ran": bool(out.ba_ran),
                "ba_cost0": float(out.ba_cost0),
                "ba_cost": float(out.ba_cost),
                "ba_landmarks": int(out.ba_landmarks),
                "ba_accepted": int(out.ba_accepted),
            }
        )
        if verbose and stats[-1]["ba_ran"]:
            print(
                f"frame {i}: BA cost {stats[-1]['ba_cost0']:.1f} -> "
                f"{stats[-1]['ba_cost']:.1f} over "
                f"{stats[-1]['ba_landmarks']} landmarks, "
                f"{stats[-1]['ba_accepted']} poses accepted"
            )

    return (
        np.asarray(est_path),
        np.asarray(gt_path),
        np.asarray(scales),
        stats,
    )
