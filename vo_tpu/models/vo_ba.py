"""Tracking VO with sliding-window bundle adjustment (vo_ba equivalent).

Reference: src/with_bundle_adjustment.cpp — the tracking pipeline (SIFT
there, ORB here by default; the frontend is a config knob) plus a 5-frame
window refined by BA every 10 frames, and the estimated path of the window
frames rewritten from the BA result (:237-247).

TPU re-design: four small jitted step variants (track/refresh x ba/no-ba)
selected on the host (the BA cadence is host-known; the fallback uses the
async-fetched previous survivor count), operating on the fixed-shape
window pytree carried in the state (no stored images, no re-tracking —
see vo_tpu/ba/window.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from ..ba.window import (
    WindowConfig,
    WindowState,
    run_window_ba,
    window_init,
    window_push,
    window_remap,
)
from ..ops.lk import (
    LKCache,
    lk_build_pyramid,
    lk_make_cache,
    lk_pyramid_track_cached,
)

from .vo import (
    FrameOutput,
    VOConfig,
    _feature_capacity,
    _pose_scale_chain,
    detect_and_describe,
    match_features,
)


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
    lk_cache: LKCache
    pts: jnp.ndarray
    pts_valid: jnp.ndarray
    prev3d: jnp.ndarray
    prev3d_valid: jnp.ndarray
    pose: jnp.ndarray
    window: WindowState
    # Cross-window landmark map (WindowConfig.use_map): positions solved
    # by the previous window, keyed by slot — re-observed points anchor
    # the next window's scale/heading (ba/window.py run_window_ba lmap).
    map_X: jnp.ndarray  # (K, 3)
    map_ok: jnp.ndarray  # (K,)
    frame_idx: jnp.ndarray  # () int32
    key: jax.Array
    dipped: jnp.ndarray  # () int32 sticky dip latch (see
    # models/vo.py TrackingState.dipped / FrameOutput.gate)


class TrackingBAVO:
    """vo_ba-equivalent pipeline: `init(img0)` then `step(state, img)`.

    Host-driven program selection (see TrackingVO): the BA trigger
    (frame % ba_every == 0 with a full window) is host-computable, and
    the re-detect fallback uses the async-fetched previous survivor
    count — so each step dispatches one of four small data-independent
    programs instead of one mega-program with in-graph lax.conds."""

    def __init__(
        self,
        K: np.ndarray,
        config: VOConfig = VOConfig(),
        window: WindowConfig = WindowConfig(),
    ):
        self.cfg = config
        self.wcfg = window
        self.K = jnp.asarray(K, jnp.float32)
        self.capacity = _feature_capacity(config)
        self._detect_jit = jax.jit(
            functools.partial(detect_and_describe, cfg=config)
        )
        self._init_jit = jax.jit(
            functools.partial(_ba_init, cfg=config, wcfg=window)
        )
        self._step_jits = {
            (refresh, do_ba): jax.jit(
                functools.partial(
                    _ba_step, cfg=config, wcfg=window,
                    refresh=refresh, do_ba=do_ba,
                )
            )
            for refresh in (False, True)
            for do_ba in (False, True)
        }
        from .vo import _AsyncScalarGate

        self._gate = _AsyncScalarGate(
            config.min_tracked, config.fallback_gate, config.gate_max_lag
        )
        self._frame_idx = 0
        self._win_fill = 0

    def init(self, img0: np.ndarray, seed: int = 0) -> TrackingBAState:
        self._gate.reset()
        self._frame_idx = 0
        self._win_fill = 1  # init pushes frame 0
        img0 = jnp.asarray(img0, jnp.float32)
        feats = self._detect_jit(img0)
        return self._init_jit(feats, img0, jax.random.PRNGKey(seed))

    def step(self, state: TrackingBAState, img: np.ndarray):
        refresh = self._gate.update()
        # window history survives re-detects (window_remap), so the fill
        # counter no longer resets on refresh
        self._win_fill = min(self._win_fill + 1, self.wcfg.window_size)
        self._frame_idx += 1
        do_ba = (
            self._frame_idx % self.wcfg.ba_every == 0
            and self._win_fill >= self.wcfg.window_size
        )
        img = jnp.asarray(img, jnp.float32)
        feats = (
            (self._detect_jit(state.pyramid[0]), self._detect_jit(img))
            if refresh
            else None
        )
        state, out = self._step_jits[(refresh, do_ba)](
            state, img, self.K, feats=feats
        )
        self._gate.push(out.frame.gate)
        return state, out


def _ba_init(feats, img0, key, cfg: VOConfig, wcfg: WindowConfig):
    pts, _, feats_valid = feats
    Kcap = pts.shape[0]
    pyr = lk_build_pyramid(img0, cfg.lk)
    win = window_init(wcfg.window_size, Kcap)
    win = window_push(win, jnp.eye(4, dtype=jnp.float32), pts, feats_valid)
    return TrackingBAState(
        pyramid=pyr,
        lk_cache=lk_make_cache(pyr, pts, cfg.lk),
        pts=pts,
        pts_valid=feats_valid,
        prev3d=jnp.zeros((Kcap, 3), jnp.float32),
        prev3d_valid=jnp.zeros((Kcap,), bool),
        pose=jnp.eye(4, dtype=jnp.float32),
        window=win,
        map_X=jnp.zeros((Kcap, 3), jnp.float32),
        map_ok=jnp.zeros((Kcap,), bool),
        frame_idx=jnp.asarray(0, jnp.int32),
        key=key,
        dipped=(
            jnp.sum(feats_valid) < cfg.min_tracked
        ).astype(jnp.int32),
    )


def _ba_step(
    state: TrackingBAState, img, K, cfg: VOConfig, wcfg: WindowConfig,
    feats=None, refresh: bool = False, do_ba: bool = False,
):
    pyr2 = lk_build_pyramid(img, cfg.lk)
    if refresh:
        # re-detect + match (feature_tracking.cpp:195-220). Detection ran
        # in the shared detect program (feats); fusing it here blew up
        # compile memory.
        (pts1, d1, v1), (p2, d2, v2) = feats
        m = match_features(d1, d2, v1, v2, cfg)
        pts2, valid = p2[m.idx], m.valid
        cache2 = lk_make_cache(pyr2, pts2, cfg.lk)
        # Carry BA tracks across the re-detect: the fresh detection pts1
        # lives on the SAME frame as the old tracked positions
        # (state.pyramid[0]), so new slot j inherits the history of the
        # nearest old tracked slot within 1.5 px (see window_remap;
        # replaces the window reset that silently disabled BA for W
        # frames after every fallback).
        d2_tab = jnp.sum(
            (pts1[:, None, :] - state.pts[None, :, :]) ** 2, axis=-1
        )
        d2_tab = jnp.where(state.pts_valid[None, :], d2_tab, jnp.inf)
        old_idx = jnp.argmin(d2_tab, axis=1)
        near = (
            jnp.take_along_axis(d2_tab, old_idx[:, None], 1)[:, 0] < 1.5**2
        )
        remap = (old_idx, near & v1)
    else:
        pts1 = state.pts
        pts2, valid, cache2 = lk_pyramid_track_cached(
            state.lk_cache, pyr2, state.pts, state.pts_valid, cfg.lk
        )

    key, sub = jax.random.split(state.key)
    new_pose, cur3d, cur3d_valid, s, n_inl, chain_ok = _pose_scale_chain(
        pts1, pts2, valid, K,
        state.prev3d, state.prev3d_valid, state.pose, sub, cfg,
    )

    # Window upkeep: on re-detect, re-key slots to the new detection via
    # the same-frame position association (window_remap) so BA survives
    # fallbacks, as the reference's stored-image re-tracking does. The
    # landmark map is re-keyed by the same association.
    win = window_remap(state.window, *remap) if refresh else state.window
    win = window_push(win, new_pose, pts2, valid)
    map_X, map_ok = state.map_X, state.map_ok
    if refresh:
        old_idx, near_ok = remap
        map_X = map_X[old_idx]
        map_ok = map_ok[old_idx] & near_ok

    frame_idx = state.frame_idx + 1
    if do_ba:
        if wcfg.use_map:
            new_win_poses, pose_ok, info, (map_X, map_ok) = run_window_ba(
                win, K, wcfg, lmap=(map_X, map_ok)
            )
        else:
            new_win_poses, pose_ok, info = run_window_ba(win, K, wcfg)
    else:
        info = {
            "ba_ran": jnp.asarray(False),
            "ba_cost0": jnp.asarray(0.0, jnp.float32),
            "ba_cost": jnp.asarray(0.0, jnp.float32),
            "ba_landmarks": jnp.asarray(0, jnp.int32),
            "ba_accepted": jnp.asarray(0, jnp.int32),
        }
        new_win_poses = win.poses
        pose_ok = jnp.zeros((win.poses.shape[0],), bool)
    win = win._replace(poses=new_win_poses)
    # Pipeline pose follows the (possibly refined) newest window pose.
    new_pose = new_win_poses[-1]

    new_state = TrackingBAState(
        pyramid=pyr2,
        lk_cache=cache2,
        pts=pts2,
        pts_valid=valid,
        prev3d=cur3d,
        prev3d_valid=cur3d_valid,
        pose=new_pose,
        window=win,
        map_X=map_X,
        map_ok=map_ok,
        frame_idx=frame_idx,
        key=key,
        dipped=state.dipped,  # replaced below once health is known
    )
    n_assoc = jnp.sum(valid).astype(jnp.int32)
    health = jnp.where(chain_ok, n_assoc, 0)
    dip_now = (health < cfg.min_tracked).astype(jnp.int32)
    dipped = dip_now if refresh else jnp.maximum(state.dipped, dip_now)
    new_state = new_state._replace(dipped=dipped)
    out = BAFrameOutput(
        frame=FrameOutput(
            pose=new_pose,
            scale=s,
            n_assoc=n_assoc,
            n_inliers=n_inl,
            fallback=jnp.asarray(refresh),
            health=health,
            gate=jnp.stack([dipped, health]),
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


def run_vo_ba(seq, pipeline: TrackingBAVO, verbose: bool = False,
              on_frame=None):
    """Host loop with the reference's est-path rewrite on BA frames
    (with_bundle_adjustment.cpp:237-247). Dispatch-only loop + deferred
    consumption (see run_vo's latency note).

    `on_frame(i, frame_out)` is the live-view hook (see run_vo): called
    during the run for arrived outputs with the per-frame FrameOutput.
    Window rewrites are NOT replayed into the hook — the live canvas
    shows the online estimate, the saved bundle the refined one."""
    from .vo import _out_ready, _start_host_copy

    gt_poses = seq.poses
    state = pipeline.init(seq.frame(0))
    est_path = [np.zeros(2)]
    gt_path = [gt_poses[0][[0, 2], 3]]
    scales, stats = [(1.0, 1.0)], [{}]
    Wn = pipeline.wcfg.window_size

    outs = []
    consumed = 0
    for i in range(1, len(seq)):
        state, out = pipeline.step(state, seq.frame(i))
        _start_host_copy(out)
        outs.append(out)
        if on_frame is not None:
            while consumed < len(outs) and _out_ready(outs[consumed]):
                on_frame(consumed + 1, outs[consumed].frame)
                consumed += 1

    for i, out in enumerate(outs, start=1):
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
        # column 2 = the estimator's get_scale output for this frame, as
        # the reference dumps (feature_tracking.cpp:79-101, :351-353).
        est_scale = float(out.frame.scale)
        scales.append((max(gt_scale, 1e-9), max(est_scale, 1e-9)))
        stats.append(
            {
                "n_assoc": int(out.frame.n_assoc),
                "n_inliers": int(out.frame.n_inliers),
                "scale": float(out.frame.scale),
                "fallback": bool(out.frame.fallback),
                "health": int(out.frame.health),
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
