"""Sliding-window state + BA problem assembly for the vo_ba pipeline.

Reference semantics (src/with_bundle_adjustment.cpp): window deques of
{pose, observations, image} with WINDOW_SIZE=5 (:281-285), BA triggered on
every 10th frame with a full window (:228), landmarks triangulated from the
window's first two frames (buildLandmarksFromFirstTwoFramesAndTracks
:502-575) with a 0.1-100 m baseline gate (:515-516) and z>0 cheirality
check (:555-572), per-pose accept gates drot<0.5 rad / dtrans<50 (:699-717).

TPU re-design: the reference re-runs LK point-by-point across the stored
window images to recover tracks (trackPointsAcrossWindow :464-499 — O(N*W)
1-point LK calls, its worst hot spot). Here the tracking frontend already
preserves *slot identity* across frames (fixed-capacity masked arrays), so
the window simply stacks each frame's (K,2) point array + validity mask:
tracks are free, no images are retained, and the whole window is a fixed
shape pytree that lives in the jitted step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..geometry.se3 import exp_so3, inv_se3, log_so3, make_se3
from .schur import BAConfig, _lsum, bundle_adjust


class WindowConfig(NamedTuple):
    window_size: int = 5  # WINDOW_SIZE (with_bundle_adjustment.cpp:282)
    ba_every: int = 10  # trigger cadence (:228)
    min_baseline: float = 0.1  # (:515)
    max_baseline: float = 100.0  # (:516)
    min_landmarks: int = 20
    # Per-pose accept gates. The reference's are loose (0.5 rad / 50 m,
    # :708-709); the shipped defaults are the TIGHT gates from the
    # round-3 schedule study (BA_ANALYSIS.md §3): on a front-end whose
    # windows are already near-consistent, large BA pose moves are noise
    # (solver direction noise compounding through the chain, measured
    # 1.29x ATE at reference gates vs 0.93x with map + tight gates).
    max_rot_update: float = 0.03  # rad (reference parity: 0.5)
    max_trans_update: float = 1.0  # m (reference parity: 50.0)
    # Landmark-build gates (beyond the reference's z>0, :555-572):
    # near-parallel rays triangulated from the window's noisy chained
    # poses produce wild depths (z in the thousands or negative) that LM
    # cannot pull back across the cost barrier — they sit as permanent
    # Huber outliers that both bias the poses and eat the BA's accuracy
    # win (measured, scripts/ba_diag.py). Landmarks must reproject into
    # every observing view within `max_init_px` at init and keep depths
    # in (0, max_depth) in all observing views.
    max_depth: float = 2000.0
    max_init_px: float = 5.0
    # Cross-window landmark reuse ("local map") — an accuracy feature the
    # reference does not have: fresh-per-window BA cannot observe the
    # window's global scale (monocular gauge) or correct the chain across
    # window boundaries, so per-step scale noise — the dominant ATE term
    # on the synthetic eval (scripts/ba_win_diag.py decompose: |scale|
    # ~23%/window vs rotation 0.18 deg) — survives BA untouched.
    # Landmarks solved in the PREVIOUS window and re-observed here enter
    # as both initialization and a soft prior (schur.py point_prior_w):
    # the overlap anchors the current window's scale/heading to the
    # previous solve, damping the random walk.
    map_prior_weight: float = 3.0  # px-cost per meter of map deviation
    map_gate_px: float = 5.0  # reuse reprojection gate (all views)
    # Cross-window map reuse ON by default: "map + tight gates" was the
    # best measured schedule variant (BA_ANALYSIS.md §3, 0.93x vs the
    # 1.29x of the reference-parity fresh-per-window config). The
    # pipeline (models/vo_ba.py) carries (map_X, map_ok) in its state
    # when this is set.
    use_map: bool = True
    # Adaptive window accept (no reference analogue): every
    # `holdout_every`-th candidate landmark is EXCLUDED from the solve;
    # the rewrite is accepted only if the held-out landmarks'
    # re-triangulated Huber reprojection cost does not worsen under the
    # refined poses. Rejects overfit/corrupt solves that reduce in-set
    # cost while degrading geometry — the failure mode that made BA
    # net-harmful on ATE in rounds 2-3. 0 disables.
    holdout_every: int = 5
    min_holdout: int = 8  # fewer held-out points than this -> pass
    ba: BAConfig = BAConfig()


class WindowState(NamedTuple):
    """Chronological ring of the last `window_size` frames (index -1 =
    current frame). All arrays are fixed-shape; `count` tracks fill."""

    poses: jnp.ndarray  # (W, 4, 4) cam->world, chained estimates
    obs: jnp.ndarray  # (W, K, 2) pixel positions per slot
    valid: jnp.ndarray  # (W, K) slot observed in that frame
    count: jnp.ndarray  # () int32, frames currently held (<= W)


def window_init(window_size: int, capacity: int) -> WindowState:
    return WindowState(
        poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (window_size, 1, 1)),
        obs=jnp.zeros((window_size, capacity, 2), jnp.float32),
        valid=jnp.zeros((window_size, capacity), bool),
        count=jnp.asarray(0, jnp.int32),
    )


def window_push(
    st: WindowState, pose: jnp.ndarray, pts: jnp.ndarray, valid: jnp.ndarray
) -> WindowState:
    """Shift-in the newest frame (drops the oldest once full)."""
    W = st.poses.shape[0]
    return WindowState(
        poses=jnp.concatenate([st.poses[1:], pose[None]], 0),
        obs=jnp.concatenate([st.obs[1:], pts[None]], 0),
        valid=jnp.concatenate([st.valid[1:], valid[None]], 0),
        count=jnp.minimum(st.count + 1, W),
    )


def window_reset(st: WindowState) -> WindowState:
    """Invalidate the window (tracking re-detect broke slot identity)."""
    return st._replace(count=jnp.asarray(0, jnp.int32),
                       valid=jnp.zeros_like(st.valid))


def window_remap(
    st: WindowState, old_idx: jnp.ndarray, ok: jnp.ndarray
) -> WindowState:
    """Re-key window slots across a re-detect: new slot j inherits the
    observation history of old slot old_idx[j] where ok[j] (else starts
    with no history). Count is preserved, so BA keeps running across
    re-detects — the TPU equivalent of the reference re-tracking stored
    window images (with_bundle_adjustment.cpp:464-499) without keeping
    any images: history transfers by slot association instead.

    Note: if two new slots map to the same old slot both inherit its
    history (duplicate landmarks); the BA's per-landmark weighting makes
    this benign and the next W frames age duplicates out."""
    return WindowState(
        poses=st.poses,
        obs=st.obs[:, old_idx],
        valid=st.valid[:, old_idx] & ok[None, :],
        count=st.count,
    )


def triangulate_window(
    T_wc: jnp.ndarray, obs: jnp.ndarray, valid: jnp.ndarray, K: jnp.ndarray
) -> jnp.ndarray:
    """Masked multi-view DLT: (L, 3) world points from every valid
    observation in the window (rows of invalid views are zeroed out of
    A^T A). Wider effective baselines than the reference's fixed
    frames-0/1 pair (buildLandmarks... :502-575) — far points whose 0-1
    rays are near-parallel get conditioned by the 0..W-1 spread."""
    P = jnp.einsum("ij,wjk->wik", K, T_wc[:, :3])  # (W, 3, 4)
    u, v = obs[..., 0], obs[..., 1]
    r1 = u[..., None] * P[:, None, 2] - P[:, None, 0]  # (W, L, 4)
    r2 = v[..., None] * P[:, None, 2] - P[:, None, 1]
    A = jnp.stack([r1, r2], axis=2)  # (W, L, 2, 4)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    A = A * valid[..., None, None]
    # smallest right-singular vector per landmark via batched one-sided
    # Jacobi (geometry/linalg3.py): pure VPU arithmetic, no eigh custom
    # call, and no A^T A squaring of the condition number
    from ..geometry.linalg3 import nullspace_jacobi

    rows = jnp.transpose(A, (1, 0, 2, 3)).reshape(A.shape[1], -1, 4)
    X = nullspace_jacobi(rows)  # (L, 4)
    w = X[..., 3:]
    return X[..., :3] / jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)


def _gate_points(
    T_wc: jnp.ndarray,
    obs: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    X: jnp.ndarray,
    px: float,
    max_depth: float,
) -> jnp.ndarray:
    """(L,) acceptance: X keeps positive bounded depth in EVERY observing
    view and reprojects within `px` there, with >= 2 observing views."""
    pc = jnp.einsum("wij,lj->wli", T_wc[:, :3, :3], X) + T_wc[:, None, :3, 3]
    z = pc[..., 2]
    zsafe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    proj = pc[..., :2] / zsafe[..., None]
    uv = proj * jnp.array([K[0, 0], K[1, 1]]) + jnp.array([K[0, 2], K[1, 2]])
    err2 = jnp.sum((uv - obs) ** 2, axis=-1)  # (W, L)
    depth_ok = (z > 0.0) & (z < max_depth)
    view_ok = depth_ok & (err2 < px**2)
    ok_all = jnp.all(view_ok | ~valid, axis=0)  # every observing view
    n_views = jnp.sum(valid, axis=0)
    return (n_views >= 2) & ok_all & jnp.all(jnp.isfinite(X), axis=1)


def build_landmarks(
    T_wc: jnp.ndarray,
    obs: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    cfg: WindowConfig,
):
    """(X (L, 3), point_ok (L,)): windowed triangulation + acceptance
    gates. Beyond the reference's z>0 check, landmarks must keep positive
    bounded depth in EVERY observing view and reproject within
    cfg.max_init_px there — stuck wild-depth outliers otherwise put a
    floor under the BA cost and bias the poses (scripts/ba_diag.py)."""
    X = triangulate_window(T_wc, obs, valid, K)
    return X, _gate_points(
        T_wc, obs, valid, K, X, cfg.max_init_px, cfg.max_depth
    )


def _holdout_cost(
    T_wc: jnp.ndarray,
    obs: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    hold: jnp.ndarray,
    delta: float,
    axis_name=None,
) -> jnp.ndarray:
    """Huber reprojection cost of the held-out landmarks, each
    re-triangulated from the poses under evaluation (gauge-invariant:
    both triangulation and reprojection use the same poses, so a uniform
    similarity of the window leaves the cost unchanged — the score
    reflects geometric CONSISTENCY, exactly what BA claims to improve)."""
    from .schur import _robust_cost

    v = valid & hold[None, :]
    X = triangulate_window(T_wc, obs, v, K)
    pc = jnp.einsum("wij,lj->wli", T_wc[:, :3, :3], X) + T_wc[:, None, :3, 3]
    z = pc[..., 2]
    zsafe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    proj = pc[..., :2] / zsafe[..., None]
    uv = proj * jnp.array([K[0, 0], K[1, 1]]) + jnp.array([K[0, 2], K[1, 2]])
    r2 = jnp.sum((uv - obs) ** 2, axis=-1)
    good = v & (z > 0.0) & jnp.all(jnp.isfinite(uv), axis=-1)
    # a view that went degenerate (behind camera / nan) under these
    # poses is charged the worst-case clamp instead of being dropped
    r2 = jnp.where(good, jnp.minimum(r2, 1e6), jnp.where(v, 1e6, 0.0))
    return _lsum(_robust_cost(r2, v, delta), axis_name)


def run_window_ba(
    st: WindowState, K: jnp.ndarray, cfg: WindowConfig, axis_name=None,
    lmap=None,
):
    """Assemble + solve the window BA problem; returns (new_poses (W,4,4),
    applied (W,) bool, info dict of scalars) — plus the updated map
    (map_X, map_ok) when `lmap` is given.

    Poses are optimized world->cam (like the reference, :596-600) and gated
    per pose against runaway updates before being written back inverted.

    `lmap` = (map_X (K,3), map_ok (K,)) enables cross-window landmark
    reuse (see WindowConfig.map_prior_weight): map points that re-gate
    against the CURRENT window replace the fresh triangulation as
    initialization and carry a soft position prior, anchoring this
    window's scale/heading to the previous solve."""
    W, Kcap = st.valid.shape
    T_wc = inv_se3(st.poses)  # world->cam (4,4) each
    pose6 = jnp.concatenate(
        [log_so3(T_wc[:, :3, :3]), T_wc[:, :3, 3]], axis=1
    )  # (W, 6)

    X, point_ok = build_landmarks(T_wc, st.obs, st.valid, K, cfg)

    prior_w = None
    reuse = None
    if lmap is not None:
        map_X, map_ok = lmap
        reuse = map_ok & _gate_points(
            T_wc, st.obs, st.valid, K, map_X,
            cfg.map_gate_px, cfg.max_depth,
        )
        X = jnp.where(reuse[:, None], map_X, X)
        point_ok = point_ok | reuse
        prior_w = jnp.where(reuse, cfg.map_prior_weight, 0.0)

    # Adaptive-accept holdout split: every holdout_every-th candidate is
    # withheld from the solve and used only to validate the rewrite.
    # Under a landmark-sharded mesh (axis_name set) the slot index must
    # be GLOBAL so the holdout set matches the single-device run.
    gidx = jnp.arange(Kcap)
    if axis_name is not None:
        gidx = gidx + lax.axis_index(axis_name) * Kcap
    if cfg.holdout_every > 0:
        hold = point_ok & (gidx % cfg.holdout_every == 0)
    else:
        hold = jnp.zeros((Kcap,), bool)
    solve_ok = point_ok & ~hold

    baseline = jnp.linalg.norm(st.poses[1, :3, 3] - st.poses[0, :3, 3])
    ba_ok = (
        (st.count >= W)
        & (baseline > cfg.min_baseline)
        & (baseline < cfg.max_baseline)
        & (_lsum(jnp.sum(solve_ok), axis_name) >= cfg.min_landmarks)
    )
    solve_ok = solve_ok & ba_ok  # empty problem when gated off

    res = bundle_adjust(
        pose6,
        jnp.where(jnp.isfinite(X), X, 0.0),
        st.obs,
        st.valid,
        solve_ok,
        K,
        config=cfg.ba,
        axis_name=axis_name,
        point_prior_w=prior_w,
    )

    # Per-pose accept gates (:699-717): reject poses that moved too far.
    dR = exp_so3(res.poses[:, :3]) @ jnp.swapaxes(
        exp_so3(pose6[:, :3]), -1, -2
    )
    drot = jnp.linalg.norm(log_so3(dR), axis=-1)
    dtrans = jnp.linalg.norm(res.poses[:, 3:] - pose6[:, 3:], axis=-1)
    pose_ok = (
        ba_ok
        & (res.cost < res.cost0)
        & (drot < cfg.max_rot_update)
        & (dtrans < cfg.max_trans_update)
    )

    new_T_wc = make_se3(exp_so3(res.poses[:, :3]), res.poses[:, 3:])

    # Adaptive accept: the refined poses must not worsen the held-out
    # landmarks' re-triangulated reprojection cost (see _holdout_cost).
    n_hold = _lsum(jnp.sum(hold), axis_name)
    if cfg.holdout_every > 0:
        d = cfg.ba.huber_delta
        c_old = _holdout_cost(
            T_wc, st.obs, st.valid, K, hold, d, axis_name
        )
        c_new = _holdout_cost(
            new_T_wc, st.obs, st.valid, K, hold, d, axis_name
        )
        adapt_ok = (c_new <= c_old) | (n_hold < cfg.min_holdout)
    else:
        c_old = c_new = jnp.asarray(0.0, jnp.float32)
        adapt_ok = jnp.asarray(True)
    pose_ok = pose_ok & adapt_ok

    new_poses = jnp.where(
        pose_ok[:, None, None], inv_se3(new_T_wc), st.poses
    )
    info = {
        "ba_ran": ba_ok,
        "ba_cost0": res.cost0,
        "ba_cost": res.cost,
        "ba_landmarks": _lsum(jnp.sum(solve_ok), axis_name),
        "ba_accepted": jnp.sum(pose_ok),
        "ba_holdout_cost0": c_old,
        "ba_holdout_cost": c_new,
        "ba_holdout_n": n_hold,
    }
    if lmap is not None:
        # Map update: only on an applied solve; solved landmarks take
        # their refined positions, everything else ages out (map_ok =
        # this round's solved set — anchoring is window-(k-1)->k).
        applied = jnp.any(pose_ok)
        map_X, map_ok = lmap
        new_map = (
            jnp.where((solve_ok & applied)[:, None], res.points, map_X),
            jnp.where(applied, solve_ok, map_ok),
        )
        info["ba_reused"] = _lsum(jnp.sum(reuse & solve_ok), axis_name)
        return new_poses, pose_ok, info, new_map
    return new_poses, pose_ok, info
