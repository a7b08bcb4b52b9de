"""End-to-end monocular VO pipelines.

TPU re-design of the reference's drivers:

- `TrackingVO` = vo_tracking (feature_tracking.cpp): ORB detect on frame 0,
  pyramidal-LK tracking frame to frame, in-graph re-detect + Hamming-match
  fallback when tracked survivors drop below `min_tracked` (the reference's
  `< 150` rule, feature_tracking.cpp:69-71), 5-point... -> batched RANSAC
  essential pose, triangulation scale, pose chaining `cur = prev @ T^-1`.
- `MatchingVO` = vo_matching (feature_matching.cpp): detect + describe every
  frame, knn(2) ratio matching against the previous frame, same geometry.

Each frame is one small jitted program over fixed-capacity masked arrays.
Data-dependent choices (the re-detect fallback) are made on the HOST from
asynchronously fetched scalars and select between precompiled programs —
in-graph lax.cond mega-branches compile to pathological TPU code and
host-synchronous reads cost ~150 ms on tunneled TPUs (see TrackingVO).
The host loop only decodes images and dispatches.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from ..frontend.orb import OrbConfig, level_budgets, orb_detect_and_compute
from ..frontend.sift import SiftConfig, sift_detect_and_compute
from ..geometry.epipolar import normalize_pixels, ransac_essential, recover_pose
from ..geometry.scale import relative_scale_matched, relative_scale_unmatched
from ..geometry.se3 import inv_se3, make_se3
from ..geometry.triangulate import triangulate_depths
from ..ops.hamming import knn2_ratio_match, l2_table, match_descriptors
from ..ops.lk import (
    LKCache,
    LKConfig,
    lk_build_pyramid,
    lk_make_cache,
    lk_pyramid_track_cached,
)



class VOConfig(NamedTuple):
    """Static pipeline parameters; defaults = the reference's tracking_orb
    configuration (ORB-3000, LK 21x21x(4 levels)x30, RANSAC prob 0.999
    thr 1 px, fallback <150)."""

    orb: OrbConfig = OrbConfig(nfeatures=3000, fast_threshold=20.0)
    lk: LKConfig = LKConfig()
    # Fixed-batch RANSAC hypothesis count. 256 covers inlier ratios down
    # to ~0.49 at prob 0.999 for the 5-point sample; LO-RANSAC's refit
    # extends robustness below that. (cv2's ADAPTIVE termination usually
    # runs far fewer on VO's 0.7+ inlier tracks; measured: 512 vs 128
    # give bit-identical inlier sets on the KITTI pair.)
    ransac_iters: int = 256
    ransac_px_threshold: float = 1.0
    min_tracked: int = 150
    match_ratio: float = 0.8
    min_pose_points: int = 8
    # "matched": pair prev/cur 3D points by index identity (valid for the
    # tracking pipeline, where LK preserves slot identity frame to frame).
    # "unmatched": compaction-order pairing of independent clouds — the
    # matching drivers' truncation semantics (feature_matching.cpp:251-263).
    scale_mode: str = "matched"
    # Scale chaining. The reference caches the RAW unit-baseline cloud
    # (feature_tracking.cpp:271-281 — points_3d is stored before any
    # rescale), so its get_scale returns the baseline RATIO b_k/b_{k-1}
    # and uses it as the absolute step length: steps never telescope to
    # a consistent unit (per-step scale oscillates 0.23-2.9 on a
    # constant-ish-speed sequence). "rescaled" caches s_k * X_k so the
    # ratio telescopes to b_k/b_1. MEASURED OUTCOME: "reference" wins —
    # raw-cloud chaining is self-correcting (noise in cloud k inflates
    # s_k but deflates s_{k+1}), while rescaling compounds one bad
    # estimate into every later frame (after a re-detect garbles the
    # index pairing, the cached cloud inherits the bad scale and the
    # chain death-spirals to the 0.1 clip floor: ATE 10.5 vs 4.2 on the
    # 24-frame gate sequence). Kept as a knob for the record.
    scale_chain: str = "reference"
    # Frontend: "orb" (Hamming bits) or "sift" (L2 float descriptors) —
    # the reference's two detector families (feature_matching.cpp:27-33).
    detector: str = "orb"
    sift: SiftConfig = SiftConfig()
    # Re-detect gate: "async" never blocks on the device->host survivor
    # count (decision lags ~RTT; fastest on tunneled TPUs), "sync" waits
    # for it every frame (bit-reproducible runs; cheap when the device is
    # local/CPU).
    fallback_gate: str = "async"
    # Bounded staleness for the async gate: block on any survivor count
    # older than this many dispatched steps. Without the bound the drain
    # depends on is_ready(), which on the tunneled TPU only flips once
    # compute+transfer finish — a pure-dispatch run (run_vo fetches
    # nothing until the end) NEVER drains and the re-detect gate is
    # silently inert (measured: tracking_sift clean seed 0, fallbacks=0
    # over 1000 frames while health sat under the threshold -> 146 m
    # stall; the same binary re-detects fine when anything forces
    # per-frame materialization). The bound also caps host run-ahead,
    # so a trigger applies at most gate_max_lag frames after the
    # condition (the reference checks synchronously every frame,
    # feature_tracking.cpp:207-210). Throughput note: the device queue
    # holds the max_lag newer steps, so the device stays busy as long
    # as max_lag * step_time exceeds the D2H latency.
    gate_max_lag: int = 32
    # Tiered lane capacity (TrackingVO only): when the async survivor
    # count drops under 90% of a tier, the state is compacted to that
    # many lanes and tracking continues in a smaller compiled program —
    # LK cost scales with ALLOCATED lanes, not live tracks, so decayed
    # stretches between re-detects run at a fraction of full-capacity
    # cost. A re-detect expands back to full capacity. Descending tuple
    # of capacities (e.g. (1536, 768)); empty disables. Compaction is a
    # pure deterministic slot renumbering (valid slots first, stable
    # order), so matched-scale index pairing is preserved exactly.
    tier_capacities: tuple = ()


def detect_and_describe(img: jnp.ndarray, cfg: "VOConfig"):
    """Uniform frontend: returns (pts (K, 2), desc, valid). `desc` is
    (K, 256) uint8 bit planes for ORB, (K, 128) float32 for SIFT."""
    if cfg.detector == "sift":
        f = sift_detect_and_compute(img, cfg.sift)
        return jnp.stack([f.xs, f.ys], axis=1), f.desc, f.valid
    f = orb_detect_and_compute(img, cfg.orb)
    return jnp.stack([f.xs, f.ys], axis=1), f.bits, f.valid


def match_features(desc1, desc2, valid1, valid2, cfg: "VOConfig"):
    """knn2 + ratio matching in the detector's metric (Hamming / L2)."""
    if cfg.detector == "sift":
        return knn2_ratio_match(
            l2_table(desc1, desc2), valid1, valid2, cfg.match_ratio,
            squared=True,
        )
    return match_descriptors(desc1, desc2, valid1, valid2, cfg.match_ratio)


class FrameOutput(NamedTuple):
    pose: jnp.ndarray  # (4, 4) cam->world, chained
    scale: jnp.ndarray  # ()
    n_assoc: jnp.ndarray  # () tracked/matched count used for the pose
    n_inliers: jnp.ndarray  # () RANSAC inliers
    fallback: jnp.ndarray  # () bool — tracking pipeline re-detected
    health: jnp.ndarray  # () n_assoc gated by pose success: 0 on pose-hold
    # frames, so the re-detect gate fires even when LK keeps >=min_tracked
    # survivors whose geometry is degenerate (the seed-0 stall mode:
    # survivors stay high while RANSAC inliers stay < min_pose_points
    # forever and the pose holds to the end of the sequence)
    gate: jnp.ndarray  # (2,) int32 [dip latch, health] — the packed gate
    # feed (_AsyncScalarGate): element 0 is the DEVICE-accumulated
    # "any health dip since the last re-detect" latch, so ONE fetch of
    # the newest arrived value answers the trigger question exactly and
    # the host never has to read every per-frame scalar (each blocking
    # read costs a full tunnel RTT); element 1 is the current survivor
    # count for the tier scheduler


def _feature_capacity(cfg: VOConfig) -> int:
    if cfg.detector == "sift":
        return cfg.sift.nfeatures
    return sum(level_budgets(cfg.orb))


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

    Returns (new_pose, cur3d, cur3d_valid, scale, n_inliers, pose_ok).
    Degrades to identity motion (pose_ok=False) when fewer than
    `min_pose_points` associations or RANSAC inliers survive (the
    reference would abort; we keep the previous pose)."""
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
    # Closed-form two-view depths (TPU fast path) instead of the DLT's
    # batched 4x4 eigendecomposition. Unlike the reference, points failing
    # cheirality or beyond 1e4 baselines are excluded from the scale
    # median: near-parallel rays produce huge unstable depths that the
    # DLT's normalization used to suppress (measured to cut synthetic ATE).
    z1, z2 = triangulate_depths(R, t, p1n, p2n)
    ones = jnp.ones_like(p1n[:, :1])
    X = z1[:, None] * jnp.concatenate([p1n, ones], axis=1)
    cur_valid = (
        valid
        & jnp.isfinite(z1) & jnp.isfinite(z2)
        & (z1 > 0) & (z2 > 0) & (z1 < 1e4)
    )
    if cfg.scale_mode == "matched":
        s = relative_scale_matched(prev3d, X, prev3d_valid & cur_valid)
    else:
        s = relative_scale_unmatched(prev3d, prev3d_valid, X, cur_valid)

    n_ok = jnp.sum(valid)
    n_inl = pose_res.mask.sum()
    # Degrade to identity motion when associations OR RANSAC inliers are
    # too few (the reference aborts on degenerate E; holding the pose is
    # the graceful equivalent, and gating on inliers keeps near-empty
    # texture-dropout frames from injecting garbage rotations).
    enough = (n_ok >= cfg.min_pose_points) & (n_inl >= cfg.min_pose_points)
    T = make_se3(R, s * t)
    new_pose = jnp.where(enough, pose @ inv_se3(T), pose)
    s = jnp.where(enough, s, 1.0)
    # Cache the cloud for the next frame's ratio (see VOConfig.scale_chain)
    if cfg.scale_chain == "rescaled":
        X = s[..., None] * X
    return new_pose, X, cur_valid & enough, s, n_inl, enough


# ---------------------------------------------------------------- tracking


class TrackingState(NamedTuple):
    pyramid: tuple  # prev frame halving pyramid (refresh detect source)
    lk_cache: LKCache  # prev frame per-point windows (template source)
    pts: jnp.ndarray  # (K, 2) tracked point positions in prev frame
    pts_valid: jnp.ndarray  # (K,)
    prev3d: jnp.ndarray  # (K, 3) previous frame-pair cloud
    prev3d_valid: jnp.ndarray
    pose: jnp.ndarray  # (4, 4)
    key: jax.Array
    health: jnp.ndarray  # () previous step's FrameOutput.health (the
    # in-graph scan gate's trigger signal; mirrors what the host gate sees)
    dipped: jnp.ndarray  # () int32 sticky "any health < min_tracked since
    # the last re-detect" latch, accumulated ON DEVICE — the async gate
    # fetches only the newest arrived (dipped, health) pair and still
    # answers "did any frame dip" exactly (FrameOutput.gate)


class _AsyncScalarGate:
    """Non-blocking threshold watch on a stream of device scalars.

    Each step enqueues its survivor count (async D2H started); `update()`
    drains whatever has ARRIVED (is_ready, never blocks) and reports
    whether ANY arrived value from a step after the last trigger is
    below the threshold. "Any", not "newest": several step scalars often
    arrive in one drain batch on a tunneled TPU (~150 ms readback
    latency), and keying the decision on the newest alone made a
    one-frame health dip recoverable or fatal depending on host timing
    (measured: the same binary scored 55 m or 146 m on the same
    sequence purely by whether a transient dip arrived alone or
    batched). The decision still lags a few frames behind; the device
    pipeline never stalls."""

    def __init__(self, threshold: int, mode: str = "async",
                 max_lag: int = 32):
        self.threshold = threshold
        self.mode = mode
        self.max_lag = max_lag
        self._inbox: list = []  # (step_idx, device scalar)
        self._step = 0
        self._last_trigger = -1
        self._pending_low = False
        self._latest = None  # newest drained (step_idx, value)

    def reset(self):
        self._inbox.clear()
        self._step = 0
        self._last_trigger = -1
        self._pending_low = False
        self._latest = None

    def latest_since_trigger(self):
        """Newest drained value measured AFTER the last trigger fired,
        or None — the tier logic must not act on counts from before a
        re-detect restored the track set."""
        if self._latest is None or self._latest[0] <= self._last_trigger:
            return None
        return self._latest[1]

    def push(self, scalar) -> None:
        self._step += 1
        try:
            scalar.copy_to_host_async()
        except AttributeError:
            pass
        self._inbox.append((self._step, scalar))

    def _apply(self, idx, arr) -> None:
        """Consume one drained entry. A (2,) vector is the packed
        [dip latch, count] gate feed (FrameOutput.gate): the latch is
        device-accumulated since the last re-detect, so the newest value
        alone answers "did any frame dip" exactly. A scalar entry is a
        plain count (legacy/tests): dip = count < threshold at that
        step only."""
        v = np.asarray(arr)
        if v.ndim:
            low, val = bool(v[0]), int(v[1])
        else:
            val = int(v)
            low = val < self.threshold
        self._latest = (idx, val)
        if idx > self._last_trigger and low:
            self._pending_low = True

    def update(self) -> bool:
        while self._inbox:
            idx, arr = self._inbox[0]
            if self.mode == "async":
                # Bounded staleness (VOConfig.gate_max_lag): entries at
                # or past the lag bound are drained BLOCKING — is_ready
                # alone never flips on a pure-dispatch tunneled-TPU run,
                # which left the gate inert for whole sequences
                # (measured: fallbacks=0 over 1000 frames while health
                # sat under the threshold -> the 146 m stall). A
                # blocking fetch of an already-computed scalar is cheap
                # (~0 measured in the driver bench); only is_ready is
                # unreliable on this backend.
                stale = self._step - idx >= self.max_lag
                ready = getattr(arr, "is_ready", lambda: True)()
                if not stale and not ready:
                    break
            self._inbox.pop(0)
            self._apply(idx, arr)
        trigger = self._pending_low
        if trigger:
            self._pending_low = False
            self._last_trigger = self._step  # wait for post-refresh counts
        return trigger


def _lane_axis(cfg: VOConfig) -> int:
    """Axis of the keypoint lanes in the LK window storage (ops/lk.py):
    'lanes'/'pallas' store (S+10, S+10, N); 'batch' stores (N, S, S)."""
    return 2 if cfg.lk.layout != "batch" else 0


def _compact_tracking_state(
    state: TrackingState, k_small: int, cfg: VOConfig
) -> TrackingState:
    """Deterministic slot compaction to `k_small` lanes: valid slots
    first in stable slot order, then dead slots. pts/prev3d move
    together, so matched-scale index pairing is preserved exactly; the
    only observable change is the slot numbering (and with it the
    unmatched-mode pair permutation, which tracking does not use)."""
    from ..ops.lk import _lanes_width

    idx = jnp.argsort(~state.pts_valid, stable=True)[:k_small]
    ax = _lane_axis(cfg)
    # window stacks keep the layout's canonical width (pallas stores
    # 128-aligned lanes); extra lanes carry junk that no consumer reads
    lw = _lanes_width(k_small, cfg.lk) if ax == 2 else k_small
    widx = jnp.pad(idx, (0, lw - k_small))
    wins = tuple(jnp.take(w, widx, axis=ax) for w in state.lk_cache.wins)
    origins = tuple(o[idx] for o in state.lk_cache.origins)
    return state._replace(
        lk_cache=LKCache(wins=wins, origins=origins),
        pts=state.pts[idx],
        pts_valid=state.pts_valid[idx],
        prev3d=state.prev3d[idx],
        prev3d_valid=state.prev3d_valid[idx],
    )


def _expand_tracking_state(
    state: TrackingState, k_full: int, cfg: VOConfig
) -> TrackingState:
    """Pad a compacted state back to full capacity with dead slots (the
    masked fixed-shape semantics make padding inert)."""
    from ..ops.lk import _lanes_width

    k = state.pts.shape[0]
    pad = k_full - k
    if pad <= 0:
        return state
    ax = _lane_axis(cfg)

    def padlane(x, axis, to):
        widths = [
            (0, max(0, to - x.shape[axis])) if a == axis else (0, 0)
            for a in range(x.ndim)
        ]
        return jnp.pad(x, widths)

    lw = _lanes_width(k_full, cfg.lk) if ax == 2 else k_full
    wins = tuple(padlane(w, ax, lw) for w in state.lk_cache.wins)
    origins = tuple(padlane(o, 0, k_full) for o in state.lk_cache.origins)
    return state._replace(
        lk_cache=LKCache(wins=wins, origins=origins),
        pts=padlane(state.pts, 0, k_full),
        pts_valid=padlane(state.pts_valid, 0, k_full),
        prev3d=padlane(state.prev3d, 0, k_full),
        prev3d_valid=padlane(state.prev3d_valid, 0, k_full),
    )


class TrackingVO:
    """vo_tracking-equivalent pipeline. Use `init(img0)` then `step(...)`.

    TPU latency design: the reference's same-frame re-detect fallback
    (feature_tracking.cpp:69-71) is a data-dependent branch. A lax.cond
    with a heavy fallback branch compiles into a pathologically slow TPU
    program (measured ~70x the cost of its stages), and a synchronous
    host decision would serialize a ~150 ms device->host readback into
    every frame on tunneled TPUs. Instead the survivor count is watched
    through a NON-BLOCKING async gate (_AsyncScalarGate): the re-detect
    program runs a few frames after the count actually dropped, and the
    device pipeline never waits on the host."""

    def __init__(self, K: np.ndarray, config: VOConfig = VOConfig()):
        self.cfg = config
        self.K = jnp.asarray(K, jnp.float32)
        self.capacity = _feature_capacity(config)
        # detect is its own (shared) program: fusing the 8-level ORB into
        # the step blew up remote-compiler memory, and it is only needed
        # at init/refresh anyway
        self._detect_jit = jax.jit(
            functools.partial(detect_and_describe, cfg=config)
        )
        self._init_jit = jax.jit(functools.partial(_tracking_init, cfg=config))
        self._track_jit = jax.jit(functools.partial(_track_step, cfg=config))
        self._refresh_jit = jax.jit(
            functools.partial(_refresh_core, cfg=config)
        )
        self._gate = _AsyncScalarGate(
            config.min_tracked, config.fallback_gate, config.gate_max_lag
        )
        # Tiered lane capacity (VOConfig.tier_capacities): host-side
        # current capacity + per-tier compaction programs. Same jitted
        # step functions serve every tier (jax recompiles per shape).
        self.tiers = tuple(sorted(set(config.tier_capacities), reverse=True))
        assert all(0 < t < self.capacity for t in self.tiers), (
            "tier_capacities must be strictly below the feature capacity"
        )
        self._tier = self.capacity
        self._compact_jit = jax.jit(
            functools.partial(_compact_tracking_state, cfg=config),
            static_argnames=("k_small",),
        )
        self._expand_jit = jax.jit(
            functools.partial(
                _expand_tracking_state, k_full=self.capacity, cfg=config
            )
        )

    def init(self, img0: np.ndarray, seed: int = 0) -> TrackingState:
        self._gate.reset()
        self._tier = self.capacity
        img0 = jnp.asarray(img0, jnp.float32)
        feats = self._detect_jit(img0)
        return self._init_jit(feats, img0, jax.random.PRNGKey(seed))

    def expand_state(self, state: TrackingState) -> TrackingState:
        """Full-capacity copy of a (possibly tier-compacted) state —
        checkpoints are always written at full capacity so a resume
        never depends on the host tier cursor."""
        if state.pts.shape[0] == self.capacity:
            return state
        return self._expand_jit(state)

    def _pick_tier(self) -> int:
        """Smallest tier whose 90% fill holds the newest post-refresh
        survivor count; tracks only decay between refreshes, so tiers
        only shrink here (refresh restores full capacity)."""
        val = self._gate.latest_since_trigger()
        if val is None:
            return self._tier
        t = self._tier
        for cap in self.tiers:
            if cap < t and val <= 0.9 * cap:
                t = cap
        return t

    def step(self, state: TrackingState, img: np.ndarray):
        img = jnp.asarray(img, jnp.float32)
        if self._gate.update():
            if self._tier != self.capacity:
                state = self._expand_jit(state)
                self._tier = self.capacity
            f1 = self._detect_jit(state.pyramid[0])
            f2 = self._detect_jit(img)
            state, out = self._refresh_jit(state, img, f1, f2, self.K)
        else:
            if self.tiers:
                tier = self._pick_tier()
                if tier != self._tier:
                    state = self._compact_jit(state, k_small=tier)
                    self._tier = tier
            state, out = self._track_jit(state, img, self.K)
        self._gate.push(out.gate)
        return state, out


def _tracking_init(feats, img0: jnp.ndarray, key: jax.Array, cfg: VOConfig):
    pts, _, feats_valid = feats
    K_cap = pts.shape[0]
    pyr = lk_build_pyramid(img0, cfg.lk)
    return TrackingState(
        pyramid=pyr,
        lk_cache=lk_make_cache(pyr, pts, cfg.lk),
        pts=pts,
        pts_valid=feats_valid,
        prev3d=jnp.zeros((K_cap, 3), jnp.float32),
        prev3d_valid=jnp.zeros((K_cap,), bool),
        pose=jnp.eye(4, dtype=jnp.float32),
        key=key,
        health=jnp.sum(feats_valid).astype(jnp.int32),
        dipped=(
            jnp.sum(feats_valid) < cfg.min_tracked
        ).astype(jnp.int32),
    )


def _finish_tracking_step(
    state, pyr2, cache2, pts1, pts2, valid, K, cfg: VOConfig, fallback: bool
):
    key, sub = jax.random.split(state.key)
    new_pose, cur3d, cur3d_valid, s, n_inl, pose_ok = _pose_scale_chain(
        pts1, pts2, valid, K,
        state.prev3d, state.prev3d_valid, state.pose, sub, cfg,
    )
    n_assoc = jnp.sum(valid).astype(jnp.int32)
    health = jnp.where(pose_ok, n_assoc, 0)
    dip_now = (health < cfg.min_tracked).astype(jnp.int32)
    # the latch resets on a re-detect (static branch: fallback is a
    # trace-time bool) and accumulates across track steps
    dipped = dip_now if fallback else jnp.maximum(state.dipped, dip_now)
    new_state = TrackingState(
        pyramid=pyr2,
        lk_cache=cache2,
        pts=pts2,
        pts_valid=valid,
        prev3d=cur3d,
        prev3d_valid=cur3d_valid,
        pose=new_pose,
        key=key,
        health=health,
        dipped=dipped,
    )
    out = FrameOutput(
        pose=new_pose,
        scale=s,
        n_assoc=n_assoc,
        n_inliers=n_inl,
        fallback=jnp.asarray(fallback),
        health=health,
        gate=jnp.stack([dipped, health]),
    )
    return new_state, out


def _track_step(
    state: TrackingState, img: jnp.ndarray, K: jnp.ndarray, cfg: VOConfig
):
    """Pure LK-tracking step (no re-detect): the flagship hot path."""
    pyr2 = lk_build_pyramid(img, cfg.lk)
    tracked, status, cache2 = lk_pyramid_track_cached(
        state.lk_cache, pyr2, state.pts, state.pts_valid, cfg.lk
    )
    return _finish_tracking_step(
        state, pyr2, cache2, state.pts, tracked, status, K, cfg,
        fallback=False,
    )


def _refresh_core(
    state: TrackingState, img: jnp.ndarray, feats1, feats2,
    K: jnp.ndarray, cfg: VOConfig
):
    """Re-detect on both frames + knn matching in the detector's metric
    (feature_tracking.cpp:195-220); replaces tracking for this pair.
    Detection runs in the shared detect program; this program matches and
    finishes the step."""
    pyr2 = lk_build_pyramid(img, cfg.lk)
    p1, d1, v1 = feats1
    p2, d2, v2 = feats2
    m = match_features(d1, d2, v1, v2, cfg)
    pts2 = p2[m.idx]
    cache2 = lk_make_cache(pyr2, pts2, cfg.lk)
    return _finish_tracking_step(
        state, pyr2, cache2, p1, pts2, m.valid, K, cfg, fallback=True
    )


def _refresh_step(state, img, K, cfg: VOConfig):
    """Fused single-program refresh (compat / CPU tests)."""
    f1 = detect_and_describe(state.pyramid[0], cfg)
    f2 = detect_and_describe(img, cfg)
    return _refresh_core(state, img, f1, f2, K, cfg)


# Backwards-compatible alias for the fused single-program form (still used
# by older callers; prefer TrackingVO which schedules the two programs).
_tracking_step = _track_step


# ---------------------------------------------------------------- matching


class MatchingState(NamedTuple):
    pts: jnp.ndarray  # (K, 2) prev frame keypoints
    desc: jnp.ndarray  # ORB bit planes or SIFT float descriptors
    valid: jnp.ndarray
    prev3d: jnp.ndarray
    prev3d_valid: jnp.ndarray
    pose: jnp.ndarray
    key: jax.Array


class MatchingVO:
    """vo_matching-equivalent pipeline (detect + knn-match every frame).

    Two programs per step — the shared detect program and a small
    match+geometry program — rather than one fused step: the fused form
    (8-level ORB inlined) produced compile-time blowups on the remote TPU
    compiler, and the split detect program is shared with the tracking
    pipelines' refresh path."""

    def __init__(self, K: np.ndarray, config: VOConfig = VOConfig()):
        self.cfg = config
        self.K = jnp.asarray(K, jnp.float32)
        self.capacity = _feature_capacity(config)
        self._detect_jit = jax.jit(
            functools.partial(detect_and_describe, cfg=config)
        )
        self._init_jit = jax.jit(functools.partial(_matching_init, cfg=config))
        self._core_jit = jax.jit(functools.partial(_matching_core, cfg=config))

    def init(self, img0: np.ndarray, seed: int = 0) -> MatchingState:
        feats = self._detect_jit(jnp.asarray(img0, jnp.float32))
        return self._init_jit(feats, jax.random.PRNGKey(seed))

    def step(self, state: MatchingState, img: np.ndarray):
        feats = self._detect_jit(jnp.asarray(img, jnp.float32))
        return self._core_jit(state, feats, self.K)


def _matching_init(feats, key: jax.Array, cfg: VOConfig):
    pts, desc, valid = feats
    K_cap = pts.shape[0]
    return MatchingState(
        pts=pts, desc=desc, valid=valid,
        prev3d=jnp.zeros((K_cap, 3), jnp.float32),
        prev3d_valid=jnp.zeros((K_cap,), bool),
        pose=jnp.eye(4, dtype=jnp.float32),
        key=key,
    )


def _matching_core(
    state: MatchingState, feats, K: jnp.ndarray, cfg: VOConfig
):
    pts2_all, desc2, valid2 = feats
    m = match_features(state.desc, desc2, state.valid, valid2, cfg)
    pts1 = state.pts
    pts2 = pts2_all[m.idx]

    key, sub = jax.random.split(state.key)
    new_pose, cur3d, cur3d_valid, s, n_inl, pose_ok = _pose_scale_chain(
        pts1, pts2, m.valid, K,
        state.prev3d, state.prev3d_valid, state.pose, sub, cfg,
    )

    new_state = MatchingState(
        pts=pts2_all, desc=desc2, valid=valid2,
        prev3d=cur3d, prev3d_valid=cur3d_valid, pose=new_pose, key=key,
    )
    n_assoc = m.count()
    out = FrameOutput(
        pose=new_pose,
        scale=s,
        n_assoc=n_assoc,
        n_inliers=n_inl,
        fallback=jnp.asarray(False),
        health=jnp.where(pose_ok, n_assoc, 0).astype(jnp.int32),
        # matching has no re-detect gate; per-frame dip flag for parity
        gate=jnp.stack([
            (jnp.where(pose_ok, n_assoc, 0) < cfg.min_tracked
             ).astype(jnp.int32),
            jnp.where(pose_ok, n_assoc, 0).astype(jnp.int32),
        ]),
    )
    return new_state, out


# backwards-compatible fused form (tests/tools may reference it)
def _matching_step(state, img, K, cfg: VOConfig):
    return _matching_core(state, detect_and_describe(img, cfg), K, cfg)


# ---------------------------------------------------------------- driver


def _start_host_copy(out) -> None:
    """Begin async D2H for every leaf of a step output (cheap to call;
    makes the later np.asarray() consumption non-blocking)."""
    for leaf in jax.tree.leaves(out):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            pass


def _out_ready(out) -> bool:
    """True when every leaf of a step output has arrived on the host."""
    for leaf in jax.tree.leaves(out):
        ready = getattr(leaf, "is_ready", None)
        if ready is not None and not ready():
            return False
    return True


def run_vo(seq, pipeline, verbose: bool = False, on_frame=None):
    """Host loop over a sequence object (KittiSequence / SyntheticSequence).

    Latency design: on tunneled TPUs a synchronous device->host read costs
    ~150 ms, so the loop only DISPATCHES steps (each step's outputs start
    an async copy) and all logging/conversion happens after the loop —
    the device pipeline never stalls on the host.

    `on_frame(i, out)` (optional) is called DURING the run for outputs
    whose async copies have already arrived — the live-view hook
    (utils/live.py). It intentionally lags the device a few frames and
    never blocks the dispatch loop.

    Returns (est_path (N, 2) x/z, gt_path (N, 2), scales (N, 2) [gt, est],
    stats list of per-frame dicts)."""
    gt_poses = seq.poses
    state = pipeline.init(seq.frame(0))
    outs = []
    consumed = 0
    for i in range(1, len(seq)):
        state, out = pipeline.step(state, seq.frame(i))
        _start_host_copy(out)
        outs.append(out)
        if on_frame is not None:
            while consumed < len(outs) and _out_ready(outs[consumed]):
                on_frame(consumed + 1, outs[consumed])
                consumed += 1
        if verbose and i % 100 == 0:
            print(f"dispatched frame {i}")

    est_path = [np.zeros(2)]
    gt_path = [gt_poses[0][[0, 2], 3]]
    scales, stats = [(1.0, 1.0)], [{}]
    for i, out in enumerate(outs, start=1):
        pose = np.asarray(out.pose)
        est_path.append(pose[[0, 2], 3])
        gt_path.append(gt_poses[i][[0, 2], 3])
        # Reference scale.txt semantics (feature_tracking.cpp:79-101,
        # :351-353): column 1 = |Δgt| over the full 3-D translation,
        # column 2 = the estimator's own get_scale output for this frame
        # (NOT a post-hoc est-path step length).
        gt_scale = float(
            np.linalg.norm(gt_poses[i][:3, 3] - gt_poses[i - 1][:3, 3])
        )
        est_scale = float(out.scale)
        scales.append((max(gt_scale, 1e-9), max(est_scale, 1e-9)))
        stats.append(
            {
                "n_assoc": int(out.n_assoc),
                "n_inliers": int(out.n_inliers),
                "scale": float(out.scale),
                "fallback": bool(out.fallback),
                "health": int(out.health),
            }
        )

    return (
        np.asarray(est_path),
        np.asarray(gt_path),
        np.asarray(scales),
        stats,
    )
