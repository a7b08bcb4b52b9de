"""Scan-mode VO: whole frame CHUNKS per device program.

The step-loop drivers (run_vo) dispatch one jitted program per frame;
on the tunneled TPU runtime every dispatch costs ~0.4-0.6 ms of host
round-trip, and the device idles between steps. For offline/throughput
processing (bench, batch eval, dataset jobs) this module runs a
`lax.scan` over a pre-staged chunk of frames instead: ONE dispatch per
`chunk` frames, XLA pipelines the whole chain, and outputs come back as
stacked arrays.

Semantics:
- MatchingVO: same algorithm; the detect+match chain is bit-identical to
  the step loop, while the RANSAC-derived tail may differ within the
  matching configs' documented compile-to-compile variance (the
  hypothesis argmax sits on near-ties that FMA/fusion differences can
  flip). TrackingVO scan IS bit-identical to the sync step loop
  (tests/test_vo_scan.py) — LK inlier sets have real margins.
- TrackingVO: equivalent to the SYNC fallback gate
  (VOConfig.fallback_gate="sync"): the re-detect decision is an
  in-graph `lax.cond` on the previous step's surviving-track count —
  exactly the host sync gate's rule (models/vo.py _AsyncScalarGate).
  The default ASYNC gate's few-frame lag cannot be expressed in a scan
  (and exists only to hide D2H latency, which scan mode eliminates).

The reference has no analogue — its drivers are frame-at-a-time C++
loops (feature_tracking.cpp main loop) — this is TPU-first design:
static shapes let the whole sequence chunk live in one XLA program.

Compile note: the tracking cond fuses detect into the step program;
round 1's fused form blew up remote compile times PRE-canvas-packing
(8 separate levels); the canvas detect (ops/canvas.py) is ~5 dense
stages, which is why this is viable now. Validated vs the step loop in
tests/test_vo_scan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .vo import (
    MatchingVO,
    TrackingVO,
    _matching_step,
    _refresh_step,
    _track_step,
)


def make_scan_fn(pipeline, chunk: int):
    """Compiled (state, frames (chunk, H, W)) -> (state, outs) for a
    MatchingVO or TrackingVO instance."""
    cfg = pipeline.cfg
    K = pipeline.K

    if isinstance(pipeline, MatchingVO):

        def body(st, img):
            return _matching_step(st, img, K, cfg)

    elif isinstance(pipeline, TrackingVO):

        def body(st, img):
            # sync-gate rule: previous step's pose-gated survivor count
            # (FrameOutput.health — 0 on pose-hold frames, so a stalled
            # chain re-detects instead of holding forever)
            low = st.health < cfg.min_tracked
            return lax.cond(
                low,
                lambda s: _refresh_step(s, img, K, cfg),
                lambda s: _track_step(s, img, K, cfg),
                st,
            )

    else:
        raise TypeError(
            f"scan mode supports MatchingVO / TrackingVO, got "
            f"{type(pipeline).__name__}"
        )

    @jax.jit
    def scan_chunk(state, frames):
        return lax.scan(body, state, frames)

    return scan_chunk


def run_vo_scan(seq, pipeline, chunk: int = 50):
    """run_vo with scan-mode stepping. Returns the same
    (est_path, gt_path, scales, stats) tuple; trajectories match the
    step loop (sync gate for tracking) to float tolerance.

    The sequence length fixes the chunking: full `chunk`-sized scans
    plus one remainder-sized scan (each size compiles once, cached)."""
    gt_poses = seq.poses
    state = pipeline.init(seq.frame(0))
    scan_fns = {}
    outs_chunks = []
    i = 1
    n = len(seq)
    while i < n:
        c = min(chunk, n - i)
        frames = np.stack(
            [np.asarray(seq.frame(i + j), np.float32) for j in range(c)]
        )
        if c not in scan_fns:
            scan_fns[c] = make_scan_fn(pipeline, c)
        state, outs = scan_fns[c](state, jnp.asarray(frames))
        outs_chunks.append(outs)
        i += c

    est_path = [np.zeros(2)]
    gt_path = [gt_poses[0][[0, 2], 3]]
    scales, stats = [(1.0, 1.0)], [{}]
    i = 1
    for outs in outs_chunks:
        pose_c = np.asarray(outs.pose)
        scale_c = np.asarray(outs.scale)
        na_c = np.asarray(outs.n_assoc)
        ni_c = np.asarray(outs.n_inliers)
        fb_c = np.asarray(outs.fallback)
        he_c = np.asarray(outs.health)
        for j in range(pose_c.shape[0]):
            est_path.append(pose_c[j][[0, 2], 3])
            gt_path.append(gt_poses[i][[0, 2], 3])
            gt_scale = float(
                np.linalg.norm(gt_poses[i][:3, 3] - gt_poses[i - 1][:3, 3])
            )
            scales.append((max(gt_scale, 1e-9), max(float(scale_c[j]), 1e-9)))
            stats.append(
                {
                    "n_assoc": int(na_c[j]),
                    "n_inliers": int(ni_c[j]),
                    "scale": float(scale_c[j]),
                    "fallback": bool(fb_c[j]),
                    "health": int(he_c[j]),
                }
            )
            i += 1

    return (
        np.asarray(est_path),
        np.asarray(gt_path),
        np.asarray(scales),
        stats,
    )
