"""Parity: the fused Pallas LK level kernel vs the XLA lanes path.

The kernel runs a fixed-trip iteration loop with per-point convergence
masking (Mosaic cannot legalize data-dependent while loops with vector
carries), so points that converge are bit-identically frozen, while the
slow tail the lanes path freezes at its 96% block early-exit keeps
iterating to its own convergence (cv2's per-point termination). Hence:
endpoints agree to float tolerance for the typical point, the tail is
bounded, and the tracked flow must match the induced ground-truth shift.
Runs in pallas interpret mode on the CPU mesh (the kernel
auto-interprets off-TPU); the same asserts run on real silicon via
scripts/bench_lk_ab.py."""

import numpy as np
import pytest

import jax.numpy as jnp
from vo_tpu.ops.lk import LKConfig, lk_build_pyramid, lk_pyramid_track
from vo_tpu.ops.conv import gaussian_blur


def _dot_scene(rng, H, W, n_dots=160):
    img = rng.uniform(10, 60, (H, W)).astype(np.float32)
    ys = rng.integers(8, H - 8, n_dots)
    xs = rng.integers(8, W - 8, n_dots)
    for y, x in zip(ys, xs):
        img[y - 2 : y + 3, x - 2 : x + 3] += rng.uniform(80, 160)
    return np.asarray(gaussian_blur(jnp.asarray(img), 1.2))


def _shift(img, dx, dy):
    out = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    return out


@pytest.mark.parametrize("precision", ["bf16", "f32"])
def test_pallas_matches_lanes_endpoints(precision):
    rng = np.random.default_rng(7)
    H, W = 240, 320
    img1 = _dot_scene(rng, H, W)
    img2 = _shift(img1, 3, -2)
    N = 128
    pts = np.stack(
        [rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)], axis=1
    ).astype(np.float32)
    valid = np.ones(N, bool)

    out = {}
    for layout in ("lanes", "pallas"):
        cfg = LKConfig(max_level=2, layout=layout, precision=precision)
        pyr1 = lk_build_pyramid(jnp.asarray(img1), cfg)
        pyr2 = lk_build_pyramid(jnp.asarray(img2), cfg)
        p, st = lk_pyramid_track(
            pyr1, pyr2, jnp.asarray(pts), jnp.asarray(valid), cfg
        )
        out[layout] = (np.asarray(p), np.asarray(st))

    p_l, st_l = out["lanes"]
    p_p, st_p = out["pallas"]
    assert (st_l == st_p).mean() > 0.98
    both = st_l & st_p
    assert both.sum() > N // 2
    d = np.abs(p_l[both] - p_p[both]).max(axis=1)
    # converged points freeze identically; the early-exit tail may keep
    # refining in the kernel (never past cv2's own iteration budget)
    assert np.percentile(d, 90) < 1e-2, f"p90 endpoint delta {d.max()}"
    assert d.max() < 0.5, f"max endpoint delta {d.max()}"
    # and the tracked flow is the induced shift for most survivors
    flow = p_p[both] - pts[both]
    err = np.abs(flow - np.array([3.0, -2.0])).max(axis=1)
    assert np.median(err) < 0.25
