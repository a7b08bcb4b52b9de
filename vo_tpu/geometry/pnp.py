"""Batched PnP pose refinement against a landmark map.

The BA pipeline's map-tracking mode (ba/window.py map reuse +
models/vo_ba.py) localizes every frame against the window-BA-refined
landmarks: a Gauss-Newton solve of the 6-dof world->cam pose over all
visible map points. This is the piece that makes windowed BA pay off on
trajectory metrics: pairwise chaining accumulates per-step scale noise
(the dominant ATE term — scripts/ba_win_diag.py decompose) and window
BA alone cannot observe it, while localization against persistent
structure pins both the scale and the heading of every step to the
refined map. The reference has no equivalent (its BA re-triangulates
fresh per window, with_bundle_adjustment.cpp:502-575).

TPU shape: the residual/Jacobian grid is one dense (L, 2) block — the
same einsum pattern as ba/schur.py's camera blocks with W=1 — and the
iteration is a fixed-length lax.scan over 6x6 normal-equation solves.
No data-dependent control flow, no custom calls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .se3 import exp_so3, log_so3


class PnPResult(NamedTuple):
    pose6: jnp.ndarray  # (6,) world->cam [angle-axis | translation]
    n_inliers: jnp.ndarray  # () int32 — residual < inlier_px at the end
    ok: jnp.ndarray  # () bool — enough inliers to trust the refinement
    rmse: jnp.ndarray  # () final robust-weighted rmse (px)


def _res_jac(pose6, X, obs, K):
    """r (L,2), J (L,2,6) for r = project(K, R X + t) - obs."""
    aa, t = pose6[:3], pose6[3:]
    R = exp_so3(aa)
    dR = jax.jacfwd(exp_so3)(aa)  # (3, 3, 3): dR[a,b,k]
    p = X @ R.T + t  # (L, 3)
    z = jnp.where(jnp.abs(p[:, 2]) > 1e-9, p[:, 2], 1e-9)
    fx, fy = K[0, 0], K[1, 1]
    u = fx * p[:, 0] / z + K[0, 2]
    v = fy * p[:, 1] / z + K[1, 2]
    r = jnp.stack([u - obs[:, 0], v - obs[:, 1]], axis=-1)
    inv_z = 1.0 / z
    zero = jnp.zeros_like(z)
    A = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * p[:, 0] * inv_z * inv_z], -1),
            jnp.stack([zero, fy * inv_z, -fy * p[:, 1] * inv_z * inv_z], -1),
        ],
        axis=-2,
    )  # (L, 2, 3)
    dp_daa = jnp.einsum("abk,lb->lak", dR, X)  # (L, 3, 3)
    J_aa = jnp.einsum("lra,lak->lrk", A, dp_daa)
    J = jnp.concatenate([J_aa, A], axis=-1)  # (L, 2, 6)
    return r, J


def pnp_refine(
    X: jnp.ndarray,
    obs: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    T_wc_init: jnp.ndarray,
    iters: int = 8,
    huber_px: float = 2.0,
    inlier_px: float = 4.0,
    min_inliers: int = 30,
    damping: float = 1e-6,
) -> PnPResult:
    """Refine a world->cam pose (4, 4) against map landmarks.

    Args:
      X: (L, 3) world landmark positions.
      obs: (L, 2) pixel observations in the current frame.
      valid: (L,) bool — landmark usable (mapped AND tracked this frame).
      K: (3, 3) intrinsics.
      T_wc_init: (4, 4) world->cam initialization (the chained estimate).

    Gauss-Newton with IRLS Huber weights; masked landmarks contribute
    zero rows. Damped 6x6 solve; fixed `iters` (lax.scan)."""
    pose0 = jnp.concatenate(
        [log_so3(T_wc_init[:3, :3]), T_wc_init[:3, 3]]
    )
    Xs = jnp.where(valid[:, None], X, 0.0)
    obs_s = jnp.where(valid[:, None], obs, 0.0)

    def step(pose6, _):
        r, J = _res_jac(pose6, Xs, obs_s, K)
        r2 = jnp.sum(r * r, axis=-1)
        rn = jnp.sqrt(jnp.maximum(r2, 1e-18))
        w = jnp.where(rn <= huber_px, 1.0, huber_px / rn)
        w = jnp.where(valid, w, 0.0)[:, None]
        Jw = J * w[..., None]
        rw = r * w
        H = jnp.einsum("lri,lrj->ij", Jw, J)
        g = jnp.einsum("lri,lr->i", Jw, r)
        H = H + damping * jnp.eye(6, dtype=H.dtype) * (
            1.0 + jnp.diagonal(H)
        )
        delta = jnp.linalg.solve(H, -g)
        # guard: a divergent solve (near-singular H) must not yank the
        # pose — cap the update like the BA accept gates do
        okstep = (
            jnp.all(jnp.isfinite(delta))
            & (jnp.linalg.norm(delta[:3]) < 0.5)
            & (jnp.linalg.norm(delta[3:]) < 10.0)
        )
        pose6 = jnp.where(okstep, pose6 + delta, pose6)
        return pose6, jnp.sum(jnp.where(valid[:, None], rw * rw, 0.0))

    pose6, _ = lax.scan(step, pose0, None, length=iters)
    r, _ = _res_jac(pose6, Xs, obs_s, K)
    r2 = jnp.sum(r * r, axis=-1)
    inl = valid & (r2 < inlier_px**2)
    n_inl = jnp.sum(inl)
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(inl, r2, 0.0)) / jnp.maximum(n_inl, 1)
    )
    return PnPResult(
        pose6=pose6,
        n_inliers=n_inl.astype(jnp.int32),
        ok=n_inl >= min_inliers,
        rmse=rmse,
    )
