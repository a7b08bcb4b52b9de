"""geometry/pnp.py + the BA landmark-prior machinery (schur point_prior_w,
window lmap) — the cross-window map features measured in BA_ANALYSIS.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vo_tpu.ba.schur import BAConfig, bundle_adjust
from vo_tpu.ba.window import WindowConfig, WindowState, run_window_ba
from vo_tpu.geometry.pnp import pnp_refine
from vo_tpu.geometry.se3 import exp_so3

K = jnp.asarray(
    [[700.0, 0.0, 320.0], [0.0, 700.0, 240.0], [0.0, 0.0, 1.0]]
)


def _scene(rng, L=200):
    X = np.stack(
        [
            rng.uniform(-10, 10, L),
            rng.uniform(-5, 5, L),
            rng.uniform(8, 40, L),
        ],
        axis=1,
    ).astype(np.float32)
    return X


def _project(T_wc, X):
    p = X @ np.asarray(T_wc)[:3, :3].T + np.asarray(T_wc)[:3, 3]
    return (
        p[:, :2] / p[:, 2:3] * np.array([700.0, 700.0])
        + np.array([320.0, 240.0])
    ).astype(np.float32)


def _se3(aa, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(exp_so3(jnp.asarray(aa, jnp.float32)))
    T[:3, 3] = t
    return T


def test_pnp_recovers_pose():
    rng = np.random.default_rng(3)
    X = _scene(rng)
    T_true = _se3([0.02, -0.03, 0.01], [0.3, -0.1, 0.5])
    obs = _project(T_true, X) + rng.normal(0, 0.3, (len(X), 2))
    T_init = _se3([0.05, 0.0, -0.02], [0.0, 0.2, 0.0])  # off by a lot
    res = pnp_refine(
        jnp.asarray(X), jnp.asarray(obs, jnp.float32),
        jnp.ones(len(X), bool), K, jnp.asarray(T_init),
    )
    assert bool(res.ok)
    R = np.asarray(exp_so3(res.pose6[:3]))
    dt = np.linalg.norm(np.asarray(res.pose6[3:]) - T_true[:3, 3])
    dR = np.degrees(
        np.arccos(np.clip((np.trace(R @ T_true[:3, :3].T) - 1) / 2, -1, 1))
    )
    assert dt < 0.02 and dR < 0.05, (dt, dR)
    assert float(res.rmse) < 1.0


def test_pnp_rejects_underconstrained():
    rng = np.random.default_rng(4)
    X = _scene(rng)
    T_true = _se3([0, 0, 0], [0, 0, 0])
    obs = _project(T_true, X)
    valid = np.zeros(len(X), bool)
    valid[:5] = True  # below min_inliers
    res = pnp_refine(
        jnp.asarray(X), jnp.asarray(obs, jnp.float32),
        jnp.asarray(valid), K, jnp.asarray(T_true),
    )
    assert not bool(res.ok)


def _window_problem(rng, W=5, L=150, noise_px=0.3):
    X = _scene(rng, L)
    poses6 = []
    obs = []
    for w in range(W):
        T = _se3(
            rng.normal(0, 0.002, 3), [0.05 * w, 0.0, 0.9 * w]
        )
        poses6.append(
            np.concatenate(
                [
                    np.asarray(
                        jnp.asarray(rng.normal(0, 0.002, 3), jnp.float32)
                    ),
                    T[:3, 3],
                ]
            )
        )
        obs.append(_project(T, X) + rng.normal(0, noise_px, (L, 2)))
    return (
        jnp.asarray(np.stack(poses6), jnp.float32),
        jnp.asarray(X),
        jnp.asarray(np.stack(obs), jnp.float32),
    )


def test_point_prior_pins_landmarks():
    rng = np.random.default_rng(5)
    poses, X, obs = _window_problem(rng)
    W, L = obs.shape[:2]
    mask = jnp.ones((W, L), bool)
    pmask = jnp.ones((L,), bool)
    free = bundle_adjust(
        poses, X, obs, mask, pmask, K, config=BAConfig(max_iters=8)
    )
    pinned = bundle_adjust(
        poses, X, obs, mask, pmask, K, config=BAConfig(max_iters=8),
        point_prior_w=jnp.full((L,), 1e4),
    )
    move_free = float(jnp.abs(free.points - X).max())
    move_pinned = float(jnp.abs(pinned.points - X).max())
    assert move_pinned < 1e-3
    assert move_free > 10 * max(move_pinned, 1e-9)
    # prior adds cost terms but must not break convergence
    assert float(pinned.cost) <= float(pinned.cost0)


def test_run_window_ba_lmap_roundtrip():
    rng = np.random.default_rng(6)
    W, Kcap = 5, 300
    X = _scene(rng, Kcap)
    poses44, obs = [], []
    for w in range(W):
        T = _se3([0, 0, 0], [0.0, 0.0, 1.0 * w])
        poses44.append(np.linalg.inv(T))  # cam->world
        obs.append(_project(T, X))
    st = WindowState(
        poses=jnp.asarray(np.stack(poses44), jnp.float32),
        obs=jnp.asarray(np.stack(obs), jnp.float32),
        valid=jnp.ones((W, Kcap), bool),
        count=jnp.asarray(W, jnp.int32),
    )
    map_X = jnp.asarray(X) + 0.01
    map_ok = jnp.ones((Kcap,), bool).at[: Kcap // 2].set(False)
    out = run_window_ba(
        st, K, WindowConfig(), lmap=(map_X, map_ok)
    )
    assert len(out) == 4
    new_poses, pose_ok, info, (nmX, nmok) = out
    assert nmX.shape == (Kcap, 3) and nmok.shape == (Kcap,)
    assert int(info["ba_landmarks"]) > 100
    assert "ba_reused" in info
