"""Diagnose the BA accuracy gap (VERDICT round-2 item 2).

Controlled experiment on CPU: a synthetic 5-frame window with exact GT
poses/landmarks, initialization perturbed the way the VO pipeline's
chained estimates actually err (per-segment scale noise + small rotation
noise), then bundle_adjust under different gauge configurations.
Measures how much of the injected pose error BA removes.

Usage: python scripts/ba_diag.py
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import vo_tpu  # noqa: F401
from vo_tpu.ba.schur import BAConfig, bundle_adjust
from vo_tpu.geometry.se3 import exp_so3


def make_window(seed=0, W=5, L=400, scale_noise=0.05, rot_noise=0.002,
                px_noise=0.3):
    rng = np.random.default_rng(seed)
    K = np.array([[700.0, 0, 600], [0, 700.0, 180], [0, 0, 1.0]], np.float32)
    # GT: forward motion with slight yaw, ~1 m/frame
    gt_c2w = np.tile(np.eye(4), (W, 1, 1))
    pos = np.zeros(3)
    yaw = 0.0
    for i in range(W):
        yaw += 0.01
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        gt_c2w[i, :3, :3] = R
        gt_c2w[i, :3, 3] = pos
        pos = pos + R @ np.array([0, 0, 1.0])
    # landmarks in front of the window
    X = np.stack([
        rng.uniform(-30, 30, L),
        rng.uniform(-5, 3, L),
        rng.uniform(5, 80, L),
    ], 1)
    # observations
    obs = np.zeros((W, L, 2), np.float32)
    mask = np.zeros((W, L), bool)
    for w in range(W):
        w2c = np.linalg.inv(gt_c2w[w])
        pc = X @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        u = K[0, 0] * pc[:, 0] / z + K[0, 2]
        v = K[1, 1] * pc[:, 1] / z + K[1, 2]
        ok = (z > 1) & (u > 0) & (u < 1200) & (v > 0) & (v < 370)
        obs[w, :, 0] = u + rng.normal(0, px_noise, L)
        obs[w, :, 1] = v + rng.normal(0, px_noise, L)
        mask[w] = ok
    # perturbed init: chain with per-segment scale errors + rot noise
    est_c2w = np.tile(np.eye(4), (W, 1, 1))
    for i in range(1, W):
        T = np.linalg.inv(gt_c2w[i - 1]) @ gt_c2w[i]  # relative
        s = 1.0 + rng.normal(0, scale_noise)
        T = T.copy()
        T[:3, 3] *= s
        dr = rng.normal(0, rot_noise, 3)
        th = np.linalg.norm(dr)
        if th > 0:
            k = dr / th
            Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                           [-k[1], k[0], 0]])
            dR = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
            T[:3, :3] = T[:3, :3] @ dR
        est_c2w[i] = est_c2w[i - 1] @ T
    return K, gt_c2w, est_c2w, X, obs, mask


def pose6_of(c2w):
    from vo_tpu.geometry.se3 import log_so3
    w2c = np.linalg.inv(c2w)
    aa = np.asarray(jax.vmap(log_so3)(jnp.asarray(w2c[:, :3, :3], jnp.float32)))
    return np.concatenate([aa, w2c[:, :3, 3]], 1).astype(np.float32)


def center_err(pose6, gt_c2w):
    R = np.asarray(jax.vmap(exp_so3)(jnp.asarray(pose6[:, :3])))
    c = -np.einsum("wij,wi->wj", R, pose6[:, 3:])
    return np.linalg.norm(c - gt_c2w[:, :3, 3], axis=1)


def triangulate_init(K, est_c2w, obs):
    from vo_tpu.geometry.triangulate import triangulate_dlt
    T0 = np.linalg.inv(est_c2w[0])
    T1 = np.linalg.inv(est_c2w[1])
    P0 = K @ T0[:3]
    P1 = K @ T1[:3]
    return np.asarray(triangulate_dlt(
        jnp.asarray(P0, jnp.float32), jnp.asarray(P1, jnp.float32),
        jnp.asarray(obs[0]), jnp.asarray(obs[1])))


def centers_of(pose6):
    R = np.asarray(jax.vmap(exp_so3)(jnp.asarray(pose6[:, :3])))
    return -np.einsum("wij,wi->wj", R, pose6[:, 3:])


def aligned_err(pose6, gt_c2w):
    """Center error after the optimal uniform rescale about camera 0 —
    separates gauge (global scale) drift from real geometric error."""
    c = centers_of(pose6)
    g = gt_c2w[:, :3, 3]
    dc, dg = c - c[0], g - g[0]
    s = np.sum(dc * dg) / max(np.sum(dc * dc), 1e-12)
    return np.linalg.norm(c[0] + s * dc - g, axis=1)


def run(cfg_name, cfg, seeds=5, px_noise=0.3):
    from vo_tpu.ba.window import WindowConfig, build_landmarks
    errs0, errs1, a0, a1 = [], [], [], []
    for seed in range(seeds):
        K, gt, est, X, obs, mask = make_window(seed, px_noise=px_noise)
        pose6 = pose6_of(est)
        wcfg = WindowConfig(ba=cfg)
        Xi, pm = build_landmarks(
            jnp.asarray(np.linalg.inv(est), jnp.float32),
            jnp.asarray(obs), jnp.asarray(mask),
            jnp.asarray(K, jnp.float32), wcfg)
        Xi, pm = np.asarray(Xi), np.asarray(pm)
        Xi = np.where(np.isfinite(Xi), Xi, 0.0)  # as run_window_ba does
        res = bundle_adjust(
            jnp.asarray(pose6), jnp.asarray(Xi, jnp.float32),
            jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(pm),
            jnp.asarray(K, jnp.float32), config=cfg,
        )
        e0 = center_err(pose6, gt)
        e1 = center_err(np.asarray(res.poses), gt)
        errs0.append(e0.mean())
        errs1.append(e1.mean())
        a0.append(aligned_err(pose6, gt).mean())
        a1.append(aligned_err(np.asarray(res.poses), gt).mean())
        if seed == 0:
            from vo_tpu.ba.schur import reprojection_rmse
            rm = lambda p, x: float(reprojection_rmse(
                jnp.asarray(p), jnp.asarray(x, jnp.float32),
                jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(pm),
                jnp.asarray(K, jnp.float32)))
            gt6 = pose6_of(gt)
            print(f"  [seed0] cost {float(res.cost0):.0f} -> "
                  f"{float(res.cost):.0f}; rmse init {rm(pose6, Xi):.2f} "
                  f"-> BA {rm(np.asarray(res.poses), np.asarray(res.points)):.2f} "
                  f"px; GT-poses+GT-points rmse {rm(gt6, X):.2f} px; "
                  f"n_obs {int(res.n_obs)}")
    print(f"{cfg_name:42s} init {np.mean(errs0)*100:6.2f} -> "
          f"BA {np.mean(errs1)*100:6.2f} cm ({np.mean(errs1)/np.mean(errs0):5.2f}x)"
          f"   aligned {np.mean(a0)*100:5.2f} -> {np.mean(a1)*100:5.2f} cm")


if __name__ == "__main__":
    run("traj-len prior w=100, lam_min=1e-8 (r2)",
        BAConfig(scale_gauge_mode="traj_len", lambda_min=1e-8))
    run("baseline0 w=100, lam_min=1e-8",
        BAConfig(lambda_min=1e-8))
    run("baseline0 w=100, lam_min=1e-4 (default)", BAConfig())
    run("baseline0 w=100, lam_min=1e-3",
        BAConfig(lambda_min=1e-3))
    run("baseline0 w=1000, lam_min=1e-4",
        BAConfig(scale_gauge_weight=1000.0))
    run("traj-len w=100, lam_min=1e-4",
        BAConfig(scale_gauge_mode="traj_len"))
    run("no prior, lam_min=1e-4",
        BAConfig(scale_gauge_weight=0.0))
