"""Windowed bundle adjustment: Levenberg-Marquardt with an explicit Schur
complement, fully batched for the MXU.

TPU re-design of the reference's Ceres solve (with_bundle_adjustment.cpp:
ReprojectionError :27-68, problem assembly :616-669, SPARSE_SCHUR options
:672-679). Instead of a sparse general-purpose solver we exploit the exact
bipartite structure of windowed BA:

- residual r_{w,l} = project(K, R(aa_w) X_l + t_w) - obs_{w,l}, Huber(1.0)
  via IRLS sqrt-weights (Ceres HuberLoss, with_bundle_adjustment.cpp:661);
- per-observation Jacobians (2x6 pose, 2x3 point) by forward-mode autodiff
  of the scalar residual, vmapped over the dense (W, L) observation grid —
  JAX autodiff replaces Ceres AutoDiffCostFunction;
- normal equations in Schur form: U (W,6,6), V (L,3,3), W_{w,l} (6,3);
  landmarks are marginalized with batched 3x3 inverses and the reduced
  camera system S (6W x 6W, W=window<=8) is solved densely — the moral
  equivalent of SPARSE_SCHUR for this problem size;
- LM trust region as a fixed-iteration lax.scan with accept/reject masking
  (no data-dependent Python control flow).

Distribution: every landmark-axis reduction funnels through `_lsum`, which
applies `lax.psum(axis_name)` when given — so the identical code runs
landmark-sharded under shard_map (vo_tpu.parallel.ba) with the reduced
camera system replicated, exactly the "distributed Schur" design of
SURVEY.md §2e.

Convention: `poses` here are **world->cam** angle-axis+translation 6-vectors
(the reference also optimizes the inverted poses, with_bundle_adjustment.cpp
:596-600, :713).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry.linalg3 import inv3x3
from ..geometry.se3 import exp_so3


class BAConfig(NamedTuple):
    max_iters: int = 20
    huber_delta: float = 1.0  # px (with_bundle_adjustment.cpp:661)
    lambda_init: float = 1e-3
    lambda_up: float = 10.0
    lambda_down: float = 0.5
    # LM damping floor: along the (near-flat) monocular gauge direction
    # the step is ~ gradient_noise / lambda, so letting lambda decay to
    # 1e-8 amplifies fp32 cancellation noise in the Schur reduction into
    # large null-space drift (measured, scripts/ba_diag.py). 1e-4 keeps
    # the step bounded without slowing real convergence.
    lambda_min: float = 1e-4
    gauge_fix_first: bool = True  # first pose constant (:669)
    # Monocular BA has a 7th gauge freedom the reference leaves loose
    # (Ceres wanders little because of its trust region; our fp32 Schur
    # solve would drift along the scale null-space): soft prior pinning
    # a scale observable to its initial value. sqrt-weight in
    # pixel-residual units.
    scale_gauge_weight: float = 100.0
    # What the prior pins (measured, scripts/ba_diag.py): "traj_len"
    # pins the TOTAL window path length — the per-segment scale noises
    # average out, so the window's global scale is the best available —
    # while relative segment corrections stay free. "baseline0" pins
    # only the frame-0/1 distance: it leaves more freedom but transfers
    # segment-0's full scale noise onto the whole window (measured ~2x
    # worse unaligned center error). Round 2's "BA moves ATE ~1%" was
    # NOT this prior: it was wild-depth outlier landmarks putting a
    # floor under the cost (see ba/window.py build_landmarks gates).
    scale_gauge_mode: str = "traj_len"


class BAResult(NamedTuple):
    poses: jnp.ndarray  # (W, 6) world->cam [aa | t]
    points: jnp.ndarray  # (L, 3)
    cost0: jnp.ndarray  # () initial robust cost
    cost: jnp.ndarray  # () final robust cost
    n_obs: jnp.ndarray  # () number of active observations


def _residual(pose6, X, obs, K):
    """One reprojection residual (2,) — ReprojectionError semantics
    (with_bundle_adjustment.cpp:34-56): p = R(aa) X + t, pinhole K."""
    R = exp_so3(pose6[:3])
    p = R @ X + pose6[3:]
    z = jnp.where(jnp.abs(p[2]) > 1e-9, p[2], 1e-9)
    u = K[0, 0] * p[0] / z + K[0, 2]
    v = K[1, 1] * p[1] / z + K[1, 2]
    return jnp.stack([u - obs[0], v - obs[1]])


def _res_and_jac(poses, points, obs, K):
    """Residuals + Jacobians over the dense (W, L) grid.

    Returns r (W,L,2), Jc (W,L,2,6), Jp (W,L,2,3).

    Analytic: a vmapped jacfwd of the scalar residual re-derives the
    Rodrigues map (sin/cos/norm dual numbers) for every (pose, landmark)
    PAIR — measured 12 ms per LM iteration. Here R and dR/d(aa) are
    computed once per POSE and the per-observation chain rule is three
    dense einsums."""
    aa = poses[:, :3]
    t = poses[:, 3:]
    R = jax.vmap(exp_so3)(aa)  # (W, 3, 3)
    dR = jax.vmap(jax.jacfwd(exp_so3))(aa)  # (W, 3, 3, 3): dR[w,a,b,k]

    p = jnp.einsum("wab,lb->wla", R, points) + t[:, None, :]  # (W, L, 3)
    z = p[..., 2]
    z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    fx, fy = K[0, 0], K[1, 1]
    u = fx * p[..., 0] / z + K[0, 2]
    v = fy * p[..., 1] / z + K[1, 2]
    r = jnp.stack([u - obs[..., 0], v - obs[..., 1]], axis=-1)  # (W, L, 2)

    # d(residual)/d(p): A (W, L, 2, 3)
    zero = jnp.zeros_like(z)
    inv_z = 1.0 / z
    A = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * p[..., 0] * inv_z * inv_z], -1),
            jnp.stack([zero, fy * inv_z, -fy * p[..., 1] * inv_z * inv_z], -1),
        ],
        axis=-2,
    )

    dp_daa = jnp.einsum("wabk,lb->wlak", dR, points)  # (W, L, 3, 3)
    Jc_aa = jnp.einsum("wlra,wlak->wlrk", A, dp_daa)  # (W, L, 2, 3)
    Jc = jnp.concatenate([Jc_aa, A], axis=-1)  # dp/dt = I -> A block
    Jp = jnp.einsum("wlra,wab->wlrb", A, R)  # (W, L, 2, 3)
    return r, Jc, Jp


def _huber_sqrt_weight(r2, delta):
    """IRLS sqrt-weight for Huber on squared residual norm r2."""
    rn = jnp.sqrt(jnp.maximum(r2, 1e-18))
    return jnp.where(rn <= delta, 1.0, jnp.sqrt(delta / rn))


def _robust_cost(r2, mask, delta):
    """Sum of Huber rho(||r||) over active observations (Ceres rho:
    r2 if ||r||<=d else 2 d ||r|| - d^2)."""
    rn = jnp.sqrt(jnp.maximum(r2, 1e-18))
    rho = jnp.where(rn <= delta, r2, 2.0 * delta * rn - delta * delta)
    return jnp.sum(jnp.where(mask, rho, 0.0))


def _lsum(x, axis_name):
    """Sum a landmark-axis reduction across shards (identity single-chip)."""
    return lax.psum(x, axis_name) if axis_name is not None else x


def bundle_adjust(
    poses: jnp.ndarray,
    points: jnp.ndarray,
    obs: jnp.ndarray,
    obs_mask: jnp.ndarray,
    point_mask: jnp.ndarray,
    K: jnp.ndarray,
    config: BAConfig = BAConfig(),
    axis_name: str | None = None,
    return_trace: bool = False,
    point_prior_w: jnp.ndarray | None = None,
) -> BAResult:
    """Joint pose+structure refinement on a fixed window.

    Args:
      poses: (W, 6) world->cam [angle-axis | translation].
      points: (L, 3) world points (L may be a shard when axis_name is set).
      obs: (W, L, 2) pixel observations.
      obs_mask: (W, L) bool — observation (w, l) participates.
      point_mask: (L,) bool — landmark is real (padding rows excluded).
      K: (3, 3) intrinsics.
      axis_name: mesh axis over which the landmark dimension is sharded;
        camera-side accumulations are psum'd so every shard holds the same
        replicated pose update.
      point_prior_w: optional (L,) per-landmark prior weight. Landmarks
        with w > 0 get a residual w * (X - X_init) (3 rows, px-cost
        units): the cross-window landmark-reuse anchor (ba/window.py
        map reuse) — re-observed map points pin the window's scale and
        heading to the previous solve, which plain fresh-triangulation
        windowed BA cannot observe. Purely landmark-diagonal, so it adds
        only to V/gp and the Schur structure is unchanged.
    """
    W = poses.shape[0]
    mask = obs_mask & point_mask[None, :]
    # Hard-zero every masked-out landmark row: garbage coordinates (huge
    # or non-finite triangulations) overflow the Jacobian products to
    # inf, and 0 * inf = NaN survives the sqrt-weight masking and poisons
    # the whole normal-equation system (every LM step rejected).
    points = jnp.where(
        point_mask[:, None] & jnp.isfinite(points), points, 0.0
    )
    X_anchor = points  # prior center = entry estimate (map position)
    pw2 = (
        None
        if point_prior_w is None
        else jnp.where(point_mask, point_prior_w, 0.0) ** 2  # (L,)
    )
    free = jnp.ones((W,), poses.dtype)
    if config.gauge_fix_first:
        free = free.at[0].set(0.0)

    # Scale-gauge prior (see BAConfig.scale_gauge_mode): pin a scale
    # observable to its initial value so the fp32 Schur solve cannot
    # drift along the monocular scale null-space.
    def cam_center(p6):
        return -(exp_so3(p6[:3]).T @ p6[3:])

    def gauge_obs(poses_):
        c = jax.vmap(cam_center)(poses_)  # (W, 3)
        d = jnp.linalg.norm(c[1:] - c[:-1] + 1e-12, axis=-1)
        if config.scale_gauge_mode == "baseline0":
            return d[0]
        return jnp.sum(d)

    d_target = gauge_obs(poses)

    def scale_residual(poses_):
        return config.scale_gauge_weight * (gauge_obs(poses_) - d_target)

    def normal_eqs(poses_, points_):
        r, Jc, Jp = _res_and_jac(poses_, points_, obs, K)
        r2 = jnp.sum(r * r, axis=-1)  # (W, L)
        sw = _huber_sqrt_weight(r2, config.huber_delta)
        sw = jnp.where(mask, sw, 0.0)[..., None]
        rw = r * sw
        Jcw = Jc * sw[..., None] * free[:, None, None, None]
        Jpw = Jp * sw[..., None]

        U = jnp.einsum("wlri,wlrj->wij", Jcw, Jcw)  # (W,6,6) local
        V = jnp.einsum("wlri,wlrj->lij", Jpw, Jpw)  # (L,3,3)
        Wm = jnp.einsum("wlri,wlrj->wlij", Jcw, Jpw)  # (W,L,6,3)
        gc = -jnp.einsum("wlri,wlr->wi", Jcw, rw)  # (W,6) local
        gp = -jnp.einsum("wlri,wlr->li", Jpw, rw)  # (L,3)
        cost = _lsum(_robust_cost(r2, mask, config.huber_delta), axis_name)
        if pw2 is not None:
            # landmark-reuse prior: w^2 I on V, pull toward the anchor.
            dX = points_ - X_anchor
            V = V + pw2[:, None, None] * jnp.eye(3, dtype=V.dtype)
            gp = gp - pw2[:, None] * dX
            cost = cost + _lsum(
                jnp.sum(pw2 * jnp.sum(dX * dX, -1)), axis_name
            )
        # Prior terms are functions of the (replicated) poses only — added
        # once, after the landmark-shard reduction.
        rs = scale_residual(poses_)
        cost = cost + rs * rs
        return U, V, Wm, gc, gp, cost

    def prior_blocks(poses_):
        """Scale-gauge prior as a rank-1 update to the full (6W,) camera
        system: returns (J (6W,), r scalar)."""
        rs = scale_residual(poses_)
        Js = jax.jacfwd(scale_residual)(poses_).reshape(-1)  # (6W,)
        return Js, rs

    def solve(poses_, U, V, Wm, gc, gp, lam):
        # Marquardt damping: lam * diag(H) (+ tiny identity floor), like
        # Ceres' scaled Levenberg flavor. Identity damping stalls here:
        # far landmarks have tiny depth-direction Hessian diagonals
        # (J ~ fx/z^2), so lam*I swamps exactly the updates BA needs to
        # make — measured as a linear cost creep to a false floor
        # (scripts/ba_diag.py).
        eye6 = jnp.eye(6, dtype=U.dtype)
        eye3 = jnp.eye(3, dtype=V.dtype)
        Usum = _lsum(U, axis_name)
        du = eye6 * jnp.diagonal(Usum, axis1=-2, axis2=-1)[..., None, :]
        Ud = Usum + lam * du + (lam * 1e-6) * eye6
        # Padding landmarks get an identity V so the batched inverse is
        # well-posed; their gp is zero so their update is zero.
        pm = point_mask[:, None, None]
        dv = eye3 * jnp.diagonal(V, axis1=-2, axis2=-1)[..., None, :]
        Vd = jnp.where(pm, V + lam * dv + (lam * 1e-6) * eye3, eye3)
        # closed-form batched inverse: jnp.linalg.inv lowers to a slow
        # serialized custom call for thousands of 3x3 blocks
        Vinv = inv3x3(Vd)  # (L,3,3) — local to shard
        Y = jnp.einsum("wlij,ljk->wlik", Wm, Vinv)  # (W,L,6,3)

        # Reduced camera system S (W,W,6,6), rhs (W,6): landmark sums are
        # psum'd across shards -> replicated small dense system.
        S_off = _lsum(jnp.einsum("wlik,vljk->wvij", Y, Wm), axis_name)
        S = -S_off
        S = S + jnp.einsum("wv,wij->wvij", jnp.eye(W, dtype=U.dtype), Ud)
        rhs = gc - jnp.einsum("wlik,lk->wi", Y, gp)
        rhs = _lsum(rhs, axis_name)

        # Gauge fixing: zero out the fixed pose's rows/cols, identity diag.
        fm = free[:, None] * jnp.ones((1, 6), U.dtype)  # (W,6)
        Sd = S.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
        f = fm.reshape(-1)
        Sd = Sd * f[:, None] * f[None, :] + jnp.diag(1.0 - f)
        rhsd = rhs.reshape(-1) * f

        # Scale-gauge prior: rank-1 update on the reduced camera system
        # (replicated — poses are identical on every shard).
        Js, rs = prior_blocks(poses_)
        Jf = Js * f
        Sd = Sd + jnp.outer(Jf, Jf)
        rhsd = rhsd - Jf * rs

        dc = jnp.linalg.solve(Sd, rhsd).reshape(W, 6)
        dp = jnp.einsum(
            "lij,lj->li",
            Vinv,
            gp - jnp.einsum("wlij,wi->lj", Wm, dc),
        )
        dp = jnp.where(point_mask[:, None], dp, 0.0)
        return dc, dp

    U0, V0, W0, gc0, gp0, cost0 = normal_eqs(poses, points)

    def lm_step(carry, _):
        poses_, points_, lam, cost_, U, V, Wm, gc, gp = carry
        dc, dp = solve(poses_, U, V, Wm, gc, gp, lam)
        cand_poses = poses_ + dc
        cand_points = points_ + dp
        Un, Vn, Wn, gcn, gpn, cand_cost = normal_eqs(cand_poses, cand_points)
        accept = cand_cost < cost_
        sel = lambda a, b: jnp.where(accept, a, b)
        carry = (
            sel(cand_poses, poses_),
            sel(cand_points, points_),
            jnp.clip(
                jnp.where(
                    accept, lam * config.lambda_down, lam * config.lambda_up
                ),
                config.lambda_min,
                1e8,
            ),
            sel(cand_cost, cost_),
            sel(Un, U), sel(Vn, V), sel(Wn, Wm),
            sel(gcn, gc), sel(gpn, gp),
        )
        return carry, (accept, lam, cand_cost)

    init = (
        poses, points,
        jnp.asarray(config.lambda_init, poses.dtype), cost0,
        U0, V0, W0, gc0, gp0,
    )
    (poses_f, points_f, _, cost_f, *_), trace = lax.scan(
        lm_step, init, None, length=config.max_iters
    )

    res = BAResult(
        poses=poses_f,
        points=points_f,
        cost0=cost0,
        cost=cost_f,
        n_obs=_lsum(jnp.sum(mask), axis_name),
    )
    return (res, trace) if return_trace else res


def reprojection_rmse(poses, points, obs, obs_mask, point_mask, K):
    """Unrobust RMSE in pixels over active observations (diagnostic)."""
    r, _, _ = _res_and_jac(poses, points, obs, K)
    m = (obs_mask & point_mask[None, :])[..., None]
    n = jnp.maximum(jnp.sum(m) , 1)
    return jnp.sqrt(jnp.sum(jnp.where(m, r * r, 0.0)) / n)
