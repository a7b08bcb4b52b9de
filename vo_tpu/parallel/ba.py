"""Distributed windowed BA: landmark blocks sharded, Schur reduced camera
system psum'd (SURVEY.md §2e "Distributed Schur BA").

Each shard owns L/d landmarks (their 3x3 V blocks, observations, and point
updates stay fully local); only the tiny reduced camera system (6W x 6W)
and pose gradients cross the interconnect via psum inside
vo_tpu.ba.schur.bundle_adjust(axis_name=...). Every shard then solves the
same replicated dense system — the TPU re-expression of Ceres
SPARSE_SCHUR (with_bundle_adjustment.cpp:673) that scales in the landmark
count.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ba.schur import BAConfig, BAResult, bundle_adjust


def sharded_bundle_adjust(
    mesh: Mesh,
    poses: jnp.ndarray,
    points: jnp.ndarray,
    obs: jnp.ndarray,
    obs_mask: jnp.ndarray,
    point_mask: jnp.ndarray,
    K: jnp.ndarray,
    config: BAConfig = BAConfig(),
    axis: str = "kp",
) -> BAResult:
    """bundle_adjust with the landmark axis sharded over `axis`.

    points/obs/masks shard on their landmark dim (must divide the axis
    size); poses and K are replicated. Returns replicated poses/costs and
    landmark-sharded refined points.
    """
    lm = P(axis)
    rep = P()
    fn = shard_map(
        functools.partial(
            _ba_block, config=config, axis=axis
        ),
        mesh=mesh,
        in_specs=(rep, lm, P(None, axis), P(None, axis), lm, rep),
        out_specs=BAResult(
            poses=rep, points=lm, cost0=rep, cost=rep, n_obs=rep
        ),
        check_vma=False,
    )
    return fn(poses, points, obs, obs_mask, point_mask, K)


def _ba_block(poses, points, obs, obs_mask, point_mask, K, config, axis):
    return bundle_adjust(
        poses, points, obs, obs_mask, point_mask, K,
        config=config, axis_name=axis,
    )


def sharded_window_ba(
    mesh: Mesh,
    st,
    K: jnp.ndarray,
    cfg,
    lmap=None,
    axis: str = "kp",
):
    """The FULL vo_ba window step (ba/window.py run_window_ba — landmark
    build + gates + holdout adaptive accept + optional map reuse + Schur
    solve + per-pose accept) with the landmark slot axis sharded.

    Everything per-landmark (triangulation, gating, V-block inverses,
    point updates, map state) stays shard-local; only scalar gate
    reductions, the holdout costs, and the reduced 6Wx6W camera system
    cross the mesh (psum via schur._lsum / run_window_ba(axis_name=...)).
    The holdout selection uses GLOBAL slot indices, so results match the
    single-device window bit-for-bit up to reduction reassociation.

    `st` is a ba/window.py WindowState whose capacity divides the axis
    size; `lmap` the optional (map_X (K,3), map_ok (K,)) pair."""
    from ..ba.window import WindowConfig, WindowState, run_window_ba

    assert isinstance(cfg, WindowConfig)
    lm, rep = P(axis), P()
    in_specs = [
        WindowState(poses=rep, obs=P(None, axis), valid=P(None, axis),
                    count=rep),
        rep,
    ]
    out_specs = [rep, rep, {
        "ba_ran": rep, "ba_cost0": rep, "ba_cost": rep,
        "ba_landmarks": rep, "ba_accepted": rep,
        "ba_holdout_cost0": rep, "ba_holdout_cost": rep,
        "ba_holdout_n": rep,
    }]
    args = [st, K]
    if lmap is not None:
        in_specs.append((lm, lm))
        out_specs[2] = dict(out_specs[2], ba_reused=rep)
        out_specs.append((lm, lm))
        args.append(lmap)

    def block(st_, K_, *rest):
        return run_window_ba(
            st_, K_, cfg, axis_name=axis,
            lmap=rest[0] if rest else None,
        )

    fn = shard_map(
        block, mesh=mesh,
        in_specs=tuple(in_specs), out_specs=tuple(out_specs),
        check_vma=False,
    )
    return fn(*args)
