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
