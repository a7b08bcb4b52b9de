"""Keypoint-sharded LK tracking: the multi-chip hot path of tracking VO.

BASELINE.json's north star: "descriptor matching shards keypoint sets per
chip" — the same axis shards the LK tracker, whose per-point work
(window crops, tent-matmul refinement) is embarrassingly parallel:

- pts / validity / per-point window caches shard over the "kp" axis;
- the image pyramid is replicated (one frame, ~2.5 MB — broadcast once);
- each chip tracks its keypoint shard independently (zero collectives in
  the loop); the tracked points stay sharded for the keypoint-sharded
  matcher, and the (N, 2) result is small enough to all_gather for the
  replicated RANSAC/pose stage.

Exactness: sharded tracking is the same program per point — results match
the dense lanes tracker bitwise (tests/test_parallel.py). The "pallas"
layout is normalized to "lanes" here (identical storage minus the guard
pad): the fused kernel's per-block early exit cannot psum its counts
across the mesh, and lanes vs pallas endpoint parity is tolerance-bounded
(tests/test_lk_pallas.py), so the sharded path pins the XLA formulation."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.lk import (
    LKCache,
    LKConfig,
    lk_level_geometry,
    lk_make_cache,
    lk_pyramid_track_cached,
)


def _cache_specs_for(n_levels: int, axis: str, config: LKConfig) -> LKCache:
    # lanes layout keeps keypoints on the LAST (lane) dim of each window
    # stack (ops/lk.py LKConfig.layout); origins stay keypoint-major
    win_spec = (
        P(None, None, axis) if config.layout != "batch" else P(axis)
    )
    return LKCache(
        wins=tuple(win_spec for _ in range(n_levels)),
        origins=tuple(P(axis) for _ in range(n_levels)),
    )


def sharded_lk_track(
    mesh: Mesh,
    cache: LKCache,
    pyr2: tuple,
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    config: LKConfig = LKConfig(),
    axis: str = "kp",
):
    """lk_pyramid_track_cached with the keypoint axis sharded over `axis`.

    pts/valid/cache shard on their leading (keypoint) dim — which must
    divide the axis size; pyramids are replicated. Returns sharded
    (new_pts, status, cache2) exactly equal to the dense tracker."""
    kp = P(axis)
    rep = P()
    config = _normalize(config)
    cache_spec = _cache_specs_for(len(cache.wins), axis, config)
    # psum'ed early-exit counts keep sharded iteration schedules identical
    # to the dense tracker's (ops/lk.py LKConfig.axis_name)
    fn = shard_map(
        functools.partial(_track_block, config=config._replace(axis_name=axis)),
        mesh=mesh,
        in_specs=(cache_spec, tuple(rep for _ in pyr2), kp, kp),
        out_specs=(kp, kp, cache_spec),
        check_vma=False,
    )
    return fn(cache, tuple(pyr2), pts, valid)


def _normalize(config: LKConfig) -> LKConfig:
    """Pin the sharded path to the lanes formulation (module docstring)."""
    if config.layout == "pallas":
        return config._replace(layout="lanes")
    return config


def _track_block(cache, pyr2, pts, valid, config):
    return lk_pyramid_track_cached(cache, pyr2, pts, valid, config)


def sharded_lk_make_cache(
    mesh: Mesh,
    pyr: tuple,
    pts: jnp.ndarray,
    config: LKConfig = LKConfig(),
    axis: str = "kp",
) -> LKCache:
    """Keypoint-sharded window cache construction (init / re-detect)."""
    kp = P(axis)
    rep = P()
    config = _normalize(config)
    geo = lk_level_geometry([im.shape for im in pyr], config)
    cache_spec = _cache_specs_for(len(geo), axis, config)
    fn = shard_map(
        functools.partial(_cache_block, config=config),
        mesh=mesh,
        in_specs=(tuple(rep for _ in pyr), kp),
        out_specs=cache_spec,
        check_vma=False,
    )
    return fn(tuple(pyr), pts)


def _cache_block(pyr, pts, config):
    return lk_make_cache(pyr, pts, config)
