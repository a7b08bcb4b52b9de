"""Frame-data-parallel frontend: batched detect/describe over a sharded
frame axis.

Replaces the reference's serial 1000-frame for-loop (feature_tracking.cpp:
53) for throughput workloads: a batch of frames is sharded over the
"frame" mesh axis, each chip runs the fused ORB frontend on its frames
(vmap — no cross-frame communication), and outputs stay frame-sharded for
downstream per-frame-pair matching. This is the scaling path for the
offline/mapping use case; the online VO loop stays latency-oriented on one
chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frontend.orb import OrbConfig, OrbFeatures, orb_detect_and_compute


def batched_orb(
    mesh: Mesh,
    config: OrbConfig = OrbConfig(),
    axis: str = "frame",
):
    """Returns a jitted fn: (B, H, W) frames -> OrbFeatures with leading
    batch dim, sharded over `axis` (B must divide the axis size)."""
    sh = NamedSharding(mesh, P(axis))
    out_sh = NamedSharding(mesh, P(axis))

    fn = jax.jit(
        jax.vmap(functools.partial(orb_detect_and_compute, config=config)),
        in_shardings=(sh,),
        out_shardings=OrbFeatures(
            xs=out_sh, ys=out_sh, scores=out_sh, angles=out_sh,
            bits=out_sh, packed=out_sh, level=out_sh, valid=out_sh,
        ),
    )
    return fn


def batched_pair_match(
    mesh: Mesh,
    ratio: float = 0.8,
    axis: str = "frame",
):
    """Returns a jitted fn matching descriptor batches elementwise:
    (B, K, 256) x2 (+ masks) -> per-pair Matches, frame-sharded. Used to
    associate consecutive frames (b, b+1) after a batched detect by
    passing shifted views."""
    from ..ops.hamming import match_descriptors

    sh = NamedSharding(mesh, P(axis))

    fn = jax.jit(
        jax.vmap(
            functools.partial(match_descriptors, ratio=ratio),
        ),
        in_shardings=(sh, sh, sh, sh),
    )
    return fn
