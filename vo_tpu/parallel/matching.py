"""Multi-chip descriptor matching: shard queries, all_gather train.

SURVEY.md §2e "keypoint-set sharding": each chip holds a shard of the query
keypoints, all_gathers the train descriptors over ICI (256-bit descriptors
= 32 B/kp, so a 4k-keypoint train set is 128 KiB — one cheap collective),
computes its (n1/d, N2) Hamming/L2 block on the local MXU, and finishes
knn2+ratio rows locally. Results stay query-sharded; no reduction needed
because each query row is complete. Exact — unlike the reference's FLANN
approximations (feature_matching.cpp:27-35).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.hamming import Matches, hamming_table, knn2_ratio_match, l2_table


def _match_block(bits1, valid1, bits2, valid2, ratio, axis, binary):
    """Per-shard body: local queries vs gathered train set."""
    bits2_full = lax.all_gather(bits2, axis, tiled=True)
    valid2_full = lax.all_gather(valid2, axis, tiled=True)
    table = (
        hamming_table(bits1, bits2_full)
        if binary
        else l2_table(bits1, bits2_full)
    )
    # l2_table holds squared distances; squared=True keeps the configured
    # ratio in true-Euclidean units (OpenCV FlannBasedMatcher semantics).
    return knn2_ratio_match(table, valid1, valid2_full, ratio, squared=not binary)


def sharded_match_descriptors(
    mesh: Mesh,
    bits1: jnp.ndarray,
    bits2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.8,
    axis: str = "kp",
    binary: bool = True,
) -> Matches:
    """Exact knn2+ratio matching with both keypoint sets sharded over
    `axis`. Shapes must be divisible by the mesh axis size (pad-to-capacity
    arrays already are, by choosing capacity % n_devices == 0 or padding).
    Returns query-sharded Matches (idx into the *global* train set)."""
    spec = P(axis)
    fn = shard_map(
        functools.partial(_match_block, ratio=ratio, axis=axis, binary=binary),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=Matches(idx=spec, dist=spec, valid=spec),
        check_vma=False,
    )
    return fn(bits1, valid1, bits2, valid2)


def pad_to_multiple(arr: jnp.ndarray, mult: int, axis: int = 0):
    """Pad axis 0 with zeros to a multiple of `mult`; returns (arr, n_pad)."""
    n = arr.shape[axis]
    n_pad = (-n) % mult
    if n_pad == 0:
        return arr, 0
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, n_pad)
    return jnp.pad(arr, widths), n_pad
