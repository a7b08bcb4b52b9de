"""Hamming-distance knn matching for binary descriptors.

Replaces the reference's FLANN matchers (KDTree for SIFT, LSH for ORB,
feature_matching.cpp:27-35, feature_tracking.cpp:204) with *exact* brute
force on the MXU: with descriptors as (N, 256) bit planes,

    H(a, b) = popcount(a XOR b) = sum(a) + sum(b) - 2 * a.b

so the full (N1, N2) distance table is one int8 matmul — the formulation
that rides the systolic array instead of a tree walk. knn(k=2) + Lowe ratio
test (0.8, feature_matching.cpp:174-182) are masked reductions over the
table. Sharding of the query axis for multi-chip matching lives in
vo_tpu.parallel.matching.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

BIG = 1e9  # python float: a module-level jnp constant would
# initialize the backend at import time (breaking platform overrides)


class Matches(NamedTuple):
    """Fixed-capacity match set: query i -> train idx[i] where valid."""

    idx: jnp.ndarray  # (N1,) int32 index into train set
    dist: jnp.ndarray  # (N1,) float32 best distance
    valid: jnp.ndarray  # (N1,) bool — passed ratio test & masks

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


@jax.jit
def hamming_table(bits1: jnp.ndarray, bits2: jnp.ndarray) -> jnp.ndarray:
    """(N1, N2) int32 Hamming distances from (N, 256) {0,1} bit planes."""
    a = bits1.astype(jnp.int8)
    b = bits2.astype(jnp.int8)
    dot = lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s1 = jnp.sum(a.astype(jnp.int32), axis=1)
    s2 = jnp.sum(b.astype(jnp.int32), axis=1)
    return s1[:, None] + s2[None, :] - 2 * dot


@functools.partial(jax.jit, static_argnames=("squared",))
def knn2_ratio_match(
    table: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.8,
    squared: bool = False,
) -> Matches:
    """knn(k=2) + ratio test over a distance table with validity masks.

    `squared=True` marks the table as holding SQUARED distances (the
    l2_table path): the ratio is then applied as ratio**2 so the gate
    matches OpenCV's FlannBasedMatcher, which ratio-tests true Euclidean
    distances (flann's squared dists are sqrt'ed in convertToDMatches).
    """
    d = jnp.where(valid2[None, :], table.astype(jnp.float32), BIG)
    idx1 = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, idx1[:, None], axis=1)[:, 0]
    # mask out the best column per row, find second best
    cols = lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == idx1[:, None], BIG, d)
    second = jnp.min(d2, axis=1)
    r = ratio * ratio if squared else ratio
    ok = (
        valid1
        & (best < r * second)
        & (best < BIG)
    )
    return Matches(idx=idx1.astype(jnp.int32), dist=best, valid=ok)


def match_descriptors(
    bits1: jnp.ndarray,
    bits2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.8,
) -> Matches:
    """Exact knn2 + ratio matching of query bits1 against train bits2."""
    return knn2_ratio_match(hamming_table(bits1, bits2), valid1, valid2, ratio)


@jax.jit
def l2_table(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """(N1, N2) squared-L2 distances for float descriptors (the SIFT path:
    replaces FLANN KDTree knn, feature_matching.cpp:27-35)."""
    d1 = jnp.sum(desc1 * desc1, axis=1)
    d2 = jnp.sum(desc2 * desc2, axis=1)
    dot = lax.dot_general(
        desc1, desc2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return d1[:, None] + d2[None, :] - 2.0 * dot
