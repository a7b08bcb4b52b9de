"""Spatial parallelism: image rows sharded across chips, stencils with
ring halo exchange.

TPU analogue of the reference's CUDA shared-memory halo loads (Fast.cu:
53-155 loads a RADIUS=3 apron into each block's shared mem): here the
"block" is a chip's row shard and the apron travels over ICI with two
`ppermute`s (up/down neighbors) — SURVEY.md §2e / §5 "ring pattern".

Works for any same-padded stencil: we exchange `halo` rows, run the dense
kernel on the extended shard with *valid* semantics at the seam, and crop.
Physical image borders keep the kernel's own reflect-101 handling because
the first/last shard receives a reflected apron instead of a neighbor's.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _exchange_halo(x: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Prepend/append `halo` rows from ring neighbors (reflect-101 at the
    physical image top/bottom). x: (rows_local, W) -> (rows+2*halo, W)."""
    n = lax.axis_size(axis)
    i = lax.axis_index(axis)
    up = [(j, (j - 1) % n) for j in range(n)]  # send to previous shard
    down = [(j, (j + 1) % n) for j in range(n)]  # send to next shard

    # My top apron = bottom rows of the shard above me (it sends "down");
    # my bottom apron = top rows of the shard below me (it sends "up").
    from_above = lax.ppermute(x[-halo:], axis, down)
    from_below = lax.ppermute(x[:halo], axis, up)

    # Physical borders: reflect-101 of the local shard (matches the
    # reference's BORDER_REFLECT_101 padding, GaussianBlur.cu:75).
    top_reflect = x[1 : halo + 1][::-1]
    bot_reflect = x[-halo - 1 : -1][::-1]
    top = jnp.where(i == 0, top_reflect, from_above)
    bot = jnp.where(i == n - 1, bot_reflect, from_below)
    return jnp.concatenate([top, x, bot], axis=0)


def sharded_stencil(
    mesh: Mesh,
    kernel_same: Callable[[jnp.ndarray], jnp.ndarray],
    halo: int,
    axis: str = "row",
    border: int = 0,
):
    """Lift a same-padded (H, W)->(H, W) stencil to a row-sharded one.

    `kernel_same` must be pure and use at most `halo` rows of context per
    output row (e.g. 5x5 blur -> halo 2, FAST-9 -> halo 3). `border` > 0
    zeroes that many rows at the *global* image top/bottom, for kernels
    that mask their border (FAST's 3-pixel exclusion) — the seam shards
    must not re-introduce values the dense kernel would have masked.
    """

    def body(x):
        ext = _exchange_halo(x, halo, axis)
        out = kernel_same(ext)[halo:-halo]
        if border > 0:
            n = lax.axis_size(axis)
            i = lax.axis_index(axis)
            rows = x.shape[0]
            r = lax.broadcasted_iota(jnp.int32, out.shape, 0) + i * rows
            total = n * rows
            keep = (r >= border) & (r < total - border)
            out = jnp.where(keep, out, 0.0)
        return out

    return shard_map(
        body,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
        check_vma=False,
    )


def sharded_gaussian_blur(mesh: Mesh, axis: str = "row"):
    """Row-sharded 5x5 binomial blur (the GaussianBlur1D.cu pipeline)."""
    from ..ops.conv import binomial_blur5

    return sharded_stencil(mesh, binomial_blur5, halo=2, axis=axis)


def sharded_fast_score(
    mesh: Mesh,
    threshold: float = 20.0,
    n: int = 9,
    axis: str = "row",
):
    """Row-sharded FAST-9 score map (circle radius 3 -> halo 3)."""
    from ..ops.fast import fast_score

    return sharded_stencil(
        mesh,
        functools.partial(fast_score, threshold=threshold, n=n),
        halo=3,
        axis=axis,
        border=3,  # FAST masks the 3-pixel image border (Fast.cu:160)
    )
