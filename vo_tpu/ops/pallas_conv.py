"""Pallas TPU kernel: 1-D row convolution at (near) HBM roofline.

XLA lowers our shift-add convs as k separate slice-multiply-adds that it
does not collapse into one pass — measured ~19 GB/s effective (40x off
roofline) on SIFT's octave-0 blurs. Here the padded image is first laid
out as disjoint column tiles with their k-1 halo (one bandwidth-bound
copy — Pallas blocks cannot overlap), then a kernel accumulates the k
taps entirely in VMEM: HBM is touched ~twice total instead of k times.

`conv_rows_pallas(img, taps)`: same-size correlation along the LAST axis
with reflect-101 borders (matches ops/conv.py semantics). Column convs =
transpose -> row conv -> transpose. Interpreter mode keeps CPU tests
exact.

STATUS: correct everywhere but SLOW on v5e (121 ms vs 4.9 ms shift-add
for a 15-tap separable pass at 752x2482): the overlapped-tile copy, the
transposes for the column pass, and per-program grid overheads cost more
than the fused-pass savings. Kept as a tested reference; a winning
version needs in-kernel halo DMA (no pre-copied tiles) and a native
column pass. The shift-add path in ops/conv.py remains the production
conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


TILE_H = 128
TILE_W = 512


def _row_conv_kernel(in_ref, out_ref, *, taps: tuple):
    acc = None
    for k, t in enumerate(taps):
        term = in_ref[0, :, k : k + TILE_W] * t
        acc = term if acc is None else acc + term
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def _conv_rows_tiles(tiles, taps: tuple, interpret: bool = False):
    """tiles: (n_j, Hp, TILE_W + k - 1) overlapped column tiles.
    Returns (Hp, n_j * TILE_W)."""
    n_j, Hp, _ = tiles.shape
    n_i = Hp // TILE_H
    return pl.pallas_call(
        functools.partial(_row_conv_kernel, taps=taps),
        out_shape=jax.ShapeDtypeStruct((Hp, n_j * TILE_W), tiles.dtype),
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec(
                (1, TILE_H, TILE_W + len(taps) - 1),
                lambda i, j: (j, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(tiles)


def conv_rows_pallas(
    img: jnp.ndarray, taps, interpret: bool = False
) -> jnp.ndarray:
    """Same-size row correlation with reflect-101 borders."""
    taps = tuple(float(t) for t in np.asarray(taps).reshape(-1))
    k = len(taps)
    r = k // 2
    H, W = img.shape
    Hp = -(-H // TILE_H) * TILE_H
    n_j = -(-W // TILE_W)
    Wp = n_j * TILE_W + k - 1
    img_p = jnp.pad(img, ((0, Hp - H), (r, r)), mode="reflect")
    img_p = jnp.pad(img_p, ((0, 0), (0, Wp - img_p.shape[1])))
    # overlapped disjoint tiles: (n_j, Hp, TILE_W + k - 1)
    tiles = jnp.stack(
        [
            jax.lax.slice_in_dim(
                img_p, j * TILE_W, j * TILE_W + TILE_W + k - 1, axis=1
            )
            for j in range(n_j)
        ],
        axis=0,
    )
    out = _conv_rows_tiles(tiles, taps, interpret)
    return out[:H, :W]


def conv_cols_pallas(
    img: jnp.ndarray, taps, interpret: bool = False
) -> jnp.ndarray:
    """Same-size column correlation: transpose -> row conv -> transpose."""
    return conv_rows_pallas(img.T, taps, interpret).T


def separable_conv_pallas(
    img: jnp.ndarray, ky, kx, interpret: bool = False
) -> jnp.ndarray:
    """Separable same-size correlation (reflect-101), both passes as
    roofline row convs."""
    out = conv_rows_pallas(img, kx, interpret)
    return conv_cols_pallas(out, ky, interpret)
