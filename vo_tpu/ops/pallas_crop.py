"""Pallas TPU kernel: batched per-point window extraction.

The LK tracker needs (N, S, S) image windows at per-point integer origins.
XLA offers two poor lowerings: an element gather (~130 M elements/s) or a
row-gather + one-hot matmul through HBM (~11 ms per full-res crop). The
DMA engines copy strided 2-D blocks natively, but Mosaic constrains
dynamic DMA slices: row offsets must be provably 8-aligned
(pl.multiple_of) and the sliced shape 128-aligned in lanes. So:

  1. row origin is aligned DOWN to 8 (callers work in window-local
     coordinates, so the extra rows are just margin);
  2. each point DMAs an (S, 256) strip starting at the 128-aligned column
     block containing its origin — covers any in-block offset + S <= 128;
  3. the S desired columns are selected from the strip in VMEM by a
     one-hot matmul on the MXU (a (S, 256) x (256, S) dot per point).

`BLOCK` points per program overlap their DMA issue/wait; the Pallas
pipeline double-buffers output blocks. The wrapper pads the image so
every strip stays in bounds. S must be a multiple of 8 and <= 128.

CPU/tests run in interpreter mode; parity with the XLA path is asserted
in tests/test_pallas_crop.py.

STATUS: correct on TPU v5e but latency-bound (~90 ms for 3476 x S=40 vs
~25 ms for the XLA row-gather + one-hot matmul path) — the per-point
(S, 256) x (256, S) selection dots serialize at ~25 us each. Kept as a
working reference for DMA-based crops; the LK tracker uses the XLA path.
A future version should batch the column selection across points into
one big matmul or skip it by accepting 128-wide windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


BLOCK = 64  # points per program: amortizes DMA latency + grid overhead
STRIP = 256  # DMA strip width: 128 (block alignment) + up to 128 for S


def _crop_kernel(origins_ref, img_ref, out_ref, strip, sems, *, S: int):
    i = pl.program_id(0)
    base = i * BLOCK

    def make_dma(j):
        # origins are flat [oy, oxb, shift] triples (SMEM pads 2-D scalar
        # operands to 128 lanes per row — flat stays small)
        oy = pl.multiple_of(origins_ref[3 * (base + j)], 8)
        oxb = pl.multiple_of(origins_ref[3 * (base + j) + 1], 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(oy, S), pl.ds(oxb, STRIP)],
            strip.at[j],
            sems.at[j],
        )

    for j in range(BLOCK):
        make_dma(j).start()
    for j in range(BLOCK):
        make_dma(j).wait()

    cols = jax.lax.broadcasted_iota(jnp.int32, (STRIP, S), 0)
    offs = jax.lax.broadcasted_iota(jnp.int32, (STRIP, S), 1)
    for j in range(BLOCK):
        shift = origins_ref[3 * (base + j) + 2]  # ox - oxb, in [0, 128)
        onehot = (cols == offs + shift).astype(jnp.float32)
        out_ref[j] = jnp.dot(
            strip[j], onehot, preferred_element_type=jnp.float32
        )


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def crop_windows_pallas(
    img: jnp.ndarray,
    ox: jnp.ndarray,
    oy: jnp.ndarray,
    S: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, S, S) crops of img (H, W) at integer origins (already clipped
    to [0, W-S] x [0, H-S] by the caller).

    Constraints: S % 8 == 0, S <= 128, oy % 8 == 0 (the LK geometry
    guarantees all three). N is padded to a BLOCK multiple internally."""
    assert S % 8 == 0 and S <= 128, S
    N = ox.shape[0]
    H, W = img.shape

    # pad so every (S, STRIP) strip is in bounds: rows to a multiple of 8
    # >= H, columns to align128(W - S) + STRIP
    Hp = -(-H // 8) * 8
    max_oxb = ((W - S) // 128) * 128
    Wp = max(max_oxb + STRIP, W)
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, Hp - H), (0, Wp - W)))

    ox = ox.astype(jnp.int32)
    oxb = (ox // 128) * 128
    origins = jnp.stack(
        [oy.astype(jnp.int32), oxb, ox - oxb], axis=1
    ).reshape(-1)
    n_pad = (-N) % BLOCK
    if n_pad:
        origins = jnp.concatenate(
            [origins, jnp.zeros((3 * n_pad,), jnp.int32)]
        )
    n_total = N + n_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_total // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (BLOCK, S, S),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, S, STRIP), jnp.float32),
            pltpu.SemaphoreType.DMA((BLOCK,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_crop_kernel, S=S),
        out_shape=jax.ShapeDtypeStruct((n_total, S, S), img.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins, img)
    return out[:N]
