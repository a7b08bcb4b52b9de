"""Pallas fused separable blur — the production TPU stencil kernel.

Replaces the XLA shift-add lowering of separable Gaussian blurs
(ops/conv.py separable_conv_same) on the TPU backend. Motivation
(ROADMAP round 1, measured on v5e): XLA materializes each shifted slice
of the 15-tap SIFT scale-space blur as its own HBM round trip, landing at
~19 GB/s effective — ~40x off the HBM roofline; the LK pyramid's 5-tap
binomial blur has the same shape. The reference's own fix for this class
of problem is the shared-memory tiled CUDA kernel with in-kernel halo
loads (src/cuda/GaussianBlur1D.cu:18-57); this is the TPU analogue:

- the image is reflect-101 padded once in XLA (rows to the band/DMA
  alignment, columns to a 128 multiple), so the kernel has NO boundary
  branches;
- a 1-D grid over row bands; each band DMAs its (R8, Wp) tile
  HBM -> VMEM ONCE (halo rows ride in the same copy — "in-kernel halo
  DMA"); R8 is 8-aligned and Wp 128-aligned per Mosaic's DMA tiling;
- BOTH conv passes run on the MXU as banded-constant matmuls: lane-
  misaligned slices lower to full-tile rotate buffers (measured: 15 of
  them OOM'd the 16 MB VMEM), so instead the row pass multiplies each
  ALIGNED 256-column chunk by a (256, 128) banded tap matrix, and the
  column pass is one (TH, R8) banded matrix times the tile. f32
  accumulation throughout; one HBM read + one HBM write total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CH = 128  # output-column chunk of the row pass


@functools.lru_cache(maxsize=None)
def _row_band_matrix(kx: tuple) -> np.ndarray:
    """(2*_CH, _CH) banded taps: out[:, j] = sum_k kx[k] * x[:, j + k]."""
    B = np.zeros((2 * _CH, _CH), np.float32)
    for j in range(_CH):
        for k, t in enumerate(kx):
            B[j + k, j] = t
    return B


@functools.lru_cache(maxsize=None)
def _col_band_matrix(ky: tuple, TH: int, R8: int) -> np.ndarray:
    """(TH, R8) banded taps: out[i, :] = sum_k ky[k] * x[i + k, :]."""
    A = np.zeros((TH, R8), np.float32)
    for i in range(TH):
        for k, t in enumerate(ky):
            A[i, i + k] = t
    return A


def _blur_kernel(hbm_ref, B_ref, A_ref, out_ref, scratch, sem, *, TH, W, r):
    i = pl.program_id(0)
    R8 = scratch.shape[0]
    # One DMA brings the band AND its halo rows/columns (padded input).
    dma = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(i * TH, R8), :], scratch, sem
    )
    dma.start()
    dma.wait()

    x = scratch[:]
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    Bc = B_ref[:]
    A = A_ref[:]
    n_ch = -(-W // _CH)
    parts = []
    for c in range(n_ch):
        xs = jax.lax.slice_in_dim(x, c * _CH, c * _CH + 2 * _CH, axis=1)
        parts.append(
            jnp.dot(xs, Bc, preferred_element_type=jnp.float32)
        )  # (R8, _CH)
    acc = jnp.concatenate(parts, axis=1)  # (R8, n_ch*_CH)
    out = jnp.dot(A, acc, preferred_element_type=jnp.float32)
    out_ref[:] = out[:, :W].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("ky", "kx", "H", "W", "band_rows", "n_bands")
)
def _blur_padded(padded, ky, kx, H, W, band_rows, n_bands):
    r = (len(ky) - 1) // 2
    TH = band_rows
    R8 = _round_up(TH + 2 * r, 8)
    W2 = padded.shape[1]
    kernel = functools.partial(_blur_kernel, TH=TH, W=W, r=r)
    out = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TH, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_bands * TH, W), padded.dtype),
        scratch_shapes=[
            pltpu.VMEM((R8, W2), padded.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(
        padded,
        jnp.asarray(_row_band_matrix(kx)),
        jnp.asarray(_col_band_matrix(ky, TH, R8)),
    )
    return out[:H]


def pallas_separable_blur(
    img: jnp.ndarray, ky, kx=None, band_rows: int = 128
) -> jnp.ndarray:
    """Same-size separable correlation with reflect-101 borders, fused as
    one Pallas kernel (TPU). Taps must be static 1-D sequences of odd
    length; `kx` defaults to `ky`. Matches ops/conv.separable_conv_same;
    falls back to it for shapes the alignment padding cannot host."""
    if kx is None:
        kx = ky
    ky = tuple(float(t) for t in np.asarray(ky).reshape(-1))
    kx = tuple(float(t) for t in np.asarray(kx).reshape(-1))
    assert len(ky) % 2 == 1 and len(kx) % 2 == 1
    r = max((len(ky) - 1) // 2, (len(kx) - 1) // 2)
    # symmetric halo r on both axes keeps the kernel branch-free; pad taps
    # with zeros to the common radius so both passes index uniformly
    ky = _pad_taps(ky, r)
    kx = _pad_taps(kx, r)
    H, W = img.shape[-2:]
    if img.ndim != 2:
        f = lambda im: pallas_separable_blur(im, ky, kx, band_rows)
        return jax.vmap(f)(img.reshape((-1, H, W))).reshape(img.shape)
    TH = min(band_rows, _round_up(H, 8))
    n_bands = -(-H // TH)
    if not blur_supported((H, W), r, TH) or jax.default_backend() not in (
        "tpu", "axon",
    ):
        from .conv import _conv2d_valid_shift_add, reflect_pad

        out = _conv2d_valid_shift_add(
            reflect_pad(img, 0, r), np.asarray(kx).reshape(1, -1)
        )
        return _conv2d_valid_shift_add(
            reflect_pad(out, r, 0), np.asarray(ky).reshape(-1, 1)
        )
    # rows: the last band's DMA reads R8 rows from (n_bands-1)*TH;
    # cols: the last row-pass chunk reads 256 cols from (n_ch-1)*128
    R8 = _round_up(TH + 2 * r, 8)
    pad_bottom = (n_bands - 1) * TH + R8 - r - H
    n_ch = -(-W // _CH)
    Wp = (n_ch + 1) * _CH
    padded = jnp.pad(
        img, ((r, pad_bottom), (r, Wp - W - r)), mode="reflect"
    )
    return _blur_padded(
        padded, ky, kx, H=H, W=W, band_rows=TH, n_bands=n_bands
    )


def blur_supported(shape: tuple, r: int, band_rows: int = 128) -> bool:
    """Whether the kernel's alignment padding fits reflect-101 limits
    (pad width must stay below the dimension size) — tiny images fall
    back to the XLA path."""
    H, W = shape
    TH = min(band_rows, _round_up(H, 8))
    n_bands = -(-H // TH)
    R8 = _round_up(TH + 2 * r, 8)
    pad_bottom = (n_bands - 1) * TH + R8 - r - H
    Wp = (-(-W // _CH) + 1) * _CH
    return (
        H > max(r, pad_bottom)
        and W > max(r, Wp - W - r)
        and r > 0
        and 2 * r <= _CH
    )


def _pad_taps(taps: tuple, r: int) -> tuple:
    k = (len(taps) - 1) // 2
    z = (0.0,) * (r - k)
    return z + tuple(taps) + z


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
