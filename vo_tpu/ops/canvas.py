"""Pyramid canvas packing: run dense frontend stages ONCE over all levels.

The reference's ORB host loops 8 sequential pyramid levels, each paying
its own kernel launches (orb.cpp:61-98). Round-2 profiling of the fused
XLA port showed the same structure surviving as ~40 small per-level
fusions with a flat dispatch-overhead tail. The TPU answer is to pack
all levels into ONE canvas image (static shelf layout) and run each
dense stage — FAST score, NMS, Harris response, moment maps, BRIEF
box-smoothing — a single time over the canvas.

Exactness: each level is placed with an `apron` of reflect-101 pixels
(matching ops/conv.py's border mode) so stages whose support reaches a
few pixels past a keypoint's level edge (Harris: 4) read the same
values they would have read per level. Stages with larger support
(orientation patch 15, BRIEF rotated pairs ~21) only ever CONSUME
values at coordinates that per-level semantics already bounds-mask, so
apron size does not need to cover them. Per-level interior masks (and
per-keypoint level rectangles for the gather stages) enforce the
reference's border rules in canvas coordinates.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

from .conv import reflect_pad


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def plan_canvas(
    shapes: tuple,
    apron: int = 4,
    round_y: int = 8,
    round_x: int = 128,
) -> tuple:
    """Static shelf layout for level shapes ((H, W), ...).

    Returns (Hc, Wc, origins) where origins[l] is the (y, x) canvas
    coordinate of level l's pixel (0, 0) (i.e. inside its apron).
    Origins are tiling-aligned (y: sublane multiple, x: lane multiple)
    so level slices stay cheap on TPU."""
    blocks = [(H + 2 * apron, W + 2 * apron) for H, W in shapes]
    Wc = _round_up(max(bw for _, bw in blocks), round_x)
    shelves: list = []  # [y0, height, x_cursor]
    placements = []
    y = 0
    for bh, bw in blocks:
        placed = False
        for sh in shelves:
            x = _round_up(sh[2], round_x)
            if x + bw <= Wc and bh <= sh[1]:
                placements.append((sh[0], x))
                sh[2] = x + bw
                placed = True
                break
        if not placed:
            h = _round_up(bh, round_y)
            shelves.append([y, h, bw])
            placements.append((y, 0))
            y += h
    Hc = _round_up(y, round_y)
    origins = tuple((py + apron, px + apron) for py, px in placements)
    return Hc, Wc, origins


def pack_canvas(pyr, apron: int = 4):
    """Pack pyramid levels (list of (..., H, W) arrays with identical
    leading dims) into one canvas.

    Returns (canvas (..., Hc, Wc), origins) with each level surrounded
    by an `apron` of its own reflect-101 border pixels (zeros
    elsewhere). Leading dims (e.g. a SIFT layer stack) are packed in one
    dynamic_update_slice per level."""
    shapes = tuple(tuple(im.shape[-2:]) for im in pyr)
    Hc, Wc, origins = plan_canvas(shapes, apron)
    lead = tuple(pyr[0].shape[:-2])
    canvas = jnp.zeros(lead + (Hc, Wc), pyr[0].dtype)
    zero_lead = (0,) * len(lead)
    for im, (oy, ox) in zip(pyr, origins):
        block = reflect_pad(im, apron)
        canvas = lax.dynamic_update_slice(
            canvas, block.astype(canvas.dtype),
            zero_lead + (oy - apron, ox - apron),
        )
    return canvas, origins


@functools.lru_cache(maxsize=None)
def _interior_mask_np(
    canvas_shape: tuple, shapes: tuple, origins: tuple, border: int
) -> np.ndarray:
    m = np.zeros(canvas_shape, np.float32)
    for (H, W), (oy, ox) in zip(shapes, origins):
        m[oy + border : oy + H - border, ox + border : ox + W - border] = 1.0
    return m


def interior_mask(
    canvas_shape: tuple, shapes: tuple, origins: tuple, border: int = 3
) -> jnp.ndarray:
    """(Hc, Wc) float mask: 1 on each level's interior (border pixels of
    every level excluded — the FAST border rule, Fast.cu:160), 0 on
    aprons/gutters. Built host-side once per static geometry."""
    return jnp.asarray(
        _interior_mask_np(tuple(canvas_shape), tuple(shapes), tuple(origins),
                          border)
    )
