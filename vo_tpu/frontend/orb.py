"""ORB detect-and-compute over an image pyramid — one fused jitted program.

Re-design of the reference's ORB host orchestration (src/orb.cpp:58-127).
The reference runs 8 sequential pyramid levels, each with >=10 H2D/D2H
round-trips (SURVEY.md §3.4); here the full frontend — pyramid, FAST, NMS,
Harris rerank, orientations, BRIEF — is a single XLA program with
fixed-capacity masked keypoint arrays.

Parity notes vs orb.cpp:
- per-level budget: nfeatures * ((1-1/s)/(1-(1/s)^L)) * (1/s)^l, C++
  int-truncated (orb.cpp:62); FAST detects into a 2x budget (orb.cpp:63).
- Harris rerank keeps the top budget_l by response. (The reference's
  nth_element "filter" at orb.cpp:73-86 actually keeps *all* keypoints —
  semi-sorted — which defeats the budget; we implement the evident intent.)
- BRIEF runs on the *level* image. (orb.cpp:91 passes the level-0 image
  with level-l coordinates — a cross-level bug; not replicated.)
- keypoint coords are mapped back to level 0 by *scale^l (orb.cpp:94-98).
- output order is canonical: level-major, Harris-descending within level —
  replacing the reference's nondeterministic atomicAdd order (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.brief import brief_descriptors
from ..ops.canvas import interior_mask, pack_canvas
from ..ops.fast import fast_score
from ..ops.harris import harris_response
from ..ops.nms import blocked_topk_2d, detect_keypoints, nms_mask
from ..ops.orientation import orientations_at
from ..ops.pyramid import build_pyramid


class OrbConfig(NamedTuple):
    """Static ORB parameters (defaults: orb.hpp:36 / orb.hpp:12)."""

    nfeatures: int = 500
    scale_factor: float = 1.2
    n_levels: int = 8
    fast_threshold: float = 20.0
    fast_n: int = 9
    nms_window: int = 3
    patch_size: int = 31
    harris_block: int = 7
    harris_k: float = 0.04
    # Canvas packing (ops/canvas.py): pack all pyramid levels into one
    # image so every dense stage runs ONCE instead of once per level —
    # replaces the reference's 8 serial levels (orb.cpp:61-98) and the
    # round-2 port's ~40 small per-level fusions. Keypoint output is
    # identical (level aprons reproduce per-level border values); False
    # keeps the per-level path for comparison.
    canvas: bool = True


class OrbFeatures(NamedTuple):
    """Fixed-capacity ORB feature set (K = sum of per-level budgets)."""

    xs: jnp.ndarray  # (K,) float32, level-0 coordinates
    ys: jnp.ndarray  # (K,)
    scores: jnp.ndarray  # (K,) Harris response
    angles: jnp.ndarray  # (K,) radians
    bits: jnp.ndarray  # (K, 256) uint8 bit planes
    packed: jnp.ndarray  # (K, 32) uint8, reference byte layout
    level: jnp.ndarray  # (K,) int32
    valid: jnp.ndarray  # (K,) bool

    @property
    def capacity(self) -> int:
        return self.xs.shape[-1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def level_budgets(config: OrbConfig) -> list[int]:
    """Per-level feature budgets, C++ int truncation (orb.cpp:62)."""
    inv = 1.0 / config.scale_factor
    factor = (1.0 - inv) / (1.0 - inv**config.n_levels)
    return [
        max(1, int(config.nfeatures * factor * inv**l))
        for l in range(config.n_levels)
    ]


def _detect_level(img_l: jnp.ndarray, budget: int, config: OrbConfig):
    """Full per-level stack; returns masked arrays of size `budget`."""
    score = fast_score(img_l, config.fast_threshold, config.fast_n)
    kps = detect_keypoints(score, k=2 * budget, radius=config.nms_window // 2)

    # Harris rerank: top `budget` of the (2*budget) FAST detections.
    resp = harris_response(img_l, config.harris_block, config.harris_k)
    harris = resp[kps.ys.astype(jnp.int32), kps.xs.astype(jnp.int32)]
    harris = jnp.where(kps.valid, harris, -jnp.inf)
    top_h, idx = lax.top_k(harris, budget)
    valid = top_h > -jnp.inf
    xs, ys = kps.xs[idx], kps.ys[idx]

    angles = orientations_at(img_l, ys, xs, config.patch_size)
    bits, packed = brief_descriptors(img_l, ys, xs, angles)

    vz = lambda a: jnp.where(valid, a, jnp.zeros_like(a))
    return (
        vz(xs),
        vz(ys),
        jnp.where(valid, top_h, 0.0),
        vz(angles),
        bits * valid[:, None].astype(bits.dtype),
        packed * valid[:, None].astype(packed.dtype),
        valid,
    )


def _detect_canvas(pyr, budgets, config: OrbConfig):
    """Canvas-packed detection: every dense stage runs once over all
    levels (see OrbConfig.canvas). Per-level work shrinks to a score
    slice + two small top-k's."""
    import numpy as np

    shapes = tuple(tuple(im.shape) for im in pyr)
    canvas, origins = pack_canvas(pyr)

    score = fast_score(canvas, config.fast_threshold, config.fast_n)
    score = score * interior_mask(canvas.shape, shapes, origins, border=3)
    resp = jnp.where(
        nms_mask(score, config.nms_window // 2) & (score > 0), score, 0.0
    )
    harris = harris_response(canvas, config.harris_block, config.harris_k)

    # Per level: slice the masked score, top-(2*budget) FAST candidates,
    # Harris-rerank to the budget (orb.cpp:63-86).
    sel_xs, sel_ys, sel_h, sel_valid = [], [], [], []
    rect = []  # per-keypoint level rectangle (canvas coords)
    for (Hl, Wl), (oy, ox), budget in zip(shapes, origins, budgets):
        sub = lax.slice(resp, (oy, ox), (oy + Hl, ox + Wl))
        top, ys_l, xs_l, _ = blocked_topk_2d(sub, 2 * budget)
        cand_ok = top > 0.0
        cy = ys_l + oy
        cx = xs_l + ox
        h = jnp.where(cand_ok, harris[cy, cx], -jnp.inf)
        top_h, idx = lax.top_k(h, budget)
        valid = top_h > -jnp.inf
        sel_xs.append(cx[idx])
        sel_ys.append(cy[idx])
        sel_h.append(jnp.where(valid, top_h, 0.0))
        sel_valid.append(valid)
        rect.append(
            np.broadcast_to(
                np.array([ox, oy, ox + Wl, oy + Hl], np.int32), (budget, 4)
            )
        )

    xs = jnp.concatenate(sel_xs)
    ys = jnp.concatenate(sel_ys)
    hscore = jnp.concatenate(sel_h)
    valid = jnp.concatenate(sel_valid)
    rect_np = np.concatenate(rect, axis=0)
    rect_t = tuple(jnp.asarray(rect_np[:, i]) for i in range(4))

    # Gather stages once over ALL levels' keypoints, border rules applied
    # against each keypoint's level rectangle.
    angles = orientations_at(
        canvas, ys, xs, config.patch_size, rect=rect_t
    )
    bits, packed = brief_descriptors(canvas, ys, xs, angles, rect=rect_t)

    outs = []
    off = 0
    for l, ((Hl, Wl), (oy, ox), budget) in enumerate(
        zip(shapes, origins, budgets)
    ):
        s = config.scale_factor**l
        sl = slice(off, off + budget)
        v = valid[sl]
        vz = lambda a: jnp.where(v, a, jnp.zeros_like(a))
        outs.append(
            (
                vz((xs[sl] - ox).astype(jnp.float32)) * s,
                vz((ys[sl] - oy).astype(jnp.float32)) * s,
                hscore[sl],
                vz(angles[sl]),
                bits[sl] * v[:, None].astype(bits.dtype),
                packed[sl] * v[:, None].astype(packed.dtype),
                jnp.full(budget, l, jnp.int32),
                v,
            )
        )
        off += budget
    return outs


@functools.partial(jax.jit, static_argnames=("config",))
def orb_detect_and_compute(img: jnp.ndarray, config: OrbConfig = OrbConfig()):
    """ORB features for one (H, W) float32 image, all levels fused."""
    budgets = level_budgets(config)
    pyr = build_pyramid(img, config.n_levels, config.scale_factor)

    if config.canvas:
        outs = _detect_canvas(pyr, budgets, config)
        cat = lambda i: jnp.concatenate([o[i] for o in outs], axis=0)
        return OrbFeatures(
            xs=cat(0), ys=cat(1), scores=cat(2), angles=cat(3),
            bits=cat(4), packed=cat(5), level=cat(6), valid=cat(7),
        )

    outs = []
    for l, (img_l, budget) in enumerate(zip(pyr, budgets)):
        xs, ys, sc, ang, bits, packed, valid = _detect_level(img_l, budget, config)
        s = config.scale_factor**l  # map back to level-0 coords (orb.cpp:94-98)
        outs.append(
            (
                xs * s,
                ys * s,
                sc,
                ang,
                bits,
                packed,
                jnp.full(budget, l, jnp.int32),
                valid,
            )
        )

    cat = lambda i: jnp.concatenate([o[i] for o in outs], axis=0)
    return OrbFeatures(
        xs=cat(0), ys=cat(1), scores=cat(2), angles=cat(3),
        bits=cat(4), packed=cat(5), level=cat(6), valid=cat(7),
    )
