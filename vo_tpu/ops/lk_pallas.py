"""Pallas fused LK level refinement — VMEM-resident iteration loop.

Why (roofline, ROADMAP "LK window sample+solve"): the XLA lanes path
(ops/lk.py `_refine_level`) re-reads the (S+10, S+10, N) window stacks
from HBM on EVERY Gauss-Newton iteration — the aligned-select sampler is
~15 masked full-stack passes, so a 10-iteration level streams ~100x the
stack size through HBM. The reference hits the same wall in CUDA and
solves it with shared-memory patches per thread block
(src/cuda/ — the LK analogue of its GaussianBlur1D tiling); the TPU
analogue is a Pallas kernel: block the keypoint (lane) axis, DMA both
window stacks into VMEM ONCE, and run the entire iteration loop —
sub-pixel sampling, residuals, 2x2 solve, convergence gating — out of
VMEM/vregs. Per-iteration traffic drops from HBM bandwidth to VMEM
bandwidth; the loop becomes VPU-bound.

Semantics match `_refine_level(layout="lanes")` except the 96%-converged
early exit is evaluated PER LANE BLOCK instead of globally (Mosaic
cannot legalize scf.while with vector carries, so the loop is a
fixed-trip fori whose body is pl.when-predicated on a scalar
remaining-count carried between trips; the flow/convergence lane
vectors live in VMEM scratch refs). An easy block stops issuing vector
work one trip after it converges; a hard block keeps iterating — so
some points refine slightly past where the lanes path's global exit
would freeze them. Endpoints stay inside cv2 parity bounds
(tests/test_lk_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_lanes(Sp: int, itemsize: int) -> int:
    """Largest 128-multiple lane block whose TWO window stacks stay under
    ~3 MB of VMEM. The budget must leave room for the pipeline's input
    double-buffering (x2) AND the sampler's f32 intermediates (the
    aligned-select accumulators are full-stack-sized in f32) — a 6 MB
    stack budget measured 17.3 MB of scoped VMEM at the KITTI level-0
    geometry (Sp=57, bf16) and OOM'd the 16 MB limit."""
    nb = 512
    while nb > 128 and 2 * Sp * Sp * itemsize * nb > 3 * 2**20:
        nb //= 2
    return nb


def _sample_lanes_2d(winp, qx, qy, wp: int, S: int):
    """Kernel-local twin of lk._sample_windows_lanes with every per-point
    value kept 2-D (1, NB): Mosaic's vector layout engine rejects rank-1
    intermediates inside kernels (Check failed:
    arr.size() >= layout_rank, measured on the v5e toolchain), so the
    lane-vector masks/offsets here carry an explicit leading unit
    sublane. Same math: aligned static-slice mask-accumulate (two-level
    8-blocked for wide ranges) + fractional FMA blend."""
    from jax import lax

    f32 = jnp.float32
    half = (wp - 1) // 2
    by = jnp.floor(qy)
    bx = jnp.floor(qx)
    fy = (qy - by).astype(f32)[None]  # (1, 1, NB)
    fx = (qx - bx).astype(f32)[None]
    oy = by.astype(jnp.int32) - half  # (1, NB)
    ox = bx.astype(jnp.int32) - half

    def aligned(x, o_idx, rows_out, axis):
        n_off = S - wp + 3

        def sl(arr, start, size):
            return lax.slice_in_dim(arr, start, start + size, axis=axis)

        if n_off <= 16:
            acc = None
            for o in range(-1, S - wp + 2):
                m = (o_idx == o).astype(f32)[None]  # (1, 1, NB)
                term = m * sl(x, o + 1, rows_out).astype(f32)
                acc = term if acc is None else acc + term
            return acc
        blk_idx = (o_idx + 1) // 8
        fine_idx = (o_idx + 1) - 8 * blk_idx
        n_blk = (n_off - 1) // 8 + 1
        mid = None
        for b in range(n_blk):
            m = (blk_idx == b).astype(f32)[None]
            term = m * sl(x, 8 * b, rows_out + 7).astype(f32)
            mid = term if mid is None else mid + term
        acc = None
        for f in range(8):
            m = (fine_idx == f).astype(f32)[None]
            term = m * sl(mid, f, rows_out)
            acc = term if acc is None else acc + term
        return acc

    rows_al = aligned(winp, oy, wp + 1, 0)  # (wp+1, S+3, NB) f32
    rows_i = (
        lax.slice_in_dim(rows_al, 0, wp, axis=0) * (1.0 - fy)
        + lax.slice_in_dim(rows_al, 1, wp + 1, axis=0) * fy
    )
    cols_al = aligned(rows_i, ox, wp + 1, 1)  # (wp, wp+1, NB)
    return (
        lax.slice_in_dim(cols_al, 0, wp, axis=1) * (1.0 - fx)
        + lax.slice_in_dim(cols_al, 1, wp + 1, axis=1) * fx
    )


def _refine_kernel(
    io_ref, win1_ref, win2_ref, out_ref, vx_ref, vy_ref, conv_ref, *,
    S: int, win: int, iters: int, eps: float, min_eig_threshold: float,
):
    f32 = jnp.float32
    wp = win + 2
    win1 = win1_ref[...]
    win2 = win2_ref[...]
    io = io_ref[...]
    # every per-point value stays (1, NB) — see _sample_lanes_2d
    q1x, q1y = io[0:1], io[1:2]
    q20x, q20y = io[2:3], io[3:4]
    v0x, v0y = io[4:5], io[5:6]
    pre = io[6:7] > 0.5  # ok & ~tmpl_out, computed by the caller

    # template patch + gradients (identical math to _refine_level)
    big = _sample_lanes_2d(win1, q1x, q1y, wp, S)  # (wp, wp, NB) f32
    T = big[1:-1, 1:-1]
    Tx = (big[1:-1, 2:] - big[1:-1, :-2]) * 0.5
    Ty = (big[2:, 1:-1] - big[:-2, 1:-1]) * 0.5
    # (wp, wp, NB) -> (1, NB): reduce one axis at a time with keepdims so
    # no rank-1 intermediate exists (Mosaic layout constraint)
    red = lambda a: jnp.sum(jnp.sum(a, axis=0), axis=0, keepdims=True)
    gxx = red(Tx * Tx)
    gxy = red(Tx * Ty)
    gyy = red(Ty * Ty)
    det = gxx * gyy - gxy * gxy
    trace = gxx + gyy
    min_eig = (trace - jnp.sqrt(trace * trace - 4 * det + 1e-12)) / 2.0
    min_eig = min_eig / (win * win)
    solvable = (det > 1e-7) & (min_eig > min_eig_threshold)
    inv_det = 1.0 / jnp.where(det > 1e-7, det, 1.0)
    active0 = solvable & pre

    half = (wp - 1) / 2.0
    lo = half - 1.0
    hi = S - half

    # Data-dependent trip count WITHOUT scf.while vector carries (Mosaic
    # rejects those — "failed to legalize operation 'scf.yield'", and
    # scf.for with i1 vector carries likewise, both measured on the v5e
    # toolchain): the flow/convergence lane vectors live in VMEM SCRATCH
    # refs, the fori_loop carries only a scalar remaining-count, and each
    # iteration body is predicated with pl.when on the same early-exit
    # rule as the lanes path (`remaining * 25 > n_active0`, i.e. stop
    # once ~96% of the block's active points converged or froze) — but
    # evaluated PER LANE BLOCK, so an easy block stops issuing vector
    # work the trip after it converges while a hard block keeps going.
    # A skipped trip costs one (1, NB) VMEM read + reduce; an executed
    # trip is pure VMEM/vreg arithmetic. This is what the fixed-trip
    # variant lost 2x+ on (A/B: 17.52 ms/step vs lanes 8.43 — it paid
    # the full 30-iteration budget against a ~10-iteration average).
    active0_f = active0.astype(f32)
    n_active0 = jnp.maximum(jnp.sum(active0_f), 1.0)
    vx_ref[...] = v0x.astype(f32)
    vy_ref[...] = v0y.astype(f32)
    conv_ref[...] = jnp.zeros(v0x.shape, f32)

    def body(it, rem):
        @pl.when(rem * 25.0 > n_active0)
        def _():
            vx = vx_ref[...]
            vy = vy_ref[...]
            conv = conv_ref[...]
            q2x = q20x + vx
            q2y = q20y + vy
            out_w = (
                (q2x < lo) | (q2x > hi) | (q2y < lo) | (q2y > hi)
            ).astype(f32)
            I = _sample_lanes_2d(win2, q2x, q2y, wp, S)[1:-1, 1:-1]
            dI = I - T
            bx = red(dI * Tx)
            by = red(dI * Ty)
            dvx = -(gyy * bx - gxy * by) * inv_det
            dvy = -(-gxy * bx + gxx * by) * inv_det
            move = active0_f * (1.0 - conv) * (1.0 - out_w)
            vx_ref[...] = vx + move * dvx
            vy_ref[...] = vy + move * dvy
            now_conv = jnp.maximum(
                (dvx * dvx + dvy * dvy < eps * eps).astype(f32), out_w
            )
            conv_ref[...] = jnp.maximum(conv, now_conv)

        return jnp.sum(active0_f * (1.0 - conv_ref[...]))

    lax.fori_loop(0, iters, body, n_active0)
    vx = vx_ref[...]
    out_ref[...] = jnp.concatenate(
        [vx, vy_ref[...], solvable.astype(f32)]
        + [jnp.zeros(vx.shape, f32)] * (out_ref.shape[0] - 3),
        axis=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=("S", "win", "iters", "eps", "min_eig_threshold",
                     "interpret"),
)
def _refine_call(
    io, win1p, win2p, *,
    S, win, iters, eps, min_eig_threshold, interpret,
):
    Sp, _, Np = win1p.shape
    NB = _block_lanes(Sp, win1p.dtype.itemsize)
    NB = min(NB, Np)
    kernel = functools.partial(
        _refine_kernel,
        S=S, win=win, iters=iters, eps=eps,
        min_eig_threshold=min_eig_threshold,
    )
    return pl.pallas_call(
        kernel,
        grid=(Np // NB,),
        in_specs=[
            pl.BlockSpec((8, NB), lambda i: (0, i)),
            pl.BlockSpec((Sp, Sp, NB), lambda i: (0, 0, i)),
            pl.BlockSpec((Sp, Sp, NB), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((8, NB), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, NB), jnp.float32),  # vx
            pltpu.VMEM((1, NB), jnp.float32),  # vy
            pltpu.VMEM((1, NB), jnp.float32),  # conv (0/1)
        ],
        interpret=interpret,
    )(io, win1p, win2p)


def refine_level_pallas(
    win1p: jnp.ndarray,
    win2p: jnp.ndarray,
    q1: jnp.ndarray,
    q20: jnp.ndarray,
    flow: jnp.ndarray,
    pre: jnp.ndarray,
    S: int,
    config,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused per-level refinement. Inputs use the lanes storage layout
    ((S+10, S+10, N) padded stacks, `_pad_lanes`); `q1`/`q20` are local
    template/search coordinates (N, 2), `flow` the initial flow (N, 2),
    `pre` = ok & ~tmpl_out. Returns (v (N, 2), solvable (N,) bool)."""
    N = q1.shape[0]
    Sp = win1p.shape[0]
    NB = min(_block_lanes(Sp, win1p.dtype.itemsize), _round_up(N, 128))
    Np = _round_up(N, NB)
    if Np != win1p.shape[2]:
        padn = Np - win1p.shape[2]
        win1p = jnp.pad(win1p, ((0, 0), (0, 0), (0, padn)))
        win2p = jnp.pad(win2p, ((0, 0), (0, 0), (0, padn)))
    io = jnp.zeros((8, Np), jnp.float32)
    io = io.at[0, :N].set(q1[:, 0])
    io = io.at[1, :N].set(q1[:, 1])
    io = io.at[2, :N].set(q20[:, 0])
    io = io.at[3, :N].set(q20[:, 1])
    io = io.at[4, :N].set(flow[:, 0])
    io = io.at[5, :N].set(flow[:, 1])
    io = io.at[6, :N].set(pre.astype(jnp.float32))
    out = _refine_call(
        io, win1p, win2p,
        S=S, win=config.win, iters=config.iters, eps=config.eps,
        min_eig_threshold=config.min_eig_threshold,
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )
    v = jnp.stack([out[0, :N], out[1, :N]], axis=1)
    return v, out[2, :N] > 0.5
