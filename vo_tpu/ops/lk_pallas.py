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

Semantics match `_refine_level(layout="lanes")` except the early-exit
convergence count is per lane-block rather than global (each grid block
exits when >=96%% of ITS active points converge). Endpoints stay inside
cv2 parity bounds (tests/test_lk_pallas.py); for N <= one block the
semantics — and arithmetic order — are identical to the lanes path.
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
    ~6 MB of VMEM (the pallas pipeline double-buffers inputs, and the
    sampler's intermediates need headroom in the 16 MB budget)."""
    nb = 512
    while nb > 128 and 2 * Sp * Sp * itemsize * nb > 6 * 2**20:
        nb //= 2
    return nb


def _refine_kernel(
    io_ref, win1_ref, win2_ref, out_ref, *,
    S: int, win: int, iters: int, eps: float, min_eig_threshold: float,
):
    from .lk import _sample_windows_lanes

    f32 = jnp.float32
    wp = win + 2
    win1 = win1_ref[...]
    win2 = win2_ref[...]
    io = io_ref[...]
    q1x, q1y = io[0], io[1]
    q20x, q20y = io[2], io[3]
    v0x, v0y = io[4], io[5]
    pre = io[6] > 0.5  # ok & ~tmpl_out, computed by the caller

    # template patch + gradients (identical math to _refine_level)
    big = _sample_windows_lanes(win1, q1x, q1y, wp, S)  # (wp, wp, NB) f32
    T = big[1:-1, 1:-1]
    Tx = (big[1:-1, 2:] - big[1:-1, :-2]) * 0.5
    Ty = (big[2:, 1:-1] - big[:-2, 1:-1]) * 0.5
    red = lambda a: jnp.sum(a, axis=(0, 1))
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
    n_active0 = jnp.maximum(jnp.sum(active0), 1)

    half = (wp - 1) / 2.0
    lo = half - 1.0
    hi = S - half

    def cond(carry):
        _, _, converged, it = carry
        remaining = jnp.sum(active0 & ~converged)
        return (it < iters) & (remaining * 25 > n_active0)

    def body(carry):
        vx, vy, converged, it = carry
        q2x = q20x + vx
        q2y = q20y + vy
        out_w = (q2x < lo) | (q2x > hi) | (q2y < lo) | (q2y > hi)
        I = _sample_windows_lanes(win2, q2x, q2y, wp, S)[1:-1, 1:-1]
        dI = I - T
        bx = red(dI * Tx)
        by = red(dI * Ty)
        dvx = -(gyy * bx - gxy * by) * inv_det
        dvy = -(-gxy * bx + gxx * by) * inv_det
        move = active0 & ~converged & ~out_w
        vx = jnp.where(move, vx + dvx, vx)
        vy = jnp.where(move, vy + dvy, vy)
        now_conv = (dvx * dvx + dvy * dvy < eps * eps) | out_w
        return vx, vy, converged | now_conv, it + 1

    vx, vy, _, _ = lax.while_loop(
        cond,
        body,
        (
            v0x.astype(f32),
            v0y.astype(f32),
            jnp.zeros(v0x.shape, bool),
            jnp.asarray(0, jnp.int32),
        ),
    )
    out_ref[...] = jnp.stack(
        [vx, vy, solvable.astype(f32)]
        + [jnp.zeros(vx.shape, f32)] * (out_ref.shape[0] - 3)
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
