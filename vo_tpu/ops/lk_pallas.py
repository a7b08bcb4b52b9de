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


def _block_lanes(Sp: int, itemsize: int, wp: int = 23) -> int:
    """Largest 128-multiple lane block whose TWO window stacks plus the
    persistent (wp+1, wp+1) f32 integer-patch scratch stay under ~3 MB
    of VMEM. The budget must leave room for the pipeline's input
    double-buffering (x2) AND the sampler's f32 intermediates (the
    aligned-select accumulators are full-stack-sized in f32) — a 6 MB
    stack budget measured 17.3 MB of scoped VMEM at the KITTI level-0
    geometry (Sp=57, bf16) and OOM'd the 16 MB limit."""
    nb = 512
    M = wp + 1 + 2 * _GUARD
    per_lane = 2 * Sp * Sp * itemsize + M * M * 4
    while nb > 128 and per_lane * nb > 3 * 2**20:
        nb //= 2
    return nb


def _aligned(x, o_idx, rows_out, axis, S: int, wp: int):
    """Σ_o (o_idx == o) * x[o + 1 : o + 1 + rows_out] along `axis`,
    o in [-1, S - wp + 1]; two-level 8-blocked when the range > 16.
    Every per-point value stays 2-D (1, NB): Mosaic's vector layout
    engine rejects rank-1 intermediates inside kernels (Check failed:
    arr.size() >= layout_rank, measured on the v5e toolchain)."""
    f32 = jnp.float32
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


def _sample_lanes_2d(winp, qx, qy, wp: int, S: int):
    """Kernel-local twin of lk._sample_windows_lanes (see _aligned):
    integer alignment by masked static-slice accumulate + fractional FMA
    blend, all per-point values kept 2-D (1, NB)."""
    f32 = jnp.float32
    half = (wp - 1) // 2
    by = jnp.floor(qy)
    bx = jnp.floor(qx)
    fy = (qy - by).astype(f32)[None]  # (1, 1, NB)
    fx = (qx - bx).astype(f32)[None]
    oy = by.astype(jnp.int32) - half  # (1, NB)
    ox = bx.astype(jnp.int32) - half

    rows_al = _aligned(winp, oy, wp + 1, 0, S, wp)  # (wp+1, S+3, NB) f32
    rows_i = (
        lax.slice_in_dim(rows_al, 0, wp, axis=0) * (1.0 - fy)
        + lax.slice_in_dim(rows_al, 1, wp + 1, axis=0) * fy
    )
    cols_al = _aligned(rows_i, ox, wp + 1, 1, S, wp)  # (wp, wp+1, NB)
    return (
        lax.slice_in_dim(cols_al, 0, wp, axis=1) * (1.0 - fx)
        + lax.slice_in_dim(cols_al, 1, wp + 1, axis=1) * fx
    )


# Guard margin of the cached patch, in pixels per side. The integer
# blend base may drift up to G px from the extraction center before the
# full-stack select re-runs: telemetry on real tracking steps showed the
# ZERO-guard cache rebasing on essentially every executed iteration at
# the fine levels (9-18 extractions per ~12-iteration block — early
# Gauss-Newton steps are ~0.5-3 px, and with 128+ lanes per block SOME
# lane crosses an integer boundary every trip), so a guard-free cache
# degenerates back to the full sampler. With the guard, a rebase needs
# >G px of cumulative drift since extraction — rare after the first
# iteration or two.
_GUARD = 2


def _extract_guard_patch(winp, oy0, ox0, wp: int, S: int):
    """(M, M, NB) INTEGER-aligned guard patch winp[oy0+1+r, ox0+1+c, :],
    M = wp + 1 + 2*_GUARD — the full aligned-select pass WITHOUT the
    fractional blend, widened by the guard. oy0/ox0 are the patch
    origins (extraction base minus _GUARD, clipped to the stack)."""
    M = wp + 1 + 2 * _GUARD
    rows_al = _aligned(winp, oy0, M, 0, S, wp)  # (M, S+3, NB)
    return _aligned(rows_al, ox0, M, 1, S, wp)  # (M, M, NB)


def _tent_sample(patch, p, rows_out: int, axis: int):
    """Σ_o max(0, 1-|p-o|) * patch[o : o+rows_out] along `axis`,
    o in [0, 2*_GUARD+1] — fused integer-shift select + fractional
    blend against the guard patch. `p` (1, NB) is the real-valued shift
    in [0, 2*_GUARD+1); exactly two taps are nonzero per lane, so this
    reproduces the bilinear blend bit-for-bit up to fp reassociation."""
    taps = 2 * _GUARD + 2
    acc = None
    for o in range(taps):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(p - float(o)))[None]
        term = w * lax.slice_in_dim(patch, o, o + rows_out, axis=axis)
        acc = term if acc is None else acc + term
    return acc


def _refine_kernel(
    io_ref, win1_ref, win2_ref, out_ref, vx_ref, vy_ref, conv_ref,
    pint_ref, base_ref, *,
    S: int, win: int, iters: int, eps: float, min_eig_threshold: float,
    exit_mult: float,
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
    # rule as the lanes path (`remaining * exit_mult > n_active0`, i.e.
    # stop once ~1-1/exit_mult of the block's active points converged or
    # froze) — but evaluated PER LANE BLOCK, so an easy block stops
    # issuing vector work the trip after it converges while a hard block
    # keeps going. A skipped trip costs one (1, NB) VMEM read + reduce;
    # an executed trip is pure VMEM/vreg arithmetic. This is what the
    # fixed-trip variant lost 2x+ on (A/B: 17.52 ms/step vs lanes 8.43 —
    # it paid the full 30-iteration budget against a ~10-iter average).
    #
    # CACHED INTEGER PATCH (round-5): the round-4 kernel re-ran the full
    # aligned-select sampler (~n_off masked passes over the whole VMEM
    # stack) every iteration and LOST to the XLA lanes path (8.02 vs
    # 6.85 ms/step) — the loop is VPU-select-bound, not HBM-bound, so
    # VMEM residency alone bought nothing. But a Gauss-Newton step is
    # sub-pixel after the first iteration or two: floor(q2) — the
    # integer alignment — almost never changes. So the (wp+1, wp+1)
    # INTEGER-aligned patch lives in VMEM scratch (pint_ref) and each
    # iteration pays only the 4-FMA fractional blend (~wp^2 work,
    # ~5x less than the full select); the select re-runs only on trips
    # where some active unconverged lane's integer base moved
    # (pl.when(need) — block-granular, like the early exit).
    active0_f = active0.astype(f32)
    n_active0 = jnp.maximum(jnp.sum(active0_f), 1.0)
    vx_ref[...] = v0x.astype(f32)
    vy_ref[...] = v0y.astype(f32)
    conv_ref[...] = jnp.zeros(v0x.shape, f32)
    base_ref[...] = jnp.concatenate(
        [jnp.full((2,) + v0x.shape[1:], -1e6, f32),
         jnp.zeros((1,) + v0x.shape[1:], f32)], axis=0
    )  # impossible bases force the first extraction; row 2 = counter

    # Loop form: lax.while_loop with a PURELY SCALAR carry (it, rem) —
    # unlike vector carries, scalar scf.while legalizes on this Mosaic
    # toolchain. A converged block EXITS the loop instead of paying
    # ~20 predicated-off trips of loop/predicate overhead (the fori +
    # pl.when form measured ~1 us per skipped trip per block).
    def wcond(c):
        it, rem = c
        return (it < iters) & (rem * exit_mult > n_active0)

    def wbody(c):
        it, rem = c
        vx = vx_ref[...]
        vy = vy_ref[...]
        conv = conv_ref[...]
        q2x = q20x + vx
        q2y = q20y + vy
        out_w = (
            (q2x < lo) | (q2x > hi) | (q2y < lo) | (q2y > hi)
        ).astype(f32)
        live = active0_f * (1.0 - conv) * (1.0 - out_w)
        halfw = float((wp - 1) // 2)
        span = float(2 * _GUARD + 1)
        bases = base_ref[...]
        # shift into the cached guard patch; valid while p in [0, span)
        p_y = q2y - halfw - bases[0:1]
        p_x = q2x - halfw - bases[1:2]
        drifted = (
            (p_y < 0.0) | (p_y >= span) | (p_x < 0.0) | (p_x >= span)
        ).astype(f32)
        need = jnp.sum(live * drifted)

        @pl.when(need > 0.0)
        def _():
            half_i = (wp - 1) // 2
            oy0 = jnp.clip(
                jnp.floor(q2y).astype(jnp.int32) - half_i - _GUARD,
                -1, S - wp + 1,
            )
            ox0 = jnp.clip(
                jnp.floor(q2x).astype(jnp.int32) - half_i - _GUARD,
                -1, S - wp + 1,
            )
            pint_ref[...] = _extract_guard_patch(win2, oy0, ox0, wp, S)
            base_ref[...] = jnp.concatenate(
                [oy0.astype(f32), ox0.astype(f32), bases[2:3] + 1.0],
                axis=0,
            )  # row 2 counts extractions (telemetry, out row 3)

        nb = base_ref[...]  # re-read: origins may have just moved
        p_y = q2y - halfw - nb[0:1]
        p_x = q2x - halfw - nb[1:2]
        patch = pint_ref[...]
        rows_i = _tent_sample(patch, p_y, wp, 0)  # (wp, M, NB)
        I = _tent_sample(rows_i, p_x, wp, 1)[1:-1, 1:-1]
        dI = I - T
        bx_g = red(dI * Tx)
        by_g = red(dI * Ty)
        dvx = -(gyy * bx_g - gxy * by_g) * inv_det
        dvy = -(-gxy * bx_g + gxx * by_g) * inv_det
        vx_ref[...] = vx + live * dvx
        vy_ref[...] = vy + live * dvy
        now_conv = jnp.maximum(
            (dvx * dvx + dvy * dvy < eps * eps).astype(f32), out_w
        )
        conv_new = jnp.maximum(conv, now_conv)
        conv_ref[...] = conv_new
        return it + 1, jnp.sum(active0_f * (1.0 - conv_new))

    lax.while_loop(
        wcond, wbody, (jnp.asarray(0, jnp.int32), n_active0)
    )
    vx = vx_ref[...]
    out_ref[...] = jnp.concatenate(
        [vx, vy_ref[...], solvable.astype(f32), base_ref[2:3]]
        + [jnp.zeros(vx.shape, f32)] * (out_ref.shape[0] - 4),
        axis=0,
    )  # row 3: per-block extraction count (rebase telemetry)


@functools.partial(
    jax.jit,
    static_argnames=("S", "win", "iters", "eps", "min_eig_threshold",
                     "exit_mult", "interpret"),
)
def _refine_call(
    io, win1p, win2p, *,
    S, win, iters, eps, min_eig_threshold, exit_mult, interpret,
):
    Sp, _, Np = win1p.shape
    wp = win + 2
    NB = _block_lanes(Sp, win1p.dtype.itemsize, wp)
    NB = min(NB, Np)
    kernel = functools.partial(
        _refine_kernel,
        S=S, win=win, iters=iters, eps=eps,
        min_eig_threshold=min_eig_threshold, exit_mult=exit_mult,
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
            pltpu.VMEM(
                (wp + 1 + 2 * _GUARD, wp + 1 + 2 * _GUARD, NB),
                jnp.float32,
            ),  # cached guard patch
            pltpu.VMEM((3, NB), jnp.float32),  # (by, bx) bases + extract count
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
    NB = min(
        _block_lanes(Sp, win1p.dtype.itemsize, config.win + 2),
        _round_up(N, 128),
    )
    # stacks normally arrive pre-padded to the 128 grid (ops/lk.py
    # _lanes_width) so these pads are no-ops on the hot path; each stack
    # pads independently (a tier-compacted template cache can be
    # narrower than the freshly built search stack)
    Np = _round_up(max(N, win1p.shape[2], win2p.shape[2]), NB)
    if Np != win1p.shape[2]:
        win1p = jnp.pad(
            win1p, ((0, 0), (0, 0), (0, Np - win1p.shape[2]))
        )
    if Np != win2p.shape[2]:
        win2p = jnp.pad(
            win2p, ((0, 0), (0, 0), (0, Np - win2p.shape[2]))
        )
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
        exit_mult=float(config.exit_mult),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )
    v = jnp.stack([out[0, :N], out[1, :N]], axis=1)
    return v, out[2, :N] > 0.5
