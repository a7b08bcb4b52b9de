"""Async fallback-gate semantic deviation, bounded (VERDICT item 10).

The reference re-detects on the SAME frame the survivor count drops below
150 (feature_tracking.cpp:69-71). Our async gate fires a few frames later
(device->host latency; models/vo.py _AsyncScalarGate). On the CPU backend
values arrive instantly, so the lag is simulated here by delaying count
delivery by k frames — the trajectory deviation between sync (reference
semantics) and lagged-async is then measured on a sequence whose
texture-poor stretch forces fallbacks.
"""

from __future__ import annotations

import numpy as np

from vo_tpu.data.synthetic import SyntheticSequence
from vo_tpu.frontend.orb import OrbConfig
from vo_tpu.models.vo import TrackingVO, VOConfig, _AsyncScalarGate, run_vo


class _LaggedGate(_AsyncScalarGate):
    """Sync gate whose values arrive `lag` steps late — a deterministic
    stand-in for the tunneled-TPU readback latency."""

    def __init__(self, threshold: int, lag: int):
        super().__init__(threshold, mode="sync")
        self.lag = lag
        self._pending: list = []

    def push(self, scalar) -> None:
        self._pending.append(scalar)
        if len(self._pending) > self.lag:
            super().push(self._pending.pop(0))
        else:
            self._step += 1  # keep step numbering aligned


def _run(seq, lag: int | None):
    # min_tracked sits just under the initial detection count, so natural
    # track attrition crosses it mid-sequence (texture dropouts alone do
    # not kill LK tracks: templates keep enough gradient to converge)
    cfg = VOConfig(
        orb=OrbConfig(nfeatures=500, n_levels=4),
        min_tracked=470,
        fallback_gate="sync",
    )
    vo = TrackingVO(seq.K, cfg)
    if lag is not None:
        vo._gate = _LaggedGate(cfg.min_tracked, lag)
    est, gt, scales, stats = run_vo(seq, vo)
    n_fb = sum(1 for s in stats[1:] if s["fallback"])
    return est, gt, n_fb


def test_gate_catches_dip_batched_with_recovery():
    """A transient health dip must trigger even when it arrives in the
    same drain batch as a newer healthy value (the 55-vs-146 m stall
    fork: keying on the newest arrived value alone let host timing mask
    one-frame dips)."""
    import jax.numpy as jnp

    gate = _AsyncScalarGate(threshold=150, mode="async")
    gate.push(jnp.asarray(200))  # healthy
    gate.push(jnp.asarray(90))  # dip
    gate.push(jnp.asarray(210))  # recovered — arrives in the same batch
    assert gate.update() is True
    # after the trigger, in-flight pre-refresh values must not re-trigger
    assert gate.update() is False
    gate.push(jnp.asarray(80))  # post-refresh count still low
    assert gate.update() is True


class _NeverReady:
    """Device-scalar stand-in whose async copy never completes — the
    tunneled-TPU failure mode under a pure-dispatch host loop (run_vo
    fetches nothing until after the loop, so is_ready() never flips)."""

    def __init__(self, v):
        self.v = v

    def is_ready(self):
        return False

    def __int__(self):
        return self.v


def test_gate_staleness_bound_forces_drain():
    """Entries older than gate_max_lag dispatches must drain BLOCKING
    even when is_ready() never reports true — without this the gate was
    measured inert over whole sequences (tracking_sift clean seed 0:
    fallbacks=0 for 1000 frames, 146 m stall)."""
    gate = _AsyncScalarGate(threshold=150, mode="async", max_lag=8)
    fired_at = None
    for i in range(1, 20):
        gate.push(_NeverReady(90))  # below threshold, never ready
        if gate.update():
            fired_at = i
            break
    # entry from step 1 drains once the lag bound is reached
    assert fired_at is not None and fired_at <= 9, fired_at
    # healthy post-refresh counts: the stale-drain path must not
    # re-trigger off them (pre-refresh 90s still in flight are ignored:
    # their step index predates the trigger)
    for _ in range(32):
        gate.push(_NeverReady(200))
        assert gate.update() is False


def test_async_gate_deviation_is_bounded():
    seq = SyntheticSequence.generate(n_frames=24, shape=(240, 320),
                                     n_points=1500)
    est_sync, gt, fb_sync = _run(seq, lag=None)
    est_lag, _, fb_lag = _run(seq, lag=3)

    assert fb_sync >= 1, "sequence failed to force a fallback (sync)"
    assert fb_lag >= 1, "sequence failed to force a fallback (lagged)"

    path = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())
    ate = lambda est: float(
        np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1)))
    )
    # the lagged gate re-detects a few frames later; both must stay in a
    # sane envelope (fallback frames re-detect mid-turn, so this sequence
    # is deliberately not an easy one) and near EACH OTHER — the latter
    # is the actual semantic-deviation claim
    assert ate(est_sync) < 0.3 * path
    assert ate(est_lag) < 0.35 * path
    assert abs(ate(est_lag) - ate(est_sync)) < 0.10 * path
