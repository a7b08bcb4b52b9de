"""Tiered lane capacity (VOConfig.tier_capacities): compaction/expansion
transforms and the TrackingVO tier schedule.

The LK cost scales with ALLOCATED lanes, not live tracks (lanes storage
is (S+10, S+10, N) regardless of validity), so decayed stretches between
re-detects can run in a smaller compiled program. New component — the
reference has no analogue (its LK cost scales with the live point count,
feature_tracking.cpp:174-180)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.data.synthetic import SyntheticSequence
from vo_tpu.frontend.orb import OrbConfig
from vo_tpu.models.vo import (
    TrackingVO,
    VOConfig,
    _compact_tracking_state,
    _expand_tracking_state,
)


def _cfg(**kw):
    return VOConfig(
        orb=OrbConfig(nfeatures=400, n_levels=3),
        ransac_iters=128,
        fallback_gate="sync",
        **kw,
    )


@pytest.fixture(scope="module")
def tracked_state():
    seq = SyntheticSequence.generate(n_frames=3, shape=(240, 320))
    vo = TrackingVO(seq.K, _cfg())
    st = vo.init(seq.frame(0))
    st, _ = vo.step(st, seq.frame(1))  # populates prev3d + lk cache
    return seq, vo, st


class TestCompactExpand:
    def test_roundtrip_preserves_valid_tracks(self, tracked_state):
        seq, vo, st = tracked_state
        cap = vo.capacity
        k_small = (cap // 2) // 8 * 8
        # keep only k_small-ish valid tracks so compaction is lossless
        valid = np.asarray(st.pts_valid)
        keep = np.where(valid)[0][: k_small // 2]
        mask = np.zeros(cap, bool)
        mask[keep] = True
        st = st._replace(
            pts_valid=jnp.asarray(mask),
            prev3d_valid=st.prev3d_valid & jnp.asarray(mask),
        )
        small = _compact_tracking_state(st, k_small, vo.cfg)
        assert small.pts.shape[0] == k_small
        assert int(small.pts_valid.sum()) == len(keep)
        # the valid (pts, prev3d) rows survive as a SET (slots renumber)
        def rows(s):
            v = np.asarray(s.pts_valid)
            both = np.concatenate(
                [np.asarray(s.pts)[v], np.asarray(s.prev3d)[v]], axis=1
            )
            return both[np.lexsort(both.T)]

        np.testing.assert_array_equal(rows(st), rows(small))

        back = _expand_tracking_state(small, cap, vo.cfg)
        assert back.pts.shape[0] == cap
        np.testing.assert_array_equal(rows(back), rows(st))
        # window stacks keep per-slot content through the roundtrip
        lane_ax = 2 if vo.cfg.lk.layout != "batch" else 0
        w0 = np.moveaxis(np.asarray(st.lk_cache.wins[0]), lane_ax, 0)
        ws = np.moveaxis(np.asarray(small.lk_cache.wins[0]), lane_ax, 0)
        v = np.asarray(st.pts_valid)
        order = np.argsort(~v, stable=True)[: k_small]
        # the pallas layout stores a 128-aligned lane width; lanes past
        # k_small are junk no consumer reads — compare the live ones
        np.testing.assert_array_equal(ws[:k_small], w0[order])

    def test_compacted_step_matches_full(self, tracked_state):
        """One tracking step from a compacted state vs the same state at
        full capacity: tracked points are per-lane (identical up to slot
        order); the pose can move within RANSAC near-tie noise because
        the sample draw keys off slot numbering — decomposed bounds as
        in parallel/vo_step.parity_vs_single_device."""
        import functools

        import jax

        from vo_tpu.models.vo import _track_step

        seq, vo, st = tracked_state
        cap = vo.capacity
        k_small = (cap // 2) // 8 * 8
        valid = np.asarray(st.pts_valid)
        keep = np.where(valid)[0][: k_small // 2]
        mask = np.zeros(cap, bool)
        mask[keep] = True
        st = st._replace(
            pts_valid=jnp.asarray(mask),
            prev3d_valid=st.prev3d_valid & jnp.asarray(mask),
        )
        img = jnp.asarray(seq.frame(2), jnp.float32)
        K = jnp.asarray(seq.K, jnp.float32)
        fn = jax.jit(functools.partial(_track_step, cfg=vo.cfg))
        _, out_full = fn(st, img, K)
        small = _compact_tracking_state(st, k_small, vo.cfg)
        _, out_small = fn(small, img, K)
        assert int(out_full.n_assoc) == int(out_small.n_assoc)
        Pf, Ps = np.asarray(out_full.pose), np.asarray(out_small.pose)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(Pf[:3, :3].T @ Ps[:3, :3]) - 1) / 2, -1, 1)))
        assert ang < 0.5, ang
        tf, ts = Pf[:3, 3], Ps[:3, 3]
        assert np.linalg.norm(tf - ts) < 0.15 * max(
            np.linalg.norm(tf), 1e-6
        ), (tf, ts)


class TestTierSchedule:
    def test_tier_drops_and_refresh_restores(self, tracked_state):
        seq, _, _ = tracked_state
        cfg = _cfg(tier_capacities=(192,), min_tracked=30)
        vo = TrackingVO(seq.K, cfg)
        st = vo.init(seq.frame(0))
        st, out = vo.step(st, seq.frame(1))
        assert vo._tier == vo.capacity
        # doctor the survivor count the gate sees: above min_tracked
        # (no refresh) but under 90% of the tier -> compaction
        valid = np.asarray(st.pts_valid)
        keep = np.where(valid)[0][:100]
        mask = np.zeros(vo.capacity, bool)
        mask[keep] = True
        st = st._replace(
            pts_valid=jnp.asarray(mask),
            prev3d_valid=st.prev3d_valid & jnp.asarray(mask),
        )
        vo._gate._inbox.clear()
        vo._gate.push(jnp.asarray(100, jnp.int32))
        st, out = vo.step(st, seq.frame(2))
        assert vo._tier == 192
        assert st.pts.shape[0] == 192
        # now a sub-threshold count forces a refresh -> full capacity
        vo._gate._inbox.clear()
        vo._gate.push(jnp.asarray(5, jnp.int32))
        st, out = vo.step(st, seq.frame(2))
        assert bool(out.fallback)
        assert vo._tier == vo.capacity
        assert st.pts.shape[0] == vo.capacity

    def test_expand_state_for_checkpoints(self, tracked_state):
        seq, _, _ = tracked_state
        cfg = _cfg(tier_capacities=(192,))
        vo = TrackingVO(seq.K, cfg)
        st = vo.init(seq.frame(0))
        small = _compact_tracking_state(st, 192, cfg)
        full = vo.expand_state(small)
        assert full.pts.shape[0] == vo.capacity
        assert vo.expand_state(full) is full  # no-op at capacity
