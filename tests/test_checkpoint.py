"""Checkpoint/resume tests: structural save/load of state pytrees and the
resumable host loop (new aux subsystem — the reference has none,
SURVEY.md §5)."""

import numpy as np
import pytest

from vo_tpu.runtime.checkpoint import (
    CheckpointingRunner,
    load_state,
    save_state,
)


class TestSaveLoad:
    def test_roundtrip_pytree(self, tmp_path):
        import jax.numpy as jnp
        from vo_tpu.models.vo import MatchingState

        state = MatchingState(
            pts=jnp.arange(8.0).reshape(4, 2),
            desc=jnp.ones((4, 16), jnp.uint8),
            valid=jnp.asarray([True, False, True, True]),
            prev3d=jnp.zeros((4, 3)),
            prev3d_valid=jnp.zeros(4, bool),
            pose=jnp.eye(4),
            key=jnp.zeros(2, jnp.uint32),
        )
        f = str(tmp_path / "s.npz")
        save_state(state, f, frame_idx=17)
        restored, idx = load_state(state, f)
        assert idx == 17
        for a, b in zip(
            __import__("jax").tree.leaves(state),
            __import__("jax").tree.leaves(restored),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self, tmp_path):
        import jax.numpy as jnp

        f = str(tmp_path / "s.npz")
        save_state({"a": jnp.zeros((3,))}, f)
        with pytest.raises(ValueError):
            load_state({"a": jnp.zeros((4,))}, f)


class TestGateSnapshot:
    """The round-4 gate rewrite broke resume silently (VERDICT r4 #1);
    these pin the host-side gate capture/restore to the live schema."""

    def _runner_with_gate(self):
        from vo_tpu.models.vo import _AsyncScalarGate

        class FakePipe:
            pass

        pipe = FakePipe()
        pipe._gate = _AsyncScalarGate(threshold=150, mode="sync")
        return CheckpointingRunner(pipe, "/dev/null"), pipe._gate

    def test_pending_low_survives_roundtrip(self):
        runner, gate = self._runner_with_gate()
        # a low count arrived (sticky bit set) but the trigger hasn't
        # fired yet; a resume must preserve the pending re-detect
        gate.push(np.int32(10))
        assert gate.update() is True  # fires, resets pending
        gate.push(np.int32(10))  # below threshold, step > last_trigger...
        gate._inbox.clear()  # ...but simulate "already drained" state
        gate._pending_low = True
        snap = runner._capture_host()
        assert snap["gate"]["pending_low"] is True

        runner2, gate2 = self._runner_with_gate()
        runner2._restore_host(snap)
        assert gate2._pending_low is True
        assert gate2._step == gate._step
        assert gate2._last_trigger == gate._last_trigger
        assert gate2.update() is True  # the pending trigger still fires

    def test_inbox_survives_roundtrip(self):
        runner, gate = self._runner_with_gate()
        gate.push(np.int32(500))
        gate.push(np.int32(7))
        snap = runner._capture_host()
        runner2, gate2 = self._runner_with_gate()
        runner2._restore_host(snap)
        assert [(i, int(v)) for i, v in gate2._inbox] == [(1, 500), (2, 7)]
        assert gate2.update() is True  # the enqueued low value triggers

    def test_inbox_vec_entries_roundtrip(self):
        """(2,) [dip latch, count] gate-feed entries (FrameOutput.gate)
        survive capture/restore with latch semantics intact."""
        runner, gate = self._runner_with_gate()
        gate.push(np.asarray([0, 500], np.int32))
        gate.push(np.asarray([1, 400], np.int32))  # latched dip
        snap = runner._capture_host()
        runner2, gate2 = self._runner_with_gate()
        runner2._restore_host(snap)
        assert [(i, v.tolist()) for i, v in gate2._inbox] == [
            (1, [0, 500]), (2, [1, 400])
        ]
        # the latch (not the count-vs-threshold rule) drives the trigger
        assert gate2.update() is True

    def test_stale_schema_fails_loudly(self):
        runner, gate = self._runner_with_gate()
        snap = runner._capture_host()
        snap["gate"]["schema"] = 1  # pretend a pre-rewrite checkpoint
        with pytest.raises(ValueError, match="gate schema"):
            runner._restore_host(snap)


@pytest.mark.slow
class TestResume:
    def test_resume_matches_uninterrupted(self, tmp_path):
        from vo_tpu.data.synthetic import SyntheticSequence
        from vo_tpu.frontend.orb import OrbConfig
        from vo_tpu.models.vo import TrackingVO, VOConfig

        seq = SyntheticSequence.generate(n_frames=12, shape=(240, 320))
        cfg = VOConfig(
            orb=OrbConfig(nfeatures=400, n_levels=3), ransac_iters=128
        )
        vo = TrackingVO(seq.K, cfg)

        f = str(tmp_path / "ckpt.npz")
        full = CheckpointingRunner(vo, str(tmp_path / "other.npz"), every=100)
        est_full, *_ = full.run(seq)

        # run that checkpoints every 4 frames, then a fresh runner resumes
        r1 = CheckpointingRunner(vo, f, every=4)
        est1, *_ = r1.run(seq)
        r2 = CheckpointingRunner(vo, f, every=4)
        est2, *_ = r2.run(seq)  # resumes at frame 9, replays the tail
        # resumed tail must agree with the checkpointed run
        np.testing.assert_allclose(est1, est_full, atol=1e-5)
        np.testing.assert_allclose(est2[9:], est1[9:], atol=1e-4)
