"""Checkpoint / resume for pipeline state pytrees.

The reference has no checkpointing: paths are dumped only at the end
(savePaths, feature_tracking.cpp:330-357) and a crash loses the run
(SURVEY.md §5). Here the whole VO state is an explicit pytree (poses,
tracked points, window ring buffers, PRNG key), so checkpointing is a
structural save of (leaves, treedef-repr) plus the frame cursor — npz on
local disk, no extra dependencies. Works for TrackingState /
MatchingState / TrackingBAState / ThreeFrameState alike.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

# Version tag for the serialized fallback-gate snapshot. Bump whenever
# _AsyncScalarGate (models/vo.py) changes its host-side state so that a
# stale checkpoint fails loudly with a version message instead of a
# generic AttributeError/mismatch deep in resume (the round-4 gate
# rewrite broke exactly this silently).
GATE_SCHEMA = 3  # 3: inbox entries are (2,) [dip latch, count] vectors

# Version tag for the device-state PYTREE layout (leaf set/order). Bump
# when a pipeline state gains/loses a leaf (e.g. TrackingState.health in
# round 4) so a stale checkpoint's leaf-count mismatch can name the skew
# instead of reading as a config error.
STATE_SCHEMA = 3  # 3: TrackingState/TrackingBAState gained the dipped latch leaf


def save_state(
    state,
    filename: str,
    frame_idx: int | None = None,
    extra_meta: dict | None = None,
) -> None:
    """Serialize any pipeline-state pytree to one .npz file.

    `extra_meta` (JSON-serializable) rides in the same atomic write as the
    frame cursor — anything that must stay consistent with the state
    (host-side counters, gate snapshots) belongs here, not in side files."""
    leaves, treedef = jax.tree.flatten(state)

    def to_np(l):
        a = np.asarray(l)
        # npz can't store ml_dtypes (bfloat16 etc.); widen losslessly —
        # load_state casts back to the reference leaf's dtype
        if a.dtype.kind not in "biufc?":
            a = a.astype(np.float32)
        return a

    arrays = {f"leaf_{i}": to_np(l) for i, l in enumerate(leaves)}
    meta = {
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "frame_idx": frame_idx,
        "state_schema": STATE_SCHEMA,
        **(extra_meta or {}),
    }
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    tmp = filename + ".tmp.npz"  # savez keeps the name (.npz suffix)
    np.savez(tmp, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, filename)


def load_state(state_like, filename: str):
    """Restore a checkpoint into the structure of `state_like` (a state of
    the same pipeline/config — shapes must match). Returns
    (state, frame_idx)."""
    with np.load(filename, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    ref_leaves, treedef = jax.tree.flatten(state_like)
    if len(ref_leaves) != len(leaves):
        got_schema = meta.get("state_schema", 1)
        hint = (
            f" (checkpoint state_schema={got_schema}, current "
            f"{STATE_SCHEMA} — written by an older state layout)"
            if got_schema != STATE_SCHEMA
            else " — config/pipeline mismatch"
        )
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, expected "
            f"{len(ref_leaves)}{hint}"
        )
    for i, (a, b) in enumerate(zip(leaves, ref_leaves)):
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(
                f"leaf {i} shape {a.shape} != expected {np.shape(b)}"
            )
    import jax.numpy as jnp

    new_leaves = [
        jnp.asarray(a, dtype=np.asarray(b).dtype)
        for a, b in zip(leaves, ref_leaves)
    ]
    return jax.tree.unflatten(treedef, new_leaves), meta["frame_idx"]


def load_meta(filename: str) -> dict:
    """Read just the JSON metadata of a checkpoint (cursor, host counters)."""
    with np.load(filename, allow_pickle=False) as z:
        return json.loads(str(z["__meta__"]))


class CheckpointingRunner:
    """run_vo / run_vo_ba-style host loop with periodic checkpoints and resume.

    Usage:
        runner = CheckpointingRunner(pipeline, "ckpt.npz", every=50)
        est, gt, scales, stats = runner.run(seq)   # resumes if ckpt exists

    Checkpointed: the device state pytree, the frame cursor, the host-side
    pipeline counters (BA frame index / window fill / fallback-gate state),
    and the per-frame logs so far (est path + scale pairs) — so a resumed
    run reproduces an uninterrupted one: BA cadence, fallback behavior, and
    the window-pose est-path rewrites are all preserved. Crash consistency:
    the host counters ride INSIDE the state npz (one atomic write with the
    cursor); the paths side file is written first, so after a crash between
    the two writes it is at most one period longer than the cursor and is
    truncated to the cursor on resume."""

    def __init__(self, pipeline, ckpt_file: str, every: int = 100):
        self.pipeline = pipeline
        self.ckpt_file = ckpt_file
        self.every = max(1, every)

    # -- host-side pipeline counters (TrackingBAVO / TrackingVO) ---------
    def _capture_host(self) -> dict:
        p, h = self.pipeline, {}
        for name in ("_frame_idx", "_win_fill"):
            if hasattr(p, name):
                h[name] = int(getattr(p, name))
        gate = getattr(p, "_gate", None)
        if gate is not None:
            # snapshot WITHOUT mutating the live gate: pending async
            # scalars are read synchronously into the snapshot's pending
            # list (restored into _inbox on resume), so a run that merely
            # crosses a checkpoint boundary behaves exactly like an
            # uncheckpointed one — the gate drains them on its own clock
            h["gate"] = {
                "schema": GATE_SCHEMA,
                "step": gate._step,
                "last_trigger": gate._last_trigger,
                # the sticky "a low count arrived but hasn't fired yet"
                # bit — without it a resume would drop a pending
                # re-detect trigger and diverge from the uninterrupted run
                "pending_low": bool(gate._pending_low),
                # entries are (2,) [dip latch, count] vectors
                # (FrameOutput.gate) or legacy plain counts; store each
                # as a list so both round-trip
                "pending": [
                    [idx, np.asarray(arr).reshape(-1).tolist()]
                    for idx, arr in gate._inbox
                ],
            }
        return h

    def _restore_host(self, h: dict) -> None:
        p = self.pipeline
        for name in ("_frame_idx", "_win_fill"):
            if name in h and hasattr(p, name):
                setattr(p, name, int(h[name]))
        gate = getattr(p, "_gate", None)
        if gate is not None and "gate" in h:
            g = h["gate"]
            got = int(g.get("schema", 1))
            if got != GATE_SCHEMA:
                raise ValueError(
                    f"checkpoint gate schema {got} != expected "
                    f"{GATE_SCHEMA} — the fallback-gate state layout "
                    "changed since this checkpoint was written; re-run "
                    "from scratch (old checkpoints are not migratable)"
                )
            # host arrays are fine in the inbox: _apply only needs
            # np.asarray, and the is_ready probe defaults to True
            def _entry(v):
                a = np.asarray(v, np.int32).reshape(-1)
                # length-1 entries are legacy plain counts (capture
                # flattens scalars to [count]); restore their rank so
                # _apply keeps the per-step threshold semantics
                return a if a.size > 1 else np.asarray(int(a[0]))

            gate._inbox = [
                (int(i), _entry(v)) for i, v in g.get("pending", [])
            ]
            gate._step = int(g["step"])
            gate._last_trigger = int(g["last_trigger"])
            gate._pending_low = bool(g["pending_low"])

    def run(self, seq, verbose: bool = False):
        gt_poses = seq.poses
        start = 1
        state = self.pipeline.init(seq.frame(0))
        est_path = [np.asarray(_pose_of(state))[[0, 2], 3]]
        scales, stats = [(1.0, 1.0)], [{}]
        Wn = getattr(getattr(self.pipeline, "wcfg", None), "window_size", 0)

        side = self.ckpt_file + ".paths.npz"
        if os.path.exists(self.ckpt_file) and os.path.exists(side):
            state, cursor = load_state(state, self.ckpt_file)
            start = int(cursor)
            meta = load_meta(self.ckpt_file)
            # host counters live in the state npz (same atomic write as
            # the cursor), so they can never desync from the device state
            if "host" in meta:
                self._restore_host(meta["host"])
            with np.load(side, allow_pickle=False) as z:
                # truncate to the cursor: the side file may be one
                # checkpoint period newer than the state file
                est_path = [row for row in z["est"][:start]]
                scales = [tuple(row) for row in z["scales"][:start]]
                if "__host__" in z and "host" not in meta:
                    # legacy checkpoints (host dict in the side file)
                    self._restore_host(json.loads(str(z["__host__"])))
            stats = [{}] + [{"resumed": True}] * (start - 1)
            if verbose:
                print(f"resumed at frame {start}")

        def _save(i, st):
            # Tiered pipelines (VOConfig.tier_capacities) may hold a
            # compacted state; checkpoints are written at full capacity
            # so resume never depends on the host tier cursor (the
            # resumed run re-compacts on its own once counts arrive).
            expand = getattr(self.pipeline, "expand_state", None)
            if expand is not None:
                st = expand(st)
            tmp = side + ".tmp.npz"
            np.savez(
                tmp,
                est=np.asarray(est_path),
                scales=np.asarray(scales),
            )
            os.replace(tmp, side)
            save_state(
                st, self.ckpt_file, frame_idx=i + 1,
                extra_meta={"host": self._capture_host()},
            )

        gt_path = [gt_poses[0][[0, 2], 3]]
        for i in range(1, len(seq)):
            if i < start:
                gt_path.append(gt_poses[i][[0, 2], 3])
                continue
            state, out = self.pipeline.step(state, seq.frame(i))
            pose = np.asarray(_pose_of_out(out))
            est_path.append(pose[[0, 2], 3])
            # BA window rewrite (with_bundle_adjustment.cpp:237-247), as
            # run_vo_ba does — a checkpointed BA run keeps its refinements.
            if Wn and hasattr(out, "ba_ran") and bool(out.ba_ran):
                wp = np.asarray(out.window_poses)
                for j in range(Wn):
                    est_path[i - Wn + 1 + j] = wp[j][[0, 2], 3]
            gt_path.append(gt_poses[i][[0, 2], 3])
            gt_s = float(
                np.linalg.norm(gt_poses[i][:3, 3] - gt_poses[i - 1][:3, 3])
            )
            est_s = float(_field(out, "scale", 1.0))
            scales.append((max(gt_s, 1e-9), max(est_s, 1e-9)))
            stats.append({"n_assoc": int(_field(out, "n_assoc", 0))})
            if i % self.every == 0:
                _save(i, state)
        return (
            np.asarray(est_path),
            np.asarray(gt_path),
            np.asarray(scales),
            stats,
        )


def _pose_of(state):
    return state.pose


def _pose_of_out(out):
    return out.frame.pose if hasattr(out, "frame") else out.pose


def _field(out, name, default):
    o = out.frame if hasattr(out, "frame") else out
    return getattr(o, name, default)
