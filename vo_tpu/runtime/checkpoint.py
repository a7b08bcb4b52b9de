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


def save_state(state, filename: str, frame_idx: int | None = None) -> None:
    """Serialize any pipeline-state pytree to one .npz file."""
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
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, expected {len(ref_leaves)}"
            " — config/pipeline mismatch"
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


class CheckpointingRunner:
    """run_vo-style host loop with periodic checkpoints and resume.

    Usage:
        runner = CheckpointingRunner(pipeline, "ckpt.npz", every=50)
        est, gt, scales, stats = runner.run(seq)   # resumes if ckpt exists
    Only the pipeline state and cursor are checkpointed; the per-frame
    logs before the resume point are re-derived from the checkpointed
    aggregates (paths up to the cursor are stored alongside)."""

    def __init__(self, pipeline, ckpt_file: str, every: int = 100):
        self.pipeline = pipeline
        self.ckpt_file = ckpt_file
        self.every = max(1, every)

    def run(self, seq, verbose: bool = False):
        gt_poses = seq.poses
        start = 1
        state = self.pipeline.init(seq.frame(0))
        est_path = [np.asarray(_pose_of(state))[[0, 2], 3]]

        side = self.ckpt_file + ".paths.npz"
        if os.path.exists(self.ckpt_file) and os.path.exists(side):
            state, cursor = load_state(state, self.ckpt_file)
            with np.load(side) as z:
                est_path = [row for row in z["est"]]
            start = int(cursor)
            if verbose:
                print(f"resumed at frame {start}")

        scales, stats = [(1.0, 1.0)], [{}]
        gt_path = [gt_poses[0][[0, 2], 3]]
        for i in range(1, len(seq)):
            if i < start:
                gt_path.append(gt_poses[i][[0, 2], 3])
                scales.append((1.0, 1.0))
                stats.append({"resumed": True})
                continue
            state, out = self.pipeline.step(state, seq.frame(i))
            pose = np.asarray(_pose_of_out(out))
            est_path.append(pose[[0, 2], 3])
            gt_path.append(gt_poses[i][[0, 2], 3])
            gt_s = float(
                np.linalg.norm(gt_poses[i][:3, 3] - gt_poses[i - 1][:3, 3])
            )
            est_s = float(np.linalg.norm(est_path[-1] - est_path[-2]))
            scales.append((max(gt_s, 1e-9), max(est_s, 1e-9)))
            stats.append({"n_assoc": int(_field(out, "n_assoc", 0))})
            if i % self.every == 0:
                save_state(state, self.ckpt_file, frame_idx=i + 1)
                np.savez(side, est=np.asarray(est_path))
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
