"""Per-frame divergence diagnostic on the hard synthetic sequence.

Runs a preset, compares each frame's estimated relative motion against
ground truth, and prints the frames where heading/scale error spikes
together with the pipeline stats (n_assoc, n_inliers, scale, fallback)
— locates WHERE a failure trajectory forks and what gate would catch it.

Usage: python scripts/diag_trajectory.py [preset] [--frames N] [--seed S]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset", nargs="?", default="tracking_sift")
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import vo_tpu  # noqa: F401
    from vo_tpu.data.synthetic import SyntheticSequence
    from vo_tpu.runtime.presets import get_preset
    from vo_tpu.utils.metrics import evaluate_paths

    seq = SyntheticSequence.generate_hard(n_frames=args.frames, seed=args.seed)
    preset = get_preset(args.preset)
    pipeline = preset.build(seq.K)
    est, gt, scales, stats = preset.run(seq, pipeline)

    m = evaluate_paths(gt, est, scales)
    print(json.dumps({
        "config": args.preset, "seed": args.seed,
        "ate_rmse": round(float(m["ate_rmse"]), 2),
        "rpe_rmse": round(float(m["rpe_rmse"]), 3),
    }), flush=True)

    # per-frame step vectors (x, z)
    dg = np.diff(gt, axis=0)
    de = np.diff(est, axis=0)
    glen = np.linalg.norm(dg, axis=1)
    elen = np.linalg.norm(de, axis=1)
    dot = np.sum(dg * de, axis=1) / np.maximum(glen * elen, 1e-9)
    ang = np.degrees(np.arccos(np.clip(dot, -1, 1)))  # heading error/step

    dropped = [
        any(a <= i < b for a, b in seq.dropouts) for i in range(len(seq))
    ]
    print("\nworst 30 per-step heading errors:")
    order = np.argsort(-ang)
    for i in sorted(order[:30]):
        s = stats[i + 1]
        print(
            f"  frame {i+1:4d} drop={int(dropped[i+1])} "
            f"ang={ang[i]:6.1f}deg len_gt={glen[i]:5.2f} "
            f"len_est={elen[i]:5.2f} n_assoc={s.get('n_assoc', -1):4d} "
            f"n_inl={s.get('n_inliers', -1):4d} "
            f"scale={s.get('scale', -1):5.2f} fb={int(s.get('fallback', 0))}"
        )
    # summary by dropout membership
    ang_d = [a for a, d in zip(ang, dropped[1:]) if d]
    ang_n = [a for a, d in zip(ang, dropped[1:]) if not d]
    print(f"\nheading err median: dropout {np.median(ang_d):.2f} deg "
          f"({len(ang_d)} frames), normal {np.median(ang_n):.2f} deg")
    print(f"heading err p95:    dropout {np.percentile(ang_d, 95):.1f}, "
          f"normal {np.percentile(ang_n, 95):.1f}")
    inl = np.array([s.get("n_inliers", 0) for s in stats[1:]])
    asc = np.array([s.get("n_assoc", 0) for s in stats[1:]])
    print(f"n_inliers median dropout "
          f"{np.median(inl[np.array(dropped[1:])]):.0f}, normal "
          f"{np.median(inl[~np.array(dropped[1:])]):.0f}")
    print(f"n_assoc   median dropout "
          f"{np.median(asc[np.array(dropped[1:])]):.0f}, normal "
          f"{np.median(asc[~np.array(dropped[1:])]):.0f}")


if __name__ == "__main__":
    main()
