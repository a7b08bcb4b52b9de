"""Localize where matching_orb loses to its cv2 anchor (VERDICT r4 #6).

Works from committed result bundles (results_tpu*/...): for each seed it
compares the TPU preset's and the cv2 anchor's PER-STEP motion — step
heading error and step length ratio against ground truth — and
aggregates them by sequence segment (the hard sequence's three texture
dropout stretches vs clean driving), plus around re-detect regions.
Both pipelines ran on the SAME frames, so any segment where the TPU
column is systematically worse localizes the deficit to a stage
(detection quality in that regime, matching, or scale pairing) without
needing keypoint-level instrumentation.

Usage: python scripts/diag_matching.py [--out results_tpu]
       [--config matching_orb] [--anchor cv2ref_matching_orb]
       [--seeds 0,1,2] [--frames 1000]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seed_dir(out: str, seed: int) -> str:
    return out if seed == 0 else os.path.join(out, f"seed{seed}")


def load_path(bundle: str):
    est = np.loadtxt(os.path.join(bundle, "est_path.txt"))
    gt = np.loadtxt(os.path.join(bundle, "gt_path.txt"))
    return est, gt


def step_errors(est: np.ndarray, gt: np.ndarray):
    """Per-step (heading error deg, length ratio est/gt) from x-z paths."""
    de = np.diff(est, axis=0)
    dg = np.diff(gt, axis=0)
    ne = np.linalg.norm(de, axis=1)
    ng = np.linalg.norm(dg, axis=1)
    cos = np.sum(de * dg, axis=1) / np.maximum(ne * ng, 1e-12)
    ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    ratio = ne / np.maximum(ng, 1e-12)
    return ang, ratio


def segments(n: int):
    """The hard sequence's dropout windows (data/synthetic.py
    generate_hard) + the complementary clean stretches."""
    k = n // 10
    drops = [(3 * k, 3 * k + k // 2), (6 * k, 6 * k + k // 3),
             (8 * k, 8 * k + k // 2)]
    segs = []
    prev = 1
    for j, (a, b) in enumerate(drops):
        segs.append((f"clean{j}", prev, a))
        segs.append((f"drop{j}", a, b))
        # re-detect recovery tail right after the dropout
        segs.append((f"post{j}", b, min(b + 30, n)))
        prev = min(b + 30, n)
    segs.append(("clean3", prev, n))
    return segs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_tpu")
    ap.add_argument("--config", default="matching_orb")
    ap.add_argument("--anchor", default="cv2ref_matching_orb")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--frames", type=int, default=1000)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    print(f"# per-step motion: {args.config} vs {args.anchor} "
          f"({args.out})")
    for seed in seeds:
        d = seed_dir(args.out, seed)
        try:
            est_t, gt = load_path(os.path.join(d, args.config))
            est_c, _ = load_path(os.path.join(d, args.anchor))
        except OSError as e:
            print(f"seed {seed}: missing bundle ({e})")
            continue
        ang_t, rat_t = step_errors(est_t, gt)
        ang_c, rat_c = step_errors(est_c, gt)
        n = min(len(ang_t), len(ang_c)) + 1
        print(f"\n## seed {seed}  "
              f"(medians over steps: heading deg, |log length ratio|)")
        print(f"{'segment':>8} {'frames':>10} "
              f"{'tpu_head':>9} {'cv2_head':>9} "
              f"{'tpu_len':>8} {'cv2_len':>8}  worse")
        for name, a, b in segments(args.frames):
            a, b = max(a, 1), min(b, n)
            if b <= a:
                continue
            sl = slice(a - 1, b - 1)
            th = float(np.median(ang_t[sl]))
            ch = float(np.median(ang_c[sl]))
            tl = float(np.median(np.abs(np.log(
                np.maximum(rat_t[sl], 1e-9)))))
            cl = float(np.median(np.abs(np.log(
                np.maximum(rat_c[sl], 1e-9)))))
            worse = []
            if th > 1.5 * ch + 0.2:
                worse.append("HEADING")
            if tl > 1.5 * cl + 0.02:
                worse.append("SCALE")
            print(f"{name:>8} {a:>4}-{b:<5} "
                  f"{th:>9.2f} {ch:>9.2f} {tl:>8.3f} {cl:>8.3f}  "
                  f"{'+'.join(worse)}")
        # cumulative heading error drift (the ATE driver on this metric)
        cum_t = float(np.sum(ang_t[: n - 1]))
        cum_c = float(np.sum(ang_c[: n - 1]))
        print(f"   total |heading err|: tpu {cum_t:.0f} deg, "
              f"cv2 {cum_c:.0f} deg; "
              f"scale bias: tpu {np.median(rat_t):.4f}, "
              f"cv2 {np.median(rat_c):.4f}")


if __name__ == "__main__":
    main()
