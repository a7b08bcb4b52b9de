"""Differential harness: TPU ORB frontend vs the scalar numpy oracle.

Equivalent of the reference's `compare` executable (src/compare.cpp:13-109:
runs the CUDA ORB on 000000.png, draws keypoints + orientation arrows, and
holds a commented-out CPU-vs-GPU descriptor Hamming diff). This version
actually performs the checks the reference left commented out:

    python -m vo_tpu.runtime.compare [--image PATH] [--out PNG] [--full]

- detects with the fused TPU ORB (single level for oracle comparability);
- re-derives FAST scores, orientations, and BRIEF bits with the scalar
  numpy oracle at the detected keypoints;
- reports score/angle agreement and the descriptor bit-error rate;
- renders keypoints + orientation arrows to a PNG (matplotlib, headless).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def run_compare(image_path: str, out_png: str | None, full: bool) -> dict:
    import jax.numpy as jnp

    import vo_tpu  # noqa: F401
    from vo_tpu.data.kitti import load_gray
    from vo_tpu.frontend.orb import OrbConfig, orb_detect_and_compute
    from vo_tpu.ops.brief import BRIEF_PATTERN

    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(vo_tpu.__file__), "..", "tests"))
    from oracles import brief_bits_oracle, fast_score_oracle, orientation_oracle

    img = load_gray(image_path)
    cfg = OrbConfig(
        nfeatures=300 if not full else 1000,
        n_levels=1,  # oracle comparability: single level
        fast_threshold=20.0,
    )
    feats = orb_detect_and_compute(jnp.asarray(img), cfg)
    v = np.asarray(feats.valid)
    xs = np.asarray(feats.xs)[v].astype(int)
    ys = np.asarray(feats.ys)[v].astype(int)
    angles = np.asarray(feats.angles)[v]
    bits = np.asarray(feats.bits)[v]

    # oracle re-derivation at the detected keypoints
    score_map = fast_score_oracle(img, threshold=20.0)
    n_score_pos = int((score_map[ys, xs] > 0).sum())

    ang_err, bit_err = [], []
    pattern = np.asarray(BRIEF_PATTERN)
    for i in range(len(xs)):
        a = orientation_oracle(img, ys[i], xs[i], patch_size=31)
        d = np.angle(np.exp(1j * (angles[i] - a)))
        ang_err.append(abs(d))
        ob = brief_bits_oracle(img, ys[i], xs[i], angles[i], pattern)
        bit_err.append(np.mean(ob != bits[i]))

    report = {
        "image": image_path,
        "n_keypoints": int(v.sum()),
        "fast_score_positive_at_kp": n_score_pos,
        "orientation_max_err_rad": float(np.max(ang_err)) if ang_err else None,
        "orientation_mean_err_rad": float(np.mean(ang_err)) if ang_err else None,
        "descriptor_bit_error_rate": float(np.mean(bit_err)) if bit_err else None,
    }

    if out_png:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(14, 5))
        ax.imshow(img, cmap="gray")
        ax.scatter(xs, ys, s=10, edgecolors="lime", facecolors="none")
        L = 12.0
        ax.quiver(
            xs, ys, L * np.cos(angles), L * np.sin(angles),
            color="red", angles="xy", scale_units="xy", scale=1, width=0.002,
        )
        ax.set_title(
            f"{report['n_keypoints']} keypoints | "
            f"bit err {report['descriptor_bit_error_rate']:.4f}"
        )
        ax.axis("off")
        fig.savefig(out_png, dpi=110, bbox_inches="tight")
        plt.close(fig)
        report["visualization"] = out_png
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--image", default="/root/reference/000000.png")
    ap.add_argument("--out", default=None, help="keypoint visualization PNG")
    ap.add_argument("--full", action="store_true", help="more keypoints")
    args = ap.parse_args(argv)
    report = run_compare(args.image, args.out, args.full)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
