"""BA window diagnosis: does the window solve move poses TOWARD ground
truth?

The integrated eval (RESULTS_CLEAN.md) shows tracking_sift_ba cutting ATE
only ~4% where the reference's BA headline is ~3x
(with_bundle_adjustment.cpp / BASELINE.md). This tool separates the two
possible causes:

  (a) BA is not correcting poses (assembly/gauge/solver problem) — visible
      as per-window GT error NOT dropping pre->post;
  (b) BA corrects windows locally but the trajectory metric is dominated
      by what happens between windows (cadence 10 > window 5 leaves half
      the steps unrefined; heading noise there drives ATE).

Phase 1 (collect): run the tracking pipeline with BA disabled and dump
every cadence-aligned window (poses/obs/valid) + the matching GT poses.
Phase 2 (analyze): replay `run_window_ba` on the saved windows under
variant BAConfigs and report per-window relative-pose error vs GT before
and after (est window rescaled to GT total length — monocular BA cannot
observe global scale).

Usage:
  python scripts/ba_win_diag.py collect [--frames 260] [--seed 0]
         [--feature orb] [--out /tmp/ba_windows.npz]
  python scripts/ba_win_diag.py analyze [--in /tmp/ba_windows.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    import vo_tpu  # noqa: F401
    from vo_tpu.data.synthetic import SyntheticSequence
    from vo_tpu.models.vo_ba import TrackingBAVO
    from vo_tpu.models.vo import VOConfig
    from vo_tpu.frontend.orb import OrbConfig
    from vo_tpu.ba.window import WindowConfig

    seq = SyntheticSequence.generate_clean(n_frames=args.frames,
                                           seed=args.seed)
    cfg = VOConfig(orb=OrbConfig(nfeatures=3000))
    wcfg = WindowConfig(ba_every=10**9)  # never solve; we want raw windows
    vo = TrackingBAVO(seq.K, cfg, wcfg)
    state = vo.init(seq.frame(0))
    W = wcfg.window_size
    rows = []
    for i in range(1, len(seq)):
        state, out = vo.step(state, seq.frame(i))
        if i >= W and i % 10 == 0:
            rows.append(
                dict(
                    frame=i,
                    poses=np.asarray(state.window.poses),
                    obs=np.asarray(state.window.obs),
                    valid=np.asarray(state.window.valid),
                    gt=np.asarray(seq.poses[i - W + 1 : i + 1]),
                )
            )
            print(f"frame {i}: window captured", flush=True)
    np.savez_compressed(
        args.out,
        K=np.asarray(seq.K),
        n=len(rows),
        **{
            f"{k}{j}": r[k]
            for j, r in enumerate(rows)
            for k in ("frame", "poses", "obs", "valid", "gt")
        },
    )
    print(f"saved {len(rows)} windows -> {args.out}")


def _rel_errors(poses, gt):
    """Per-window pose error vs GT, gauge-free: anchor at frame 0 of the
    window, rescale est to GT path length, report mean translation error
    (m) and mean rotation error (deg) over the window's later frames."""
    inv0 = np.linalg.inv(poses[0])
    ginv0 = np.linalg.inv(gt[0])
    rel = np.einsum("ij,wjk->wik", inv0, poses)
    grel = np.einsum("ij,wjk->wik", ginv0, gt)
    el = np.sum(np.linalg.norm(np.diff(rel[:, :3, 3], axis=0), axis=1))
    gl = np.sum(np.linalg.norm(np.diff(grel[:, :3, 3], axis=0), axis=1))
    s = gl / max(el, 1e-9)
    te = np.linalg.norm(rel[1:, :3, 3] * s - grel[1:, :3, 3], axis=1).mean()
    dR = np.einsum("wij,wkj->wik", rel[1:, :3, :3], grel[1:, :3, :3])
    tr = np.clip((np.trace(dR, axis1=1, axis2=2) - 1) / 2, -1, 1)
    re = np.degrees(np.arccos(tr)).mean()
    return te, re


def analyze(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import vo_tpu  # noqa: F401
    from vo_tpu.ba.schur import BAConfig
    from vo_tpu.ba.window import WindowConfig, WindowState, run_window_ba

    z = np.load(args.inp)
    K = jnp.asarray(z["K"])
    n = int(z["n"])

    variants = {
        "current": WindowConfig(),
        "free_gauge": WindowConfig(ba=BAConfig(scale_gauge_weight=0.0)),
        "iters40": WindowConfig(ba=BAConfig(max_iters=40)),
        "weak_gauge": WindowConfig(ba=BAConfig(scale_gauge_weight=10.0)),
        "baseline0": WindowConfig(
            ba=BAConfig(scale_gauge_mode="baseline0")
        ),
    }
    print(f"{n} windows; columns: pre -> post (trans m / rot deg)")
    agg = {k: [] for k in variants}
    pre_agg = []
    for j in range(n):
        st = WindowState(
            poses=jnp.asarray(z[f"poses{j}"]),
            obs=jnp.asarray(z[f"obs{j}"]),
            valid=jnp.asarray(z[f"valid{j}"]),
            count=jnp.asarray(z[f"poses{j}"].shape[0], jnp.int32),
        )
        gt = z[f"gt{j}"]
        pre_t, pre_r = _rel_errors(np.asarray(st.poses), gt)
        pre_agg.append((pre_t, pre_r))
        line = [f"w{j:02d} f{int(z[f'frame{j}']):4d} pre {pre_t:.3f}/{pre_r:.3f}"]
        for name, wcfg in variants.items():
            new_poses, ok, info = jax.jit(
                run_window_ba, static_argnames=("cfg",)
            )(st, K, cfg=wcfg)
            t, r = _rel_errors(np.asarray(new_poses), gt)
            agg[name].append((t, r))
            line.append(
                f"{name} {t:.3f}/{r:.3f}"
                f"(acc{int(info['ba_accepted'])},L{int(info['ba_landmarks'])})"
            )
        print("  ".join(line), flush=True)
    pre = np.asarray(pre_agg)
    print(f"\nMEAN pre: trans {pre[:,0].mean():.4f} rot {pre[:,1].mean():.4f}")
    for name in variants:
        a = np.asarray(agg[name])
        print(
            f"MEAN {name}: trans {a[:,0].mean():.4f}"
            f" ({a[:,0].mean()/max(pre[:,0].mean(),1e-9):.2f}x)"
            f"  rot {a[:,1].mean():.4f}"
            f" ({a[:,1].mean()/max(pre[:,1].mean(),1e-9):.2f}x)"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=("collect", "analyze"))
    ap.add_argument("--frames", type=int, default=260)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/ba_windows.npz")
    ap.add_argument("--in", dest="inp", default="/tmp/ba_windows.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.mode == "collect":
        collect(args)
    else:
        analyze(args)


if __name__ == "__main__":
    main()


# Reference parity notes: window semantics per with_bundle_adjustment.cpp
# (WINDOW_SIZE=5 :282, cadence :228, accept gates :699-717); this script
# is diagnostic-only and not part of the shipped pipeline.
