"""Benchmark: VO presets, frames/s on one chip.

Default (driver mode): bench the flagship tracking_orb config and print
ONE JSON line:
  {"metric": "tracking_orb_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N}

`python bench.py --all`: bench every published reference config (the 7
rows of BASELINE.md / results/timing.txt), one JSON line each, flagship
line first — the reproducible source of SCOREBOARD.md.

Measurement notes (see vo_tpu/utils/profiling.py):
- frames are pre-staged in HBM (the axon tunnel's 40 MB/s H2D would
  otherwise measure the tunnel, not the chip);
- every step gets a DISTINCT frame (column-rolled variants of the two
  KITTI frames shipped with the reference) — the runtime caches repeated
  identical dispatches;
- timing ends with a VALUE FETCH of the final pose: on this runtime
  jax.block_until_ready can return before execution completes, so
  dispatch-only or block-only loops can overreport by orders of
  magnitude. Only data-forced timing is trusted.
"""

import json
import sys
import time

import numpy as np

# reference fps (results/timing.txt, README; BASELINE.md table) and the
# per-preset number of timed frames (bounded so --all stays ~minutes)
BASELINES = {
    "tracking_orb": (72.1, 200),
    "tracking_sift": (60.6, 150),
    "matching_orb": (19.0, 100),
    "matching_orb_3d_no_correspond": (19.7, 100),
    "matching_orb_3d_correspond": (14.3, 60),
    "matching_sift": (8.2, 40),
    "tracking_sift_ba": (4.6, 40),
}
N_WARMUP = 2


def load_frames(n):
    import jax
    import jax.numpy as jnp
    import os

    from vo_tpu.data.kitti import load_gray

    paths = ["/root/reference/000000.png", "/root/reference/000001.png"]
    if all(os.path.exists(p) for p in paths):
        base = [np.asarray(load_gray(p), np.float32) for p in paths]
    else:
        rng = np.random.default_rng(0)
        base = [
            rng.uniform(0, 255, (376, 1241)).astype(np.float32)
            for _ in range(2)
        ]
    return [
        jax.device_put(jnp.asarray(np.roll(base[i % 2], 3 * i, axis=1)))
        for i in range(n + N_WARMUP + 1)
    ]


def _pose_of(out):
    return out.frame.pose if hasattr(out, "frame") else out.pose


def bench_preset(name: str, frames, K) -> dict:
    from vo_tpu.runtime.presets import get_preset

    baseline, n = BASELINES[name]
    preset = get_preset(name)
    vo = preset.build(K)
    # BA presets must compile the BA-trigger step variant during warmup
    # (one full cadence), or the first timed window eats a compile
    n_warm = (
        preset.window.ba_every + 1 if preset.window is not None else N_WARMUP
    )
    state = vo.init(frames[0])
    for i in range(n_warm):
        state, out = vo.step(state, frames[1 + i % (len(frames) - 1)])
    np.asarray(_pose_of(out))

    t0 = time.perf_counter()
    for i in range(n):
        state, out = vo.step(state, frames[1 + (n_warm + i) % (len(frames) - 1)])
    np.asarray(_pose_of(out))  # value fetch = the only reliable sync
    fps = n / (time.perf_counter() - t0)
    return {
        "metric": f"{name}_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 3),
    }


def main():
    import vo_tpu  # noqa: F401 — sets matmul precision

    run_all = "--all" in sys.argv[1:]
    names = list(BASELINES) if run_all else ["tracking_orb"]
    n_frames = max(BASELINES[name][1] for name in names)
    frames = load_frames(n_frames)
    K = np.array(
        [[707.0912, 0.0, 601.8873], [0.0, 707.0912, 183.1104], [0.0, 0.0, 1.0]]
    )
    for name in names:
        print(json.dumps(bench_preset(name, frames, K)), flush=True)


if __name__ == "__main__":
    main()
