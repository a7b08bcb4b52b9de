"""Benchmark: best ATE-parity VO configuration, frames/s on one chip.

Prints ONE JSON line:
  {"metric": "matching_orb_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N}

Headline config: matching_orb (ORB-3000 detect+describe every frame, exact
Hamming knn(2) + ratio 0.8, 5-point RANSAC, triangulation scale) — the
reference's matching_orb runs at 19.0 fps CPU (README.md:17,
results/timing.txt:2; see BASELINE.md). On TPU the reference's
tracking>matching speed ranking INVERTS: dense detection + MXU matching is
~0.1 ms/frame while sparse per-point LK windows cost ~34 ms — so the
matching pipeline is both the accuracy-parity config AND the fastest.

Measurement notes (see vo_tpu/utils/profiling.py):
- frames are pre-staged in HBM (the axon tunnel's 40 MB/s H2D would
  otherwise measure the tunnel, not the chip);
- every step gets a DISTINCT frame (column-rolled variants of the two
  KITTI frames shipped with the reference) — the runtime caches results
  of repeated identical dispatches, which would inflate fps;
- the loop only dispatches; one block at the end.
"""

import json
import os
import time

import numpy as np


BASELINE_FPS = 19.0  # matching_orb, results/timing.txt:2
N_WARMUP = 2
N_FRAMES = 200


def load_frames():
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
    # distinct, real-statistics frames
    return [
        np.roll(base[i % 2], 3 * i, axis=1) for i in range(N_FRAMES + 2)
    ]


def main():
    import vo_tpu  # noqa: F401 — sets matmul precision
    import jax
    import jax.numpy as jnp

    from vo_tpu.runtime.presets import get_preset

    frames = [
        jax.device_put(jnp.asarray(f, jnp.float32)) for f in load_frames()
    ]
    K = np.array(
        [[707.0912, 0.0, 601.8873], [0.0, 707.0912, 183.1104], [0.0, 0.0, 1.0]]
    )
    vo = get_preset("matching_orb").build(K)

    state = vo.init(frames[0])
    for i in range(N_WARMUP):
        state, out = vo.step(state, frames[1 + i])
    jax.block_until_ready(out.pose)

    t0 = time.perf_counter()
    for i in range(N_FRAMES):
        state, out = vo.step(state, frames[2 + i])
    jax.block_until_ready(out.pose)
    dt = time.perf_counter() - t0

    fps = N_FRAMES / dt
    print(
        json.dumps(
            {
                "metric": "matching_orb_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
