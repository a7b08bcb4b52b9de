"""A/B the LK window layouts on the real TPU: XLA lanes vs Pallas fused.

Times the FULL tracking step (the honest harness — standalone micro
timings inflate 5-10x on the tunneled runtime) for each
LKConfig.layout, plus the isolated cached-track program for a relative
signal. Value-fetch timing with distinct chained inputs throughout
(utils/profiling.py methodology).

Usage: python scripts/bench_lk_ab.py [n_steps] [layouts,..]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import vo_tpu  # noqa: F401 — matmul precision + compile cache
import jax
import jax.numpy as jnp

from vo_tpu.models.vo import TrackingVO, VOConfig
from vo_tpu.ops.lk import LKConfig


def load_frames(n):
    from vo_tpu.data.kitti import load_gray

    base = [
        np.asarray(load_gray(p), np.float32)
        for p in ("/root/reference/000000.png", "/root/reference/000001.png")
    ]
    return [np.roll(base[i % 2], 3 * i, axis=1) for i in range(n + 4)]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    layouts = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else ["lanes", "pallas"]
    )
    frames = [jax.device_put(jnp.asarray(f)) for f in load_frames(n)]
    K = np.array(
        [[707.0912, 0.0, 601.8873], [0.0, 707.0912, 183.1104], [0.0, 0.0, 1.0]]
    )
    for layout in layouts:
        cfg = VOConfig(lk=LKConfig(layout=layout))
        vo = TrackingVO(K, cfg)
        t0 = time.perf_counter()
        state = vo.init(frames[0])
        for i in range(3):
            state, out = vo.step(state, frames[1 + i])
        np.asarray(out.pose)
        print(
            f"{layout}: warmup+compile {time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        t0 = time.perf_counter()
        for i in range(n):
            state, out = vo.step(state, frames[4 + i])
        np.asarray(out.pose)
        dt = (time.perf_counter() - t0) / n
        print(
            f"{layout}: {dt * 1e3:.2f} ms/step ({1 / dt:.1f} fps) "
            f"over {n} steps",
            flush=True,
        )


if __name__ == "__main__":
    main()
