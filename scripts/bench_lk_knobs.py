"""A/B LK structural knobs on the real TPU: window margins and the crop
panel stride. Times the FULL tracking step (standalone micro timings
inflate 5-10x on the tunneled runtime) with value-fetch timing and
distinct chained inputs (utils/profiling.py methodology).

Usage: python scripts/bench_lk_knobs.py [n_steps]
"""

import sys
import time

import numpy as np

import vo_tpu  # noqa: F401 — matmul precision + compile cache
import jax
import jax.numpy as jnp

from vo_tpu.models.vo import TrackingVO, VOConfig
from vo_tpu.ops.lk import LKConfig
import vo_tpu.ops.lk as lkmod


def load_frames(n):
    from vo_tpu.data.kitti import load_gray

    base = [
        np.asarray(load_gray(p), np.float32)
        for p in ("/root/reference/000000.png", "/root/reference/000001.png")
    ]
    return [np.roll(base[i % 2], 3 * i, axis=1) for i in range(n + 4)]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    frames = [jax.device_put(jnp.asarray(f)) for f in load_frames(n)]
    K = np.array(
        [[707.0912, 0.0, 601.8873], [0.0, 707.0912, 183.1104], [0.0, 0.0, 1.0]]
    )
    # PW is bit-exact (pure crop layout); margins change semantics. The
    # crop's gather traffic scales with N*S*(PW+S), so small panels cut
    # it ~4x — the floor is panel-build overhead + pid spread.
    variants = [
        ("margin6_pw256", LKConfig(), 256),
        ("margin6_pw128", LKConfig(), 128),
        ("margin6_pw64", LKConfig(), 64),
        ("margin6_pw32", LKConfig(), 32),
        ("margin4_pw64", LKConfig(window_margin=4), 64),
    ]
    for name, lk_cfg, pw in variants:
        lkmod._PANEL_W = pw
        jax.clear_caches()
        vo = TrackingVO(K, VOConfig(lk=lk_cfg))
        t0 = time.perf_counter()
        state = vo.init(frames[0])
        for i in range(3):
            state, out = vo.step(state, frames[1 + i])
        np.asarray(out.pose)
        print(f"{name}: warmup+compile {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for i in range(n):
            state, out = vo.step(state, frames[4 + i])
        np.asarray(out.pose)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt * 1e3:.2f} ms/step ({1 / dt:.1f} fps)",
              flush=True)
    lkmod._PANEL_W = 256


if __name__ == "__main__":
    main()
