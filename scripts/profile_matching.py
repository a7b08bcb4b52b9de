"""Profile the matching_orb step on the real TPU: detect vs core split
plus the top HLO ops of each program.

Usage: python scripts/profile_matching.py [preset] [n_steps]
"""

import sys
import time

import numpy as np

import vo_tpu  # noqa: F401 — sets matmul precision
import jax
import jax.numpy as jnp

from vo_tpu.runtime.presets import get_preset
from vo_tpu.utils.profiling import trace, summarize


def load_frames(n):
    from vo_tpu.data.kitti import load_gray

    base = [
        np.asarray(load_gray(p), np.float32)
        for p in ("/root/reference/000000.png", "/root/reference/000001.png")
    ]
    return [np.roll(base[i % 2], 3 * i, axis=1) for i in range(n + 4)]


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "matching_orb"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    frames = [jax.device_put(jnp.asarray(f)) for f in load_frames(n)]
    K = np.array(
        [[707.0912, 0.0, 601.8873], [0.0, 707.0912, 183.1104], [0.0, 0.0, 1.0]]
    )
    vo = get_preset(name).build(K)
    state = vo.init(frames[0])
    for i in range(3):
        state, out = vo.step(state, frames[1 + i])
    np.asarray(out.pose)

    t0 = time.perf_counter()
    for i in range(n):
        state, out = vo.step(state, frames[4 + i])
    np.asarray(out.pose)
    dt = (time.perf_counter() - t0) / n
    print(f"step fetch-timed: {dt * 1e3:.2f} ms/step ({1 / dt:.1f} fps)")

    # stage split: detect alone (distinct inputs, value-fetched)
    t0 = time.perf_counter()
    for i in range(n):
        feats = vo._detect_jit(frames[4 + i])
    np.asarray(feats[0])
    print(f"detect alone: {(time.perf_counter() - t0) / n * 1e3:.2f} ms")

    with trace("/tmp/vo_match_trace") as d:
        for i in range(n):
            state, out = vo.step(state, frames[4 + i])
        np.asarray(out.pose)
    for ms, nm in summarize(d, top=40, min_us=100.0 * n):
        print(f"{ms / n:8.3f} ms/step  {nm}")


if __name__ == "__main__":
    main()
