"""Scaling-efficiency harness: frames/s per device count.

BASELINE.json's north star asks for frames/s at 1 chip / 1 host / N hosts
with >=70% efficiency. This harness measures the frame-parallel workloads
(batched detection, per-pair matching) across growing 1-D meshes and
reports throughput + efficiency vs the 1-device run.

On a multi-chip/multi-host system this measures real ICI/DCN scaling; on
this dev host (1 TPU core) it runs on the virtual CPU mesh for harness CI
(`python -m vo_tpu.parallel.scaling --cpu 8`), where the numbers validate
the mechanism, not silicon.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure_detect_scaling(
    device_counts: list[int],
    frames_per_device: int = 2,
    shape: tuple[int, int] = (376, 1241),
    nfeatures: int = 1000,
    n_iters: int = 10,
) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from ..frontend.orb import OrbConfig
    from .frontend import batched_orb
    from .mesh import make_mesh

    cfg = OrbConfig(nfeatures=nfeatures, n_levels=4)
    rng = np.random.default_rng(0)
    results = []
    base_fps = None
    for d in device_counts:
        if d > jax.device_count():
            break
        mesh = make_mesh(d, axis="frame")
        B = d * frames_per_device
        frames = jnp.asarray(
            rng.uniform(0, 255, (B,) + shape), jnp.float32
        )
        fn = batched_orb(mesh, cfg)
        out = fn(frames)
        jax.block_until_ready(out.xs)
        t0 = time.perf_counter()
        f = frames
        for _ in range(n_iters):
            out = fn(f)
            # chain a data dependency so runs are not elided
            f = f + (out.xs[:, :1, None] * 0.0)
        jax.block_until_ready(out.xs)
        dt = (time.perf_counter() - t0) / n_iters
        fps = B / dt
        if base_fps is None:
            base_fps = fps / d  # per-device baseline at d devices... d=1
        eff = fps / (base_fps * d) if base_fps else float("nan")
        results.append(
            {
                "devices": d,
                "batch": B,
                "fps": round(fps, 2),
                "efficiency": round(eff, 3),
            }
        )
    return results


def measure_step_scaling(
    device_counts: list[int],
    shape: tuple[int, int] = (376, 1241),
    nfeatures: int = 3000,
    n_iters: int = 5,
) -> list[dict]:
    """STRONG scaling of the fused whole-pipeline tracking step
    (parallel/vo_step.py): one fixed flagship problem, keypoint axis
    sharded over growing meshes. Efficiency = t1 / (d * t_d)."""
    import jax
    import jax.numpy as jnp

    from ..data.synthetic import SyntheticSequence
    from ..frontend.orb import OrbConfig
    from ..models.vo import TrackingVO, VOConfig
    from .mesh import make_mesh
    from .vo_step import make_sharded_tracking_step, pad_capacity, shard_state

    cfg = VOConfig(orb=OrbConfig(nfeatures=nfeatures, fast_threshold=20.0))
    seq = SyntheticSequence.generate(n_frames=3, shape=shape, n_points=4000)
    vo = TrackingVO(seq.K, cfg)
    state0 = vo.init(seq.frame(0))
    state0, _ = vo.step(state0, seq.frame(1))
    img = jnp.asarray(seq.frame(2), jnp.float32)
    K = jnp.asarray(seq.K, jnp.float32)

    results = []
    t1 = None
    for d in device_counts:
        if d > jax.device_count():
            break
        mesh = make_mesh(d, axis="kp")
        st = shard_state(mesh, cfg, pad_capacity(cfg, state0, d))
        fn = make_sharded_tracking_step(mesh, cfg)
        st_w, out = fn(st, img, K)  # compile + warm
        np.asarray(out.pose)
        t0 = time.perf_counter()
        s, f = st_w, img
        for i in range(n_iters):
            # distinct chained inputs so dispatches are not cache-served
            s, out = fn(s, f + jnp.float32(i), K)
            f = f + out.pose[0, 0] * 0.0
        np.asarray(out.pose)  # value fetch = the only reliable sync
        dt = (time.perf_counter() - t0) / n_iters
        if t1 is None:
            t1 = dt * d  # normalize if counts don't start at 1
        results.append(
            {
                "devices": d,
                "ms_per_step": round(dt * 1e3, 2),
                "fps": round(1.0 / dt, 2),
                "efficiency": round(t1 / (d * dt), 3),
            }
        )
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--cpu", type=int, default=0,
        help="force an N-device virtual CPU mesh (harness CI mode)",
    )
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    ap.add_argument("--shape", type=int, nargs=2, default=(376, 1241))
    ap.add_argument("--nfeatures", type=int, default=1000)
    ap.add_argument(
        "--step", action="store_true",
        help="also measure the fused whole-pipeline step (strong scaling)",
    )
    args = ap.parse_args(argv)

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    n = jax.device_count()
    counts = args.devices or [d for d in (1, 2, 4, 8, 16, 32) if d <= n]
    rows = measure_detect_scaling(
        counts, shape=tuple(args.shape), nfeatures=args.nfeatures
    )
    out = {"backend": jax.default_backend(), "detect": rows}
    if args.step:
        out["fused_step"] = measure_step_scaling(
            counts, shape=tuple(args.shape)
        )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
