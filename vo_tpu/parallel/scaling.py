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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--cpu", type=int, default=0,
        help="force an N-device virtual CPU mesh (harness CI mode)",
    )
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    ap.add_argument("--shape", type=int, nargs=2, default=(376, 1241))
    ap.add_argument("--nfeatures", type=int, default=1000)
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
    print(json.dumps({"backend": jax.default_backend(), "detect": rows}))
    return rows


if __name__ == "__main__":
    main()
