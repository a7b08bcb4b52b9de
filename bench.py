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

Robustness against compile-time budgets (round-2 lesson: the driver's
bench timed out inside the remote TPU compile and captured nothing):
- vo_tpu enables a persistent compilation cache (.jax_cache/) so a warm
  run skips the minutes-long remote compiles entirely;
- the flagship prints a COARSE fps line from the first few timed frames
  the moment it exists, then the refined full-run line (same metric name;
  both are honest measurements — take whichever arrives);
- stage-by-stage wall-clock telemetry streams to stderr.
"""

import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)

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


def load_frames(n, synthetic: bool = False):
    import jax
    import jax.numpy as jnp
    import os

    if synthetic:
        # REAL MOTION: a KITTI-shape synthetic sequence with genuine
        # parallax, rotation, and speed variation — LK iteration counts,
        # fallback rates, and RANSAC behavior match deployment, unlike
        # the column-rolled frames below (whose uniform 3 px shift may
        # flatter iterative stages). Same HBM pre-staging + value-fetch
        # timing; only the pixel content differs.
        from vo_tpu.data.synthetic import SyntheticSequence

        seq = SyntheticSequence.generate(
            n_frames=n + N_WARMUP + 1, shape=(376, 1241), n_points=4000,
            yaw_amplitude=0.3, n_turns=2.0,
        )
        return [
            jax.device_put(jnp.asarray(seq.frame(i), jnp.float32))
            for i in range(len(seq))
        ]

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


def _result(name: str, fps: float, baseline: float) -> dict:
    return {
        "metric": f"{name}_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 3),
    }


def bench_preset(name: str, frames, K, coarse_n: int = 0) -> dict:
    """Bench one preset. With coarse_n > 0, print an early coarse JSON
    line from the first coarse_n timed frames (driver-timeout insurance),
    then measure the refined number over a fresh window of n frames."""
    from vo_tpu.runtime.presets import get_preset

    baseline, n = BASELINES[name]
    preset = get_preset(name)
    vo = preset.build(K)
    # BA presets must compile the BA-trigger step variant during warmup
    # (one full cadence), or the first timed window eats a compile
    n_warm = (
        preset.window.ba_every + 1 if preset.window is not None else N_WARMUP
    )
    t_build = time.perf_counter()
    state = vo.init(frames[0])
    for i in range(n_warm):
        state, out = vo.step(state, frames[1 + i % (len(frames) - 1)])
    np.asarray(_pose_of(out))
    _log(f"{name}: warmup+compile {time.perf_counter() - t_build:.1f}s")
    fi = n_warm

    if coarse_n:
        t0 = time.perf_counter()
        for i in range(coarse_n):
            state, out = vo.step(state, frames[1 + fi % (len(frames) - 1)])
            fi += 1
        np.asarray(_pose_of(out))
        fps_c = coarse_n / (time.perf_counter() - t0)
        print(json.dumps(_result(name, fps_c, baseline)), flush=True)
        _log(f"{name}: coarse {fps_c:.1f} fps over {coarse_n} frames; refining")

    t0 = time.perf_counter()
    for i in range(n):
        state, out = vo.step(state, frames[1 + fi % (len(frames) - 1)])
        fi += 1
    np.asarray(_pose_of(out))  # value fetch = the only reliable sync
    fps = n / (time.perf_counter() - t0)
    _log(f"{name}: {fps:.2f} fps over {n} frames ({fps / baseline:.2f}x)")
    return _result(name, fps, baseline)


def bench_preset_scan(name: str, frames, K, chunk: int = 25) -> dict:
    """Scan-mode throughput (models/vo_scan.py): one dispatch per `chunk`
    frames via lax.scan — the offline/serving fast path. Tracking scan is
    bit-identical to the sync step loop; reported as `<name>_scan_fps`."""
    import jax.numpy as jnp

    from vo_tpu.models.vo_scan import make_scan_fn
    from vo_tpu.runtime.presets import get_preset

    baseline, n = BASELINES[name]
    n = (n // chunk) * chunk or chunk
    preset = get_preset(name)
    if preset.window is not None:
        raise ValueError("scan mode covers tracking/matching presets")
    vo = preset.build(K)
    t_build = time.perf_counter()
    state = vo.init(frames[0])
    scan_fn = make_scan_fn(vo, chunk)
    stack = jnp.stack(frames[1 : 1 + chunk])
    state, outs = scan_fn(state, stack)
    np.asarray(outs.pose[-1])
    _log(f"{name}: scan warmup+compile {time.perf_counter() - t_build:.1f}s")

    fi = 1 + chunk
    t0 = time.perf_counter()
    for _ in range(n // chunk):
        stack = jnp.stack(
            [frames[1 + (fi + j) % (len(frames) - 1)] for j in range(chunk)]
        )
        state, outs = scan_fn(state, stack)
        fi += chunk
    np.asarray(outs.pose[-1])  # value fetch = the only reliable sync
    fps = n / (time.perf_counter() - t0)
    _log(
        f"{name}: scan {fps:.2f} fps over {n} frames "
        f"({fps / baseline:.2f}x, chunk={chunk})"
    )
    res = _result(name, fps, baseline)
    res["metric"] = f"{name}_scan_fps"
    return res


def _probe_devices(timeout_s: float = 420.0):
    """Fail FAST (exit 3) when the device backend is unreachable.

    The axon tunnel has outage windows during which jax.devices() HANGS
    (no error) — without this guard the driver's bench burns its whole
    budget in a silent remote-init wait and records nothing (the round-2
    rc=124 failure mode). A daemon thread probes the backend; if it
    doesn't come back within `timeout_s` we print a diagnostic and exit
    immediately so the failure is attributable."""
    import threading

    got: list = []

    def probe():
        import jax

        got.append(jax.devices())

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    deadline = time.perf_counter() + timeout_s
    while time.perf_counter() < deadline and not got:
        th.join(min(60.0, max(1.0, deadline - time.perf_counter())))
        if not got and time.perf_counter() < deadline:
            _log("jax.devices() still unresponsive; retrying "
                 f"({deadline - time.perf_counter():.0f}s left)")
    if not got:
        _log(f"FATAL: jax.devices() unresponsive after {timeout_s:.0f}s "
             "(device tunnel down?) — aborting instead of hanging")
        sys.exit(3)
    _log(f"devices: {got[0]}")


def main():
    import vo_tpu  # noqa: F401 — matmul precision + compile cache

    _probe_devices()
    run_all = "--all" in sys.argv[1:]
    synthetic = "--synthetic" in sys.argv[1:]
    names = list(BASELINES) if run_all else ["tracking_orb"]
    n_frames = max(BASELINES[name][1] for name in names)
    t = time.perf_counter()
    frames = load_frames(n_frames, synthetic=synthetic)
    _log(f"staged {len(frames)} frames in {time.perf_counter() - t:.1f}s"
         + (" (synthetic real-motion)" if synthetic else " (rolled KITTI)"))
    K = np.array(
        [[707.0912, 0.0, 601.8873], [0.0, 707.0912, 183.1104], [0.0, 0.0, 1.0]]
    )
    suffix = "_realmotion" if synthetic else ""
    scan = "--scan" in sys.argv[1:]
    for i, name in enumerate(names):
        coarse_n = 20 if i == 0 else 0
        r = bench_preset(name, frames, K, coarse_n)
        if suffix:
            r["metric"] = r["metric"].replace("_fps", f"{suffix}_fps")
        print(json.dumps(r), flush=True)
        if scan and name in ("tracking_orb", "tracking_sift"):
            print(json.dumps(bench_preset_scan(name, frames, K)), flush=True)
    if run_all and not synthetic:
        # Real-motion column rides in every --all run: synthetic KITTI-shape
        # frames with genuine parallax/rotation reuse the compiled programs
        # (same shapes), so this adds measurement time only. Perf claims
        # always carry both columns (rolled + real motion).
        t = time.perf_counter()
        frames = load_frames(n_frames, synthetic=True)
        _log(f"staged {len(frames)} real-motion frames in "
             f"{time.perf_counter() - t:.1f}s")
        for name in names:
            r = bench_preset(name, frames, K)
            r["metric"] = r["metric"].replace("_fps", "_realmotion_fps")
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
