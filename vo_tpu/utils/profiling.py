"""Profiling & timing harness (SURVEY.md §5: the reference's tracing is
wall-clock `std::chrono` around the frame loop + cudaEvent timing inside
two kernels; results hand-copied into results/timing.txt).

TPU-native equivalents, shaped by two measured platform gotchas:
- repeating a jit call with IDENTICAL device inputs can be elided by the
  runtime (axon) — all timing here CHAINS data between iterations;
- synchronous device->host reads cost ~150 ms over tunneled TPUs — timers
  block exactly once, at the end.

Tools:
- chained_timeit: per-dispatch wall time with a data dependency.
- FrameRateMeter: frames/s over a dispatch-only loop.
- trace(): context manager around jax.profiler; summarize() parses the
  perfetto trace into per-op totals (no xprof UI needed).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time

import jax
import numpy as np


def chained_timeit(fn, init_args, chain, n: int = 50, warmup: int = 2):
    """Time `fn(*args)` per call with `args = chain(out, *args)` threading
    a data dependency between iterations (defeats result caching).

    Returns seconds per call."""
    args = init_args
    out = fn(*args)
    for _ in range(warmup - 1):
        args = chain(out, *args)
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        args = chain(out, *args)
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


class FrameRateMeter:
    """Dispatch-only frames/s: mark() per frame, report() blocks once."""

    def __init__(self):
        self._t0 = None
        self._n = 0
        self._last = None

    def mark(self, out) -> None:
        if self._t0 is None:
            self._t0 = time.perf_counter()
        self._n += 1
        self._last = out

    def report(self) -> dict:
        if self._last is not None:
            jax.block_until_ready(jax.tree.leaves(self._last)[0])
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        fps = self._n / dt if dt > 0 else float("nan")
        return {"frames": self._n, "seconds": round(dt, 4), "fps": round(fps, 2)}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vo_tpu_trace"):
    """jax.profiler trace context; pair with summarize(log_dir)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def summarize(log_dir: str, top: int = 25, min_us: float = 500.0) -> list:
    """Aggregate per-op durations from the newest perfetto trace under
    `log_dir`. Returns [(total_ms, op_name)] sorted descending — the
    fastest way to find the hot HLO ops without an xprof UI."""
    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(files[-1]) as f:
        t = json.load(f)
    by = collections.Counter()
    for e in t.get("traceEvents", []):
        if e.get("ph") == "X":
            by[e["name"]] += e.get("dur", 0)
    rows = [
        (dur / 1e3, name)
        for name, dur in by.most_common()
        if dur >= min_us and not name.startswith("$")
    ]
    return rows[:top]
