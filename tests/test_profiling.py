"""Profiling-harness tests (chained timing + frame-rate meter)."""

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.utils.profiling import FrameRateMeter, chained_timeit


def test_chained_timeit_threads_data():
    calls = []

    @jax.jit
    def f(x):
        return x * 1.5 + 1.0

    def chain(out, x):
        calls.append(1)
        return (out,)

    dt = chained_timeit(f, (jnp.ones((8, 8)),), chain, n=5, warmup=2)
    assert dt > 0
    assert len(calls) >= 5  # data dependency threaded every iteration


def test_frame_rate_meter():
    m = FrameRateMeter()

    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.zeros((4,))
    for _ in range(10):
        x = f(x)
        m.mark(x)
    rep = m.report()
    assert rep["frames"] == 10
    assert rep["fps"] > 0
    assert np.allclose(np.asarray(x), 10.0)
