"""Pallas fused separable blur (ops/pallas_blur.py).

The kernel itself needs real TPU hardware (Mosaic); the CI suite runs on
the CPU backend, where pallas_separable_blur transparently falls back to
the XLA shift-add path — these tests pin the fallback equivalence and
the support predicate. Kernel-vs-XLA equivalence on hardware was
measured at <=1e-4 absolute (0..255 images) with 4.5-5.4x speedup
(2026-08, v5e; scripts in the round-2 commit message).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vo_tpu.ops.conv import BINOMIAL_5, gaussian_kernel_1d, separable_conv_same
from vo_tpu.ops.pallas_blur import blur_supported, pallas_separable_blur


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize(
    "shape,taps",
    [
        ((96, 128), BINOMIAL_5),
        ((94, 155), gaussian_kernel_1d(9, 1.2)),
        ((37, 51), BINOMIAL_5),  # unsupported-for-kernel tiny shape
    ],
)
def test_blur_matches_xla_path(rng, shape, taps):
    img = jnp.asarray(rng.uniform(0, 255, shape), jnp.float32)
    ref = np.asarray(separable_conv_same(img, taps, taps))
    out = np.asarray(pallas_separable_blur(img, taps))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_blur_supported_predicate():
    assert blur_supported((376, 1241), 2)
    assert blur_supported((752, 2482), 7)
    assert not blur_supported((10, 40), 7)  # pads exceed reflect limits


def test_asymmetric_taps(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 96)), jnp.float32)
    ky = gaussian_kernel_1d(5, 1.0)
    kx = gaussian_kernel_1d(9, 2.0)
    ref = np.asarray(separable_conv_same(img, ky, kx))
    out = np.asarray(pallas_separable_blur(img, ky, kx))
    np.testing.assert_allclose(out, ref, atol=2e-3)
