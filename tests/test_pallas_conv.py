"""Pallas row-conv kernel: interpreter-mode parity with the shift-add
conv (the production path; see pallas_conv.py STATUS)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.ops.conv import gaussian_kernel_1d, separable_conv_same
from vo_tpu.ops.pallas_conv import conv_rows_pallas, separable_conv_pallas


@pytest.mark.parametrize("H,W,ks", [(97, 203, 15), (64, 512, 5)])
def test_separable_matches_shift_add(rng, H, W, ks):
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    k = gaussian_kernel_1d(ks)
    want = separable_conv_same(img, k, k)
    got = separable_conv_pallas(img, k, k, interpret=True)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-3)


def test_row_conv_borders(rng):
    img = jnp.asarray(rng.uniform(0, 255, (16, 40)), jnp.float32)
    k = gaussian_kernel_1d(7)
    want = separable_conv_same(img, np.array([1.0]), k)
    got = conv_rows_pallas(img, k, interpret=True)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-3)
