"""Pallas window-crop kernel: interpreter-mode parity with the XLA path."""

import jax.numpy as jnp
import numpy as np
import pytest

from vo_tpu.ops.lk import _crop_windows
from vo_tpu.ops.pallas_crop import crop_windows_pallas


class TestPallasCrop:
    @pytest.mark.parametrize("N,S", [(16, 40), (13, 24), (8, 8)])
    def test_matches_xla_path(self, rng, N, S):
        H, W = 96, 160
        img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
        ox = jnp.asarray(rng.integers(0, W - S, N), jnp.int32)
        oy = jnp.asarray(rng.integers(0, (H - S) // 8, N) * 8, jnp.int32)
        want = _crop_windows(img, ox, oy, S)
        got = crop_windows_pallas(img, ox, oy, S, interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    def test_edge_origins(self, rng):
        H, W, S, N = 64, 64, 16, 5
        img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
        ox = jnp.asarray([0, W - S, 0, W - S, 7], jnp.int32)
        oy = jnp.asarray([0, 0, H - S, H - S, 8], jnp.int32)
        want = _crop_windows(img, ox, oy, S)
        got = crop_windows_pallas(img, ox, oy, S, interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
