"""Native C++ PNG decoder / prefetcher tests (bit-exactness vs PIL)."""

import os

import numpy as np
import pytest

from vo_tpu.runtime.loader import (
    NativePrefetcher,
    build_error,
    decode_png,
    native_available,
)


pytestmark = pytest.mark.skipif(
    not native_available(), reason=f"native loader unavailable: {build_error()}"
)

SAMPLES = ["/root/reference/000000.png", "/root/reference/000001.png"]


def pil_gray(path):
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, dtype=np.float32)


class TestDecode:
    def test_bit_exact_vs_pil(self):
        for p in SAMPLES:
            if not os.path.exists(p):
                pytest.skip("reference sample not available")
            np.testing.assert_array_equal(decode_png(p), pil_gray(p))

    def test_synthetic_filters_roundtrip(self, tmp_path):
        """PNG filter coverage: PIL encodes with varying filters; our
        decoder must reproduce arbitrary content exactly."""
        from PIL import Image

        rng = np.random.default_rng(0)
        for i, arr in enumerate(
            [
                rng.integers(0, 256, (37, 53)).astype(np.uint8),  # noise
                np.tile(np.arange(64, dtype=np.uint8), (48, 1)),  # gradient
                np.zeros((16, 16), np.uint8),
            ]
        ):
            p = str(tmp_path / f"t{i}.png")
            Image.fromarray(arr, mode="L").save(p)
            np.testing.assert_array_equal(
                decode_png(p), arr.astype(np.float32)
            )

    def test_rgb_to_luma(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
        p = str(tmp_path / "rgb.png")
        Image.fromarray(rgb, mode="RGB").save(p)
        got = decode_png(p)
        want = (
            0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        ).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=0.51)

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            decode_png("/nonexistent/file.png")


class TestPrefetcher:
    def test_ordered_and_replay(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(2)
        paths, arrays = [], []
        for i in range(12):
            arr = rng.integers(0, 256, (24, 32)).astype(np.uint8)
            p = str(tmp_path / f"f{i:03d}.png")
            Image.fromarray(arr, mode="L").save(p)
            paths.append(p)
            arrays.append(arr.astype(np.float32))

        with NativePrefetcher(paths, n_threads=3, ring=4) as pf:
            for i in range(12):
                np.testing.assert_array_equal(pf.get(i), arrays[i])
            # replay after consumption (inline decode path)
            np.testing.assert_array_equal(pf.get(2), arrays[2])
            # skip ahead
            np.testing.assert_array_equal(pf.get(9), arrays[9])

    def test_kitti_prefetched_sequence_parity(self):
        if not os.path.exists(SAMPLES[0]):
            pytest.skip("reference samples not available")
        from vo_tpu.runtime.loader import NativePrefetcher

        with NativePrefetcher(SAMPLES, n_threads=2, ring=2) as pf:
            np.testing.assert_array_equal(pf.get(0), pil_gray(SAMPLES[0]))
            np.testing.assert_array_equal(pf.get(1), pil_gray(SAMPLES[1]))
