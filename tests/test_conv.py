"""Conv/blur/Sobel/integral/pyramid kernels vs OpenCV + numpy oracles."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vo_tpu.ops.conv import (
    binomial_blur5,
    conv2d_same,
    conv2d_valid,
    gaussian_blur,
    gaussian_kernel_1d,
    opencv_gaussian_sigma,
    sobel,
    GAUSS_5X5_273,
)
from vo_tpu.ops.integral import box_filter5, box_sum_from_integral, integral_image
from vo_tpu.ops.pyramid import build_halving_pyramid, build_pyramid, pyramid_shapes


@pytest.fixture(scope="module")
def img(rng=None):
    r = np.random.default_rng(3)
    base = r.normal(scale=40.0, size=(64, 96)) + 128.0
    return np.clip(cv2.GaussianBlur(base, (5, 5), 1.0), 0, 255).astype(np.float32)


def test_gaussian_kernel_matches_opencv():
    # The reference generates its kernels with the explicit sigma heuristic
    # (GaussianBlur.cpp:13-16), not OpenCV's fixed small-kernel tables — so
    # compare against cv2 with sigma passed explicitly.
    for ks in (3, 5, 7, 9):
        ours = gaussian_kernel_1d(ks)
        ref = cv2.getGaussianKernel(ks, opencv_gaussian_sigma(ks)).reshape(-1)
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_gaussian_blur_matches_opencv(img):
    for ks in (5, 7):
        sigma = opencv_gaussian_sigma(ks)
        ours = np.asarray(gaussian_blur(img, ks))
        ref = cv2.GaussianBlur(
            img, (ks, ks), sigma, borderType=cv2.BORDER_REFLECT_101
        )
        np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_binomial_blur_matches_2d_conv(img):
    ours = np.asarray(binomial_blur5(img))
    k1 = np.array([1, 4, 6, 4, 1]) / 16.0
    ref = cv2.sepFilter2D(img, -1, k1, k1, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_273_kernel_close_to_binomial():
    # The reference's two blur variants are nearly identical kernels.
    k1 = np.array([1, 4, 6, 4, 1]) / 16.0
    assert np.abs(np.outer(k1, k1) - GAUSS_5X5_273).max() < 0.01


def test_sobel_matches_opencv(img):
    ix, iy = sobel(img)
    ref_x = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REFLECT_101)
    ref_y = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(np.asarray(ix), ref_x, atol=1e-2)
    np.testing.assert_allclose(np.asarray(iy), ref_y, atol=1e-2)


def test_conv2d_valid_shape_and_values():
    x = np.arange(30, dtype=np.float32).reshape(5, 6)
    k = np.ones((3, 3), dtype=np.float32)
    out = np.asarray(conv2d_valid(x, k))
    assert out.shape == (3, 4)
    ref = cv2.filter2D(x, -1, k, borderType=cv2.BORDER_CONSTANT)[1:-1, 1:-1]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_conv2d_same_batched(img):
    k = np.ones((3, 3), dtype=np.float32) / 9.0
    stack = np.stack([img, img * 0.5])
    out = np.asarray(conv2d_same(stack, k))
    assert out.shape == stack.shape
    np.testing.assert_allclose(out[1], np.asarray(conv2d_same(img * 0.5, k)), atol=1e-4)


def test_integral_image_matches_opencv(img):
    ours = np.asarray(integral_image(img))
    ref = cv2.integral(img)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=0.5)


def test_box_sum_from_integral(img):
    ii = integral_image(img)
    ys = np.array([10, 20, 30])
    xs = np.array([12, 40, 70])
    got = np.asarray(box_sum_from_integral(ii, ys, xs, r=2))
    for k, (y, x) in enumerate(zip(ys, xs)):
        assert got[k] == pytest.approx(img[y - 2 : y + 3, x - 2 : x + 3].sum(), rel=1e-4)


def test_box_filter5_matches_integral(img):
    dense = np.asarray(box_filter5(img))
    ii = integral_image(img)
    y, x = 17, 33
    assert dense[y, x] == pytest.approx(
        float(np.asarray(box_sum_from_integral(ii, np.array([y]), np.array([x]), 2))[0]),
        rel=1e-5,
    )


def test_pyramid_shapes():
    shapes = pyramid_shapes((370, 1226), 8, 1.2)
    assert shapes[0] == (370, 1226)
    assert shapes[1] == (round(370 / 1.2), round(1226 / 1.2))
    assert len(shapes) == 8


def test_build_pyramid_matches_opencv(img):
    # every level resizes from level 0 (orb.cpp:116-119 semantics)
    levels = build_pyramid(img, n_levels=4, scale_factor=1.2)
    for lvl, ours in enumerate(levels[1:], start=1):
        h, w = ours.shape
        ref = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        # cv2 uses fixed-point bilinear; allow ~1 gray-level tolerance
        assert np.abs(np.asarray(ours) - ref).max() < 1.5


def test_halving_pyramid():
    x = np.random.default_rng(0).normal(size=(64, 64)).astype(np.float32)
    levels = build_halving_pyramid(x, 3)
    assert [lv.shape for lv in levels] == [(64, 64), (32, 32), (16, 16)]
