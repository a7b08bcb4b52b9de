"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding logic (descriptor matching, distributed BA) is exercised
on CPU with XLA's forced host device count, per the build plan (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# The persistent compile cache (vo_tpu/__init__.py) segfaults jax's cache
# writer on hosts whose XLA:CPU AOT machine features mismatch the cached
# artifacts (put_executable_and_time aborts the interpreter near the end of
# the suite). Tests never benefit from the cache enough to risk that —
# disable it for every pytest process unless a test explicitly opts in.
os.environ["VO_TPU_COMPILE_CACHE"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms to "axon,cpu" in-process, so the env var alone is not
# enough — override the config again before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_RESULTS = "/root/reference/results"


@pytest.fixture(scope="session")
def reference_results_dir():
    if not os.path.isdir(REFERENCE_RESULTS):
        pytest.skip("reference results not available")
    return REFERENCE_RESULTS


@pytest.fixture(scope="session")
def sample_image():
    """A real KITTI frame shipped with the reference repo, as float32."""
    path = "/root/reference/000000.png"
    if not os.path.exists(path):
        pytest.skip("reference sample image not available")
    from vo_tpu.data.kitti import load_gray

    return load_gray(path)


@pytest.fixture(scope="session")
def sample_image_pair():
    paths = ["/root/reference/000000.png", "/root/reference/000001.png"]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("reference sample images not available")
    from vo_tpu.data.kitti import load_gray

    return [load_gray(p) for p in paths]


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
