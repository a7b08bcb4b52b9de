"""vo_tpu — TPU-native monocular visual odometry (JAX/XLA/Pallas).

A from-scratch re-design of the WeeFav/Visual-Odometry-GPU pipeline for TPU:
fixed-shape masked arrays everywhere, one fused jitted per-frame step, batched
on-device RANSAC, and a distributed Schur-complement windowed bundle
adjustment over a `jax.sharding.Mesh`.

Subpackages
-----------
- ``vo_tpu.data``      KITTI odometry IO + synthetic sequence generation
- ``vo_tpu.ops``       device kernels (blur, FAST, NMS, Harris, BRIEF, LK, ...)
- ``vo_tpu.frontend``  ORB detect-and-compute pipeline over an image pyramid
- ``vo_tpu.geometry``  essential matrix, RANSAC, pose recovery, triangulation
- ``vo_tpu.ba``        windowed bundle adjustment (Schur-complement LM)
- ``vo_tpu.parallel``  meshes, sharded matching, distributed BA
- ``vo_tpu.models``    end-to-end VO pipelines (the reference's 5+ configs)
- ``vo_tpu.utils``     metrics (ATE/RPE/drift), path IO, plotting, profiling
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Geometry (essential matrix, triangulation, BA) needs true fp32 matmuls;
# JAX's default TPU matmul precision is bf16, which is catastrophic for
# near-singular linear algebra. Hot large-tensor ops opt back into lower
# precision explicitly where it is safe (e.g. int8 Hamming tables).
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: remote TPU compiles of the full VO step
# cost minutes; a warm on-disk cache makes fresh processes (bench.py, the
# driver, CLI runs) start in seconds. Keyed by backend+program, so CPU
# test runs and TPU runs coexist. Override dir with VO_TPU_COMPILE_CACHE;
# set it empty to disable.
_cache_dir = _os.environ.get(
    "VO_TPU_COMPILE_CACHE",
    _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
