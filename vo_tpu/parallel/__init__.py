"""Multi-chip parallelism (new subsystem — the reference is single-GPU,
SURVEY.md §2e): device meshes, keypoint-sharded matching, row-sharded
stencils with ring halo exchange, landmark-sharded Schur BA, frame-DP
frontend."""

from .ba import sharded_bundle_adjust
from .frontend import batched_orb, batched_pair_match
from .matching import pad_to_multiple, sharded_match_descriptors
from .mesh import make_mesh, make_mesh_2d, replicated, shard_leading
from .tracking import sharded_lk_make_cache, sharded_lk_track
from .spatial import sharded_fast_score, sharded_gaussian_blur, sharded_stencil
from .watchdog import StepWatchdog

__all__ = [
    "sharded_bundle_adjust",
    "batched_orb",
    "batched_pair_match",
    "pad_to_multiple",
    "sharded_match_descriptors",
    "make_mesh",
    "make_mesh_2d",
    "replicated",
    "shard_leading",
    "sharded_fast_score",
    "sharded_gaussian_blur",
    "sharded_stencil",
    "StepWatchdog",
    "sharded_lk_make_cache",
    "sharded_lk_track",
]
