"""Device mesh helpers.

The reference is single-process single-GPU (SURVEY.md §2e) — distribution
is a new first-class subsystem here. One logical mesh with named axes:

- "frame": data parallelism over independent frames (batch detect/match);
- "kp":    keypoint-set sharding for descriptor matching and the landmark
           axis of distributed BA (the EP-like axis);
- "row":   spatial parallelism over image rows for stencils (halo exchange
           via ppermute).

Axes are views of the same devices; workloads pick the 1-D submesh they
shard over. Multi-host: call jax.distributed.initialize() before building
the mesh — jax.devices() then spans all hosts and ICI/DCN routing is XLA's
job.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "kp") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(
    shape: tuple[int, int], axes: tuple[str, str] = ("frame", "kp")
) -> Mesh:
    """2-D mesh, e.g. frames x keypoint-shards."""
    n = shape[0] * shape[1]
    devs = np.asarray(jax.devices()[:n]).reshape(shape)
    return Mesh(devs, axes)


def shard_leading(mesh: Mesh, axis: str) -> NamedSharding:
    """Sharding that splits an array's leading dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
