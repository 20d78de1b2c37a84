"""Mesh construction and sharding helpers (1-D data-parallel mesh).

For this workload the one scaling axis is N — dataset rows / latent rows /
GP feature rows (SURVEY.md §5 "long-context analog"). Everything N-sized is
sharded on dim 0 across the `data` axis; everything R-sized or parameter-
sized is replicated. Collectives this induces: one psum of an R×R Gram and
an R×L projection per GP solve (tiny wire traffic over ICI), plus the usual
DP gradient psum in the minibatch phase.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 over the data axis (Z, V, images, ids)."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def trim_to_multiple(n: int, k: int) -> int:
    """Largest n' ≤ n divisible by k (row-sharded arrays need equal shards)."""
    return (n // k) * k


def shard_rows(mesh: Mesh, *arrays):
    """device_put each array row-sharded; dim 0 must divide the mesh."""
    sh = row_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) != 1 else out[0]
