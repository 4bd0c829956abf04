"""Device mesh + sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape=(-1,), axis_names=("data",), devices=None
) -> Mesh:
    """Build a Mesh; -1 in mesh_shape absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    known = int(np.prod([s for s in shape if s != -1])) or 1
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // known
    total = int(np.prod(shape))
    grid = np.array(devices[:total]).reshape(shape)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """device_put every leaf with its leading dim sharded over `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
