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


def batch_sharding(
    mesh: Mesh, axis: str = "data", batch_axis_index: int = 0
) -> NamedSharding:
    """Shard the batch dim (at `batch_axis_index`) over `axis`, replicate
    the rest. batch_axis_index=1 serves [k, B, ...] step-block leaves
    (train.steps_per_call): the leading scan axis stays replicated."""
    spec = (None,) * batch_axis_index + (axis,)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(
    batch: dict, mesh: Mesh, axis: str = "data", batch_axis_index: int = 0
) -> dict:
    """device_put every leaf with its batch dim sharded over `axis`."""
    sh = batch_sharding(mesh, axis, batch_axis_index)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
