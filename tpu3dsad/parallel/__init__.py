"""SPMD parallelism: device mesh, sharding rules, collective helpers.

The reference family's only parallelism is single-node nn.DataParallel
(SURVEY.md §2.3); the TPU-native first-class equivalent is data parallelism
over a named mesh axis with pjit-style sharding: batch arrays sharded on
('data',), params/opt-state replicated, gradient psum inserted by XLA. Mesh
axis names are config so a multi-slice mesh is a config change (SURVEY.md
§5 "Distributed communication backend").
"""

from tpu3dsad.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]
