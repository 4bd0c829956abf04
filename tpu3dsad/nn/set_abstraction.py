"""Set abstraction (SSG + MSG) and GroupAll modules.

TPU-native counterpart of pointnet2_modules.PointnetSAModule(MSG) in the
lineage (SURVEY.md §2.2): sample (FPS) → group (ball query, one or more
radii) → shared MLP → masked max-pool per group. The per-group MLP is a
single batched matmul over [B, M, K, C] (MXU-friendly); the pool masks pad
slots so they never win (SURVEY.md §7 invariants).

Also supports the lineage's PointnetSAModuleVotes extras used by the
detection stack: returning the FPS indices and normalized relative xyz.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpu3dsad import ops
from tpu3dsad.nn.mlp import SharedMLP


class SetAbstraction(nn.Module):
    """Single- or multi-scale-grouping set abstraction layer.

    For SSG pass one radius/nsample/mlp; for MSG pass parallel lists whose
    pooled features are concatenated (lineage PointnetSAModuleMSG).
    """

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # one channel list per scale
    use_xyz: bool = True
    normalize_xyz: bool = False

    @nn.compact
    def __call__(self, xyz, features=None, *, mask=None, train: bool = False,
                 inds=None, bn_momentum=0.9, cp_mesh=None,
                 cp_batch_axis=None):
        """xyz [B,N,3], features [B,N,C] -> (new_xyz [B,M,3],
        new_features [B,M,C'], inds [B,M], new_mask [B,M]).

        cp_mesh: giant-cloud mode — the N-touching half (FPS + grouping)
        runs over the mesh's 'points' axis via parallel/point_sharded
        (exact semantics, bitwise == the unsharded path with exact
        grouping); the MLP + masked pool stay replicated. cp_batch_axis
        additionally shards the batch (hybrid DP x CP on a 2D mesh)."""
        if cp_mesh is not None:
            from tpu3dsad.parallel.point_sharded import (
                sharded_centers,
                sharded_fps,
            )

            if inds is None:
                inds = sharded_fps(xyz, self.npoint, cp_mesh, mask=mask,
                                   batch_axis=cp_batch_axis)
            new_xyz, new_mask = sharded_centers(
                xyz, inds, cp_mesh, mask=mask, batch_axis=cp_batch_axis
            )
        else:
            if inds is None:
                inds = ops.furthest_point_sample(xyz, self.npoint, mask=mask)
            new_xyz = ops.gather(xyz, inds)
            new_mask = (
                jnp.ones(inds.shape, bool)
                if mask is None
                else jnp.take_along_axis(mask, inds, axis=1)
            )

        pooled = []
        for s, (radius, nsample, channels) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            if cp_mesh is not None:
                from tpu3dsad.parallel.point_sharded import (
                    sharded_query_and_group,
                )

                grouped, _, gmask = sharded_query_and_group(
                    xyz, new_xyz, radius, nsample, cp_mesh,
                    features=features, mask=mask, use_xyz=self.use_xyz,
                    normalize_xyz=self.normalize_xyz,
                    batch_axis=cp_batch_axis,
                )
            else:
                grouped, _, gmask = ops.query_and_group(
                    xyz,
                    new_xyz,
                    radius,
                    nsample,
                    features=features,
                    mask=mask,
                    use_xyz=self.use_xyz,
                    normalize_xyz=self.normalize_xyz,
                )
            # centers of padded/invalid sampled points contribute nothing
            gmask = gmask & new_mask[:, :, None]
            h = SharedMLP(channels, name=f"mlp_{s}")(
                grouped, mask=gmask, train=train, bn_momentum=bn_momentum
            )
            pooled.append(ops.masked_max(h, gmask, axis=2))

        new_features = (
            jnp.concatenate(pooled, axis=-1) if len(pooled) > 1 else pooled[0]
        )
        return new_xyz, new_features, inds, new_mask


class GroupAll(nn.Module):
    """Group every point into one set, MLP, masked max-pool → global feature.

    Lineage pointnet2_utils.GroupAll + the final SA(None) layer of the SSG
    classifier.
    """

    mlp: Sequence[int]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features=None, *, mask=None, train: bool = False,
                 bn_momentum=0.9):
        parts = [xyz] if self.use_xyz else []
        if features is not None:
            parts.append(features)
        grouped = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
        gmask = (
            jnp.ones(xyz.shape[:2], bool) if mask is None else mask.astype(bool)
        )
        h = SharedMLP(self.mlp, name="mlp")(
            grouped, mask=gmask, train=train, bn_momentum=bn_momentum
        )
        return ops.masked_max(h, gmask, axis=1)  # [B, C]
