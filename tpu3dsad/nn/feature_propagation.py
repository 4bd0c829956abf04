"""Feature propagation (upsampling) module.

TPU-native counterpart of pointnet2_modules.PointnetFPModule (SURVEY.md
§2.2): inverse-distance-weighted 3-NN interpolation of coarse features back
onto the dense set, concat with skip features, unary shared MLP.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpu3dsad import ops
from tpu3dsad.nn.mlp import SharedMLP


class FeaturePropagation(nn.Module):
    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        dense_xyz,
        dense_features,
        sparse_xyz,
        sparse_features,
        *,
        dense_mask=None,
        sparse_mask=None,
        train: bool = False,
        bn_momentum=0.9,
    ):
        """Interpolate sparse [B,S,C] features onto dense [B,N,3] points.

        Returns [B, N, mlp[-1]].
        """
        d2, idx = ops.three_nn(dense_xyz, sparse_xyz, support_mask=sparse_mask)
        # all-invalid support can leave +inf distances; weights stay finite
        d2 = jnp.where(jnp.isfinite(d2), d2, 1e10)
        weight = ops.interp_weights(d2)
        interp = ops.three_interpolate(sparse_features, idx, weight)

        if dense_features is not None:
            interp = jnp.concatenate([dense_features, interp], axis=-1)
        return SharedMLP(self.mlp, name="mlp")(
            interp, mask=dense_mask, train=train, bn_momentum=bn_momentum
        )
