"""Shared MLP blocks.

TPU-native counterpart of the lineage's pytorch_utils.SharedMLP /
Conv1d/Conv2d helpers (SURVEY.md §2.2): the lineage's 1x1 convs over
channels-first tensors are, in channels-last layout, plain Dense layers —
one batched matmul per layer, which XLA tiles straight onto the MXU.
MaskedBatchNorm + ReLU follow each layer: padded points/groups never pollute
the batch statistics (SURVEY.md §7 hard part #2), and BN momentum is a
call-time traced scalar so the lineage's BN-momentum schedule runs inside a
single compiled train step.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn

from tpu3dsad.nn.norm import MaskedBatchNorm


class SharedMLP(nn.Module):
    """Dense+BN+ReLU stack applied pointwise over the last axis.

    Works on any [..., C] tensor ([B,N,C] per-point or [B,M,K,C] per-group).
    `mask` is [...] (one bool per row) and gates the BN statistics.
    """

    channels: Sequence[int]
    use_bn: bool = True
    activate_final: bool = True

    @nn.compact
    def __call__(self, x, *, mask=None, train: bool = False, bn_momentum=0.9):
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, use_bias=not self.use_bn, name=f"dense_{i}")(x)
            if self.use_bn:
                x = MaskedBatchNorm(name=f"bn_{i}")(
                    x, train=train, momentum=bn_momentum, mask=mask
                )
            if self.activate_final or i < len(self.channels) - 1:
                x = nn.relu(x)
        return x


class MLPHead(nn.Module):
    """FC head with BN + dropout, e.g. the classifier tail (lineage
    pointnet2_cls fc layers)."""

    channels: Sequence[int]
    num_out: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False, bn_momentum=0.9):
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, use_bias=False, name=f"fc_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(
                x, train=train, momentum=bn_momentum
            )
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_out, name="out")(x)
