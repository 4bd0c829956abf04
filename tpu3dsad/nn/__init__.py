"""Flax neural modules: shared MLPs, set abstraction, feature propagation."""

from tpu3dsad.nn.mlp import SharedMLP, MLPHead
from tpu3dsad.nn.norm import MaskedBatchNorm
from tpu3dsad.nn.set_abstraction import SetAbstraction, GroupAll
from tpu3dsad.nn.feature_propagation import FeaturePropagation

__all__ = [
    "SharedMLP",
    "MLPHead",
    "MaskedBatchNorm",
    "SetAbstraction",
    "GroupAll",
    "FeaturePropagation",
]
