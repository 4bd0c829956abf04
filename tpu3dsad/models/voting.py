"""Voting module: each seed regresses a vote (xyz offset + feature delta).

Lineage: models/voting_module.py (SURVEY.md §2.2): Conv1d 256→256→256→
(3+256)·vote_factor with BN+ReLU on the hidden layers; vote_xyz = seed_xyz +
offset, vote_features = seed_features + delta. Channels-last here: Dense
stacks on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu3dsad.nn.norm import MaskedBatchNorm


class VotingModule(nn.Module):
    vote_factor: int = 1
    feat_dim: int = 256

    @nn.compact
    def __call__(self, seed_xyz, seed_features, *, mask=None,
                 train: bool = False, bn_momentum=0.9):
        """seed_xyz [B,S,3], seed_features [B,S,C] ->
        (vote_xyz [B,S*F,3], vote_features [B,S*F,C], vote_mask [B,S*F])."""
        B, S, C = seed_features.shape
        F = self.vote_factor
        x = seed_features
        for i in range(2):
            # upstream voting_module.py Conv1d(dim,dim,1) keeps its default
            # bias even before BN — needed for exact checkpoint import
            x = nn.Dense(self.feat_dim, name=f"dense_{i}")(x)
            x = MaskedBatchNorm(name=f"bn_{i}")(
                x, train=train, momentum=bn_momentum, mask=mask
            )
            x = nn.relu(x)
        out = nn.Dense(F * (3 + C), name="out")(x)  # [B, S, F*(3+C)]
        out = out.reshape(B, S, F, 3 + C)

        offset = out[..., :3]
        vote_xyz = seed_xyz[:, :, None, :] + offset
        vote_feat = seed_features[:, :, None, :] + out[..., 3:]
        vote_mask = (
            jnp.ones((B, S), bool) if mask is None else mask.astype(bool)
        )
        vote_mask = jnp.repeat(vote_mask[:, :, None], F, axis=2)
        return (
            vote_xyz.reshape(B, S * F, 3),
            vote_feat.reshape(B, S * F, C),
            vote_mask.reshape(B, S * F),
        )
