"""SizeAdaptiveDetector — the flagship model.

Lineage: models/votenet.py VoteNet assembly with the 3DSAD size-adaptive
proposal stage (SURVEY.md §1 L3, §3.3 tensor trace): backbone → voting →
size-adaptive clustering/proposal → decoded end_points dict. The height
feature (z − per-scene floor) is computed IN-MODEL when
model.append_height is set; loaders supply only raw features (color).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tpu3dsad.config import ModelConfig
from tpu3dsad.data.synthetic import class_mean_sizes
from tpu3dsad.models.backbone import PointNet2Backbone
from tpu3dsad.models.decode import decode_proposals
from tpu3dsad.models.proposal import LineageProposal, SizeAdaptiveProposal
from tpu3dsad.models.voting import VotingModule


class SizeAdaptiveDetector(nn.Module):
    cfg: ModelConfig
    mean_sizes: tuple | None = None  # [NS,3]; dataset priors, else synthetic

    def _mean_sizes(self) -> np.ndarray:
        if self.mean_sizes is not None:
            return np.asarray(self.mean_sizes, np.float32)
        return class_mean_sizes(self.cfg.num_classes)

    @nn.compact
    def __call__(self, points, features=None, *, mask=None,
                 train: bool = False, bn_momentum=0.9, cp_mesh=None,
                 cp_batch_axis=None):
        """points [B,N,3], features [B,N,C] -> end_points dict.

        cp_mesh (+ cfg.cp_stages > 0): giant-cloud mode — the large-N SA
        levels run point-sharded over the mesh (docs/context_parallel.md);
        pass cp_batch_axis for hybrid DP x CP on a 2D mesh."""
        c = self.cfg
        parts = [] if features is None else [features]
        if c.append_height:
            # height feature: z above per-scene floor (min z of valid points)
            z = points[..., 2:3]
            floor = jnp.min(
                jnp.where(
                    (mask[..., None] if mask is not None else jnp.ones_like(z, bool)),
                    z,
                    jnp.inf,
                ),
                axis=1,
                keepdims=True,
            )
            parts.append(z - floor)
        features = (
            jnp.concatenate(parts, -1) if len(parts) > 1
            else (parts[0] if parts else None)
        )

        end_points = {}
        bb = PointNet2Backbone(c, name="backbone")(
            points, features, mask=mask, train=train, bn_momentum=bn_momentum,
            cp_mesh=cp_mesh, cp_batch_axis=cp_batch_axis,
        )
        end_points.update(bb)

        vote_xyz, vote_feat, vote_mask = VotingModule(
            vote_factor=c.vote_factor, feat_dim=c.seed_feat_dim, name="voting"
        )(
            bb["seed_xyz"], bb["seed_features"], mask=bb["seed_mask"],
            train=train, bn_momentum=bn_momentum,
        )
        end_points["vote_xyz"] = vote_xyz
        end_points["vote_features"] = vote_feat
        end_points["vote_mask"] = vote_mask

        if c.proposal_mode == "lineage":
            # fixed-radius lineage head: full-checkpoint importable
            prop = LineageProposal(
                num_classes=c.num_classes,
                num_heading_bins=c.num_heading_bins,
                num_proposals=c.num_proposals,
                radius=c.proposal_radius,
                nsample=c.cluster_nsample,
                name="proposal",
            )(vote_xyz, vote_feat, vote_mask=vote_mask, train=train,
              bn_momentum=bn_momentum)
        else:
            prop = SizeAdaptiveProposal(
                num_classes=c.num_classes,
                num_heading_bins=c.num_heading_bins,
                num_proposals=c.num_proposals,
                radius_bank=tuple(c.cluster_radius_bank),
                nsample=c.cluster_nsample,
                sampling=c.proposal_sampling,
                density_radius=c.proposal_density_radius,
                candidate_factor=c.proposal_candidate_factor,
                name="proposal",
            )(vote_xyz, vote_feat, vote_mask=vote_mask, train=train,
              bn_momentum=bn_momentum)
        end_points.update(prop)

        decoded = decode_proposals(
            prop["raw_params"], prop["proposal_xyz"], self._mean_sizes(),
            c.num_heading_bins,
        )
        end_points.update(decoded)
        return end_points
