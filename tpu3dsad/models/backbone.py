"""PointNet++ detection backbone: 4×SA + 2×FP → 1024 seed points.

Lineage: models/backbone_module.py Pointnet2Backbone (SURVEY.md §2.2, §3.3
tensor trace): N pts → SA(2048, r=0.2, K=64) → SA(1024, r=0.4, K=32) →
SA(512, r=0.8, K=16) → SA(256, r=1.2, K=16) → FP(512←256) → FP(1024←512)
→ seeds [B, 1024, seed_dim] + seed xyz + seed inds.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu3dsad.config import ModelConfig
from tpu3dsad.nn import FeaturePropagation, SetAbstraction


class PointNet2Backbone(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, xyz, features=None, *, mask=None, train: bool = False,
                 bn_momentum=0.9, cp_mesh=None, cp_batch_axis=None):
        """Returns dict with seed_xyz [B,S,3], seed_features [B,S,D],
        seed_inds [B,S], seed_mask [B,S] (S = cfg.sa_npoints[1]).

        cp_mesh: giant-cloud mode — the first cfg.cp_stages SA levels run
        their N-touching half (FPS + grouping) sharded over the mesh's
        'points' axis (docs/context_parallel.md); after that M is small and
        everything continues replicated. Exact semantics, so the output is
        bitwise the unsharded exact-grouping program."""
        c = self.cfg
        sa_out = []  # (xyz, feats, inds, mask) per level
        cur = (xyz, features, None, mask)
        for i in range(len(c.sa_npoints)):
            cp = cp_mesh if (cp_mesh is not None and i < c.cp_stages) else None
            new = SetAbstraction(
                npoint=c.sa_npoints[i],
                radii=(c.sa_radii[i],),
                nsamples=(c.sa_nsamples[i],),
                mlps=(tuple(c.sa_channels[i]),),
                normalize_xyz=True,
                name=f"sa{i + 1}",
            )(cur[0], cur[1], mask=cur[3], train=train,
              bn_momentum=bn_momentum, cp_mesh=cp,
              cp_batch_axis=cp_batch_axis)
            sa_out.append(new)
            cur = new

        # FP1: level4 -> level3, FP2: level3 -> level2 (seeds)
        x3, f3, i3, m3 = sa_out[2]
        x4, f4, i4, m4 = sa_out[3]
        f3p = FeaturePropagation(mlp=tuple(c.fp_channels[0]), name="fp1")(
            x3, f3, x4, f4, dense_mask=m3, sparse_mask=m4, train=train,
            bn_momentum=bn_momentum,
        )
        x2, f2, i2, m2 = sa_out[1]
        seeds = FeaturePropagation(mlp=tuple(c.fp_channels[1]), name="fp2")(
            x2, f2, x3, f3p, dense_mask=m2, sparse_mask=m3, train=train,
            bn_momentum=bn_momentum,
        )

        # Seed indices into the ORIGINAL cloud: compose sa2's picks (indices
        # into sa1's set) with sa1's picks. The lineage instead approximates
        # with sa1_inds[:, :num_seed] (a known votenet quirk); composition is
        # the exact mapping and only affects vote-target assignment.
        seed_inds = jnp.take_along_axis(sa_out[0][2], i2, axis=1)
        return {
            "seed_xyz": x2,
            "seed_features": seeds,
            "seed_inds": seed_inds,
            "seed_mask": m2,
            "sa1_xyz": sa_out[0][0],
            "sa1_inds": sa_out[0][2],
        }
