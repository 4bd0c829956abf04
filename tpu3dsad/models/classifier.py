"""PointNet++ SSG classification model — benchmark config #1 (BASELINE.json:6).

Lineage: the pointnet2 SSG classifier (SURVEY.md §2.2 "Backbone", sanity
anchor: ModelNet40 91.9%). Architecture: SA(512, r=0.2, K=32, [64,64,128])
→ SA(128, r=0.4, K=64, [128,128,256]) → GroupAll([256,512,1024]) → FC head.
"""

from __future__ import annotations

import flax.linen as nn

from tpu3dsad.nn import GroupAll, MLPHead, SetAbstraction


class PointNet2Classifier(nn.Module):
    num_classes: int = 40
    bn_momentum: float = 0.9
    dropout: float = 0.5

    @nn.compact
    def __call__(self, xyz, features=None, *, mask=None, train: bool = False):
        """xyz [B,N,3] (+features [B,N,C]) -> logits [B, num_classes]."""
        xyz, feats, _, mask = SetAbstraction(
            npoint=512, radii=(0.2,), nsamples=(32,), mlps=((64, 64, 128),),
            bn_momentum=self.bn_momentum, name="sa1",
        )(xyz, features, mask=mask, train=train)
        xyz, feats, _, mask = SetAbstraction(
            npoint=128, radii=(0.4,), nsamples=(64,), mlps=((128, 128, 256),),
            bn_momentum=self.bn_momentum, name="sa2",
        )(xyz, feats, mask=mask, train=train)
        global_feat = GroupAll(
            mlp=(256, 512, 1024), bn_momentum=self.bn_momentum, name="sa3"
        )(xyz, feats, mask=mask, train=train)
        return MLPHead(
            channels=(512, 256),
            num_out=self.num_classes,
            dropout=self.dropout,
            bn_momentum=self.bn_momentum,
            name="head",
        )(global_feat, train=train)
