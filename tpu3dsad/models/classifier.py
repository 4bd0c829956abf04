"""PointNet++ classification models — benchmark config #1 (BASELINE.json:6).

Lineage: the pointnet2 classifiers (SURVEY.md §2.2 "Backbone"). SSG:
SA(512, r=0.2, K=32, [64,64,128]) → SA(128, r=0.4, K=64, [128,128,256])
→ GroupAll([256,512,1024]) → FC head. MSG (the 91.9% ModelNet40 anchor,
model.classifier_msg=true): each SA level groups at THREE radii and
concatenates the pooled features (lineage pointnet2_cls_msg radii/widths).
"""

from __future__ import annotations

import flax.linen as nn

from tpu3dsad.nn import GroupAll, MLPHead, SetAbstraction


def build_classifier(cfg, num_classes: int) -> "PointNet2Classifier":
    """The one place the point-budget-derived sampling schedule lives:
    train.py and eval.py MUST build the identical architecture or restored
    checkpoints silently evaluate a different model."""
    n = cfg.data.num_points
    return PointNet2Classifier(
        num_classes=num_classes, dropout=cfg.model.dropout,
        sa1_npoint=min(512, n // 2), sa2_npoint=min(128, n // 8),
        msg=cfg.model.classifier_msg,
    )


class PointNet2Classifier(nn.Module):
    num_classes: int = 40
    dropout: float = 0.5
    sa1_npoint: int = 512
    sa1_nsample: int = 32
    sa2_npoint: int = 128
    sa2_nsample: int = 64
    msg: bool = False  # multi-scale grouping (lineage pointnet2_cls_msg)

    @nn.compact
    def __call__(self, xyz, features=None, *, mask=None, train: bool = False,
                 bn_momentum=0.9):
        """xyz [B,N,3] (+features [B,N,C]) -> logits [B, num_classes]."""
        if self.msg:
            sa1 = dict(radii=(0.1, 0.2, 0.4), nsamples=(16, 32, 128),
                       mlps=((32, 32, 64), (64, 64, 128), (64, 96, 128)))
            sa2 = dict(radii=(0.2, 0.4, 0.8), nsamples=(32, 64, 128),
                       mlps=((64, 64, 128), (128, 128, 256), (128, 128, 256)))
        else:
            sa1 = dict(radii=(0.2,), nsamples=(self.sa1_nsample,),
                       mlps=((64, 64, 128),))
            sa2 = dict(radii=(0.4,), nsamples=(self.sa2_nsample,),
                       mlps=((128, 128, 256),))
        xyz, feats, _, mask = SetAbstraction(
            npoint=self.sa1_npoint, name="sa1", **sa1
        )(xyz, features, mask=mask, train=train, bn_momentum=bn_momentum)
        xyz, feats, _, mask = SetAbstraction(
            npoint=self.sa2_npoint, name="sa2", **sa2
        )(xyz, feats, mask=mask, train=train, bn_momentum=bn_momentum)
        global_feat = GroupAll(mlp=(256, 512, 1024), name="sa3")(
            xyz, feats, mask=mask, train=train, bn_momentum=bn_momentum
        )
        return MLPHead(
            channels=(512, 256),
            num_out=self.num_classes,
            dropout=self.dropout,
            name="head",
        )(global_feat, train=train, bn_momentum=bn_momentum)
