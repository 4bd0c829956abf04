"""Model assemblies: PointNet++ classifier, detection backbone, voting,
size-adaptive proposal head, and the full detector."""

from tpu3dsad.models.classifier import PointNet2Classifier
from tpu3dsad.models.backbone import PointNet2Backbone

__all__ = ["PointNet2Classifier", "PointNet2Backbone"]
