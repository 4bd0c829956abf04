"""Datasets & input pipeline: synthetic, ModelNet-style, ScanNet, SUN RGB-D,
KITTI-style outdoor. All loaders emit fixed-shape padded numpy batches
(SURVEY.md §1 L6: host-side numpy pipeline → padded batches + masks)."""

from tpu3dsad.data.pipeline import Batcher, pad_points, pad_boxes
from tpu3dsad.data.registry import get_dataset

__all__ = ["Batcher", "pad_points", "pad_boxes", "get_dataset"]
