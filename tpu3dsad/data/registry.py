"""Dataset registry + the common detection-dataset protocol.

Every dataset exposes: mean_sizes [NC,3], class_names, num_classes,
steps_per_epoch(bs), train_batch(rng, bs) -> padded dict,
val_batches(rng, bs) -> iterator of padded dicts.
"""

from __future__ import annotations

import numpy as np

from tpu3dsad.config import Config
from tpu3dsad.data.synthetic import class_mean_sizes, detection_batch


class SyntheticDetectionDataset:
    """Procedural indoor scenes (data.name=synthetic): infinite train stream,
    fixed-seed val set."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.num_classes = cfg.model.num_classes
        self.mean_sizes = class_mean_sizes(self.num_classes)
        self.class_names = [f"class{i}" for i in range(self.num_classes)]
        self._val_batches = 4

    def steps_per_epoch(self, batch_size: int) -> int:
        return max(1, 64 // batch_size)

    def train_batch(self, rng: np.random.Generator, batch_size: int) -> dict:
        return detection_batch(
            rng,
            batch_size,
            self.cfg.data.num_points,
            self.num_classes,
            self.cfg.data.max_boxes,
            vote_candidates=self.cfg.data.vote_candidates,
        )

    def val_batches(self, rng: np.random.Generator, batch_size: int):
        val_rng = np.random.default_rng(999)
        for _ in range(self._val_batches):
            yield detection_batch(
                val_rng,
                batch_size,
                self.cfg.data.num_points,
                self.num_classes,
                self.cfg.data.max_boxes,
                vote_candidates=self.cfg.data.vote_candidates,
            )


def get_dataset(cfg: Config):
    name = cfg.data.name
    if name == "synthetic":
        return SyntheticDetectionDataset(cfg)
    if name == "scannet":
        from tpu3dsad.data.scannet import ScanNetDetectionDataset

        return ScanNetDetectionDataset(cfg)
    if name == "sunrgbd":
        from tpu3dsad.data.sunrgbd import SunRGBDDetectionDataset

        return SunRGBDDetectionDataset(cfg)
    if name == "kitti":
        from tpu3dsad.data.kitti import KittiDetectionDataset

        return KittiDetectionDataset(cfg)
    if name == "packed":
        from tpu3dsad.data.packed import PackedDetectionDataset

        return PackedDetectionDataset(cfg)
    if name == "modelnet":
        from tpu3dsad.data.modelnet import ModelNetClassificationDataset

        return ModelNetClassificationDataset(cfg)
    raise ValueError(f"unknown dataset {name!r}")
