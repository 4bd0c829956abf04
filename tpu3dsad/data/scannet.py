"""ScanNet V2 detection dataset — benchmark config #3 (40k pts, 18 classes).

Lineage: scannet/scannet_detection_dataset.py + batch_load_scannet_data.py
preprocessing (SURVEY.md §2.2). On-disk contract (the standard extracted
.npy layout the lineage preproc emits), under `<root>/<split>/`:

  <scan>_vert.npy       float32 [N, 6]  xyz + rgb(0-255)
  <scan>_ins_label.npy  int     [N]     instance id (0 = unannotated)
  <scan>_sem_label.npy  int     [N]     nyu40 semantic id
  <scan>_bbox.npy       float32 [G, 7]  cx cy cz dx dy dz nyu40_cls
                                        (axis-aligned: ScanNet has no heading)

Scene list = sorted unique <scan> prefixes. Vote targets: every point of an
annotated instance votes for that instance's bbox center.
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np

from tpu3dsad.config import Config
from tpu3dsad.data.augment import augment_scene, resolve_aug
from tpu3dsad.data.pipeline import iter_val_batches, pad_boxes

# The 18 ScanNet benchmark classes and their nyu40 ids (lineage
# scannet/model_util_scannet.py ScannetDatasetConfig).
SCANNET_CLASS_NAMES = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "showercurtain", "toilet", "sink", "bathtub", "garbagebin",
)
NYU40_IDS = (3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39)

# per-class mean box sizes (meters) — lineage mean_size_arr priors
SCANNET_MEAN_SIZES = np.array(
    [
        [0.775, 0.949, 0.966], [1.876, 1.842, 1.193], [0.612, 0.620, 0.704],
        [1.442, 1.605, 0.837], [1.160, 1.055, 0.500], [0.620, 0.726, 2.023],
        [0.288, 1.160, 1.384], [0.404, 1.074, 1.688], [0.596, 0.551, 0.850],
        [0.388, 0.600, 0.728], [0.696, 1.347, 0.500], [0.555, 1.006, 1.883],
        [0.972, 1.557, 0.948], [0.582, 1.163, 1.815], [0.406, 0.506, 0.504],
        [0.489, 0.632, 0.602], [0.868, 1.270, 1.334], [0.261, 0.283, 0.543],
    ],
    np.float32,
)


class ScanNetDetectionDataset:
    num_classes = len(SCANNET_CLASS_NAMES)
    class_names = SCANNET_CLASS_NAMES
    mean_sizes = SCANNET_MEAN_SIZES

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.root = cfg.data.root
        if not self.root or not os.path.isdir(self.root):
            raise FileNotFoundError(
                f"data.root={self.root!r} not found — point it at the "
                "extracted ScanNet .npy directory (see module docstring)"
            )
        self.nyu40_to_cls = {n: i for i, n in enumerate(NYU40_IDS)}
        self.train_scans = self._scan_list("train")
        self.val_scans = self._scan_list("val")

    def _scan_list(self, split):
        d = os.path.join(self.root, split)
        scans = sorted(
            os.path.basename(p)[: -len("_vert.npy")]
            for p in glob(os.path.join(d, "*_vert.npy"))
        )
        return [(d, s) for s in scans]

    def steps_per_epoch(self, batch_size: int) -> int:
        return max(1, len(self.train_scans) // batch_size)

    # ------------------------------------------------------------- loading

    def _load_scene(self, d, scan, rng, augment):
        verts = np.load(os.path.join(d, f"{scan}_vert.npy"))
        ins = np.load(os.path.join(d, f"{scan}_ins_label.npy"))
        sem = np.load(os.path.join(d, f"{scan}_sem_label.npy"))
        bboxes = np.load(os.path.join(d, f"{scan}_bbox.npy"))

        keep = np.array(
            [self.nyu40_to_cls.get(int(b[6]), -1) >= 0 for b in bboxes], bool
        ) if len(bboxes) else np.zeros(0, bool)
        bboxes = bboxes[keep]
        centers = bboxes[:, :3].astype(np.float32)
        sizes = bboxes[:, 3:6].astype(np.float32)
        headings = np.zeros(len(bboxes), np.float32)  # axis-aligned
        classes = np.array(
            [self.nyu40_to_cls[int(b[6])] for b in bboxes], np.int32
        )

        n_budget = self.cfg.data.num_points
        n = verts.shape[0]
        sel = (
            rng.choice(n, n_budget, replace=n < n_budget)
            if n != n_budget
            else np.arange(n)
        )
        points = verts[sel, :3].astype(np.float32)
        colors = None
        if self.cfg.data.use_color:
            # color-less scenes get zeros so every batch item has identical
            # keys (np.stack in _batch would KeyError on a mixed dataset)
            colors = (
                (verts[sel, 3:6] / 256.0).astype(np.float32)
                if verts.shape[1] >= 6
                else np.zeros((len(sel), 3), np.float32)
            )
        ins = ins[sel]
        sem = sem[sel]

        if augment and self.cfg.data.augment:
            points, centers, headings, sizes = augment_scene(
                rng, points, centers, headings, sizes,
                **resolve_aug(self.cfg.data, "scannet"),
            )

        # vote targets: points of an annotated instance of a benchmark class
        # vote for the instance centroid's owning bbox center. Instance →
        # bbox matching: bbox whose center is closest to the instance median.
        V = max(1, self.cfg.data.vote_candidates)
        votes = np.zeros((n_budget, 3), np.float32)
        vmask = np.zeros(n_budget, bool)
        owner = np.full(n_budget, -1, np.int64)  # primary box per point
        if len(centers):
            for i in np.unique(ins):
                if i == 0:
                    continue
                pt_idx = np.nonzero(ins == i)[0]
                if not len(pt_idx):
                    continue
                if self.nyu40_to_cls.get(int(np.median(sem[pt_idx])), -1) < 0:
                    continue
                med = np.median(points[pt_idx], axis=0)
                b = int(np.argmin(np.sum((centers - med) ** 2, -1)))
                votes[pt_idx] = centers[b] - points[pt_idx]
                vmask[pt_idx] = True
                owner[pt_idx] = b
        if V > 1 and not self.cfg.data.compact_votes:
            # DELIBERATE DEVIATION from the lineage ScanNet dataset: upstream
            # scannet_detection_dataset.py tiles three IDENTICAL copies of
            # the primary vote (np.tile(point_votes, (1, 3))), which under
            # the min-over-V vote loss is behaviorally identical to V=1 —
            # set data.vote_candidates=1 to recover exact lineage semantics.
            # Here slots 1..V-1 take DISTINCT other containing boxes via the
            # shared oriented-containment expansion (pipeline.candidate_votes,
            # the SUN RGB-D convention), measured mAP@0.5 0.162→0.269 on the
            # 18-class leg (docs/experiments r3_18cls_votefactor3). Pinned by
            # test_datasets.py::test_scannet_overlap_extra_candidate_is_other_box.
            from tpu3dsad.data.pipeline import candidate_votes

            votes = candidate_votes(
                points, votes, vmask, owner, centers, sizes, headings, V
            )

        max_boxes = self.cfg.data.max_boxes
        c, bm = pad_boxes(centers, max_boxes)
        s, _ = pad_boxes(sizes, max_boxes)
        h, _ = pad_boxes(headings, max_boxes)
        k, _ = pad_boxes(classes, max_boxes)
        out_extra = {} if colors is None else {"point_features": colors}
        if self.cfg.data.compact_votes:
            # compact wire format: ship the primary owner index only; the
            # jitted step reconstructs vote_targets/vote_mask on device
            # (device_pipeline.decode_compact_votes, semantics pinned ==
            # this loader's expanded path by test_compact_votes.py)
            from tpu3dsad.data.pipeline import compact_owner

            vote_fields = {"vote_owner": compact_owner(owner, max_boxes)}
        else:
            vote_fields = {"vote_targets": votes, "vote_mask": vmask}
        return {
            **out_extra,
            "points": points,
            "point_mask": np.ones(n_budget, bool),
            **vote_fields,
            "gt_centers": c,
            "gt_sizes": s,
            "gt_headings": h,
            "gt_classes": k,
            "gt_mask": bm,
        }

    def _batch(self, scans, rng, batch_size, augment):
        picks = rng.choice(len(scans), batch_size, replace=len(scans) < batch_size)
        items = [self._load_scene(*scans[p], rng, augment) for p in picks]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def train_batch(self, rng, batch_size):
        return self._batch(self.train_scans, rng, batch_size, augment=True)

    def val_batches(self, rng, batch_size):
        scans = self.val_scans or self.train_scans
        yield from iter_val_batches(
            scans, lambda it: self._load_scene(*it, rng, False), batch_size
        )
