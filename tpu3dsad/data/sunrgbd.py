"""SUN RGB-D detection dataset — benchmark config #2 (20k pts, 10 classes).

Lineage: sunrgbd/sunrgbd_detection_dataset.py (SURVEY.md §2.2). On-disk
contract (standard extracted layout), under `<root>/<split>/`:

  <idx>_pc.npy    float32 [N, 6]   xyz + rgb(0-1)  (upright depth coords, Z-up)
  <idx>_bbox.npy  float32 [G, 8]   cx cy cz dx dy dz heading cls
                                   (dx/dy/dz FULL extents; cls in 0..9)
  <idx>_votes.npy float32 [N, 4]   optional precomputed votes (mask, dx, dy,
                                   dz) — used verbatim when augmentation is
                                   off; otherwise votes are recomputed from
                                   the (augmented) boxes via points-in-box

10 classes, oriented boxes with heading about +Z.
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np

from tpu3dsad.config import Config
from tpu3dsad.data.augment import augment_scene, resolve_aug, rot_z
from tpu3dsad.data.pipeline import iter_val_batches, pad_boxes

SUNRGBD_CLASS_NAMES = (
    "bed", "table", "sofa", "chair", "toilet", "desk", "dresser",
    "night_stand", "bookshelf", "bathtub",
)

# lineage sunrgbd/model_util_sunrgbd.py mean_size_arr priors
SUNRGBD_MEAN_SIZES = np.array(
    [
        [2.114256, 1.620300, 0.927272], [0.791118, 1.279516, 0.718182],
        [0.923508, 1.867419, 0.845495], [0.591958, 0.552978, 0.827272],
        [0.699104, 0.454178, 0.756250], [0.69519, 1.346299, 0.736364],
        [0.528526, 1.002642, 1.172878], [0.500618, 0.632163, 0.683424],
        [0.404671, 1.071108, 1.688889], [0.76584, 1.398258, 0.472728],
    ],
    np.float32,
)


def points_in_oriented_box(points, center, size, heading):
    """Bool mask of points inside an oriented (Z-up) box."""
    local = (points - center) @ rot_z(heading)  # world→box via R^T == @R
    half = size / 2
    return np.all(np.abs(local) <= half + 1e-6, axis=-1)


class SunRGBDDetectionDataset:
    num_classes = len(SUNRGBD_CLASS_NAMES)
    class_names = SUNRGBD_CLASS_NAMES
    mean_sizes = SUNRGBD_MEAN_SIZES

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.root = cfg.data.root
        if not self.root or not os.path.isdir(self.root):
            raise FileNotFoundError(
                f"data.root={self.root!r} not found — point it at the "
                "extracted SUN RGB-D .npy directory (see module docstring)"
            )
        self.train_items = self._items("train")
        self.val_items = self._items("val")

    def _items(self, split):
        d = os.path.join(self.root, split)
        idxs = sorted(
            os.path.basename(p)[: -len("_pc.npy")]
            for p in glob(os.path.join(d, "*_pc.npy"))
        )
        return [(d, i) for i in idxs]

    def steps_per_epoch(self, batch_size: int) -> int:
        return max(1, len(self.train_items) // batch_size)

    def _load_scene(self, d, idx, rng, augment):
        pc = np.load(os.path.join(d, f"{idx}_pc.npy"))
        bboxes = np.load(os.path.join(d, f"{idx}_bbox.npy"))
        bboxes = bboxes.reshape(-1, 8)

        centers = bboxes[:, :3].astype(np.float32)
        sizes = bboxes[:, 3:6].astype(np.float32)
        headings = bboxes[:, 6].astype(np.float32)
        classes = bboxes[:, 7].astype(np.int32)

        n_budget = self.cfg.data.num_points
        n = pc.shape[0]
        sel = (
            rng.choice(n, n_budget, replace=n < n_budget)
            if n != n_budget
            else np.arange(n)
        )
        points = pc[sel, :3].astype(np.float32)
        colors = None
        if self.cfg.data.use_color:
            # zero-fill color-less scenes: every item must carry the same
            # keys or np.stack in _batch KeyErrors on a mixed dataset
            colors = (
                pc[sel, 3:6].astype(np.float32)
                if pc.shape[1] >= 6
                else np.zeros((len(sel), 3), np.float32)
            )

        if augment and self.cfg.data.augment:
            # lineage SUN RGB-D: single YZ flip, ±30° rotation, 0.85–1.15
            # scale (AUG_PRESETS["sunrgbd"])
            points, centers, headings, sizes = augment_scene(
                rng, points, centers, headings, sizes,
                **resolve_aug(self.cfg.data, "sunrgbd"),
            )

        V = max(1, self.cfg.data.vote_candidates)
        compact = self.cfg.data.compact_votes
        votes = np.zeros((n_budget, 3), np.float32)
        vmask = np.zeros(n_budget, bool)
        votes_file = os.path.join(d, f"{idx}_votes.npy")
        if compact and os.path.exists(votes_file):
            raise ValueError(
                "data.compact_votes cannot represent the verbatim offsets "
                f"of {votes_file} (owners are only exact for votes aimed at "
                "box centers) — use expanded votes for this dataset"
            )
        if (not (augment and self.cfg.data.augment)) and os.path.exists(votes_file):
            # [N,4] (mask, dxyz) or the lineage 10-col layout (mask + the
            # GT_VOTE_FACTOR=3 candidate offsets of sunrgbd_data.py)
            pre = np.load(votes_file)[sel]
            vmask = pre[:, 0] > 0.5
            if pre.shape[1] >= 10:
                cand = pre[:, 1:10].astype(np.float32).reshape(n_budget, 3, 3)
                votes = cand[:, 0]
                if V > 1:
                    full = np.repeat(votes[:, None, :], V, axis=1)
                    full[:, 1 : min(V, 3)] = cand[:, 1 : min(V, 3)]
                    votes = full
            else:
                votes = pre[:, 1:4].astype(np.float32)
                if V > 1:
                    votes = self._expand_candidates(
                        points, votes, vmask, centers, sizes, headings, V
                    )
        elif len(centers):
            from tpu3dsad.utils import native

            boxes8 = np.concatenate(
                [centers, sizes, headings[:, None],
                 classes[:, None].astype(np.float32)], axis=1
            )
            votes, vmask = native.vote_targets(points, boxes8)
            if V > 1 and not compact:
                votes = self._expand_candidates(
                    points, votes, vmask, centers, sizes, headings, V
                )
        elif V > 1 and not compact:
            # boxless scene: keep the [N,V,3] shape batch-stackable
            votes = np.repeat(votes[:, None, :], V, axis=1)

        max_boxes = self.cfg.data.max_boxes
        c, bm = pad_boxes(centers, max_boxes)
        s, _ = pad_boxes(sizes, max_boxes)
        h, _ = pad_boxes(headings, max_boxes)
        k, _ = pad_boxes(classes, max_boxes)
        out_extra = {} if colors is None else {"point_features": colors}
        if compact:
            # compact-votes wire format: int8 owners, targets decoded on
            # device (device_pipeline.decode_compact_votes). Recovery is
            # exact here — native.vote_targets aims every vote at the
            # owner's center (last containing box; the recovered
            # nearest-center IS that box, distance 0).
            from tpu3dsad.data.pipeline import compact_owner, recover_owner

            owner = recover_owner(points, votes, vmask, centers)
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

    @staticmethod
    def _expand_candidates(points, votes, vmask, centers, sizes, headings, V):
        """[N,3]→[N,V,3] via pipeline.candidate_votes; the primary owner is
        recovered as the box whose center the vote points at (exact for
        votes our own generators produce; nearest-center for file votes)."""
        from tpu3dsad.data.pipeline import candidate_votes

        owner = np.full(len(points), -1, np.int64)
        if vmask.any() and len(centers):
            tgt = points[vmask] + votes[vmask]
            owner[vmask] = np.argmin(
                np.sum((tgt[:, None, :] - centers[None]) ** 2, -1), axis=1
            )
        return candidate_votes(
            points, votes, vmask, owner, centers, sizes, headings, V
        )

    def _batch(self, items, rng, batch_size, augment):
        picks = rng.choice(len(items), batch_size, replace=len(items) < batch_size)
        out = [self._load_scene(*items[p], rng, augment) for p in picks]
        return {k: np.stack([it[k] for it in out]) for k in out[0]}

    def train_batch(self, rng, batch_size):
        return self._batch(self.train_items, rng, batch_size, augment=True)

    def val_batches(self, rng, batch_size):
        items = self.val_items or self.train_items
        yield from iter_val_batches(
            items, lambda it: self._load_scene(*it, rng, False), batch_size
        )
