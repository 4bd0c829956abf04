"""Point-cloud + box augmentation (host-side numpy).

Lineage: the augmentation block of scannet/sunrgbd *_detection_dataset.py
__getitem__ (SURVEY.md §2.2): random flips along x/y, rotation about the
up-axis, global scaling. Boxes transform with the cloud; vote targets are
recomputed after augmentation by the caller.
"""

from __future__ import annotations

import numpy as np


def rot_z(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


# Lineage augmentation recipes per dataset (the *_detection_dataset.py
# __getitem__ blocks). rot_range is a HALF-range: angle ~ U(-r, +r).
#   scannet: both flips, ±5° (π/36), no scale  (lineage scannet)
#   sunrgbd: single YZ-plane (x) flip, ±30° (π/6), scale 0.85–1.15
#   kitti:   OUR recipe (no lineage file exists): left-right (y) flip,
#            ±45°, scale 0.95–1.05 — the common outdoor-detector choices
AUG_PRESETS = {
    "scannet": dict(flip_x=True, flip_y=True, rot_range=np.pi / 36,
                    scale_range=None),
    "sunrgbd": dict(flip_x=True, flip_y=False, rot_range=np.pi / 6,
                    scale_range=(0.85, 1.15)),
    "kitti": dict(flip_x=False, flip_y=True, rot_range=np.pi / 4,
                  scale_range=(0.95, 1.05)),
}


def resolve_aug(data_cfg, dataset_name: str) -> dict:
    """Effective augmentation parameters.

    data.aug_preset: 'auto' = the dataset's lineage preset; a preset name
    ('scannet'/'sunrgbd'/'kitti') forces that recipe; 'custom' honors the
    explicit aug_* fields. Anything else is an error — the aug_* fields
    are silently inert outside 'custom', so typos must not pass."""
    preset = data_cfg.aug_preset
    if preset == "custom":
        scale = (
            None
            if data_cfg.aug_scale_min == data_cfg.aug_scale_max == 1.0
            else (data_cfg.aug_scale_min, data_cfg.aug_scale_max)
        )
        return dict(flip_x=data_cfg.aug_flip_x, flip_y=data_cfg.aug_flip_y,
                    rot_range=data_cfg.aug_rot_range, scale_range=scale)
    if preset == "auto":
        return AUG_PRESETS.get(dataset_name, AUG_PRESETS["scannet"])
    if preset in AUG_PRESETS:
        return AUG_PRESETS[preset]
    raise ValueError(
        f"data.aug_preset={preset!r}: expected 'auto', 'custom', or one of "
        f"{sorted(AUG_PRESETS)}"
    )


def augment_scene(
    rng: np.random.Generator,
    points: np.ndarray,
    centers: np.ndarray,
    headings: np.ndarray,
    sizes: np.ndarray,
    flip_x: bool = True,
    flip_y: bool = True,
    rot_range: float = np.pi / 36,  # HALF-range: ±5° — lineage ScanNet
    scale_range: tuple[float, float] | None = None,
):
    """Returns augmented (points, centers, headings, sizes). points [N,3+F]
    (only xyz columns are transformed)."""
    xyz = points[:, :3].copy()
    centers = centers.copy()
    headings = headings.copy()
    sizes = sizes.copy()

    if flip_x and rng.random() < 0.5:  # flip x (YZ plane)
        xyz[:, 0] = -xyz[:, 0]
        centers[:, 0] = -centers[:, 0]
        headings = np.pi - headings
    if flip_y and rng.random() < 0.5:  # flip y (XZ plane)
        xyz[:, 1] = -xyz[:, 1]
        centers[:, 1] = -centers[:, 1]
        headings = -headings

    angle = rng.uniform(-rot_range, rot_range)
    r = rot_z(angle)
    xyz = xyz @ r.T
    centers = centers @ r.T
    headings = headings + angle

    if scale_range is not None:
        s = rng.uniform(*scale_range)
        xyz *= s
        centers *= s
        sizes *= s

    headings = np.mod(headings + np.pi, 2 * np.pi) - np.pi
    out = points.copy()
    out[:, :3] = xyz
    return out, centers, headings, sizes
