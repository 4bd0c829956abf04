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


def augment_scene(
    rng: np.random.Generator,
    points: np.ndarray,
    centers: np.ndarray,
    headings: np.ndarray,
    sizes: np.ndarray,
    flip: bool = True,
    rot_range: float = np.pi / 18,  # ±5° — lineage ScanNet default
    scale_range: tuple[float, float] | None = (0.9, 1.1),
):
    """Returns augmented (points, centers, headings, sizes). points [N,3+F]
    (only xyz columns are transformed)."""
    xyz = points[:, :3].copy()
    centers = centers.copy()
    headings = headings.copy()
    sizes = sizes.copy()

    if flip and rng.random() < 0.5:  # flip x (YZ plane)
        xyz[:, 0] = -xyz[:, 0]
        centers[:, 0] = -centers[:, 0]
        headings = np.pi - headings
    if flip and rng.random() < 0.5:  # flip y (XZ plane)
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
