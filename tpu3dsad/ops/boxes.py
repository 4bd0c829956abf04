"""Oriented 3D box geometry — pure-jax, shape-static.

Replaces the lineage's utils/box_util.py + the decode side of
models/ap_helper.py / DatasetConfig.param2obb (SURVEY.md §2.2 "Box
parametrization & decode"). Convention: Z-up, heading is a counter-clockwise
rotation about +Z, size is (l, w, h) full extents.

Box parametrization (VoteNet family):
  center (3) + heading-bin class/residual (NH bins over 2π) +
  size-template class/residual (NS per-class mean sizes) + semantic scores.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Unit-cube corner signs, order matching the lineage corner convention:
# top face counter-clockwise then bottom face (utils/box_util.get_3d_box).
_CORNER_SIGNS = np.array(
    [
        [+0.5, +0.5, +0.5],
        [-0.5, +0.5, +0.5],
        [-0.5, -0.5, +0.5],
        [+0.5, -0.5, +0.5],
        [+0.5, +0.5, -0.5],
        [-0.5, +0.5, -0.5],
        [-0.5, -0.5, -0.5],
        [+0.5, -0.5, -0.5],
    ],
    dtype=np.float32,
)


def heading_bin_centers(num_bins: int) -> jnp.ndarray:
    """Center angle of each heading bin over [0, 2π)."""
    return jnp.arange(num_bins, dtype=jnp.float32) * (2.0 * np.pi / num_bins)


def angle_from_bin(bin_cls: jnp.ndarray, residual: jnp.ndarray, num_bins: int):
    """(bin index, residual) -> heading angle, wrapped to [-π, π)."""
    angle = bin_cls.astype(jnp.float32) * (2.0 * np.pi / num_bins) + residual
    return jnp.where(angle > np.pi, angle - 2.0 * np.pi, angle)


def angle_to_bin(angle: jnp.ndarray, num_bins: int):
    """heading angle -> (bin index int32, residual). Inverse of angle_from_bin."""
    two_pi = 2.0 * np.pi
    angle = jnp.mod(angle, two_pi)
    bin_width = two_pi / num_bins
    shifted = jnp.mod(angle + bin_width / 2.0, two_pi)
    bin_cls = jnp.floor(shifted / bin_width).astype(jnp.int32)
    residual = shifted - (bin_cls.astype(jnp.float32) * bin_width + bin_width / 2.0)
    return bin_cls, residual


def box_corners(center: jnp.ndarray, size: jnp.ndarray, heading: jnp.ndarray):
    """center [...,3], size [...,3], heading [...] -> corners [...,8,3]."""
    signs = jnp.asarray(_CORNER_SIGNS)
    ext = size[..., None, :] * signs  # broadcast: [..., 8, 3]
    c, s = jnp.cos(heading), jnp.sin(heading)
    x = ext[..., 0] * c[..., None] - ext[..., 1] * s[..., None]
    y = ext[..., 0] * s[..., None] + ext[..., 1] * c[..., None]
    z = ext[..., 2]
    rot = jnp.stack([x, y, z], axis=-1)
    return rot + center[..., None, :]


def corners_to_aabb(corners: jnp.ndarray):
    """corners [...,8,3] -> (mins [...,3], maxs [...,3]) axis-aligned hull.

    The lineage's parse_predictions does exactly this before NMS
    (models/ap_helper.py): NMS runs on the axis-aligned hulls of the
    oriented boxes.
    """
    return jnp.min(corners, axis=-2), jnp.max(corners, axis=-2)


def aabb_iou_3d(min_a, max_a, min_b, max_b):
    """Pairwise IoU of axis-aligned 3D boxes.

    min_a/max_a [..., K, 3], min_b/max_b [..., L, 3] -> [..., K, L].
    Degenerate (zero-volume) boxes get IoU 0.
    """
    lo = jnp.maximum(min_a[..., :, None, :], min_b[..., None, :, :])
    hi = jnp.minimum(max_a[..., :, None, :], max_b[..., None, :, :])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol_a = jnp.prod(jnp.maximum(max_a - min_a, 0.0), axis=-1)
    vol_b = jnp.prod(jnp.maximum(max_b - min_b, 0.0), axis=-1)
    union = vol_a[..., :, None] + vol_b[..., None, :] - inter
    return jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-12), 0.0)


def center_size_to_aabb(center, size):
    """Axis-aligned box directly from center/size (heading ignored)."""
    half = 0.5 * size
    return center - half, center + half
