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


# --------------------------------------------------- oriented BEV IoU (jit)


def _shoelace(poly, n):
    """Signed area ×2 of padded polygons. poly [..., V, 2], n [...] int."""
    V = poly.shape[-2]
    iota = jnp.arange(V)
    valid = iota < n[..., None]
    nxt = jnp.where(n[..., None] > 0, (iota + 1) % jnp.maximum(n[..., None], 1), 0)
    p_next = jnp.take_along_axis(poly, nxt[..., None], axis=-2)
    terms = poly[..., 0] * p_next[..., 1] - p_next[..., 0] * poly[..., 1]
    return jnp.sum(jnp.where(valid, terms, 0.0), axis=-1)


def _clip_edge(poly, n, a, b):
    """One Sutherland–Hodgman step: clip padded polygon against edge a→b
    (inside = left of a→b for CCW clip quads). poly [..., V, 2], n [...]."""
    V = poly.shape[-2]
    iota = jnp.arange(V)
    valid = iota < n[..., None]
    prev = jnp.where(n[..., None] > 0, (iota - 1) % jnp.maximum(n[..., None], 1), 0)
    s = jnp.take_along_axis(poly, prev[..., None], axis=-2)
    e = poly
    d = (b - a)[..., None, :]

    def side(p):
        r = p - a[..., None, :]
        return d[..., 0] * r[..., 1] - d[..., 1] * r[..., 0]

    in_s = side(s) >= 0.0
    in_e = side(e) >= 0.0
    denom = side(s) - side(e)
    t = side(s) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    ipt = s + t[..., None] * (e - s)

    # sequential SH emit order per input edge: [intersection?, endpoint?]
    emit1 = valid & (in_e != in_s)
    emit2 = valid & in_e
    cand = jnp.stack([ipt, e], axis=-2).reshape(*poly.shape[:-2], 2 * V, 2)
    emit = jnp.stack([emit1, emit2], axis=-1).reshape(*poly.shape[:-2], 2 * V)

    pos = jnp.cumsum(emit, axis=-1) - 1  # target slot per emitted candidate
    new_n = jnp.sum(emit, axis=-1).astype(jnp.int32)
    onehot = (
        (pos[..., None] == jnp.arange(V)) & emit[..., None]
    ).astype(poly.dtype)  # [..., 2V, V]
    new_poly = jnp.einsum("...cv,...cx->...vx", onehot, cand)
    return new_poly, new_n


def oriented_bev_iou(corners_a: jnp.ndarray, corners_b: jnp.ndarray):
    """Pairwise IoU of oriented 3D boxes from [...,K,8,3] / [...,L,8,3]
    corners (box_corners convention: top face 0-3 CCW, Z-up) → [...,K,L].

    Same geometry as eval/ap.py::box3d_iou_oriented (BEV polygon clip ×
    z-extent overlap), but shape-static and jit-compiled so oriented NMS
    runs inside the XLA pipeline. The polygon buffer is 8 wide — exact,
    since clipping a quad by 4 half-planes yields ≤ 8 vertices.
    """
    qa = corners_a[..., :, None, :4, :2]  # subject [...,K,1,4,2]
    qb = corners_b[..., None, :, :4, :2]  # clip    [...,1,L,4,2]
    shape = jnp.broadcast_shapes(qa.shape[:-2], qb.shape[:-2])
    qa = jnp.broadcast_to(qa, shape + (4, 2))
    qb = jnp.broadcast_to(qb, shape + (4, 2))

    poly = jnp.concatenate([qa, jnp.zeros(shape + (4, 2), qa.dtype)], axis=-2)
    n = jnp.full(shape, 4, jnp.int32)
    for i in range(4):
        poly, n = _clip_edge(poly, n, qb[..., i, :], qb[..., (i + 1) % 4, :])
    inter2d = 0.5 * jnp.abs(_shoelace(poly, n))

    za = corners_a[..., :, None, :, 2]
    zb = corners_b[..., None, :, :, 2]
    inter_h = jnp.maximum(
        jnp.minimum(za.max(-1), zb.max(-1)) - jnp.maximum(za.min(-1), zb.min(-1)),
        0.0,
    )
    inter = inter2d * inter_h

    area_a = 0.5 * jnp.abs(_shoelace(corners_a[..., :4, :2], 4 * jnp.ones(corners_a.shape[:-2], jnp.int32)))
    area_b = 0.5 * jnp.abs(_shoelace(corners_b[..., :4, :2], 4 * jnp.ones(corners_b.shape[:-2], jnp.int32)))
    va = area_a * (corners_a[..., 2].max(-1) - corners_a[..., 2].min(-1))
    vb = area_b * (corners_b[..., 2].max(-1) - corners_b[..., 2].min(-1))
    union = va[..., :, None] + vb[..., None, :] - inter
    return jnp.where(union > 1e-12, inter / jnp.maximum(union, 1e-12), 0.0)
