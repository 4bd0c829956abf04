"""Shape-static 3D NMS — jit-compiled masked greedy suppression.

Lineage: utils/nms.py nms_3d_faster (numpy, host-side — SURVEY.md §2.1):
sort by score desc, greedily keep, suppress IoU > threshold. Here the whole
thing is a fixed-iteration XLA program over the K=num_proposals boxes
(BASELINE.json:5/11 require NMS inside the compiled pipeline). O(K²) IoU
matrix + K-step `fori_loop`; K=256 → trivial on-chip.

Class-aware NMS uses the coordinate-offset trick: translating each box by
class_id × span makes cross-class IoU zero, so one pass handles all classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dsad.ops.boxes import aabb_iou_3d, oriented_bev_iou


def nms_aabb(
    box_min: jnp.ndarray,
    box_max: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    sem_cls: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """box_min/max [B,K,3], scores [B,K], valid [B,K] -> keep [B,K] bool.

    Ties in score break toward the lower index (stable argsort), a
    measure-zero deviation from the lineage's traversal order.
    """
    if sem_cls is not None:
        span = jnp.max(box_max) - jnp.min(box_min) + 1.0
        shift = (sem_cls.astype(box_min.dtype) * span)[..., None]
        box_min = box_min + shift
        box_max = box_max + shift
    iou = aabb_iou_3d(box_min, box_max, box_min, box_max)  # [B,K,K]
    return _greedy_suppress(iou, scores, valid, iou_thresh)


def nms_bev(
    box_min: jnp.ndarray,
    box_max: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    sem_cls: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """2D bird's-eye-view NMS (lineage nms_2d_faster, eval.use_3d_nms=False):
    suppression IoU ignores the z extent. Same inputs as nms_aabb."""
    # collapsing z to a constant slab makes 3D AABB IoU == 2D BEV IoU
    z0 = jnp.zeros_like(box_min[..., 2:3])
    bmin = jnp.concatenate([box_min[..., :2], z0], -1)
    bmax = jnp.concatenate([box_max[..., :2], z0 + 1.0], -1)
    return nms_aabb(bmin, bmax, scores, valid, iou_thresh, sem_cls=sem_cls)


def nms_oriented(
    corners: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    sem_cls: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Oriented-BEV-IoU NMS over [B,K,8,3] corners (VERDICT r1 #8).

    Suppression uses the SAME IoU the AP evaluator scores with
    (eval/ap.py::box3d_iou_oriented), closing the AABB-NMS/oriented-AP
    inconsistency; enable via eval.use_oriented_nms.
    """
    if sem_cls is not None:
        span = jnp.max(corners[..., 0]) - jnp.min(corners[..., 0]) + 1.0
        shift = sem_cls.astype(corners.dtype) * span  # [B,K]
        corners = corners.at[..., 0].add(shift[..., None])
    iou = oriented_bev_iou(corners, corners)  # [B,K,K]
    return _greedy_suppress(iou, scores, valid, iou_thresh)


def _greedy_suppress(iou, scores, valid, iou_thresh):
    """Fixed-iteration greedy NMS given a precomputed [B,K,K] IoU matrix."""
    B, K = scores.shape
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf), axis=-1)

    def body(i, carry):
        keep, suppressed = carry
        cand = order[:, i]  # [B]
        cand_valid = (
            jnp.take_along_axis(valid, cand[:, None], 1)[:, 0]
            & ~jnp.take_along_axis(suppressed, cand[:, None], 1)[:, 0]
        )
        keep = keep.at[jnp.arange(B), cand].set(
            cand_valid | keep[jnp.arange(B), cand]
        )
        cand_iou = jnp.take_along_axis(iou, cand[:, None, None], 1)[:, 0]  # [B,K]
        newly = (cand_iou > iou_thresh) & cand_valid[:, None]
        # never suppress the candidate itself
        newly = newly.at[jnp.arange(B), cand].set(False)
        return keep, suppressed | newly

    keep0 = jnp.zeros((B, K), bool)
    keep, _ = jax.lax.fori_loop(0, K, body, (keep0, jnp.zeros((B, K), bool)))
    return keep & valid
