"""Detection losses: vote, objectness, box (center/heading/size), semantic,
and the 3DSAD scale-selection loss.

Lineage: models/loss_helper.py (SURVEY.md §2.2 "Losses"): vote l1-to-GT,
objectness CE with near/far thresholds 0.3/0.6 and class weights (0.2, 0.8),
center chamfer, heading/size cls+reg, sem cls; weighted sum ×10. All GT is
padded to max_boxes with gt_mask — every reduction here is masked.

The scale-selection loss supervises the size-adaptive radius bank (the
3DSAD delta): the target scale for a positive proposal is the bank radius
closest to half the mean horizontal extent of its assigned GT box — the
radius that just covers the object's vote cluster.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu3dsad.ops.boxes import angle_to_bin
from tpu3dsad.ops.xla.common import pairwise_sqdist

NEAR_THRESHOLD = 0.3
FAR_THRESHOLD = 0.6
OBJECTNESS_CLS_WEIGHTS = (0.2, 0.8)


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def huber(x, delta: float = 1.0):
    ax = jnp.abs(x)
    return jnp.where(ax < delta, 0.5 * ax * ax / delta, ax - 0.5 * delta)


def vote_loss(end_points, batch):
    """L1 between predicted votes and GT (seed → owning-object center).

    batch["vote_targets"] is [B,N,3] (single owner per point) or [B,N,V,3]
    (lineage GT_VOTE_FACTOR: up to V candidate owners for points inside
    overlapping objects — the loss takes the min distance over them).
    Loaders emitting [B,N,V,3] must fill unused candidate slots with a COPY
    of the primary offset (the lineage convention), never zeros — a zero
    slot would reward votes that stay at the seed.
    """
    seed_inds = end_points["seed_inds"]  # [B,S] into input points
    vt = batch["vote_targets"]
    if vt.ndim == 3:
        vt = vt[:, :, None, :]  # [B,N,1,3]
    gt_offset = jnp.take_along_axis(
        vt, seed_inds[..., None, None], axis=1
    )  # [B,S,V,3]
    seed_votes_gt = end_points["seed_xyz"][:, :, None, :] + gt_offset
    voting_mask = (
        jnp.take_along_axis(batch["vote_mask"], seed_inds, axis=1)
        & end_points["seed_mask"]
    )
    # vote_factor F is folded innermost into S*F (VotingModule reshape);
    # lineage compute_vote_loss takes the MIN over the F vote copies per
    # seed (only the best vote is penalized — preserves vote diversity),
    # and the min over the V candidate GT owners.
    B, S = seed_inds.shape
    F = end_points["vote_xyz"].shape[1] // S
    votes = end_points["vote_xyz"].reshape(B, S, F, 1, 3)
    dist = jnp.sum(
        jnp.abs(votes - seed_votes_gt[:, :, None, :, :]), axis=-1
    )  # [B,S,F,V]
    return _masked_mean(jnp.min(dist, axis=(-1, -2)), voting_mask)


def assign_proposals(end_points, batch, near=NEAR_THRESHOLD,
                     far=FAR_THRESHOLD):
    """Nearest-GT assignment for each proposal.

    near/far default to the lineage's indoor constants (0.3/0.6 m); outdoor
    configs scale them via model.assign_near/assign_far (a 0.3 m positive
    zone around 4 m cars assigns nothing).

    Returns (objectness_label [B,P], objectness_valid [B,P] — the not-ignored
    zone, assignment [B,P] int — nearest GT index, pos_mask [B,P])."""
    centers = end_points["proposal_xyz"]  # FPS'd vote cluster centers
    d2 = pairwise_sqdist(centers, batch["gt_centers"])  # [B,P,G]
    d2 = jnp.where(batch["gt_mask"][:, None, :], d2, jnp.inf)
    nearest = jnp.argmin(d2, axis=-1)  # [B,P]
    nearest_d = jnp.sqrt(jnp.min(d2, axis=-1))

    has_gt = jnp.any(batch["gt_mask"], axis=-1, keepdims=True)
    valid = end_points["proposal_mask"] & has_gt
    pos = (nearest_d < near) & valid
    neg = (nearest_d > far) & valid
    return pos, neg, nearest


def objectness_loss(end_points, pos, neg):
    logits = end_points["objectness_scores"]
    labels = pos.astype(jnp.int32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    # lineage compute_objectness_loss: per-element CE carries the TARGET
    # class weight (nn.CrossEntropyLoss(weight)), but the normalizer is the
    # COUNT of supervised proposals, not the weight sum
    w = jnp.where(pos, OBJECTNESS_CLS_WEIGHTS[1], 0.0) + jnp.where(
        neg, OBJECTNESS_CLS_WEIGHTS[0], 0.0
    )
    sup = (pos | neg).astype(ce.dtype)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(sup), 1.0)


def center_loss(end_points, batch, pos, norm: float = 1.0):
    """Chamfer: pred→nearest GT (positives) + GT→nearest pred.

    Lineage compute_center_loss uses nn_distance's default SQUARED l2 in
    both directions (no huber — huber-of-sqrt was a deviation that pulled
    far-off centers ~2.7× weaker than the lineage recipe).

    `norm` (model.center_loss_norm) measures the squared distances in units
    of `norm` meters: d²/norm². The lineage's indoor recipe is norm=1
    (bit-identical — the division is skipped); outdoor configs set norm ≈
    assign_near so the chamfer magnitude (and its 2d/norm² gradient) stays
    at the indoor scale instead of exploding quadratically with car-scale
    distances (VERDICT r2 next #2)."""
    pred = end_points["center"]  # [B,P,3]
    gt = batch["gt_centers"]  # [B,G,3]
    BIG = 1e12  # finite sentinel: inf would NaN the masked means (inf * 0)
    d2 = pairwise_sqdist(pred, gt)  # [B,P,G]
    if norm != 1.0:
        d2 = d2 / (norm * norm)
    d2 = jnp.where(batch["gt_mask"][:, None, :], d2, BIG)
    p2g = jnp.min(d2, axis=-1)
    fwd = _masked_mean(p2g * (p2g < BIG), pos)

    d2b = jnp.where(end_points["proposal_mask"][:, :, None], d2, BIG)
    g2p = jnp.min(d2b, axis=1)  # [B,G]
    bwd = _masked_mean(g2p * (g2p < BIG), batch["gt_mask"])
    return fwd + bwd


def box_and_sem_loss(end_points, batch, pos, nearest, mean_sizes, num_heading_bins):
    """Heading/size cls+reg and semantic CE on positive proposals."""

    def gather_gt(field):
        return jnp.take_along_axis(
            batch[field],
            nearest.reshape(*nearest.shape, *(1,) * (batch[field].ndim - 2)),
            axis=1,
        )

    gt_heading = gather_gt("gt_headings")  # [B,P] (or [B,P,1])
    gt_heading = gt_heading.reshape(nearest.shape)
    gt_size = gather_gt("gt_sizes").reshape(*nearest.shape, 3)
    gt_cls = gather_gt("gt_classes").reshape(nearest.shape)

    NH = num_heading_bins
    hbin, hres = angle_to_bin(gt_heading, NH)
    h_ce = optax.softmax_cross_entropy_with_integer_labels(
        end_points["heading_scores"], hbin
    )
    heading_cls = _masked_mean(h_ce, pos)
    pred_res_norm = jnp.take_along_axis(
        end_points["heading_residuals_normalized"], hbin[..., None], -1
    )[..., 0]
    heading_reg = _masked_mean(
        huber(pred_res_norm - hres / (np.pi / NH)), pos
    )

    # size: template class == semantic class (lineage convention)
    s_ce = optax.softmax_cross_entropy_with_integer_labels(
        end_points["size_scores"], gt_cls
    )
    size_cls = _masked_mean(s_ce, pos)
    ms = jnp.asarray(mean_sizes)  # [NS,3]
    gt_res_norm = (gt_size - ms[gt_cls]) / ms[gt_cls]
    pred_sres = jnp.take_along_axis(
        end_points["size_residuals_normalized"],
        gt_cls[..., None, None].repeat(3, -1),
        axis=-2,
    )[..., 0, :]
    # lineage: MEAN of the per-dimension huber over the 3 size dims
    size_reg = _masked_mean(
        jnp.mean(huber(pred_sres - gt_res_norm), axis=-1), pos
    )

    sem_ce = optax.softmax_cross_entropy_with_integer_labels(
        end_points["sem_cls_scores"], gt_cls
    )
    sem_cls = _masked_mean(sem_ce, pos)
    return heading_cls, heading_reg, size_cls, size_reg, sem_cls, gt_size


def scale_selection_loss(end_points, pos, gt_size, radius_bank):
    """3DSAD: CE of scale logits vs the bank radius covering the GT extent."""
    bank = jnp.asarray(radius_bank)  # [R]
    target_r = 0.5 * jnp.mean(gt_size[..., :2], axis=-1)  # [B,P]
    tgt = jnp.argmin(jnp.abs(target_r[..., None] - bank), axis=-1)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        end_points["scale_logits"], tgt
    )
    return _masked_mean(ce, pos)


def detection_loss(end_points, batch, mean_sizes, num_heading_bins,
                   radius_bank, near=NEAR_THRESHOLD, far=FAR_THRESHOLD,
                   center_norm: float = 1.0):
    """Total loss (lineage weighting, SURVEY.md §2.2) + metrics dict.

    An optional batch["scene_mask"] [B] (val tail-batch padding from
    iter_val_batches) excludes whole scenes exactly: every reduction here
    is a masked mean, so folding scene_mask into vote_mask and gt_mask
    (no GT ⇒ no positives/negatives/center terms) removes the padded
    duplicates' contribution instead of merely down-weighting the batch."""
    sm = batch.get("scene_mask")
    if sm is not None:
        batch = dict(batch)
        batch["vote_mask"] = batch["vote_mask"] & sm[:, None]
        batch["gt_mask"] = batch["gt_mask"] & sm[:, None]
    v_loss = vote_loss(end_points, batch)
    pos, neg, nearest = assign_proposals(end_points, batch, near=near,
                                         far=far)
    o_loss = objectness_loss(end_points, pos, neg)
    c_loss = center_loss(end_points, batch, pos, norm=center_norm)
    h_cls, h_reg, s_cls, s_reg, sem, gt_size = box_and_sem_loss(
        end_points, batch, pos, nearest, mean_sizes, num_heading_bins
    )
    # lineage-mode proposal head (fixed radius) has no scale logits
    sc_loss = (
        scale_selection_loss(end_points, pos, gt_size, radius_bank)
        if "scale_logits" in end_points
        else jnp.zeros(())
    )

    box_loss = c_loss + 0.1 * h_cls + h_reg + 0.1 * s_cls + s_reg
    total = (
        v_loss + 0.5 * o_loss + box_loss + 0.1 * sem + 0.1 * sc_loss
    ) * 10.0

    # objectness accuracy over the supervised zone (lineage metric)
    pred_pos = jnp.argmax(end_points["objectness_scores"], -1) == 1
    sup = pos | neg
    obj_acc = _masked_mean((pred_pos == pos).astype(jnp.float32), sup)

    metrics = {
        "loss": total,
        "vote_loss": v_loss,
        "objectness_loss": o_loss,
        "center_loss": c_loss,
        "heading_cls_loss": h_cls,
        "heading_reg_loss": h_reg,
        "size_cls_loss": s_cls,
        "size_reg_loss": s_reg,
        "sem_cls_loss": sem,
        "scale_sel_loss": sc_loss,
        "obj_acc": obj_acc,
        "pos_ratio": jnp.mean(pos.astype(jnp.float32)),
    }
    return total, metrics
