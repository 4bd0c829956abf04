"""Decode raw proposal params into box fields.

Lineage: decode_scores in models/proposal_module.py + DatasetConfig.param2obb
(SURVEY.md §2.2 "Box parametrization & decode"). Channel layout of raw
[B, P, 2 + 3 + NH*2 + NS*4 + NC]:
  objectness(2) | center offset(3) | heading cls(NH) | heading res norm(NH) |
  size cls(NS) | size res norm(NS*3) | semantic cls(NC)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def decode_proposals(raw, base_xyz, mean_sizes, num_heading_bins: int):
    """raw [B,P,C], base_xyz [B,P,3] (cluster centers), mean_sizes [NS,3].

    Returns dict of decoded fields (lineage end_points naming).
    """
    NH = num_heading_bins
    NS = mean_sizes.shape[0]
    i = 0

    def take(n):
        nonlocal i
        out = raw[..., i : i + n]
        i += n
        return out

    objectness = take(2)
    center = base_xyz + take(3)
    heading_scores = take(NH)
    heading_res_norm = take(NH)
    heading_res = heading_res_norm * (np.pi / NH)
    size_scores = take(NS)
    size_res_norm = take(NS * 3).reshape(*raw.shape[:2], NS, 3)
    size_res = size_res_norm * jnp.asarray(mean_sizes)[None, None, :, :]
    sem_cls_scores = raw[..., i:]

    return {
        "objectness_scores": objectness,
        "center": center,
        "heading_scores": heading_scores,
        "heading_residuals_normalized": heading_res_norm,
        "heading_residuals": heading_res,
        "size_scores": size_scores,
        "size_residuals_normalized": size_res_norm,
        "size_residuals": size_res,
        "sem_cls_scores": sem_cls_scores,
    }


def predicted_boxes(end_points, mean_sizes, num_heading_bins: int):
    """Argmax decode to concrete boxes: (center [B,P,3], size [B,P,3],
    heading [B,P], sem_cls [B,P], objectness_prob [B,P])."""
    from tpu3dsad.ops.boxes import angle_from_bin

    center = end_points["center"]
    hcls = jnp.argmax(end_points["heading_scores"], -1)
    hres = jnp.take_along_axis(
        end_points["heading_residuals"], hcls[..., None], -1
    )[..., 0]
    heading = angle_from_bin(hcls, hres, num_heading_bins)

    scls = jnp.argmax(end_points["size_scores"], -1)  # [B,P]
    sres = jnp.take_along_axis(
        end_points["size_residuals"],
        scls[..., None, None].repeat(3, -1),
        axis=-2,
    )[..., 0, :]
    size = jnp.asarray(mean_sizes)[scls] + sres
    size = jnp.maximum(size, 1e-4)

    sem = jnp.argmax(end_points["sem_cls_scores"], -1)
    obj_prob = jax.nn.softmax(end_points["objectness_scores"], axis=-1)[..., 1]
    return center, size, heading, sem, obj_prob
