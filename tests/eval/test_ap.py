"""Oriented IoU + AP golden tests on analytic scenes (SURVEY.md §4.4)."""

import jax.numpy as jnp
import numpy as np

from tpu3dsad.eval.ap import APCalculator, box3d_iou_oriented, voc_ap
from tpu3dsad.ops.boxes import box_corners


def _corners(center, size, heading=0.0):
    return np.asarray(
        box_corners(
            jnp.asarray(center, jnp.float32),
            jnp.asarray(size, jnp.float32),
            jnp.asarray(heading, jnp.float32),
        )
    )


def test_iou_identical_box():
    c = _corners([0, 0, 0], [2, 1, 1])
    assert abs(box3d_iou_oriented(c, c) - 1.0) < 1e-6


def test_iou_axis_aligned_known_overlap():
    a = _corners([0, 0, 0], [2, 2, 2])
    b = _corners([1, 0, 0], [2, 2, 2])  # half-x overlap: inter 4, union 12
    assert abs(box3d_iou_oriented(a, b) - 4.0 / 12.0) < 1e-5


def test_iou_rotation_invariant_self():
    c45 = _corners([0, 0, 0], [2, 1, 1], np.pi / 4)
    assert abs(box3d_iou_oriented(c45, c45) - 1.0) < 1e-5


def test_iou_rotated_cross():
    """Unit squares, one rotated 45°: intersection is the octagon
    area 2*(sqrt(2)-1), analytic."""
    a = _corners([0, 0, 0], [1, 1, 1], 0.0)
    b = _corners([0, 0, 0], [1, 1, 1], np.pi / 4)
    inter = 2 * (np.sqrt(2) - 1)
    want = inter / (2 - inter)
    assert abs(box3d_iou_oriented(a, b) - want) < 1e-4


def test_iou_disjoint():
    a = _corners([0, 0, 0], [1, 1, 1])
    b = _corners([5, 5, 5], [1, 1, 1])
    assert box3d_iou_oriented(a, b) == 0.0


def test_voc_ap_known_curve():
    # 1 TP then 1 FP over 2 GT: rec [0.5, 0.5], prec [1, 0.5] -> AP 0.5
    assert abs(voc_ap(np.array([0.5, 0.5]), np.array([1.0, 0.5])) - 0.5) < 1e-6


def test_ap_calculator_perfect_detection():
    gt = [
        [(0, _corners([0, 0, 0], [1, 1, 1])), (0, _corners([3, 0, 0], [1, 1, 1]))]
    ]
    pred = [
        [
            (0, _corners([0, 0, 0], [1, 1, 1]), 0.9),
            (0, _corners([3, 0, 0], [1, 1, 1]), 0.8),
        ]
    ]
    calc = APCalculator(iou_thresh=0.25)
    calc.step(pred, gt)
    m = calc.compute_metrics()
    assert abs(m["mAP"] - 1.0) < 1e-6
    assert abs(m["AR"] - 1.0) < 1e-6


def test_ap_calculator_fp_and_miss():
    gt = [
        [(0, _corners([0, 0, 0], [1, 1, 1])), (0, _corners([3, 0, 0], [1, 1, 1]))]
    ]
    # one perfect hit (high score), one total miss (low score)
    pred = [
        [
            (0, _corners([0, 0, 0], [1, 1, 1]), 0.9),
            (0, _corners([9, 9, 9], [1, 1, 1]), 0.3),
        ]
    ]
    calc = APCalculator(iou_thresh=0.25)
    calc.step(pred, gt)
    m = calc.compute_metrics()
    # rec [0.5, 0.5], prec [1.0, 0.5] -> AP 0.5
    assert abs(m["mAP"] - 0.5) < 1e-6


def test_ap_calculator_duplicate_detection_is_fp():
    gt = [[(0, _corners([0, 0, 0], [1, 1, 1]))]]
    pred = [
        [
            (0, _corners([0, 0, 0], [1, 1, 1]), 0.9),
            (0, _corners([0, 0, 0], [1, 1, 1]), 0.8),  # duplicate -> FP
        ]
    ]
    calc = APCalculator(iou_thresh=0.25)
    calc.step(pred, gt)
    m = calc.compute_metrics()
    assert abs(m["mAP"] - 1.0) < 1e-6  # AP unaffected: TP found first
