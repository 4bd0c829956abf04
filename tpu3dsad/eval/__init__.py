"""Evaluation: on-device prediction parsing (decode + NMS) and host-side AP."""

from tpu3dsad.eval.parse import parse_predictions, parse_groundtruths
from tpu3dsad.eval.ap import APCalculator, box3d_iou_oriented

__all__ = [
    "parse_predictions",
    "parse_groundtruths",
    "APCalculator",
    "box3d_iou_oriented",
]
