"""Pallas TPU kernels — the fast tier behind the ops API.

Ops without a dedicated kernel fall back to the XLA tier (gather/group are
already native XLA gathers; pairwise+top_k paths are MXU/sort ops XLA
handles well). The kernels here target the genuinely XLA-hostile pieces:
FPS's sequential argmax loop first (SURVEY.md §7 hard part #1).
"""

from tpu3dsad.ops.pallas.ball_query import ball_query, query_and_group
from tpu3dsad.ops.pallas.fps import furthest_point_sample
from tpu3dsad.ops.xla import (  # re-export fallbacks
    gather,
    group,
    interp_weights,
    knn,
    three_interpolate,
    three_nn,
)

__all__ = [
    "furthest_point_sample",
    "ball_query",
    "knn",
    "three_nn",
    "gather",
    "group",
    "query_and_group",
    "three_interpolate",
    "interp_weights",
]
