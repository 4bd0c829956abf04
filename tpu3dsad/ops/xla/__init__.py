"""Pure-XLA reference implementations of the point ops (correctness tier)."""

from tpu3dsad.ops.xla.fps import furthest_point_sample
from tpu3dsad.ops.xla.ball_query import ball_query
from tpu3dsad.ops.xla.knn import knn, three_nn
from tpu3dsad.ops.xla.group import gather, group, query_and_group
from tpu3dsad.ops.xla.interpolate import three_interpolate, interp_weights

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
