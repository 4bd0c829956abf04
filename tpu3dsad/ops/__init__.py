"""Public point-op API with implementation dispatch.

Every hot op exists in two tiers behind this one API (SURVEY.md §7 design
invariants): impl='xla' (pure-XLA reference, always available) and
impl='pallas' (fused TPU kernels). Tests pin the tiers equal. This package
replaces the lineage's C++ binding/dispatch layer (bindings.cpp — SURVEY.md
§2.1): shape/dtype validation lives here, kernels are Python-defined.

Default impl is process-global, set via `set_default_impl` or the
TPU3DSAD_OPS_IMPL env var.
"""

from __future__ import annotations

import os

from tpu3dsad.ops import xla as _xla
from tpu3dsad.ops.masked import masked_max, masked_mean
from tpu3dsad.ops.xla.interpolate import interp_weights

_DEFAULT_IMPL = os.environ.get("TPU3DSAD_OPS_IMPL", "xla")
_VALID_IMPLS = ("xla", "pallas")
_EXACT_GROUPING = os.environ.get("TPU3DSAD_EXACT_GROUPING", "1") == "1"
_FAST_MODE = os.environ.get("TPU3DSAD_FAST_MODE", "approx")
_VALID_FAST_MODES = ("approx", "sorted")


def set_fast_mode(mode: str) -> None:
    """Which fast-grouping selector the pallas tier uses (xla tier always
    uses approx): 'approx' = single-pass lax.approx_max_k (~99.9%% member
    recall); 'sorted' = the exact kernel on Z-order-sorted views (EXACT
    membership and counts; selection order is spatial, not index order —
    see ops.pallas.ball_query.sorted_ball_query)."""
    global _FAST_MODE
    if mode not in _VALID_FAST_MODES:
        raise ValueError(
            f"fast mode must be one of {_VALID_FAST_MODES}, got {mode!r}")
    _FAST_MODE = mode


def get_fast_mode() -> str:
    return _FAST_MODE


def set_fast_grouping(fast: bool) -> None:
    """Fast mode selects ~first-K in-ball members with single-pass
    lax.approx_max_k (>10× faster than exact top_k at ScanNet scale,
    ~99.9%% member recall) and computes pairwise distances with the TPU's
    native bf16 matmul. Only WHICH in-ball points fill the K slots can
    differ, plus ~1%%-of-r boundary rounding — both invisible to the
    max-pooled group features."""
    global _EXACT_GROUPING
    _EXACT_GROUPING = not fast


def get_fast_grouping() -> bool:
    return not _EXACT_GROUPING


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in _VALID_IMPLS:
        raise ValueError(f"impl must be one of {_VALID_IMPLS}, got {impl!r}")
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


def _backend(impl: str | None):
    impl = impl or _DEFAULT_IMPL
    if impl == "xla":
        return _xla
    if impl == "pallas":
        from tpu3dsad.ops import pallas as _pallas  # lazy: traces on first jit

        return _pallas
    raise ValueError(f"impl must be one of {_VALID_IMPLS}, got {impl!r}")


def _check_points(x, name, last=3):
    if x.ndim != 3 or x.shape[-1] != last:
        raise ValueError(f"{name} must be [B, N, {last}], got {x.shape}")


def furthest_point_sample(xyz, npoint, *, mask=None, impl=None):
    """xyz [B,N,3] -> idx [B,npoint] int32. Seed index 0; mask-aware."""
    _check_points(xyz, "xyz")
    if not 0 < npoint <= xyz.shape[1]:
        raise ValueError(f"npoint={npoint} out of range for N={xyz.shape[1]}")
    return _backend(impl).furthest_point_sample(xyz, npoint, mask=mask)


def ball_query(xyz, centers, radius, nsample, *, mask=None, impl=None,
               exact=None):
    """-> (idx [B,M,K] int32, cnt [B,M] int32); pad-with-first-hit semantics."""
    _check_points(xyz, "xyz")
    _check_points(centers, "centers")
    exact = _EXACT_GROUPING if exact is None else exact
    return _backend(impl).ball_query(
        xyz, centers, radius, nsample, mask=mask, exact=exact
    )


def knn(query, support, k, *, support_mask=None, impl=None):
    """-> (d2 [B,M,k], idx [B,M,k] int32), ties to lower index."""
    return _backend(impl).knn(query, support, k, support_mask=support_mask)


def three_nn(query, support, *, support_mask=None, impl=None):
    return _backend(impl).three_nn(query, support, support_mask=support_mask)


def gather(points, idx, *, impl=None):
    """points [B,N,C], idx [B,M] -> [B,M,C] (VJP = scatter-add)."""
    return _backend(impl).gather(points, idx)


def group(points, idx, *, impl=None):
    """points [B,N,C], idx [B,M,K] -> [B,M,K,C] (VJP = scatter-add)."""
    return _backend(impl).group(points, idx)


def query_and_group(
    xyz,
    centers,
    radius,
    nsample,
    *,
    features=None,
    mask=None,
    use_xyz=True,
    normalize_xyz=False,
    impl=None,
    exact=None,
):
    """Fused ball-query + gather-and-group; see ops.xla.group.query_and_group."""
    exact = _EXACT_GROUPING if exact is None else exact
    return _backend(impl).query_and_group(
        xyz,
        centers,
        radius,
        nsample,
        features=features,
        mask=mask,
        use_xyz=use_xyz,
        normalize_xyz=normalize_xyz,
        exact=exact,
    )


def three_interpolate(feats, idx, weight, *, impl=None):
    """feats [B,N,C], idx/weight [B,M,3] -> [B,M,C]."""
    return _backend(impl).three_interpolate(feats, idx, weight)


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
    "masked_max",
    "masked_mean",
    "set_default_impl",
    "get_default_impl",
    "set_fast_grouping",
    "get_fast_grouping",
    "set_fast_mode",
    "get_fast_mode",
]
