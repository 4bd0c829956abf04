"""Gather / group / query-and-group — pure-XLA reference implementation.

gather/group are XLA gathers (`take_along_axis`); their VJPs are XLA
scatter-adds, which is exactly the lineage's gather_points_grad /
group_points_grad CUDA semantics (SURVEY.md §2.1) for free.

query_and_group fuses ball-query + group + center-relative xyz (+ optional
feature concat), the "gather-and-group" of the north star (BASELINE.json:5),
mirroring pointnet2_utils.QueryAndGroup in the lineage.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu3dsad.ops.xla.ball_query import ball_query


def gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B,N,C], idx [B,M] -> [B,M,C]."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B,N,C], idx [B,M,K] -> [B,M,K,C]."""
    B, M, K = idx.shape
    C = points.shape[-1]
    flat = jnp.take_along_axis(
        points, idx.reshape(B, M * K, 1).astype(jnp.int32), axis=1
    )
    return flat.reshape(B, M, K, C)


def group_epilogue(gathered, centers, cnt, radius, nsample, *,
                   has_features: bool, use_xyz: bool = True,
                   normalize_xyz: bool = False):
    """Shared tail of every query-and-group tier (xla / pallas / sharded):
    center-relative (optionally radius-normalized) xyz, slot<cnt mask,
    use_xyz feature concat. One definition so the three tiers cannot
    drift from the bitwise-equality contract their tests pin.

    gathered [B,M,K,3+C] (xyz first), centers [B,M,3], cnt [B,M].
    Returns (grouped, group_mask)."""
    grouped_xyz = gathered[..., :3] - centers[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    slot = jnp.arange(nsample, dtype=jnp.int32)[None, None, :]
    group_mask = slot < cnt[:, :, None]
    if not has_features:
        grouped = grouped_xyz
    elif use_xyz:
        grouped = jnp.concatenate([grouped_xyz, gathered[..., 3:]], axis=-1)
    else:
        grouped = gathered[..., 3:]
    return grouped, group_mask


def query_and_group(
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
    features: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    exact: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ball-query then gather-and-group around each center.

    xyz [B,N,3], centers [B,M,3], features [B,N,C] optional.
    Returns (grouped [B,M,K,3+C or C or 3], idx [B,M,K], group_mask [B,M,K]).

    grouped xyz is center-relative; `normalize_xyz` divides by the radius
    (PointnetSAModuleVotes behavior in the lineage). group_mask marks slots
    holding a real (non-pad-duplicate... pad slots repeat the first hit, so
    the mask marks slots < cnt; empty balls are all-False).
    """
    idx, cnt = ball_query(xyz, centers, radius, nsample, mask=mask, exact=exact)

    # ONE gather for xyz+features: TPU gathers are per-row latency-bound
    # (measured: C=3 and C=64 cost ~the same), so concatenating per-point
    # first halves the grouping cost vs two separate gathers.
    src = xyz if features is None else jnp.concatenate([xyz, features], -1)
    gathered = group(src, idx)  # [B, M, K, 3 + C]

    grouped, group_mask = group_epilogue(
        gathered, centers, cnt, radius, nsample,
        has_features=features is not None, use_xyz=use_xyz,
        normalize_xyz=normalize_xyz,
    )
    return grouped, idx, group_mask
