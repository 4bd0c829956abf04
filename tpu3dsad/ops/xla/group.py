"""Gather / group / query-and-group — pure-XLA reference implementation.

gather/group are XLA gathers (`take_along_axis`). Their VJP is the lineage's
gather_points_grad / group_points_grad scatter-add (SURVEY.md §2.1) — but
NOT via XLA's scatter op, which serializes per update row on TPU (~45ns/row;
a single SA-scale scatter cost 48ms and the backward pass was 42% of the
config-#3 train step — bench/bench_scatter_vjp.py, bench_train_decompose.py).
Instead the same sums run as a one-hot matmul on the MXU:

    grad_src[b,n,c] = sum_u [idx[b,u]==n] * g[b,u,c]

measured 2-11x the scatter at the model's VJP shapes. Summation order
differs from XLA's scatter — and from the lineage, whose CUDA bwd is an
atomicAdd with NONDETERMINISTIC order, so no bitwise anchor exists; the
matmul form is as exact as the lineage's own backward. Products use
Precision.HIGH (bf16_3x, near-fp32; measured free vs bf16) with fp32
accumulation. The matmul path engages only when the backend is NOT cpu:
on CPU native scatter is efficient and the matmul is strictly more FLOPs.
TPU3DSAD_SCATTER_VJP=1 forces scatter everywhere, =0 forces the matmul
(parity/debug).

query_and_group fuses ball-query + group + center-relative xyz (+ optional
feature concat), the "gather-and-group" of the north star (BASELINE.json:5),
mirroring pointnet2_utils.QueryAndGroup in the lineage.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp

from tpu3dsad.ops.xla.ball_query import ball_query

# one-hot tile width: bounds the materialized [B, U, nt] one-hot if XLA
# chooses not to fuse the iota-compare into the dot operand
_ONEHOT_TILE_N = 4096


def _scatter_mode() -> str:
    """'scatter' | 'matmul' | 'pallas'. The one-hot matmul is a TPU
    decision (XLA scatter serializes per row there); on CPU/GPU native
    scatter is efficient and the matmul form is strictly more FLOPs
    (O(U·N·C) vs O(U·C)) — CI on CPU measurably slows with it. 'pallas'
    (ops/pallas/scatter.py) builds the one-hot tiles in VMEM instead of
    round-tripping them through HBM (kernel_notes note (e)); it needs a
    real TPU (no interpret dispatch here — CPU falls back to scatter).
    Env override: TPU3DSAD_SCATTER_VJP=1 forces scatter everywhere,
    =0 the matmul, =pallas the kernel."""
    env = os.environ.get("TPU3DSAD_SCATTER_VJP")
    if env == "1":
        return "scatter"
    if env == "0":
        return "matmul"
    on_cpu = jax.default_backend() == "cpu"
    if env == "pallas":
        return "scatter" if on_cpu else "pallas"
    return "scatter" if on_cpu else "matmul"


def _scatter_rows(
    g: jnp.ndarray, idx: jnp.ndarray, n: int, mode: str | None = None
) -> jnp.ndarray:
    """sum_u [idx[b,u]==j] * g[b,u,c] -> [B,n,C] (the gather-VJP sums)."""
    if mode is None:
        mode = _scatter_mode()
    if mode == "scatter":
        return jnp.zeros((g.shape[0], n, g.shape[-1]), jnp.float32).at[
            jnp.arange(g.shape[0])[:, None], idx
        ].add(g.astype(jnp.float32))
    if mode == "pallas":
        from tpu3dsad.ops.pallas.scatter import scatter_rows

        return scatter_rows(g, idx, n)
    g32 = g.astype(jnp.float32)
    outs = []
    for t0 in range(0, n, _ONEHOT_TILE_N):
        cols = jnp.arange(t0, min(t0 + _ONEHOT_TILE_N, n), dtype=jnp.int32)
        oh = (idx[:, :, None] == cols[None, None, :]).astype(jnp.float32)
        outs.append(
            jnp.einsum(
                "bun,buc->bnc",
                oh,
                g32,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH,
            )
        )
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


@lru_cache(maxsize=None)
def _make_take_rows(n: int, dtype_name: str, scatter_mode: str):
    """custom_vjp'd flat gather, parameterized by the STATIC source length,
    dtype (custom_vjp residuals must be JAX types), and the scatter-VJP
    tier. The tier is part of the cache key so flipping
    TPU3DSAD_SCATTER_VJP mid-process takes effect at the next RE-TRACE —
    the mode used to be read at trace time inside the cached function,
    which silently ignored env changes after the first group()/gather()
    trace (ADVICE r4: a bench comparing tiers in one process measured
    one). Caveat: an already-jit-compiled caller (e.g. a cached train
    step) never re-runs this Python, so its executable keeps the tier it
    was traced with — a per-tier bench must build a fresh jit per tier
    (bench/bench_scatter_vjp.py sidesteps this by jitting each tier's
    kernel entry directly, never through the env dispatch)."""

    @jax.custom_vjp
    def take(points, idx):
        return jnp.take_along_axis(
            points, idx[..., None].astype(jnp.int32), axis=1
        )

    def fwd(points, idx):
        return take(points, idx), idx

    def bwd(idx, g):
        return (
            _scatter_rows(g, idx.astype(jnp.int32), n, mode=scatter_mode)
            .astype(dtype_name),
            None,
        )

    take.defvjp(fwd, bwd)
    return take


def _take_rows(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B,N,C], idx [B,U] int -> [B,U,C]."""
    return _make_take_rows(
        points.shape[1], str(points.dtype), _scatter_mode()
    )(points, idx)


def gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B,N,C], idx [B,M] -> [B,M,C]."""
    return _take_rows(points, idx)


def group(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points [B,N,C], idx [B,M,K] -> [B,M,K,C]."""
    B, M, K = idx.shape
    C = points.shape[-1]
    return _take_rows(points, idx.reshape(B, M * K)).reshape(B, M, K, C)


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
