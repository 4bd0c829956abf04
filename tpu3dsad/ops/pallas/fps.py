"""Furthest point sampling — fused Pallas TPU kernel.

Replaces the lineage CUDA kernel (pointnet2/_ext_src/src/sampling_gpu.cu,
SURVEY.md §2.1) and the XLA fallback's M-step scan.

Layout: the whole batch lives in the kernel as [B, N] planes (B on
sublanes, N on lanes), so ONE `fori_loop` iteration advances every batch
row — the sequential chain is M iterations total, not B·M as with a
per-batch grid. The [B, N] running min-distance vector stays in VMEM across
the loop; per-row coordinate extraction and argmax use masked reductions
(no dynamic lane indexing); indices are written to a [M, B] VMEM output via
dynamic sublane stores, transposed once outside.

Semantics identical to ops.xla.fps: seed index 0, ties → lowest index,
masked points can never win.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fps_kernel(xyz_ref, valid_ref, idx_ref, dist_ref, *, npoint: int, n: int):
    """xyz_ref [3, Bp, Np] f32, valid_ref [Bp, Np] f32 (1=real),
    idx_ref out [npoint, Bp] i32, dist_ref scratch [Bp, Np] f32."""
    x = xyz_ref[0, :, :]  # [Bp, Np]
    y = xyz_ref[1, :, :]
    z = xyz_ref[2, :, :]
    valid = valid_ref[:, :] > 0.0

    bp = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)  # [Bp, Np]
    neg_inf = jnp.float32(-jnp.inf)

    dist_ref[:, :] = jnp.where(valid, jnp.float32(jnp.inf), neg_inf)
    idx_ref[0, :] = jnp.zeros((bp,), jnp.int32)

    def pick(last):
        """Per-row coords of the selected lane. last [Bp, 1] int32."""
        onehot = (lane == last).astype(jnp.float32)
        lx = jnp.sum(x * onehot, axis=1, keepdims=True)  # [Bp, 1]
        ly = jnp.sum(y * onehot, axis=1, keepdims=True)
        lz = jnp.sum(z * onehot, axis=1, keepdims=True)
        return lx, ly, lz

    def body(i, last):
        lx, ly, lz = pick(last)
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        dist = jnp.minimum(dist_ref[:, :], jnp.where(valid, d2, neg_inf))
        dist_ref[:, :] = dist
        best = jnp.max(dist, axis=1, keepdims=True)  # [Bp, 1]
        nxt = jnp.min(
            jnp.where(dist == best, lane, jnp.int32(n)), axis=1, keepdims=True
        )  # ties → lowest index
        idx_ref[pl.ds(i, 1), :] = nxt.reshape(1, bp).astype(jnp.int32)
        return nxt

    jax.lax.fori_loop(
        1, npoint, body, jnp.zeros((x.shape[0], 1), jnp.int32)
    )


@partial(jax.jit, static_argnames=("npoint",))
def _fps_call(xyz_t, valid_f, npoint: int):
    _, Bp, Np = xyz_t.shape
    kernel = partial(_fps_kernel, npoint=npoint, n=Np)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npoint, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((Bp, Np), jnp.float32)],
    )(xyz_t, valid_f)
    return out.T  # [Bp, npoint]


def furthest_point_sample(
    xyz: jnp.ndarray, npoint: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """xyz [B, N, 3] (+mask [B, N]) -> idx [B, npoint] int32."""
    B, N, _ = xyz.shape
    Np = _round_up(max(N, _LANE), _LANE)
    Bp = _round_up(B, _SUBLANE)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # [3, B, N]
    valid = (
        jnp.ones((B, N), jnp.float32)
        if mask is None
        else mask.astype(jnp.float32)
    )
    if (Np, Bp) != (N, B):
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, Bp - B), (0, Np - N)))
        valid = jnp.pad(valid, ((0, Bp - B), (0, Np - N)))
    return _fps_call(xyz_t, valid, npoint)[:B]
