"""Furthest point sampling — fused Pallas TPU kernel.

Replaces the lineage CUDA kernel (pointnet2/_ext_src/src/sampling_gpu.cu,
SURVEY.md §2.1) and the XLA fallback's M-step scan. One grid program per
batch row; the [N] running min-distance vector lives in VMEM across the
whole `fori_loop`, coordinates are kept as [3, N] so the VPU works on full
128-lane tiles, and the selected index is extracted without dynamic lane
indexing (masked reductions + scalar SMEM stores).

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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fps_kernel(xyz_ref, valid_ref, idx_ref, dist_ref, *, npoint: int, n: int):
    """xyz_ref [1,3,Np] f32, valid_ref [1,1,Np] f32 (1=real),
    idx_ref [1,1,npoint] i32 (SMEM), dist_ref scratch [1,Np] f32."""
    x = xyz_ref[0, 0:1, :]  # [1, Np]
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    valid = valid_ref[0, 0:1, :] > 0.0  # [1, Np]

    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)  # [1, Np]
    neg_inf = jnp.float32(-jnp.inf)

    dist_ref[:, :] = jnp.where(valid, jnp.float32(jnp.inf), neg_inf)
    idx_ref[0, 0, 0] = jnp.int32(0)

    def pick_coords(sel):
        onehot = (lane == sel).astype(jnp.float32)
        return (
            jnp.sum(x * onehot),
            jnp.sum(y * onehot),
            jnp.sum(z * onehot),
        )

    def body(i, last):
        lx, ly, lz = pick_coords(last)
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        dist = jnp.minimum(dist_ref[:, :], jnp.where(valid, d2, neg_inf))
        dist_ref[:, :] = dist
        # argmax with ties → lowest index, without dynamic lane gathers:
        best = jnp.max(dist)
        nxt = jnp.min(jnp.where(dist == best, lane, jnp.int32(n)))
        idx_ref[0, 0, i] = nxt
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


@partial(jax.jit, static_argnames=("npoint",))
def _fps_call(xyz_t, valid_f, npoint: int):
    B, _, Np = xyz_t.shape
    kernel = partial(_fps_kernel, npoint=npoint, n=Np)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, Np), jnp.float32)],
    )(xyz_t, valid_f)[:, 0, :]


def furthest_point_sample(
    xyz: jnp.ndarray, npoint: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """xyz [B, N, 3] (+mask [B, N]) -> idx [B, npoint] int32."""
    B, N, _ = xyz.shape
    Np = _round_up(max(N, _LANE), _LANE)
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # [B, 3, N]
    valid = (
        jnp.ones((B, N), jnp.float32)
        if mask is None
        else mask.astype(jnp.float32)
    )
    if Np != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, Np - N)))
        valid = jnp.pad(valid, ((0, 0), (0, Np - N)))
    return _fps_call(xyz_t, valid[:, None, :], npoint)
