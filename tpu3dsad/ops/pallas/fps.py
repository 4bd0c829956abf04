"""Furthest point sampling — fused Pallas TPU kernel.

Replaces the lineage CUDA kernel (pointnet2/_ext_src/src/sampling_gpu.cu,
SURVEY.md §2.1) and the XLA fallback's M-step scan.

Layout: the whole batch lives in the kernel as [B, N] planes (B on
sublanes, N on lanes), so ONE `fori_loop` iteration advances every batch
row — the sequential chain is M iterations total, not B·M. The [B, N]
running min-distance vector stays in VMEM across the loop; per-row
coordinate extraction and argmax use masked reductions (no dynamic lane
indexing); indices go to a [M, B] VMEM output via dynamic sublane stores,
transposed once outside.

Validity is folded into the initial distance plane (valid→+inf, pad→-inf)
instead of a separate mask plane: `min` can never resurrect -inf, so pad
points stay unpickable for the whole loop — one less [B, N] VMEM plane,
which is what bounds the max in-kernel N (4 planes ≈ 16 MB VMEM at
N=131072). Larger clouds fall back to the XLA tier.

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
# per-grid-step planes (x, y, z inputs + dist0 + dist scratch = 5 × [8, N]
# f32) must fit the ~16MB scoped VMEM; batch is tiled by the grid
MAX_KERNEL_N = 65536


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fps_kernel(xyz_ref, dist0_ref, idx_ref, dist_ref, *, npoint: int, n: int):
    """xyz_ref [3, Bp, Np] f32, dist0_ref [Bp, Np] f32 (+inf valid/-inf pad),
    idx_ref out [npoint, Bp] i32, dist_ref scratch [Bp, Np] f32."""
    x = xyz_ref[0, :, :]  # [Bp, Np]
    y = xyz_ref[1, :, :]
    z = xyz_ref[2, :, :]

    bp = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)  # [Bp, Np]

    dist_ref[:, :] = dist0_ref[:, :]
    idx_ref[0, 0, :] = jnp.zeros((bp,), jnp.int32)

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
        dist = jnp.minimum(dist_ref[:, :], d2)  # -inf pads stay -inf
        dist_ref[:, :] = dist
        best = jnp.max(dist, axis=1, keepdims=True)  # [Bp, 1]
        nxt = jnp.min(
            jnp.where(dist == best, lane, jnp.int32(n)), axis=1, keepdims=True
        )  # ties → lowest index
        idx_ref[0, pl.ds(i, 1), :] = nxt.reshape(1, bp).astype(jnp.int32)
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((bp, 1), jnp.int32))


# Mosaic stages the WHOLE [3, Bp, Np] operand as a scoped-VMEM stack copy
# when its layout needs normalizing (operand_layout_constraints on the
# custom call), ON TOP of the per-block buffers. Past ~10MB that sum can
# exceed the 16MB scoped limit (first hit: b=32 N=40960, 15.7MB operand →
# 16.04M scoped, 44K over). Above this threshold the call is chunked per
# batch group at the JAX level so each call only stages one group's slice.
_OPERAND_STACK_LIMIT = 10 * 1024 * 1024


def _fps_call_grid(xyz_t, dist0, npoint: int, G: int):
    """One pallas_call, grid over the nG batch groups."""
    _, Bp, Np = xyz_t.shape
    nG = Bp // G
    kernel = partial(_fps_kernel, npoint=npoint, n=Np)
    out = pl.pallas_call(
        kernel,
        grid=(nG,),
        in_specs=[
            pl.BlockSpec((3, G, Np), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Np), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, npoint, G), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nG, npoint, G), jnp.int32),
        scratch_shapes=[pltpu.VMEM((G, Np), jnp.float32)],
    )(xyz_t, dist0)
    return out.transpose(0, 2, 1).reshape(Bp, npoint)


@partial(jax.jit, static_argnames=("npoint",))
def _fps_call(xyz_t, dist0, npoint: int):
    """Grid over groups of batch rows: only one group's planes are
    VMEM-resident at a time, so large B doesn't blow the scoped-vmem limit.
    The group is as large as VMEM allows — grid steps run sequentially on
    the TensorCore, so fewer groups means fewer sequential loop iterations
    (every row in a group advances together per pick)."""
    _, Bp, Np = xyz_t.shape
    G = _SUBLANE
    budget = _SUBLANE * MAX_KERNEL_N  # elems per [G, Np] plane set
    for cand in range(Bp, _SUBLANE - 1, -_SUBLANE):
        if Bp % cand == 0 and cand * Np <= budget:
            G = cand
            break
    nG = Bp // G
    if nG > 1 and 3 * Bp * Np * 4 > _OPERAND_STACK_LIMIT:
        # per-group calls: each stages only [3, G, Np] on the scoped stack.
        # Groups ran sequentially in the grid anyway, so this costs nothing
        # but the per-call slice. (nG == 1 implies the operand already fits:
        # G·Np ≤ budget bounds it to ~6.3MB.)
        outs = [
            _fps_call_grid(
                jax.lax.slice_in_dim(xyz_t, g * G, (g + 1) * G, axis=1),
                jax.lax.slice_in_dim(dist0, g * G, (g + 1) * G, axis=0),
                npoint, G,
            )
            for g in range(nG)
        ]
        return jnp.concatenate(outs, axis=0)
    return _fps_call_grid(xyz_t, dist0, npoint, G)


def _fps_kernel_flat(xyz_ref, dist0_ref, idx_ref, dist_ref, *, npoint: int):
    """Single-cloud large-N variant: the cloud is laid out as a [S, L]
    plane (point i ↔ (i // L, i % L)), so N up to ~780k fits the 4-plane
    VMEM budget. Same semantics as the batched kernel.

    xyz_ref [3, S, L], dist0_ref [S, L], idx_ref out [npoint, 8] (col 0
    used), dist_ref scratch [S, L]."""
    x = xyz_ref[0, :, :]
    y = xyz_ref[1, :, :]
    z = xyz_ref[2, :, :]
    S, L = x.shape
    n = S * L
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    gidx = row * jnp.int32(L) + col  # global point index per cell

    dist_ref[:, :] = dist0_ref[:, :]
    idx_ref[0, :] = jnp.zeros((8,), jnp.int32)

    def pick(last):
        onehot = (gidx == last).astype(jnp.float32)
        return (
            jnp.sum(x * onehot),
            jnp.sum(y * onehot),
            jnp.sum(z * onehot),
        )

    def body(i, last):
        lx, ly, lz = pick(last)
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        dist = jnp.minimum(dist_ref[:, :], d2)
        dist_ref[:, :] = dist
        best = jnp.max(dist)
        nxt = jnp.min(jnp.where(dist == best, gidx, jnp.int32(n)))
        idx_ref[pl.ds(i, 1), :] = jnp.full((1, 8), nxt, jnp.int32)
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


@partial(jax.jit, static_argnames=("npoint",))
def _fps_call_flat(xyz_t, dist0, npoint: int):
    _, S, L = xyz_t.shape
    kernel = partial(_fps_kernel_flat, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npoint, 8), jnp.int32),
        scratch_shapes=[pltpu.VMEM((S, L), jnp.float32)],
    )(xyz_t, dist0)
    return out[:, 0]  # [npoint]


# flat single-cloud layout bound: 5 [S,L] f32 planes within ~15MB VMEM
MAX_FLAT_ELEMS = 8 * 98304


def _fps_flat_single(xyz, npoint, mask):
    """B==1 large-N path: [N] → [S, L] plane."""
    _, N, _ = xyz.shape
    L = _round_up(-(-N // _SUBLANE), _LANE)
    S = _SUBLANE
    Np = S * L
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))[:, 0, :]  # [3,N]
    valid = (
        jnp.ones((N,), bool) if mask is None else mask[0].astype(bool)
    )
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, Np - N))).reshape(3, S, L)
    valid = jnp.pad(valid, (0, Np - N))
    dist0 = jnp.where(valid, jnp.inf, -jnp.inf).astype(jnp.float32)
    return _fps_call_flat(xyz_t, dist0.reshape(S, L), npoint)[None, :]


def furthest_point_sample(
    xyz: jnp.ndarray, npoint: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """xyz [B, N, 3] (+mask [B, N]) -> idx [B, npoint] int32."""
    # indices are non-differentiable (lineage treats FPS picks as constants);
    # without this, grad tracing reaches the pallas_call, which has no JVP
    xyz = jax.lax.stop_gradient(xyz)
    B, N, _ = xyz.shape
    Np = _round_up(max(N, _LANE), _LANE)
    Bp = _round_up(B, _SUBLANE)
    if Np > MAX_KERNEL_N:
        if B == 1 and _SUBLANE * _round_up(-(-N // _SUBLANE), _LANE) <= MAX_FLAT_ELEMS:
            return _fps_flat_single(xyz, npoint, mask)
        # cloud too large for resident-VMEM planes → XLA tier
        from tpu3dsad.ops.xla.fps import furthest_point_sample as _xla_fps

        return _xla_fps(xyz, npoint, mask=mask)

    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # [3, B, N]
    valid = (
        jnp.ones((B, N), bool) if mask is None else mask.astype(bool)
    )
    if (Np, Bp) != (N, B):
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, Bp - B), (0, Np - N)))
        valid = jnp.pad(valid, ((0, Bp - B), (0, Np - N)))
    dist0 = jnp.where(valid, jnp.inf, -jnp.inf).astype(jnp.float32)
    return _fps_call(xyz_t, dist0, npoint)[:B]
