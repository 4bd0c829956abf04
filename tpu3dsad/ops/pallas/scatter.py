"""Pallas scatter-rows kernel: the gather/group VJP sums with one-hot tiles
built in VMEM.

Computes ``out[b, n, c] = Σ_u [idx[b,u] == n] · g[b,u,c]`` — the
gather_points_grad / group_points_grad reduction (lineage
pointnet2/_ext_src/src/sampling_gpu.cu / group_points_gpu.cu; the snapshot
itself is /root/reference/README.md:1-2). The pure-XLA one-hot matmul
(ops/xla/group.py::_scatter_rows) bottoms out at a flat ~4.2 ms because XLA
materializes the one-hot tiles through HBM (docs/kernel_notes.md note (e));
here each [Ut, Nt] one-hot tile is an iota-compare in VMEM feeding the MXU
directly, so the only HBM traffic is g in + out once per n-tile.

Precision: the one-hot operand is EXACT in bf16 (entries are 0/1), so the
bf16_3x decomposition reproduces full-fp32 products. Mosaic's Pallas
lowering rejects ``Precision.HIGH`` (only DEFAULT/HIGHEST lower — caught
by the r5 AOT-lowering test, tests/ops/test_tpu_lowering.py; interpret
mode had accepted HIGH silently), so the split is done MANUALLY:
g = g1+g2+g3 in three exact bf16 terms (_split3_bf16) and three
``Precision.DEFAULT`` dots — same MXU pass count as HIGH, explicit
DEFAULT pinned so the fp32-parity mode's global HIGHEST override cannot
change the lowering (CLAUDE.md invariant).

Two layouts, selected by C:
- **C-on-lanes** (C ≥ _MIN_C_LANES): out tile [Nt, C]; dot is
  oh[Ut,Nt]ᵀ·g[Ut,C] contracting the u-tile. Lane padding of C to 128 is
  amortized by real channels.
- **N-on-lanes** (small C, e.g. xyz grads C=3): padding C to 128 lanes
  would multiply MXU work ~40×, so instead g rides TRANSPOSED [C, U] with
  C on sublanes (pad to 8) and the dot is gᵀ[C,Ut]·oh[Ut,Nt] → out [C, Nt].

Grid is (B, n-tiles, u-tiles) with u innermost: the out block revisits are
consecutive, so accumulation across u-tiles stays in VMEM (zeroed at u==0).
Summation order across u-tiles differs from the XLA scatter — like the
lineage's nondeterministic atomicAdd, no bitwise anchor exists; tests pin
rtol vs the numpy oracle (tests/ops/test_pallas_scatter.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_UT = 512  # u-tile (contraction) size, C-on-lanes layout
_UT_NARROW = 2048  # u-tile for N-on-lanes: the per-step dot is tiny there
#                    (C≤8 sublanes), so grid overhead dominates unless the
#                    u-tile is large; oh [2048, 512] fp32 = 4MB VMEM
_NT = 512  # n-tile size
_MIN_C_LANES = 48  # below this, lane-padding C wastes the MXU → N-on-lanes


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _onehot_t(idx_ref, nt: int, ut: int):
    """Transposed one-hot tile ohT[nn, uu] = (idx[uu] == n0 + nn), [nt, ut].

    idx arrives as a LANE vector ([1, 1, ut] block → [ut] on lanes) and is
    broadcast across sublanes — building the one-hot transposed avoids the
    lane→sublane relayout of ``idx[:, None]`` entirely (and the [B, 1, U]
    idx layout satisfies the Mosaic block rule: the block's last-two dims
    (1, ut) match the array's second-to-last dim 1 / are 128-divisible —
    the original 2D (1, ut) block on [B, U] failed TPU lowering for B > 1,
    caught by the r5 AOT-lowering test)."""
    n0 = pl.program_id(1) * nt
    idx = idx_ref[0, 0]  # [ut] int32 on lanes
    rows = jax.lax.broadcasted_iota(jnp.int32, (nt, ut), 0) + n0
    return (idx[None, :] == rows).astype(jnp.float32)


def _split3_bf16(g):
    """g fp32 → (g1, g2, g3) bf16 with g1+g2+g3 == g EXACTLY.

    Each residual subtraction is exact in fp32 (the rounded term cancels
    the leading mantissa bits, leaving ≤16 significant bits), and the
    final residual has ≤8 significant bits, so three 8-bit bf16 mantissas
    capture all 24 fp32 mantissa bits — the same decomposition the
    bf16_3x (Precision.HIGH) hardware pass uses. Needed manually because
    Mosaic's Pallas lowering supports only DEFAULT/HIGHEST dot precision
    (caught by the r5 AOT-lowering test; interpret mode accepted HIGH)."""
    g1 = g.astype(jnp.bfloat16)
    r = g - g1.astype(jnp.float32)
    g2 = r.astype(jnp.bfloat16)
    g3 = (r - g2.astype(jnp.float32)).astype(jnp.bfloat16)
    return g1, g2, g3


def _kernel_c_lanes(idx_ref, g_ref, out_ref, *, nt: int, ut: int):
    u = pl.program_id(2)

    @pl.when(u == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # bf16 one-hot is exact (entries 0/1); DEFAULT pinned explicitly so
    # the fp32-parity mode's global HIGHEST cannot change the lowering
    # (CLAUDE.md invariant)
    oht = _onehot_t(idx_ref, nt, ut).astype(jnp.bfloat16)  # [nt, ut]
    acc = jnp.zeros_like(out_ref[0])
    for gk in _split3_bf16(g_ref[0]):
        acc += jax.lax.dot_general(
            oht,
            gk,
            (((1,), (0,)), ((), ())),  # contract the u-tile → [nt, C]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    out_ref[0] += acc


def _kernel_n_lanes(idx_ref, gt_ref, out_ref, *, nt: int, ut: int):
    u = pl.program_id(2)

    @pl.when(u == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    oht = _onehot_t(idx_ref, nt, ut).astype(jnp.bfloat16)  # [nt, ut]
    acc = jnp.zeros_like(out_ref[0])
    for gk in _split3_bf16(gt_ref[0]):
        acc += jax.lax.dot_general(
            gk,
            oht,
            (((1,), (1,)), ((), ())),  # contract the u-tile → [C, nt]
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    out_ref[0] += acc


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def scatter_rows(g: jnp.ndarray, idx: jnp.ndarray, n: int,
                 interpret: bool = False) -> jnp.ndarray:
    """g [B,U,C] float, idx [B,U] int32 (values in [0,n)) → [B,n,C] fp32.

    Pad u-slots must carry a valid index (the ball-query pad-with-first-hit
    convention) or -1 / >=n, which contribute nothing.
    """
    B, U, C = g.shape
    g = g.astype(jnp.float32)
    idx = idx.astype(jnp.int32)

    # ut rides the LANE dim of the idx block (1, ut) and of the transposed
    # g block (1, c_pad, ut) in the N-lanes layout — keep it 128-aligned
    # (interpret mode would not catch a Mosaic lane-alignment failure)
    ut_cap = _UT if C >= _MIN_C_LANES else _UT_NARROW
    ut = min(ut_cap, _round_up(U, 128))
    nt = min(_NT, _round_up(n, 128))
    u_pad = _round_up(U, ut)
    n_pad = _round_up(n, nt)
    if u_pad != U:
        # -1 never matches a col ⇒ padded slots add nothing
        idx = jnp.pad(idx, ((0, 0), (0, u_pad - U)), constant_values=-1)
        g = jnp.pad(g, ((0, 0), (0, u_pad - U), (0, 0)))
    # [B, 1, U]: the unit sublane dim makes the (1, 1, ut) block legal
    # under the Mosaic last-two-dims rule for any B (see _onehot_t)
    idx = idx[:, None, :]

    grid = (B, n_pad // nt, u_pad // ut)

    if C >= _MIN_C_LANES:
        c_pad = _round_up(C, 128)
        if c_pad != C:
            g = jnp.pad(g, ((0, 0), (0, 0), (0, c_pad - C)))
        out = pl.pallas_call(
            functools.partial(_kernel_c_lanes, nt=nt, ut=ut),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, ut), lambda b, i, u: (b, 0, u),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ut, c_pad), lambda b, i, u: (b, u, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nt, c_pad), lambda b, i, u: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_pad, c_pad), jnp.float32),
            interpret=interpret,
        )(idx, g)
        return out[:, :n, :C]

    # small C: g transposed so N rides the lanes
    c_pad = _round_up(C, 8)
    gt = jnp.swapaxes(g, 1, 2)  # [B, C, U]
    if c_pad != C:
        gt = jnp.pad(gt, ((0, 0), (0, c_pad - C), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_n_lanes, nt=nt, ut=ut),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, ut), lambda b, i, u: (b, 0, u),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad, ut), lambda b, i, u: (b, 0, u),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_pad, nt), lambda b, i, u: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, c_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(idx, gt)
    return jnp.swapaxes(out[:, :C, :n], 1, 2)
