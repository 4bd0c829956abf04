"""AOT-lower every Pallas kernel for the TPU platform — on the CPU host.

``jax.jit(f).trace(...).lower(lowering_platforms=('tpu',))`` runs the real
Pallas→Mosaic TPU lowering (BlockSpec tiling rules, supported dot
precisions, memory-space checks) WITHOUT a TPU device. Interpret mode
skips all of it — the r4 scatter kernel passed its full interpret-mode
suite while being unlowerable on the target in BOTH layouts (illegal
(1, ut) idx block for B>1, then Precision.HIGH, which Mosaic rejects) —
exactly the VERDICT r4 "dark kernel" risk. This gate cannot catch
Mosaic's later layout-inference/compile failures (those need hardware),
but it kills the structural class on every CPU CI run.

Each case is the kernel's production entry at a production-shaped
operand set (B>1 specifically — B=1 hides block-rule violations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _lowers_for_tpu(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-3, 3, (8, 20480, 3)).astype(np.float32))
    cen = jnp.asarray(rng.uniform(-3, 3, (8, 2048, 3)).astype(np.float32))
    mask = jnp.ones((8, 20480), bool)
    return pts, cen, mask


def test_fps_kernel_lowers(data):
    from tpu3dsad.ops.pallas.fps import furthest_point_sample

    pts, _, mask = data
    _lowers_for_tpu(lambda p, m: furthest_point_sample(p, 2048, mask=m),
                    pts, mask)


def test_fps_flat_single_cloud_lowers(data):
    from tpu3dsad.ops.pallas.fps import furthest_point_sample

    rng = np.random.default_rng(1)
    big = jnp.asarray(rng.uniform(-3, 3, (1, 131072, 3)).astype(np.float32))
    _lowers_for_tpu(lambda p: furthest_point_sample(p, 4096), big)


def test_exact_ball_query_kernel_lowers(data):
    from tpu3dsad.ops.pallas.ball_query import _ball_query_kernel

    pts, cen, _ = data
    _lowers_for_tpu(lambda x, c: _ball_query_kernel(x, c, 0.4, 64), pts, cen)


def test_sorted_fast_tier_lowers(data):
    """The r3 sorted tier incl. the AABB tile skip — never
    hardware-compiled (VERDICT r4 missing #2)."""
    from tpu3dsad.ops.pallas.ball_query import sorted_ball_query

    pts, cen, mask = data
    _lowers_for_tpu(
        lambda x, c, m: sorted_ball_query(x, c, 0.4, 64, mask=m),
        pts, cen, mask,
    )


@pytest.mark.parametrize(
    "B,U,C,n",
    [
        (2, 8192, 64, 2048),      # C-on-lanes
        (2, 8192, 3, 2048),       # N-on-lanes (xyz grads)
        (1, 300, 7, 300),         # unaligned, single batch
        (8, 131072, 6, 40960),    # SA1-scale VJP shape
        (8, 32768, 131, 2048),    # SA2-scale VJP shape
    ],
)
def test_scatter_kernel_lowers(B, U, C, n):
    """The r4 scatter kernel in both lane layouts — the kernel this test
    exists for: its original form failed here at every one of these
    shapes with B>1."""
    from tpu3dsad.ops.pallas.scatter import scatter_rows

    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.standard_normal((B, U, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (B, U)).astype(np.int32))
    _lowers_for_tpu(lambda g, i: scatter_rows(g, i, n), g, idx)
