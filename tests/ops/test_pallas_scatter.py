"""Pallas scatter-rows kernel (ops/pallas/scatter.py) — the gather/group
VJP sums with VMEM-built one-hot tiles. Parity vs the numpy oracle and the
XLA one-hot matmul across both lane layouts (wide C → C-on-lanes, narrow
C → N-on-lanes), non-aligned shapes, collisions, and out-of-range pad
indices. Interpret mode (CPU); hardware numbers live in
bench/bench_scatter_vjp.py."""

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tpu3dsad.ops.pallas.scatter import scatter_rows  # noqa: E402
from tpu3dsad.ops.xla.group import _scatter_rows  # noqa: E402


def _oracle(g, idx, n):
    B, U, C = g.shape
    out = np.zeros((B, n, C), np.float64)
    for b in range(B):
        for u in range(U):
            j = idx[b, u]
            if 0 <= j < n:
                out[b, j] += g[b, u]
    return out.astype(np.float32)


@pytest.mark.parametrize(
    "B,U,n,C",
    [
        (2, 512, 256, 131),   # SA2-like: wide C → C-on-lanes
        (2, 256, 128, 259),   # SA3-like (non-128-aligned C)
        (2, 512, 1024, 3),    # FP-like: narrow C → N-on-lanes
        (1, 100, 70, 6),      # nothing aligned, tiny
        (3, 1000, 2000, 47),  # just under the lane threshold
        (2, 2048, 512, 64),   # multiple u-tiles accumulate
    ],
)
def test_matches_oracle_and_xla(B, U, n, C):
    rng = np.random.default_rng(hash((B, U, n, C)) % 2**31)
    g = rng.standard_normal((B, U, C)).astype(np.float32)
    idx = rng.integers(0, n, (B, U)).astype(np.int32)
    # heavy collisions: half the rows hit the first 8 slots
    idx[:, ::2] = rng.integers(0, min(8, n), (B, (U + 1) // 2))

    out = np.asarray(scatter_rows(jnp.asarray(g), jnp.asarray(idx), n,
                                  interpret=True))
    ref = _oracle(g, idx, n)
    assert out.shape == (B, n, C)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    xla = np.asarray(_scatter_rows(jnp.asarray(g), jnp.asarray(idx), n))
    np.testing.assert_allclose(out, xla, rtol=1e-5, atol=1e-5)


def test_out_of_range_indices_contribute_nothing():
    """-1 and >=n indices (wrapper padding convention) are dropped."""
    g = np.ones((1, 8, 4), np.float32)
    idx = np.array([[0, -1, 3, 99999, 3, -1, 0, 2]], np.int32)
    out = np.asarray(scatter_rows(jnp.asarray(g), jnp.asarray(idx), 8,
                                  interpret=True))
    ref = _oracle(g, idx, 8)
    np.testing.assert_array_equal(out, ref)


def test_fp32_exactness_on_representable_sums():
    """One-hot is exact in bf16, so Precision.HIGH reproduces fp32 sums
    bit-exactly when the addends are integer-valued."""
    rng = np.random.default_rng(0)
    g = rng.integers(-64, 64, (2, 256, 96)).astype(np.float32)
    idx = rng.integers(0, 32, (2, 256)).astype(np.int32)
    out = np.asarray(scatter_rows(jnp.asarray(g), jnp.asarray(idx), 32,
                                  interpret=True))
    np.testing.assert_array_equal(out, _oracle(g, idx, 32))


def test_vjp_integration_through_group(monkeypatch):
    """The kernel wired as the ACTUAL group()/gather() backward: grads of a
    grouped reduction must match the default path bitwise-to-rtol. CPU runs
    interpret via force_tpu_interpret_mode; _scatter_mode is pinned to
    'pallas' directly (the env route falls back to scatter on cpu)."""
    import importlib

    from jax.experimental.pallas import tpu as pltpu

    group_mod = importlib.import_module("tpu3dsad.ops.xla.group")
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.standard_normal((2, 300, 7)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 300, (2, 32, 8)).astype(np.int32))

    def loss(p):
        g = group_mod.group(p, idx)  # [B,M,K,C]
        return jnp.sum(jnp.tanh(g) * jnp.arange(1, 8, dtype=jnp.float32))

    want = jax.grad(loss)(pts)  # default path (native scatter on cpu)

    # clear the custom_vjp cache so the pinned mode is picked up
    group_mod._make_take_rows.cache_clear()
    monkeypatch.setattr(group_mod, "_scatter_mode", lambda: "pallas")
    try:
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss)(pts)
    finally:
        group_mod._make_take_rows.cache_clear()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_scatter_mode_flip_mid_process(monkeypatch):
    """Flipping TPU3DSAD_SCATTER_VJP AFTER a first group() trace takes
    effect at the next call — the mode is part of the _make_take_rows
    cache key, not captured at trace time (ADVICE r4: the old trace-time
    capture silently ignored env changes, so a bench comparing tiers in
    one process measured one tier twice)."""
    import importlib

    group_mod = importlib.import_module("tpu3dsad.ops.xla.group")
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.standard_normal((1, 64, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 64, (1, 16)).astype(np.int32))

    def gradfn(p):
        return jax.grad(
            lambda q: jnp.sum(group_mod.gather(q, idx) ** 2)
        )(p)

    seen = []
    real = group_mod._scatter_rows

    def spy(g, i, n, mode=None):
        seen.append(mode)
        return real(g, i, n, mode=mode)

    monkeypatch.setattr(group_mod, "_scatter_rows", spy)
    monkeypatch.setenv("TPU3DSAD_SCATTER_VJP", "1")
    a = gradfn(pts)  # traces with mode='scatter'
    monkeypatch.setenv("TPU3DSAD_SCATTER_VJP", "0")
    b = gradfn(pts)  # must RE-trace with mode='matmul', no cache_clear
    assert "scatter" in seen and "matmul" in seen, seen
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_scatter_mode_dispatch(monkeypatch):
    """TPU3DSAD_SCATTER_VJP=pallas routes the VJP through the kernel on
    non-cpu backends and falls back to native scatter on CPU."""
    import importlib

    group_mod = importlib.import_module("tpu3dsad.ops.xla.group")

    monkeypatch.setenv("TPU3DSAD_SCATTER_VJP", "pallas")
    assert group_mod._scatter_mode() == "scatter"  # cpu backend here
    monkeypatch.setenv("TPU3DSAD_SCATTER_VJP", "0")
    assert group_mod._scatter_mode() == "matmul"
    monkeypatch.setenv("TPU3DSAD_SCATTER_VJP", "1")
    assert group_mod._scatter_mode() == "scatter"
    monkeypatch.delenv("TPU3DSAD_SCATTER_VJP")
    assert group_mod._scatter_mode() == "scatter"  # cpu default
