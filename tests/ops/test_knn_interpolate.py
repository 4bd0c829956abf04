"""kNN / three_nn / three_interpolate: oracle parity + gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad import ops
from tpu3dsad.ops.oracle import (
    interp_weights_oracle,
    knn_oracle,
    three_interpolate_oracle,
)

IMPLS = ["xla"]


@pytest.mark.parametrize("impl", IMPLS)
def test_knn_matches_oracle(rng, impl):
    B, M, N, k = 2, 37, 211, 3
    q = rng.standard_normal((B, M, 3)).astype(np.float32)
    s = rng.standard_normal((B, N, 3)).astype(np.float32)
    d2, idx = ops.knn(jnp.asarray(q), jnp.asarray(s), k, impl=impl)
    d2, idx = np.asarray(d2), np.asarray(idx)
    for b in range(B):
        wd2, widx = knn_oracle(q[b], s[b], k)
        np.testing.assert_array_equal(idx[b], widx)
        np.testing.assert_allclose(d2[b], wd2, atol=1e-4)


@pytest.mark.parametrize("impl", IMPLS)
def test_knn_support_mask(rng, impl):
    B, M, N, PAD = 1, 10, 50, 30
    q = rng.standard_normal((B, M, 3)).astype(np.float32)
    s = rng.standard_normal((B, N, 3)).astype(np.float32)
    _, base_idx = ops.knn(jnp.asarray(q), jnp.asarray(s), 3, impl=impl)
    # pad support with copies of the queries themselves (would all be 0-dist)
    padded = np.concatenate([s, np.repeat(q[:, :1], PAD, 1)], axis=1)
    mask = np.concatenate([np.ones((B, N), bool), np.zeros((B, PAD), bool)], 1)
    _, idx = ops.knn(
        jnp.asarray(q), jnp.asarray(padded), 3,
        support_mask=jnp.asarray(mask), impl=impl,
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(base_idx))


@pytest.mark.parametrize("impl", IMPLS)
def test_three_interpolate_matches_oracle(rng, impl):
    B, N, M, C = 2, 64, 100, 7
    feats = rng.standard_normal((B, N, C)).astype(np.float32)
    q = rng.standard_normal((B, M, 3)).astype(np.float32)
    s = rng.standard_normal((B, N, 3)).astype(np.float32)
    d2, idx = ops.three_nn(jnp.asarray(q), jnp.asarray(s), impl=impl)
    w = ops.interp_weights(d2)
    out = np.asarray(ops.three_interpolate(jnp.asarray(feats), idx, w, impl=impl))
    for b in range(B):
        wd2, widx = knn_oracle(q[b], s[b], 3)
        ww = interp_weights_oracle(wd2)
        want = three_interpolate_oracle(feats[b], widx, ww)
        np.testing.assert_allclose(out[b], want, atol=1e-4)


def test_three_interpolate_grad_is_scatter_add(rng):
    """VJP w.r.t. features must scatter each output grad to its 3 supports."""
    B, N, M, C = 1, 16, 5, 4
    feats = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, M, 3)), dtype=jnp.int32)
    w = jax.nn.softmax(jnp.asarray(rng.standard_normal((B, M, 3))), axis=-1)

    g = jax.grad(lambda f: jnp.sum(ops.three_interpolate(f, idx, w)))(feats)
    want = np.zeros((B, N, C), np.float32)
    for m in range(M):
        for k in range(3):
            want[0, int(idx[0, m, k])] += float(w[0, m, k])
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-5)


def test_knn_chunked_matches_direct(rng, monkeypatch):
    """VERDICT r1 #5: blockwise kNN (support slabs + running best-k merge)
    must equal the direct path exactly, including lower-index ties and
    masking, with a slab limit small enough to force several chunks."""
    import importlib

    knn_mod = importlib.import_module("tpu3dsad.ops.xla.knn")
    B, M, N, K = 2, 64, 700, 5
    q = rng.uniform(-2, 2, (B, M, 3)).astype(np.float32)
    s = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    s[:, 100:108] = s[:, 0:8]  # exact duplicates -> distance ties
    mask = np.ones((B, N), bool)
    mask[:, 650:] = False

    d_ref, i_ref = knn_mod.knn(
        jnp.asarray(q), jnp.asarray(s), K, support_mask=jnp.asarray(mask)
    )
    monkeypatch.setattr(knn_mod, "_SLAB_LIMIT", 2 * 64 * 128)  # ~6 chunks
    d_chk, i_chk = knn_mod.knn(
        jnp.asarray(q), jnp.asarray(s), K, support_mask=jnp.asarray(mask)
    )
    np.testing.assert_array_equal(np.asarray(i_chk), np.asarray(i_ref))
    # distances may differ by matmul-tiling ulps; indices are exact above
    np.testing.assert_allclose(np.asarray(d_chk), np.asarray(d_ref),
                               atol=1e-5)


def test_knn_chunked_oracle(rng, monkeypatch):
    import importlib

    from tpu3dsad.ops.oracle import knn_oracle

    knn_mod = importlib.import_module("tpu3dsad.ops.xla.knn")

    B, M, N, K = 1, 32, 500, 3
    q = rng.uniform(-2, 2, (B, M, 3)).astype(np.float32)
    s = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    monkeypatch.setattr(knn_mod, "_SLAB_LIMIT", 32 * 128)
    d, i = knn_mod.knn(jnp.asarray(q), jnp.asarray(s), K)
    od, oi = knn_oracle(q[0], s[0], K)
    np.testing.assert_array_equal(np.asarray(i)[0], oi)
    np.testing.assert_allclose(np.asarray(d)[0], od, rtol=1e-5, atol=1e-6)
