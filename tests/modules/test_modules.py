"""SA/FP/backbone/classifier module tests: shapes, masking invariance, grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad.config import ModelConfig
from tpu3dsad.models.backbone import PointNet2Backbone
from tpu3dsad.models.classifier import PointNet2Classifier
from tpu3dsad.nn import FeaturePropagation, SetAbstraction


def _pad_cloud(rng, B, N, PAD):
    xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    garbage = 50.0 + rng.uniform(-1, 1, (B, PAD, 3)).astype(np.float32)
    padded = np.concatenate([xyz, garbage], 1)
    mask = np.concatenate([np.ones((B, N), bool), np.zeros((B, PAD), bool)], 1)
    return xyz, padded, mask


def test_set_abstraction_shapes_and_mask_invariance(rng):
    B, N, PAD, C = 2, 256, 128, 6
    xyz, padded, mask = _pad_cloud(rng, B, N, PAD)
    feats = rng.standard_normal((B, N, C)).astype(np.float32)
    feats_padded = np.concatenate(
        [feats, rng.standard_normal((B, PAD, C)).astype(np.float32)], 1
    )
    sa = SetAbstraction(
        npoint=64, radii=(0.3, 0.6), nsamples=(8, 16),
        mlps=((16, 32), (16, 32)),
    )
    vars_ = jax.jit(lambda k, x, f: sa.init(k, x, f, train=False))(
        jax.random.key(0), jnp.asarray(xyz), jnp.asarray(feats)
    )
    apply_nomask = jax.jit(lambda v, x, f: sa.apply(v, x, f, train=False))
    apply_mask = jax.jit(
        lambda v, x, f, m: sa.apply(v, x, f, mask=m, train=False)
    )
    nx, nf, inds, nm = apply_nomask(vars_, jnp.asarray(xyz), jnp.asarray(feats))
    assert nx.shape == (B, 64, 3) and nf.shape == (B, 64, 64)  # 32+32 MSG concat
    px, pf, pinds, pm = apply_mask(
        vars_, jnp.asarray(padded), jnp.asarray(feats_padded), jnp.asarray(mask)
    )
    np.testing.assert_array_equal(np.asarray(pinds), np.asarray(inds))
    np.testing.assert_allclose(np.asarray(pf), np.asarray(nf), atol=1e-5)
    assert np.asarray(pm).all()


def test_feature_propagation_shapes(rng):
    B, N, S, C, D = 2, 128, 32, 8, 16
    dx = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    df = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-1, 1, (B, S, 3)).astype(np.float32))
    sf = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32))
    fp = FeaturePropagation(mlp=(32, 24))
    vars_ = jax.jit(lambda k: fp.init(k, dx, df, sx, sf, train=False))(
        jax.random.key(0)
    )
    out = jax.jit(lambda v: fp.apply(v, dx, df, sx, sf, train=False))(vars_)
    assert out.shape == (B, N, 24)
    assert bool(jnp.isfinite(out).all())


def test_classifier_forward_and_train_grads(rng):
    B, N = 2, 512
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    model = PointNet2Classifier(num_classes=10)
    vars_ = jax.jit(lambda k: model.init(k, xyz, train=False))(jax.random.key(0))
    logits = jax.jit(lambda v: model.apply(v, xyz, train=False))(vars_)
    assert logits.shape == (B, 10)

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            xyz,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return jnp.mean(out**2)

    grads = jax.jit(jax.grad(loss_fn))(vars_["params"])
    flat = jax.tree.leaves(jax.tree.map(lambda g: jnp.abs(g).sum(), grads))
    assert all(bool(jnp.isfinite(v)) for v in flat)
    assert sum(float(v) for v in flat) > 0


@pytest.mark.slow
def test_backbone_shapes_small():
    cfg = ModelConfig(
        sa_npoints=(256, 128, 64, 32),
        sa_radii=(0.2, 0.4, 0.8, 1.2),
        sa_nsamples=(16, 16, 8, 8),
        sa_channels=((16, 32), (32, 64), (32, 64), (32, 64)),
        fp_channels=((64, 64), (64, 64)),
    )
    rng = np.random.default_rng(0)
    B, N = 2, 1024
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, 1)).astype(np.float32))
    bb = PointNet2Backbone(cfg)
    vars_ = jax.jit(lambda k: bb.init(k, xyz, feats, train=False))(
        jax.random.key(0)
    )
    out = jax.jit(lambda v: bb.apply(v, xyz, feats, train=False))(vars_)
    assert out["seed_xyz"].shape == (B, 128, 3)
    assert out["seed_features"].shape == (B, 128, 64)
    assert out["seed_inds"].shape == (B, 128)
    assert int(out["seed_inds"].max()) < N
