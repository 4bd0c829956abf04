"""MaskedBatchNorm vs flax BatchNorm parity + mask behavior."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad.nn import MaskedBatchNorm


def test_matches_flax_batchnorm_unmasked(rng):
    x = jnp.asarray(rng.standard_normal((4, 7, 5)).astype(np.float32))
    ours = MaskedBatchNorm(epsilon=1e-5)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)

    ov = ours.init(jax.random.key(0), x, train=True)
    rv = ref.init(jax.random.key(0), x)
    oy, om = ours.apply(ov, x, train=True, momentum=0.9, mutable=["batch_stats"])
    ry, rm = ref.apply(rv, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(oy), np.asarray(ry), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(om["batch_stats"]["mean"]),
        np.asarray(rm["batch_stats"]["mean"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(om["batch_stats"]["var"]),
        np.asarray(rm["batch_stats"]["var"]),
        atol=1e-5,
    )


def test_mask_excludes_padded_rows(rng):
    real = rng.standard_normal((2, 6, 3)).astype(np.float32)
    pad = 100.0 * np.ones((2, 4, 3), np.float32)
    x = jnp.asarray(np.concatenate([real, pad], axis=1))
    mask = jnp.asarray(
        np.concatenate([np.ones((2, 6), bool), np.zeros((2, 4), bool)], 1)
    )
    m = MaskedBatchNorm()
    v = m.init(jax.random.key(0), x, train=True, mask=mask)
    y, upd = m.apply(
        v, x, train=True, momentum=0.0, mask=mask, mutable=["batch_stats"]
    )
    # running stats should equal the stats of the REAL rows only
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["mean"]),
        real.reshape(-1, 3).mean(0),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["var"]),
        real.reshape(-1, 3).var(0),
        rtol=1e-4,
    )


def test_momentum_is_dynamic(rng):
    """Same compiled fn must accept different momenta (no retrace needed)."""
    x = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
    m = MaskedBatchNorm()
    v = m.init(jax.random.key(0), x, train=True)

    @jax.jit
    def step(v, x, mom):
        return m.apply(v, x, train=True, momentum=mom, mutable=["batch_stats"])

    _, u1 = step(v, x, 0.0)
    _, u2 = step(v, x, 1.0)
    np.testing.assert_allclose(
        np.asarray(u1["batch_stats"]["mean"]), np.asarray(x.mean(0)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(u2["batch_stats"]["mean"]), 0.0, atol=1e-6
    )
