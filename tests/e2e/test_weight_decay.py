"""Weight decay must SHRINK weights (AdamW semantics).

Regression for VERDICT r1 weak #1 / ADVICE r1 medium: optax.chain(adam,
add_decayed_weights) applied decay after Adam's -lr scaling, so wd>0 GREW
weights. make_optimizer now uses optax.adamw.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu3dsad import train_lib
from tpu3dsad.config import TrainConfig


def _step(wd: float, grads_zero: bool):
    cfg = TrainConfig(lr=1e-2, weight_decay=wd, lr_decay_steps=(),
                      lr_decay_rates=())
    tx = train_lib.make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((4, 4)) * 2.0}
    opt_state = tx.init(params)
    grads = (
        jax.tree.map(jnp.zeros_like, params)
        if grads_zero
        else {"w": jnp.ones((4, 4)) * 0.1}
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates)


def test_wd_shrinks_zero_grad_param():
    p = _step(wd=0.1, grads_zero=True)
    # zero gradient + wd>0 -> pure decay: |w| strictly below its start value
    assert float(jnp.max(jnp.abs(p["w"]))) < 2.0


def test_wd_zero_leaves_zero_grad_param():
    p = _step(wd=0.0, grads_zero=True)
    np.testing.assert_allclose(np.asarray(p["w"]), 2.0)


def test_wd_reduces_param_norm_vs_no_wd():
    p_wd = _step(wd=0.1, grads_zero=False)
    p_no = _step(wd=0.0, grads_zero=False)
    n_wd = float(optax.global_norm(p_wd))
    n_no = float(optax.global_norm(p_no))
    assert n_wd < n_no


def test_wd_decay_is_lr_scaled():
    # AdamW: update includes -lr * wd * w -> expected decay 1e-2*0.1*2 = 2e-3
    p = _step(wd=0.1, grads_zero=True)
    np.testing.assert_allclose(np.asarray(p["w"]), 2.0 - 1e-2 * 0.1 * 2.0,
                               rtol=1e-5)


def test_bn_momentum_schedule_reaches_lineage_floor():
    """Lineage BNMomentumScheduler: torch momentum 0.5 halved every 20
    epochs, floored at BN_MOMENTUM_MAX=0.001 (flax weight cap 0.999 —
    regression: a 0.99 default silently stopped the decay at 0.01)."""
    cfg = TrainConfig()
    assert float(train_lib.bn_momentum_at(cfg, 0)) == 0.5
    assert abs(float(train_lib.bn_momentum_at(cfg, 40)) - 0.875) < 1e-6
    # deep into training the flax weight reaches 1 - 0.001
    assert abs(float(train_lib.bn_momentum_at(cfg, 200)) - 0.999) < 1e-6
