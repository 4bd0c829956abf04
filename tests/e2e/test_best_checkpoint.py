"""Best-mAP checkpoint retention (SURVEY §5 "last-k + best-mAP"):
save_best_checkpoint only writes on improvement, keeps exactly one best
snapshot under <ckpt_dir>/best, and restores it."""

import json
import os

import jax.numpy as jnp
import numpy as np

from tpu3dsad import train_lib
from tpu3dsad.config import TrainConfig


def _state(w: float):
    tx = train_lib.make_optimizer(
        TrainConfig(lr=1e-2, lr_decay_steps=(), lr_decay_rates=()),
        steps_per_epoch=10,
    )
    params = {"w": jnp.full((2, 2), w)}
    return train_lib.TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, batch_stats={}, tx=tx
    )


def test_best_checkpoint_retention(tmp_path):
    d = str(tmp_path / "ckpt")

    assert train_lib.save_best_checkpoint(d, _state(1.0), 10, 0.30)
    rec = json.load(open(os.path.join(d, "best.json")))
    assert rec == {"metric": 0.30, "step": 10}

    # worse (or equal) metric: best snapshot untouched
    assert not train_lib.save_best_checkpoint(d, _state(99.0), 20, 0.25)
    assert not train_lib.save_best_checkpoint(d, _state(99.0), 20, 0.30)
    assert json.load(open(os.path.join(d, "best.json")))["step"] == 10

    # improvement: replaces the snapshot
    assert train_lib.save_best_checkpoint(d, _state(7.0), 30, 0.55)
    rec = json.load(open(os.path.join(d, "best.json")))
    assert rec == {"metric": 0.55, "step": 30}

    restored, step = train_lib.restore_checkpoint(
        os.path.join(d, "best"), _state(0.0), for_eval=True
    )
    assert step == 30
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)


def test_best_checkpoint_missing_dir_restore(tmp_path):
    # eval.use_best against a run that never evaluated: restore is a no-op
    restored, step = train_lib.restore_checkpoint(
        str(tmp_path / "ckpt" / "best"), _state(3.0), for_eval=True
    )
    assert step == 0
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 3.0)
