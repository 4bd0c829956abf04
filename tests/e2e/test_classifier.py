"""End-to-end slice (benchmark config #1): classifier trains, overfits,
checkpoints, restores (SURVEY.md §4.5/4.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad.config import TrainConfig
from tpu3dsad.data.synthetic import classification_batch
from tpu3dsad.models.classifier import PointNet2Classifier
from tpu3dsad import train_lib


def _setup(num_classes=6, n=256, batch=16, seed=0):
    rng = np.random.default_rng(seed)
    batch_np = classification_batch(rng, batch, n, num_classes)
    batch_j = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = PointNet2Classifier(
        num_classes=num_classes, dropout=0.0,
        sa1_npoint=min(512, n // 2), sa2_npoint=min(128, n // 8),
    )
    tx = train_lib.make_optimizer(TrainConfig(lr=1e-3), steps_per_epoch=100)
    state = train_lib.create_state(
        model,
        lambda k: model.init(k, batch_j["points"], mask=batch_j["mask"], train=False),
        tx,
        jax.random.key(0),
    )
    return model, state, batch_j


@pytest.mark.slow
def test_classifier_overfits_fixed_batch():
    model, state, batch = _setup(n=128, batch=8)
    rng = jax.random.key(1)
    first_loss = None
    for step in range(150):
        rng, sub = jax.random.split(rng)
        state, metrics = train_lib.classifier_train_step(
            model, state, batch, sub, 0.9
        )
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final = train_lib.classifier_eval_step(model, state, batch)
    assert float(final["loss"]) < first_loss
    assert float(final["acc"]) > 0.9, f"acc={float(final['acc'])}"


def test_checkpoint_roundtrip(tmp_path):
    model, state, batch = _setup(n=64, batch=4)
    state, _ = train_lib.classifier_train_step(
        model, state, batch, jax.random.key(2), 0.9
    )
    m1 = train_lib.classifier_eval_step(model, state, batch)
    train_lib.save_checkpoint(str(tmp_path / "ckpt"), state, step=1)

    model2, fresh, _ = _setup(n=64, batch=4, seed=3)
    restored, step = train_lib.restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    assert step == 1
    m2 = train_lib.classifier_eval_step(model2, restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)

    # empty dir -> no-op restore
    _, step0 = train_lib.restore_checkpoint(str(tmp_path / "nope"), fresh)
    assert step0 == 0


def test_msg_classifier_trains(rng):
    """model.classifier_msg=true builds the lineage pointnet2_cls_msg
    architecture (3 radii per SA level, concat-pooled) and trains."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu3dsad import train_lib
    from tpu3dsad.config import parse_cli
    from tpu3dsad.data.synthetic import classification_batch
    from tpu3dsad.models.classifier import build_classifier

    cfg = parse_cli(["model.name=classifier", "model.classifier_msg=true",
                     "data.num_points=256", "model.num_classes=4",
                     "train.batch_size=8"])
    model = build_classifier(cfg, 4)
    assert model.msg
    b = classification_batch(np.random.default_rng(0), 8, 256, 4)
    bj = {k: jnp.asarray(v) for k, v in b.items()}
    v = jax.jit(lambda k: model.init(
        k, bj["points"], mask=bj["mask"], train=False))(jax.random.key(0))
    # MSG: sa1 carries three parallel shared-MLP towers
    assert {"mlp_0", "mlp_1", "mlp_2"} <= set(v["params"]["sa1"])
    tx = train_lib.make_optimizer(cfg.train, 10)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=v["params"],
        batch_stats=v["batch_stats"], tx=tx,
    )
    l0 = None
    for i in range(6):
        state, m = train_lib.classifier_train_step(
            model, state, bj, jax.random.key(i), 0.9
        )
        if l0 is None:
            l0 = float(m["loss"])
    assert float(m["loss"]) < l0  # overfits the fixed batch
