"""vote_factor > 1: shapes, loss finiteness, grads (lineage supports
multi-vote per seed; our VotingModule emits S*F votes)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad.config import Config, ModelConfig, TrainConfig
from tpu3dsad import train_lib
from tpu3dsad.data.synthetic import detection_batch
from tpu3dsad.models.detector import SizeAdaptiveDetector


def test_detector_with_vote_factor_2(rng):
    cfg = Config(
        model=ModelConfig(
            num_classes=4,
            vote_factor=2,
            sa_npoints=(64, 32, 16, 8),
            sa_nsamples=(8, 8, 4, 4),
            sa_channels=((16, 16), (16, 32), (16, 32), (16, 32)),
            fp_channels=((32, 32), (32, 32)),
            seed_feat_dim=32,
            num_proposals=16,
            cluster_nsample=4,
        ),
        train=TrainConfig(batch_size=2),
    )
    b = detection_batch(rng, 2, 256, 4, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    model = SizeAdaptiveDetector(cfg.model)
    v = jax.jit(
        lambda k: model.init(k, batch["points"], mask=batch["point_mask"], train=False)
    )(jax.random.key(0))
    ep = jax.jit(
        lambda v: model.apply(v, batch["points"], mask=batch["point_mask"], train=False)
    )(v)
    S = cfg.model.sa_npoints[1]
    assert ep["vote_xyz"].shape == (2, S * 2, 3)
    assert ep["vote_mask"].shape == (2, S * 2)

    tx = train_lib.make_optimizer(cfg.train, 10)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=v["params"],
        batch_stats=v["batch_stats"], tx=tx,
    )
    train_step, _ = train_lib.make_detector_steps(model, cfg)
    state, metrics = train_step(state, batch, jax.random.key(1), 0.9)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["vote_loss"]))
