"""Distributed eval (VERDICT r1 #6): the val sweep sharded over the
8-virtual-device mesh must produce the SAME mAP as the single-device sweep
— decode+NMS run SPMD, detections gather on fetch, host AP is unchanged."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad import train_lib
from tpu3dsad.config import Config, DataConfig, ModelConfig, TrainConfig
from tpu3dsad.data.registry import SyntheticDetectionDataset
from tpu3dsad.eval.parse import parse_predictions
from tpu3dsad.models.detector import SizeAdaptiveDetector
from tpu3dsad.parallel import make_mesh
from tpu3dsad.train_detector import evaluate


def test_dp_eval_matches_single_device():
    cfg = Config(
        model=ModelConfig(
            num_classes=4,
            sa_npoints=(64, 32, 16, 8),
            sa_nsamples=(8, 8, 4, 4),
            sa_channels=((16, 16), (16, 32), (16, 32), (16, 32)),
            fp_channels=((32, 32), (32, 32)),
            seed_feat_dim=32,
            num_proposals=16,
            cluster_nsample=4,
        ),
        data=DataConfig(name="synthetic", num_points=256, max_boxes=8),
        train=TrainConfig(batch_size=8),
    )
    dataset = SyntheticDetectionDataset(cfg)
    rng = np.random.default_rng(0)
    b = dataset.train_batch(rng, 8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    model = SizeAdaptiveDetector(cfg.model, mean_sizes=tuple(
        map(tuple, dataset.mean_sizes)
    ))
    tx = train_lib.make_optimizer(cfg.train, 10)
    state = train_lib.create_state(
        model,
        lambda k: model.init(
            k, batch["points"], mask=batch["point_mask"], train=False
        ),
        tx,
        jax.random.key(0),
    )
    _, eval_step = train_lib.make_detector_steps(model, cfg)
    parse = jax.jit(
        lambda ep: parse_predictions(
            ep, model._mean_sizes(), cfg.model.num_heading_bins, cfg.eval
        )
    )

    single = evaluate(cfg, model, state, dataset, eval_step, parse,
                      num_batches=2)
    mesh = make_mesh((-1,), ("data",))
    assert mesh.devices.size == 8
    dist = evaluate(cfg, model, state, dataset, eval_step, parse,
                    num_batches=2, mesh=mesh)

    for k in single:
        if isinstance(single[k], dict):
            for c in single[k]:
                np.testing.assert_allclose(
                    dist[k][c], single[k][c], rtol=1e-5, err_msg=f"{k}/{c}"
                )
        elif single[k] is not None:
            np.testing.assert_allclose(
                dist[k], single[k], rtol=1e-5, err_msg=k
            )
