"""Data-parallel correctness on the 8-virtual-device CPU mesh (SURVEY.md
§4.6): the sharded train step must produce the same updated params as the
same step on one device with the full batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad import train_lib
from tpu3dsad.config import Config, ModelConfig, TrainConfig
from tpu3dsad.data.synthetic import detection_batch
from tpu3dsad.models.detector import SizeAdaptiveDetector
from tpu3dsad.parallel import batch_sharding, make_mesh, replicated, shard_batch


def _tiny():
    return Config(
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
        train=TrainConfig(batch_size=8),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny()
    rng = np.random.default_rng(0)
    b = detection_batch(rng, 8, 256, 4, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    model = SizeAdaptiveDetector(cfg.model)
    tx = train_lib.make_optimizer(cfg.train, 10)
    state = train_lib.create_state(
        model,
        lambda k: model.init(k, batch["points"], mask=batch["point_mask"], train=False),
        tx,
        jax.random.key(0),
    )
    train_step, _ = train_lib.make_detector_steps(model, cfg)
    return cfg, model, state, batch, train_step


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh((-1,), ("data",))
    assert mesh.devices.shape == (8,)


def test_dp_step_matches_single_device(setup):
    cfg, model, state, batch, train_step = setup
    rng = jax.random.key(42)

    # train_step donates its state arg — snapshot to host first so the same
    # initial state can feed both runs
    state_np = jax.tree.map(np.asarray, state)

    # single device (default placement)
    s1, m1 = train_step(jax.tree.map(jnp.asarray, state_np), batch, rng, 0.9)

    # 8-way data parallel: identical math, batch sharded over the mesh
    mesh = make_mesh((-1,), ("data",))
    sharded = shard_batch(batch, mesh)
    state_r = jax.device_put(state_np, replicated(mesh))
    s8, m8 = train_step(state_r, sharded, rng, 0.9)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5
    )
    # params after one Adam step: m̂/√v̂ amplifies reduction-order fp noise
    # near zero-gradients, so compare with a loose-but-meaningful bound
    # (a wrong psum/sharding produces O(1) differences)
    flat1 = jax.tree.leaves(s1.params)
    flat8 = jax.tree.leaves(s8.params)
    worst = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(flat1, flat8)
    )
    assert worst < 2e-2, worst

    # and the gradients themselves must match tightly
    from tpu3dsad.losses import detection_loss

    def loss_fn(params, batch):
        ep = model.apply(
            {"params": params, "batch_stats": state_np.batch_stats},
            batch["points"], mask=batch["point_mask"], train=False,
        )
        return detection_loss(
            ep, batch, model._mean_sizes(), cfg.model.num_heading_bins,
            tuple(cfg.model.cluster_radius_bank),
        )[0]

    g1 = jax.jit(jax.grad(loss_fn))(
        jax.tree.map(jnp.asarray, state_np.params), batch
    )
    g8 = jax.jit(jax.grad(loss_fn))(
        jax.device_put(state_np.params, replicated(mesh)), sharded
    )
    worst_g = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8))
    )
    assert worst_g < 1e-4, worst_g


def test_batch_sharding_layout(setup):
    _, _, _, batch, _ = setup
    mesh = make_mesh((-1,), ("data",))
    sharded = shard_batch(batch, mesh)
    sh = sharded["points"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), sharded["points"].ndim)
    # each device holds exactly batch/8 scenes
    shard_shapes = {s.data.shape for s in sharded["points"].addressable_shards}
    assert shard_shapes == {(1, 256, 3)}
