"""END-TO-END detector parity on ported lineage weights (VERDICT r1 #2).

Builds the torch-CPU lineage VoteNet reference (torch_votenet_ref.py) with
lineage state_dict names, imports its FULL checkpoint into the jax detector
in proposal_mode='lineage' via utils/import_torch.import_lineage_weights,
and compares end_points through the whole stack — backbone seeds, votes,
proposal centers, raw box params — establishing box-level output fidelity
(the north star) for the importable architecture, not just the SA module.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tpu3dsad.config import Config, ModelConfig
from tpu3dsad.models.detector import SizeAdaptiveDetector
from tpu3dsad.utils.import_torch import import_lineage_weights
from tests.modules.torch_votenet_ref import TorchVoteNetRef

SA_NP = (64, 32, 16, 8)
SA_R = (0.2, 0.4, 0.8, 1.2)
SA_K = (16, 8, 4, 4)
SA_CH = ((16, 16, 32), (16, 16, 32), (16, 16, 32), (16, 16, 32))
FP_CH = ((32, 32), (32, 32))
NC, NH, P = 4, 12, 16
OUT_CH = 2 + 3 + NH * 2 + NC * 4 + NC


def test_full_detector_matches_torch_on_ported_weights(rng):
    B, N, C_IN = 2, 256, 1
    points = rng.uniform(-1.5, 1.5, (B, N, 3)).astype(np.float32)
    feats = rng.standard_normal((B, N, C_IN)).astype(np.float32)

    ref = TorchVoteNetRef(
        C_IN, SA_NP, SA_R, SA_K, SA_CH, FP_CH,
        num_proposals=P, proposal_radius=0.3, proposal_nsample=8,
        out_ch=OUT_CH,
    ).eval()
    gen = torch.Generator().manual_seed(7)
    ref.randomize_bn(gen)
    with torch.no_grad():
        want = ref(points, feats)

    cfg = ModelConfig(
        num_classes=NC, num_heading_bins=NH, num_proposals=P,
        sa_npoints=SA_NP, sa_radii=SA_R, sa_nsamples=SA_K,
        sa_channels=SA_CH, fp_channels=FP_CH,
        seed_feat_dim=FP_CH[1][-1],
        proposal_mode="lineage", proposal_radius=0.3, cluster_nsample=8,
        append_height=False,
    )
    model = SizeAdaptiveDetector(cfg)
    variables = model.init(
        jax.random.key(0), jnp.asarray(points), jnp.asarray(feats),
        train=False,
    )
    variables = {
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
    }

    sd = {
        k: v.detach().numpy()
        for k, v in ref.state_dict().items()
        if "num_batches_tracked" not in k  # torch BN bookkeeping, not weights
    }
    new_vars, copied, skipped = import_lineage_weights(sd, variables)
    # every single lineage tensor must land — full-checkpoint import
    assert skipped == [], f"unported lineage keys: {skipped}"
    assert len(copied) == len(sd)

    got = model.apply(
        new_vars, jnp.asarray(points), jnp.asarray(feats), train=False
    )

    np.testing.assert_allclose(
        np.asarray(got["seed_xyz"]), want["seed_xyz"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["seed_features"]), want["seed_features"], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["vote_xyz"]), want["vote_xyz"], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["proposal_xyz"]), want["proposal_xyz"], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["raw_params"]), want["raw_params"],
        atol=2e-3, rtol=1e-4,
    )


def test_lineage_mode_trains(rng):
    """The lineage head must also train (loss finite, grads flow) so the
    imported detector can be fine-tuned."""
    from tpu3dsad import train_lib
    from tpu3dsad.config import TrainConfig
    from tpu3dsad.data.synthetic import detection_batch

    cfg = Config(
        model=ModelConfig(
            num_classes=NC, num_proposals=P,
            sa_npoints=SA_NP, sa_nsamples=SA_K, sa_channels=SA_CH,
            fp_channels=FP_CH, seed_feat_dim=FP_CH[1][-1],
            proposal_mode="lineage", cluster_nsample=8,
        ),
        train=TrainConfig(batch_size=2),
    )
    b = detection_batch(rng, 2, 256, NC, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    model = SizeAdaptiveDetector(cfg.model)
    v = jax.jit(
        lambda k: model.init(
            k, batch["points"], mask=batch["point_mask"], train=False
        )
    )(jax.random.key(0))
    tx = train_lib.make_optimizer(cfg.train, 10)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=v["params"],
        batch_stats=v["batch_stats"], tx=tx,
    )
    train_step, _ = train_lib.make_detector_steps(model, cfg)
    state, metrics = train_step(state, batch, jax.random.key(1), 0.9)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["scale_sel_loss"]) == 0.0  # no scale head here
