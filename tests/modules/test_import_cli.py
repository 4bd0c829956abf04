"""torch→orbax conversion CLI (python -m tpu3dsad.utils.import_torch):
a saved lineage checkpoint.tar converts to an orbax dir whose restored
detector reproduces the torch reference forward."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.modules.test_detector_torch_parity import (
    FP_CH, NC, NH, OUT_CH, P, SA_CH, SA_K, SA_NP, SA_R,
)
from tests.modules.torch_votenet_ref import TorchVoteNetRef
from tpu3dsad import train_lib
from tpu3dsad.config import ModelConfig
from tpu3dsad.models.detector import SizeAdaptiveDetector
from tpu3dsad.utils.import_torch import main as import_main

N_PTS = 256

_OVERRIDES = [
    f"model.num_classes={NC}", f"model.num_heading_bins={NH}",
    f"model.num_proposals={P}",
    f"model.sa_npoints={SA_NP}", f"model.sa_radii={SA_R}",
    f"model.sa_nsamples={SA_K}", f"model.sa_channels={SA_CH}",
    f"model.fp_channels={FP_CH}", f"model.seed_feat_dim={FP_CH[1][-1]}",
    "model.proposal_radius=0.3", "model.cluster_nsample=8",
    "model.append_height=false",
    f"data.num_points={N_PTS}", "data.use_color=true",
]


def test_import_cli_roundtrip(tmp_path, rng, capsys):
    ref = TorchVoteNetRef(
        3, SA_NP, SA_R, SA_K, SA_CH, FP_CH,
        num_proposals=P, proposal_radius=0.3, proposal_nsample=8,
        out_ch=OUT_CH,
    ).eval()
    ref.randomize_bn(torch.Generator().manual_seed(3))
    tar = tmp_path / "checkpoint.tar"
    torch.save({"epoch": 7, "model_state_dict": ref.state_dict()}, tar)

    out = tmp_path / "orbax"
    import_main([f"ckpt={tar}", f"out={out}", *_OVERRIDES])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["skipped"] == []
    assert report["copied"] == report["total_source_tensors"] > 0

    # restore through the standard eval path and compare vs torch forward
    cfg = ModelConfig(
        num_classes=NC, num_heading_bins=NH, num_proposals=P,
        sa_npoints=SA_NP, sa_radii=SA_R, sa_nsamples=SA_K,
        sa_channels=SA_CH, fp_channels=FP_CH,
        seed_feat_dim=FP_CH[1][-1],
        proposal_mode="lineage", proposal_radius=0.3, cluster_nsample=8,
        append_height=False,
    )
    model = SizeAdaptiveDetector(cfg)
    points = rng.uniform(-1.5, 1.5, (2, N_PTS, 3)).astype(np.float32)
    feats = rng.standard_normal((2, N_PTS, 3)).astype(np.float32)
    tx = train_lib.make_optimizer(
        __import__("tpu3dsad.config", fromlist=["TrainConfig"]).TrainConfig(),
        steps_per_epoch=10,
    )
    state = train_lib.create_state(
        model,
        lambda k: model.init(k, jnp.asarray(points), jnp.asarray(feats),
                             train=False),
        tx,
        jax.random.key(0),
    )
    state, step = train_lib.restore_checkpoint(str(out), state, for_eval=True)
    assert step == 1

    with torch.no_grad():
        want = ref(points, feats)
    got = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(points), jnp.asarray(feats), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got["raw_params"]), want["raw_params"],
        atol=2e-3, rtol=1e-4,
    )
