"""torch→JAX weight importer: orientation + numeric parity vs torch CPU
(SURVEY.md §4.2 module parity via ported weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tpu3dsad.config import ModelConfig
from tpu3dsad.models.detector import SizeAdaptiveDetector
from tpu3dsad.nn import SharedMLP
from tpu3dsad.utils.import_torch import _conv_to_dense, import_lineage_weights


def test_shared_mlp_matches_torch_conv_bn(rng):
    """One imported layer: torch Conv2d(1x1)+BN2d(eval) == SharedMLP(eval)."""
    C_in, C_out, B, M, K = 6, 16, 2, 5, 4
    tconv = torch.nn.Conv2d(C_in, C_out, 1, bias=False)
    tbn = torch.nn.BatchNorm2d(C_out)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.randn(C_out) * 0.1)
        tbn.running_var.copy_(torch.rand(C_out) + 0.5)

    x = rng.standard_normal((B, M, K, C_in)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # [B, C, M, K]
    with torch.no_grad():
        want = torch.relu(tbn(tconv(xt))).permute(0, 2, 3, 1).numpy()

    mlp = SharedMLP((C_out,))
    vars_ = mlp.init(jax.random.key(0), jnp.asarray(x), train=False)
    params = jax.tree.map(np.asarray, vars_["params"])
    stats = jax.tree.map(np.asarray, vars_["batch_stats"])
    params["dense_0"]["kernel"] = _conv_to_dense(tconv.weight.detach().numpy())
    params["bn_0"]["scale"] = tbn.weight.detach().numpy()
    params["bn_0"]["bias"] = tbn.bias.detach().numpy()
    stats["bn_0"]["mean"] = tbn.running_mean.numpy()
    stats["bn_0"]["var"] = tbn.running_var.numpy()

    got = mlp.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_import_lineage_weights_covers_backbone_and_voting(rng):
    cfg = ModelConfig(
        num_classes=4,
        sa_npoints=(64, 32, 16, 8),
        sa_nsamples=(8, 8, 4, 4),
        sa_channels=((16, 16, 32), (32, 32, 64), (32, 32, 64), (32, 32, 64)),
        fp_channels=((64, 64), (64, 64)),
        seed_feat_dim=64,
        num_proposals=16,
        cluster_nsample=4,
    )
    model = SizeAdaptiveDetector(cfg)
    pts = jnp.asarray(rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), pts, train=False)

    # fabricate a lineage state_dict shaped off our own tree
    p = variables["params"]
    sd = {}
    for i in range(1, 5):
        for j in range(3):
            dk = np.asarray(p["backbone"][f"sa{i}"]["mlp_0"][f"dense_{j}"]["kernel"])
            sd[f"backbone_net.sa{i}.mlp_module.layer{j}.conv.weight"] = (
                dk.T[:, :, None, None] + 1.0  # +1 marks "imported"
            )
            co = dk.shape[1]
            sd[f"backbone_net.sa{i}.mlp_module.layer{j}.bn.bn.weight"] = np.full(co, 2.0, np.float32)
            sd[f"backbone_net.sa{i}.mlp_module.layer{j}.bn.bn.bias"] = np.zeros(co, np.float32)
            sd[f"backbone_net.sa{i}.mlp_module.layer{j}.bn.bn.running_mean"] = np.zeros(co, np.float32)
            sd[f"backbone_net.sa{i}.mlp_module.layer{j}.bn.bn.running_var"] = np.ones(co, np.float32)
    for i in range(1, 3):
        for j in range(2):
            dk = np.asarray(p["backbone"][f"fp{i}"]["mlp"][f"dense_{j}"]["kernel"])
            sd[f"backbone_net.fp{i}.mlp.layer{j}.conv.weight"] = dk.T[:, :, None, None] + 1.0
    vk = np.asarray(p["voting"]["out"]["kernel"])
    sd["vgen.conv3.weight"] = vk.T[:, :, None] + 1.0
    sd["vgen.conv3.bias"] = np.asarray(p["voting"]["out"]["bias"]) + 1.0
    sd["pnet.conv1.weight"] = np.zeros((4, 4, 1), np.float32)  # unmappable

    new_vars, copied, skipped = import_lineage_weights(sd, variables)
    assert len(copied) >= 12 + 4 + 2
    assert "pnet.conv1.weight" in skipped
    got = np.asarray(new_vars["params"]["backbone"]["sa1"]["mlp_0"]["dense_0"]["kernel"])
    want = np.asarray(p["backbone"]["sa1"]["mlp_0"]["dense_0"]["kernel"]) + 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)
    got_bn = np.asarray(new_vars["params"]["backbone"]["sa2"]["mlp_0"]["bn_1"]["scale"])
    assert (got_bn == 2.0).all()
