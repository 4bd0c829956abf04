"""Set-abstraction module parity vs a minimal torch-CPU PointNet++
re-implementation on identical weights (SURVEY.md §4.2).

The torch side mirrors the lineage PointnetSAModule exactly: FPS + ball
query via the numpy oracles (same semantics as the CUDA kernels), grouping
with center-subtract + radius normalization, Conv2d(1x1)+BN2d(eval)+ReLU
stack, max-pool over the K axis. Weights are ported with the same transpose
the torch→jax importer uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tpu3dsad.nn import SetAbstraction
from tpu3dsad.ops.oracle import ball_query_oracle, fps_oracle
from tpu3dsad.utils.import_torch import _conv_to_dense

NPOINT, RADIUS, K = 32, 0.4, 16
CHANNELS = (16, 32)
C_IN = 4  # feature channels


class TorchSA(torch.nn.Module):
    """Lineage-style SA (SSG), eval mode, oracle sampling/grouping."""

    def __init__(self):
        super().__init__()
        layers = []
        c_prev = C_IN + 3
        for c in CHANNELS:
            layers += [
                torch.nn.Conv2d(c_prev, c, 1, bias=False),
                torch.nn.BatchNorm2d(c),
                torch.nn.ReLU(),
            ]
            c_prev = c
        self.mlp = torch.nn.Sequential(*layers)

    def forward(self, xyz_np, feats_np):
        B = xyz_np.shape[0]
        outs, new_xyzs = [], []
        for b in range(B):
            fps_idx = fps_oracle(xyz_np[b], NPOINT)
            new_xyz = xyz_np[b][fps_idx]  # [M, 3]
            idx, cnt = ball_query_oracle(xyz_np[b], new_xyz, RADIUS, K)
            grouped_xyz = (xyz_np[b][idx] - new_xyz[:, None, :]) / RADIUS
            grouped_feat = feats_np[b][idx]  # [M, K, C]
            grouped = np.concatenate([grouped_xyz, grouped_feat], -1)
            t = torch.from_numpy(grouped[None]).permute(0, 3, 1, 2)  # [1,C,M,K]
            h = self.mlp(t)  # [1, C', M, K]
            # lineage max-pools over ALL K slots (pad slots repeat real hits)
            pooled = h.max(dim=3).values[0].T  # [M, C']
            outs.append(pooled.detach().numpy())
            new_xyzs.append(new_xyz)
        return np.stack(new_xyzs), np.stack(outs)


def test_sa_module_matches_torch_reimplementation(rng):
    B, N = 2, 256
    xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    feats = rng.standard_normal((B, N, C_IN)).astype(np.float32)

    tsa = TorchSA().eval()
    with torch.no_grad():
        for m in tsa.mlp:
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
        want_xyz, want = tsa(xyz, feats)

    sa = SetAbstraction(
        npoint=NPOINT, radii=(RADIUS,), nsamples=(K,),
        mlps=(CHANNELS,), normalize_xyz=True,
    )
    variables = sa.init(jax.random.key(0), jnp.asarray(xyz), jnp.asarray(feats))
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    convs = [m for m in tsa.mlp if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in tsa.mlp if isinstance(m, torch.nn.BatchNorm2d)]
    for j, (cv, bn) in enumerate(zip(convs, bns)):
        params["mlp_0"][f"dense_{j}"]["kernel"] = _conv_to_dense(
            cv.weight.detach().numpy()
        )
        params["mlp_0"][f"bn_{j}"]["scale"] = bn.weight.detach().numpy()
        params["mlp_0"][f"bn_{j}"]["bias"] = bn.bias.detach().numpy()
        stats["mlp_0"][f"bn_{j}"]["mean"] = bn.running_mean.numpy()
        stats["mlp_0"][f"bn_{j}"]["var"] = bn.running_var.numpy()

    got_xyz, got, _, _ = sa.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(xyz), jnp.asarray(feats), train=False,
    )
    np.testing.assert_allclose(np.asarray(got_xyz), want_xyz, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
