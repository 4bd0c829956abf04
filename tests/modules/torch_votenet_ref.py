"""Minimal torch-CPU re-implementation of the lineage VoteNet forward
(models/{backbone_module,voting_module,proposal_module}.py — SURVEY.md §3.3)
with LINEAGE state_dict names, used as the box-level parity oracle for the
full-detector torch→jax weight import (north star: "box-level output
fidelity"). Sampling/grouping run through the numpy oracles (identical
semantics to the CUDA kernels); the neural layers are torch eval-mode
Conv1d/Conv2d+BN, channels-first like the lineage.
"""

from __future__ import annotations

import numpy as np
import torch

from tpu3dsad.ops.oracle import (
    ball_query_oracle,
    fps_oracle,
    interp_weights_oracle,
    knn_oracle,
)


class _ConvBN2d(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, 1, bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class _SharedMLP(torch.nn.Module):
    """Children named layer{j} to produce lineage state_dict keys."""

    def __init__(self, channels):
        super().__init__()
        self.n = len(channels) - 1
        for j in range(self.n):
            self.add_module(f"layer{j}", _ConvBN2d(channels[j], channels[j + 1]))

    def forward(self, x):
        for j in range(self.n):
            x = getattr(self, f"layer{j}")(x)
        return x


class _SA(torch.nn.Module):
    """PointnetSAModuleVotes: oracle FPS + ball query, normalized relative
    xyz, shared MLP, max-pool over all K slots (pad slots repeat hits)."""

    def __init__(self, npoint, radius, nsample, channels):
        super().__init__()
        self.npoint, self.radius, self.nsample = npoint, radius, nsample
        self.mlp_module = _SharedMLP(channels)

    def forward(self, xyz, feats):
        """xyz [N,3], feats [N,C] numpy -> (new_xyz [M,3], new_feats [M,C'])."""
        fps = fps_oracle(xyz, self.npoint)
        new_xyz = xyz[fps]
        idx, _ = ball_query_oracle(xyz, new_xyz, self.radius, self.nsample)
        grouped_xyz = (xyz[idx] - new_xyz[:, None, :]) / self.radius
        grouped = (
            np.concatenate([grouped_xyz, feats[idx]], -1)
            if feats is not None
            else grouped_xyz
        )
        t = torch.from_numpy(grouped[None]).permute(0, 3, 1, 2)  # [1,C,M,K]
        h = self.mlp_module(t)
        return new_xyz, h.max(dim=3).values[0].T.detach().numpy()


class _FP(torch.nn.Module):
    """PointnetFPModule: 3-NN inverse-distance interpolation + unary MLP.
    Skip (dense) features concatenated FIRST, like the jax module."""

    def __init__(self, channels):
        super().__init__()
        self.mlp = _SharedMLP(channels)

    def forward(self, dense_xyz, dense_feats, sparse_xyz, sparse_feats):
        d2, idx = knn_oracle(dense_xyz, sparse_xyz, 3)
        w = interp_weights_oracle(d2)
        interp = np.einsum("mkc,mk->mc", sparse_feats[idx], w)
        cat = np.concatenate([dense_feats, interp], -1).astype(np.float32)
        t = torch.from_numpy(cat[None]).permute(0, 2, 1)[..., None]  # [1,C,N,1]
        return self.mlp(t)[0, :, :, 0].T.detach().numpy()


class _Backbone(torch.nn.Module):
    def __init__(self, c_in, sa_np, sa_r, sa_k, sa_ch, fp_ch):
        super().__init__()
        prev = c_in
        for i in range(4):
            ch = (prev + 3,) + tuple(sa_ch[i])
            self.add_module(
                f"sa{i + 1}", _SA(sa_np[i], sa_r[i], sa_k[i], ch)
            )
            prev = sa_ch[i][-1]
        self.fp1 = _FP((sa_ch[2][-1] + sa_ch[3][-1],) + tuple(fp_ch[0]))
        self.fp2 = _FP((sa_ch[1][-1] + fp_ch[0][-1],) + tuple(fp_ch[1]))

    def forward(self, xyz, feats):
        x1, f1 = self.sa1(xyz, feats)
        x2, f2 = self.sa2(x1, f1)
        x3, f3 = self.sa3(x2, f2)
        x4, f4 = self.sa4(x3, f3)
        f3p = self.fp1(x3, f3, x4, f4)
        seeds = self.fp2(x2, f2, x3, f3p)
        return x2, seeds


class _Voting(torch.nn.Module):
    def __init__(self, dim, vote_factor=1):
        super().__init__()
        self.vote_factor = vote_factor
        self.dim = dim
        # upstream voting_module.py leaves Conv1d bias at its default True
        self.conv1 = torch.nn.Conv1d(dim, dim, 1)
        self.conv2 = torch.nn.Conv1d(dim, dim, 1)
        self.conv3 = torch.nn.Conv1d(dim, (3 + dim) * vote_factor, 1)
        self.bn1 = torch.nn.BatchNorm1d(dim)
        self.bn2 = torch.nn.BatchNorm1d(dim)

    def forward(self, seed_xyz, seed_feats):
        S = seed_xyz.shape[0]
        t = torch.from_numpy(seed_feats[None]).permute(0, 2, 1)  # [1,C,S]
        x = torch.relu(self.bn1(self.conv1(t)))
        x = torch.relu(self.bn2(self.conv2(x)))
        net = self.conv3(x)  # [1, F*(3+C), S]
        net = net.transpose(2, 1).reshape(1, S, self.vote_factor, 3 + self.dim)
        net = net[0].detach().numpy()
        vote_xyz = seed_xyz[:, None, :] + net[..., :3]
        vote_feats = seed_feats[:, None, :] + net[..., 3:]
        F = self.vote_factor
        return (
            vote_xyz.reshape(S * F, 3),
            vote_feats.reshape(S * F, self.dim),
        )


class _Proposal(torch.nn.Module):
    """ProposalModule: SA vote aggregation (r=0.3, K=16) + Conv1d head."""

    def __init__(self, seed_dim, num_proposals, radius, nsample, out_ch,
                 sa_ch=(128, 128, 128), feat_dim=128):
        super().__init__()
        self.vote_aggregation = _SA(
            num_proposals, radius, nsample, (seed_dim + 3,) + tuple(sa_ch)
        )
        # upstream proposal_module.py leaves Conv1d bias at its default True
        self.conv1 = torch.nn.Conv1d(sa_ch[-1], feat_dim, 1)
        self.conv2 = torch.nn.Conv1d(feat_dim, feat_dim, 1)
        self.conv3 = torch.nn.Conv1d(feat_dim, out_ch, 1)
        self.bn1 = torch.nn.BatchNorm1d(feat_dim)
        self.bn2 = torch.nn.BatchNorm1d(feat_dim)

    def forward(self, vote_xyz, vote_feats):
        centers, agg = self.vote_aggregation(vote_xyz, vote_feats)
        t = torch.from_numpy(agg[None]).permute(0, 2, 1)
        x = torch.relu(self.bn1(self.conv1(t)))
        x = torch.relu(self.bn2(self.conv2(x)))
        raw = self.conv3(x)[0].T.detach().numpy()  # [P, out_ch]
        return centers, raw


class TorchVoteNetRef(torch.nn.Module):
    def __init__(self, c_in, sa_np, sa_r, sa_k, sa_ch, fp_ch, num_proposals,
                 proposal_radius, proposal_nsample, out_ch):
        super().__init__()
        self.backbone_net = _Backbone(c_in, sa_np, sa_r, sa_k, sa_ch, fp_ch)
        seed_dim = fp_ch[1][-1]
        self.vgen = _Voting(seed_dim)
        self.pnet = _Proposal(
            seed_dim, num_proposals, proposal_radius, proposal_nsample, out_ch
        )

    def randomize_bn(self, gen: torch.Generator):
        """Non-trivial eval-mode BN stats so parity exercises them."""
        for m in self.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                with torch.no_grad():
                    m.running_mean.copy_(
                        torch.randn(m.running_mean.shape, generator=gen) * 0.1
                    )
                    m.running_var.copy_(
                        torch.rand(m.running_var.shape, generator=gen) + 0.5
                    )
                    m.weight.copy_(
                        torch.rand(m.weight.shape, generator=gen) + 0.5
                    )
                    m.bias.copy_(
                        torch.randn(m.bias.shape, generator=gen) * 0.1
                    )

    def forward(self, points, features):
        """points [B,N,3], features [B,N,C] numpy → end_points dict of
        numpy arrays (seed_xyz, seed_features, vote_xyz, proposal_xyz,
        raw_params), batch-stacked."""
        out = {k: [] for k in
               ("seed_xyz", "seed_features", "vote_xyz", "proposal_xyz",
                "raw_params")}
        for b in range(points.shape[0]):
            sx, sf = self.backbone_net(points[b], features[b])
            vx, vf = self.vgen(sx, sf)
            px, raw = self.pnet(vx, vf)
            for k, v in (("seed_xyz", sx), ("seed_features", sf),
                         ("vote_xyz", vx), ("proposal_xyz", px),
                         ("raw_params", raw)):
                out[k].append(v)
        return {k: np.stack(v) for k, v in out.items()}
