"""Size-adaptive clustering + proposal head — the 3DSAD delta.

Lineage base: models/proposal_module.py (SURVEY.md §2.2): FPS over votes →
fixed-radius QueryAndGroup(r=0.3, K=16) → Conv1d head → raw box params
[B, P, 2 + 3 + NH*2 + NS*4 + NC]. 3DSAD replaces the single fixed radius
with size-adaptive per-class radius/scale selection (BASELINE.json:5,
/root/reference/README.md:2 "Size Adaptive Clustering").

TPU-native design (SURVEY.md §7 hard part #5 — the radius-bank design is
ours to define): votes are grouped at a small static BANK of radii (derived
from per-class mean-size priors); each scale runs its own shared MLP +
masked max-pool; a scale-selection head predicts logits over the bank and
the proposal feature is the softmax-weighted blend. Shapes stay static, the
selection is differentiable, and a hard argmax at eval time reproduces
discrete per-class radius selection.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu3dsad import ops
from tpu3dsad.nn.mlp import SharedMLP
from tpu3dsad.nn.norm import MaskedBatchNorm


def _vote_density(x, valid, r2):
    """density[b,v] = #valid votes with d2 < r2 of vote v.

    Boundary convention: STRICT ``d2 < r2``, matching the exact ball-query
    tiers (ops/xla/ball_query.py:87) — r4's initial ``<=`` was unstated
    drift from the repo-wide membership convention and is aligned here
    (VERDICT r4 weak #6; no training rows depended on it). Each valid vote
    always counts itself (d2 = 0), so valid densities are >= 1.

    Blockwise (same discipline as ops/xla/knn.py's support slabs): the
    pairwise work runs as a lax.scan over row slabs sized so the live
    [B, slab, V, 3] difference tensor stays ~O(2^21) elements per batch
    row — the full [B,V,V,3] never materializes, so the utility scales to
    large vote counts (vote_factor growth, outdoor seed counts) instead
    of being fenced to V~1024.
    """
    B, V, _ = x.shape

    def counts(rows):  # rows [B,s,3] vs ALL votes
        # elementwise dx²+dy²+dz², NOT the MXU |a|²+|b|²−2a·b expansion —
        # cancellation in the expanded form flips radius-boundary
        # membership (CLAUDE.md invariant; same rule as ball_query)
        diff = rows[:, :, None, :] - x[:, None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        return jnp.sum(
            (d2 < r2) & valid[:, None, :], axis=-1, dtype=jnp.int32
        )

    slab = min(V, max(64, (1 << 21) // V))
    if slab >= V:
        return counts(x)
    nslab = -(-V // slab)
    # pad rows with a far sentinel; the padded counts are sliced away
    xp = jnp.pad(
        x, ((0, 0), (0, nslab * slab - V), (0, 0)), constant_values=1e9
    )
    xs = xp.reshape(B, nslab, slab, 3).transpose(1, 0, 2, 3)
    _, out = jax.lax.scan(lambda c, rows: (c, counts(rows)), None, xs)
    return out.transpose(1, 0, 2).reshape(B, nslab * slab)[:, :V]


def density_biased_fps(vote_xyz, num_proposals: int, radius: float,
                       vote_mask=None, candidate_factor: int = 4):
    """Foreground-biased proposal sampling (VERDICT r3 #4, outdoor recipe).

    Plain FPS over votes spreads proposals uniformly — in sparse outdoor
    clouds ~95% of votes sit on background (they never moved off their
    seed), so most proposals land on empty road and positives are rare
    (pos_ratio ~2%, docs/experiments r3_outdoor rows). Votes from object
    surfaces CONVERGE near object centers, so local vote density separates
    foreground from background. This keeps shapes static:

      1. density[b,v] = #valid votes with d2 < radius² of vote v
         (blockwise pairwise counts — see _vote_density),
      2. top C = num_proposals·candidate_factor votes by density (ties →
         lower index, matching every other selection op in the repo),
      3. exact FPS among those C candidates for spatial spread.

    Returns (inds [B,P] into the ORIGINAL vote set, center_mask [B,P]).
    With candidate_factor large enough that C == V this degrades to plain
    FPS over a density-reordered view (same point set).
    """
    B, V, _ = vote_xyz.shape
    C = min(V, num_proposals * candidate_factor)
    valid = (
        jnp.ones((B, V), bool) if vote_mask is None else vote_mask
    )
    x = vote_xyz.astype(jnp.float32)
    density = _vote_density(x, valid, jnp.float32(radius) ** 2)
    density = jnp.where(valid, density, -1)  # pad votes never rank
    # ties → lower index: stable argsort of -density (ascending) is
    # exactly (density desc, index asc) — the packed-int top_k form it
    # replaces overflowed int32 at V ≳ 46k (ADVICE r4); this is exact at
    # any V. Pads (-density = 1) rank after every valid vote (>= 1).
    order = jnp.argsort(-density, axis=1, stable=True)
    cand = order[:, :C]  # [B,C] vote indices
    cand_xyz = ops.gather(vote_xyz, cand)
    cand_mask = jnp.take_along_axis(valid, cand, axis=1)
    sub = ops.furthest_point_sample(cand_xyz, num_proposals, mask=cand_mask)
    inds = jnp.take_along_axis(cand, sub, axis=1)  # back to vote indices
    center_mask = jnp.take_along_axis(valid, inds, axis=1)
    return inds, center_mask


def _sample_proposal_centers(vote_xyz, num_proposals, vote_mask, *,
                             sampling: str, density_radius: float,
                             candidate_factor: int):
    """Shared proposal-center selection for both proposal heads."""
    if sampling == "density":
        return density_biased_fps(
            vote_xyz, num_proposals, density_radius,
            vote_mask=vote_mask, candidate_factor=candidate_factor,
        )
    if sampling != "fps":
        # a typo'd CLI value silently measuring the FPS baseline is exactly
        # the silent-deviation failure mode CLAUDE.md forbids
        raise ValueError(
            f"model.proposal_sampling={sampling!r}: expected 'fps' or "
            "'density'"
        )
    inds = ops.furthest_point_sample(vote_xyz, num_proposals, mask=vote_mask)
    center_mask = (
        jnp.ones(inds.shape, bool)
        if vote_mask is None
        else jnp.take_along_axis(vote_mask, inds, axis=1)
    )
    return inds, center_mask


class SizeAdaptiveProposal(nn.Module):
    num_classes: int
    num_heading_bins: int = 12
    num_proposals: int = 256
    radius_bank: Sequence[float] = (0.15, 0.3, 0.6)
    nsample: int = 16
    feat_dim: int = 128
    # 'fps' (lineage) | 'density' (foreground-biased, outdoor preset)
    sampling: str = "fps"
    density_radius: float = 0.3
    candidate_factor: int = 4

    @nn.compact
    def __call__(self, vote_xyz, vote_features, *, vote_mask=None,
                 train: bool = False, bn_momentum=0.9):
        """Returns end_points dict with raw proposal params + scale logits."""
        P = self.num_proposals
        R = len(self.radius_bank)
        NH, NS = self.num_heading_bins, self.num_classes

        inds, center_mask = _sample_proposal_centers(
            vote_xyz, P, vote_mask, sampling=self.sampling,
            density_radius=self.density_radius,
            candidate_factor=self.candidate_factor,
        )
        centers = ops.gather(vote_xyz, inds)  # [B, P, 3]

        # --- size-adaptive grouping: one grouped MLP per bank radius
        scale_feats = []
        for r_i, radius in enumerate(self.radius_bank):
            grouped, _, gmask = ops.query_and_group(
                vote_xyz,
                centers,
                radius,
                self.nsample,
                features=vote_features,
                mask=vote_mask,
                use_xyz=True,
                normalize_xyz=True,
            )
            gmask = gmask & center_mask[:, :, None]
            h = SharedMLP(
                (self.feat_dim, self.feat_dim, self.feat_dim),
                name=f"scale_mlp_{r_i}",
            )(grouped, mask=gmask, train=train, bn_momentum=bn_momentum)
            scale_feats.append(ops.masked_max(h, gmask, axis=2))  # [B,P,D]

        stacked = jnp.stack(scale_feats, axis=2)  # [B, P, R, D]

        # --- scale selection: logits over the radius bank per proposal
        sel_in = stacked.reshape(*stacked.shape[:2], R * self.feat_dim)
        sel_h = SharedMLP((self.feat_dim,), name="scale_sel_mlp")(
            sel_in, mask=center_mask, train=train, bn_momentum=bn_momentum
        )
        scale_logits = nn.Dense(R, name="scale_sel_out")(sel_h)  # [B,P,R]

        # soft selection while training (differentiable), hard at eval —
        # straight-through blend keeps one compiled graph for both
        soft_w = jax.nn.softmax(scale_logits, axis=-1)
        if not train:
            hard = jax.nn.one_hot(
                jnp.argmax(scale_logits, -1), R, dtype=soft_w.dtype
            )
            soft_w = hard
        feat = jnp.einsum(
            "bprd,bpr->bpd", stacked, soft_w,
            preferred_element_type=jnp.float32,
        )

        # --- proposal head → raw box params (lineage channel layout)
        x = feat
        for i in range(2):
            # upstream proposal_module.py Conv1d(128,128,1) default bias
            # (kept even before BN) — needed for exact checkpoint import
            x = nn.Dense(self.feat_dim, name=f"head_{i}")(x)
            x = MaskedBatchNorm(name=f"head_bn_{i}")(
                x, train=train, momentum=bn_momentum, mask=center_mask
            )
            x = nn.relu(x)
        out_ch = 2 + 3 + NH * 2 + NS * 4 + self.num_classes
        raw = nn.Dense(out_ch, name="head_out")(x)  # [B, P, out_ch]

        return {
            "proposal_xyz": centers,
            "proposal_inds": inds,
            "proposal_mask": center_mask,
            "scale_logits": scale_logits,
            "raw_params": raw,
        }


class LineageProposal(nn.Module):
    """Lineage-exact proposal head (models/proposal_module.py
    ProposalModule): FPS over votes → fixed QueryAndGroup(r=0.3, K=16,
    use_xyz=True, normalize_xyz=True) → SA shared-MLP (→128,128,128) with
    max-pool → Conv1d head 128→128→out_ch (BN+ReLU on the hidden layers).

    Exists so a FULL lineage VoteNet checkpoint is importable
    (utils/import_torch.py maps pnet.* here) and box-level output fidelity
    is verifiable end-to-end — the north-star parity mode. Select with
    model.proposal_mode='lineage'. No scale logits: detection_loss skips
    the 3DSAD scale-selection term when the key is absent.
    """

    num_classes: int
    num_heading_bins: int = 12
    num_proposals: int = 256
    radius: float = 0.3
    nsample: int = 16
    sa_channels: Sequence[int] = (128, 128, 128)
    feat_dim: int = 128

    @nn.compact
    def __call__(self, vote_xyz, vote_features, *, vote_mask=None,
                 train: bool = False, bn_momentum=0.9):
        NH, NS = self.num_heading_bins, self.num_classes

        inds = ops.furthest_point_sample(
            vote_xyz, self.num_proposals, mask=vote_mask
        )
        centers = ops.gather(vote_xyz, inds)  # [B, P, 3]
        center_mask = (
            jnp.ones(inds.shape, bool)
            if vote_mask is None
            else jnp.take_along_axis(vote_mask, inds, axis=1)
        )

        grouped, _, gmask = ops.query_and_group(
            vote_xyz,
            centers,
            self.radius,
            self.nsample,
            features=vote_features,
            mask=vote_mask,
            use_xyz=True,
            normalize_xyz=True,
        )
        gmask = gmask & center_mask[:, :, None]
        h = SharedMLP(tuple(self.sa_channels), name="sa_mlp")(
            grouped, mask=gmask, train=train, bn_momentum=bn_momentum
        )
        feat = ops.masked_max(h, gmask, axis=2)  # [B, P, 128]

        x = feat
        for i in range(2):
            # upstream proposal_module.py Conv1d(128,128,1) default bias
            # (kept even before BN) — needed for exact checkpoint import
            x = nn.Dense(self.feat_dim, name=f"head_{i}")(x)
            x = MaskedBatchNorm(name=f"head_bn_{i}")(
                x, train=train, momentum=bn_momentum, mask=center_mask
            )
            x = nn.relu(x)
        out_ch = 2 + 3 + NH * 2 + NS * 4 + self.num_classes
        raw = nn.Dense(out_ch, name="head_out")(x)

        return {
            "proposal_xyz": centers,
            "proposal_inds": inds,
            "proposal_mask": center_mask,
            "raw_params": raw,
        }

